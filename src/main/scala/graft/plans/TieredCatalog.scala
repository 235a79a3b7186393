package graft.plans

import scala.collection.concurrent.TrieMap

/** Process-wide registry of tiered tables addressable as
  * `graft.<db>.<table>` in SQL (the reference's three-level
  * `catalog.database.table` namespace, /root/reference/README.md:129-135).
  * Resolution happens in [[ResolveTieredTables]].
  */
object TieredCatalog {
  val CatalogName = "graft"

  /** Root for tables created via SQL `CREATE TABLE` without an explicit
    * `path` property (the catalog-managed warehouse). On a cluster this
    * would be a shared filesystem URI.
    */
  @volatile var warehouse: String =
    s"${sys.props("java.io.tmpdir")}/graft-warehouse"

  /** `datalake` mirrors the reference's `table.datalake.enabled`
    * property (README.md:188-191): commits through the SQL streaming
    * surface auto-tier hot→cold and export the Iceberg metadata chain,
    * playing the lake tiering service.
    */
  /** `watermark` is the table's declared event-time contract
    * (`WATERMARK FOR <col> AS <col> - INTERVAL '<n>' <unit>` in the
    * Flink dialect), stored as `<col>:<delay>`; streaming statements
    * reading the table default their watermark to it.
    */
  case class Entry(path: String, pk: Seq[String], mergeOnRead: Boolean,
                   partitionBy: Seq[String] = Nil,
                   bloomCols: Seq[String] = Nil,
                   changeDataFeed: Boolean = false,
                   datalake: Boolean = false,
                   watermark: Option[String] = None)

  private val reg = TrieMap.empty[(String, String), Entry]

  def register(db: String, table: String, path: String,
               pk: Seq[String] = Nil, mergeOnRead: Boolean = false,
               partitionBy: Seq[String] = Nil,
               bloomCols: Seq[String] = Nil,
               changeDataFeed: Boolean = false,
               datalake: Boolean = false,
               watermark: Option[String] = None): Unit =
    reg.put((db.toLowerCase, table.toLowerCase),
      Entry(path, pk, mergeOnRead, partitionBy, bloomCols, changeDataFeed,
        datalake, watermark))

  def lookup(db: String, table: String): Option[Entry] =
    reg.get((db.toLowerCase, table.toLowerCase))

  def unregister(db: String, table: String): Boolean =
    reg.remove((db.toLowerCase, table.toLowerCase)).isDefined

  def listTables(db: String): Seq[String] =
    reg.keys.collect { case (d, t) if d == db.toLowerCase => t }.toSeq.sorted

  def clear(): Unit = reg.clear()
}
