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
  /** `bucketBy`: the merge-on-read bucket layout when KNOWN — > 0 a
    * count, 0 explicitly unbucketed (CREATE TABLE recorded it), -1
    * unknown (API registrations, pre-r9 persisted entries) → the
    * table open probes `meta/BUCKETS` instead.
    */
  case class Entry(path: String, pk: Seq[String], mergeOnRead: Boolean,
                   partitionBy: Seq[String] = Nil,
                   bloomCols: Seq[String] = Nil,
                   changeDataFeed: Boolean = false,
                   datalake: Boolean = false,
                   watermark: Option[String] = None,
                   sortBy: Seq[String] = Nil,
                   bucketBy: Int = -1)

  private val reg = TrieMap.empty[(String, String), Entry]

  def register(db: String, table: String, path: String,
               pk: Seq[String] = Nil, mergeOnRead: Boolean = false,
               partitionBy: Seq[String] = Nil,
               bloomCols: Seq[String] = Nil,
               changeDataFeed: Boolean = false,
               datalake: Boolean = false,
               watermark: Option[String] = None,
               sortBy: Seq[String] = Nil,
               bucketBy: Int = -1): Unit =
    reg.put((db.toLowerCase, table.toLowerCase),
      Entry(path, pk, mergeOnRead, partitionBy, bloomCols, changeDataFeed,
        datalake, watermark, sortBy, bucketBy))

  def lookup(db: String, table: String): Option[Entry] =
    reg.get((db.toLowerCase, table.toLowerCase))
      .orElse(recover(db.toLowerCase, table.toLowerCase))

  /** In-memory registry only — no persisted-catalog recovery. CREATE
    * TABLE's duplicate check uses this so a stale descriptor from an
    * earlier process (whose temp data dir still exists) can't block a
    * fresh CREATE; the committed-state check on the table location
    * still guards real data.
    */
  def lookupLocal(db: String, table: String): Option[Entry] =
    reg.get((db.toLowerCase, table.toLowerCase))

  def unregister(db: String, table: String): Boolean =
    reg.remove((db.toLowerCase, table.toLowerCase)).isDefined

  def listTables(db: String): Seq[String] =
    (reg.keys.collect { case (d, t) if d == db.toLowerCase => t }.toSet ++
      listPersisted(db.toLowerCase)).toSeq.sorted

  /** Databases with at least one table — in-memory or persisted. */
  def listDatabases(): Seq[String] =
    (reg.keys.map(_._1).toSet ++ listPersistedDbs()).toSeq.sorted

  def clear(): Unit = reg.clear()

  // ------------------------------------------------------ durable catalog
  // DDL-created tables survive a process restart: `CREATE TABLE`
  // persists its registry entry as one JSON object under the
  // warehouse's `_catalog/` (the metastore role — rides TableFs, so a
  // remote warehouse keeps its catalog in the bucket too), and a
  // registry miss recovers from it lazily. API-registered tables
  // (tests, embedded use) stay deliberately process-local.

  private def fs: graft.storage.TableFs =
    graft.storage.TableFs.forPath(warehouse)
  private def catalogDir: String = s"$warehouse/_catalog"
  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def entryFile(db: String, table: String): String =
    s"$catalogDir/${enc(db)}@${enc(table)}.json"

  /** Persist `db.table`'s current entry (call after register). */
  def persist(db: String, table: String): Unit =
    reg.get((db.toLowerCase, table.toLowerCase)).foreach { e =>
      val json = org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(toJson(e)))
      fs.mkdirs(catalogDir)
      fs.writeString(entryFile(db.toLowerCase, table.toLowerCase), json)
    }

  /** Remove the persisted entry (DROP TABLE). */
  def deletePersisted(db: String, table: String): Unit = {
    val f = entryFile(db.toLowerCase, table.toLowerCase)
    if (fs.exists(f)) fs.deleteFile(f)
  }

  private def toJson(e: Entry): org.json4s.JValue = {
    import org.json4s.JsonDSL._
    ("path" -> e.path) ~ ("pk" -> e.pk) ~
      ("mergeOnRead" -> e.mergeOnRead) ~
      ("partitionBy" -> e.partitionBy) ~ ("bloomCols" -> e.bloomCols) ~
      ("changeDataFeed" -> e.changeDataFeed) ~
      ("datalake" -> e.datalake) ~ ("watermark" -> e.watermark) ~
      ("sortBy" -> e.sortBy) ~ ("bucketBy" -> e.bucketBy)
  }

  private def fromJson(j: org.json4s.JValue): Entry = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    Entry(
      path = (j \ "path").extract[String],
      pk = (j \ "pk").extract[Seq[String]],
      mergeOnRead = (j \ "mergeOnRead").extract[Boolean],
      partitionBy = (j \ "partitionBy").extract[Seq[String]],
      bloomCols = (j \ "bloomCols").extract[Seq[String]],
      changeDataFeed = (j \ "changeDataFeed").extract[Boolean],
      datalake = (j \ "datalake").extract[Boolean],
      watermark = (j \ "watermark").extractOpt[String],
      // absent in pre-r9 persisted entries — default, don't fail
      sortBy = (j \ "sortBy").extractOpt[Seq[String]].getOrElse(Nil),
      // absent = unknown → the table open probes meta/BUCKETS
      bucketBy = (j \ "bucketBy").extractOpt[Int].getOrElse(-1))
  }

  /** Registry miss → lazy recovery from the persisted catalog. A
    * descriptor whose table data no longer exists is stale debris
    * (e.g. a wiped temp warehouse) — dropped, not resurrected. A
    * descriptor that cannot be read or parsed (corruption, an
    * unreachable remote warehouse) degrades to a plain miss rather
    * than poisoning every lookup; it is left in place for inspection.
    */
  private def recover(db: String, table: String): Option[Entry] =
    try {
      val f = entryFile(db, table)
      fs.readString(f).flatMap { json =>
        val e = fromJson(org.json4s.jackson.JsonMethods.parse(json))
        if (graft.storage.TableFs.forPath(e.path).exists(e.path)) {
          reg.putIfAbsent((db, table), e)
          Some(reg((db, table)))
        } else {
          fs.deleteFile(f)
          None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def listPersisted(db: String): Seq[String] =
    if (!fs.exists(catalogDir)) Nil
    else fs.listNames(catalogDir).flatMap { n =>
      n.stripSuffix(".json").split("@", 2) match {
        case Array(d, t) if java.net.URLDecoder.decode(d, "UTF-8") == db =>
          Some(java.net.URLDecoder.decode(t, "UTF-8"))
        case _ => None
      }
    }

  private def listPersistedDbs(): Seq[String] =
    if (!fs.exists(catalogDir)) Nil
    else fs.listNames(catalogDir).flatMap { n =>
      n.stripSuffix(".json").split("@", 2) match {
        case Array(d, _) => Some(java.net.URLDecoder.decode(d, "UTF-8"))
        case _ => None
      }
    }.distinct
}
