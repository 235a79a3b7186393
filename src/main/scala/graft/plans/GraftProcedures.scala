package graft.plans

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

import graft.storage.TieredTable

/** The table-maintenance verbs as SQL stored procedures — the
  * `CALL graft.system.<proc>(…)` surface every Iceberg engine exposes
  * (Trino's `CALL iceberg.system.rollback_to_snapshot`, Spark's
  * `CALL cat.system.expire_snapshots`; the reference's maintenance
  * story, /root/reference/README.md:257-292), on Spark 4's DSv2
  * procedure API:
  *
  * {{{
  * CALL graft.system.compact('db.t')
  * CALL graft.system.zorder('db.t', 'x,y')
  * CALL graft.system.rollback_to_snapshot('db.t', 3)
  * CALL graft.system.expire_snapshots('db.t', <cutoff_ms>, 2)
  * CALL graft.system.vacuum('db.t', 2)
  * CALL graft.system.gc_orphans('db.t')
  * }}}
  *
  * Each lowers to the corresponding [[TieredTable]] verb on the
  * registered table — named arguments and defaults ride Spark's own
  * analyzer (`keep_last` defaults to 1, `sort_by` to none).
  */
object GraftProcedures {

  val Namespace = "system"

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" -> s"CALL: $msg"))

  private def resolve(dbTable: String): TieredTable = {
    val parts = dbTable.split("\\.").toSeq match {
      case Seq(TieredCatalog.CatalogName, db, t) => Seq(db, t)
      case p @ Seq(_, _) => p
      case _ => fail(s"table must be '<db>.<table>', got '$dbTable'")
    }
    val e = TieredCatalog.lookup(parts.head, parts(1)).getOrElse(
      fail(s"unknown graft table '$dbTable' — register or CREATE it first"))
    TieredTable(SparkSession.active, e.path, e.pk, e.mergeOnRead,
      e.partitionBy, e.bloomCols, changeDataFeed = e.changeDataFeed,
      sortBy = e.sortBy)
  }

  private def p(name: String, dt: DataType,
                default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  /** One void maintenance procedure: fixed IN parameters, a body over
    * the decoded argument row, no result rows (state changes surface
    * through `$snapshots` like every other commit).
    */
  private case class Proc(procName: String, procDescription: String,
                          params: Seq[ProcedureParameter],
                          body: InternalRow => Unit)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDescription
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false // mutates table state
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      body(input)
      Collections.emptyIterator[Scan]()
    }
  }

  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString

  private val procs: Map[String, Proc] = Seq(
    Proc("tier",
      "fold committed hot-log segments into a new cold snapshot (the " +
        "lake tiering service's verb, run on the freshness schedule)",
      Seq(p("table", StringType)),
      r => { resolve(str(r, 0)).tier(); () }),
    Proc("compact",
      "rewrite the cold tier into one resolved snapshot; optional " +
        "sort columns give range-clustered output",
      Seq(p("table", StringType), p("sort_by", StringType, Some("''"))),
      r => {
        val sortBy = str(r, 1).split(",").map(_.trim).filter(_.nonEmpty)
        resolve(str(r, 0)).compact(sortBy.toSeq)
        ()
      }),
    Proc("zorder",
      "rewrite the cold tier clustered on the Morton curve over the " +
        "given columns",
      Seq(p("table", StringType), p("columns", StringType)),
      r => {
        val cols = str(r, 1).split(",").map(_.trim).filter(_.nonEmpty)
        if (cols.isEmpty) fail("zorder needs at least one column")
        resolve(str(r, 0)).compactZOrder(cols.toSeq)
        ()
      }),
    Proc("rollback_to_snapshot",
      "make an earlier snapshot's content current again (history moves " +
        "forward; nothing is deleted)",
      Seq(p("table", StringType), p("snapshot_id", LongType)),
      r => { resolve(str(r, 0)).rollbackTo(r.getLong(1)); () }),
    Proc("expire_snapshots",
      "drop snapshots committed before older_than_ms, always keeping " +
        "at least keep_last newest",
      Seq(p("table", StringType), p("older_than_ms", LongType),
        p("keep_last", IntegerType, Some("1"))),
      r => {
        resolve(str(r, 0)).expireOlderThan(r.getLong(1), r.getInt(2))
        ()
      }),
    Proc("vacuum",
      "keep the last keep_last snapshots; physically remove files only " +
        "they referenced",
      Seq(p("table", StringType), p("keep_last", IntegerType, Some("1"))),
      r => { resolve(str(r, 0)).vacuum(r.getInt(1)); () }),
    Proc("gc_orphans",
      "remove crash debris no surviving snapshot references (run with " +
        "no active writers)",
      Seq(p("table", StringType)),
      r => { resolve(str(r, 0)).gcOrphans(); () }),
    Proc("create_tag",
      "pin a snapshot (default: the current head) under an immutable " +
        "name — VERSION AS OF 'name' reads it and retention keeps it " +
        "until drop_tag",
      Seq(p("table", StringType), p("tag", StringType),
        p("snapshot_id", LongType, Some("-1"))),
      r => { resolve(str(r, 0)).createTag(str(r, 1), r.getLong(2)); () }),
    Proc("drop_tag",
      "remove a snapshot tag; the snapshot becomes ordinary history " +
        "(the next vacuum may reclaim it)",
      Seq(p("table", StringType), p("tag", StringType)),
      r => { resolve(str(r, 0)).dropTag(str(r, 1)); () }),
    Proc("cherrypick_snapshot",
      "re-apply one historical append onto the current head (the " +
        "selective-recovery verb after rollback_to_snapshot); " +
        "append-lineage snapshots only",
      Seq(p("table", StringType), p("snapshot_id", LongType)),
      r => { resolve(str(r, 0)).cherrypick(r.getLong(1)); () }),
    Proc("publish_wap",
      "publish a staged write-audit-publish commit: cherry-pick its " +
        "files onto the current head as a normal snapshot (stage with " +
        "spark.graft.wap.id + INSERT INTO; audit via VERSION AS OF)",
      Seq(p("table", StringType), p("wap_id", StringType)),
      r => { resolve(str(r, 0)).publishStage(str(r, 1)); () }),
    Proc("abandon_wap",
      "discard a staged write-audit-publish commit and its data files " +
        "— the audit said no",
      Seq(p("table", StringType), p("wap_id", StringType)),
      r => { resolve(str(r, 0)).abandonStage(str(r, 1)); () }),
    Proc("create_branch",
      "fork a mutable branch at the current head; INSERT INTO under " +
        "spark.graft.wap.branch accumulates appends on it, invisible " +
        "to main until fast_forward",
      Seq(p("table", StringType), p("branch", StringType)),
      r => { resolve(str(r, 0)).createBranch(str(r, 1)); () }),
    Proc("fast_forward",
      "publish every append accumulated on the branch onto the " +
        "current head as one snapshot, then delete the branch",
      Seq(p("table", StringType), p("branch", StringType)),
      r => { resolve(str(r, 0)).fastForward(str(r, 1)); () }),
    Proc("drop_branch",
      "delete a branch and its unpublished data files",
      Seq(p("table", StringType), p("branch", StringType)),
      r => { resolve(str(r, 0)).dropBranch(str(r, 1)); () }),
    Proc("add_partition_field",
      "evolve the partition spec (Iceberg's ADD PARTITION FIELD): " +
        "future writes hive-partition by the added column too; " +
        "existing dirs keep their layout — reads union both vintages " +
        "and prune each by what it has (dir names new, file stats " +
        "old); Iceberg export is multi-spec. Same verb as the DDL " +
        "spelling ALTER TABLE t ADD PARTITION FIELD col",
      Seq(p("table", StringType), p("column", StringType)),
      r => PartitionEvolution.addField(str(r, 0), str(r, 1))),
    Proc("drop_partition_field",
      "evolve the partition spec (Iceberg's DROP PARTITION FIELD): " +
        "future writes stop hive-partitioning by the column (its " +
        "values move into the data pages); existing dirs keep their " +
        "layout and serve the column from their dir names; Iceberg " +
        "export keeps the old spec for old manifests and emits a new " +
        "spec id without the field. Same verb as the DDL spelling " +
        "ALTER TABLE t DROP PARTITION FIELD col",
      Seq(p("table", StringType), p("column", StringType)),
      r => PartitionEvolution.dropField(str(r, 0), str(r, 1))),
    Proc("replace_partition_field",
      "evolve the partition spec in ONE step (Iceberg's REPLACE " +
        "PARTITION FIELD): future writes hive-partition by the new " +
        "column instead of the old; one new spec id, old vintages " +
        "keep their layout. Same verb as the DDL spelling " +
        "ALTER TABLE t REPLACE PARTITION FIELD old WITH new",
      Seq(p("table", StringType), p("old_column", StringType),
        p("new_column", StringType)),
      r => PartitionEvolution.replaceField(str(r, 0), str(r, 1), str(r, 2)))
  ).map(pr => pr.procName -> pr).toMap

  def load(ident: Identifier): UnboundProcedure = {
    if (ident.namespace().toSeq != Seq(Namespace))
      fail(s"unknown procedure namespace ${ident.namespace().mkString(".")} " +
        s"— procedures live under $Namespace")
    procs.getOrElse(ident.name().toLowerCase,
      fail(s"unknown procedure ${ident.name()} — available: " +
        procs.keys.toSeq.sorted.mkString(", ")))
  }

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq(Namespace) || namespace.isEmpty)
      procs.keys.toSeq.sorted
        .map(n => Identifier.of(Array(Namespace), n)).toArray
    else Array.empty

}
