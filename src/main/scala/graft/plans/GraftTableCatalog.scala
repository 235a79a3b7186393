package graft.plans

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.storage.TieredTable

/** A DataSource-V2 [[TableCatalog]] exposing tiered tables under a
  * three-level namespace (the reference's `catalog.database.table`,
  * /root/reference/README.md:129-135,270-275):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftTableCatalog].getName)
  *   TieredCatalog.register("fluss", "enriched_orders", path)
  *   spark.sql("SELECT * FROM graft.fluss.enriched_orders")            // hot ∪ cold
  *   spark.sql("SELECT * FROM graft.fluss.enriched_orders__cold")      // Trino role
  *   spark.sql("SELECT * FROM graft.fluss.enriched_orders__snapshots") // metadata
  * }}}
  *
  * Data reads resolve to Spark's own parquet [[ParquetTable]] over the
  * manifest's file list — full vectorized scans, predicate pushdown and
  * column pruning, zero custom read path. The hot/cold boundary comes
  * from ONE manifest read at loadTable time (snapshot isolation). PK
  * tables are copy-on-write at commit, so their cold tier is already
  * resolved parquet; merge-on-read PK tables are an API-level surface
  * (`readCold`) and rejected here.
  */
class GraftTableCatalog extends TableCatalog {
  private var catName: String = TieredCatalog.CatalogName

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name

  override def name(): String = catName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    TieredCatalog.listTables(namespace.mkString("."))
      .map(t => Identifier.of(namespace, t)).toArray

  override def loadTable(ident: Identifier): Table = {
    val spark = SparkSession.active
    val db = ident.namespace().mkString(".")
    val VersionSuffix = "^(.*)__v([0-9]+)$".r
    val (base, mode) = ident.name match {
      case n if n.endsWith("__snapshots") =>
        (n.stripSuffix("__snapshots"), "snapshots")
      case n if n.endsWith("__cold") => (n.stripSuffix("__cold"), "cold")
      case VersionSuffix(n, v) => (n, s"v$v") // time travel: VERSION AS OF
      case n => (n, "union")
    }
    val e = TieredCatalog.lookup(db, base)
      .getOrElse(throw new NoSuchTableException(
        Seq(catName, db, ident.name)))
    require(!e.mergeOnRead || mode == "snapshots",
      s"merge-on-read PK table $db.$base is not SQL-addressable; use the API")
    val t = TieredTable(spark, e.path, e.pk, e.mergeOnRead)
    mode match {
      case "snapshots" =>
        new SnapshotsTable(ident.toString,
          (1L to t.latestSnapshotId).flatMap(t.snapshot).map(s =>
            (s.id, s.op, s.rowsAdded, s.tieredSeg, s.committedAt * 1000L)))
      case "cold" =>
        parquet(spark, ident.toString, t.coldFiles)
      case v if v.startsWith("v") =>
        val id = v.drop(1).toLong
        val snap = t.snapshot(id).getOrElse(
          throw new NoSuchTableException(Seq(catName, db, ident.name)))
        parquet(spark, ident.toString, snap.files)
      case _ =>
        parquet(spark, ident.toString, t.unionPaths)
    }
  }

  private def parquet(spark: SparkSession, name: String,
                      paths: Seq[String]): Table =
    // mergeSchema so SQL reads of union/cold/time-travel paths agree
    // with the API's readUnion/readCold on schema-evolved tables —
    // without it the scan picks one file's footer schema and silently
    // omits later-added columns.
    ParquetTable(name, spark,
      new CaseInsensitiveStringMap(Map("mergeSchema" -> "true").asJava),
      paths, None, classOf[ParquetFileFormat])

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "register tiered tables via TieredCatalog.register")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean =
    TieredCatalog.unregister(ident.namespace().mkString("."), ident.name)

  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")
}

/** In-memory DSv2 table serving the snapshot-metadata listing — the rows
  * are driver-side manifest data (O(#snapshots)), shipped to one task.
  */
class SnapshotsTable(tableName: String,
                     rows: Seq[(Long, String, Long, Long, Long)])
    extends Table with SupportsRead {

  override def name(): String = tableName

  override def schema(): StructType = SnapshotsTable.Schema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = SnapshotsTable.Schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(SnapshotsPartition(rows))
      override def createReaderFactory(): PartitionReaderFactory =
        new SnapshotsReaderFactory
    }
}

object SnapshotsTable {
  val Schema: StructType = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("rows_added", LongType, nullable = false),
    StructField("tiered_seg", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false)))
}

case class SnapshotsPartition(rows: Seq[(Long, String, Long, Long, Long)])
    extends InputPartition

class SnapshotsReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = p.asInstanceOf[SnapshotsPartition].rows.iterator
      private var cur: (Long, String, Long, Long, Long) = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](
          cur._1, UTF8String.fromString(cur._2), cur._3, cur._4, cur._5))
      override def close(): Unit = ()
    }
}
