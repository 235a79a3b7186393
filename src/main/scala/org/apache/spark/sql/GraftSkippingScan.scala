package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.connector.expressions.{FieldReference, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.storage.FileStats
import graft.storage.FileStats.ColStat

/** Scan builder adding MANIFEST-LEVEL FILE SKIPPING to the SQL read
  * path of an (unpartitioned) tiered table: pushed filters are
  * translated to data-source filters and checked against each file's
  * `_graft_stats` footer min/max sidecar; files that provably hold no
  * matching row are dropped from the scan's file list before Spark
  * ever opens them. The surviving scan is a stock vectorized
  * [[ParquetTable]] scan — same pushdown, same column pruning — over
  * fewer files; correctness never depends on the skip (the pushed
  * predicates are still evaluated).
  *
  * This is the DSv2 face of [[graft.storage.TieredTable.readColdWhere]]
  * — Iceberg's planFiles() bounds-filtering step, done here at scan
  * build time from one sidecar read per directory.
  */
class GraftSkippingScanBuilder(spark: SparkSession, tableName: String,
                               roots: Seq[String], fullSchema: StructType,
                               options: CaseInsensitiveStringMap,
                               inner: ScanBuilder,
                               partitionCols: Seq[String] = Nil)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  private var pushedExprs: Seq[Expression] = Nil
  private var required: Option[StructType] = None
  private var aggResult: Option[(StructType, Seq[Any])] = None

  /** ONE filesystem walk + sidecar parse per scan build: Spark calls
    * this builder through several pushdown hooks (supportComplete →
    * pushAggregation → build), and the roots are pinned at table load,
    * so the listing is computed once and shared — per-plan cost stays
    * O(1 walk), the number the 100 TB planning story depends on.
    */
  private lazy val listed = FileStats.listWithSidecars(roots)
  private lazy val listedStats = listed.map(e => (e._1, e._2))

  /** METADATA-ONLY AGGREGATES: an unfiltered, ungrouped COUNT(*) /
    * COUNT(col) / MIN / MAX is answered entirely from the stats
    * sidecars — zero data files opened, the Iceberg answer-count-from-
    * manifests capability. Refused (→ normal scan + agg) whenever any
    * file lacks the needed exact stats, a filter was pushed, or the
    * value domain can't round-trip exactly (strings/decimals/doubles
    * stay on the scan path; long/int/date/timestamp are exact).
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    planMetadataAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    aggResult = planMetadataAgg(agg)
    aggResult.isDefined
  }

  private def col1(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 =>
      Some(f.fieldNames.head)
    case _ => None
  }

  private def planMetadataAgg(agg: Aggregation)
      : Option[(StructType, Seq[Any])] = {
    if (agg.groupByExpressions.nonEmpty || pushedExprs.nonEmpty) return None
    val files = listedStats
    if (files.isEmpty) return planOverEmpty(agg)
    // every file must carry a sidecar (rows known) — a statless file
    // makes every count/bound unknown
    if (files.exists(_._2.isEmpty)) return None
    def rowsOf(stats: Map[String, ColStat]): Long = stats.head._2.rows
    if (files.exists(f => rowsOf(f._2) < 0)) return None
    val fields = scala.collection.mutable.ArrayBuffer.empty[StructField]
    val values = scala.collection.mutable.ArrayBuffer.empty[Any]
    agg.aggregateExpressions.foreach {
      case _: CountStar =>
        fields += StructField(s"agg_${fields.size}", LongType, nullable = false)
        values += files.map(f => rowsOf(f._2)).sum
      case c: Count if !c.isDistinct =>
        val name = col1(c.column).getOrElse(return None)
        // partition-column values live in DIRECTORY names, invisible to
        // file stats — only the scan can count/bound them
        if (partitionCols.contains(name)) return None
        // per file: rows − nulls; a file without the column (schema
        // evolution) reads as all-null there → contributes 0
        var total = 0L
        files.foreach { case (_, stats) =>
          stats.get(name) match {
            case Some(s) => if (s.nulls < 0) return None
              else total += rowsOf(stats) - s.nulls
            case None => // column absent from this file → all null → +0
          }
        }
        fields += StructField(s"agg_${fields.size}", LongType, nullable = false)
        values += total
      case m: Min =>
        val name = col1(m.column).getOrElse(return None)
        if (partitionCols.contains(name)) return None
        val (dt, v) = boundOf(files, name, takeMin = true).getOrElse(return None)
        fields += StructField(s"agg_${fields.size}", dt, nullable = true)
        values += v
      case m: Max =>
        val name = col1(m.column).getOrElse(return None)
        if (partitionCols.contains(name)) return None
        val (dt, v) = boundOf(files, name, takeMin = false).getOrElse(return None)
        fields += StructField(s"agg_${fields.size}", dt, nullable = true)
        values += v
      case _ => return None
    }
    Some((StructType(fields.toSeq), values.toSeq))
  }

  /** Zero-file table: COUNT → 0, MIN/MAX → null. */
  private def planOverEmpty(agg: Aggregation)
      : Option[(StructType, Seq[Any])] = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[StructField]
    val values = scala.collection.mutable.ArrayBuffer.empty[Any]
    agg.aggregateExpressions.foreach {
      case _: CountStar | _: Count =>
        fields += StructField(s"agg_${fields.size}", LongType, nullable = false)
        values += 0L
      case m: Min =>
        val name = col1(m.column).getOrElse(return None)
        val dt = sparkTypeOf(name).getOrElse(return None)
        fields += StructField(s"agg_${fields.size}", dt, nullable = true)
        values += null
      case m: Max =>
        val name = col1(m.column).getOrElse(return None)
        val dt = sparkTypeOf(name).getOrElse(return None)
        fields += StructField(s"agg_${fields.size}", dt, nullable = true)
        values += null
      case _ => return None
    }
    Some((StructType(fields.toSeq), values.toSeq))
  }

  private def sparkTypeOf(name: String): Option[DataType] =
    fullSchema.fields.find(_.name == name).map(_.dataType) match {
      case Some(t @ (LongType | IntegerType | DateType |
                     TimestampType | TimestampNTZType)) => Some(t)
      case _ => None // strings/doubles/decimals: stay on the scan path
    }

  /** Exact global bound of `name` across all files, as (Spark type,
    * internal value). None = not provable from stats. Files without
    * the column contribute nothing; all-null files have no bound but
    * don't block others (MIN/MAX ignore nulls).
    */
  private def boundOf(files: Seq[(String, Map[String, ColStat])],
                      name: String, takeMin: Boolean)
      : Option[(DataType, Any)] = {
    val dt = sparkTypeOf(name).getOrElse(return None)
    val expectedTag = dt match {
      case LongType | IntegerType => "long"
      case DateType => "date"
      case TimestampType => "ts"
      case TimestampNTZType => "tsn"
      case _ => return None
    }
    var best: Option[Long] = None
    files.foreach { case (_, stats) =>
      stats.get(name) match {
        case None => // column absent here → contributes nothing
        case Some(s) if s.tag != expectedTag => return None
        case Some(s) =>
          (s.min, s.max) match {
            case (Some(mn), Some(mx)) =>
              val v = (if (takeMin) mn else mx).toLong
              best = Some(best.fold(v)(b =>
                if (takeMin) math.min(b, v) else math.max(b, v)))
            case _ =>
              // bounds unknown: only safe if the file is ALL nulls
              if (!(s.nulls >= 0 && s.rows >= 0 && s.nulls == s.rows))
                return None
          }
      }
    }
    val internal: Any = best match {
      case None => null
      case Some(v) => dt match {
        case LongType | TimestampType | TimestampNTZType => v
        case IntegerType | DateType => v.toInt
        case _ => return None
      }
    }
    Some((dt, internal))
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushedExprs = filters
    inner match {
      case c: org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =>
        c.pushFilters(filters)
      case _ => filters
    }
  }

  override def pushedFilters: Array[Predicate] = inner match {
    case c: org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =>
      c.pushedFilters
    case _ => Array.empty
  }

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = Some(requiredSchema)
    inner match {
      case c: SupportsPushDownRequiredColumns => c.pruneColumns(requiredSchema)
      case _ =>
    }
  }

  override def build(): Scan = {
    aggResult match {
      case Some((schema, values)) =>
        FileStats.recordSkip(tableName, 0, listed.size)
        return new GraftMetadataAggScan(tableName, schema, values)
      case None =>
    }
    val sourceFilters = pushedExprs.flatMap(e =>
      DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = false))
    val (kept, total) = FileStats.pruneListed(listed, sourceFilters)
    FileStats.recordSkip(tableName, kept.size, total)
    if (sourceFilters.isEmpty || kept.size == total) inner.build()
    else {
      // rebuild the scan over the surviving files only. The FULL table
      // schema is passed as the user-specified schema so a column whose
      // only carrier file was pruned still resolves (as nulls) instead
      // of vanishing from the scan output. For a Hive-partitioned root
      // the caller supplies basePath in `options`, so partition-column
      // discovery from the dir names survives the switch to a file list.
      val pruned = ParquetTable(tableName, spark, options, kept,
        Some(fullSchema), classOf[ParquetFileFormat])
      val b = pruned.newScanBuilder(options)
      b match {
        case c: org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters =>
          c.pushFilters(pushedExprs)
        case _ =>
      }
      (b, required) match {
        case (c: SupportsPushDownRequiredColumns, Some(r)) => c.pruneColumns(r)
        case _ =>
      }
      b.build()
    }
  }
}

/** One-row scan serving a fully-pushed-down aggregate straight from
  * the stats sidecars — the "answer COUNT(*) from manifests" path.
  */
class GraftMetadataAggScan(tableName: String, schema: StructType,
                           values: Seq[Any]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftMetadataAggScan($tableName, metadata-only)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftAggReaderFactory
}

case class GraftAggPartition(values: Seq[Any]) extends InputPartition

class GraftAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var served = false
      override def next(): Boolean =
        if (served) false else { served = true; true }
      override def get(): InternalRow =
        new GenericInternalRow(
          p.asInstanceOf[GraftAggPartition].values.toArray)
      override def close(): Unit = ()
    }
}
