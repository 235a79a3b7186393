package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.storage.FileStats

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
                               inner: ScanBuilder)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  private var pushedExprs: Seq[Expression] = Nil
  private var required: Option[StructType] = None

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
    val sourceFilters = pushedExprs.flatMap(e =>
      DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = false))
    val (kept, total) = FileStats.prune(roots, sourceFilters)
    FileStats.recordSkip(tableName, kept.size, total)
    if (sourceFilters.isEmpty || kept.size == total) inner.build()
    else {
      // rebuild the scan over the surviving files only. The FULL table
      // schema is passed as the user-specified schema so a column whose
      // only carrier file was pruned still resolves (as nulls) instead
      // of vanishing from the scan output.
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
