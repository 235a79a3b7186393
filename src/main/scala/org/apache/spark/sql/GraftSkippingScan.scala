package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.connector.expressions.{Expressions, FieldReference, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
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
                               partitionCols: Seq[String] = Nil,
                               streamFactory: Option[String =>
                                 org.apache.spark.sql.connector.read.streaming.MicroBatchStream] = None)
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
    val keptSet = kept.toSet
    val keptEntries =
      if (kept.size == total) listed else listed.filter(e => keptSet(e._1))
    val staticScan =
      if (sourceFilters.isEmpty || kept.size == total) inner.build()
      else buildOver(kept)
    new GraftRuntimeScan(spark, tableName, options, fullSchema,
      keptEntries, staticScan, pushedExprs, required, partitionCols,
      buildOver, streamFactory)
  }

  /** Rebuild the scan over an explicit surviving-file list. The FULL
    * table schema is passed as the user-specified schema so a column
    * whose only carrier file was pruned still resolves (as nulls)
    * instead of vanishing from the scan output. For a Hive-partitioned
    * root the caller supplies basePath in `options`, so partition-
    * column discovery from the dir names survives the switch to a file
    * list.
    */
  private def buildOver(files: Seq[String]): Scan = {
    val pruned = ParquetTable(tableName, spark, options, files,
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

/** The scan a [[GraftSkippingScanBuilder]] actually returns: the
  * statically-pruned parquet scan, wrapped with the two DSv2 faces a
  * 100 TB planner needs and a stock file scan cannot give us over a
  * sidecar-indexed tiered table:
  *
  *  - '''[[SupportsReportStatistics]]''' — size from the underlying
  *    file scan, EXACT row count from the `_graft_stats` sidecars of
  *    the surviving files (every file carries one → sum; else defer
  *    to the file scan's estimate). Without a number here a multi-root
  *    table inherits `defaultSizeInBytes` and is never chosen as the
  *    broadcast side of a join.
  *  - '''[[SupportsRuntimeV2Filtering]]''' — Spark's dynamic partition
  *    pruning hands the scan the build-side join keys at EXECUTION
  *    time as `IN (...)` predicates; we re-prune the file list against
  *    them using (a) Hive-layout `col=value` path segments for
  *    partition columns and (b) the same min/max + bloom sidecar check
  *    the static pushdown uses for data columns — Iceberg's
  *    runtime-filtering behavior, driven from one already-computed
  *    listing. Skipping is advisory: surviving files still flow
  *    through the join, so a conservative keep never affects results.
  *
  * Re-planning after `filter()` rebuilds the child scan over the
  * narrowed file list via the builder's `rebuild` closure; the batch
  * is cached per file-list state so reader factory and partitions are
  * always a consistent snapshot.
  */
class GraftRuntimeScan(spark: SparkSession, tableName: String,
                       options: CaseInsensitiveStringMap,
                       fullSchema: StructType,
                       keptEntries: Seq[FileStats.FileEntry],
                       staticScan: Scan,
                       pushedExprs: Seq[Expression],
                       required: Option[StructType],
                       partitionCols: Seq[String],
                       rebuild: Seq[String] => Scan,
                       streamFactory: Option[String =>
                         org.apache.spark.sql.connector.read.streaming.MicroBatchStream] = None)
    extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeV2Filtering
    with SupportsReportPartitioning {

  /** Streaming face of the same table (the log-tail source) when the
    * owning table wired one in; otherwise the default refusal stands.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    streamFactory.map(_(checkpointLocation)).getOrElse(
      throw new UnsupportedOperationException(
        s"$tableName: micro-batch scan is not supported"))

  @volatile private var runtimeEntries: Option[Seq[FileStats.FileEntry]] = None
  @volatile private var effective: (Option[Seq[FileStats.FileEntry]], Scan) =
    (None, staticScan)

  override def readSchema(): StructType = staticScan.readSchema()

  override def description(): String = {
    val rt = runtimeEntries.fold("")(e =>
      s", runtime-kept ${e.size}/${keptEntries.size}")
    s"GraftRuntimeScan($tableName$rt) ${staticScan.description()}"
  }

  // ---- statistics ----

  /** Exact row total from the sidecars of the CURRENT surviving files;
    * None when any file lacks one (then the file scan's byte-based
    * estimate stands alone).
    */
  private def sidecarRows(entries: Seq[FileStats.FileEntry]): Option[Long] = {
    var total = 0L
    entries.foreach { case (_, stats, _) =>
      if (stats.isEmpty) return None
      val r = stats.head._2.rows
      if (r < 0) return None
      total += r
    }
    Some(total)
  }

  override def estimateStatistics(): Statistics = {
    val entries = runtimeEntries.getOrElse(keptEntries)
    val inner = currentScan match {
      case s: SupportsReportStatistics => Some(s.estimateStatistics())
      case _ => None
    }
    val size = inner.map(_.sizeInBytes).getOrElse(java.util.OptionalLong.empty())
    val rows = sidecarRows(entries) match {
      case Some(n) => java.util.OptionalLong.of(n)
      case None =>
        inner.map(_.numRows).getOrElse(java.util.OptionalLong.empty())
    }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = size
      override def numRows(): java.util.OptionalLong = rows
    }
  }

  // ---- runtime filtering ----

  /** Columns we can act on at runtime: Hive partition columns (values
    * live in the directory names) plus any column that has range stats
    * or a bloom in at least one sidecar — RESTRICTED to the scan's
    * pruned output. Spark's PartitionPruning rule RESOLVES every
    * claimed attribute against the relation's output and raises an
    * AnalysisException on a miss, so claiming a pruned-away column
    * doesn't just disable DPP — it fails the query.
    */
  override def filterAttributes(): Array[NamedReference] = {
    val visible = readSchema().fieldNames.toSet
    val statCols = keptEntries.iterator
      .flatMap(e => e._2.keysIterator ++ e._3.keysIterator).toSet
    (partitionCols ++ statCols).distinct.filter(visible)
      .map(c => FieldReference.column(c): NamedReference).toArray
  }

  override def filter(predicates: Array[Predicate]): Unit = {
    val v1 = org.apache.spark.sql.internal.connector.PredicateUtils
      .toV1(predicates).toSeq
    if (v1.isEmpty) return
    val survivors = keptEntries.filter { case (path, stats, blooms) =>
      v1.forall(f => FileStats.mayMatch(stats, f) &&
        FileStats.bloomMayMatch(blooms, f) &&
        GraftPartitionPathFilter.mayMatch(path, partitionCols, f))
    }
    FileStats.recordSkip(s"$tableName@runtime", survivors.size,
      keptEntries.size)
    if (survivors.size < keptEntries.size) runtimeEntries = Some(survivors)
  }

  /** The scan matching the current runtime-filter state; rebuilt (and
    * cached) when `filter` narrowed the file list.
    */
  private def currentScan: Scan = {
    val want = runtimeEntries
    val cached = effective
    if (cached._1 eq want) cached._2
    else {
      val s = runtimeEntries match {
        case Some(e) if e.isEmpty =>
          new GraftEmptyScan(tableName, staticScan.readSchema())
        case Some(e) => rebuild(e.map(_._1))
        case None => staticScan
      }
      effective = (want, s)
      s
    }
  }

  // ---- storage-partitioned join (SPJ) ----

  /** Hive partition columns as KEY-GROUPED OUTPUT PARTITIONING — the
    * DSv2 contract behind storage-partitioned joins: two tables
    * partitioned on the join key report `KeyGroupedPartitioning` over
    * identity transforms, each input partition carries its typed key
    * ([[HasPartitionKey]]), and `EnsureRequirements` plans the join
    * with NO shuffle on either side — Iceberg's SPJ behavior, the
    * single biggest exchange-eliminator for recurring fact⋈fact joins
    * at 100 TB (both sides already live partitioned on the key; the
    * join should cost zero data movement).
    *
    * Gated on Spark's own `spark.sql.sources.v2.bucketing.enabled` AND
    * on every file of the scan yielding a typed key from its
    * `col=value` path segments (a single unkeyable file → report
    * [[UnknownPartitioning]]; correctness never depends on the claim).
    * Only claimed when every partition column survives column pruning —
    * the planner resolves the claimed keys against the scan output.
    */
  private def spjUsable: Boolean =
    partitionCols.nonEmpty &&
      org.apache.spark.sql.internal.SQLConf.get.v2BucketingEnabled && {
        val visible = readSchema().fieldNames.toSet
        partitionCols.forall(visible)
      }

  /** Entries grouped by typed partition key (raw segment strings as the
    * group key — [[InternalRow]] has no value equality); None when any
    * file can't prove its key.
    */
  private def keyedGroups(entries: Seq[FileStats.FileEntry])
      : Option[Seq[(InternalRow, Seq[String])]] = {
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[Seq[String], (InternalRow, scala.collection.mutable.Buffer[String])]
    entries.foreach { case (path, _, _) =>
      val raw = partitionCols.map(c =>
        GraftPartitionPathFilter.segmentOf(path, c).getOrElse(return None))
      groups.get(raw) match {
        case Some((_, files)) => files += path
        case None =>
          val key = GraftPartitionKeys.typedKey(raw, partitionCols,
            fullSchema).getOrElse(return None)
          groups(raw) = (key, scala.collection.mutable.Buffer(path))
      }
    }
    Some(groups.values.map { case (k, fs) => (k, fs.toSeq) }.toSeq)
  }

  override def outputPartitioning(): Partitioning =
    if (spjUsable) keyedGroups(keptEntries) match {
      case Some(groups) if groups.nonEmpty =>
        new KeyGroupedPartitioning(
          partitionCols.map(c => Expressions.identity(c):
            org.apache.spark.sql.connector.expressions.Expression).toArray,
          groups.size)
      case _ => new UnknownPartitioning(0)
    } else new UnknownPartitioning(0)

  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    if (spjUsable) {
      val entries = runtimeEntries.getOrElse(keptEntries)
      keyedGroups(entries) match {
        case Some(groups) if groups.nonEmpty =>
          // one rebuilt child scan per key: every wrapped split carries
          // the group's typed key for Spark's partition grouping (the
          // per-group reader parameters are identical, so one factory
          // serves them all — see createReaderFactory)
          return groups.flatMap { case (key, files) =>
            rebuild(files).toBatch.planInputPartitions()
              .map(GraftKeyedPartition(key, _))
          }.toArray
        case _ =>
      }
    }
    currentScan.toBatch.planInputPartitions()
  }
  override def createReaderFactory(): PartitionReaderFactory =
    GraftKeyedReaderFactory(currentScan.toBatch.createReaderFactory())
}

/** Typed partition-key decoding from Hive `col=value` path segments —
  * the values [[HasPartitionKey]] hands Spark must match the partition
  * columns' declared Spark types exactly (they are compared across both
  * join sides). Types with an unambiguous round-trip only; anything
  * else declines and the scan reports unknown partitioning.
  */
object GraftPartitionKeys {
  private val HiveNull = "__HIVE_DEFAULT_PARTITION__"

  def typedKey(raw: Seq[String], cols: Seq[String], schema: StructType)
      : Option[InternalRow] = {
    val vals = new Array[Any](cols.length)
    var i = 0
    while (i < cols.length) {
      val seg = raw(i)
      if (seg == HiveNull) vals(i) = null
      else {
        val dt = schema.fields.find(_.name == cols(i))
          .map(_.dataType).getOrElse(return None)
        val v: Any = try dt match {
          case StringType => UTF8String.fromString(seg)
          case IntegerType => seg.toInt
          case LongType => seg.toLong
          case ShortType => seg.toShort
          case ByteType => seg.toByte
          case BooleanType => seg.toBoolean
          case DateType => java.time.LocalDate.parse(seg).toEpochDay.toInt
          case _ => return None
        } catch { case _: RuntimeException => return None }
        vals(i) = v
      }
      i += 1
    }
    Some(new GenericInternalRow(vals))
  }
}

/** A child file split plus the typed partition key of the Hive
  * directory it came from — what makes the scan's partitions
  * key-groupable by Spark's SPJ machinery.
  */
case class GraftKeyedPartition(key: InternalRow, inner: InputPartition)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Unwraps [[GraftKeyedPartition]] before delegating; non-keyed
  * partitions pass straight through, so the same factory serves both
  * the grouped and the flat planning paths.
  */
case class GraftKeyedReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case GraftKeyedPartition(_, i) => i
    case other => other
  }
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = inner.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    inner.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))
}

/** Zero-partition scan for the "runtime filter excluded every file"
  * case — rebuilding a parquet scan over an empty file list is not a
  * shape Spark's file index is designed for.
  */
class GraftEmptyScan(tableName: String, schema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"GraftEmptyScan($tableName)"
  override def planInputPartitions(): Array[InputPartition] = Array.empty
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftAggReaderFactory // never invoked: zero partitions
}

/** Prunes files by their Hive-layout `col=value` path segments against
  * runtime (or any v1) filters — dynamic partition pruning's file-level
  * act. Only equality shapes are decided (`=`, `IN`, null checks);
  * everything else conservatively keeps the file. A file whose path
  * carries no segment for the column keeps too.
  */
object GraftPartitionPathFilter {
  import org.apache.spark.sql.sources._

  private def unescape(s: String): String =
    graft.storage.PartitionPaths.unescape(s)

  private val HiveNull = "__HIVE_DEFAULT_PARTITION__"

  private[sql] def segmentOf(path: String, col: String): Option[String] = {
    val prefix = col + "="
    path.split('/').collectFirst {
      case seg if seg.startsWith(prefix) =>
        unescape(seg.substring(prefix.length))
    }
  }

  /** Literal rendered in the same form Hive writes it into the dir
    * name (dates ISO, numbers plain, strings verbatim).
    */
  private def render(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some(s)
    case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
    case d: java.sql.Date => Some(d.toString)
    case d: java.time.LocalDate => Some(d.toString)
    case n @ (_: java.lang.Integer | _: java.lang.Long | _: java.lang.Short |
              _: java.lang.Byte | _: java.lang.Boolean) => Some(n.toString)
    case _ => None // timestamps/decimals/doubles: formatting too
                   // engine-sensitive to skip on — keep the file
  }

  def mayMatch(path: String, partitionCols: Seq[String], f: Filter)
      : Boolean = f match {
    case EqualTo(a, v) if partitionCols.contains(a) =>
      decide(path, a, seg => render(v).forall(r => seg == r))
    case EqualNullSafe(a, null) if partitionCols.contains(a) =>
      decide(path, a, seg => seg == HiveNull)
    case EqualNullSafe(a, v) if partitionCols.contains(a) =>
      decide(path, a, seg => render(v).forall(r => seg == r))
    case In(a, vs) if partitionCols.contains(a) =>
      if (vs == null) true
      else decide(path, a, seg =>
        vs.exists(v => v != null && render(v).forall(r => seg == r)))
    case IsNull(a) if partitionCols.contains(a) =>
      decide(path, a, seg => seg == HiveNull)
    case IsNotNull(a) if partitionCols.contains(a) =>
      decide(path, a, seg => seg != HiveNull)
    case And(l, r) =>
      mayMatch(path, partitionCols, l) && mayMatch(path, partitionCols, r)
    case Or(l, r) =>
      mayMatch(path, partitionCols, l) || mayMatch(path, partitionCols, r)
    case _ => true
  }

  /** A null partition segment can only satisfy the null checks; a
    * missing segment keeps the file (path layout unknown → advisory
    * skip declines).
    */
  private def decide(path: String, col: String, ok: String => Boolean)
      : Boolean =
    segmentOf(path, col).forall(ok)
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
