package graft.operators

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.storage.TieredTable

/** A continuously-maintained materialized aggregate — the runner that
  * turns [[IncrementalAgg]]'s delta algebra plus
  * [[TieredTable.changelogSince]]'s cursor into the reference's
  * always-fresh `nation_revenue` table
  * (/root/reference/README.md:196-200,247-250) without a standing
  * stream job.
  *
  * Exactly-once by construction: each [[refresh]] commits the merged
  * state via [[TieredTable.commitOverwrite]] with a tag that ENCODES
  * the new cursor, so state and cursor are one atomic snapshot — a
  * maintainer that crashes between apply and commit replays into a tag
  * no-op, and the cursor read on restart ([[cursor]]) comes from the
  * state table itself, not a side file that could drift.
  *
  * Scale: a refresh costs O(|changelog delta| + |state|) — the delta
  * aggregates map-side to per-group partials, one full-outer key join
  * merges them, the base table is never re-read (IncrementalAgg's
  * contract). The follower thread only schedules; every data move is a
  * Spark job. Single-maintainer contract: run ONE follower per state
  * table (the commit tags make a second one harmless but useless).
  */
class MaterializedView(source: TieredTable, state: TieredTable,
                       keyCols: Seq[String], groupCols: Seq[String],
                       valCol: String, sumCol: String = "sum_v",
                       cntCol: String = "cnt",
                       extraSums: Seq[(String, String)] = Nil,
                       mins: Seq[(String, String)] = Nil,
                       maxs: Seq[(String, String)] = Nil,
                       avgs: Seq[(String, String)] = Nil) {
  require(groupCols.nonEmpty, "need at least one group column")

  /** All maintained sums: (delta value column → state alias). The
    * primary (valCol, sumCol) pair plus any `extraSums` — any number
    * of SUM columns ride the same one-aggregation + one-merge-join
    * maintenance step ([[IncrementalAgg.applyDeltaMulti]]).
    */
  private val sums: Seq[(String, String)] = (valCol -> sumCol) +: extraSums

  /** The view's full aggregate vocabulary. MIN/MAX retraction repair
    * reads the source AS OF the delta's snapshot for the affected
    * groups only ([[IncrementalAgg.applyDeltaFull]]); AVG rides hidden
    * (sum, count) accumulator columns in the state table.
    */
  private val spec = IncrementalAgg.AggSpec(sums, cntCol, mins, maxs, avgs)

  private val CursorTag = "mv-cursor-"
  private val running = new AtomicBoolean(false)
  @volatile private var follower: Option[Thread] = None
  /** Last error a follower step hit, if any — a transient failure (a
    * commit conflict, an interrupted Spark job) must not silently kill
    * the maintenance thread, so the loop records and retries on the
    * next tick; operators poll this for alerting. Cleared by the next
    * successful step.
    */
  @volatile var lastError: Option[Throwable] = None

  /** The source snapshot this view is current through — persisted in
    * the state table's latest snapshot tag; 0 = never refreshed
    * (bootstrap pending).
    */
  def cursor: Long = {
    // Scan snapshots newest-first rather than trusting only the head:
    // an untagged maintenance commit on the state table (compact(),
    // gcOrphans' rewrite, a manual commit) is CURSOR-TRANSPARENT — the
    // view's watermark is the newest mv-cursor-<digits> tag anywhere in
    // the retained history, not whatever happens to be the head.
    // toLongOption (not toLong) so a foreign tag that merely shares the
    // prefix is skipped, never a crash.
    Iterator.iterate(state.latestSnapshotId)(_ - 1L)
      .takeWhile(_ >= 1L)
      .flatMap(state.snapshot)
      .flatMap { s =>
        if (s.tag.startsWith(CursorTag))
          s.tag.drop(CursorTag.length).toLongOption
        else None
      }
      .nextOption()
      .getOrElse(0L)
  }

  /** The maintained aggregate as of the last refresh (hidden AVG
    * accumulator columns projected away).
    */
  def view(): DataFrame = {
    val hidden = avgs.map(a => spec.avgSum(a._2)) ++
      avgs.map(a => spec.avgCnt(a._2))
    state.readCold().drop(hidden: _*)
  }

  /** One maintenance step: poll the source changelog past the
    * persisted cursor, apply it to the state, commit state+cursor as
    * one tagged overwrite. Returns true when a delta was applied,
    * false when the view was already current.
    */
  def refresh(): Boolean = synchronized {
    val from = cursor
    val (to, delta) = source.changelogSince(from, keyCols)
    if (to == from) return false
    val cur =
      if (from == 0L) emptyState(delta)
      else state.readCold()
    val next = IncrementalAgg.applyDeltaFull(cur, delta, groupCols, spec,
      source.readColdAsOf(to))
    state.commitOverwrite(next, tag = Some(s"$CursorTag$to"))
    true
  }

  /** Follow the source continuously: a daemon thread calling
    * [[refresh]] every `intervalMs` until [[stop]] — the freshness
    * knob, same contract as the reference's `table.datalake.freshness`.
    */
  def start(intervalMs: Long = 1000L): Unit = synchronized {
    if (running.compareAndSet(false, true)) {
      val t = new Thread(() => {
        while (running.get()) {
          try { refresh(); lastError = None }
          catch { case scala.util.control.NonFatal(e) => lastError = Some(e) }
          try Thread.sleep(intervalMs)
          catch { case _: InterruptedException => }
        }
      }, s"graft-mv-follower")
      t.setDaemon(true)
      t.start()
      follower = Some(t)
    }
  }

  /** Stop the follower after its current step; the view stays at its
    * last committed cursor and [[refresh]]/[[start]] resume from there.
    */
  def stop(): Unit = {
    running.set(false)
    follower.foreach { t => t.interrupt(); t.join(10000L) }
    follower = None
  }

  /** The maintenance loop as an ORDINARY StreamingQuery over the
    * source's change-data feed — the first-class form of [[start]]'s
    * daemon thread (the reference's continuous INSERT-INTO-SELECT job,
    * README.md:247-250). The source must have been created with
    * `changeDataFeed = true`; its committed change files stream through
    * Spark's file source, so the consumption cursor lives in Spark's
    * CHECKPOINT at `checkpointDir`, not in a graft-private tag.
    *
    * Exactly-once across restarts by layering the two mechanisms:
    * Spark's WAL replays a crashed micro-batch with the SAME batchId
    * and file set, and the state commit carries `mv-batch-<batchId>` as
    * its tag — a replayed batch finds its tag already committed and
    * no-ops. Use EITHER this runner OR the polling [[start]]/[[refresh]]
    * on a given state table, never both (their cursors are disjoint).
    *
    * Scale: identical dataflow to [[refresh]] — map-side delta
    * aggregation, one full-outer merge join per batch; the change-file
    * listing is O(new files), never a table diff.
    */
  def startStream(checkpointDir: String,
                  intervalMs: Long = 1000L): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    // prefer the DSv2 change-feed source (`t$changes`,
    // [[graft.plans.ChangeFeedTable]]): offsets are change-dir
    // snapshot ids in Spark's checkpoint — no per-file source log —
    // and the same spelling external consumers use. Falls back to the
    // file-source feed for tables not registered in the catalog
    // (pure-API usage); both deliver the identical op-tagged frame.
    val spark = org.apache.spark.sql.SparkSession.active
    // the entry must ALSO carry changeDataFeed=true: the DSv2 `$changes`
    // mode refuses entries without the flag, and a path can be
    // registered under several names with differing flags (fixture
    // aliases) — picking a flagless alias would fail a stream the
    // file-source fallback serves fine
    val registered = graft.plans.TieredCatalog.listDatabases().iterator
      .flatMap(db => graft.plans.TieredCatalog.listTables(db).iterator
        .map(tb => (db, tb)))
      .find { case (db, tb) =>
        graft.plans.TieredCatalog.lookupLocal(db, tb)
          .exists(e => e.path == source.tablePath && e.changeDataFeed) }
    val feed = registered match {
      case Some((db, tb))
          if spark.conf.getOption("spark.sql.catalog.graft").isDefined =>
        spark.readStream.table(s"graft.$db.`$tb$$changes`")
      case _ =>
        source.readStreamChanges(source.readCold().schema)
    }
    feed
      .writeStream
      .queryName("graft-mv-stream")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyStreamBatch(batch, batchId)
      }
      .start()
  }

  /** One micro-batch application, tag-idempotent. Package-visible so
    * the restart/replay spec can drive it directly.
    */
  private[graft] def applyStreamBatch(batch: DataFrame, batchId: Long): Unit =
    synchronized {
      val tag = s"mv-batch-$batchId"
      if (state.taggedSnapshot(tag).isDefined) return // WAL replay: no-op
      if (batch.isEmpty) return
      val cur =
        if (state.latestSnapshotId == 0L) emptyState(batch)
        else state.readCold()
      // MIN/MAX retraction repair anchors at the newest snapshot whose
      // change files are IN this batch (parsed from the file paths);
      // a spec-driven in-memory batch has no file provenance — fall
      // back to the source head (identical when batches track commits)
      lazy val anchor: Long = {
        import org.apache.spark.sql.functions.{input_file_name, max => fmax, regexp_extract}
        // project first, aggregate second — input_file_name() is
        // non-deterministic and illegal inside an aggregate argument
        Option(batch
          .select(regexp_extract(input_file_name(),
            "changes/snap-(\\d+)", 1).cast("long").as("__snap"))
          .agg(fmax("__snap").as("s"))
          .head().getAs[java.lang.Long]("s"))
          .map(_.toLong).getOrElse(source.latestSnapshotId)
      }
      val next = IncrementalAgg.applyDeltaFull(cur, batch, groupCols, spec,
        source.readColdAsOf(anchor))
      state.commitOverwrite(next, tag = Some(tag))
    }

  /** Bootstrap: empty state with the output schema — the full snapshot
    * arrives as +I rows through the same delta path. MIN/MAX columns
    * start NULL typed as their source value column; AVG accumulators
    * start at (0.0, 0).
    */
  private def emptyState(delta: DataFrame): DataFrame = {
    val base = sums.foldLeft(delta.select(groupCols.map(col): _*).limit(0)) {
      (d, sa) => d.withColumn(sa._2, lit(0L))
    }.withColumn(cntCol, lit(0L))
    val withAvg = avgs.foldLeft(base) { (d, a) =>
      d.withColumn(spec.avgSum(a._2), lit(0.0))
        .withColumn(spec.avgCnt(a._2), lit(0L))
    }
    (mins ++ maxs).foldLeft(withAvg) { case (d, (v, alias)) =>
      d.withColumn(alias, lit(null).cast(delta.schema(v).dataType))
    }
  }
}
