package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table: sessionization and
  * time-window rollups, batch and streaming.
  *
  * Time is carried as exact epoch-microsecond longs in outputs
  * (`unix_micros`) — integer arithmetic agrees across engines where raw
  * timestamp rendering may not.
  *
  * Scale: batch sessionization is one hash-shuffle on user_id + an
  * in-partition sort (the minimum for any per-user ordering); the
  * streaming variants keep per-key state in the state store with
  * watermark-bounded retention — no unbounded growth.
  */
object Events {

  private def us(c: Column): Column = unix_micros(c)

  /** Batch sessionization: events within `gapMinutes` of the previous
    * event of the same user share a session. One row per session with
    * exact-integer bounds and counts.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("event_id"))
    // derived from `order` so the two specs can never drift apart (a
    // session ordering changed in one but not the other would silently
    // misassign session ids)
    val running =
      order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id"), col("event_id"), us(col("ts")).as("__us"))
      .withColumn("__prev", lag(col("__us"), 1).over(order))
      .withColumn("__new",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(running))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"),
        max(col("__us")).as("end_us"))
  }

  /** Batch funnel analysis: how far each user progresses through an
    * ORDERED stage sequence (stage k counts only if it happens strictly
    * after a completed stage k-1). Output: one row per funnel depth
    * 0..stages.length with the user count that reached exactly that
    * depth.
    *
    * Scale: one hash-shuffle on user_id + an in-partition time sort;
    * each stage is a running conditional MIN over the same window (no
    * extra exchange, no self-joins, no per-user arrays), then a
    * per-user max and a tiny depth rollup. Strict `<` on event time
    * makes the result independent of tie order.
    */
  def funnelBatch(events: DataFrame,
                  stages: Seq[String] = Seq("view", "click", "purchase"))
      : DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events.select(col("user_id"), col("event_id"),
      col("event_type"), us(col("ts")).as("__us"))
    // reach_k = running min event time at which stage k completed
    val withReach = stages.zipWithIndex.foldLeft(base) {
      case (df, (stage, i)) =>
        val qualifies =
          if (i == 0) col("event_type") === stage
          else col("event_type") === stage && col(s"__r${i - 1}") < col("__us")
        df.withColumn(s"__r$i",
          min(when(qualifies, col("__us"))).over(w))
    }
    // ascending fold leaves the DEEPEST stage as the outermost branch
    val depth = stages.indices.foldLeft(lit(0L)) { (acc, i) =>
      when(col(s"__m$i").isNotNull, lit((i + 1).toLong)).otherwise(acc)
    }
    val mins = stages.indices.map(i => min(col(s"__r$i")).as(s"__m$i"))
    withReach
      .groupBy(col("user_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("user_id"), depth.as("funnel_depth"))
      .groupBy(col("funnel_depth"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Batch cohort-retention analysis: users are grouped into daily
    * cohorts by FIRST-activity day; each (cohort_day, day_offset) cell
    * counts the distinct cohort members active that many days later —
    * the classic retention-triangle input. Days are exact integer
    * epoch-day indexes (µs div 86 400 000 000), so engines agree.
    *
    * Scale: one aggregate to (user, day) distinct pairs, one min per
    * user (broadcastable — users ≪ events), one narrow count per cell;
    * the events table itself is never shuffled twice and no per-user
    * event list is ever materialized.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val userDays = events
      .select(col("user_id"), us(col("ts")).as("__us"))
      .select(col("user_id"), expr("__us DIV 86400000000").as("day"))
      .distinct()
    val cohorts = userDays.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    userDays.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Batch tumbling-hour rollup via the built-in window(): count +
    * distinct users per hour, window start as exact epoch micros.
    */
  def hourlyBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"),
        count_distinct(col("user_id")).as("n_users"))
      .select(us(col("w.start")).as("window_start_us"),
        col("cnt"), col("n_users"))

  /** Streaming tumbling-window count by event type with a watermark:
    * late events beyond `delay` are dropped, closed windows are final
    * (append mode) and state is evicted — bounded state at any rate.
    */
  def hourlyStream(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(us(col("window.start")).as("window_start_us"),
        col("event_type"), col("cnt"))

  /** Batch sessionization via the built-in session_window() — the same
    * operator [[sessionStream]] runs continuously, here in batch where
    * the DuckDB oracle can hash-check it (e11). Window contract is
    * half-open [first, last+gap): an event exactly `gap` after its
    * predecessor starts a NEW session (vs [[sessionizeBatch]]'s
    * strictly-greater split — both are standard, declared explicitly).
    * Scale: one hash-shuffle on (user, merged-window) with partial
    * counts map-side — Spark's native session merge, no window
    * functions, no per-user sort.
    */
  def sessionizeNative(events: DataFrame,
                       gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        us(col("session_window.start")).as("start_us"),
        us(col("session_window.end")).as("end_excl_us"),
        col("n_events"))

  /** Streaming sessionization via the built-in session_window(): gap-
    * merged per-user sessions, finalized once the watermark passes the
    * session end (append mode → each session emitted exactly once).
    */
  def sessionStream(events: DataFrame, gap: String = "30 minutes",
                    delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        us(col("session_window.start")).as("start_us"),
        us(col("session_window.end")).as("end_us"),
        col("n_events"))
}
