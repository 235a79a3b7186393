package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming deduplication, two tiers (SURVEY.md-style preference
  * order: compose built-ins first, custom state only when needed):
  *
  *  - [[withinWatermark]] — Spark's built-in streaming dedup with
  *    watermark-bounded state: right when duplicates arrive close in
  *    event time (the common crawl/ingest case); state is evicted, so
  *    it runs forever at constant memory.
  *  - [[firstOccurrence]] — custom keyed state via
  *    flatMapGroupsWithState: exact first-occurrence-wins dedup over
  *    the entire stream history. Unbounded state (one boolean per key
  *    hash) — use when the key space is bounded or a full-history
  *    guarantee is required.
  */
object StreamDedup {

  /** Built-in: drop rows whose dedup columns repeat within the
    * watermark window.
    */
  def withinWatermark(df: DataFrame, cols: Seq[String],
                      eventTimeCol: String, delay: String): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(cols)

  /** Custom state: emit only the first row ever seen per key (md5
    * fingerprint of `keyCol`); later occurrences — same batch or any
    * later batch — are dropped. Append output mode.
    */
  def firstOccurrence[T: Encoder](ds: Dataset[T],
                                  key: T => String): Dataset[T] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
      }
  }
}
