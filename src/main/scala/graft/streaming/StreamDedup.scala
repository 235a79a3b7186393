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

  /** Custom state: emit one row per key — the first batch in which the
    * key appears wins, and later batches are dropped entirely. Within
    * that first batch, WHICH duplicate row survives is arbitrary (the
    * post-shuffle group order is unspecified); when the payload differs
    * between same-key rows and the choice matters, pre-dedup the batch
    * with a total order ([[graft.operators.Upsert.latestByKey]]) before
    * this operator. `key` is any row→string function. Append output
    * mode.
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
