package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout for shuffle-free co-located joins and
  * aggregations (SURVEY.md §4 "Shuffle/partitioning").
  *
  * Writing both sides of a recurring join bucketed on the join key (same
  * bucket count) lets every future join/agg on that key skip its
  * exchange entirely — the payoff at 100 TB is one corpus-wide shuffle
  * at ingest instead of one per query. The spec asserts the join plan
  * contains no hash exchange.
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner elides
    * both exchanges (and with sorted buckets, both sorts).
    */
  def coLocatedJoin(left: String, right: String, key: String,
                    joinType: String = "inner"): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.table(left).join(spark.table(right), Seq(key), joinType)
  }
}
