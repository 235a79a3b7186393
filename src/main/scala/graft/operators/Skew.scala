package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins and aggregations.
  *
  * AQE's skew-join handling (on by default) splits oversized partitions
  * at runtime for sort-merge joins; salting is the complementary static
  * technique when one key dominates so heavily that even a split
  * partition is one reducer's worth of a single key, or when the skewed
  * side feeds an aggregation.
  */
object Skew {

  /** Skew-safe equi-join: the left (fact) side gets a random salt in
    * [0, buckets); the right side is replicated `buckets` times with
    * every salt value; the join key becomes (key, salt), spreading a hot
    * key over `buckets` reducers. Inner/left semantics preserved —
    * replication is on the build side only, so no fact row duplicates.
    *
    * Cost: right side ×buckets (use for small-to-medium right sides;
    * a broadcastable right side should just be broadcast instead).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    val salted = left.withColumn("__salt",
      (rand(42) * buckets).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation with explicit salting: the
    * first groupBy runs on (key, salt) — spreading a hot key across
    * reducers — the second merges the partials. `aggs` must be
    * decomposable (sum/count/min/max): pass the partial and the merge
    * expression per output column.
    */
  def saltedAgg(df: DataFrame, key: String, buckets: Int,
                partial: Seq[(String, Column)],
                merge: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(buckets)))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(col(key))
      .agg(merge.head._2.as(merge.head._1),
        merge.tail.map { case (n, c) => c.as(n) }: _*)
  }
}
