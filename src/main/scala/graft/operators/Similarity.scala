package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.seededHash

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * Scale design:
  *  - [[knnBrute]] is the exact baseline: queries × corpus block
  *    nested-loop with the small side broadcast — correct at any corpus
  *    size when the query set is bounded (the common "probe" shape).
  *  - [[lshNearDupPairs]] is the all-pairs scale path: random-hyperplane
  *    (sign-LSH) signatures bucket the corpus so only same-bucket pairs
  *    are compared; the final cosine check is exact. Hyperplane
  *    components are md5-derived ±1 (deterministic, oracle-reproducible)
  *    — at 100 TB the shuffle carries (bucket, id, vec) once instead of
  *    an O(n²) cross join.
  *
  * Cosine is computed in double, strictly left-to-right (`zip_with` +
  * `aggregate`), matching DuckDB's list evaluation order so results are
  * bit-identical for the oracle.
  */
object Similarity {

  /** Elementwise dot product of two double arrays, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` and `corpus` both carry (idCol, vecCol float array).
    * Output: query_id, neighbor_id, rank (1..k); self-match excluded;
    * ties broken by neighbor id.
    */
  def knnBrute(queries: DataFrame, corpus: DataFrame,
               idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("qv"), l2norm(toDouble(col(vecCol))).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("cv"), l2norm(toDouble(col(vecCol))).as("cn"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Exact all-pairs cosine near-dup: pairs with cosine ≥ threshold.
    * O(n²) — the correctness baseline for [[lshNearDupPairs]].
    */
  def nearDupPairsBrute(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    v.select(col("id").as("a_id"), col("v").as("va"), col("nrm").as("na"))
      .join(v.select(col("id").as("b_id"), col("v").as("vb"), col("nrm").as("nb")),
        col("a_id") < col("b_id"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"))
  }

  /** Sign-LSH (random hyperplane) bucketed near-dup: `planes` hyperplanes
    * whose component j of plane p is +1 if bit0(hash60("p:j")) else -1;
    * signature bit p = (Σ_j s_pj · v_j) ≥ 0. Same-signature buckets are
    * candidate groups; exact cosine ≥ threshold check within buckets.
    * Recall < 1 by construction (LSH) — deterministic, so the oracle can
    * reproduce it; pair with [[nearDupPairsBrute]] to measure recall.
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, planes: Int = 8): DataFrame = {
    val v = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val sigBits = (0 until planes).map { p =>
      // signed projection: Σ_j ±v_j with md5-deterministic signs
      val proj = aggregate(
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
          (x, j) => when(seededHash(p, j.cast("string")).bitwiseAND(1) === 1, x).otherwise(-x)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    val sig = v.withColumn("bucket", sigBits.reduce((a, b) => a + b))
    sig.select(col("id").as("a_id"), col("v").as("va"), col("nrm").as("na"), col("bucket"))
      .join(sig.select(col("id").as("b_id"), col("v").as("vb"), col("nrm").as("nb"), col("bucket")),
        Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id")).distinct()
  }
}
