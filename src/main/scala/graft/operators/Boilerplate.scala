package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Boilerplate detection for training corpora: the n-grams that recur
  * across many documents (headers, footers, license blurbs, navigation
  * chrome) and the documents carrying them.
  *
  * Scale shape: document frequency comes from ONE explode + groupBy over
  * per-doc-distinct shingles (the same corpus pass any inverted index
  * needs); the top-k list is tiny by construction, so tagging affected
  * documents is a BROADCAST semi-join probe — the corpus never shuffles
  * to learn which docs are boilerplate-laden.
  */
object Boilerplate {

  /** Per-group counts of documents containing at least one of the top-k
    * boilerplate grams. Groups with zero affected documents are absent
    * (inner-join semantics).
    *
    * Works entirely on 60-bit gram HASHES (the fused codegen'd
    * [[graft.functions.TextFunctions.shingleHashes]]): every shuffle and
    * the broadcast carry 8-byte keys, never n-word strings, and the
    * document-frequency tie-break among equal counts is the hash value
    * (deterministic). The exploded (id, group, hash) frame is
    * localCheckpointed so the shingling pass runs ONCE for both the
    * top-k aggregation and the tagging probe — the materialized volume
    * is ≈ the tokenized corpus spread across executors, the same bytes
    * one shuffle of it would spill.
    */
  def incidence(df: DataFrame, idCol: String, textCol: String,
                groupCol: String, n: Int, k: Int): DataFrame = {
    require(!df.columns.exists(Set("__id", "gh")),
      "input columns collide with incidence internals: __id, gh")
    val grams = df.select(col(idCol).as("__id"), col(groupCol),
        explode(shingleHashes(tokens(col(textCol)), n)).as("gh"))
      .localCheckpoint(true)
    val top = grams.groupBy(col("gh")).agg(count(lit(1)).as("df_docs"))
      .orderBy(col("df_docs").desc, col("gh"))
      .limit(k).select(col("gh"))
    grams.join(broadcast(top), Seq("gh"), "left_semi")
      .select(col("__id"), col(groupCol)).distinct()
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_boiler_docs"))
  }
}
