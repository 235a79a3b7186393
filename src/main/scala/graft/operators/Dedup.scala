package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document deduplication for large-scale training-data pipelines:
  * exact, n-gram Jaccard, MinHash+LSH, and SimHash variants.
  *
  * Scale design (the point of each variant):
  *  - exact/fingerprint: one hash-shuffle on a 32-byte digest, never on
  *    the document text — at 100 TB the shuffle payload is keys+ids only.
  *  - ngramJaccardPairs: exact pairwise Jaccard, but only over pairs
  *    sharing ≥1 shingle (inverted-index join), never a cross join. Cost
  *    is Σ_shingle df² — use [[minhashLshPairs]] when document frequency
  *    is heavy-tailed.
  *  - minhashLshPairs: k seeded MinHashes → b bands; candidate pairs only
  *    within equal band signatures, then exact-Jaccard verification.
  *    Shuffles carry (band_sig, doc_id) — constant width per doc
  *    regardless of document size.
  *  - simhash: constant-width (64-bit) signature per doc; near-dup =
  *    small Hamming distance.
  *
  * All hashes are md5-derived ([[graft.functions.TextFunctions.hash60]])
  * so the DuckDB oracle reproduces results bit-for-bit.
  */
object Dedup {

  /** Exact dedup: group identical texts, keep the smallest id.
    * Output: (text key omitted) keep_id, n_dups per distinct text.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"))

  /** Content fingerprint (md5) per document — the cheap global-dedup key. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("fingerprint"))

  /** Distinct (id, shingle-hash) pairs — the inverted-index building
    * block. Shingles are reduced to their 60-bit md5 hash immediately:
    * every downstream shuffle/join carries an 8-byte key instead of an
    * n-word string, and the MinHash family needs one md5 total (not one
    * per family member). Collisions (~2^-60) affect Spark and the oracle
    * identically — both join on the same hash.
    */
  private def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Scale.widen(df.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), explode(shingles(tokens(col("__text")), n)).as("shs"))
      .select(col("id"), hash60(col("shs")).as("sh"))

  /** MinHash universal-hash family over the shingle hash, mod the
    * Mersenne prime 2^31−1: h_i(x) = (A_i·(x mod p) + B_i) mod p with
    * md5-derived constants — products stay < 2^62, so the arithmetic is
    * exact in 64-bit on both engines.
    */
  val MinhashP = 2147483647L
  def minhashA(i: Int): Long = Similarity.jvmHash60(s"a:$i") % (MinhashP - 1) + 1
  def minhashB(i: Int): Long = Similarity.jvmHash60(s"b:$i") % MinhashP

  /** Exact Jaccard pairs over a prepared (id, sh) shingle set: inverted-
    * index self-join — only pairs sharing a shingle are ever
    * materialized. Threshold compare is integer-exact:
    * inter*den ≥ union*num. Output: a_id < b_id, inter, union_sz.
    */
  private def jaccardPairs(s0: DataFrame, num: Int, den: Int): DataFrame = {
    // referenced 3× below (sizes + both self-join branches); cache spills
    // to disk under pressure, so this holds at corpus scale too
    val s = s0.cache()
    val sizes = s.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val a = s.select(col("id").as("a_id"), col("sh"))
    val b = s.select(col("id").as("b_id"), col("sh"))
    val inter = a.join(b, Seq("sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a_id").withColumnRenamed("n_sh", "na"), "a_id")
      .join(sizes.withColumnRenamed("id", "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
      .withColumn("un", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * den >= col("un") * num)
      .select(col("a_id"), col("b_id"), col("inter"), col("un").as("union_sz"))
  }

  /** Exact n-gram Jaccard near-dup pairs with similarity ≥ num/den. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, num: Int = 4, den: Int = 5): DataFrame =
    jaccardPairs(shingleSet(df, idCol, textCol, n), num, den)

  private def minhashSignatureFrom(s: DataFrame, k: Int): DataFrame = {
    val hmod = pmod(col("sh"), lit(MinhashP))
    val aggs = (0 until k).map { i =>
      min(pmod(hmod * minhashA(i) + minhashB(i), lit(MinhashP))).as(s"mh$i")
    }
    s.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash signatures: for each doc, min over shingles of h_i(shingle),
    * i = 0..k-1, as k columns mh0..mh{k-1}. One shuffle on doc id.
    */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, k: Int = 16): DataFrame =
    minhashSignatureFrom(shingleSet(df, idCol, textCol, n), k)

  /** MinHash + LSH banding near-dup pairs: k hashes in `bands` bands of
    * k/bands rows; docs sharing any full band signature become candidate
    * pairs; candidates are then verified with exact n-gram Jaccard ≥
    * num/den. Deterministic (md5 hash family) — the oracle reproduces
    * both the candidate set and the verification.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 16, bands: Int = 4,
                      num: Int = 4, den: Int = 5): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    // used by both the signature build and the verification path
    val s = shingleSet(df, idCol, textCol, n).cache()
    val sig = minhashSignatureFrom(s, k)
    // band signature = "b:mh_a,mh_b,..." string; unpivot bands via stack
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rows).map(r => col(s"mh${b * rows + r}"))
      concat_ws(",", lit(b.toString) +: parts: _*).as(s"band$b")
    }
    val withBands = sig.select(col("id") +: bandCols: _*)
    val stacked = withBands.select(col("id"),
      explode(array((0 until bands).map(b => col(s"band$b")): _*)).as("sig"))
    val cand = stacked.select(col("id").as("a_id"), col("sig"))
      .join(stacked.select(col("id").as("b_id"), col("sig")), Seq("sig"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    // Exact verification on the candidate docs only: restrict the
    // inverted index to ids that appear in some candidate pair (broadcast
    // semi-join — the candidate set is tiny relative to the corpus), then
    // keep exactly the LSH pairs. At 100 TB this is the difference
    // between verifying ~|cand| pairs and re-verifying the whole corpus.
    val candIds = cand.select(col("a_id").as("id"))
      .union(cand.select(col("b_id").as("id"))).distinct()
    val verified = jaccardPairs(s.join(broadcast(candIds), Seq("id"), "left_semi"), num, den)
    cand.join(verified, Seq("a_id", "b_id"))
  }

  /** Connected components over a near-dup pair graph — the "keep one
    * representative per duplicate cluster" step after any pair-finding
    * variant. Iterative min-label propagation: each node repeatedly
    * takes the minimum label among itself and its neighbors until
    * fixpoint; converged label = smallest id in the component (the
    * canonical representative).
    *
    * Scale: each round is one join + one groupBy-min — O(E) per round,
    * O(component diameter) rounds. Near-dup clusters are shallow (dups
    * of one source), so rounds stay small; `maxIters` bounds pathological
    * chains. No driver-side graph state — only the loop counter and a
    * convergence check live on the driver.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .cache()
    // localCheckpoint each round: an iterative plan that references its
    // previous iteration doubles its lineage every round — truncating it
    // keeps plan size (and analyzer/codegen cost) constant. On a
    // cluster, swap for checkpoint() on reliable storage to also survive
    // executor loss.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("component", "ncomp"), Seq("dst"))
        .select(col("src").as("id"), col("ncomp").as("component"))
      val next = labels.select(col("id"), col("component"))
        .union(viaNeighbors)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("component", "old"), Seq("id"))
        .filter(col("component") =!= col("old")).limit(1).count() > 0
      labels = next
      converged = !changed
      i += 1
    }
    labels
  }

  /** SimHash (width bits, ≤ 60): per doc, bit j is set iff
    * Σ_{distinct word w} (bit_j(hash60(w)) ? +1 : -1) > 0.
    * Constant-size signature per document.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              width: Int = 32): DataFrame = {
    val w = Scale.widen(df.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), explode(array_distinct(tokens(col("__text")))).as("w"))
      .withColumn("h", hash60(col("w")))
    val bitSums = (0 until width).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val sums = w.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val sigExpr = (0 until width).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)
    sums.select(col("id"), sigExpr.as("simhash"))
  }

  /** SimHash near-dup pairs: Hamming distance ≤ maxDist, with EXACT
    * recall by pigeonhole blocking: the signature is split into
    * maxDist+1 disjoint bit-blocks — a pair within distance maxDist has
    * at most maxDist differing bits, so at least one block is identical
    * and the pair meets in that block's bucket. Per-bucket join + exact
    * Hamming check; candidate space shrinks by ~2^blockBits per block
    * instead of a full cross join.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   width: Int = 32, maxDist: Int = 3): DataFrame = {
    val blocks = maxDist + 1
    require(width % blocks == 0,
      s"width=$width must divide into maxDist+1=$blocks equal bit-blocks")
    val blockBits = width / blocks
    val mask = (1L << blockBits) - 1
    val sig = simhash(df, idCol, textCol, width).cache()
    val blockKeys = (0 until blocks).map { b =>
      concat_ws(":", lit(b.toString),
        shiftright(col("simhash"), b * blockBits).bitwiseAND(mask))
    }
    val keyed = sig.select(col("id"), col("simhash"),
      explode(array(blockKeys: _*)).as("blk"))
    keyed.select(col("id").as("a_id"), col("simhash").as("sig_a"), col("blk"))
      .join(keyed.select(col("id").as("b_id"), col("simhash").as("sig_b"), col("blk")),
        Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
