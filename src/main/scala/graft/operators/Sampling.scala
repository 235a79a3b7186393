package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60

/** Corpus-selection operators for training-data pipelines: deterministic
  * hash sampling, shard assignment, and fixed-token-budget sequence
  * packing.
  *
  * Everything here keys on `hash60(salt:key)` — md5-derived, so the same
  * (salt, key) lands the same way across runs, engines, and cluster
  * sizes. That reproducibility is the property that matters at 100 TB:
  * an ablation's "10% sample" must be THE SAME 10% when the corpus is
  * re-read next month on a different cluster, and a resumed job must
  * assign every document to the same shard. (A `rand()`-based sample has
  * neither property.)
  *
  * Scale shapes: sampling and shard assignment are map-side only — no
  * shuffle, no driver state, trivially parallel at any corpus size.
  * Packing is one shuffle (by shard) + an in-partition running sum —
  * the minimum data motion that any deterministic packing needs.
  */
object Sampling {

  private def keyHash(salt: String, key: Column): Column =
    hash60(concat(lit(s"$salt:"), key.cast("string")))

  /** Deterministic Bernoulli sample: keep rows whose salted key hash
    * lands in [0, num) mod den — a reproducible num/den fraction.
    * Map-side filter; composes with partition pruning and pushdown
    * (the filter is a plain codegen'd expression).
    */
  def hashSample(df: DataFrame, keyCol: String, num: Int, den: Int,
                 salt: String = "sample"): DataFrame = {
    require(num >= 0 && num <= den && den > 0, "need 0 <= num <= den")
    df.filter(pmod(keyHash(salt, col(keyCol)), lit(den)) < num)
  }

  /** Temperature-reweighted source mixture — the multi-corpus
    * α-sampling rule of multilingual / multi-source LM training
    * (rate ∝ n_s^(α−1), normalized so the SMALLEST source keeps
    * everything): source s with n_s rows keeps a deterministic
    * (n_min/n_s)^(1−α) fraction. α = 1 keeps natural proportions,
    * α → 0 approaches the uniform mixture of [[balanceGroups]].
    *
    * Election is the reproducible hash-uniform `u(key) < rate_s` with
    * u = (hash60(salt:key) mod 10⁶)/10⁶ — the same key is kept or
    * dropped identically across runs, engines, and cluster sizes.
    * α = 0.5 computes the rate as sqrt(n_min/n_s): sqrt and division
    * are correctly-rounded IEEE ops, so elections are bit-reproducible
    * cross-engine (other α go through pow, whose last-ulp freedom
    * could flip a boundary key between engines — fine for production,
    * excluded from the oracle).
    *
    * Scale: the per-source histogram is a dimension-sized aggregate
    * (collected to one driver scalar + broadcast back); the corpus
    * pass is a map-side join-filter — no corpus-wide shuffle.
    */
  def temperatureMix(df: DataFrame, keyCol: String, groupCol: String,
                     alpha: Double = 0.5, salt: String = "temp"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "need 0 < alpha <= 1")
    require(!df.columns.contains("__rate"),
      "input columns collide with temperatureMix internals: __rate")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    // n_min rides IN-PLAN as a broadcast one-row frame instead of an
    // eager .head() (guide §1.2: the probe was a whole extra
    // corpus-scan JOB per call just to fetch one scalar before the
    // real query could even plan). Same operands through the same
    // IEEE ops — sqrt/division on identical doubles — so every
    // election is bit-identical to the scalar form.
    val minDf = counts.agg(min(col("__n")).as("__nmin"))
    val rate =
      if (alpha == 0.5)
        sqrt(col("__nmin").cast("double") / col("__n").cast("double"))
      else pow(col("__n").cast("double") / col("__nmin").cast("double"),
        alpha - 1.0)
    val u = pmod(keyHash(salt, col(keyCol)), lit(1000000L)).cast("double") /
      1000000.0
    // null-SAFE join: a null source is a real group (groupBy counts it);
    // a plain equi-join would silently drop its rows from the mixture
    val rates = counts.crossJoin(broadcast(minDf))
      .select(col(groupCol).as("__grp"), rate.as("__rate"))
    df.join(broadcast(rates), df(groupCol) <=> col("__grp"))
      .filter(u < col("__rate"))
      .drop("__grp", "__rate")
  }

  /** Deterministic shard assignment: `shard_id` = salted key hash mod
    * nShards. The write-side partitioner for training shards — stable
    * under corpus growth (a document never moves shards when others are
    * added or removed).
    */
  def assignShards(df: DataFrame, keyCol: String, nShards: Int,
                   salt: String = "shard"): DataFrame = {
    require(nShards > 0, "need at least one shard")
    df.withColumn("shard_id", pmod(keyHash(salt, col(keyCol)), lit(nShards)))
  }

  /** Deterministic stratified sample: within each stratum (the
    * `strataCols` group), keep exactly ⌊n·num/den⌋ rows — the ones with
    * the smallest salted key hashes, tie-broken by key. Unlike
    * [[hashSample]] (Bernoulli, so small strata fluctuate), the kept
    * fraction is exact per stratum — the property a per-language /
    * per-source ablation needs.
    *
    * Scale: one hash-shuffle on the strata columns + an in-partition
    * sort (rank and stratum size are two windows over the same
    * partitioning — Spark plans ONE exchange). A stratum must fit a
    * task's sort spill budget, which holds for metadata-cardinality
    * strata (language, source); it is NOT a global sort.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCols: Seq[String],
                       num: Int, den: Int,
                       salt: String = "strat"): DataFrame = {
    require(num >= 0 && num <= den && den > 0, "need 0 <= num <= den")
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(!df.columns.exists(Set("__rn", "__n")),
      "input columns collide with stratifiedSample internals: __rn, __n")
    val byStratum = Window.partitionBy(strataCols.map(col): _*)
    val w = byStratum.orderBy(keyHash(salt, col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(byStratum))
      .filter(col("__rn") * den <= col("__n") * num)
      .drop("__rn", "__n")
  }

  /** Deterministic mixture rebalancing: downsample every group (source,
    * language, …) to the size of the SMALLEST group — the balanced-
    * data-mixture step of a training recipe. Each group keeps exactly
    * the minCount rows with the smallest salted key hashes (tie-broken
    * by key), so the election is reproducible across runs and engines,
    * and monotone: a kept document stays kept if the corpus grows
    * without changing the minimum.
    *
    * Scale: one tiny aggregate for the group sizes (metadata
    * cardinality — one driver value, same pattern as [[budgetSelect]]),
    * then one hash-shuffle on the group column + in-partition sort for
    * the per-group rank. Groups must fit a task's sort spill budget —
    * true for metadata-cardinality groups by construction.
    */
  def balanceGroups(df: DataFrame, keyCol: String, groupCol: String,
                    salt: String = "mix"): DataFrame = {
    require(!df.columns.contains("__rn"),
      "input columns collide with balanceGroups internals: __rn")
    val m = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .agg(min(col("__n"))).head().getLong(0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(keyHash(salt, col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= m)
      .drop("__rn")
  }

  /** Per-group quota: cap every group (domain, source, site) at
    * `maxPerGroup` rows — the per-domain cap a web-corpus pipeline
    * applies so no single site dominates the training mixture. Each
    * group keeps the `maxPerGroup` rows with the smallest salted key
    * hashes (tie-broken by key): a deterministic uniform election, so
    * the kept set is reproducible across runs/engines and STABLE under
    * corpus growth everywhere the hash order is preserved — unlike
    * "first K seen", which depends on scan order.
    *
    * Scale: one hash-shuffle on the group column. The rank filter is a
    * top-k per key, which Spark executes as WindowGroupLimit — each map
    * task pre-prunes its partition to its local top-`maxPerGroup`
    * BEFORE the exchange, so a mega-domain with 10⁹ pages ships
    * ~maxPerGroup rows per upstream partition, not its whole crawl;
    * the post-shuffle task never materializes the full group either.
    */
  def quotaGroups(df: DataFrame, keyCol: String, groupCol: String,
                  maxPerGroup: Int, salt: String = "quota"): DataFrame = {
    require(maxPerGroup > 0, "need a positive per-group quota")
    require(!df.columns.contains("__rn"),
      "input columns collide with quotaGroups internals: __rn")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(keyHash(salt, col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerGroup)
      .drop("__rn")
  }

  /** Greedy selection under a global token budget: rows in
    * (`scoreCol` DESC, `keyCol` ASC) order are taken while the running
    * `tokCol` total stays ≤ `budget` — the "best documents until the
    * training budget is full" primitive.
    *
    * Equivalent to a global running-sum window + filter, but WITHOUT the
    * single-partition global sort that a partitionless window plans: the
    * per-score token totals (cardinality = distinct scores, bounded for
    * real quality scores — bucketize first if not) are aggregated, the
    * cutoff score is found driver-side, and selection becomes a map-side
    * `score > cutoff` filter plus one windowed sweep INSIDE the single
    * boundary-score group. Greedy semantics are preserved exactly: whole
    * groups above the cutoff fit by construction, and the boundary group
    * takes rows in key order until the remainder is spent.
    *
    * The driver-side fetch is HARD-BOUNDED at `maxDistinctScores + 1`
    * rows (a `LIMIT` under the score sort, so Spark plans
    * TakeOrderedAndProject, never a global sort): a continuous score —
    * O(corpus) distinct values — cannot flood the driver. If the budget
    * is not exhausted within that prefix AND more score groups exist,
    * the call fails fast with instructions to bucketize, instead of
    * silently collecting the corpus.
    */
  def budgetSelect(df: DataFrame, keyCol: String, tokCol: String,
                   scoreCol: String, budget: Long,
                   maxDistinctScores: Int = 100000): DataFrame = {
    require(budget >= 0, "need a non-negative budget")
    require(maxDistinctScores > 0, "need a positive distinct-score bound")
    require(!df.columns.contains("__cum"),
      "input columns collide with budgetSelect internals: __cum")
    // Rows with a NULL score or NULL token count are never selected
    // (unknown quality / unknown cost can't be ranked or budgeted), and
    // the selection plan is inherently multi-pass (cutoff scan + two
    // selection branches) — localCheckpoint materializes the cleaned
    // input once instead of re-scanning the source per branch.
    val clean = df.filter(col(scoreCol).isNotNull && col(tokCol).isNotNull)
      .localCheckpoint(true)
    val perScore = clean.groupBy(col(scoreCol))
      .agg(sum(col(tokCol).cast("long")).as("__t"))
      .orderBy(col(scoreCol).desc)
      .limit(maxDistinctScores + 1)
      .collect() // bounded: at most maxDistinctScores + 1 rows
    var cum = 0L
    var boundary: Option[(Any, Long)] = None // (cutoff score, tokens before)
    val it = perScore.iterator
    while (it.hasNext && boundary.isEmpty) {
      val r = it.next()
      val t = r.getLong(1)
      if (cum + t <= budget) cum += t
      else boundary = Some((r.get(0), cum))
    }
    if (boundary.isEmpty && perScore.length > maxDistinctScores)
      throw new IllegalArgumentException(
        s"budgetSelect: '$scoreCol' has more than $maxDistinctScores " +
          "distinct values and the budget was not exhausted within the " +
          "top groups — the score looks continuous. Bucketize it first " +
          "(e.g. round/floor to a bounded grid) or raise maxDistinctScores.")
    boundary match {
      case None => clean // every group fits (all score groups were seen)
      case Some((cut, before)) =>
        // The boundary running sum covers exactly ONE score group (the
        // filter pins scoreCol = cut), so a single partition is the
        // SEMANTIC shape, bounded by that group's size — not a scale
        // bug. Spark 4 constant-folds partitionBy(scoreCol) here into a
        // global window and logs a misleading degradation warning;
        // partitioning by an unfoldable derived constant keeps the
        // identical one-partition execution with an honest plan.
        val onePart = pmod(xxhash64(col(scoreCol)), lit(1))
        val wB = Window.partitionBy(onePart).orderBy(col(keyCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val inBoundary = clean.filter(col(scoreCol) === lit(cut))
          .withColumn("__cum", sum(col(tokCol).cast("long")).over(wB))
          .filter(col("__cum") + before <= budget)
          .drop("__cum")
        clean.filter(col(scoreCol) > lit(cut)).unionByName(inBoundary)
    }
  }

  /** Streaming sequence packing: within each shard, documents in
    * deterministic (hash, key) order are concatenated into sequences of
    * ~`budget` tokens; `pack_id` = floor(tokens-before-this-doc /
    * budget). A sequence may overflow by at most one document (the
    * standard streaming-packer contract — no bin-packing lookahead, so
    * the layout is reproducible and single-pass).
    *
    * One hash-shuffle on shard_id, then a running sum inside each
    * partition — per-shard state is a single counter, never the corpus.
    */
  def packSequences(df: DataFrame, keyCol: String, tokCol: String,
                    nShards: Int, budget: Int,
                    salt: String = "shard"): DataFrame = {
    require(budget > 0, "need a positive token budget")
    val sharded = assignShards(df, keyCol, nShards, salt)
      .withColumn("__h", keyHash(salt, col(keyCol)))
    val w = Window.partitionBy(col("shard_id"))
      .orderBy(col("__h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("__cum", sum(col(tokCol)).over(w))
      .withColumn("pack_id",
        expr(s"(__cum - $tokCol) DIV $budget"))
      .drop("__h", "__cum")
  }
}
