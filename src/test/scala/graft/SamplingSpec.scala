package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling}

class SamplingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat today", 28),
    (2L, "the cat sat on the mat today", 28), // exact dup of 1
    (3L, "a completely different sentence here", 36),
    (4L, "the dog sat on the mat today", 28), // near dup of 1
    (5L, "short", 5)
  ).toDF("doc_id", "text", "n_chars")

  test("hashSample is deterministic and roughly proportional") {
    val base = spark.range(0, 2000).toDF("id")
    val s1 = Sampling.hashSample(base, "id", 1, 10).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(base, "id", 1, 10).collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // reproducible
    assert(s1.size > 100 && s1.size < 300) // ~10% of 2000
    // monotone nesting: a 20% sample contains the 10% sample
    val s20 = Sampling.hashSample(base, "id", 2, 10).collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s20))
  }

  test("assignShards covers all rows, is stable under corpus growth") {
    val base = spark.range(0, 1000).toDF("id")
    val shards = Sampling.assignShards(base, "id", 8)
    assert(shards.count() == 1000)
    assert(shards.agg(min("shard_id"), max("shard_id")).head() match {
      case r => r.getLong(0) >= 0 && r.getLong(1) <= 7
    })
    // a document's shard does not depend on what else is in the corpus
    val grown = Sampling.assignShards(spark.range(0, 2000).toDF("id"), "id", 8)
    val before = shards.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = grown.filter(col("id") < 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before == after)
  }

  test("packSequences: packs respect the budget (overflow ≤ one doc)") {
    val withTok = spark.range(0, 500).toDF("id")
      .withColumn("tok", (pmod(col("id") * 37, lit(90)) + 10))
    val packed = Sampling.packSequences(withTok, "id", "tok",
      nShards = 4, budget = 200)
    // every doc is placed exactly once
    assert(packed.count() == 500)
    val sums = packed.groupBy("shard_id", "pack_id")
      .agg(sum("tok").as("s"), max("tok").as("mx")).collect()
    // a pack never exceeds budget + its own last doc, and all packs
    // except possibly each shard's last are at least at budget after
    // their overflow doc (streaming-packing contract)
    assert(sums.forall(r => r.getLong(2) <= 200 + r.getLong(3)))
    // pack ids are dense from 0 within each shard
    val perShard = packed.groupBy("shard_id")
      .agg(min("pack_id").as("mn"), countDistinct("pack_id").as("n"),
        max("pack_id").as("mx")).collect()
    assert(perShard.forall(r => r.getLong(1) == 0 && r.getLong(3) == r.getLong(2) - 1))
  }

  test("plans: decontam broadcasts the benchmark; packing shuffles once before the agg") {
    val dir = "/root/testdata/sf0.001"
    // benchmark side must be a broadcast join — the corpus never shuffles
    val c1 = graft.queries.Pipeline.c1Decontam(spark, dir)
    val c1Plan = c1.queryExecution.executedPlan.toString
    assert(c1Plan.contains("BroadcastHashJoin"),
      s"decontam should broadcast the benchmark shingle set:\n$c1Plan")
    // packing: one exchange for the per-shard window, one for the final
    // (shard, pack) aggregate — nothing else moves data
    val c4 = graft.queries.Pipeline.c4Pack(spark, dir)
    val c4Plan = c4.queryExecution.executedPlan.toString
    assert(c4Plan.contains("Window"), c4Plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(c4Plan).size
    assert(exchanges <= 2, s"expected <=2 shuffles, got $exchanges:\n$c4Plan")
    // sampling is a map-side filter: no exchange at all before the scan
    val s = Sampling.hashSample(
      graft.tables.Tables.load(spark, dir, "documents"), "doc_id", 1, 10)
    assert(!s.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("stratifiedSample keeps an exact floor(n*frac) per stratum, deterministically") {
    val base = spark.range(0, 1000)
      .selectExpr("id", "CAST(id % 3 AS STRING) AS grp")
    val s = Sampling.stratifiedSample(base, "id", Seq("grp"), 1, 10)
    val perGrp = s.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // strata sizes: 334 (grp 0), 333, 333 → exact tenths, floored
    assert(perGrp == Map("0" -> 33L, "1" -> 33L, "2" -> 33L))
    // reproducible: same rows kept on a re-run
    val s2 = Sampling.stratifiedSample(base, "id", Seq("grp"), 1, 10)
    assert(s.collect().map(_.getLong(0)).toSet ==
      s2.collect().map(_.getLong(0)).toSet)
  }

  test("budgetSelect equals the naive global greedy sweep") {
    import org.apache.spark.sql.expressions.Window
    val base = spark.range(0, 500).selectExpr("id",
      "CAST(id % 7 AS LONG) AS score", "CAST(id % 13 + 1 AS LONG) AS tok")
    val budget = 800L
    val got = Sampling.budgetSelect(base, "id", "tok", "score", budget)
      .collect().map(_.getLong(0)).toSet
    // oracle: single global running-sum window (fine at test scale);
    // partitioned by an unfoldable derived constant — same one-partition
    // semantics (Spark 4 folds a bare literal back to a global window),
    // but it keeps the test log clean of "No Partition Defined" noise so
    // a REAL global-window regression in product code stays visible
    val w = Window.partitionBy(pmod(xxhash64(col("id")), lit(1)))
      .orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = base.withColumn("cum", sum(col("tok")).over(w))
      .filter(col("cum") <= budget).collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
    // a budget larger than the corpus selects everything
    assert(Sampling.budgetSelect(base, "id", "tok", "score", 1000000L)
      .count() == 500)
    // NULL scores/token counts are never selected and never poison the
    // cutoff (a NULL boundary score would otherwise empty the result)
    val withNulls = spark.sql(
      """SELECT * FROM VALUES (1L, 5L, 10L), (2L, CAST(NULL AS LONG), 100L),
        |(3L, 4L, CAST(NULL AS LONG)) AS t(id, score, tok)""".stripMargin)
    val sel = Sampling.budgetSelect(withNulls, "id", "tok", "score", 50L)
      .collect().map(_.getLong(0)).toSet
    assert(sel == Set(1L))
  }

  test("budgetSelect fails fast on continuous scores instead of collecting the corpus") {
    // every row has a distinct score and the budget is NOT exhausted
    // within the bounded prefix → must error with bucketize guidance,
    // never collect O(corpus) rows onto the driver
    val continuous = spark.range(0, 500).selectExpr("id",
      "CAST(id AS DOUBLE) / 7.0 AS score", "1L AS tok")
    val ex = intercept[IllegalArgumentException] {
      Sampling.budgetSelect(continuous, "id", "tok", "score",
        budget = 1000000L, maxDistinctScores = 100)
    }
    assert(ex.getMessage.contains("Bucketize"))
    // but the same bound is fine when the budget IS exhausted inside the
    // top groups (only the prefix down to the cutoff matters)...
    val some = Sampling.budgetSelect(continuous, "id", "tok", "score",
      budget = 10L, maxDistinctScores = 100)
    assert(some.count() == 10)
    // ...and when the distinct cardinality is genuinely under the bound
    val all = Sampling.budgetSelect(continuous, "id", "tok", "score",
      budget = 1000000L, maxDistinctScores = 1000)
    assert(all.count() == 500)
  }

  test("round-3 plans: c7 one exchange, c8 no global sort, s7 partial aggs, t7 broadcast tag") {
    val dir = "/root/testdata/sf0.001"
    // c7: rank + stratum-size windows and the final per-source aggregate
    // all share the hash(source) partitioning — ONE exchange total
    val c7Plan = graft.queries.Pipeline.c7Stratified(spark, dir)
      .queryExecution.executedPlan.toString
    val c7Ex = "Exchange hashpartitioning".r.findAllIn(c7Plan).size
    assert(c7Ex <= 1, s"expected <=1 shuffle in c7, got $c7Ex:\n$c7Plan")
    // c8: greedy selection must not plan a corpus-wide single-partition
    // sort/window — the cutoff is found on per-score aggregates
    val c8Plan = graft.queries.Pipeline.c8BudgetSelect(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!c8Plan.contains("Exchange SinglePartition"),
      s"c8 must not globally sort the corpus:\n$c8Plan")
    // s7: the dim expansion is reduced by a partial aggregate BEFORE the
    // exchange — the shuffle carries (label, dim) partial sums only
    val s7Plan = graft.queries.Pipeline.s7Centroids(spark, dir)
      .queryExecution.executedPlan.toString
    assert(s7Plan.contains("partial_sum"),
      s"s7 centroid sums must partial-aggregate map-side:\n$s7Plan")
    // t7: tagging the corpus against the top-k grams is a broadcast
    // semi-join probe, never a corpus shuffle
    val t7Plan = graft.queries.Pipeline.t7Boilerplate(spark, dir)
      .queryExecution.executedPlan.toString
    assert(t7Plan.contains("BroadcastHashJoin") && t7Plan.contains("LeftSemi"),
      s"t7 must broadcast the top-gram set:\n$t7Plan")
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    // benchmark = doc 1; docs 2 (exact dup) and 4 (near dup) share
    // 3-grams with it; 3 and 5 do not
    val bench = docs.filter(col("doc_id") === 1)
    val train = docs.filter(col("doc_id") =!= 1)
    val hits = Dedup.decontaminate(train, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(2L, 4L))
    assert(hits(2L) == 5L) // all five 3-grams of the exact dup collide
    assert(hits(4L) < 5L && hits(4L) >= 1L)
  }

  test("balanceGroups downsamples every group to the smallest group's size") {
    import spark.implicits._
    val df = ((1 to 12).map(i => (i.toLong, "big")) ++
              (13 to 16).map(i => (i.toLong, "mid")) ++
              (17 to 19).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val got = Sampling.balanceGroups(df, "doc_id", "source")
    val sizes = got.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("big" -> 3L, "mid" -> 3L, "small" -> 3L))
    // deterministic: the same election on re-run
    val again = Sampling.balanceGroups(df, "doc_id", "source")
    assert(got.collect().map(_.getLong(0)).sorted.toSeq ==
      again.collect().map(_.getLong(0)).sorted.toSeq)
    // monotone: growing a NON-minimum group never changes the election
    // of untouched groups
    val grown = df.union(Seq((99L, "big")).toDF("doc_id", "source"))
    val g2 = Sampling.balanceGroups(grown, "doc_id", "source")
      .filter(col("source") =!= "big")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(g2 == got.filter(col("source") =!= "big")
      .collect().map(_.getLong(0)).sorted.toSeq)
  }


  test("temperatureMix: smallest source whole, heavy sources damped, deterministic") {
    val rows = (0 until 400).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "mid")) ++
      (2000 until 2025).map(i => (i.toLong, "small"))
    val df = rows.toDF("id", "src")
    val out = graft.operators.Sampling.temperatureMix(df, "id", "src", alpha = 0.5)
    val kept = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 25, "rate 1.0 for the smallest source keeps everything")
    // expected rates: sqrt(25/400)=0.25, sqrt(25/100)=0.5 — hash-uniform
    // election lands near them (exact membership is deterministic)
    assert(kept("big") < 400 && kept("mid") < 100)
    assert(kept("big") * 1.0 / 400 < kept("mid") * 1.0 / 100 + 0.15,
      "heavier source is damped at least as hard")
    val again = graft.operators.Sampling.temperatureMix(df, "id", "src", alpha = 0.5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(again == kept, "same elections on re-run")
    // alpha = 1 keeps natural proportions (rate 1 everywhere)
    assert(graft.operators.Sampling.temperatureMix(df, "id", "src", alpha = 1.0)
      .count() == df.count())
    // a NULL source is a real group, not silently dropped
    val withNull = rows.toDF("id", "src")
      .union(Seq((5000L, null.asInstanceOf[String])).toDF("id", "src"))
    val mixed = graft.operators.Sampling.temperatureMix(withNull, "id", "src")
    assert(mixed.filter(col("src").isNull).count() == 1,
      "the singleton null group has rate 1.0 and must survive")
  }

  test("quotaGroups caps each group, deterministically, with a group-limited plan") {
    import spark.implicits._
    val df = ((1 to 40).map(i => (i.toLong, "mega")) ++
              (50 to 54).map(i => (i.toLong, "tiny")))
      .toDF("doc_id", "source")
    val got = Sampling.quotaGroups(df, "doc_id", "source", maxPerGroup = 10)
    val sizes = got.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("mega" -> 10L, "tiny" -> 5L),
      "over-quota group capped, small group untouched")
    // deterministic election: identical membership on re-run
    val again = Sampling.quotaGroups(df, "doc_id", "source", maxPerGroup = 10)
    assert(got.collect().map(_.getLong(0)).sorted.toSeq ==
      again.collect().map(_.getLong(0)).sorted.toSeq)
    // the scale property: the rank<=k filter compiles to a group-limit
    // (WindowGroupLimit), which pre-prunes each map partition to its
    // local top-k BEFORE the exchange — a mega-domain never ships its
    // whole crawl through the shuffle
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected a WindowGroupLimit group-limited plan, got:\n$plan")
  }
}
