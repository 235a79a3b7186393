package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 4-dim toy corpus: 0⊥1, 2≈0, 3 is 0 scaled (cosine 1)
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Array(2.0f, 0.0f, 0.0f, 0.0f)),
  ).toDF("vec_id", "embedding")

  test("knnBrute ranks by cosine, excludes self, breaks ties by id") {
    val got = Similarity.knnBrute(vecs.filter($"vec_id" === 0L), vecs,
        "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(2)))
    // cos(0,3)=1 > cos(0,2)≈0.994 > cos(0,1)=0
    assert(got.toSeq == Seq((3L, 1), (2L, 2), (1L, 3)))
  }

  test("nearDupPairsBrute finds high-cosine pairs only") {
    val got = Similarity.nearDupPairsBrute(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 3L)))
    assert(!got.contains((0L, 1L)))
  }

  test("LSH pairs are a subset of brute pairs; parallel vectors always collide") {
    val dim = 4
    val brute = Similarity.nearDupPairsBrute(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDupPairs(vecs, "vec_id", "embedding",
        threshold = 0.9, planes = 4, tables = 4, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))
    // 0 and 3 are positive scalar multiples → identical sign signatures
    assert(lsh.contains((0L, 3L)))
  }

  test("planesFor bounds expected bucket size and grows with the corpus") {
    // floor of 4 planes up to 16k vectors, then log growth
    assert(Similarity.planesFor(500) == 4)
    assert(Similarity.planesFor(16384) == 4)
    assert(Similarity.planesFor(16400) == 5)
    assert(Similarity.planesFor(1L << 20) == 10)   // 1M → 1k buckets
    assert(Similarity.planesFor(1L << 34) == 24)   // 16B → bucket ≤ 1024
    // monotone and bounded: expected bucket size never exceeds the cap
    Seq(1L, 1000L, 100000L, 10000000L, 1000000000L).foreach { n =>
      val p = Similarity.planesFor(n)
      assert((n >> p) <= 1024L, s"n=$n planes=$p")
    }
  }

  test("plane sizing is metadata-only: building an LSH pair query " +
       "over parquet triggers NO Spark job before its own action") {
    // r8 verdict #4: the old df.count() sizing ran two full scans
    // before the pair query even started — at 100 TB, pure waste.
    // The estimate now comes from parquet footers/CBO driver-side.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val pairs = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.4)
      val cross = Similarity.lshCrossPairs(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 100),
        emb.filter(org.apache.spark.sql.functions.col("vec_id") >= 100),
        "vec_id", "embedding", threshold = 0.4)
      Thread.sleep(500) // listener events are async; drain
      assert(jobs.get() == 0,
        s"building the pair queries ran ${jobs.get()} eager job(s)")
      // …and the queries themselves still work (the estimate fed a
      // sane geometry)
      assert(pairs.count() >= 0 && cross.count() >= 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("footer row estimate matches the exact count on a parquet table") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert(graft.storage.FileStats.estimatedRows(emb).contains(emb.count()),
      "an unfiltered single-table scan's footer estimate is EXACT")
    // filters are deliberately ignored — the estimate upper-bounds
    val half = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    assert(graft.storage.FileStats.estimatedRows(half).exists(_ >= 10))
  }

  test("exactRows: defined (and exact) only when footers prove the count") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // bare relation: exact, zero jobs
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = graft.storage.FileStats.exactRows(emb)
      Thread.sleep(200) // let any (wrongly) started job reach the bus
      assert(jobs.get() == 0, "exactRows must never run a Spark job")
      assert(n.contains(emb.count()))
    } finally spark.sparkContext.removeSparkListener(listener)
    // projections don't change cardinality — still exact
    assert(graft.storage.FileStats.exactRows(emb.select(col("vec_id")))
      .contains(emb.count()))
    // a FILTER can change cardinality — must refuse, never estimate
    assert(graft.storage.FileStats.exactRows(
      emb.filter(col("vec_id") < 10)).isEmpty)
    // non-file-backed frames refuse
    import spark.implicits._
    assert(graft.storage.FileStats.exactRows(
      Seq(1L, 2L).toDF("x")).isEmpty)
  }

  test("derived-geometry LSH still finds planted near-dups on a skew-heavy corpus") {
    // 200 vectors: 100 near-identical clones of one direction (the skew
    // cluster — real near-dups that MUST collide) + 100 spread across
    // orthogonal-ish directions. Derived planes (floor 4) buckets the
    // spread mass; the clones share signatures by similarity, which is
    // the signal, not an artifact.
    val dim = 8
    val rows = (0 until 100).map { i =>
      val v = Array.fill(dim)(0.0f); v(0) = 1.0f; v(1) = (i % 7) * 1e-4f
      (i.toLong, v)
    } ++ (100 until 200).map { i =>
      val v = Array.fill(dim)(0.0f); v(i % dim) = 1.0f; v((i + 3) % dim) = 0.3f
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.lshNearDupPairs(df, "vec_id", "embedding",
        threshold = 0.999, dim = dim) // planes derived (= floor 4 here)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every clone pair is cosine ≈ 1 and sign-identical → all found
    val clonePairs = (for (a <- 0 until 100; b <- a + 1 until 100)
      yield (a.toLong, b.toLong)).toSet
    assert(clonePairs.subsetOf(got))
    // and nothing below the threshold sneaks in (exact verification gate)
    val brute = Similarity.nearDupPairsBrute(df, "vec_id", "embedding", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(brute))
  }

  test("ivfKnn with nprobe = nCentroids degenerates to exact knn") {
    // probing every cell searches the whole corpus → must equal brute force
    val exact = Similarity.knnBrute(vecs.filter($"vec_id" === 0L), vecs,
        "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivf = Similarity.ivfKnn(vecs.filter($"vec_id" === 0L), vecs,
        "vec_id", "embedding", k = 3, nCentroids = 4, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == exact)
  }

  test("graft_dot is callable from SQL and matches the Column API") {
    graft.functions.GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("v_sql")
    val sql = spark.sql(
      """SELECT a.vec_id a_id, b.vec_id b_id,
        |  graft_dot(CAST(a.embedding AS ARRAY<DOUBLE>),
        |            CAST(b.embedding AS ARRAY<DOUBLE>)) d
        |FROM v_sql a JOIN v_sql b ON a.vec_id < b.vec_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val api = vecs.as("a").join(vecs.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        Similarity.dot(Similarity.toDouble($"a.embedding"),
          Similarity.toDouble($"b.embedding")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sql == api)
  }

  test("planeSign matches the SQL hash60 definition") {
    // hash60("0:0") parity must equal conv(substr(md5('0:0'),1,15),16,10)&1
    val h = Similarity.jvmHash60("0:0")
    assert(h >= 0)
    assert(Similarity.planeSign(0, 0) == (if ((h & 1) == 1) 1.0 else -1.0))
  }

  test("mmrRerank trades similarity for diversity; λ=1 is plain top-k") {
    // query 0 points at +x; 1 and 2 are near-identical close matches;
    // 3 is diagonal, 4 near-orthogonal. With the first pick sitting
    // almost ON the query, any candidate's redundancy-to-picked tracks
    // its query similarity (2-D geometry), so diversity needs a
    // diversity-leaning λ to beat the twin — 0.3 gives ≥0.09 margins
    // at every greedy step.
    val m = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.99f, 0.05f)),
      (2L, Array(0.99f, 0.06f)),
      (3L, Array(0.7071f, 0.7071f)),
      (4L, Array(0.05f, 1.0f)),
    ).toDF("vec_id", "embedding")
    def ids(lambda: Double) =
      Similarity.mmrRerank(m, "vec_id", "embedding", queryId = 0L,
        candidates = 4, k = 3, lambda = lambda)
        .orderBy("rank").collect().map(_.getLong(0)).toSeq
    // λ=1: pure similarity — the redundant twin ranks second
    assert(ids(1.0) == Seq(1L, 2L, 3L))
    // λ=0.3: best match first, then the two DIVERSE directions — the
    // near-twin of pick 1 is priced out of the whole top-3
    assert(ids(0.3) == Seq(1L, 4L, 3L))
  }

  test("s15 on real data: exact match against an independent MMR re-derivation") {
    // the driver records s15 rows-only (the greedy argmax chain is not
    // SQL-expressible) — this is its correctness check: a from-scratch
    // driver-side MMR over the same sf0.001 pool must agree EXACTLY,
    // selection order and e6-scaled scores included, plus the
    // structural invariants (verdict r5 item 5).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val got = graft.operators.Similarity.mmrRerank(emb, "vec_id", "embedding",
        queryId = 0L, candidates = 50, k = 5, lambda = 0.7)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // invariants
    assert(got.map(_._2) == (1L to 5L), "ranks are dense 1..k")
    assert(got.map(_._1).distinct.size == 5, "picked set is duplicate-free")
    assert(got.map(_._3).sliding(2).forall(p => p.head >= p.last),
      "greedy MMR scores are non-increasing (redundancy only grows)")

    // independent re-derivation: plain Scala, no operator code shared
    val all = emb.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val qv = all(0L)
    def dotp(a: Array[Double], b: Array[Double]) =
      a.indices.iterator.map(i => a(i) * b(i)).sum
    def cosv(a: Array[Double], b: Array[Double]) =
      dotp(a, b) / (math.sqrt(dotp(a, a)) * math.sqrt(dotp(b, b)))
    val pool = all.removed(0L).toSeq
      .map { case (id, v) => (id, v, cosv(qv, v)) }
      .sortBy { case (id, _, c) => (-c, id) } // knnBrute's tie-break
      .take(50)
    assert(got.head._1 == pool.head._1,
      "rank 1 must be the raw argmax-cosine candidate (λ-independent)")
    var picked = Vector.empty[(Long, Double)]
    var remaining = pool
    while (picked.size < 5) {
      val (bid, bscore) = remaining.map { case (id, v, cq) =>
        val red = if (picked.isEmpty) 0.0
          else picked.map(p => cosv(v, pool.collectFirst {
            case (i, vv, _) if i == p._1 => vv }.get)).max
        // (1 - 0.7), not literal 0.3: IEEE 1-0.7 = 0.30000000000000004,
        // and the check demands bit-exact agreement after e6 scaling
        id -> (0.7 * cq - (1 - 0.7) * red)
      }.minBy { case (id, s) => (-s, id) }
      picked :+= ((bid, bscore))
      remaining = remaining.filterNot(_._1 == bid)
    }
    val expect = picked.zipWithIndex.map { case ((id, s), i) =>
      (id, (i + 1).toLong, math.rint(s * 1e6).toLong) }
    assert(got == expect, s"operator ${got.toList} vs oracle ${expect.toList}")
  }

  test("knnGraphFromPairs ranks each endpoint's candidates, both directions") {
    import org.apache.spark.sql.functions.col
    // candidate edges: 0-3, 0-2, 0-1 (so node 0 has three candidates,
    // nodes 1/2/3 have one each — only the pair graph is scored)
    val pairs = Seq((0L, 3L), (0L, 2L), (0L, 1L)).toDF("a_id", "b_id")
    val got = Similarity.knnGraphFromPairs(pairs, vecs,
        "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set(
      (0L, 3L, 1), (0L, 2L, 2),        // top-2 of node 0's three candidates
      (1L, 0L, 1), (2L, 0L, 1), (3L, 0L, 1)))
  }

  test("randomProjection: linear, deterministic, and sign-structured") {
    import spark.implicits._
    val dim = 8
    val vecs = Seq(
      (1L, Array.fill(dim)(1.0f)),
      (2L, Array.fill(dim)(2.0f)),     // 2 * vec 1
      (3L, Array.fill(dim)(0.0f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(vecs, "vec_id", "embedding",
        outDim = 4, dim = dim)
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(i => r.getDouble(i))).toMap
    // zero vector projects to zero; scaling the input scales the output
    assert(got(3L).forall(_ == 0.0))
    assert((0 until 4).forall(j => got(2L)(j) == 2.0 * got(1L)(j)))
    // each component is a +/-1-weighted sum, so |p_j| <= dim and integral
    assert(got(1L).forall(p => p == math.rint(p) && math.abs(p) <= dim))
  }


  test("semanticDedup marks only smaller-id in-cell near-duplicates") {
    import spark.implicits._
    // centroid 0 = +x, centroid 1 = +y (nCentroids = 2); ids 2 and 3
    // both land in cell 0; 3 duplicates 2 (same direction), 4 is alone
    // in cell 1
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),   // the codebook
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.8f, 0.2f)),   // cell-0 near-dups
      (4L, Array(0.1f, 0.9f)),                            // cell 1, unique
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.95, nCentroids = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(2L)._1 == 0L && got(3L)._1 == 0L && got(4L)._1 == 1L)
    // the codebook vectors are corpus members too: exactly the smallest
    // id of each semantic neighborhood survives (0 in cell 0, 1 in cell
    // 1), everything near a smaller-id cell-mate is marked
    assert(got(0L)._2 == 0L && got(1L)._2 == 0L)
    assert(got(2L)._2 == 1L && got(3L)._2 == 1L && got(4L)._2 == 1L)
    // raising the threshold past every cosine keeps everything
    val strict = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.9999, nCentroids = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(strict.values.forall(_ == 0L))
  }


  test("pqEncode: codebook vectors encode to themselves; codes stay in range") {
    val out = graft.operators.Similarity.pqEncode(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "vec_id", "embedding", m = 8, k = 16, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // centroid j of every subspace IS vector j's slice, so vector j's
    // nearest centroid in each subspace is itself (distance 0) → its
    // packed code is j repeated in every 4-bit field
    for (j <- 0 until 16) {
      val expect = (0 until 8).map(s => j.toLong << (4 * s)).sum
      assert(out(j.toLong) == expect, s"codebook vector $j should self-encode")
    }
    // all codes are valid 32-bit packs of 4-bit fields
    assert(out.values.forall(c => c >= 0 && c < (1L << 32)))
    // determinism
    val again = graft.operators.Similarity.pqEncode(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "vec_id", "embedding").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("lshCrossPairs equals the mixed-parity restriction of the self-join") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val self = graft.operators.Similarity.lshNearDupPairs(
      e, "vec_id", "embedding", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = self.collect {
      case (a, b) if a % 2 == 0 && b % 2 == 1 => (a, b)
      case (a, b) if a % 2 == 1 && b % 2 == 0 => (b, a)
    }.toSet
    val cross = graft.operators.Similarity.lshCrossPairs(
      e.filter(pmod(col("vec_id"), lit(2)) === 0),
      e.filter(pmod(col("vec_id"), lit(2)) === 1),
      "vec_id", "embedding", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross == expected)
  }
}
