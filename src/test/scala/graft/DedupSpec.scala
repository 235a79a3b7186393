package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "completely different words entirely here now ok"),
    (4L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps smallest id") {
    val got = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("fingerprints are equal iff texts are equal") {
    val fp = Dedup.fingerprint(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(4L))
    assert(fp(1L) != fp(2L) && fp(1L) != fp(3L))
  }

  test("ngram Jaccard finds the planted near-dup pair and the exact dup") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH pairs are a subset of exact Jaccard pairs and catch exact dups") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 2, num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 2, k = 16, bands = 8, num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((1L, 4L)), "identical docs always collide in every band")
  }

  test("incremental LSH pairs == full pairs restricted to the delta") {
    // duplicates planted in every orientation: delta×delta (10,20),
    // delta×corpus (1,10 and 2,30... via shared text), corpus×corpus
    // (1,2) — the last must be ABSENT from the incremental output
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),   // dup of 1
      (3L, "unrelated content lives in this row alone today"),
    ).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),  // dup of 1,2
      (20L, "alpha beta gamma delta epsilon zeta eta theta"),  // dup of all
      (30L, "totally fresh text that matches nothing else yet"),
    ).toDF("doc_id", "text")
    val cv = Dedup.shingleVectors(corpus, "doc_id", "text", n = 3)
    val dv = Dedup.shingleVectors(delta, "doc_id", "text", n = 3)
    val inc = Dedup.incrementalLshPairs(cv, dv, k = 16, bands = 4,
        num = 4, den = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minhashLshPairsFrom(
        Dedup.shingleVectors(corpus.unionByName(delta), "doc_id", "text",
          n = 3), k = 16, bands = 4, num = 4, den = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deltaIds = Set(10L, 20L, 30L)
    assert(inc == full.filter(p => deltaIds(p._1) || deltaIds(p._2)))
    assert(full.contains((1L, 2L)) && !inc.contains((1L, 2L)),
      "corpus-internal pairs are the prior batches' job")
  }

  test("incremental probe broadcasts the delta side, not the index") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val delta = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val cv = Dedup.shingleVectors(corpus, "doc_id", "text", n = 3)
    val plan = Dedup.incrementalLshPairs(cv,
        Dedup.shingleVectors(delta, "doc_id", "text", n = 3),
        corpusBands = Some(Dedup.lshBands(cv)))
      .queryExecution.executedPlan.toString
    // the contract that matters at 100 TB: the batch-sized delta is the
    // broadcast build side, so the standing index streams map-side and
    // never shuffles O(corpus) band rows
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("simhash: identical docs get identical signatures; near-dups are close") {
    val sig = Dedup.simhash(docs, "doc_id", "text", width = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(2L)) < ham(sig(1L), sig(3L)))
  }

  test("connectedComponents equals driver-side union-find") {
    val rnd = new scala.util.Random(5)
    val pairs = (0 until 60).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a < b }
    val df = pairs.toDF("a_id", "b_id")
    // force the DISTRIBUTED min-label loop (driverEdgeLimit=0); the
    // adaptive driver path must agree with it exactly
    val got = Dedup.connectedComponents(df, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotDriver = Dedup.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == gotDriver)
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = nodes.map { n =>
      val root = find(n)
      // canonical representative = min id in component
      n -> nodes.filter(m => find(m) == root).min
    }.toMap
    assert(got == want)
  }

  test("simhash drops null-text docs; connectedComponents handles string ids") {
    val withNull = Seq((1L, "a b c d"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Dedup.simhash(withNull, "doc_id", "text", width = 32)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // non-integral ids take the type-generic distributed loop
    val strPairs = Seq(("b", "c"), ("a", "b")).toDF("a_id", "b_id")
    val comps = Dedup.connectedComponents(strPairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comps == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("simhash pairs at maxDist 0 returns exactly the identical pair") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
        width = 32, maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 4L)))
  }

  test("chunkDedup: repeated passage survives only at first occurrence") {
    import spark.implicits._
    // chunkTokens=3: doc 1 = [a b c][d e f], doc 2 repeats [a b c] then
    // fresh tokens, doc 3 is entirely doc 1's chunks re-ordered
    val cd = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "d e f a b c"),
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(cd, "doc_id", "text", chunkTokens = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1 keeps both chunks; doc 2 keeps only [x y z]; doc 3 keeps none
    assert(got == Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 0L)))
  }

  test("chunkDedup: kept_fp is the md5 of the surviving chunks in order") {
    import spark.implicits._
    val cd = Seq((1L, "a b c d e f"), (2L, "a b c x y z")).toDF("doc_id", "text")
    val fp = Dedup.chunkDedup(cd, "doc_id", "text", chunkTokens = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(fp(1L) == md5hex("a b c d e f"))
    assert(fp(2L) == md5hex("x y z"))
  }

}
