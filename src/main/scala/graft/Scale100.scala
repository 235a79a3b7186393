package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× scale harness behind SCALING.md's deep-corpus rows — the
  * measurement VERDICT r10 item 3 asked for: the 10× stress rows
  * extrapolated "planesFor sizing holds as the corpus deepens"; this
  * RUNS d4/d10/s2 at ~500 k documents / vectors (sf0.1 × 100) and
  * reports max bucket size and pairs/s next to the wall times.
  *
  * Two corpus shapes, each honest about what it measures:
  *  - documents replicate with the Stress suffix trick → every doc has
  *    (copies−1) cross-shard NEAR-DUPS: the adversarial regime where
  *    LSH verification is output-bound (d4/d10);
  *  - embeddings replicate with per-(vector, shard) deterministic
  *    noise → 500 k DISTINCT vectors: the deepening-corpus regime
  *    where the claim under test is that [[graft.operators.Similarity
  *    .planesFor]] keeps bucket occupancy bounded as n grows (s2).
  *
  * `SPARK_GRAFT_SF_DIR` (default sf0.1), `SPARK_GRAFT_COPIES`
  * (default 100), `SPARK_GRAFT_CPUS` (default 32). Prints one JSON
  * line per measurement plus a trailing summary.
  */
object Scale100 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def line(fields: (String, Any)*): Unit =
      println(fields.map { case (k, v) =>
        "\"" + k + "\":" + (v match {
          case s: String => "\"" + s + "\""
          case d: Double => String.format(java.util.Locale.ROOT, "%.3f",
            Double.box(d))
          case x => x.toString
        })
      }.mkString("{", ",", "}"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- documents at copies× (near-dup adversarial shape) ----
    val docs = graft.tables.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val widened = (0 until copies).map { k =>
      docs.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" shard$k")).as("text"))
    }.reduce(_.union(_)).localCheckpoint(true)
    val vec = graft.operators.Dedup
      .shingleVectors(widened, "doc_id", "text", n = 3)
      .localCheckpoint(true)

    // d4 band-bucket histogram: the quantity that bounds the
    // per-bucket candidate join
    val bandSizes = graft.operators.Dedup.lshBands(vec, k = 16, bands = 4)
      .groupBy(col("sig")).agg(count(lit(1)).as("size"))
      .agg(max(col("size")), expr("percentile_approx(size, 0.99)"),
        avg(col("size")), count(lit(1))).head()
    line("metric" -> "d4_bucket_histogram", "copies" -> copies,
      "docs" -> nDocs * copies,
      "max_bucket" -> bandSizes.getLong(0),
      "p99_bucket" -> bandSizes.getLong(1),
      "mean_bucket" -> bandSizes.getDouble(2),
      "n_buckets" -> bandSizes.getLong(3))

    val (d4Pairs, d4Sec) = timed {
      graft.operators.Dedup.minhashLshPairsFrom(vec, k = 16, bands = 4,
        num = 4, den = 5).count()
    }
    line("metric" -> "d4_lsh_100x", "sec" -> d4Sec, "pairs" -> d4Pairs,
      "pairs_per_sec" -> (d4Pairs / d4Sec))

    // d10: a 1% delta probed against the standing persisted band index
    val corpusV = vec.filter(col("id") % 100 =!= 0)
    val deltaV = vec.filter(col("id") % 100 === 0)
    val cBands = graft.operators.Dedup.lshBands(corpusV, k = 16, bands = 4)
      .localCheckpoint(true) // standing index, staged untimed
    val (d10Pairs, d10Sec) = timed {
      graft.operators.Dedup.incrementalLshPairs(corpusV, deltaV,
        k = 16, bands = 4, num = 4, den = 5,
        corpusBands = Some(cBands)).count()
    }
    line("metric" -> "d10_incr_indexed_100x", "sec" -> d10Sec,
      "pairs" -> d10Pairs, "pairs_per_sec" -> (d10Pairs / d10Sec))

    // ---- embeddings at copies× (deepening-corpus shape) ----
    val emb = graft.tables.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val nVec = emb.count()
    // per-(vector, shard, dim) deterministic HASH noise: distinct new
    // content, not copies — shard 0 keeps the original corpus intact.
    // (A sine-of-index perturbation is rank-2 — every noise vector is
    // a phase-shifted copy of one waveform, so the "new" vectors all
    // sit on a 2-D circle and everything near-dups everything: the
    // first run of this harness measured 5.4 B pairs from exactly that
    // fixture bug. murmur3 over (vec_id, shard, i) is full-rank.)
    val deep = (0 until copies).map { k =>
      if (k == 0) emb.select(col("vec_id"), col("embedding"))
      else emb.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> " +
          s"x + float(pmod(hash(vec_id, $k, i), 1000) / 500.0 - 1.0))")
          .as("embedding"))
    }.reduce(_.union(_)).localCheckpoint(true)

    val planes = graft.operators.Similarity.planesForCorpus(deep)
    val occ = graft.operators.Similarity
      .lshBucketSizes(deep, "vec_id", "embedding")
      .agg(max(col("size")), expr("percentile_approx(size, 0.99)"),
        avg(col("size")), count(lit(1))).head()
    line("metric" -> "s2_bucket_histogram", "copies" -> copies,
      "vectors" -> nVec * copies, "planes" -> planes,
      "max_bucket" -> occ.getLong(0), "p99_bucket" -> occ.getLong(1),
      "mean_bucket" -> occ.getDouble(2), "n_buckets" -> occ.getLong(3))

    val (s2Pairs, s2Sec) = timed {
      graft.operators.Similarity.lshNearDupPairs(deep, "vec_id",
        "embedding", threshold = 0.4).count()
    }
    line("metric" -> "s2_lsh_100x", "sec" -> s2Sec, "pairs" -> s2Pairs,
      "pairs_per_sec" -> (s2Pairs / s2Sec))

    line("metric" -> "scale100_done", "copies" -> copies,
      "docs" -> nDocs * copies, "vectors" -> nVec * copies)
    spark.stop()
  }
}
