package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up stress harness behind SCALING.md's measured numbers: the
  * sf0.1 corpus replicated `copies`× with a per-shard suffix token —
  * every original document gains (copies−1) cross-shard NEAR-duplicates
  * (the suffix shifts a few shingles, so pairs pass a 0.8-Jaccard
  * check), the adversarial regime for dedup. Runs the dedup family and
  * prints one JSON line of wall times; compare against the 1× bench to
  * see whether runtime tracks corpus size or output size.
  *
  * `SPARK_GRAFT_SF_DIR` (default sf0.1), `SPARK_GRAFT_COPIES`
  * (default 10), `SPARK_GRAFT_CPUS` (default 32).
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // same instants as Verify
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // merge-on-read SQL reads resolve in the analyzer (the
      // mor_resolve_* comparison below drives them through spark.sql)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.tables.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val n = base.count()
    val widened = (0 until copies).map { k =>
      base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" shard$k")).as("text"))
    }.reduce(_.union(_)).localCheckpoint(true) // isolate input build from timings

    def time(name: String)(f: => DataFrame): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f.count()
      (name, (System.nanoTime() - t0) / 1e9, rows)
    }

    val vec = graft.operators.Dedup.shingleVectors(widened, "doc_id", "text", n = 3)
      .localCheckpoint(true) // shared substrate, like Pipeline's memo
    val results = Seq(
      time("d3_pairs") {
        graft.operators.Dedup.ngramJaccardPairsFrom(vec, num = 4, den = 5) },
      time("d4_lsh") {
        graft.operators.Dedup.minhashLshPairsFrom(vec, k = 16, bands = 4,
          num = 4, den = 5) },
      time("d6_simhash_pairs") {
        graft.operators.Dedup.simhashPairs(widened, "doc_id", "text",
          width = 48, maxDist = 3) },
      time("d8_chunk_dedup") {
        graft.operators.Dedup.chunkDedup(widened, "doc_id", "text",
          chunkTokens = 16) },
      // d10's O(Δ) claim, measured against d4_lsh's full recompute on
      // the SAME corpus and substrate: a 10%-of-corpus batch probed
      // against the standing index should cost a fraction of the full
      // pair job — the number SCALING.md quotes for why per-commit
      // dedup stays flat as the corpus grows. Two variants: bands
      // recomputed from the vector index (no persisted band table), and
      // the production shape probing a PERSISTED band index (built
      // untimed below — on disk it is maintenance state, not query work)
      time("d10_incremental") {
        graft.operators.Dedup.incrementalLshPairs(
          corpusVectors = vec.filter(col("id") % 10 =!= 0),
          deltaVectors = vec.filter(col("id") % 10 === 0),
          k = 16, bands = 4, num = 4, den = 5) },
      {
        val cBands = graft.operators.Dedup
          .lshBands(vec.filter(col("id") % 10 =!= 0), k = 16, bands = 4)
          .localCheckpoint(true) // the standing index, staged untimed
        time("d10_incr_indexed") {
          graft.operators.Dedup.incrementalLshPairs(
            corpusVectors = vec.filter(col("id") % 10 =!= 0),
            deltaVectors = vec.filter(col("id") % 10 === 0),
            k = 16, bands = 4, num = 4, den = 5,
            corpusBands = Some(cBands)) }
      },
      // sequence packing at 10×: the two-pass prefix sum + chunk
      // explode (c13's shape) and shard-local FFD (c14's) — both
      // should scale linearly in the corpus; the prefix sum's only
      // coordination is B driver rows, FFD's is none
      time("c13_pack_chunks") {
        graft.operators.Packing.packChunks(widened,
          size(split(col("text"), " ")), chunkLen = 256L, buckets = 32) },
      time("c14_pack_bins") {
        graft.operators.Packing.packBinsFFD(widened,
          size(split(col("text"), " ")), binLen = 512L, shards = 32) },
    ) ++ {
      // bucketed vs default merge-on-read: the SAME three-delta upsert
      // history committed into both layouts, the SAME resolved
      // aggregate through the SQL face — the structural claim is the
      // exchange count (0 vs 1); wall-clock rides along
      import graft.plans.TieredCatalog
      def build(nm: String, buckets: Int): String = {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-stress-$nm").toString
        val t = graft.storage.TieredTable(spark, s"$dir/t",
          pk = Seq("doc_id"), mergeOnRead = true, bucketBy = buckets)
        val base = widened.withColumn("n", length(col("text")).cast("long"))
        t.commitUpsert(base)
        t.commitUpsert(base.filter(col("doc_id") % 7 === 0)
          .withColumn("n", col("n") * 100))
        t.commitUpsert(base.filter(col("doc_id") % 13 === 0)
          .withColumn("n", col("n") + 5))
        TieredCatalog.register("stress", nm, s"$dir/t",
          pk = Seq("doc_id"), mergeOnRead = true, bucketBy = buckets)
        s"graft.stress.$nm"
      }
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.plans.GraftTableCatalog].getName)
      val defName = build("mor_def", 0)
      val bukName = build("mor_buk", 32)
      def exchanges(sql: String): Int =
        spark.sql(sql).queryExecution.executedPlan.toString
          .linesIterator.count(_.contains("Exchange hashpartitioning"))
      val q = (n: String) => s"SELECT SUM(n) AS s FROM $n"
      val warm = spark.sql(q(defName)).head().getLong(0) // warm both
      require(warm == spark.sql(q(bukName)).head().getLong(0),
        "bucketed and default layouts must resolve identically")
      // in these two rows the "rows" field is the EXCHANGE COUNT of
      // the resolved read's plan — the structural claim under test
      def measure(nm: String, table: String): (String, Double, Long) = {
        val t0 = System.nanoTime()
        spark.sql(q(table)).head().getLong(0)
        (nm, (System.nanoTime() - t0) / 1e9, exchanges(q(table)).toLong)
      }
      Seq(measure("mor_resolve_default_exch", defName),
        measure("mor_resolve_bucketed_exch", bukName))
    }
    val qs = results.map { case (k, sec, rows) =>
      s""""$k":{"sec":$sec,"rows":$rows}""" }.mkString("{", ",", "}")

    // File-skipping stress: orders committed in half-year bands (the
    // time-ingested layout), then a one-band range query through
    // readColdWhere vs the full scan — files opened is the scale
    // metric (wall-clock at this size is dominated by fixed overhead;
    // at 100 TB files-not-opened IS the win). Measured at 1× (14 files)
    // AND `copies`× (14 × copies files — each copy commits its own
    // bands with shifted keys) to show the skip RATIO holds as the
    // file count grows: planning touches O(matching files) regardless.
    val skipDir = java.nio.file.Files
      .createTempDirectory("graft-stress-skip").toString
    val orders = graft.tables.Tables.load(spark, sfDir, "orders")
    val d = col("o_orderdate")
    val bands = (0 until 14).map { i =>
      val lo = add_months(lit("1995-01-01").cast("date"), i * 6)
      val hi = add_months(lit("1995-01-01").cast("date"), (i + 1) * 6)
      d >= lo && (if (i == 13) lit(true) else d < hi)
    }
    val cond = d >= lit("1997-01-01").cast("date") &&
      d < lit("1997-07-01").cast("date")
    def q13At(name: String, nCopies: Int): String = {
      val t = new graft.storage.TieredTable(spark, s"$skipDir/$name")
      for (k <- 0 until nCopies; b <- bands)
        t.commitAppend(orders.filter(b)
          .withColumn("o_orderkey", col("o_orderkey") + lit(k * 100000000L))
          .coalesce(1))
      val tPlan0 = System.nanoTime()
      val (kept, total) = t.skippingCounts(cond)
      val planSec = (System.nanoTime() - tPlan0) / 1e9
      val tFull0 = System.nanoTime()
      val fullRows = t.readCold().filter(cond).count()
      val fullSec = (System.nanoTime() - tFull0) / 1e9
      val tSkip0 = System.nanoTime()
      val skipRows = t.readColdWhere(cond).count()
      val skipSec = (System.nanoTime() - tSkip0) / 1e9
      require(fullRows == skipRows, "skipping changed an answer")
      s""""q13_skip_${nCopies}x":{"files_kept":$kept,"files_total":$total,""" +
        s""""plan_sec":$planSec,"full_sec":$fullSec,"skip_sec":$skipSec,""" +
        s""""rows":$skipRows}"""
    }
    val q13Json = q13At("orders_1x", 1) + "," + q13At("orders_Nx", copies)

    // q16 metadata-only aggregate at copies×: COUNT/MIN/MAX answered
    // from the sidecars — files OPENED must stay 0 as file count grows.
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.plans.GraftTableCatalog].getName)
    graft.plans.TieredCatalog.register("stress", "orders_nx",
      s"$skipDir/orders_Nx")
    val tAgg0 = System.nanoTime()
    val agg = spark.sql(
      """SELECT COUNT(*) AS cnt, MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
        |FROM graft.stress.orders_nx""".stripMargin).collect()(0)
    val aggSec = (System.nanoTime() - tAgg0) / 1e9
    val (aggOpened, aggTotal) = graft.storage.FileStats
      .lastSkipFor("stress.orders_nx").getOrElse((-1, -1))
    val q16Json = s""""q16_meta_agg_${copies}x":{"files_opened":$aggOpened,""" +
      s""""files_total":$aggTotal,"sec":$aggSec,"cnt":${agg.getLong(0)}}"""

    // q17 bloom point lookup at (3·copies) key-scattered files: every
    // file spans the whole key range (min/max useless); the bloom must
    // keep ~1 file no matter how many commits the table accumulates.
    val nBloomFiles = 3 * copies
    val tb = new graft.storage.TieredTable(spark, s"$skipDir/orders_bloom",
      bloomCols = Seq("o_orderkey"))
    for (i <- 0 until nBloomFiles)
      tb.commitAppend(orders
        .filter(pmod(col("o_orderkey"), lit(nBloomFiles)) === i).coalesce(1))
    val probe = col("o_orderkey") === 7L
    val tBloom0 = System.nanoTime()
    val (bKept, bTotal) = tb.skippingCounts(probe)
    val bloomPlanSec = (System.nanoTime() - tBloom0) / 1e9
    val bloomRows = tb.readColdWhere(probe).count()
    require(bloomRows == orders.filter(probe).count(),
      "bloom skipping changed an answer")
    val q17Json = s""""q17_bloom_${copies}x":{"files_kept":$bKept,""" +
      s""""files_total":$bTotal,"plan_sec":$bloomPlanSec,"rows":$bloomRows}"""

    // Storage-partitioned join at copies×: two tiered tables
    // Hive-partitioned on the same key, joined on (partition key, row
    // key) — once with v2 bucketing ON (keyed scans, zero exchanges)
    // and once OFF (both sides fully shuffled). Wall-clock plus the
    // counted exchanges; at 100 TB the exchange count IS the win (the
    // shuffled bytes scale with the fact tables, the SPJ plan moves
    // none).
    val spjOrders = (0 until copies).map { k =>
      orders.select(
        (col("o_orderkey") + lit(k * 100000000L)).as("k"),
        col("o_custkey"))
    }.reduce(_.union(_))
      // 32 partition values = the executor width: the comparison
      // measures the EXCHANGES, not a parallelism handicap (SPJ runs
      // one task per partition-value group at this scale)
      .withColumn("pp", pmod(col("k"), lit(32)).cast("string"))
      .localCheckpoint(true)
    val spjJson = {
      Seq("a", "b").foreach { s =>
        val t = new graft.storage.TieredTable(spark, s"$skipDir/spj_$s",
          partitionBy = Seq("pp"))
        t.appendLog(spjOrders)
        graft.plans.TieredCatalog.register("stress", s"spj_$s",
          s"$skipDir/spj_$s", partitionBy = Seq("pp"))
      }
      def run(on: Boolean): (Double, Int, Long) = {
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", on.toString)
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled", on.toString)
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
          (!on).toString)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // exchange counting reads the plan pre-execution; AQE's
        // adaptive root would hide it
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val j = spark.table("graft.stress.spj_a")
            .select(col("pp"), col("k"), col("o_custkey").as("ca"))
            .join(spark.table("graft.stress.spj_b")
              .select(col("pp"), col("k"), col("o_custkey").as("cb")),
              Seq("pp", "k"))
          val t0 = System.nanoTime()
          val rows = j.count()
          val sec = (System.nanoTime() - t0) / 1e9
          val ex = j.queryExecution.executedPlan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
          }.size
          (sec, ex, rows)
        } finally Seq("spark.sql.sources.v2.bucketing.enabled",
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
          "spark.sql.requireAllClusterKeysForCoPartition",
          "spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.enabled").foreach(spark.conf.unset)
      }
      // warm BOTH paths once (codegen + OS page cache for the freshly
      // written tables) before timing — whichever leg runs first would
      // otherwise eat the cold-read penalty and bias the comparison
      run(on = true); run(on = false)
      val (onSec, onEx, onRows) = run(on = true)
      val (offSec, offEx, offRows) = run(on = false)
      require(onRows == offRows, "SPJ changed an answer")
      s""""spj_join_${copies}x":{"rows":$onRows,"spj_sec":$onSec,""" +
        s""""spj_exchanges":$onEx,"shuffle_sec":$offSec,""" +
        s""""shuffle_exchanges":$offEx}"""
    }

    // Iceberg-export latency curve: a table accumulating snapshots,
    // export re-run after EVERY commit (the tiering service's cadence,
    // `icebergExport = true`). The r8 incremental-export work claims
    // O(Δ) per call — existing snapshots' manifests are reused
    // byte-for-byte, only the new snapshot's manifest is built — so
    // per-export wall time must stay FLAT as history deepens. The
    // spec pins footer-open counts; this prints the measured curve
    // (SCALING.md's number): export seconds at a 1/10/30/60-snapshot
    // history over a fixed-size delta.
    val te = new graft.storage.TieredTable(spark, s"$skipDir/orders_export")
    val expDelta = orders.limit(2000).coalesce(1).localCheckpoint(true)
    val expCheck = Set(1, 10, 30, 60)
    val expTimes = (1 to 60).flatMap { i =>
      te.commitAppend(expDelta.withColumn("o_orderkey",
        col("o_orderkey") + lit(i * 1000000000L)))
      val t0 = System.nanoTime()
      graft.storage.IcebergExport.export(te)
      val sec = (System.nanoTime() - t0) / 1e9
      if (expCheck(i)) Some(i -> sec) else None
    }
    val expJson = s""""iceberg_export_curve":{""" + expTimes.map {
      case (i, s) => s""""snapshots_$i":$s""" }.mkString(",") + "}"

    // q18b's dirty-group MIN/MAX repair vs full rebuild, on a
    // DELETE-HEAVY changelog built adversarially: every deleted row is
    // its group's current MINIMUM, so every touched group goes dirty —
    // the repair path's worst case (O(|delta| + |state| +
    // |base ∩ dirty|), the semi-join-pruned recompute) against the
    // O(|base|) rebuild it replaces. The claim is the repair stays a
    // fraction of the rebuild even when EVERY delete dirties a group.
    val ivmJson = {
      import graft.operators.IncrementalAgg
      val orders10 = (0 until copies).map { k =>
        orders.select(
          (col("o_orderkey") + lit(k * 1000000000L)).as("o_orderkey"),
          pmod(col("o_custkey") + lit(k), lit(50000)).as("g"),
          (col("o_totalprice").cast("decimal(15,2)") * 100)
            .cast("long").as("v"))
      }.reduce(_.union(_)).localCheckpoint(true)
      val spec = IncrementalAgg.AggSpec(
        sums = Seq("v" -> "sum_v"), cntCol = "n",
        mins = Seq("v" -> "min_v"), maxs = Seq("v" -> "max_v"))
      val state = IncrementalAgg.rebuildFull(orders10, Seq("g"), spec)
        .localCheckpoint(true)
      // the group-minimum row of ~20% of groups, retracted (-D)
      val victims = orders10
        .withColumn("__rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("g")).orderBy(col("v"), col("o_orderkey"))))
        .filter(col("__rk") === 1 && pmod(col("g"), lit(5)) === 0)
        .drop("__rk")
      val delta = victims.withColumn("op", lit("-D"))
        .localCheckpoint(true)
      val deletes = delta.count()
      def clock(f: => DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = f.count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      // warm both paths (codegen + page cache), then time
      clock(IncrementalAgg.applyDeltaFull(state, delta, Seq("g"), spec,
        orders10))
      val remaining = orders10.join(
        victims.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
      clock(IncrementalAgg.rebuildFull(remaining, Seq("g"), spec))
      val (repairSec, repairRows) = clock(
        IncrementalAgg.applyDeltaFull(state, delta, Seq("g"), spec,
          orders10))
      val (rebuildSec, rebuildRows) = clock(
        IncrementalAgg.rebuildFull(remaining, Seq("g"), spec))
      require(repairRows == rebuildRows, "IVM repair changed the group set")
      s""""ivm_repair_${copies}x":{"base_rows":${orders10.count()},""" +
        s""""groups":$repairRows,"deletes":$deletes,""" +
        s""""repair_sec":$repairSec,"rebuild_sec":$rebuildSec}"""
    }

    println(s"""{"metric":"stress","docs":${n * copies},"copies":$copies,""" +
      s""""results":$qs,$q13Json,$q16Json,$q17Json,$spjJson,$expJson,$ivmJson}""")
    spark.stop()
  }
}
