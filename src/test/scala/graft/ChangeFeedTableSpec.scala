package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TieredCatalog
import graft.storage.TieredTable

/** The DSv2 change-feed source (`t$changes`,
  * [[graft.plans.ChangeFeedTable]]): the Delta/Iceberg spelling —
  * `spark.readStream.table("graft.db.`t$changes`")` — with offsets =
  * change-dir snapshot ids in Spark's checkpoint. r8 verdict item 6:
  * consumers no longer need to know the change-feed API.
  */
class ChangeFeedTableSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): (TieredTable, String) = {
    val dir = Files.createTempDirectory(s"graft-cft-$name").toString
    val t = TieredTable(spark, s"$dir/$name", changeDataFeed = true)
    TieredCatalog.register("cft", name, s"$dir/$name", changeDataFeed = true)
    (t, s"graft.cft.`$name$$changes`")
  }

  test("batch read of t$changes returns the full op-tagged feed") {
    val (t, feedName) = freshTable("b")
    t.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.commitAppend(Seq((3L, "c")).toDF("id", "v"))
    val feed = spark.read.table(feedName)
      .select($"id", $"v", $"op").as[(Long, String, String)]
      .collect().toSet
    assert(feed == Set((1L, "a", "+I"), (2L, "b", "+I"), (3L, "c", "+I")))
    // column pruning + filters still ride the stock parquet scan
    assert(spark.read.table(feedName).filter($"id" > 1L).count() == 2)
  }

  test("streaming read: offsets are snapshot ids; restart from the " +
       "checkpoint is exactly-once; pre-subscription commits bootstrap") {
    val (t, feedName) = freshTable("s")
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))

    val ckpt = Files.createTempDirectory("graft-cft-ckpt").toString
    val seen = scala.collection.mutable.Set.empty[(Long, String, String, Long)]
    def start() = spark.readStream.table(feedName)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        seen.synchronized {
          seen ++= batch.select(col("id"), col("v"), col("op"))
            .as[(Long, String, String)].collect().map {
              case (i, v, o) => (i, v, o, bid) }
        }
        (): Unit
      }
      .start()

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(seen.map(r => (r._1, r._2, r._3)) == Set((1L, "a", "+I")),
        "the pre-subscription commit bootstraps as the first batch")
      t.commitAppend(Seq((2L, "b")).toDF("id", "v"))
      q1.processAllAvailable()
      assert(seen.map(r => (r._1, r._2, r._3)) ==
        Set((1L, "a", "+I"), (2L, "b", "+I")))
    } finally q1.stop()

    // commits while the consumer is DOWN…
    t.commitAppend(Seq((3L, "c")).toDF("id", "v"))
    seen.clear() // …then a restart from the same checkpoint delivers
    val q2 = start() // ONLY the unseen delta — never a replay of 1/2
    try {
      q2.processAllAvailable()
      assert(seen.map(r => (r._1, r._2, r._3)) == Set((3L, "c", "+I")),
        s"restart must resume past the checkpointed offset; got $seen")
    } finally q2.stop()
  }

  test("admission control: maxSnapshotsPerTrigger bounds catch-up " +
       "batches instead of one giant backlog batch") {
    val (t, feedName) = freshTable("ac")
    (1 to 5).foreach(i =>
      t.commitAppend(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val ckpt = Files.createTempDirectory("graft-cft-ac").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .option("maxSnapshotsPerTrigger", "2")
      .table(feedName)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += b.count() }; (): Unit
      }
      .start()
    try {
      q.processAllAvailable()
      val counts = batches.synchronized(batches.toList).filter(_ > 0)
      assert(counts.sum == 5, s"all rows must arrive: $counts")
      assert(counts.forall(_ <= 2),
        s"no batch may exceed 2 snapshots' rows: $counts")
      assert(counts.length >= 3,
        s"a 5-snapshot backlog at 2/trigger needs >= 3 batches: $counts")
    } finally q.stop()
  }

  test("PK feed carries the full op vocabulary through SQL") {
    val dir = Files.createTempDirectory("graft-cft-pk").toString
    val t = TieredTable(spark, s"$dir/pk", pk = Seq("id"),
      changeDataFeed = true)
    TieredCatalog.register("cft", "pk", s"$dir/pk", pk = Seq("id"),
      changeDataFeed = true)
    t.commitUpsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.commitUpsert(Seq((1L, "a2")).toDF("id", "v"))
    t.deleteWhere(col("id") === 2L)
    val feed = spark.read.table("graft.cft.`pk$changes`")
      .select($"op", $"id", $"v").as[(String, Long, String)]
      .collect().toSet
    assert(feed == Set(("+I", 1L, "a"), ("+I", 2L, "b"),
      ("-U", 1L, "a"), ("+U", 1L, "a2"), ("-D", 2L, "b")))
  }

  test("MaterializedView.startStream rides the DSv2 feed when the " +
       "source is catalog-registered") {
    val dir = Files.createTempDirectory("graft-cft-mv").toString
    val src = TieredTable(spark, s"$dir/src", changeDataFeed = true)
    TieredCatalog.register("cft", "mvsrc", s"$dir/src",
      changeDataFeed = true)
    src.commitAppend(Seq(("a", 1L), ("b", 3L)).toDF("k", "v"))
    val state = TieredTable(spark, s"$dir/state")
    val mv = new graft.operators.MaterializedView(src, state,
      keyCols = Seq("k"), groupCols = Seq("k"), valCol = "v")
    val ckpt = Files.createTempDirectory("graft-cft-mvck").toString
    val q = mv.startStream(ckpt, intervalMs = 100L)
    try {
      q.processAllAvailable()
      assert(mv.view().orderBy("k").as[(String, Long, Long)]
        .collect().toSeq == Seq(("a", 1L, 1L), ("b", 3L, 1L)))
      src.commitAppend(Seq(("a", 10L)).toDF("k", "v"))
      q.processAllAvailable()
      assert(mv.view().orderBy("k").as[(String, Long, Long)]
        .collect().toSeq == Seq(("a", 11L, 2L), ("b", 3L, 1L)))
      // the running query's source really is the DSv2 change feed,
      // not the file-source glob
      assert(q.lastProgress.sources.head.description
        .contains("change feed"), q.lastProgress.sources.head.description)
      assert(q.lastProgress.sources.head.description.contains("mvsrc"))
    } finally q.stop()
  }

  test("Trigger.AvailableNow on the change feed drains and self-stops") {
    import org.apache.spark.sql.streaming.Trigger
    val (t, feedName) = freshTable("an")
    (1 to 3).foreach(i =>
      t.commitAppend(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val ckpt = Files.createTempDirectory("graft-cft-an").toString
    val n = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.option("maxSnapshotsPerTrigger", "1")
      .table(feedName)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        n.addAndGet(b.count()); (): Unit }
      .start()
    assert(q.awaitTermination(120000), "AvailableNow must self-stop")
    assert(n.get() == 3L)
  }

  test("retention horizon: a lagging consumer fails loudly after " +
       "vacuum; a fresh consumer bootstraps from the surviving suffix") {
    val (t, feedName) = freshTable("vac")
    (1 to 3).foreach(i =>
      t.commitAppend(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    t.vacuum(keepLast = 1) // retires deltas 1..2, records horizon 2
    assert(t.changeFeedHorizon == 2L)

    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val tbl = cat.loadTable(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array("cft"), "vac$changes"))
    val ms = tbl.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty)
      .build().toMicroBatchStream("/tmp/unused-ck")
    // checkpoint at delta 1 — deltas 2 is retired → loud failure, not
    // a silent skip that looks like an empty feed
    val e = intercept[IllegalStateException] {
      ms.planInputPartitions(graft.plans.ChangeFeedOffset(1L),
        graft.plans.ChangeFeedOffset(3L))
    }
    assert(e.getMessage.contains("retired"), e.getMessage)
    // fresh consumer: initial offset = horizon → only snap-3 arrives
    assert(ms.initialOffset() == graft.plans.ChangeFeedOffset(2L))
    val rows = spark.read.table(feedName).count()
    assert(rows == 1L, "batch read sees only the surviving delta")
  }

  test("t$changes on a non-CDF table refuses loudly") {
    val dir = Files.createTempDirectory("graft-cft-no").toString
    TieredTable(spark, s"$dir/no").commitAppend(Seq((1L, 1L)).toDF("id", "v"))
    TieredCatalog.register("cft", "no", s"$dir/no")
    val e = intercept[Exception](
      spark.read.table("graft.cft.`no$changes`").count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("change-data-feed")),
      msgs(e).mkString("\n"))
  }
}
