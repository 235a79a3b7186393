package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TieredCatalog
import graft.storage.TieredTable

/** The DSv2 log-tail stream ([[graft.plans.LogTailStream]]): the
  * reference's streaming SELECT over an append table in the spelling
  * Spark users expect —
  *
  * {{{ spark.readStream.table("graft.db.t") }}}
  *
  * Offsets are log-segment ids in Spark's checkpoint (same cursor
  * design as the change feed's snapshot ids). r9: the runtime-mode
  * switch (§2 C3) gains its DSv2 streaming half — ONE name serves
  * `spark.read.table` (batch union) and `spark.readStream.table`
  * (hot-tail stream).
  */
class LogStreamTableSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def freshTable(name: String,
                         partitionBy: Seq[String] = Nil)
      : (TieredTable, String) = {
    val dir = Files.createTempDirectory(s"graft-lts-$name").toString
    val t = TieredTable(spark, s"$dir/$name", partitionBy = partitionBy)
    TieredCatalog.register("lts", name, s"$dir/$name",
      partitionBy = partitionBy)
    (t, s"graft.lts.$name")
  }

  test("streaming read of a log table: segment-id offsets, " +
       "exactly-once restart from the checkpoint") {
    val (t, name) = freshTable("s")
    t.appendLog(Seq((1L, "a")).toDF("id", "v"))

    val ckpt = Files.createTempDirectory("graft-lts-ckpt").toString
    val seen = scala.collection.mutable.Set.empty[(Long, String)]
    def start() = spark.readStream.table(name)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= batch.select(col("id"), col("v"))
            .as[(Long, String)].collect()
        }
        (): Unit
      }
      .start()

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(seen == Set((1L, "a")),
        "the pre-subscription segment bootstraps as the first batch")
      t.appendLog(Seq((2L, "b")).toDF("id", "v"))
      q1.processAllAvailable()
      assert(seen == Set((1L, "a"), (2L, "b")))
    } finally q1.stop()

    // appends while the consumer is DOWN, restart resumes past the
    // checkpointed segment id — never a replay
    t.appendLog(Seq((3L, "c")).toDF("id", "v"))
    seen.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(seen == Set((3L, "c")),
        s"restart must resume past the checkpointed offset; got $seen")
    } finally q2.stop()
  }

  test("maxSegmentsPerTrigger bounds catch-up; partitioned segments " +
       "stream with their partition column intact") {
    val (t, name) = freshTable("p", partitionBy = Seq("day"))
    (1 to 4).foreach(i =>
      t.appendLog(Seq((i.toLong, s"d${i % 2}")).toDF("id", "day")))
    val ckpt = Files.createTempDirectory("graft-lts-ac").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    val seen = scala.collection.mutable.Set.empty[(Long, String)]
    val q = spark.readStream
      .option("maxSegmentsPerTrigger", "2")
      .table(name)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select(col("id"), col("day"))
          .as[(Long, String)].collect()
        seen.synchronized { seen ++= rows; batches += rows.length }
        (): Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen == Set((1L, "d1"), (2L, "d0"), (3L, "d1"), (4L, "d0")),
        s"partition column must survive the per-segment basePath: $seen")
      assert(batches.count(_ > 0) >= 2,
        s"4 segments at 2/trigger must arrive across >=2 batches: $batches")
      assert(batches.forall(_ <= 2),
        s"no batch may exceed the admission bound: $batches")
    } finally q.stop()
  }

  test("a tiered log table still batch-reads the union while the " +
       "stream follows only the hot tail") {
    val (t, name) = freshTable("u")
    t.appendLog(Seq((1L, "cold")).toDF("id", "v"))
    t.tier() // fold segment 1 into the cold tier
    t.appendLog(Seq((2L, "hot")).toDF("id", "v"))
    // batch: union of both tiers, exactly once each
    assert(spark.read.table(name).select($"id", $"v").as[(Long, String)]
      .collect().toSet == Set((1L, "cold"), (2L, "hot")))
    // stream from scratch: whatever segments remain committed replay
    // exactly once (tiering does not duplicate into the stream beyond
    // the segments it leaves on disk)
    val ckpt = Files.createTempDirectory("graft-lts-u").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = spark.readStream.table(name)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= batch.select(col("id"), col("v")).as[(Long, String)]
            .collect()
        }
        (): Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.distinct.size == seen.size, s"no duplicates: $seen")
      assert(seen.contains((2L, "hot")), s"the hot tail must arrive: $seen")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the committed tail in bounded " +
       "batches and self-stops; a later run picks up only the delta") {
    import org.apache.spark.sql.streaming.Trigger
    val (t, name) = freshTable("an")
    (1 to 3).foreach(i =>
      t.appendLog(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val ckpt = Files.createTempDirectory("graft-lts-an").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def drain(): Unit = {
      val q = spark.readStream
        .option("maxSegmentsPerTrigger", "1").table(name)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= b.select(col("id"), col("v")).as[(Long, String)]
              .collect()
          }
          (): Unit
        }
        .start()
      assert(q.awaitTermination(120000), "AvailableNow must self-stop")
    }
    drain()
    assert(seen.toSet == Set((1L, "v1"), (2L, "v2"), (3L, "v3")))
    assert(seen.size == 3, s"exactly once: $seen")
    t.appendLog(Seq((4L, "v4")).toDF("id", "v"))
    drain()
    assert(seen.size == 4 && seen.toSet.contains((4L, "v4")),
      s"the second run drains only the delta: $seen")
  }

  test("a consumer lagging past vacuum fails loudly; a fresh consumer " +
       "bootstraps from the surviving tail") {
    val (t, name) = freshTable("vac")
    (1 to 3).foreach(i => t.appendLog(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    t.tier()
    t.vacuum(keepLast = 1) // retires the tiered segments
    t.appendLog(Seq((9L, "fresh")).toDF("id", "v"))

    val cat = spark.sessionState.catalogManager
      .catalog("graft").asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val tbl = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("lts"), "vac"))
    val scan = tbl.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty)
      .build()
    val ms = scan.toMicroBatchStream("/tmp/unused-ck")
    // lagging checkpoint (read only segment 0, segments 1..2 retired)
    val e = intercept[IllegalStateException] {
      ms.planInputPartitions(graft.plans.LogTailOffset(0L),
        graft.plans.LogTailOffset(3L))
    }
    assert(e.getMessage.contains("retired"), e.getMessage)
    // fresh consumer: initial offset sits just below the oldest
    // SURVIVING segment — bootstrap delivers only the fresh tail
    val init = ms.initialOffset().asInstanceOf[graft.plans.LogTailOffset]
    assert(init.id == 2L, s"oldest survivor is segment 3 → initial 2, got $init")
    val parts = ms.planInputPartitions(init, ms.latestOffset())
    assert(parts.nonEmpty)
  }

  test("a stream starting on an EMPTY hot log (all tiered+vacuumed) " +
       "bootstraps at the watermark, not at -1") {
    val (t, _) = freshTable("empty")
    (1 to 3).foreach(i => t.appendLog(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    t.tier()
    t.vacuum(keepLast = 1) // hot log now EMPTY; ids continue at 3
    val cat = spark.sessionState.catalogManager
      .catalog("graft").asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val tbl = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("lts"), "empty"))
    val ms = tbl.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty)
      .build().toMicroBatchStream("/tmp/unused-ck2")
    val init = ms.initialOffset().asInstanceOf[graft.plans.LogTailOffset]
    assert(init.id == 2L,
      s"empty-log bootstrap must sit at the tiering watermark, got $init")
    // the FIRST segment committed after start must plan, not trip the
    // retirement guard — this consumer never lagged
    t.appendLog(Seq((9L, "fresh")).toDF("id", "v"))
    val parts = ms.planInputPartitions(init, ms.latestOffset())
    assert(parts.nonEmpty, "post-start segment must be readable")
  }

  test("a primary-key table refuses the direct stream and points at " +
       "its change feed") {
    val dir = Files.createTempDirectory("graft-lts-pk").toString
    val t = TieredTable(spark, s"$dir/pk", pk = Seq("id"),
      changeDataFeed = true)
    t.commitUpsert(Seq((1L, "a")).toDF("id", "v"))
    TieredCatalog.register("lts", "pk", s"$dir/pk", pk = Seq("id"),
      changeDataFeed = true)
    val ckpt = Files.createTempDirectory("graft-lts-pkc").toString
    val e = intercept[Exception] {
      spark.readStream.table("graft.lts.pk")
        .writeStream.option("checkpointLocation", ckpt)
        .format("noop").start().processAllAvailable()
    }
    def messages(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ messages(x.getCause)
    assert(messages(e).exists(_.contains("$changes")),
      s"the refusal must point at the change feed, got: ${messages(e)}")
  }
}
