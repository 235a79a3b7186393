package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaterializedView
import graft.storage.TieredTable

/** The change-data-feed contract (SURVEY §2 C2/C3 streaming side): every
  * content-changing commit publishes its op-tagged delta as parquet
  * change files; the files stream through Spark's file source with the
  * consumer cursor in the Spark CHECKPOINT; and the MaterializedView
  * streaming runner is exactly-once across a restart — the reference's
  * continuous changelog subscription (README.md:153-169,247-250) as an
  * ordinary StreamingQuery.
  */
class ChangeFeedSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("append-lineage commits publish +I change files; compact publishes none") {
    val dir = Files.createTempDirectory("graft-cdf").toString
    val t = TieredTable(spark, s"$dir/t", changeDataFeed = true)
    t.appendLog(Seq((1L, "a"), (2L, "b")).toDF("id", "v")); t.tier()
    t.commitAppend(Seq((3L, "c")).toDF("id", "v"))
    val c1 = spark.read.parquet(s"$dir/t/changes/snap-000001")
    assert(c1.select("op").distinct().as[String].collect().toSeq == Seq("+I"))
    assert(c1.count() == 2)
    val c2 = spark.read.parquet(s"$dir/t/changes/snap-000002")
      .select("id", "v", "op").as[(Long, String, String)].collect().toSet
    assert(c2 == Set((3L, "c", "+I")))
    // compact rewrites bytes, not content — no change file by definition
    t.compact()
    assert(t.latestSnapshotId == 3L)
    assert(!Files.exists(Paths.get(s"$dir/t/changes/snap-000003")))
  }

  test("PK commits publish the full op vocabulary (+I, -U/+U pairs, -D)") {
    val dir = Files.createTempDirectory("graft-cdf-pk").toString
    val t = TieredTable(spark, s"$dir/t", pk = Seq("id"), changeDataFeed = true)
    t.commitUpsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // snapshot 2: update key 1, insert key 3
    t.commitUpsert(Seq((1L, "a2"), (3L, "c")).toDF("id", "v"))
    val ops2 = spark.read.parquet(s"$dir/t/changes/snap-000002")
      .select("op", "id", "v").as[(String, Long, String)].collect().toSet
    assert(ops2 == Set(("-U", 1L, "a"), ("+U", 1L, "a2"), ("+I", 3L, "c")),
      "the -U before-image must carry the OLD value")
    // snapshot 3: delete key 2
    t.deleteWhere(col("id") === 2L)
    val ops3 = spark.read.parquet(s"$dir/t/changes/snap-000003")
      .select("op", "id", "v").as[(String, Long, String)].collect().toSet
    assert(ops3 == Set(("-D", 2L, "b")))
  }

  test("change feed across a PARTITION-SPEC EVOLUTION boundary: each " +
       "commit's delta carries the partition values of ITS vintage — " +
       "dir names for the hive vintage, pages either side of it") {
    val dir = Files.createTempDirectory("graft-cdf-evo").toString
    val path = s"$dir/t"
    graft.plans.TieredCatalog.register("cdfevo", "t", path,
      changeDataFeed = true)
    val t = TieredTable(spark, path, changeDataFeed = true)
    t.commitAppend(Seq((1L, "eu", 10L), (2L, "us", 20L))
      .toDF("id", "region", "amt"))                 // snap 1: pages
    spark.sql("CALL graft.system.add_partition_field('cdfevo.t', 'region')")
    val t2 = TieredTable(spark, path, partitionBy = Seq("region"),
      changeDataFeed = true)
    t2.commitAppend(Seq((3L, "ap", 30L)).toDF("id", "region", "amt"))
                                                    // snap 2: hive dirs
    spark.sql("CALL graft.system.drop_partition_field('cdfevo.t', 'region')")
    val t3 = TieredTable(spark, path, changeDataFeed = true)
    t3.commitAppend(Seq((4L, "eu", 40L)).toDF("id", "region", "amt"))
                                                    // snap 3: pages again

    def delta(n: Int) =
      spark.read.parquet(f"$path/changes/snap-$n%06d")
        .select("id", "region", "amt", "op")
        .as[(Long, String, Long, String)].collect().toSet
    assert(delta(1) == Set((1L, "eu", 10L, "+I"), (2L, "us", 20L, "+I")))
    // the hive vintage's delta must surface region FROM THE DIR NAME —
    // the change file is self-contained (a consumer never re-reads the
    // table layout)
    assert(delta(2) == Set((3L, "ap", 30L, "+I")),
      "hive-vintage change file must carry the dir-name partition value")
    assert(delta(3) == Set((4L, "eu", 40L, "+I")))

    // the streaming face replays the whole feed across both boundaries
    val out = Files.createTempDirectory("graft-cdf-evo-out").toString
    val q = t3.readStreamChanges(t3.readCold().schema)
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.read.parquet(s"$out/data")
      .select("id", "region", "amt", "op")
      .as[(Long, String, Long, String)].collect().toSet
    assert(streamed == Set((1L, "eu", 10L, "+I"), (2L, "us", 20L, "+I"),
      (3L, "ap", 30L, "+I"), (4L, "eu", 40L, "+I")),
      s"stream must deliver every vintage's delta: $streamed")
  }

  test("keyless content-rewriting commit is refused BEFORE it publishes") {
    val dir = Files.createTempDirectory("graft-cdf-keyless").toString
    val t = TieredTable(spark, s"$dir/t", changeDataFeed = true)
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[IllegalStateException] {
      t.commitOverwrite(Seq((9L, "z")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("append-lineage"))
    // the refusal ran before the manifest swap: NO snapshot exists for
    // the refused verb and the table still reads its pre-verb content
    assert(t.latestSnapshotId == 1L, "refused verb must not publish")
    assert(t.snapshot(2L).isEmpty, "refused verb must not claim a manifest")
    assert(t.readCold().as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("readStreamChanges delivers committed deltas; checkpoint survives restart exactly-once") {
    val dir = Files.createTempDirectory("graft-cdf-mv").toString
    val src = TieredTable(spark, s"$dir/src", changeDataFeed = true)
    src.commitAppend(Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v"))
    val state = TieredTable(spark, s"$dir/state")
    val mv = new MaterializedView(src, state, keyCols = Seq("k"),
      groupCols = Seq("k"), valCol = "v")
    val ckpt = Files.createTempDirectory("graft-cdf-ckpt").toString

    val q = mv.startStream(ckpt, intervalMs = 100L)
    try q.processAllAvailable() finally q.stop()
    def viewMap(): Map[String, (Long, Long)] =
      mv.view().select("k", "sum_v", "cnt").as[(String, Long, Long)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(viewMap() == Map("a" -> (3L, 2L), "b" -> (3L, 1L)))

    // new commits while the query is DOWN; the restarted query resumes
    // from the checkpoint and applies only the unseen change files
    src.commitAppend(Seq(("b", 7L), ("c", 10L)).toDF("k", "v"))
    val stateSnapsBefore = state.latestSnapshotId
    val q2 = mv.startStream(ckpt, intervalMs = 100L)
    try q2.processAllAvailable() finally q2.stop()
    assert(viewMap() == Map("a" -> (3L, 2L), "b" -> (10L, 2L), "c" -> (10L, 1L)))
    assert(state.latestSnapshotId == stateSnapsBefore + 1,
      "exactly one state commit for the one new change file — the " +
        "bootstrap batch must NOT replay after restart")
  }

  test("vacuum retires change files with their snapshots; gc sweeps dead temp dirs") {
    val dir = Files.createTempDirectory("graft-cdf-vac").toString
    val t = TieredTable(spark, s"$dir/t", changeDataFeed = true)
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))
    t.commitAppend(Seq((2L, "b")).toDF("id", "v"))
    t.commitAppend(Seq((3L, "c")).toDF("id", "v"))
    assert((1 to 3).forall(i =>
      Files.exists(Paths.get(f"$dir/t/changes/snap-$i%06d"))))
    t.vacuum(keepLast = 1)
    // dropped snapshots' deltas go with them (the Delta-CDF retention
    // contract); the kept snapshot's delta survives
    assert(!Files.exists(Paths.get(s"$dir/t/changes/snap-000001")))
    assert(!Files.exists(Paths.get(s"$dir/t/changes/snap-000002")))
    assert(Files.exists(Paths.get(s"$dir/t/changes/snap-000003")))
    // a change-feed write that died before its atomic rename is debris
    // for the orphan collector, never a visible change file
    Files.createDirectories(Paths.get(s"$dir/t/changes/_tmp-snap-000009"))
    assert(t.gcOrphans() >= 1)
    assert(!Files.exists(Paths.get(s"$dir/t/changes/_tmp-snap-000009")))
  }

  test("pre-rename change files block the stream until vacuum retires them") {
    val dir = Files.createTempDirectory("graft-cdf-ren").toString
    val t = TieredTable(spark, s"$dir/t", changeDataFeed = true)
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))
    t.renameColumn("v", "label")
    t.commitAppend(Seq((2L, "b")).toDF("id", "label"))
    // the snap-1 change file carries the old name — a bootstrapping
    // consumer under the new schema would read NULLs from it. The
    // guard resolves column sets from the `_COLUMNS` sidecars (one
    // line per dir, committed atomically with the change files) — no
    // parquet footer is opened at stream construction.
    import java.nio.file.Paths
    for (snap <- Seq("snap-000001", "snap-000002"))
      assert(Files.exists(
        Paths.get(s"$dir/t", "changes", snap, "_COLUMNS")),
        s"change dir $snap must carry its column-set sidecar")
    val e = intercept[IllegalArgumentException] {
      t.readStreamChanges(t.readCold().schema)
    }
    assert(e.getMessage.contains("vacuum past the rename"))
    // vacuum retires the offending delta with its snapshot; the feed
    // opens cleanly on the post-rename files
    t.vacuum(keepLast = 1)
    val stream = t.readStreamChanges(t.readCold().schema)
    assert(stream.isStreaming && stream.columns.contains("label"))
  }

  test("a crashed change publication is repaired at the next consumer, never a permanent gap") {
    import java.nio.file.Paths
    val dir = Files.createTempDirectory("graft-cdf-crash").toString
    val t = TieredTable(spark, s"$dir/t", changeDataFeed = true)
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))            // snap 1
    t.commitAppend(Seq((2L, "b"), (3L, "c")).toDF("id", "v")) // snap 2
    val uuid = t.snapshot(2L).get.changeDir
    assert(uuid.nonEmpty, "the manifest must name its change dir")
    // reconstruct the crash state: manifest published, finalize never
    // ran — the prepared tmp (complete by protocol) is still in place
    val target = Paths.get(s"$dir/t/changes/snap-000002")
    val tmp = Paths.get(s"$dir/t/changes/_tmp-snap-000002-$uuid")
    Files.move(target, tmp)
    // constructing a consumer triggers the repair sweep
    t.readStreamChanges(t.readCold().schema)
    assert(Files.exists(target) && !Files.exists(tmp),
      "recovery must finalize the named tmp")
    assert(spark.read.parquet(target.toString)
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("an empty claimed manifest never wedges the recovery sweep") {
    import java.nio.file.Paths
    val dir = Files.createTempDirectory("graft-cdf-claim").toString
    val t = TieredTable(spark, s"$dir/t", changeDataFeed = true)
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))            // snap 1
    // reconstruct the LocalFsMetaStore crash window: a committer died
    // between its O_EXCL claim and the content move — snap-2.props is
    // claimed but EMPTY — and its prepared tmp is still in place
    Files.createFile(Paths.get(s"$dir/t/meta/snap-000002.props"))
    Files.createDirectories(
      Paths.get(s"$dir/t/changes/_tmp-snap-000002-deadbeef"))
    // consumers and maintenance must keep working (the empty claim
    // itself stays loud for commits / the operator, as documented)
    val stream = t.readStreamChanges(t.readCold().schema)
    assert(stream.isStreaming)
    assert(t.gcOrphans() >= 0)
    // the claimed-but-unknown id keeps its tmp for the operator
    assert(Files.exists(
      Paths.get(s"$dir/t/changes/_tmp-snap-000002-deadbeef")))
  }

  test("a WAL-replayed micro-batch is a no-op (tag idempotence)") {
    val dir = Files.createTempDirectory("graft-cdf-replay").toString
    val src = TieredTable(spark, s"$dir/src", changeDataFeed = true)
    src.commitAppend(Seq(("a", 5L)).toDF("k", "v"))
    val state = TieredTable(spark, s"$dir/state")
    val mv = new MaterializedView(src, state, keyCols = Seq("k"),
      groupCols = Seq("k"), valCol = "v")
    val batch = spark.read.parquet(s"$dir/src/changes/snap-000001")
    mv.applyStreamBatch(batch, batchId = 0L)
    val afterFirst = state.latestSnapshotId
    val sumFirst = mv.view().select("sum_v").as[Long].collect().toSeq
    // the crash-replay: same batchId, same data, applied again
    mv.applyStreamBatch(batch, batchId = 0L)
    assert(state.latestSnapshotId == afterFirst, "replay must not commit")
    assert(mv.view().select("sum_v").as[Long].collect().toSeq == sumFirst,
      "replay must not double-apply the delta")
  }
}
