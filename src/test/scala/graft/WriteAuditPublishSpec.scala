package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TieredCatalog
import graft.storage.TieredTable

/** Write-audit-publish — staged commits (Iceberg's `spark.wap.id`
  * flow): `spark.graft.wap.id` + `INSERT INTO` stages a batch that no
  * normal read sees; `VERSION AS OF '<wapId>'` serves the audit view;
  * `CALL graft.system.publish_wap` cherry-picks it onto the CURRENT
  * head (which may have moved); `abandon_wap` discards it. Retention
  * keeps a staged commit's parent; gcOrphans sweeps stager debris.
  * The training-data story: a pipeline lands a candidate batch, a
  * quality gate audits it against the corpus it would join, and only
  * an approved batch ever becomes corpus.
  */
class WriteAuditPublishSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mk(name: String): (TieredTable, String) = {
    val dir = Files.createTempDirectory(s"graft-wap-$name").toString
    val t = TieredTable(spark, s"$dir/$name")
    TieredCatalog.register("wap", name, s"$dir/$name")
    (t, s"graft.wap.$name")
  }

  test("stage is invisible to main reads; VERSION AS OF audits it; " +
       "publish makes it corpus; $refs lists the pending stage") {
    val (t, name) = mk("flow")
    t.commitAppend(Seq((1L, "base")).toDF("id", "v"))
    spark.conf.set("spark.graft.wap.id", "cand-1")
    try spark.sql(s"INSERT INTO $name VALUES (2, 'staged')")
    finally spark.conf.unset("spark.graft.wap.id")

    assert(spark.table(name).as[(Long, String)].collect().toSet ==
      Set((1L, "base")), "a staged batch must NOT leak into main reads")
    assert(t.latestSnapshotId == 1L, "staging must not commit a snapshot")
    assert(spark.sql(s"SELECT * FROM $name VERSION AS OF 'cand-1'")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "base"), (2L, "staged")),
      "the audit read = parent + staged files")
    assert(spark.sql(s"SELECT * FROM graft.wap.`flow$$refs`")
      .as[(String, String, Long)].collect().toSeq ==
      Seq(("cand-1", "wap", 1L)))

    spark.sql("CALL graft.system.publish_wap('wap.flow', 'cand-1')")
    assert(spark.table(name).as[(Long, String)].collect().toSet ==
      Set((1L, "base"), (2L, "staged")))
    assert(t.latestSnapshotId == 2L)
    assert(t.stagedIds.isEmpty, "publish releases the staging key")
    // the published snapshot is ordinary history: time travel works
    assert(spark.sql(s"SELECT * FROM $name VERSION AS OF 1")
      .as[(Long, String)].collect().toSet == Set((1L, "base")))
  }

  test("publish cherry-picks onto a head that MOVED past the staged " +
       "parent — appends commute") {
    val (t, name) = mk("moved")
    t.commitAppend(Seq((1L, "base")).toDF("id", "v"))
    t.stageAppend(Seq((2L, "staged")).toDF("id", "v"), "cand")
    // the head moves while the audit runs
    t.commitAppend(Seq((3L, "later")).toDF("id", "v"))

    val s = t.publishStage("cand")
    assert(s.id == 3L)
    assert(spark.table(name).as[(Long, String)].collect().toSet ==
      Set((1L, "base"), (2L, "staged"), (3L, "later")),
      "publish must land the staged batch AND keep the interleaved append")
  }

  test("abandon discards the staged files; gcOrphans sweeps debris " +
       "dirs no manifest references") {
    val (t, name) = mk("abandon")
    t.commitAppend(Seq((1L, "base")).toDF("id", "v"))
    t.stageAppend(Seq((2L, "bad")).toDF("id", "v"), "reject-me")
    spark.sql("CALL graft.system.abandon_wap('wap.abandon', 'reject-me')")
    assert(t.stagedIds.isEmpty)
    assert(spark.table(name).count() == 1)
    intercept[IllegalArgumentException](t.publishStage("reject-me"))

    // debris: a stager that died before its conditional PUT — fake it
    // by dropping a dir that matches the wap naming but has no manifest
    val debris = new java.io.File(s"${t.tablePath}/data/wap-dead-deadbeef")
    assert(debris.mkdirs())
    t.gcOrphans()
    assert(!debris.exists(), "unreferenced wap dirs are stager debris")
  }

  test("gcOrphans after publish leaves the PUBLISHED wap data alive — " +
       "snapshots commit staged dirs by reference") {
    val (t, name) = mk("gcpub")
    t.commitAppend(Seq((1L, "base")).toDF("id", "v"))
    t.stageAppend(Seq((2L, "published")).toDF("id", "v"), "keepme")
    t.publishStage("keepme")
    val before = spark.table(name).as[(Long, String)].collect().toSet
    assert(before == Set((1L, "base"), (2L, "published")))

    t.gcOrphans()
    assert(spark.table(name).as[(Long, String)].collect().toSet == before,
      "a published wap dir is referenced by the CURRENT snapshot — " +
        "gc must never touch it")
    // and the sweep still works: an unreferenced sibling goes
    val debris = new java.io.File(s"${t.tablePath}/data/wap-dead-cafebabe")
    assert(debris.mkdirs())
    t.gcOrphans()
    assert(!debris.exists())
    assert(spark.table(name).as[(Long, String)].collect().toSet == before)
  }

  test("gcOrphans keeps a published wap dir whose ONLY reference is a " +
       "kept-partition SUBDIR entry (overwrite → vacuum → gc)") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-wap-gcsub").toString
    val t = new TieredTable(spark, s"$dir/t", partitionBy = Seq("p"))
    t.commitAppend(Seq((1L, "eu"), (2L, "us")).toDF("id", "p"))   // snap 1
    t.stageAppend(Seq((3L, "eu"), (4L, "us")).toDF("id", "p"), "w1")
    t.publishStage("w1")                                          // snap 2
    // partition-scoped overwrite of p=eu keeps p=us by SUBDIR
    // reference into BOTH prior dirs — including the published wap dir
    t.commitOverwritePartitions(
      Seq((9L, "eu")).toDF("id", "p"), Seq("p" -> "eu"))          // snap 3
    val before = t.readCold().select("id", "p")
      .as[(Long, String)].collect().toSet
    assert(before == Set((9L, "eu"), (2L, "us"), (4L, "us")))
    t.vacuum(keepLast = 1) // drop snaps 1-2: only subdir refs remain
    t.gcOrphans()
    assert(t.readCold().select("id", "p")
      .as[(Long, String)].collect().toSet == before,
      "a wap dir referenced only via a kept-partition subdir entry " +
        "must survive gc — pre-fix the snap-only prefix match deleted it")
  }

  test("retention: vacuum keeps a staged commit's parent snapshot " +
       "until publish/abandon releases it") {
    val (t, name) = mk("vac")
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))
    t.stageAppend(Seq((10L, "staged")).toDF("id", "v"), "pend")
    t.commitAppend(Seq((2L, "b")).toDF("id", "v"))
    t.commitAppend(Seq((3L, "c")).toDF("id", "v"))

    t.vacuum(keepLast = 1)
    assert(t.snapshot(1L).isDefined,
      "the staged parent must survive vacuum — the audit read needs it")
    assert(spark.sql(s"SELECT * FROM $name VERSION AS OF 'pend'")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (10L, "staged")))

    t.abandonStage("pend")
    t.vacuum(keepLast = 1)
    assert(t.snapshot(1L).isEmpty,
      "abandoning the stage releases the pinned parent")
  }

  test("refusals: PK tables, INSERT OVERWRITE under a wap id, " +
       "duplicate stage ids, unknown publish/abandon") {
    val dir = Files.createTempDirectory("graft-wap-refuse").toString
    val pkT = TieredTable(spark, s"$dir/pk", pk = Seq("id"))
    pkT.commitUpsert(Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException](
      pkT.stageAppend(Seq((2L, "b")).toDF("id", "v"), "x"))
    assert(e.getMessage.contains("append-only"))

    val (t, name) = mk("refuse")
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))
    t.stageAppend(Seq((2L, "b")).toDF("id", "v"), "dup")
    val dup = intercept[IllegalArgumentException](
      t.stageAppend(Seq((3L, "c")).toDF("id", "v"), "dup"))
    assert(dup.getMessage.contains("already exists"))

    spark.conf.set("spark.graft.wap.id", "ow")
    try {
      val ow = intercept[Exception](
        spark.sql(s"INSERT OVERWRITE $name VALUES (9, 'z')"))
      assert(ow.getMessage.contains("not stageable"))
    } finally spark.conf.unset("spark.graft.wap.id")

    intercept[IllegalArgumentException](t.publishStage("ghost"))
    intercept[IllegalArgumentException](t.abandonStage("ghost"))
    // the audit view of an unknown id refuses like an unknown tag
    val badRead = intercept[Exception](
      spark.sql(s"SELECT * FROM $name VERSION AS OF 'ghost'").collect())
    assert(badRead.getMessage.contains("ghost"))
  }

  test("change feed: a published stage emits its rows as +I lineage") {
    val dir = Files.createTempDirectory("graft-wap-cdf").toString
    val t = TieredTable(spark, s"$dir/t", changeDataFeed = true)
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))
    t.stageAppend(Seq((2L, "b")).toDF("id", "v"), "c1")
    t.publishStage("c1")
    assert(t.committedChangeIds() == Seq(1L, 2L))
    val delta = spark.read.parquet(t.changeDirPath(2L))
    assert(delta.select("id", "op").as[(Long, String)].collect().toSet ==
      Set((2L, "+I")), "the publish commit's delta is the staged batch")
  }
}
