package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TieredCatalog
import graft.storage.TieredTable

/** Snapshot TAGS — named immutable refs (Iceberg's tags):
  * `CALL graft.system.create_tag`, `VERSION AS OF 'name'`, the
  * `` `t$refs` `` listing, and the retention contract (vacuum keeps a
  * tagged snapshot and its files; drop_tag releases them). The
  * training-data story: tag the exact corpus state a run consumed and
  * the read stays reproducible through later ingest and retention.
  */
class SnapshotTagSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mk(name: String): (TieredTable, String) = {
    val dir = Files.createTempDirectory(s"graft-tag-$name").toString
    val t = TieredTable(spark, s"$dir/$name")
    TieredCatalog.register("tags", name, s"$dir/$name")
    (t, s"graft.tags.$name")
  }

  test("VERSION AS OF a tag reads the pinned snapshot; numeric ids " +
       "keep working; $refs lists the tag") {
    val (t, name) = mk("basic")
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))
    t.createTag("baseline") // pins snapshot 1
    t.commitAppend(Seq((2L, "b")).toDF("id", "v"))

    assert(spark.sql(s"SELECT * FROM $name VERSION AS OF 'baseline'")
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    assert(spark.sql(s"SELECT * FROM $name VERSION AS OF 1")
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    assert(spark.table(name).count() == 2)

    val refs = spark.sql(s"SELECT * FROM graft.tags.`basic$$refs`")
      .as[(String, String, Long)].collect().toSeq
    assert(refs == Seq(("baseline", "tag", 1L)))
  }

  test("vacuum keeps a tagged snapshot and its files; drop_tag + " +
       "vacuum reclaims them") {
    val (t, name) = mk("vac")
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))
    spark.sql(s"CALL graft.system.create_tag('tags.vac', 'pinned', 1)")
    t.commitAppend(Seq((2L, "b")).toDF("id", "v"))
    t.commitAppend(Seq((3L, "c")).toDF("id", "v"))

    t.vacuum(keepLast = 1)
    // snapshot 2 (untagged) is gone; snapshot 1 (tagged) survives
    assert(t.snapshot(2L).isEmpty, "untagged history must be reclaimed")
    assert(t.snapshot(1L).isDefined, "the tagged snapshot must survive")
    assert(spark.sql(s"SELECT * FROM $name VERSION AS OF 'pinned'")
      .as[(Long, String)].collect().toSet == Set((1L, "a")),
      "the tagged snapshot's FILES must survive vacuum")
    assert(spark.table(name).count() == 3)

    spark.sql(s"CALL graft.system.drop_tag('tags.vac', 'pinned')")
    t.vacuum(keepLast = 1)
    assert(t.snapshot(1L).isEmpty, "dropping the tag releases history")
    assert(t.tags.isEmpty)
  }

  test("tags are immutable and loud: duplicate create, unknown drop, " +
       "unknown read, bad snapshot id all refuse") {
    val (t, name) = mk("loud")
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))
    t.createTag("x")
    val dup = intercept[IllegalArgumentException](t.createTag("x"))
    assert(dup.getMessage.contains("already exists"))
    val unknownDrop = intercept[IllegalArgumentException](t.dropTag("nope"))
    assert(unknownDrop.getMessage.contains("does not exist"))
    val missingSnap = intercept[IllegalArgumentException](
      t.createTag("y", snapshotId = 99L))
    assert(missingSnap.getMessage.contains("not found"))
    val badRead = intercept[Exception](
      spark.sql(s"SELECT * FROM $name VERSION AS OF 'ghost'").collect())
    assert(badRead.getMessage.contains("ghost"))
  }
}
