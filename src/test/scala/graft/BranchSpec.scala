package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TieredCatalog
import graft.storage.TieredTable

/** Branches — named MUTABLE append-lineage refs: `CALL
  * graft.system.create_branch` forks at the head, `INSERT INTO` under
  * `spark.graft.wap.branch` accumulates ANY number of appends on it
  * (the multi-batch write-audit-publish the single-id WAP refuses),
  * `VERSION AS OF '<branch>'` serves the branch view, `fast_forward`
  * publishes everything as ONE snapshot, `drop_branch` discards.
  * Tags and branches share the VERSION AS OF namespace (collision
  * refused both ways); retention pins the fork parent.
  */
class BranchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mk(name: String): (TieredTable, String) = {
    val dir = Files.createTempDirectory(s"graft-branch-$name").toString
    val t = TieredTable(spark, s"$dir/$name")
    TieredCatalog.register("br", name, s"$dir/$name")
    (t, s"graft.br.$name")
  }

  test("multi-batch staging: two INSERTs under wap.branch, invisible " +
       "to main, audited as one view, fast_forward publishes ONE snapshot") {
    val (t, name) = mk("flow")
    t.commitAppend(Seq((1L, "base")).toDF("id", "v"))
    spark.sql("CALL graft.system.create_branch('br.flow', 'day1')")
    spark.conf.set("spark.graft.wap.branch", "day1")
    try {
      spark.sql(s"INSERT INTO $name VALUES (2, 'batch-a')")
      spark.sql(s"INSERT INTO $name VALUES (3, 'batch-b')")
    } finally spark.conf.unset("spark.graft.wap.branch")

    assert(spark.table(name).count() == 1,
      "branch appends must not leak into main")
    assert(t.latestSnapshotId == 1L)
    assert(spark.sql(s"SELECT * FROM $name VERSION AS OF 'day1'")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "base"), (2L, "batch-a"), (3L, "batch-b")))
    assert(spark.sql(s"SELECT name, type FROM graft.br.`flow$$refs`")
      .as[(String, String)].collect().toSet == Set(("day1", "branch")))

    spark.sql("CALL graft.system.fast_forward('br.flow', 'day1')")
    assert(t.latestSnapshotId == 2L,
      "both batches publish as ONE snapshot")
    assert(spark.table(name).count() == 3)
    assert(t.branches.isEmpty)
  }

  test("fast_forward lands on a head that moved past the fork; " +
       "retention pins the fork parent while the branch lives") {
    val (t, name) = mk("moved")
    t.commitAppend(Seq((1L, "base")).toDF("id", "v"))
    t.createBranch("wip")
    t.appendToBranch(Seq((10L, "branched")).toDF("id", "v"), "wip")
    t.commitAppend(Seq((2L, "mainline")).toDF("id", "v"))
    t.commitAppend(Seq((3L, "mainline2")).toDF("id", "v"))

    t.vacuum(keepLast = 1)
    assert(t.snapshot(1L).isDefined,
      "the fork parent must survive vacuum while the branch lives")
    assert(spark.sql(s"SELECT * FROM $name VERSION AS OF 'wip'")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "base"), (10L, "branched")))

    t.fastForward("wip")
    assert(spark.table(name).as[(Long, String)].collect().toSet ==
      Set((1L, "base"), (2L, "mainline"), (3L, "mainline2"),
        (10L, "branched")))
    t.vacuum(keepLast = 1)
    assert(t.snapshot(1L).isEmpty,
      "publishing the branch releases the pinned parent")
  }

  test("spark.graft.wap.branch affects READS too: plain queries serve " +
       "the branch view while set; tables without the branch untouched") {
    val (t, name) = mk("readview")
    val (other, otherName) = mk("readother")
    t.commitAppend(Seq((1L, "base")).toDF("id", "v"))
    other.commitAppend(Seq((7L, "other")).toDF("id", "v"))
    t.createBranch("audit")
    spark.conf.set("spark.graft.wap.branch", "audit")
    try {
      // writes keep routing to the branch…
      spark.sql(s"INSERT INTO $name VALUES (2, 'cand')")
      // …and plain reads of the SAME table now serve the branch view
      assert(spark.table(name).as[(Long, String)].collect().toSet ==
        Set((1L, "base"), (2L, "cand")),
        "reads under wap.branch must see the branch (Iceberg semantics)")
      // a table without that branch reads main as always
      assert(spark.table(otherName).as[(Long, String)].collect().toSet ==
        Set((7L, "other")))
    } finally spark.conf.unset("spark.graft.wap.branch")
    // conf unset → main view again (the candidate never published)
    assert(spark.table(name).as[(Long, String)].collect().toSet ==
      Set((1L, "base")))
    t.dropBranch("audit")
  }

  test("drop_branch discards unpublished files; refusals: duplicate, " +
       "tag/branch name collision, empty fast_forward, both confs set") {
    val (t, name) = mk("refuse")
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("b1")
    t.appendToBranch(Seq((9L, "x")).toDF("id", "v"), "b1")
    spark.sql("CALL graft.system.drop_branch('br.refuse', 'b1')")
    assert(t.branches.isEmpty)
    intercept[IllegalArgumentException](t.fastForward("b1"))

    t.createBranch("dup")
    assert(intercept[IllegalArgumentException](t.createBranch("dup"))
      .getMessage.contains("already exists"))
    // empty branch refuses publication
    assert(intercept[IllegalArgumentException](t.fastForward("dup"))
      .getMessage.contains("no appends"))
    // namespace collision, both directions
    assert(intercept[IllegalArgumentException](t.createTag("dup"))
      .getMessage.contains("BRANCH"))
    t.createTag("pinned")
    assert(intercept[IllegalArgumentException](t.createBranch("pinned"))
      .getMessage.contains("TAG"))
    // ambiguous staging confs
    spark.conf.set("spark.graft.wap.id", "x")
    spark.conf.set("spark.graft.wap.branch", "dup")
    try {
      val both = intercept[Exception](
        spark.sql(s"INSERT INTO $name VALUES (5, 'z')"))
      assert(both.getMessage.contains("one staging target"))
    } finally {
      spark.conf.unset("spark.graft.wap.id")
      spark.conf.unset("spark.graft.wap.branch")
    }
    // unknown branch insert fails loudly
    spark.conf.set("spark.graft.wap.branch", "ghost")
    try {
      val ghost = intercept[Exception](
        spark.sql(s"INSERT INTO $name VALUES (6, 'w')"))
      assert(ghost.getMessage.contains("ghost"))
    } finally spark.conf.unset("spark.graft.wap.branch")
  }
}
