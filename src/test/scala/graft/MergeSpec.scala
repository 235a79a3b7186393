package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TieredTable

/** SQL MERGE semantics on the tiered table: one full-outer key join
  * routes every row to exactly one clause — matched-update,
  * matched-delete, not-matched-insert, or untouched passthrough.
  */
class MergeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmpTable(): TieredTable = {
    val dir = Files.createTempDirectory("graft-mg").toString
    new TieredTable(spark, s"$dir/t", pk = Seq("k"))
  }

  test("all four clause outcomes in one merge") {
    val t = tmpTable()
    t.commitAppend(Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"),
      (4L, 40L, "d")).toDF("k", "v", "s"))
    // source: k=1 update (+5), k=2 delete (flag), k=9 insert; k=3/4 untouched
    val src = Seq((1L, 5L, false), (2L, 0L, true), (9L, 99L, false))
      .toDF("k", "v", "del")
    val snap = t.merge(src, Seq("k"),
      whenMatchedUpdate = Map("v" -> (col("t.v") + col("s.v"))),
      whenMatchedDelete = Some(col("s.del")))
    assert(snap.get.op == "merge")
    val out = t.readCold().as[(Long, Long, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 15L, Some("a")), (3L, 30L, Some("c")),
      (4L, 40L, Some("d")), (9L, 99L, None)),
      "update applied, delete removed, insert padded nulls, rest untouched")
  }

  test("whenNotMatchedInsert=false drops source-only keys") {
    val t = tmpTable()
    t.commitAppend(Seq((1L, 10L)).toDF("k", "v"))
    t.merge(Seq((1L, 1L), (9L, 9L)).toDF("k", "v"), Seq("k"),
      whenMatchedUpdate = Map("v" -> col("s.v")),
      whenNotMatchedInsert = false)
    assert(t.readCold().as[(Long, Long)].collect().toSeq == Seq((1L, 1L)))
  }

  test("multi-matching source is rejected; duplicate NOT-matched keys insert") {
    val t = tmpTable()
    t.commitAppend(Seq((1L, 10L)).toDF("k", "v"))
    // two source rows hit target key 1 → ambiguous, SQL MERGE errors
    val dup = Seq((1L, 1L), (1L, 2L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      t.merge(dup, Seq("k"), whenMatchedUpdate = Map("v" -> col("s.v")))
    }
    assert(e.getMessage.contains("more than once"))
    // duplicate source keys that match NO target row legally insert one
    // row each (SQL semantics — only target multi-match is ambiguous)
    val t2 = tmpTable()
    t2.commitAppend(Seq((1L, 10L)).toDF("k", "v"))
    t2.merge(Seq((9L, 91L), (9L, 92L)).toDF("k", "v"), Seq("k"),
      whenMatchedUpdate = Map("v" -> col("s.v")))
    assert(t2.readCold().as[(Long, Long)].collect().sortBy(_._2).toSeq ==
      Seq((1L, 10L), (9L, 91L), (9L, 92L)))
  }

  test("hot tail blocks merge until tiered") {
    val t = tmpTable()
    t.commitAppend(Seq((1L, 10L)).toDF("k", "v"))
    t.appendLog(Seq((2L, 20L)).toDF("k", "v"))
    val e = intercept[IllegalArgumentException] {
      t.merge(Seq((1L, 1L)).toDF("k", "v"), Seq("k"))
    }
    assert(e.getMessage.contains("tier() before merge"))
    t.tier()
    assert(t.merge(Seq((3L, 30L)).toDF("k", "v"), Seq("k")).isDefined)
    assert(t.readCold().count() == 3)
  }

  test("NULL keys never match: null source inserts, null target passes through") {
    val t = tmpTable()
    t.commitAppend(Seq((Some(1L), 10L), (None: Option[Long], 20L))
      .toDF("k", "v"))
    // two null-key source rows are fine (no multi-match possible) and
    // both insert; the null-key target row is untouched
    t.merge(Seq((Some(1L), 11L), (None: Option[Long], 91L),
        (None: Option[Long], 92L)).toDF("k", "v"), Seq("k"),
      whenMatchedUpdate = Map("v" -> col("s.v")))
    val out = t.readCold().as[(Option[Long], Long)].collect()
      .map(r => (r._1, r._2)).sortBy(p => (p._1.getOrElse(Long.MaxValue), p._2))
    assert(out.toSeq == Seq((Some(1L), 11L), (None, 20L), (None, 91L), (None, 92L)))
  }

  test("merge on an empty table is a no-op returning None") {
    val t = tmpTable()
    assert(t.merge(Seq((1L, 1L)).toDF("k", "v"), Seq("k")).isEmpty)
  }

  test("rollback pins the old file list, keeps history, and survives vacuum") {
    val t = tmpTable()
    t.commitAppend(Seq((1L, 10L)).toDF("k", "v").coalesce(1))
    t.commitAppend(Seq((2L, 20L)).toDF("k", "v").coalesce(1))
    val rb = t.rollbackTo(1L)
    assert(rb.op == "rollback" && rb.id == 3L)
    assert(t.readCold().count() == 1, "current state is snapshot 1's again")
    assert(t.readColdAsOf(2L).count() == 2, "rolled-back snapshot stays time-travelable")
    // CDC across the rollback reports the un-committed rows as deletes
    val ops = t.incrementalRead(2L, 3L, Seq("k"))
      .select(col("op"), col("k")).as[(String, Long)].collect().toSet
    assert(ops == Set(("-D", 2L)))
    // vacuum keeps dirs referenced by the (rolled-back) head
    t.vacuum(keepLast = 1)
    assert(t.readCold().as[(Long, Long)].collect().toSeq == Seq((1L, 10L)))
    // rolling back to a vacuumed snapshot fails loudly
    intercept[IllegalArgumentException](t.rollbackTo(2L))
  }

  test("incrementalRead sees merge as -U/+U pairs, -D, +I ops") {
    val t = tmpTable()
    t.commitAppend(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    t.merge(Seq((1L, 11L, false), (2L, 0L, true), (3L, 30L, false))
        .toDF("k", "v", "del"), Seq("k"),
      whenMatchedUpdate = Map("v" -> col("s.v")),
      whenMatchedDelete = Some(col("s.del")))
    val ops = t.incrementalRead(1L, 2L, Seq("k"))
      .select(col("op"), col("k"), col("v"))
      .as[(String, Long, Long)].collect().toSet
    // the update carries its before-image: -U has the OLD v, +U the new
    assert(ops == Set(("-U", 1L, 10L), ("+U", 1L, 11L),
      ("-D", 2L, 20L), ("+I", 3L, 30L)))
  }
}
