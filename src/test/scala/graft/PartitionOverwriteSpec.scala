package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{IcebergExport, TieredTable}
import graft.plans.TieredCatalog

/** Partition-scoped INSERT OVERWRITE — the daily-backfill verb
  * (re-run one day of a datalake table without touching the rest),
  * r8 verdict item 3. Semantics: replace exactly the target
  * partition's rows; mechanics: metadata surgery — untouched
  * partitions are kept by SUBDIR REFERENCE into the previous
  * snapshot's directories, never rewritten.
  */
class PartitionOverwriteSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("API: one partition replaced, others kept by reference, " +
       "history time-travelable, vacuum prefix-safe") {
    val dir = Files.createTempDirectory("graft-pow").toString
    val t = TieredTable(spark, s"$dir/t", partitionBy = Seq("day"))
    t.commitAppend(Seq((1L, "d0", 10L), (2L, "d1", 20L), (3L, "d2", 30L))
      .toDF("id", "day", "v"))
    val s1 = t.currentSnapshot.get

    val s2 = t.commitOverwritePartitions(
      Seq((9L, "d1", 99L)).toDF("id", "day", "v"), Seq("day" -> "d1"))
    assert(s2.op == "overwrite-partition")

    // content: d1 replaced, d0/d2 untouched
    assert(t.readCold().select($"id", $"day", $"v").orderBy("id").as[(Long, String, Long)]
      .collect().toSeq == Seq((1L, "d0", 10L), (3L, "d2", 30L), (9L, "d1", 99L)))

    // mechanics: the kept partitions are REFERENCES into snapshot 1's
    // directory (metadata surgery), not rewritten copies
    val keptRefs = s2.files.filter(f =>
      f.contains("snap-000001") && f.contains("day="))
    assert(keptRefs.size == 2, s"expected 2 kept subdir refs: ${s2.files}")
    assert(keptRefs.forall(f => !f.contains("day=d1")))

    // history: snapshot 1 still reads the pre-overwrite content
    assert(t.readColdAsOf(s1.id).select($"id", $"day", $"v").orderBy("id").as[(Long, String, Long)]
      .collect().toSeq == Seq((1L, "d0", 10L), (2L, "d1", 20L), (3L, "d2", 30L)))

    // a second overwrite splits a snapshot that itself holds subdir
    // references (recursive keep/delete split)
    t.commitOverwritePartitions(
      Seq((8L, "d0", 88L)).toDF("id", "day", "v"), Seq("day" -> "d0"))
    assert(t.readCold().select($"id", $"day", $"v").orderBy("id").as[(Long, String, Long)]
      .collect().toSeq == Seq((3L, "d2", 30L), (8L, "d0", 88L), (9L, "d1", 99L)))

    // vacuum keeps snap-000001 alive (its d2 subdir is still
    // referenced) — the prefix-aware liveness check
    t.vacuum(keepLast = 1)
    assert(t.readCold().select($"id", $"day", $"v").orderBy("id").as[(Long, String, Long)]
      .collect().toSeq == Seq((3L, "d2", 30L), (8L, "d0", 88L), (9L, "d1", 99L)))
    assert(t.gcOrphans() == 0,
      "gc must not collect a dir whose subdirs are referenced")
    assert(t.readCold().count() == 3)
  }

  test("refusals: rows outside the target partition, non-prefix " +
       "binding, unpartitioned table, PK not covering partitions") {
    val dir = Files.createTempDirectory("graft-pow-r").toString
    val t = TieredTable(spark, s"$dir/t", partitionBy = Seq("day"))
    t.commitAppend(Seq((1L, "d0", 10L), (2L, "d1", 20L))
      .toDF("id", "day", "v"))

    // SELECT leaking rows outside the target partition: loud failure,
    // staged write discarded, table state unchanged
    val e1 = intercept[IllegalArgumentException](
      t.commitOverwritePartitions(
        Seq((9L, "d1", 99L), (7L, "d7", 77L)).toDF("id", "day", "v"),
        Seq("day" -> "d1")))
    assert(e1.getMessage.contains("outside the target partition"))
    assert(t.readCold().count() == 2 && t.currentSnapshot.get.id == 1L)

    val e2 = intercept[IllegalArgumentException](
      t.commitOverwritePartitions(
        Seq((9L, "d1", 99L)).toDF("id", "day", "v"), Seq("nope" -> "x")))
    assert(e2.getMessage.contains("leading prefix"))

    val flat = TieredTable(spark, s"$dir/flat")
    flat.commitAppend(Seq((1L, 1L)).toDF("id", "v"))
    val e3 = intercept[IllegalArgumentException](
      flat.commitOverwritePartitions(
        Seq((1L, 1L)).toDF("id", "v"), Seq("id" -> "1")))
    assert(e3.getMessage.contains("not partitioned"))

    val pkT = TieredTable(spark, s"$dir/pk", pk = Seq("id"),
      partitionBy = Seq("day"))
    pkT.commitUpsert(Seq((1L, "d0", 10L)).toDF("id", "day", "v"))
    val e4 = intercept[IllegalArgumentException](
      pkT.commitOverwritePartitions(
        Seq((1L, "d0", 11L)).toDF("id", "day", "v"), Seq("day" -> "d0")))
    assert(e4.getMessage.contains("part of the primary key"))
  }

  test("SQL: INSERT OVERWRITE … PARTITION (day='d1') replaces one " +
       "partition; non-partition filters refuse at analysis") {
    spark.sql("DROP TABLE IF EXISTS graft.pow.ev")
    val leftover = java.nio.file.Paths.get(
      s"${TieredCatalog.warehouse}/pow/ev")
    if (Files.exists(leftover)) {
      val s = Files.walk(leftover)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(Files.deleteIfExists(_))
      finally s.close()
    }
    spark.sql(
      """CREATE TABLE graft.pow.ev (id BIGINT, day STRING, v BIGINT)
        |PARTITIONED BY (day)""".stripMargin)
    try {
      spark.sql("INSERT INTO graft.pow.ev VALUES " +
        "(1, 'd0', 10), (2, 'd1', 20), (3, 'd2', 30)")
      spark.sql("CALL graft.system.tier('pow.ev')")
      spark.sql("INSERT OVERWRITE graft.pow.ev PARTITION (day = 'd1') " +
        "SELECT 9L, 99L")
      assert(spark.sql("SELECT id, day, v FROM graft.pow.ev ORDER BY id")
        .as[(Long, String, Long)].collect().toSeq ==
        Seq((1L, "d0", 10L), (3L, "d2", 30L), (9L, "d1", 99L)))

      // snapshots view names the verb; pre-overwrite state time-travels
      val snaps = spark.sql(
        """SELECT snapshot_id, operation FROM `graft`.`pow`.`ev$snapshots`
          |ORDER BY snapshot_id""".stripMargin)
        .as[(Long, String)].collect().toSeq
      assert(snaps.map(_._2) == Seq("tier", "overwrite-partition"),
        snaps.toString)
      assert(spark.sql(
        s"SELECT COUNT(*) FROM graft.pow.ev VERSION AS OF ${snaps.head._1}")
        .head().getLong(0) == 3L)

      // a non-partition filter must refuse loudly, never truncate
      val e = intercept[Exception](spark.sql(
        "INSERT INTO graft.pow.ev REPLACE WHERE v > 10 SELECT 5L, 'd9', 1L"))
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
      assert(messages(e).exists(_.contains("partition")), messages(e).mkString("\n"))
    } finally spark.sql("DROP TABLE IF EXISTS graft.pow.ev")
  }

  test("Iceberg export round-trips a partition-overwritten table " +
       "(subdir-reference snapshots)") {
    val dir = Files.createTempDirectory("graft-pow-x").toString
    val t = TieredTable(spark, s"$dir/x", partitionBy = Seq("day"))
    t.commitAppend(Seq((1L, "d0", 10L), (2L, "d1", 20L), (3L, "d2", 30L))
      .toDF("id", "day", "v"))
    t.commitOverwritePartitions(
      Seq((9L, "d1", 99L)).toDF("id", "day", "v"), Seq("day" -> "d1"))
    IcebergExport.export(t)
    val viaIceberg = IcebergExport.readTable(spark, t.tablePath)
      .select($"id", $"day", $"v").orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    assert(viaIceberg ==
      Seq((1L, "d0", 10L), (3L, "d2", 30L), (9L, "d1", 99L)))
  }
}
