package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TieredCatalog
import graft.storage.TieredTable

/** The DSv2 streaming SINK ([[org.apache.spark.sql.GraftStreamingWrite]]):
  * `df.writeStream.toTable("graft.db.t")` — executors stage each
  * epoch's rows as parquet, the driver commits them as a tagged
  * segment (flat log: zero-copy renames) or through the upsert /
  * layout read-back paths. Paired with the r9 log-tail source this
  * closes the loop: a graft table can be both ends of a Structured
  * Streaming job with nothing but table names.
  */
class StreamingWriteSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mkTable(name: String, pk: Seq[String] = Nil,
                      partitionBy: Seq[String] = Nil,
                      schemaDdl: String = "id BIGINT, v STRING")
      : (TieredTable, String) = {
    val dir = Files.createTempDirectory(s"graft-sws-$name").toString
    val t = TieredTable(spark, s"$dir/$name", pk = pk,
      partitionBy = partitionBy)
    // a brand-new sink is EMPTY — persist the declared schema the way
    // CREATE TABLE would, so the relation resolves before first write
    graft.storage.TableFs.forPath(s"$dir/$name")
      .writeString(s"$dir/$name/meta/SCHEMA", schemaDdl)
    TieredCatalog.register("sws", name, s"$dir/$name", pk = pk,
      partitionBy = partitionBy)
    (t, s"graft.sws.$name")
  }

  test("writeStream.toTable on a flat log table: epochs commit as " +
       "tagged segments by file move, exactly-once across restart") {
    val (src, srcName) = mkTable("src")
    val (sink, sinkName) = mkTable("sink")
    src.appendLog(Seq((1L, "a")).toDF("id", "v"))

    val ckpt = Files.createTempDirectory("graft-sws-ck").toString
    def start() = spark.readStream.table(srcName)
      .writeStream.option("checkpointLocation", ckpt)
      .toTable(sinkName)

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(spark.read.table(sinkName).as[(Long, String)].collect().toSet
        == Set((1L, "a")))
      src.appendLog(Seq((2L, "b")).toDF("id", "v"))
      q1.processAllAvailable()
      assert(spark.read.table(sinkName).as[(Long, String)].collect().toSet
        == Set((1L, "a"), (2L, "b")))
    } finally q1.stop()

    // the fast path MOVED the staged files: no `_stream-` debris with
    // content remains for the committed epochs, and each sink segment
    // carries its epoch tag
    val fs = graft.storage.TableFs.forPath(sink.tablePath)
    assert(sink.logSegments.nonEmpty)
    val tags = sink.logSegments.flatMap(s =>
      fs.readString(s"${sink.tablePath}/log/seg-${"%06d".format(s)}/_TAG"))
    assert(tags.nonEmpty && tags.forall(_.startsWith("stream-")),
      s"segments must carry their epoch tags: $tags")

    // source appends while the consumer is DOWN; restart resumes and
    // delivers exactly once (offsets + epoch tags both guard)
    src.appendLog(Seq((3L, "c")).toDF("id", "v"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.table(sinkName).as[(Long, String)].collect()
      assert(rows.length == rows.distinct.length, s"no duplicates: ${rows.toSeq}")
      assert(rows.toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q2.stop()
  }

  test("PK sink: streamed epochs commit as upserts — last write wins " +
       "per key") {
    val (src, srcName) = mkTable("pksrc")
    val (sink, sinkName) = mkTable("pksink", pk = Seq("id"))
    src.appendLog(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val ckpt = Files.createTempDirectory("graft-sws-pk").toString
    val q = spark.readStream.table(srcName)
      .writeStream.option("checkpointLocation", ckpt)
      .toTable(sinkName)
    try {
      q.processAllAvailable()
      src.appendLog(Seq((1L, "a2")).toDF("id", "v")) // upsert key 1
      q.processAllAvailable()
      assert(spark.read.table(sinkName).as[(Long, String)].collect().toSet
        == Set((1L, "a2"), (2L, "b")),
        "the second epoch must supersede key 1")
    } finally q.stop()
  }

  test("partitioned sink: streamed rows land in Hive layout with the " +
       "partition column readable back") {
    val (src, srcName) = mkTable("psrc", schemaDdl = "id BIGINT, day STRING")
    val (sink, sinkName) = mkTable("psink", partitionBy = Seq("day"),
      schemaDdl = "id BIGINT, day STRING")
    src.appendLog(Seq((1L, "d0"), (2L, "d1")).toDF("id", "day"))
    val ckpt = Files.createTempDirectory("graft-sws-part").toString
    val q = spark.readStream.table(srcName)
      .writeStream.option("checkpointLocation", ckpt)
      .toTable(sinkName)
    try {
      q.processAllAvailable()
      assert(spark.read.table(sinkName).select($"id", $"day")
        .as[(Long, String)].collect().toSet == Set((1L, "d0"), (2L, "d1")))
      // the layout pass really produced col=value dirs in the segment
      val seg = sink.segmentDirPath(sink.logSegments.head)
      val names = graft.storage.TableFs.forPath(seg).listNames(seg)
      assert(names.exists(_.startsWith("day=")),
        s"expected Hive dirs inside the segment, got $names")
    } finally q.stop()
  }

  test("orphaned streaming staging is swept by gcOrphans; readers " +
       "never see it") {
    val (t, name) = mkTable("gc")
    t.appendLog(Seq((1L, "a")).toDF("id", "v"))
    val fs = graft.storage.TableFs.forPath(t.tablePath)
    val debris = s"${t.tablePath}/log/_stream-deadquery/epoch-000003"
    fs.mkdirs(debris)
    fs.writeString(s"$debris/part-00000-1.parquet", "not parquet")
    // invisible to both reads before the sweep
    assert(spark.read.table(name).count() == 1)
    assert(t.logSegments == Seq(0L))
    assert(t.gcOrphans() >= 1)
    assert(!fs.exists(s"${t.tablePath}/log/_stream-deadquery"))
  }
}
