package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Events}

case class Ev(event_id: Long, user_id: Long, ts: Timestamp, event_type: String)

class EventsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def t(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  private val evs = Seq(
    Ev(0, 1, t(0), "click"), Ev(1, 1, t(10), "click"),   // session 1 of user 1
    Ev(2, 1, t(70), "view"),                             // gap 60m → session 2
    Ev(3, 2, t(5), "click"),                             // user 2, one session
  )

  test("batch sessionization splits on gap, counts and bounds exact") {
    val got = Events.sessionizeBatch(evs.toDF(), gapMinutes = 30)
      .orderBy("user_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("streaming session_window converges to batch sessionization") {
    val src = MemoryStream[Ev]
    val q = Events.sessionStream(src.toDF(), gap = "30 minutes", delay = "10 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    src.addData(evs: _*)
    q.processAllAvailable()
    // advance the watermark far past every session end, twice (watermark
    // updates at end-of-batch; the flush lands in the following batch)
    src.addData(Ev(99, 999, t(10000), "x"))
    q.processAllAvailable()
    src.addData(Ev(100, 999, t(20000), "x"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess").filter(col("user_id") < 999)
      .select("user_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("streaming hourly windows with watermark finalize exactly once") {
    val src = MemoryStream[Ev]
    val q = Events.hourlyStream(src.toDF(), delay = "30 minutes")
      .writeStream.format("memory").queryName("hourly").outputMode("append").start()
    src.addData(evs: _*)
    q.processAllAvailable()
    src.addData(Ev(99, 999, t(10000), "x"))
    q.processAllAvailable()
    src.addData(Ev(100, 999, t(20000), "x"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("hourly")
      .groupBy("window_start_us", "event_type").agg(sum("cnt").as("c"))
      .filter(col("c") =!= 1 || col("event_type") =!= "x")
      .collect()
    // each (window, type) appears once — append emitted no duplicates
    assert(spark.table("hourly").count() ==
      spark.table("hourly").select("window_start_us", "event_type").distinct().count())
    assert(got.nonEmpty)
  }

  test("stream-stream interval join: views attributed to prior clicks") {
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val c = clicks.toDF().withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("cts"))
    val v = views.toDF().withWatermark("ts", "10 minutes")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("vts"))
    // each view joins clicks by the same user within the prior 30 min;
    // the interval bound is what lets Spark evict join state
    val joined = v.join(c,
      col("c_user") === col("v_user") &&
        col("cts") >= col("vts") - expr("INTERVAL 30 MINUTES") &&
        col("cts") <= col("vts"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    clicks.addData(Ev(1, 1, t(0), "click"), Ev(2, 2, t(100), "click"))
    views.addData(
      Ev(10, 1, t(10), "view"),   // 10 min after click 1 → attributed
      Ev(11, 1, t(50), "view"),   // 50 min after click 1 → outside window
      Ev(12, 3, t(10), "view"))   // no click for user 3
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attrib").select("view_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L)))
  }

  test("simhash pigeonhole blocking has exact recall vs brute hamming") {
    val docs = (0L until 40L).map { i =>
      val words = (0 until 12).map(j => s"w${(i * 7 + j * 3) % 25}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val sigs = Dedup.simhash(docs, "doc_id", "text", width = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(docs, "doc_id", "text", width = 32, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "pigeonhole blocking must find every pair within maxDist")
  }

  test("funnel depth: strict ordering, ties don't count, stages can't skip") {
    val evs = Seq(
      // user 1: full ordered funnel
      Ev(0, 1, t(0), "view"), Ev(1, 1, t(1), "click"), Ev(2, 1, t(2), "purchase"),
      // user 2: click BEFORE the first view → depth stops at view
      Ev(3, 2, t(0), "click"), Ev(4, 2, t(1), "view"), Ev(5, 2, t(2), "purchase"),
      // user 3: view only
      Ev(6, 3, t(0), "view"),
      // user 4: never enters the funnel
      Ev(7, 4, t(0), "error"),
      // user 5: click at the SAME instant as view → strict < fails
      Ev(8, 5, t(0), "view"), Ev(9, 5, t(0), "click"), Ev(10, 5, t(1), "purchase")
    ).toDF()
    val got = Events.funnelBatch(evs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 1L -> 3L, 0L -> 1L))
  }

  test("json prop extraction: present, missing, and malformed keys") {
    val rows = Seq(
      ("click", """{"k": 5}"""),
      ("click", """{"k": 7}"""),
      ("click", """{"other": 1}"""), // key absent → null, excluded from n_k
      ("view", "not json at all")    // malformed → null
    ).toDF("event_type", "props")
    val got = rows
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), count(col("k")).as("n_k"),
        sum(col("k")).as("sum_k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_ => r.getLong(3)))).toMap
    assert(got("click") == ((3L, 2L, Some(12L))))
    assert(got("view") == ((1L, 0L, None))) // sum over no values is NULL
  }

  test("cohortRetention: offsets are relative to each user's first day") {
    import spark.implicits._
    def day(d: Int, minute: Int = 1) =
      new Timestamp(d * 86400000L + minute * 60000L)
    val evs = Seq(
      Ev(0, 1, day(0), "click"), Ev(1, 1, day(0, 30), "view"), // u1 day0 twice
      Ev(2, 1, day(2), "click"),                               // u1 back on day2
      Ev(3, 2, day(1), "click"), Ev(4, 2, day(2), "click"),    // u2 cohort day1
    )
    val got = Events.cohortRetention(evs.toDF())
      .orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L), (1L, 1L, 1L)))
  }

}
