package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoins

case class ClickEv(click_id: Long, c_uid: Long, c_ts: Timestamp)
case class ErrorEv(err_id: Long, e_uid: Long, e_ts: Timestamp)

/** Stream-stream event-time interval join: the streaming side of the
  * operator whose batch semantics the r2_interval oracle pins.
  */
class StreamJoinsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-08-01 10:$minute%02d:$sec%02d")

  private val clicks = Seq(
    ClickEv(1L, 7L, ts(10)),  // errors at 10:06..10:10 count (5-min band)
    ClickEv(2L, 7L, ts(20)),  // no errors within [10:15, 10:20]
    ClickEv(3L, 9L, ts(10)),  // other user: only their own error counts
    ClickEv(4L, 5L, ts(30)))  // user with no errors at all
  private val errors = Seq(
    ErrorEv(100L, 7L, ts(6)),   // in click-1 band
    ErrorEv(101L, 7L, ts(10)),  // boundary: exactly at click ts counts
    ErrorEv(102L, 7L, ts(4)),   // 6 min before click 1 — outside band
    ErrorEv(103L, 9L, ts(8)),   // click-3 band, other user
    ErrorEv(104L, 9L, ts(11)))  // after click 3 — lookahead 0 excludes

  private def expected: Map[Long, Long] =
    Map(1L -> 2L, 2L -> 0L, 3L -> 1L, 4L -> 0L)

  private def countsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.groupBy(col("click_id"))
      .agg(count(col("e_uid")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("batch interval join matches the hand-computed bands") {
    val got = countsOf(StreamJoins.intervalJoin(
      clicks.toDF(), errors.toDF(), "c_uid", "e_uid", "c_ts", "e_ts",
      lookback = "5 MINUTE", lookahead = "0 SECOND",
      watermark = "1 minute", joinType = "left_outer"))
    assert(got == expected)
  }

  test("streaming inner interval join converges to the batch answer across micro-batches") {
    val cSrc = MemoryStream[ClickEv]
    val eSrc = MemoryStream[ErrorEv]
    val joined = StreamJoins.intervalJoin(
      cSrc.toDF(), eSrc.toDF(), "c_uid", "e_uid", "c_ts", "e_ts",
      lookback = "5 MINUTE", lookahead = "0 SECOND", watermark = "1 minute")
    val q = joined.writeStream.format("memory")
      .queryName("sj_pairs").outputMode("append").start()
    try {
      // split so matching rows arrive in DIFFERENT micro-batches — the
      // match must come out of the join state, not batch-local data
      cSrc.addData(clicks.take(2))
      eSrc.addData(errors.take(1))
      q.processAllAvailable()
      cSrc.addData(clicks.drop(2))
      eSrc.addData(errors.drop(1))
      q.processAllAvailable()
      val got = spark.table("sj_pairs")
        .select(col("click_id"), col("err_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 100L), (1L, 101L), (3L, 103L)))
      // the band predicate doubles as the eviction proof: state holds
      // only rows near the watermark frontier, never the whole history
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty && state.head.numRowsTotal <=
        (clicks.size + errors.size).toLong)
    } finally q.stop()
  }

  test("inputs sharing a column name are rejected") {
    val l = Seq((1L, ts(1))).toDF("k", "ts")
    val r = Seq((1L, ts(1))).toDF("k", "ts")
    val e = intercept[IllegalArgumentException] {
      StreamJoins.intervalJoin(l, r, "k", "k", "ts", "ts",
        "1 MINUTE", "0 SECOND", "1 minute")
    }
    assert(e.getMessage.contains("share columns"))
  }
}
