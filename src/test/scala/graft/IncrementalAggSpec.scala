package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalAgg
import graft.storage.TieredTable

/** The incremental-view-maintenance invariant, driven through the real
  * changelog machinery: a grouped (SUM, COUNT) state carried forward
  * ONLY by `changelogSince` deltas must equal a from-scratch rebuild
  * after every round of randomized mutations — upserts of changed and
  * new keys, deletes, and multiple commits landing between polls.
  */
class IncrementalAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rebuilt(t: TieredTable) =
    IncrementalAgg.rebuild(t.readCold(), Seq("g"), "v", "sum_v", "n_rows")
      .orderBy("g").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("maintained state equals a rebuild after every randomized commit round") {
    val rnd = new scala.util.Random(11)
    val dir = Files.createTempDirectory("graft-ivm").toString
    val t = TieredTable(spark, s"$dir/t", pk = Seq("k"))
    def rows(ks: Seq[Int]) =
      ks.map(k => (k, s"g${k % 4}", rnd.between(-50L, 50L))).toDF("k", "g", "v")
    t.commitUpsert(rows(1 to 40))
    // bootstrap: cursor 0 delivers the whole snapshot as +I
    val (c0, boot) = t.changelogSince(0L, Seq("k"))
    var cursor = c0
    var state = IncrementalAgg.applyDelta(
      IncrementalAgg.rebuild(boot.limit(0), Seq("g"), "v", "sum_v", "n_rows"),
      boot, Seq("g"), "v", "sum_v", "n_rows")
      .localCheckpoint(true)
    for (round <- 1 to 5) {
      // random mutation batch; round 3 stacks TWO commits in one poll
      t.commitUpsert(rows(rnd.shuffle((1 to 60).toList).take(10)))
      if (round == 3) {
        t.deleteWhere(col("k") % 5 === 0)
        t.commitUpsert(rows(Seq(100 + round)))
      }
      val (next, delta) = t.changelogSince(cursor, Seq("k"))
      assert(next > cursor, s"round $round must advance the cursor")
      state = IncrementalAgg.applyDelta(state, delta, Seq("g"),
        "v", "sum_v", "n_rows").localCheckpoint(true)
      cursor = next
      val maintained = state.orderBy("g").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(maintained == rebuilt(t),
        s"maintained state diverged from rebuild in round $round")
    }
    // idle poll leaves the state exactly unchanged
    val (cIdle, none) = t.changelogSince(cursor, Seq("k"))
    assert(cIdle == cursor)
    val after = IncrementalAgg.applyDelta(state, none, Seq("g"),
      "v", "sum_v", "n_rows")
    assert(after.orderBy("g").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq == rebuilt(t))
  }

  test("a fully retracted group drops out of the state") {
    val state = Seq(("a", 10L, 2L), ("b", 5L, 1L)).toDF("g", "sum_v", "n_rows")
    val delta = Seq(("-D", "b", 5L), ("+I", "c", 7L)).toDF("op", "g", "v")
    val out = IncrementalAgg.applyDelta(state, delta, Seq("g"),
      "v", "sum_v", "n_rows")
      .orderBy("g").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("a", 10L, 2L), ("c", 7L, 1L)))
  }
}
