package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** Approximate aggregates for 100 TB-scale cardinality/quantile work:
  * HLL distinct counts and t-digest-style quantiles are constant-memory
  * mergeable sketches (no exact-distinct shuffle explosion). Sketches
  * are engine-specific, so the contract tested is error-bound, not
  * bit-equality (which is why they are spec-checked, not oracle-checked).
  */
class SketchSpec extends AnyFunSuite with SparkSpec {

  private lazy val events = Tables.load(spark, "/root/testdata/sf0.01", "events")

  test("e4 sketch stats track e3's exact answers per group") {
    val dir = "/root/testdata/sf0.01"
    val exact = graft.queries.Pipeline.e3Stats(spark, dir)
      .select(col("event_type"), col("cnt"), col("median_v")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val sketch = graft.queries.Pipeline.e4SketchStats(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(sketch.keySet == exact.keySet)
    sketch.foreach { case (et, (cnt, users, p50)) =>
      val (exCnt, exMed) = exact(et)
      assert(cnt == exCnt)
      assert(users > 0)
      // t-digest at accuracy 10k on this data is near-exact
      assert(math.abs(p50 - exMed) <= math.max(0.05 * math.abs(exMed), 1e-6),
        s"$et: p50=$p50 vs exact=$exMed")
    }
  }

  test("approx_count_distinct within rsd of exact") {
    val exact = events.select(count_distinct(col("user_id"))).head().getLong(0)
    val approx = events.select(approx_count_distinct(col("user_id"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("approx_percentile brackets the exact median") {
    val exact = events.select(percentile(col("value"), lit(0.5)))
      .head().getDouble(0)
    val approx = events.select(
      percentile_approx(col("value"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) <= 1.0)
  }

  test("HLL sketches merge across partitions (two-phase)") {
    // partial per event_type, merged global ≈ direct global
    val direct = events.select(approx_count_distinct(col("user_id"), 0.02))
      .head().getLong(0)
    val merged = events
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val exact = events.select(count_distinct(col("user_id"))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.1)
    assert(math.abs(direct - exact).toDouble / exact < 0.1)
  }
}
