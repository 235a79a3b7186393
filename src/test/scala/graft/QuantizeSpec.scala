package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class QuantizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("int8 quantization: known vector, zero vector, no shuffle") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    // v1: scale = 127; codes = [127, -63, 32, 0] (⌊·+0.5⌋ rounding:
    // -63.5+0.5 = -63, 31.75+0.5 = 32)
    assert(out(0).getDouble(1) == 1.0)
    assert(out(0).getLong(2) == 127L * 1 + -63L * 2 + 32L * 3 + 0L * 4)
    assert(out(0).getLong(3) == 1L) // only the max element saturates
    // zero vector: all-zero codes, nothing saturates
    assert(out(1).getDouble(1) == 0.0)
    assert(out(1).getLong(2) == 0L && out(1).getLong(3) == 0L)
    // map-side only: no exchange in the plan at any corpus size
    val plan = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("quantization roundtrip error is bounded by half a step") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.tables.Tables.load(spark, dir, "embeddings")
    val v = emb.select(col("vec_id"),
      Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("max_abs", array_max(transform(col("v"), x => abs(x))))
      .filter(col("max_abs") > 0)
      .withColumn("step", col("max_abs") / 127.0)
      .withColumn("err", array_max(zip_with(col("v"),
        transform(col("v"), x =>
          floor(x * (lit(127.0) / col("max_abs")) + 0.5) *
            (col("max_abs") / 127.0)),
        (orig, deq) => abs(orig - deq))))
    // max |x - dequant(quant(x))| ≤ step/2 (+ tiny fp slack)
    assert(v.filter(col("err") > col("step") * 0.5 + 1e-12).count() == 0)
  }

  test("int8Codes preserves input columns; centroid sums match a manual fold") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, -2.0f), 7),
      (2L, Array(0.5f, 0.5f), 7),
      (3L, Array(-1.0f, 0.0f), 8)
    ).toDF("vec_id", "embedding", "label")
    val codes = Similarity.int8Codes(emb, "embedding")
    assert(codes.columns.toSet ==
      Set("vec_id", "embedding", "label", "max_abs", "q"))
    val byId = codes.select(col("vec_id"), col("q"))
      .as[(Long, Seq[Long])].collect().toMap
    // scale = 127/max|x|: (1,-2) → (64,-127); (.5,.5) → (127,127); (-1,0) → (-127,0)
    assert(byId(1L) == Seq(64L, -127L))
    assert(byId(2L) == Seq(127L, 127L))
    assert(byId(3L) == Seq(-127L, 0L))
    val cent = codes
      .select(col("label").cast("long").as("label"), posexplode(col("q")))
      .groupBy(col("label"), (col("pos") + 1).as("dim"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(cent((7L, 1)) == ((64L + 127L, 2L)))
    assert(cent((7L, 2)) == ((-127L + 127L, 2L)))
    assert(cent((8L, 1)) == ((-127L, 1L)))
  }
}
