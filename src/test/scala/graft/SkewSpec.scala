package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 90% of facts hit one hot key
  private val facts = ((1 to 900).map(i => (1, s"f$i")) ++
    (1 to 100).map(i => (i % 7 + 2, s"g$i"))).toDF("k", "payload")
  private val dim = (1 to 10).map(i => (i, s"dim$i")).toDF("k", "dv")

  test("saltedJoin matches the plain join result exactly") {
    val plain = facts.join(dim, Seq("k")).orderBy("payload")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    val salted = Skew.saltedJoin(facts, dim, "k", buckets = 8).orderBy("payload")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(salted == plain)
  }

  test("saltedJoin left-outer keeps unmatched fact rows") {
    val extra = facts.union(Seq((999, "nomatch")).toDF("k", "payload"))
    val out = Skew.saltedJoin(extra, dim, "k", buckets = 4, joinType = "left")
    assert(out.count() == extra.count())
    assert(out.filter(col("k") === 999 && col("dv").isNull).count() == 1)
  }

  test("saltedAgg two-phase sum/count equals direct aggregation") {
    val df = facts.withColumn("v", lit(1L))
    val got = Skew.saltedAgg(df, "k", buckets = 8,
        partial = Seq("s" -> sum(col("v")), "c" -> count(lit(1))),
        merge = Seq("s" -> sum(col("s")), "c" -> sum(col("c"))))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val want = df.groupBy("k")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
