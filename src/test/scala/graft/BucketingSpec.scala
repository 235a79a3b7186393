package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("co-located join on same-bucketed tables plans no hash exchange") {
    val facts = (0 until 2000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "fv")
    val dims = (0 until 500).map(i => (i.toLong % 100, s"d$i")).toDF("k", "dv")
    Bucketing.writeBucketed(facts, "b_facts", "k", buckets = 8)
    Bucketing.writeBucketed(dims, "b_dims", "k", buckets = 8)
    // disable auto-broadcast so the bucketed sort-merge path is chosen
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin("b_facts", "b_dims", "k")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it is still correct
      val want = facts.join(dims, Seq("k")).count()
      assert(joined.count() == want)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed aggregation on the bucket key skips the exchange") {
    val agg = spark.table("b_facts").groupBy("k").agg(count(lit(1)))
    val plan = agg.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed agg must not shuffle:\n$plan")
  }
}
