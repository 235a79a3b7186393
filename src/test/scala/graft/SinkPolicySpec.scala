package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SinkPolicy

class SinkPolicySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1), Some("a")), (None, Some("b")), (Some(3), None),
  ).toDF("k", "v")

  test("DROP silently filters rows with nulls in NOT NULL columns") {
    assert(SinkPolicy.enforceNotNull(df, Seq("k")).count() == 2)
    assert(SinkPolicy.enforceNotNull(df, Seq("k", "v")).count() == 1)
    assert(SinkPolicy.enforceNotNull(df, Nil).count() == 3)
  }

  test("ERROR raises on violation, passes clean data through") {
    intercept[IllegalStateException] {
      SinkPolicy.enforceNotNull(df, Seq("k"), SinkPolicy.Error).count()
    }
    val clean = df.na.drop()
    assert(SinkPolicy.enforceNotNull(clean, Seq("k"), SinkPolicy.Error).count() == 1)
  }
}
