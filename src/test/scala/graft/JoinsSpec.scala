package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

class JoinsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("asofJoin matches latest right row at or before each left row") {
    val left = Seq((1L, 1, 100L), (2L, 1, 200L), (3L, 2, 50L))
      .toDF("lid", "k", "t")
    val right = Seq((10L, 1, 100L), (11L, 1, 150L), (12L, 1, 250L),
      (13L, 2, 60L)).toDF("rid", "k", "t")
    val got = Joins.asofJoin(left, right, "k", col("t"), col("t"), Seq("rid"))
      .orderBy("lid")
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
    // lid=1 t=100 → rid 10 (equal ts inclusive); lid=2 t=200 → rid 11;
    // lid=3 t=50 → none (right at 60 is after)
    assert(got.toSeq == Seq((1L, Some(10L)), (2L, Some(11L)), (3L, None)))
  }

  test("rangeSelfJoin equals the naive theta join") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 200).map(i => (i.toLong, rnd.nextInt(100) / 16.0))
      .toDF("id", "v")
    val eps = 0.125
    val naive = df.as("a").join(df.as("b"),
        col("a.id") < col("b.id") &&
          abs(col("a.v") - col("b.v")) <= eps)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Joins.rangeSelfJoin(df, "id", "v", eps)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
  }
}
