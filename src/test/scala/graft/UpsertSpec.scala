package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert

class UpsertSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("latestByKey keeps exactly the highest-version row per key") {
    val df = Seq((1, 10, "a"), (1, 20, "b"), (2, 5, "c"))
      .toDF("k", "v", "payload")
    val out = Upsert.latestByKey(df, Seq("k"), Seq(col("v").desc))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(2))).toSeq ==
      Seq((1, "b"), (2, "c")))
  }

  test("property: last-write-wins over random interleavings") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 15) {
      // seq = arrival order; the winner per key is the last arrival
      val rows = List.fill(40)((rnd.nextInt(6), rnd.nextInt(1000)))
      val seqd = rows.zipWithIndex.map { case ((k, p), i) => (k, p, i.toLong) }
      val df = seqd.toDF("k", "payload", "seq")
      val got = Upsert.latestByKey(df, Seq("k"), Seq(col("seq").desc))
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val want = seqd.groupBy(_._1).map { case (k, g) => k -> g.maxBy(_._3)._2 }
      assert(got == want)
    }
  }

  test("merge: updates replace same-key rows, new keys append") {
    val base = Seq((1, "old"), (2, "keep")).toDF("k", "v")
    val upd = Seq((1, "new"), (3, "ins")).toDF("k", "v")
    val got = Upsert.merge(base, upd, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> "new", 2 -> "keep", 3 -> "ins"))
  }
}
