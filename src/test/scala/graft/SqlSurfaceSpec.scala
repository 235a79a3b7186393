package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TieredTable
import graft.tables.Tables

class SqlSurfaceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("spark.sql works over registered fixture tables") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val top = spark.sql(
      """SELECT n_name AS nation_name,
        |       SUM(CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)) AS revenue_cents
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue_cents DESC, nation_name LIMIT 5""".stripMargin)
    assert(top.count() == 5)
    // must agree with the DataFrame-API version of the same query
    val api = graft.queries.Parity.q4TopK(spark, "/root/testdata/sf0.001")
    assert(top.collect().toSeq == api.collect().toSeq)
  }

  test("tiered table registers union/cold/snapshots views like the reference") {
    val dir = Files.createTempDirectory("graft-sql").toString
    val t = TieredTable(spark, s"$dir/t")
    t.appendLog(Seq(1L, 2L).toDF("id")); t.tier()
    t.appendLog(Seq(3L).toDF("id")) // hot tail
    t.createOrReplaceViews("orders_tiered")
    assert(spark.sql("SELECT COUNT(*) FROM orders_tiered").head().getLong(0) == 3)
    assert(spark.sql("SELECT COUNT(*) FROM orders_tiered__cold").head().getLong(0) == 2)
    val snaps = spark.sql(
      "SELECT snapshot_id, operation FROM orders_tiered__snapshots ORDER BY snapshot_id")
    assert(snaps.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
