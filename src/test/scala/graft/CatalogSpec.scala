package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TieredCatalog
import graft.storage.TieredTable

/** The shared test session sets `spark.sql.catalog.graft=
  * graft.plans.GraftTableCatalog` — exactly how a user enables the
  * graft catalog on a real cluster.
  */
class CatalogSpec extends AnyFunSuite with SparkSpec {

  private lazy val extSession = spark

  test("graft.<db>.<table> resolves to union/cold/snapshots reads in SQL") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cat").toString
    val t = TieredTable(spark, s"$dir/orders")
    t.appendLog(Seq(1L, 2L, 3L).toDF("id")); t.tier()
    t.appendLog(Seq(4L).toDF("id")) // hot tail
    TieredCatalog.register("demo", "orders", s"$dir/orders")

    assert(extSession.sql("SELECT COUNT(*) AS c FROM graft.demo.orders")
      .head().getLong(0) == 4)
    assert(extSession.sql("SELECT COUNT(*) AS c FROM graft.demo.orders__cold")
      .head().getLong(0) == 3)
    assert(extSession.sql(
      "SELECT snapshot_id FROM graft.demo.orders__snapshots ORDER BY snapshot_id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // joins/aggregates compose with the resolved relation
    assert(extSession.sql(
      """SELECT SUM(a.id) FROM graft.demo.orders a
        |JOIN graft.demo.orders__cold b ON a.id = b.id""".stripMargin)
      .head().getLong(0) == 6)
  }

  test("SQL reads of evolved tables see the merged schema (mergeSchema)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evo").toString
    val t = TieredTable(spark, s"$dir/t")
    t.appendLog(Seq(1L, 2L).toDF("id")); t.tier()           // snapshot 1
    t.appendLog(Seq((3L, "en")).toDF("id", "lang")); t.tier() // snapshot 2
    TieredCatalog.register("demo", "evo", s"$dir/t")
    // union + cold + time-travel paths all include the later-added column
    val u = extSession.sql(
      "SELECT id, lang FROM graft.demo.evo ORDER BY id").collect()
    assert(u.map(r => r.getLong(0) -> Option(r.getAs[String]("lang"))).toSeq ==
      Seq(1L -> None, 2L -> None, 3L -> Some("en")))
    assert(extSession.sql("SELECT lang FROM graft.demo.evo__cold WHERE lang IS NOT NULL")
      .count() == 1)
    assert(extSession.sql("SELECT * FROM graft.demo.evo__v2").columns.contains("lang"))
  }

  test("time travel: __v<N> reads a past snapshot; API readColdAsOf agrees") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tt").toString
    val t = TieredTable(spark, s"$dir/t")
    t.appendLog(Seq(1L, 2L).toDF("id")); t.tier()      // snapshot 1
    t.appendLog(Seq(3L).toDF("id")); t.tier()          // snapshot 2
    TieredCatalog.register("demo", "tt", s"$dir/t")
    assert(extSession.sql("SELECT COUNT(*) FROM graft.demo.tt__v1")
      .head().getLong(0) == 2)
    assert(extSession.sql("SELECT COUNT(*) FROM graft.demo.tt__v2")
      .head().getLong(0) == 3)
    assert(t.readColdAsOf(1L).count() == 2)
    intercept[Exception](t.readColdAsOf(99L))
  }

  test("PK tables resolve with merge-on-read semantics") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cat2").toString
    val t = TieredTable(spark, s"$dir/cust", pk = Seq("k"))
    t.commitUpsert(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    t.commitUpsert(Seq((2, "b2")).toDF("k", "v"))
    TieredCatalog.register("demo", "cust", s"$dir/cust", pk = Seq("k"))
    val got = extSession.sql("SELECT k, v FROM graft.demo.cust ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq(1 -> "a", 2 -> "b2"))
  }

  test("unknown tables under graft still error cleanly") {
    val e = intercept[Exception] {
      extSession.sql("SELECT * FROM graft.demo.nope").collect()
    }
    assert(e.getMessage.toLowerCase.contains("nope"))
  }
}
