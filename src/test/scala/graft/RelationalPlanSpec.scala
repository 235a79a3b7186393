package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** Plan-shape assertions for the relational query set — the properties
  * that matter at 100 TB, pinned so a refactor cannot silently lose
  * them.
  */
class RelationalPlanSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    val saved = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    try {
      spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
      df.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", saved)
  }

  test("p6: all three predicate families reach the parquet reader") {
    val plan = planOf(Relational.p6ForecastRevenue(spark, dir))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan.take(2000))
    assert(plan.contains("LessThan(l_quantity,24.0)"))
    // the exact DECIMAL band sits behind a cast that pushdown cannot
    // unwrap — the strictly-wider raw-double band is what reaches the
    // scan; losing it would silently decompress every row group
    assert(plan.contains("GreaterThan(l_discount,0.0449)"))
    assert(plan.contains("LessThan(l_discount,0.0751)"))
  }

  test("g8/g9: correlated subqueries fully decorrelate into joins") {
    val g8 = planOf(Relational.g8ExistsSubquery(spark, dir))
    assert(g8.contains("LeftSemi"), "EXISTS must lower to a semi join")
    assert(g8.contains("LeftAnti"), "NOT EXISTS must lower to an anti join")
    val g9 = planOf(Relational.g9AboveAvg(spark, dir))
    assert(!g9.linesIterator.exists(_.contains("Subquery")),
      "no per-row subquery execution may survive decorrelation")
    assert(g9.linesIterator.exists(_.contains("Join")),
      "the scalar aggregates must join back on the key")
  }
}
