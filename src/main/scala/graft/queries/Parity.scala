package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables
import graft.operators.{Enrich, SinkPolicy, Upsert}

/** The reference-parity query set (SURVEY.md §2.J, Q1–Q8), rebased onto
  * the driver fixtures per FIXTURES.md §C. Each query has a DuckDB oracle
  * in [[graft.SparkEntry.oracleSql]].
  *
  * Money aggregates go through DECIMAL(15,2) internally — decimal
  * addition is exact and associative, so Spark and DuckDB agree
  * bit-for-bit regardless of partitioning/summation order (SURVEY.md §7
  * hard-part 4). Declared OUTPUT columns, however, are fixed-point BIGINT
  * cents (`x * 100` of the exact decimal): the driver's hash gate
  * preserves value *representation*, and DECIMAL columns hash-diverge
  * across engines even when bit-identical in value (VERDICT r1 "What's
  * wrong" #1). Only hash-proven output types leave these queries:
  * BIGINT, STRING, DATE, epoch-us longs.
  */
object Parity {
  private val M = DecimalType(15, 2)

  /** Exact decimal money → BIGINT cents (the fraction is .00 by
    * construction, so the narrowing cast is exact on both engines).
    */
  private[queries] def cents(c: org.apache.spark.sql.Column) =
    (c * 100).cast("long")

  /** Q1 — PK last-write-wins dedup (upsert-table read semantics,
    * reference README.md:153-161). One row per o_custkey: the customer's
    * latest order (order_date desc, orderkey desc as total tiebreak).
    */
  def q1PkDedup(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    Upsert.latestByKey(orders, Seq("o_custkey"),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
      .select(col("o_custkey").as("cust_key"),
              col("o_orderkey").as("last_order_key"),
              cents(col("o_totalprice").cast(M)).as("last_total_price_cents"),
              col("o_orderdate").as("last_order_date"))
  }

  /** Q2 — two-hop LEFT lookup-join enrichment with projection+aliasing
    * (reference README.md:222-239): orders ⟕ customer ⟕ nation.
    */
  def q2Enrich(spark: SparkSession, dir: String): DataFrame = {
    val orders      = Tables.load(spark, dir, "orders")
    val customerRaw = Tables.load(spark, dir, "customer")
    // LWW dedup with a total version order: every non-key column desc —
    // rows that tie on all of them are identical, so the winner is
    // deterministic (the fixture's keys are unique; this guards re-use
    // on genuinely duplicated upsert streams).
    val customer = Upsert.latestByKey(customerRaw, Seq("c_custkey"),
      customerRaw.columns.filterNot(_ == "c_custkey").toSeq.map(col(_).desc))
    val nation   = Tables.load(spark, dir, "nation")
    Enrich.lookupJoin2(
        orders.withColumn("c_custkey", col("o_custkey")),
        customer, "c_custkey",
        nation.withColumnRenamed("n_nationkey", "c_nationkey"), "c_nationkey")
      .select(
        col("o_orderkey").as("order_key"),
        col("o_custkey").as("cust_key"),
        cents(col("o_totalprice").cast(M)).as("total_price_cents"),
        col("o_orderdate").as("order_date"),
        col("o_orderpriority").as("order_priority"),
        col("c_name").as("cust_name"),
        cents(col("c_acctbal").cast(M)).as("cust_acctbal_cents"),
        col("c_mktsegment").as("cust_mktsegment"),
        col("n_name").as("nation_name"))
  }

  /** Q3 — keyed revenue aggregation (reference README.md:247-250):
    * GROUP BY nation name, SUM(total_price) as DECIMAL(15,2).
    */
  def q3Revenue(spark: SparkSession, dir: String): DataFrame =
    q2Enrich(spark, dir)
      .groupBy(col("nation_name"))
      .agg(sum(col("total_price_cents")).as("revenue_cents"))

  /** Q4 — top-5 nations by revenue (reference README.md:280-283).
    * nation_name added to the sort as a deterministic tiebreak.
    */
  def q4TopK(spark: SparkSession, dir: String): DataFrame =
    q3Revenue(spark, dir)
      .orderBy(col("revenue_cents").desc, col("nation_name"))
      .limit(5)

  /** Q5 — global COUNT(1) (reference README.md:287,307). */
  def q5Count(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  /** Q6 — global MAX(timestamp) (reference README.md:292,313). */
  def q6MaxTs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").agg(max(col("l_shipdate")).as("max_shipdate"))

  /** Q8 — NOT NULL sink policy = DROP (reference flink/sql/
    * sql-client.sql:50): rows with null key columns silently excluded.
    */
  def q8NotNullDrop(spark: SparkSession, dir: String): DataFrame =
    SinkPolicy.enforceNotNull(
        Tables.load(spark, dir, "customer"), Seq("c_custkey", "c_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
}
