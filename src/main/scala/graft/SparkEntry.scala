package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Lakehouse, Parity}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a named query here;
  * each SQL-expressible one has a DuckDB oracle in [[oracleSql]] that the
  * driver hash-compares at sf0.01. Column names/aliases are identical on
  * both sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference pipeline shape in batch: enrichment join → keyed
    * revenue → top-k.
    */
  def entry(spark: SparkSession): DataFrame =
    Parity.q4TopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pk_dedup"    -> (Parity.q1PkDedup _),
    "q2_enrich"      -> (Parity.q2Enrich _),
    "q3_revenue"     -> (Parity.q3Revenue _),
    "q4_topk"        -> (Parity.q4TopK _),
    "q5_count"       -> (Parity.q5Count _),
    "q6_max_ts"      -> (Parity.q6MaxTs _),
    "q7_union_read"  -> (Lakehouse.q7UnionRead _),
    "q7b_cold_only"  -> (Lakehouse.q7ColdOnly _),
    "q8_notnull_drop"-> (Parity.q8NotNullDrop _),
    "q9_snapshots"   -> (Lakehouse.q9Snapshots _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pk_dedup" ->
      """SELECT o_custkey AS cust_key, o_orderkey AS last_order_key,
        |       CAST(o_totalprice AS DECIMAL(15,2)) AS last_total_price,
        |       o_orderdate AS last_order_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1""".stripMargin,
    "q2_enrich" ->
      """SELECT o_orderkey AS order_key, o_custkey AS cust_key,
        |       CAST(o_totalprice AS DECIMAL(15,2)) AS total_price,
        |       o_orderdate AS order_date, o_orderpriority AS order_priority,
        |       c_name AS cust_name,
        |       CAST(c_acctbal AS DECIMAL(15,2)) AS cust_acctbal,
        |       c_mktsegment AS cust_mktsegment, n_name AS nation_name
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q3_revenue" ->
      """SELECT n_name AS nation_name,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DECIMAL(15,2)) AS revenue
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q4_topk" ->
      """SELECT n_name AS nation_name,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DECIMAL(15,2)) AS revenue
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY revenue DESC, nation_name LIMIT 5""".stripMargin,
    "q5_count" -> "SELECT COUNT(*) AS cnt FROM lineitem",
    "q6_max_ts" -> "SELECT MAX(l_shipdate) AS max_shipdate FROM lineitem",
    "q7_union_read" ->
      """SELECT COUNT(*) AS cnt, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders""".stripMargin,
    "q7b_cold_only" ->
      """SELECT COUNT(*) AS cnt, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders WHERE o_orderkey % 3 IN (0, 1)""".stripMargin,
    "q8_notnull_drop" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL""".stripMargin,
    "q9_snapshots" ->
      """SELECT CAST(snapshot_id AS BIGINT) AS snapshot_id, operation,
        |       CAST(rows_added AS BIGINT) AS rows_added,
        |       CAST(tiered_seg AS BIGINT) AS tiered_seg
        |FROM (
        |  SELECT 1 AS snapshot_id, 'tier' AS operation,
        |         (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 0) AS rows_added,
        |         0 AS tiered_seg
        |  UNION ALL
        |  SELECT 2, 'tier',
        |         (SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 1), 1
        |) ORDER BY snapshot_id""".stripMargin,
  )
}
