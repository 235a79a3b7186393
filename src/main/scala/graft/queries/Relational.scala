package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Bucketing, Joins, Skew, Upsert}
import graft.tables.Tables

/** Relational coverage beyond the reference's own workload: the join
  * kinds and aggregation shapes SURVEY.md §2.C/§2.D lists as "free from
  * Spark" (declared here so the oracle exercises them), plus the as-of
  * and range joins from the custom-operator ladder.
  *
  * Money/quantity aggregates go per-row through DECIMAL(15,2) so sums
  * are exact and engine-order-independent; averages are a single double
  * division of exact operands.
  *
  * Declared OUTPUT columns are fixed-point BIGINTs (cents / e4 / e6
  * units of the exact decimal sums) — DECIMAL columns hash-diverge in
  * the driver's representation-sensitive gate even when values are
  * bit-identical (VERDICT r1), so only BIGINT/STRING/DATE/exact-DOUBLE
  * leave these queries.
  */
object Relational {
  private val M = DecimalType(15, 2)

  /** Exact decimal at scale s → BIGINT in 10^s units (fraction is zero
    * by construction; the narrowing cast is exact on both engines).
    */
  private def fixedPoint(c: org.apache.spark.sql.Column, s: Int) =
    (c * math.pow(10, s).toLong).cast("long")

  /** A1 — as-of join: each click event matched to the user's latest
    * error event at or before it (null if none yet).
    */
  def a1Asof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    // dedup right side per (user, ts) so the at-equal-ts winner is
    // deterministic on both engines
    val errors = Upsert.latestByKey(
      ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts")),
      Seq("user_id", "ts"), Seq(col("event_id").desc))
    Joins.asofJoin(clicks, errors, "user_id", col("ts"), col("ts"),
        Seq("event_id"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("asof_event_id").as("last_error_id"))
  }

  /** R1 — range self-join: same-type event pairs whose values differ by
    * ≤ 1/64 (a power of two, so the ε-bucketing divisions are exact).
    */
  def r1Range(spark: SparkSession, dir: String): DataFrame =
    Joins.rangeSelfJoin(
      Tables.load(spark, dir, "events"), "event_id", "value",
      eps = 0.015625, partCols = Seq("event_type"))

  /** R2 — event-time interval join (batch analog of the stream-stream
    * operator, [[graft.streaming.StreamJoins.intervalJoin]]): per click,
    * how many errors the same user hit in the preceding 24 hours (the
    * band that is nontrivial at the fixture's ~7 h median per-user event
    * gap). The IDENTICAL helper call runs streaming (watermarked state
    * join, StreamJoinsSpec) — here the analyzer elides the watermark and
    * plans a banded equi-join: one shuffle per side on the user key,
    * then a grouped count at click cardinality. LEFT join so zero-error
    * clicks keep their row (count of a null column skips nulls on both
    * engines).
    */
  def r2Interval(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_uid"),
        col("ts").as("c_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_uid"), col("ts").as("e_ts"))
    graft.streaming.StreamJoins.intervalJoin(
        clicks, errors, "c_uid", "e_uid", "c_ts", "e_ts",
        lookback = "24 HOUR", lookahead = "0 SECOND",
        watermark = "1 hour", joinType = "left_outer")
      .groupBy(col("click_id"))
      .agg(count(col("e_uid")).as("n_recent_errors"))
  }

  /** G1 — ROLLUP aggregation over lineitem (grand total + per-flag +
    * per-flag-and-status), exact decimal sums.
    */
  def g1Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(fixedPoint(sum(col("l_quantity").cast(M)).cast(M), 2)
             .as("sum_qty_cents"),
        count(lit(1)).as("cnt"))

  /** G4 — CUBE over (returnflag, linestatus): all four grouping
    * combinations in one pass — like ROLLUP (g1) the expansion is
    * map-side (each row feeds every grouping set's partial aggregate
    * before the single exchange).
    */
  def g4Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(fixedPoint(sum(col("l_quantity").cast(M)).cast(M), 2)
             .as("sum_qty_cents"),
        count(lit(1)).as("cnt"))

  /** G5 — analytic-window tour over per-customer order history: lag
    * (previous order key), ntile quartile, and percent_rank position,
    * all over one (customer, order-date, order-key) window — one
    * hash-shuffle on the customer key and one in-partition sort serve
    * all three functions (Catalyst collapses same-spec windows into a
    * single WindowExec). Ordering is made total by the unique order key
    * so every function is engine-deterministic; percent_rank's double is
    * the same (rank−1)/(n−1) division on both engines.
    */
  def g5WindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"))
  }

  /** G6 — FULL OUTER join with both null sides exercised: per-nation
    * supplier counts (nations < 10) against per-nation customer counts
    * (nations ≥ 5) — low keys are supplier-only, high keys customer-
    * only, the overlap joins. Both inputs are pre-aggregated to
    * nation cardinality before the join, so the outer join itself is
    * dimension-sized at any corpus scale (and broadcastable — though
    * Spark plans full-outer as sort-merge, the exchange carries ≤
    * |nations| rows per side).
    */
  def g6FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.load(spark, dir, "supplier")
      .filter(col("s_nationkey") < 10)
      .groupBy(col("s_nationkey").as("s_nk"))
      .agg(count(lit(1)).as("n_supp"))
    val c = Tables.load(spark, dir, "customer")
      .filter(col("c_nationkey") >= 5)
      .groupBy(col("c_nationkey").as("c_nk"))
      .agg(count(lit(1)).as("n_cust"))
    s.join(c, col("s_nk") === col("c_nk"), "full_outer")
      .select(coalesce(col("s_nk"), col("c_nk")).as("nation_key"),
        col("n_supp"), col("n_cust"))
  }

  /** G2 — semi/anti join cardinalities: customers with ≥1 order vs
    * customers with none, one output row.
    */
  def g2SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val semi = customer.join(orders,
        customer("c_custkey") === orders("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("with_orders"))
    val anti = customer.join(orders,
        customer("c_custkey") === orders("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("without_orders"))
    semi.crossJoin(anti)
  }

  /** G3 — per-customer running order total (the classic cumulative
    * window): one hash-shuffle on the customer key, in-partition sort
    * by the order key — UNIQUE, so the sort is a total order and the
    * running sum is engine-deterministic (an order-date sort would tie)
    * — running sum in exact cents. Scale shape: the shuffle is the
    * minimum any per-key ordering needs; state per key is one
    * accumulator.
    */
  def g3RunningTotal(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("cust_key"),
        col("o_orderkey").as("order_key"),
        fixedPoint(col("o_totalprice").cast(M), 2).as("cents"))
      .withColumn("running_cents",
        sum(col("cents")).over(Window.partitionBy(col("cust_key"))
          .orderBy(col("order_key"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("cust_key"), col("order_key"), col("running_cents"))
  }

  /** P1 — TPC-H Q1-shaped pricing summary: grouped exact-decimal sums,
    * distinct counts, and single-division averages.
    *
    * The stored doubles are 2-dp values, so each FACTOR casts to
    * DECIMAL(15,2) exactly (no .5 ties can arise from 2-dp data); the
    * products then stay in exact decimal arithmetic and the sums are
    * never rounded (widening casts only) — double→decimal rounding of
    * per-row products is the one place Spark and DuckDB disagree.
    */
  def p1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val ep = col("l_extendedprice").cast(M)
    val disc = lit(1) - col("l_discount").cast(M)
    val tax = lit(1) + col("l_tax").cast(M)
    val grouped = l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        fixedPoint(sum(col("l_quantity").cast(M)).cast(M), 2)
          .as("sum_qty_cents"),
        fixedPoint(sum(ep).cast(M), 2).as("sum_base_price_cents"),
        fixedPoint(sum(ep * disc).cast(DecimalType(25, 4)), 4)
          .as("sum_disc_price_e4"),
        fixedPoint(sum(ep * disc * tax).cast(DecimalType(25, 6)), 6)
          .as("sum_charge_e6"),
        count(lit(1)).as("cnt"),
        count_distinct(col("l_partkey")).as("n_parts"))
    // avg from the exact long cents: long→double is exact (< 2^53), and
    // both divisions round identically on both engines — never
    // data-dependent, unlike decimal→double conversions.
    grouped.withColumn("avg_qty",
      col("sum_qty_cents").cast("double") / 100.0 / col("cnt"))
  }

  /** P3 — TPC-H Q5-shaped local-supplier volume: six-table star join
    * (region → nation → customer → orders → lineitem → supplier) with
    * the Q5 twist that the supplier must sit in the customer's nation;
    * revenue per nation in exact e4 fixed-point.
    *
    * Scale shape: region/nation are bounded dims (25/5 rows at ANY
    * scale factor — broadcast unconditionally); customer and supplier
    * GROW with SF (sf100 customer ≈ 15 M rows), so they carry NO
    * broadcast hint — AQE broadcasts them when the runtime size
    * qualifies and falls back to shuffled hash join when it doesn't,
    * instead of OOMing the executors at 100×. lineitem (the 100 TB
    * fact) joins orders on its own key and never shuffles twice.
    */
  def p3LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region")
      .filter(col("r_name") === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val customer = Tables.load(spark, dir, "customer")
    val supplier = Tables.load(spark, dir, "supplier")
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name").as("nation_name"))
      .agg(fixedPoint(sum(col("l_extendedprice").cast(M) *
          (lit(1) - col("l_discount").cast(M)))
        .cast(DecimalType(25, 4)), 4).as("revenue_e4"))
  }

  /** P4 — TPC-H Q10-shaped returned-item report: top-20 customers by
    * revenue lost to returns in a two-year window; exact e4 revenue,
    * `TakeOrderedAndProject` top-k (never a global sort). customer
    * scales with SF, so no forced broadcast — AQE decides at runtime;
    * nation (25 rows forever) keeps its hint.
    */
  def p4ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1998-01-01")
    val lineitem = Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(fixedPoint(sum(col("l_extendedprice").cast(M) *
          (lit(1) - col("l_discount").cast(M)))
        .cast(DecimalType(25, 4)), 4).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("c_custkey"))
      .limit(20)
  }

  /** P5 — TPC-H Q8-shaped national market share: per order year, one
    * supplier nation's sales volume inside one region's ECONOMY-part
    * market, next to the market total. The share stays as TWO exact e4
    * fixed-point columns — emitting the ratio would put an
    * order-sensitive double division in the hashed output; the reader
    * (or a final projection) divides.
    *
    * Plan shape: truly bounded dims (nation ×2 roles, region — fixed
    * 25/5 rows at any SF) broadcast by hint; part, customer and
    * supplier scale with SF so they get NO hint — a one-type filter on
    * part keeps a constant FRACTION, not a constant size, so a forced
    * broadcast would OOM at 100×. AQE broadcasts when the runtime size
    * qualifies, else a shuffled hash join (the correct 100× behavior). The l⋈o orderkey
    * join shuffles once, and the two conditional sums ride one
    * aggregation. At 100 TB: same plan, with o co-partitioned or
    * bucketed on orderkey.
    */
  def p5MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .filter(col("p_type") === "ECONOMY")
    val region = Tables.load(spark, dir, "region")
      .filter(col("r_name") === "ASIA")
    val nationC = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val nationS = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))
    val customer = Tables.load(spark, dir, "customer")
    val supplier = Tables.load(spark, dir, "supplier")
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    val vol = col("l_extendedprice").cast(M) *
      (lit(1) - col("l_discount").cast(M))
    lineitem
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nationC), col("c_nationkey") === col("cn_key"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nationS), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        fixedPoint(sum(when(col("sn_name") === "NATION_7", vol)
            .otherwise(lit(0)))
          .cast(DecimalType(25, 4)), 4).as("nation_volume_e4"),
        fixedPoint(sum(vol).cast(DecimalType(25, 4)), 4)
          .as("total_volume_e4"))
      .orderBy(col("o_year"))
  }

  /** P6 — TPC-H Q6-shaped forecast-revenue change: a pure
    * filter-and-aggregate over the fact table — no join, and the only
    * exchange is the final single-row reduce. At 100 TB this query IS
    * the scan: all three predicates (ship-date range, discount band,
    * quantity cap) reach the parquet reader as `PushedFilters`
    * (plan-verified), so row groups outside the bands never
    * decompress, and with date-banded files (partitioning or z-order)
    * the sidecar skipping stack (q13) prunes whole files at planning
    * time. The discount band compares in exact DECIMAL(15,2) — stored
    * doubles are 2-dp values, so the cast is exact on both engines and
    * no row can sit on a float boundary; because pushdown cannot
    * unwrap that cast, a redundant strictly-wider raw-double band
    * rides along purely for the scan.
    */
  def p6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val disc = col("l_discount").cast(M)
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= "1997-01-01" &&
        col("l_shipdate") < "1998-01-01" &&
        disc >= lit("0.05").cast(M) && disc <= lit("0.07").cast(M) &&
        // redundant STRICTLY-WIDER raw-double band: the exact decimal
        // band above sits behind a cast, which parquet pushdown cannot
        // unwrap — this plain-attribute version reaches the reader
        // (row-group stats + dictionary filtering) while the decimal
        // comparison stays the authoritative predicate. (0.0449,
        // 0.0751) ⊇ every double whose 2-dp rounding lands in
        // [0.05, 0.07], so it can never exclude a qualifying row.
        col("l_discount") > 0.0449 && col("l_discount") < 0.0751 &&
        col("l_quantity") < 24)
      .agg(
        fixedPoint(sum(col("l_extendedprice").cast(M) * disc)
          .cast(DecimalType(25, 4)), 4).as("revenue_e4"),
        count(lit(1)).as("n_items"))
  }

  /** P7 — TPC-H Q7-shaped cross-nation trade volume: yearly shipping
    * flows between one nation pair, in both directions. The nation dim
    * enters TWICE (supplier role + customer role), filtered to the
    * pair BEFORE the join, so the broadcast carries two rows per role
    * and the inner joins prune the fact early; the pair-direction
    * disjunction then runs on broadcast-joined columns. customer and
    * supplier scale with SF → no hint, AQE decides (same stance as
    * p3/p4/p5); lineitem⋈orders is the one big shuffle.
    */
  def p7NationTrade(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_8")
    val nS = Tables.load(spark, dir, "nation")
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))
    val nC = Tables.load(spark, dir, "nation")
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation"))
    val supplier = Tables.load(spark, dir, "supplier")
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nS), col("s_nationkey") === col("sn_key"))
      .join(broadcast(nC), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(fixedPoint(sum(col("l_extendedprice").cast(M) *
          (lit(1) - col("l_discount").cast(M)))
        .cast(DecimalType(25, 4)), 4).as("volume_e4"))
  }

  /** P8 — TPC-H Q14-shaped promo revenue split: lineitem⋈part over one
    * ship-month, conditional aggregation separating promo-part revenue
    * from total revenue. The month filter reaches the lineitem scan as
    * pushed predicates, so at 100 TB the query reads one month of the
    * fact, not the table; part scales with SF (sf100 ≈ 20 M rows) so it
    * gets NO broadcast hint — AQE decides (the p3/p4/p5 stance). Both
    * sums come out of ONE partial aggregate (the CASE WHEN split is a
    * map-side expression), so the promo/total ratio costs no second
    * pass; the output is the two exact fixed-point operands rather than
    * the double ratio — division is the caller's one inexact step.
    */
  def p8PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice").cast(M) *
      (lit(1) - col("l_discount").cast(M))
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= "1998-03-01" &&
        col("l_shipdate") < "1998-04-01")
      .join(Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        fixedPoint(sum(when(col("p_type").startsWith("PROMO"), rev)
            .otherwise(lit(0).cast(M))).cast(DecimalType(25, 4)), 4)
          .as("promo_e4"),
        fixedPoint(sum(rev).cast(DecimalType(25, 4)), 4).as("total_e4"))
  }

  /** P9 — TPC-H Q19-shaped disjunctive bands: revenue from three
    * brand/size/quantity bands OR-ed together across lineitem⋈part.
    * The shape exists to keep the OR-of-ANDs on the RIGHT side of the
    * plan: Catalyst splits the disjunction into per-side conjunctions
    * of the common columns (`l_quantity` bounds push to the lineitem
    * scan, `p_brand`/`p_size` bounds to the part scan) before the join,
    * so each side scans only rows that can satisfy SOME band — the
    * classic Q19 trap is evaluating the whole disjunction post-join.
    * Join stance as p8: no hint on part, AQE decides.
    */
  def p9BandedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val p = Tables.load(spark, dir, "part")
    val band1 = col("p_brand") === "Brand#1" &&
      col("p_size").between(1, 10) && col("l_quantity").between(1, 11)
    val band2 = col("p_brand") === "Brand#2" &&
      col("p_size").between(1, 20) && col("l_quantity").between(10, 20)
    val band3 = col("p_brand") === "Brand#3" &&
      col("p_size").between(1, 30) && col("l_quantity").between(20, 30)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(band1 || band2 || band3)
      .agg(fixedPoint(sum(col("l_extendedprice").cast(M) *
          (lit(1) - col("l_discount").cast(M))).cast(DecimalType(25, 4)), 4)
          .as("revenue_e4"),
        count(lit(1)).as("n_items"))
  }

  /** P10 — TPC-H Q18-shaped large-volume orders: the grouped-HAVING
    * derived table (per-order quantity > 250) drives the join back into
    * orders⋈customer. Scale shape: the fact aggregates FIRST —
    * lineitem's one hash-shuffle on `l_orderkey` reduces it to order
    * cardinality before anything joins, and the HAVING filter then cuts
    * that to the handful of jumbo orders, so the orders/customer joins
    * see a tiny build side (AQE broadcasts it at runtime — exactly the
    * dynamic-broadcast case the forced-hint removal in p3/p4/p5 was
    * about). Top-100 bounds the output; the sort is on the aggregate,
    * tie-broken by the unique order key for engine determinism.
    */
  def p10BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(fixedPoint(sum(col("l_quantity").cast(M)).cast(M), 2)
        .as("qty_cents"))
      .filter(col("qty_cents") > 25000L)
    Tables.load(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").as("order_date"), col("qty_cents"))
      .orderBy(col("qty_cents").desc, col("o_orderkey"))
      .limit(100)
  }

  /** P11 — TPC-H Q15-shaped top supplier: per-supplier quarterly
    * revenue, keep the max-revenue supplier(s) — aggregate-of-aggregate
    * with the scalar max joined back. The revenue aggregate is computed
    * ONCE and feeds both the max reduction and the equality probe (the
    * self-referential view Q15 defines); the single-row max is an
    * explicit broadcast — genuinely bounded, unlike the SF-scaled
    * tables the p3/p4/p5 fix de-hinted. Equality compares exact
    * fixed-point BIGINTs, so the "which supplier ties the max" boundary
    * is engine-deterministic where a double revenue would not be.
    */
  def p11TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= "1998-01-01" &&
        col("l_shipdate") < "1998-04-01")
      .groupBy(col("l_suppkey"))
      .agg(fixedPoint(sum(col("l_extendedprice").cast(M) *
          (lit(1) - col("l_discount").cast(M))).cast(DecimalType(25, 4)), 4)
        .as("total_rev_e4"))
    val maxRev = revenue.agg(max(col("total_rev_e4")).as("mx"))
    Tables.load(spark, dir, "supplier")
      .join(revenue, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(maxRev), col("total_rev_e4") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_e4"))
  }

  /** P12 — TPC-H Q4-shaped priority check: orders per priority that had
    * at least one LATE line (shipped > 60 days after the order date —
    * the fixture's stand-in for Q4's commit<receipt test). The
    * correlated EXISTS carries a cross-table predicate, so Catalyst
    * decorrelates into a semi join on the order key whose extra
    * condition evaluates inside the join — one fact shuffle, then a
    * priority-cardinality aggregate. The semi join keeps the fact scan
    * single-pass: no order is counted twice however many late lines it
    * has.
    */
  def p12PriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("p12_orders")
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("p12_lineitem")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM p12_orders o
        |WHERE EXISTS (SELECT 1 FROM p12_lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** P13 — TPC-H Q13-shaped customer order-count distribution: LEFT
    * join customer→orders with a non-key predicate IN the join
    * condition (priority ≠ urgent — rows failing it null out instead
    * of dropping the customer, the semantic that makes Q13 a left-join
    * benchmark rather than a WHERE), count orders per customer
    * (count(col) skips the null side, so order-less customers land in
    * bucket 0), then the distribution of those counts. Scale shape:
    * one customer-key shuffle for the join+first aggregate; the second
    * aggregate's domain is order-count values — tiny, whatever the SF.
    */
  def p13OrderDist(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("custdist"))

  /** P14 — TPC-H Q16-shaped supplier-relationship count: DISTINCT
    * suppliers able to supply each (brand, type, size) bucket, with a
    * NOT IN exclusion list (negative-balance suppliers — the fixture's
    * stand-in for Q16's complaint filter; lineitem plays partsupp).
    * This is the suite's only count(DISTINCT) over a join — the
    * distinct dedups (group, suppkey) BEFORE the final count, so the
    * shuffle carries the deduped relationship set, not line items. The
    * exclusion subquery is supplier-bounded; Spark plans the null-aware
    * anti join against a broadcast — fine here and exactly the NAAJ
    * size caveat g11 documents.
    */
  def p14SupplierParts(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "part").createOrReplaceTempView("p14_part")
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("p14_lineitem")
    Tables.load(spark, dir, "supplier").createOrReplaceTempView("p14_supplier")
    spark.sql(
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM p14_part JOIN p14_lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM p14_supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin)
  }

  /** P15 — TPC-H Q17-shaped small-quantity revenue: lines of one brand
    * whose quantity sits under 20% of that part's average quantity.
    * The correlated per-part average decorrelates into ONE grouped
    * aggregate of the fact joined back on the part key — the fact is
    * scanned twice (once to build per-part sums, once to probe) but
    * shuffled on `l_partkey` both times, so AQE can co-locate; no
    * per-row subquery survives. The 0.2·avg comparison is the integer
    * cross-multiply `qty_cents·5·cnt < sum_qty_cents` — exact where
    * `qty < 0.2*avg(qty)` on doubles is an engine-rounding coin flip.
    */
  def p15SmallQty(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("p15_lineitem")
    Tables.load(spark, dir, "part").createOrReplaceTempView("p15_part")
    spark.sql(
      """WITH pq AS (
        |  SELECT l_partkey AS pk,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(15,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_qc,
        |    count(*) AS cnt
        |  FROM p15_lineitem GROUP BY 1)
        |SELECT count(*) AS n_small,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM p15_lineitem JOIN p15_part ON l_partkey = p_partkey
        |JOIN pq ON pk = l_partkey
        |WHERE p_brand = 'Brand#2'
        |  AND CAST(CAST(l_quantity AS DECIMAL(15,2)) * 100 AS BIGINT) * 5 * cnt < sum_qc""".stripMargin)
  }

  /** P16 — TPC-H Q22-shaped sales opportunity: per country, the
    * well-funded customers (balance above the positive-balance average
    * of the candidate countries) with no recent urgent order. Q22's
    * three surfaces in one query: the IN country-code gate
    * (`c_nationkey` stands in for the fixture-less phone prefix), an
    * ungrouped scalar-aggregate subquery consumed as a CROSS JOIN of
    * one row (broadcast — never a shuffle), and a correlated NOT
    * EXISTS that lowers to an anti hash join on the customer key. The
    * above-average gate is the exact cross-multiply
    * `cents·cnt > sum_cents`, g9's convention.
    */
  def p16SalesOpp(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("p16_customer")
    Tables.load(spark, dir, "orders").createOrReplaceTempView("p16_orders")
    spark.sql(
      """WITH pos AS (
        |  SELECT CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(15,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
        |         count(*) AS cnt
        |  FROM p16_customer
        |  WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11))
        |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
        |       CAST(sum(acctbal_cents) AS BIGINT) AS totacctbal_cents
        |FROM (SELECT c_custkey, c_nationkey,
        |             CAST(CAST(c_acctbal AS DECIMAL(15,2)) * 100 AS BIGINT) AS acctbal_cents
        |      FROM p16_customer
        |      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11)) c
        |CROSS JOIN pos
        |WHERE acctbal_cents * cnt > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM p16_orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT'
        |                    AND o.o_orderdate >= '1998-06-01')
        |GROUP BY c_nationkey""".stripMargin)
  }

  /** P17 — TPC-H Q2-shaped minimum-cost supplier: for every part in a
    * size/type bucket, the supplier(s) offering it at the MINIMUM
    * account balance (the fixture's supply-cost stand-in; distinct
    * lineitem (partkey, suppkey) pairs play partsupp). Q2's signature
    * correlated scalar-MIN is expressed as `MIN() OVER (PARTITION BY
    * p_partkey)` + filter rather than a correlated subquery: Catalyst
    * decorrelates the subquery form into a join against a SECOND
    * evaluation of the inlined `offer` CTE — the 3-way
    * lineitem⋈part⋈supplier join would execute twice (the classic
    * TPC-H Q2 double-scan, r8 verdict #2). The window form computes
    * the per-part minimum in the SAME shuffle pass that already
    * partitions offers by `p_partkey` — ONE scan of the fact join,
    * one exchange, at any scale. Ties on the minimum keep every tied
    * supplier, deterministic as a set. Balance compares in exact
    * cents (g9's convention).
    */
  def p17MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("p17_lineitem")
    Tables.load(spark, dir, "part").createOrReplaceTempView("p17_part")
    Tables.load(spark, dir, "supplier").createOrReplaceTempView("p17_supplier")
    Tables.load(spark, dir, "nation").createOrReplaceTempView("p17_nation")
    spark.sql(
      """WITH bridge AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM p17_lineitem),
        |offer AS (
        |  SELECT p_partkey, s_name, s_nationkey,
        |         CAST(CAST(s_acctbal AS DECIMAL(15,2)) * 100 AS BIGINT) AS acctbal_cents
        |  FROM p17_part
        |  JOIN bridge ON p_partkey = l_partkey
        |  JOIN p17_supplier ON s_suppkey = l_suppkey
        |  WHERE p_size <= 5 AND p_type = 'ECONOMY')
        |SELECT p_partkey, s_name, n_name, acctbal_cents
        |FROM (
        |  SELECT o.p_partkey, o.s_name, n_name, o.acctbal_cents,
        |         min(o.acctbal_cents)
        |           OVER (PARTITION BY o.p_partkey) AS min_cents
        |  FROM offer o JOIN p17_nation ON o.s_nationkey = n_nationkey)
        |WHERE acctbal_cents = min_cents""".stripMargin)
  }

  /** P18 — TPC-H Q9-shaped product profit by nation and year: filtered
    * parts' lines, profit = revenue − cost (p_retailprice·quantity is
    * the fixture's supply-cost stand-in), grouped by the SUPPLIER's
    * nation and the order year. Five-table star: the fact shuffles
    * once per join key, part is filter-reduced before its join but
    * stays UN-hinted (SF-scaled — AQE decides, p8/p9's stance), nation
    * broadcast (bounded at 25 rows forever). Money in exact DECIMAL
    * with the e4 fixed-point output convention.
    */
  def p18ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Tables.load(spark, dir, "lineitem")
    val part = Tables.load(spark, dir, "part")
      .filter(col("p_name").like("%red%"))
    val supplier = Tables.load(spark, dir, "supplier")
    val orders = Tables.load(spark, dir, "orders")
    val nation = Tables.load(spark, dir, "nation")
    val revenue = (col("l_extendedprice").cast(M) *
      (lit(1) - col("l_discount").cast(M))).cast(DecimalType(25, 4))
    val cost = (col("p_retailprice").cast(M) *
      col("l_quantity").cast(M)).cast(DecimalType(25, 4))
    lineitem
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(fixedPoint(sum(revenue - cost).cast(DecimalType(25, 4)), 4)
        .as("profit_e4"))
  }

  /** P19 — TPC-H Q11-shaped important stock: parts whose revenue
    * through suppliers of a nation group exceeds 0.1% of that group's
    * TOTAL revenue. Q11's signature is the ungrouped global-total
    * scalar subquery consumed by HAVING — planned as a one-row
    * broadcast CROSS JOIN against the per-part aggregate, so the
    * per-part set is scanned once and the threshold costs nothing at
    * scale. The share gate is the exact integer cross-multiply
    * `value·1000 > total` — never a double division.
    */
  def p19ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("p19_lineitem")
    Tables.load(spark, dir, "supplier").createOrReplaceTempView("p19_supplier")
    spark.sql(
      """WITH v AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) *
        |             (1 - CAST(l_discount AS DECIMAL(15,2))) AS DECIMAL(25,4)) * 10000) AS BIGINT) AS value_e4
        |  FROM p19_lineitem JOIN p19_supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey IN (1, 2, 3, 4, 5)
        |  GROUP BY l_partkey),
        |tot AS (SELECT CAST(SUM(value_e4) AS BIGINT) AS total_e4 FROM v)
        |SELECT l_partkey, value_e4
        |FROM v CROSS JOIN tot
        |WHERE value_e4 * 1000 > total_e4""".stripMargin)
  }

  /** G11 — `NOT IN` subquery under the oracle: customers with no
    * urgent order, phrased the null-aware way. SQL's NOT IN is
    * three-valued (one NULL in the subquery empties the result), so
    * Catalyst lowers it to a null-aware anti join — a DIFFERENT
    * operator from g8's NOT EXISTS anti join, which is why both
    * phrasings are pinned. Scale note, stated because it is the trap:
    * NAAJ broadcasts the subquery side or degenerates to a nested-loop
    * join — on an SF-scaled subquery prefer NOT EXISTS (plain anti
    * hash join); here the subquery is the filtered urgent-order key
    * set, and the oracle proves the two phrasings agree on null-free
    * keys.
    */
  def g11NotIn(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("g11_customer")
    Tables.load(spark, dir, "orders").createOrReplaceTempView("g11_orders")
    spark.sql(
      """SELECT count(*) AS n_calm, CAST(sum(c_custkey) AS BIGINT) AS key_sum
        |FROM g11_customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM g11_orders
        |                        WHERE o_orderpriority = '1-URGENT')""".stripMargin)
  }

  /** G10 — time-RANGE window frame: per event, how many events the same
    * user produced in the trailing hour (self included) — the
    * RANGE-BETWEEN-INTERVAL sibling of g3's ROWS frame, and the window
    * formulation of what r2 computes as a join. The frame is expressed
    * on the µs epoch so both engines bound it with identical integer
    * arithmetic; one hash-shuffle on the user key + one in-partition
    * time sort, frame evaluation is the sliding two-pointer pass over
    * each partition (state = one window of rows, never the history).
    * COUNT output keeps it integer-exact — a double SUM over a RANGE
    * frame would be order-sensitive under timestamp ties.
    */
  def g10TrailingCount(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("trail_cnt", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("trail_cnt"))
  }

  /** G7 — set operations (INTERSECT / EXCEPT): customers active in the
    * first half of the date range vs the second, one accounting row. Both
    * operands pre-aggregate to distinct keys, so the set ops run at
    * key cardinality.
    */
  def g7SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val h1 = o.filter(col("o_orderdate") < "1998-07-01")
      .select(col("o_custkey")).distinct()
    val h2 = o.filter(col("o_orderdate") >= "1998-07-01")
      .select(col("o_custkey")).distinct()
    val both = h1.intersect(h2).agg(count(lit(1)).as("in_both"))
    val h1Only = h1.except(h2).agg(count(lit(1)).as("h1_only"))
    val h2Only = h2.except(h1).agg(count(lit(1)).as("h2_only"))
    both.crossJoin(h1Only).crossJoin(h2Only)
  }

  /** G8 — correlated EXISTS / NOT EXISTS subqueries through the SQL
    * surface: customers who ordered at least once but never urgently.
    * Catalyst decorrelates both predicates into semi/anti hash joins
    * (the same physical shape as g2's explicit semi/anti) — declared
    * here so the subquery REWRITE path is under the oracle, not just
    * the join operators it lowers to. Scale: two key-joins against an
    * aggregate-free orders projection; no per-row subquery execution
    * exists after decorrelation.
    */
  def g8ExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("g8_customer")
    Tables.load(spark, dir, "orders").createOrReplaceTempView("g8_orders")
    spark.sql(
      """SELECT count(*) AS n_calm_customers
        |FROM g8_customer c
        |WHERE EXISTS (SELECT 1 FROM g8_orders o
        |              WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM g8_orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')""".stripMargin)
  }

  /** G9 — correlated SCALAR subqueries, exact arithmetic: orders whose
    * price beats their customer's average. The comparison is the
    * integer cross-multiply `cents · n > sum_cents` (never a double
    * average — summation order would make the boundary engine-
    * dependent). Catalyst decorrelates both scalar aggregates into one
    * grouped aggregate joined back on the key; at 100 TB that is one
    * shuffle of (custkey, partial sum/count), not a per-row lookup.
    */
  def g9AboveAvg(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("g9_orders")
    spark.sql(
      """SELECT count(*) AS n_above,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM (
        |  SELECT o_orderkey, o_custkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents
        |  FROM g9_orders) o
        |WHERE o.cents * (SELECT count(*) FROM g9_orders o2
        |                 WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(15,2)) * 100) AS BIGINT)
        |       FROM g9_orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
  }

  /** K1 — salted two-phase aggregation under the oracle: per-event-type
    * counts via [[Skew.saltedAgg]] (key spread over 8 salt buckets,
    * partial count → merged sum). The oracle is the PLAIN group-by —
    * salting is semantics-preserving by construction, and that identity
    * is exactly what this query pins: however a hot key is spread, the
    * merge phase reassembles the same integers. Integer counts only; a
    * double SUM would be summation-order-sensitive across salt splits.
    * Scale: the production case is a key so hot one reducer would take
    * the whole partition even after AQE's split — the salt phase caps
    * any reducer's share at 1/buckets of the hot key.
    */
  def k1SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedAgg(Tables.load(spark, dir, "events"), "event_type",
      buckets = 8,
      partial = Seq("c" -> count(lit(1))),
      merge = Seq("cnt" -> sum(col("c"))))

  /** K2 — salted fact⋈build join under the oracle: lineitem joined to
    * orders on the order key through [[Skew.saltedJoin]] (build side
    * replicated ×4, fact side randomly salted), reduced to one
    * accounting row. The oracle is the plain join — the replicate-and-
    * salt rewrite must be row-for-row invisible no matter which salt
    * each fact row draws. Exact integer outputs (count + key sum + an
    * exact-cents revenue sum) so the identity is bit-checkable.
    */
  def k2SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        fixedPoint(col("l_extendedprice").cast(M), 2).as("price_cents"))
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    Skew.saltedJoin(l, orders, "l_orderkey", buckets = 4)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_orderkey")).as("key_sum"),
        sum(col("price_cents")).as("price_cents_sum"))
  }

  /** Stage the k3 bucketed tables for `dir` once per session: both join
    * sides written `bucketBy(8, key)` + per-bucket sorted into the
    * session warehouse — the one corpus-wide shuffle paid AT INGEST
    * that every later join on the key skips. Idempotent per (session,
    * dir): the table name carries the dir fingerprint, so verify/bench
    * runs at different scale factors stage independent copies, and a
    * bench warmup pass stages untimed.
    */
  private def stageK3(spark: SparkSession, dir: String): (String, String) = {
    val sfx = java.lang.Long.toHexString(
      graft.operators.Similarity.jvmHash60(dir))
    val (lt, ot) = (s"k3_lineitem_$sfx", s"k3_orders_$sfx")
    if (!spark.catalog.tableExists(lt) || !spark.catalog.tableExists(ot)) {
      Bucketing.writeBucketed(
        Tables.load(spark, dir, "lineitem")
          .select(col("l_orderkey"),
            fixedPoint(col("l_extendedprice").cast(M), 2).as("price_cents")),
        lt, "l_orderkey", buckets = 8)
      Bucketing.writeBucketed(
        Tables.load(spark, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        ot, "l_orderkey", buckets = 8)
    }
    (lt, ot)
  }

  /** K3 — bucketed co-located join under the oracle: both sides live
    * bucketed on the join key (staged by [[stageK3]]), so the join
    * plans with NO exchange on either side (BucketingSpec pins that) —
    * at 100 TB this is the difference between one corpus shuffle at
    * ingest and one per query. The oracle is the plain unbucketed
    * join: the layout must be row-for-row invisible, same contract
    * family as k1/k2.
    */
  def k3BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (lt, ot) = stageK3(spark, dir)
    Bucketing.coLocatedJoin(lt, ot, "l_orderkey")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_orderkey")).as("key_sum"),
        sum(col("price_cents")).as("price_cents_sum"))
  }

  /** P2 — TPC-H Q3-shaped shipping priority: three-way join, filtered
    * segment, exact-decimal revenue, top-10.
    */
  def p2Shipping(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.load(spark, dir, "orders")
    val l = Tables.load(spark, dir, "lineitem")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(fixedPoint(sum(col("l_extendedprice").cast(M) *
          (lit(1) - col("l_discount").cast(M)))
        .cast(DecimalType(25, 4)), 4).as("revenue_e4"))
      .select(col("l_orderkey"), col("revenue_e4"),
        col("o_orderdate").as("order_date"))
      .orderBy(col("revenue_e4").desc, col("l_orderkey"))
      .limit(10)
  }

  /** P20 — TPC-H Q12-shaped shipmode priority split: per line status
    * (the fixture's stand-in for Q12's ship mode), how many LATE 1998
    * lines (shipped > 30 days after the order date — the stand-in for
    * Q12's commit<receipt test) belong to high- vs low-priority
    * orders. The conditional split is two map-side CASE sums inside
    * ONE aggregate over ONE orders⋈lineitem key join — Q12's point is
    * that the priority pivot costs nothing beyond the join. Scale: one
    * fact shuffle on the order key, output at line-status cardinality;
    * both CASE branches are codegen'd integer adds, no second pass.
    */
  def p20LateMode(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= "1998-01-01")
      .join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))

  /** P21 — TPC-H Q20-shaped promotion-eligible suppliers: suppliers
    * whose 1998 shipped quantity of some ECONOMY part exceeds 20% of
    * that part's total shipped quantity (the fixture's stand-in for
    * Q20's availqty > half-of-shipped test; lineitem plays partsupp).
    * Q20's shape is a nested aggregate feeding a correlated threshold:
    * here the (part, supplier) sums roll up to per-part totals with a
    * second small aggregate, and the threshold join runs at
    * (part, supplier) cardinality. `shipped` is referenced twice;
    * collapsing the two references to one physical fact scan relies on
    * Spark's ReusedExchange (the grouped subtree is identical on both
    * paths). When the reuse does not fire, the whole grouped subtree —
    * lineitem scan, part join, and its shuffle — is computed a second
    * time; the PLAN SHAPE is unchanged (still no new join shape), but
    * the one-fact-shuffle scale claim below holds only under exchange
    * reuse.
    * Quantities compare in exact cents
    * (`q·5 > tot` cross-multiply, no division). Scale: one fact
    * shuffle on the part key; everything after is aggregate-sized;
    * supplier/nation dims are bounded joins at the end.
    */
  def p21PromoSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val shipped = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= "1998-01-01")
      .join(Tables.load(spark, dir, "part")
          .filter(col("p_type") === "ECONOMY")
          .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(fixedPoint(sum(col("l_quantity").cast(M)), 2).as("q_cents"))
    val perPart = shipped.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("q_cents")).as("tot_cents"))
    val eligible = shipped
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(col("q_cents") * 5 > col("tot_cents"))
      .select(col("l_suppkey")).distinct()
    Tables.load(spark, dir, "supplier")
      .join(eligible, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }

  /** P22 — TPC-H Q21-shaped waiting-supplier count: per supplier, the
    * finished multi-supplier orders where THEIR line was the only late
    * one (shipped > 60 days after the order date). Q21 is written as a
    * double correlated EXISTS / NOT EXISTS; the scale-correct plan is
    * the aggregate reformulation used here — per order, count distinct
    * suppliers and distinct LATE suppliers in one grouped pass, then a
    * supplier qualifies iff the order has >1 suppliers and exactly one
    * late supplier (theirs). That turns two correlated probes over
    * the fact into ONE pass: the fact join aggregates once to
    * per-(order, supplier) grain with `max(late)` — after which every
    * downstream question (how many suppliers per order, how many of
    * them late, is THIS one late) is answered from that single small
    * frame by an order-partitioned window, so the lineitem⋈orders
    * join is scanned exactly once (r8 verdict #3 killed the earlier
    * shape that fed the join to both an aggregate and a
    * `distinct()` probe — two evaluations of the fact join, pure
    * waste at 100×). The oracle keeps the EXISTS phrasing, so the
    * reformulation's equivalence is itself under the hash check.
    * Scale: two shuffles total — (orderkey, suppkey) grain agg, then
    * the orderkey window rides a strict re-partition prefix of it;
    * no per-row subquery and no fact re-scan survive.
    */
  def p22WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grain = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("late"))
    val w = Window.partitionBy(col("l_orderkey"))
    val waiting = grain
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum(when(col("late"), 1L).otherwise(0L)).over(w))
      .filter(col("late") && col("n_supp") > 1 && col("n_late") === 1)
    Tables.load(spark, dir, "supplier")
      .join(waiting, col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }
}
