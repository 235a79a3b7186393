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

  /** Analyzed plan, where `broadcast()` hints still appear as
    * ResolvedHint nodes (the optimizer erases them into join strategy).
    */
  private def analyzedOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.analyzed.toString

  test("p8/p9/p10: no forced broadcast of SF-scaled tables") {
    // part/customer/orders all grow with the scale factor — a hint that
    // is harmless at sf0.1 is an executor OOM at sf100 (VERDICT r4 on
    // p3/p4/p5). These three queries must leave broadcast choice to AQE.
    for ((name, df) <- Seq(
        "p8" -> Relational.p8PromoRevenue(spark, dir),
        "p9" -> Relational.p9BandedRevenue(spark, dir),
        "p10" -> Relational.p10BigOrders(spark, dir))) {
      assert(!analyzedOf(df).contains("ResolvedHint"),
        s"$name must not force-broadcast an SF-scaled table")
    }
    // p11's one hint is the single-row max — bounded by construction,
    // and it must stay (a shuffle for one row is the silly plan)
    assert(analyzedOf(Relational.p11TopSupplier(spark, dir))
      .contains("ResolvedHint"))
  }

  test("p5: broadcast hints only on bounded dims, never on SF-scaled tables") {
    // nation (25 rows) and region (5 rows) are bounded at ANY scale
    // factor, so their hints stay; part/customer/supplier/orders/
    // lineitem grow with SF — a type-filter on part keeps a constant
    // FRACTION, not a constant size, so hinting it is a 100× OOM
    // (VERDICT r5). Inspect the actual hinted subtrees, not the string.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val analyzed =
      Relational.p5MarketShare(spark, dir).queryExecution.analyzed
    val hintedCols = analyzed.collect {
      case h: ResolvedHint => h.child.output.map(_.name)
    }.flatten.toSet
    assert(hintedCols.nonEmpty, "bounded nation/region hints must stay")
    for (c <- Seq("p_partkey", "c_custkey", "s_suppkey",
        "o_orderkey", "l_orderkey")) {
      assert(!hintedCols.contains(c),
        s"SF-scaled column $c sits under a forced broadcast hint")
    }
  }

  test("p8: the ship-month band reaches the lineitem scan") {
    val plan = planOf(Relational.p8PromoRevenue(spark, dir))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan.take(2000))
    assert(plan.contains("LessThan(l_shipdate"))
    // the PROMO split is an aggregate expression, not a filter — it must
    // NOT appear as a pushed predicate (that would drop non-promo rows
    // from total_e4)
    assert(!plan.contains("StringStartsWith(p_type"))
  }

  test("p9: per-side residuals of the OR-of-ANDs reach both scans") {
    val plan = planOf(Relational.p9BandedRevenue(spark, dir))
    // the cross-table disjunction can't push whole, but each side's
    // union-of-bands residual can — Catalyst extracts the per-side
    // disjunction and the parquet reader gets it as a pushed Or-tree
    assert(plan.contains("Or(Or(And(EqualTo(p_brand,Brand#1)"),
      "part scan must receive the brand/size band union\n" + plan.take(3000))
    assert(plan.contains("Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)"),
      "lineitem scan must receive the quantity band union")
  }

  test("p10: lineitem aggregates to order grain before any join") {
    val plan = planOf(Relational.p10BigOrders(spark, dir))
    val lines = plan.linesIterator.toVector
    val firstJoin = lines.indexWhere(_.contains("Join"))
    val aggBelowJoin = lines.zipWithIndex.exists { case (l, i) =>
      i > firstJoin && l.contains("HashAggregate") &&
        l.contains("l_orderkey")
    }
    assert(firstJoin >= 0 && aggBelowJoin,
      "the per-order quantity aggregate must sit under the join, " +
        "reducing the fact to order grain first")
  }

  test("p17/p22: the fact join is scanned exactly once (r8 #2/#3: " +
       "the correlated-min and EXISTS shapes re-evaluated it)") {
    // count physical scans of the lineitem fixture: the window-min
    // rewrite (p17) and the per-(order,supplier) grain + window
    // counts (p22) must each read the fact ONCE — the subquery /
    // distinct-probe shapes planned TWO full evaluations of the
    // 3-way / 2-way fact join, pure waste at 100×
    def lineitemScans(df: org.apache.spark.sql.DataFrame): Int =
      planOf(df).linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("lineitem"))
    assert(lineitemScans(Relational.p17MinCostSupplier(spark, dir)) == 1,
      "p17 must scan lineitem exactly once (window-min, not a " +
        "decorrelated re-evaluation)")
    assert(lineitemScans(Relational.p22WaitingSuppliers(spark, dir)) == 1,
      "p22 must scan lineitem exactly once (grain agg + window, not " +
        "an aggregate plus a distinct probe)")
    // and the windows the rewrites introduced are keyed (never global)
    Seq(Relational.p17MinCostSupplier(spark, dir),
        Relational.p22WaitingSuppliers(spark, dir)).foreach { df =>
      import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
      df.queryExecution.optimizedPlan.foreach {
        case w: LWindow => assert(w.partitionSpec.nonEmpty)
        case _ =>
      }
    }
  }

  test("k3: the bucketed join never hash-repartitions either side") {
    val plan = planOf(Relational.k3BucketedJoin(spark, dir))
    // the property that matters at 100 TB: no Exchange hashpartitioning
    // anywhere — the bucketed layout supplies the join's distribution.
    // (At this fixture size AQE rightly broadcasts the small side
    // instead of the bucket-aligned sort-merge; a BroadcastExchange of
    // the dim is not a corpus shuffle. BucketingSpec pins the forced
    // SMJ case with the broadcast threshold off.)
    assert(!plan.contains("Exchange hashpartitioning"),
      "a hash repartition defeats the bucketed layout\n" + plan.take(2000))
    assert(plan.contains("Bucketed: true"),
      "both scans must read the bucketed layout\n" + plan.take(2000))
  }

  test("no product query plans an unpartitioned (global) window") {
    // a WindowExec with an empty partition spec funnels the whole
    // input through ONE task — the single worst scale hazard a window
    // refactor can introduce. Walk the optimized plans of every
    // non-fixture-building query and require every Window node to be
    // keyed. (q*/k* queries build tiered/bucketed fixtures inside the
    // query function, so they are exercised by their own specs instead;
    // q1 has the product window path over the raw fixture and is kept.)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, WindowGroupLimit}
    val names = SparkEntry.queries.keys.filterNot(n =>
      (n.startsWith("q") && n != "q1_pk_dedup") || n.startsWith("k"))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.optimizedPlan.foreach {
        case w: LWindow =>
          assert(w.partitionSpec.nonEmpty,
            s"$name plans a global (unpartitioned) Window")
        case w: WindowGroupLimit =>
          assert(w.partitionSpec.nonEmpty,
            s"$name plans a global (unpartitioned) WindowGroupLimit")
        case _ =>
      }
    }
  }

  test("g11: NOT IN lowers to a null-aware anti join, not a per-row subquery") {
    val plan = planOf(Relational.g11NotIn(spark, dir))
    assert(plan.contains("LeftAnti"), plan.take(2000))
    assert(!plan.linesIterator.exists(_.contains("Subquery")),
      "the IN-subquery must be rewritten into the join")
  }

  test("p13: left join survives the non-key join predicate; two aggregates stack") {
    val plan = planOf(Relational.p13OrderDist(spark, dir))
    // the priority test lives in the JOIN condition — as a WHERE it
    // would delete order-less customers instead of null-extending them
    assert(plan.contains("LeftOuter"), plan.take(2000))
    assert(plan.linesIterator.count(l =>
      l.contains("HashAggregate") && l.contains("keys=")) >= 2,
      "per-customer count and the distribution aggregate must both plan")
  }

  test("p14: count(DISTINCT) dedups before counting; NOT IN joins, no subquery") {
    val plan = planOf(Relational.p14SupplierParts(spark, dir))
    assert(plan.contains("LeftAnti"),
      "the supplier exclusion must lower to an anti join\n" + plan.take(2000))
    // two-phase distinct: a keyed aggregate on (group, l_suppkey)
    // must sit under the final count — the dedup shuffle carries
    // relationships, not line items
    assert(plan.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.contains("l_suppkey") &&
        l.contains("keys=") && l.contains("p_brand")),
      "distinct dedup aggregate missing\n" + plan.take(3000))
  }

  test("p15: the correlated per-part average fully decorrelates") {
    val plan = planOf(Relational.p15SmallQty(spark, dir))
    assert(!plan.linesIterator.exists(_.contains("Subquery")),
      "no per-row subquery execution may survive\n" + plan.take(2000))
    assert(plan.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.contains("l_partkey")),
      "per-part aggregate must plan as one grouped aggregate")
  }

  test("p16: NOT EXISTS lowers to an anti join; the avg gate is one row broadcast") {
    val plan = planOf(Relational.p16SalesOpp(spark, dir))
    assert(plan.contains("LeftAnti"),
      "NOT EXISTS must lower to an anti join\n" + plan.take(2000))
    // the positive-balance average is an ungrouped single-row aggregate
    // consumed via a broadcast nested-loop cross join — never a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the one-row scalar gate must broadcast\n" + plan.take(2000))
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
