package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TieredCatalog

/** Keeps the PipelineStress harness honest at a small volume: every
  * generated order survives to the enriched table, the cold tier and
  * the exported Iceberg metadata agree with it, and the revenue
  * aggregation lands one group per nation. The big-volume numbers live
  * in SCALING.md.
  */
class PipelineStressSpec extends AnyFunSuite with SparkSpec {

  test("SQL pipeline stress harness is end-to-end consistent at 50k") {
    val wh = Files.createTempDirectory("graft-pssp").toString
    val prev = TieredCatalog.warehouse
    try {
      val r = PipelineStress.run(spark, nOrders = 50000L, db = "pst",
        warehouse = Some(wh))
      assert(r.enrichedRows == 50000L)
      assert(r.coldRows == 50000L, "datalake sink fully tiered")
      assert(r.icebergRows == 50000L, "exported metadata resolves the tier")
      assert(r.revenueGroups >= 1 && r.revenueGroups <= 11,
        s"one group per nation name (10 names + null-nation drop), " +
          s"got ${r.revenueGroups}")
    } finally {
      Seq("orders", "customer", "nation", "enriched", "revenue")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS graft.pst.$t"))
      Seq("ps_source_order", "ps_source_customer", "ps_source_nation")
        .foreach { v =>
          spark.catalog.dropTempView(v)
          graft.sources.FakerSource.unregister(v)
        }
      TieredCatalog.warehouse = prev
    }
  }
}
