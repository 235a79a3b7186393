package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TieredCatalog

/** The durable catalog: `CREATE TABLE` persists its registry entry
  * under the warehouse `_catalog/` and a fresh process recovers it
  * lazily on first lookup — tables outlive the session, the metastore
  * role of the reference's coordinator. API-registered tables stay
  * process-local by design.
  */
class DurableCatalogSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("DDL-created tables survive a registry wipe (process restart)") {
    val wh = Files.createTempDirectory("graft-durcat").toString
    val prev = TieredCatalog.warehouse
    TieredCatalog.warehouse = wh
    try {
      spark.sql("DROP TABLE IF EXISTS graft.dc.orders")
      spark.sql("""CREATE TABLE graft.dc.orders (
        |  `id` BIGINT NOT NULL, `v` STRING, `ts` TIMESTAMP
        |) TBLPROPERTIES ('primary-key' = 'id', 'datalake' = 'true',
        |                 'watermark' = 'ts:5 seconds')""".stripMargin)
      spark.sql("INSERT INTO graft.dc.orders SELECT * FROM VALUES " +
        "(1L, 'a', timestamp'2026-01-01 00:00:00'), " +
        "(2L, 'b', timestamp'2026-01-01 00:00:10') AS t(id, v, ts)")

      // "restart": the in-memory registry forgets the table
      assert(TieredCatalog.unregister("dc", "orders"))

      // first lookup recovers the FULL entry from the warehouse catalog
      val e = TieredCatalog.lookup("dc", "orders").get
      assert(e.pk == Seq("id") && e.datalake &&
        e.watermark == Some("ts:5 seconds"))
      assert(spark.sql("SELECT COUNT(*) FROM graft.dc.orders")
        .head().getLong(0) == 2L)
      // the recovered table is listed and fully usable as a sink
      assert(spark.sql("SHOW TABLES IN graft.dc").collect()
        .map(_.getString(1)).contains("orders"))
      spark.sql("INSERT INTO graft.dc.orders SELECT * FROM VALUES " +
        "(1L, 'a2', timestamp'2026-01-01 00:01:00') AS t(id, v, ts)")
      assert(spark.sql(
        "SELECT v FROM graft.dc.orders WHERE id = 1").head().getString(0)
        == "a2")

      // DROP removes the descriptor: the name is gone even after a
      // registry wipe, and can be re-created
      spark.sql("DROP TABLE graft.dc.orders")
      assert(TieredCatalog.lookup("dc", "orders").isEmpty)
      spark.sql("CREATE TABLE graft.dc.orders (`id` BIGINT)")
      spark.sql("DROP TABLE graft.dc.orders")
    } finally {
      TieredCatalog.unregister("dc", "orders")
      TieredCatalog.warehouse = prev
    }
  }

  test("a stale descriptor whose data is gone is dropped, not resurrected") {
    val wh = Files.createTempDirectory("graft-durcat2").toString
    val prev = TieredCatalog.warehouse
    TieredCatalog.warehouse = wh
    try {
      val dir = Files.createTempDirectory("graft-durcat-data").toString
      spark.sql("DROP TABLE IF EXISTS graft.dc.ephemeral")
      spark.sql(s"""CREATE TABLE graft.dc.ephemeral (`id` BIGINT)
        |TBLPROPERTIES ('path' = '$dir/ephemeral')""".stripMargin)
      // wipe the data out from under the catalog, then the registry
      def rmTree(p: java.nio.file.Path): Unit = {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(x => { java.nio.file.Files.deleteIfExists(x); () })
        finally s.close()
      }
      rmTree(java.nio.file.Paths.get(s"$dir/ephemeral"))
      TieredCatalog.unregister("dc", "ephemeral")
      assert(TieredCatalog.lookup("dc", "ephemeral").isEmpty,
        "dead descriptor must not resurrect")
      // and the debris descriptor was cleaned: a fresh CREATE works
      spark.sql(s"""CREATE TABLE graft.dc.ephemeral (`id` BIGINT)
        |TBLPROPERTIES ('path' = '$dir/ephemeral')""".stripMargin)
      spark.sql("DROP TABLE graft.dc.ephemeral")
    } finally {
      TieredCatalog.unregister("dc", "ephemeral")
      TieredCatalog.warehouse = prev
    }
  }
}
