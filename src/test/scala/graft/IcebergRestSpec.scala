package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{IcebergExport, IcebergRestCatalogServer, IcebergRestClient, TieredTable}

/** The Iceberg REST catalog role (the reference's `iceberg-rest`
  * service, docker-compose.yml:127-133): an external reader discovers
  * and scans tiered tables knowing only the catalog URL and the table
  * NAME — no filesystem paths — and catalog re-registration is the
  * atomic pointer swap that publishes a new snapshot.
  */
class IcebergRestSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("discover, load, time-travel, and pointer-swap over REST") {
    val dir = Files.createTempDirectory("graft-rest").toString
    val t = TieredTable(spark, s"$dir/accounts", pk = Seq("acct"))
    t.commitUpsert(Seq((1L, 100L), (2L, 200L)).toDF("acct", "balance"))
    val mloc1 = IcebergExport.export(t)

    val server = new IcebergRestCatalogServer
    try {
      server.register("fluss", "accounts", mloc1)

      // discovery: namespaces and tables by name
      assert(IcebergRestClient.listNamespaces(server.url) == Seq("fluss"))
      assert(IcebergRestClient.listTables(server.url, "fluss") ==
        Seq("accounts"))

      // the catalog-served scan equals the storage-layer read
      val viaRest = IcebergRestClient
        .loadTable(spark, server.url, "fluss", "accounts")
        .orderBy("acct").as[(Long, Long)].collect().toSeq
      assert(viaRest == Seq((1L, 100L), (2L, 200L)))

      // a NEW commit is invisible until the catalog pointer swaps —
      // the REST-catalog commit contract
      t.commitUpsert(Seq((2L, 250L), (3L, 300L)).toDF("acct", "balance"))
      val mloc2 = IcebergExport.export(t)
      val stale = IcebergRestClient
        .loadTable(spark, server.url, "fluss", "accounts")
        .orderBy("acct").as[(Long, Long)].collect().toSeq
      assert(stale == Seq((1L, 100L), (2L, 200L)),
        "old pointer serves the old snapshot")
      server.register("fluss", "accounts", mloc2)
      val fresh = IcebergRestClient
        .loadTable(spark, server.url, "fluss", "accounts")
        .orderBy("acct").as[(Long, Long)].collect().toSeq
      assert(fresh == Seq((1L, 100L), (2L, 250L), (3L, 300L)))

      // time travel THROUGH the catalog: as-of the first snapshot id
      val snaps = t.currentSnapshot.get.id
      val asOf = IcebergRestClient
        .loadTable(spark, server.url, "fluss", "accounts",
          asOfSnapshotId = Some(1L))
        .orderBy("acct").as[(Long, Long)].collect().toSeq
      assert(asOf == Seq((1L, 100L), (2L, 200L)), s"head snapshot $snaps")

      // unknown table → a clean 404, not a stack trace
      val e = intercept[NoSuchElementException](IcebergRestClient
        .loadTable(spark, server.url, "fluss", "nope"))
      assert(e.getMessage.contains("not in catalog"))
    } finally server.stop()
  }

  test("a bucket-resident table serves through the catalog (the " +
       "Iceberg-on-MinIO shape)") {
    graft.storage.DemoObjectStore.withStore { fsUrl =>
      val t = TieredTable(spark, s"$fsUrl/rest_t")
      t.appendLog(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      t.tier()
      val mloc = IcebergExport.export(t)
      assert(mloc.startsWith(fsUrl.takeWhile(_ != ':') + "://"),
        s"metadata chain lives in the bucket: $mloc")
      val server = new IcebergRestCatalogServer
      try {
        server.register("fluss", "rest_t", mloc)
        // the catalog proxies the metadata document FROM the bucket;
        // the scan resolves manifests and parquet from bucket objects
        val rows = IcebergRestClient
          .loadTable(spark, server.url, "fluss", "rest_t")
          .orderBy("id").as[(Long, String)].collect().toSeq
        assert(rows == Seq((1L, "a"), (2L, "b")))
      } finally server.stop()
    }
  }
}
