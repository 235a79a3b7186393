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

      // discovery: namespaces and tables by name, plus the existence
      // probes real clients issue before listing
      assert(IcebergRestClient.listNamespaces(server.url) == Seq("fluss"))
      assert(IcebergRestClient.listTables(server.url, "fluss") ==
        Seq("accounts"))
      assert(IcebergRestClient.namespaceExists(server.url, "fluss"))
      assert(!IcebergRestClient.namespaceExists(server.url, "nope"))
      assert(IcebergRestClient.tableExists(server.url, "fluss", "accounts"))
      assert(!IcebergRestClient.tableExists(server.url, "fluss", "nope"))

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

  test("REST write path: register, arbitrated commit, 409 on a lost " +
       "race, exactly one winner") {
    val dir = Files.createTempDirectory("graft-rest-w").toString
    val t = TieredTable(spark, s"$dir/w", pk = Seq("k"))
    t.commitUpsert(Seq((1L, "a")).toDF("k", "v"))
    val mloc1 = IcebergExport.export(t)

    val server = new IcebergRestCatalogServer
    try {
      // table create over HTTP — the spec's register endpoint
      IcebergRestClient.registerTable(server.url, "fluss", "w", mloc1)
      assert(IcebergRestClient.listTables(server.url, "fluss") == Seq("w"))
      // a second create of the same name is the spec's 409
      val dup = intercept[IcebergRestClient.CommitFailedException](
        IcebergRestClient.registerTable(server.url, "fluss", "w", mloc1))
      assert(dup.getMessage.contains("AlreadyExists"))

      // commit: new snapshot staged in storage, pointer swapped by the
      // catalog only when the asserted current state still holds
      t.commitUpsert(Seq((2L, "b")).toDF("k", "v"))
      val mloc2 = IcebergExport.export(t)
      val Some((_, Some(head1))) =
        IcebergRestClient.tableState(server.url, "fluss", "w")
      IcebergRestClient.commitTable(server.url, "fluss", "w", mloc2,
        expectedSnapshotId = Some(head1))
      val viaRest = IcebergRestClient
        .loadTable(spark, server.url, "fluss", "w")
        .orderBy("k").as[(Long, String)].collect().toSeq
      assert(viaRest == Seq((1L, "a"), (2L, "b")))

      // the LOSER of a race: asserting the old head now 409s — never
      // a silent lost update
      val stale = intercept[IcebergRestClient.CommitFailedException](
        IcebergRestClient.commitTable(server.url, "fluss", "w", mloc1,
          expectedSnapshotId = Some(head1)))
      assert(stale.getMessage.contains("CommitFailed"))

      // two committers racing the SAME expected state through the
      // HTTP endpoint: exactly one 200, one 409. Both racers must
      // carry NEW metadata documents built on the asserted base — a
      // racer re-committing the CURRENTLY registered location is an
      // idempotent no-op that legitimately succeeds without advancing
      // the pointer (nothing is lost), so it cannot prove arbitration
      t.commitUpsert(Seq((3L, "c")).toDF("k", "v"))
      val mloc3 = IcebergExport.export(t)
      val rivalLoc = s"$mloc3.rival.metadata.json"
      graft.storage.TableFs.forPath(mloc3).writeString(rivalLoc,
        graft.storage.TableFs.forPath(mloc3).readString(mloc3).get)
      val Some((_, Some(head2))) =
        IcebergRestClient.tableState(server.url, "fluss", "w")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val gate = new java.util.concurrent.CountDownLatch(1)
      val racers = Seq(mloc3, rivalLoc).map(m => Future {
        gate.await()
        try { IcebergRestClient.commitTable(server.url, "fluss", "w", m,
          expectedSnapshotId = Some(head2)); "win" }
        catch { case _: IcebergRestClient.CommitFailedException => "lose" }
      })
      gate.countDown()
      val results = racers.map(Await.result(_, 30.seconds)).toList
      assert(results.sorted == List("lose", "win"), s"got $results")

      // a commit with a REWRITE update action is refused loudly, with
      // guidance naming both accepted profiles
      val (st, resp) = {
        val conn = new java.net.URL(
          s"${server.url}/v1/namespaces/fluss/tables/w").openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        val os = conn.getOutputStream
        os.write("""{"requirements":[],"updates":[{"action":"remove-snapshots"}]}"""
          .getBytes("UTF-8")); os.close()
        val code = conn.getResponseCode
        val is = if (code < 400) conn.getInputStream else conn.getErrorStream
        (code, new String(is.readAllBytes(), "UTF-8"))
      }
      assert(st == 400 && resp.contains("set-metadata-location") &&
        resp.contains("add-snapshot"))

      // first-commit path: a fresh name commits with assert-create
      IcebergRestClient.commitTable(server.url, "fluss", "w2", mloc1,
        expectedSnapshotId = None)
      assert(IcebergRestClient.listTables(server.url, "fluss")
        .contains("w2"))
      // …but a commit against an ABSENT table without assert-create 404s
      val e404 = intercept[IllegalArgumentException](
        IcebergRestClient.commitTable(server.url, "fluss", "nope", mloc1,
          expectedSnapshotId = Some(1L)))
      assert(e404.getMessage.contains("404"))

      // DELETE drops the entry
      assert(IcebergRestClient.dropTable(server.url, "fluss", "w2"))
      assert(!IcebergRestClient.dropTable(server.url, "fluss", "w2"))
    } finally server.stop()
  }

  test("exportAndPublish: the tiering job proposes, the catalog " +
       "arbitrates — reader sees the new snapshot only after the " +
       "commit lands") {
    val dir = Files.createTempDirectory("graft-rest-p").toString
    val t = TieredTable(spark, s"$dir/p", pk = Seq("k"))
    t.commitUpsert(Seq((1L, 10L)).toDF("k", "v"))
    val server = new IcebergRestCatalogServer
    try {
      IcebergExport.exportAndPublish(t, server.url, "fluss", "p")
      assert(IcebergRestClient.loadTable(spark, server.url, "fluss", "p")
        .count() == 1)
      t.commitUpsert(Seq((2L, 20L)).toDF("k", "v"))
      // storage has the new snapshot; the CATALOG still serves the old
      assert(IcebergRestClient.loadTable(spark, server.url, "fluss", "p")
        .count() == 1, "uncommitted snapshot must stay invisible")
      IcebergExport.exportAndPublish(t, server.url, "fluss", "p")
      assert(IcebergRestClient.loadTable(spark, server.url, "fluss", "p")
        .count() == 2)
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

  test("LIST pagination: pageSize caps each page, next-page-token " +
       "chains them, the union is exact, and the client drains " +
       "transparently") {
    val dir = Files.createTempDirectory("graft-rest-page").toString
    val t = TieredTable(spark, s"$dir/t")
    t.commitAppend(Seq((1L, "a")).toDF("id", "v"))
    val mloc = IcebergExport.export(t)
    val server = new IcebergRestCatalogServer
    try {
      val names = Seq("alpha", "bravo", "charlie", "delta", "echo")
      names.foreach(n => server.register("fluss", n, mloc))
      server.register("ops", "zulu", mloc)

      // raw page walk: 2+2+1 under pageSize=2, tokens chaining
      def getJson(url: String): org.json4s.JValue = {
        val conn = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        assert(conn.getResponseCode == 200)
        val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
        org.json4s.jackson.JsonMethods.parse(body)
      }
      def page(token: Option[String]): (Seq[String], Option[String]) = {
        val qs = "pageSize=2" +
          token.map(t => s"&pageToken=$t").getOrElse("")
        val j = getJson(
          s"${server.url}/v1/namespaces/fluss/tables?$qs")
        val ids = (j \ "identifiers") match {
          case org.json4s.JArray(is) => is.map(i =>
            (i \ "name").asInstanceOf[org.json4s.JString].s)
          case _ => Nil
        }
        (ids, (j \ "next-page-token") match {
          case org.json4s.JString(s) => Some(s)
          case _ => None
        })
      }
      val (p1, t1) = page(None)
      val (p2, t2) = page(t1)
      val (p3, t3) = page(t2)
      assert(p1 == Seq("alpha", "bravo") && t1.contains("bravo"))
      assert(p2 == Seq("charlie", "delta") && t2.contains("delta"))
      assert(p3 == Seq("echo") && t3.isEmpty,
        s"final page carries no token: $p3 $t3")

      // the client drains pages transparently and equals the unpaged
      // listing; namespaces paginate the same way
      assert(IcebergRestClient.listTables(server.url, "fluss",
        pageSize = Some(2)) == names)
      assert(IcebergRestClient.listTables(server.url, "fluss") == names)
      assert(IcebergRestClient.listNamespaces(server.url,
        pageSize = Some(1)) == Seq("fluss", "ops"))
    } finally server.stop()
  }

  test("APPEND-ONLY commit profile: a FOREIGN engine's hand-built " +
       "add-snapshot + set-snapshot-ref commit lands through HTTP, the " +
       "catalog materializes the next metadata document, and the row " +
       "reads back through readFromMetadata; two racers → one 200, " +
       "one 409") {
    import org.apache.avro.generic.GenericData
    val dir = Files.createTempDirectory("graft-rest-app").toString
    val t = TieredTable(spark, s"$dir/events")
    t.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val mloc1 = IcebergExport.export(t)
    val mdir = s"${t.tablePath}/metadata"

    def post(url: String, body: String): (Int, String) = {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val os = conn.getOutputStream
      os.write(body.getBytes("UTF-8")); os.close()
      val code = conn.getResponseCode
      val is = if (code < 400) conn.getInputStream else conn.getErrorStream
      (code, if (is == null) ""
        else try new String(is.readAllBytes(), "UTF-8") finally is.close())
    }

    // ---- what the foreign writer stages BEFORE the commit: one data
    // file, one manifest listing it, one manifest list carrying the
    // old manifests plus the new one. The catalog never sees these —
    // only the add-snapshot action referencing the list.
    val fdir = s"$dir/foreign"
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(fdir)
    val dataFile = new java.io.File(fdir).listFiles()
      .map(_.getPath).filter(_.endsWith(".parquet")).head
    val entrySchema = IcebergExport.manifestEntrySchema(Nil)
    val e = new GenericData.Record(entrySchema)
    e.put("status", 1)
    e.put("snapshot_id", 2L)
    e.put("sequence_number", 2L)
    e.put("file_sequence_number", 2L)
    val df0 = new GenericData.Record(
      entrySchema.getField("data_file").schema())
    df0.put("content", 0)
    df0.put("file_path", dataFile)
    df0.put("file_format", "PARQUET")
    df0.put("partition", new GenericData.Record(
      df0.getSchema.getField("partition").schema()))
    df0.put("record_count", 1L)
    df0.put("file_size_in_bytes", new java.io.File(dataFile).length())
    e.put("data_file", df0)
    val manPath = s"$mdir/manifest-foreign-000002.avro"
    val manLen = IcebergExport.writeAvro(manPath, entrySchema, Map(
      "partition-spec" -> "[]", "partition-spec-id" -> "0",
      "format-version" -> "2", "content" -> "data"), Seq(e))
    val (oldMfs, _) =
      IcebergExport.readAvro(s"$mdir/snap-000001-manifest-list.avro")
    val mf = new GenericData.Record(IcebergExport.ManifestFileSchema)
    mf.put("manifest_path", manPath)
    mf.put("manifest_length", manLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 0)
    mf.put("sequence_number", 2L)
    mf.put("min_sequence_number", 2L)
    mf.put("added_snapshot_id", 2L)
    mf.put("added_files_count", 1)
    mf.put("existing_files_count", 0)
    mf.put("deleted_files_count", 0)
    mf.put("added_rows_count", 1L)
    mf.put("existing_rows_count", 0L)
    mf.put("deleted_rows_count", 0L)
    val listPath = s"$mdir/snap-foreign-000002-manifest-list.avro"
    IcebergExport.writeAvro(listPath, IcebergExport.ManifestFileSchema,
      Map("snapshot-id" -> "2", "sequence-number" -> "2",
        "format-version" -> "2"), oldMfs :+ mf)

    def commitBody(snapId: Long) =
      s"""{"requirements":[
         |  {"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":1}],
         | "updates":[
         |  {"action":"add-snapshot","snapshot":{
         |    "snapshot-id":$snapId,"parent-snapshot-id":1,
         |    "sequence-number":2,"timestamp-ms":1700000000000,
         |    "manifest-list":${org.json4s.jackson.JsonMethods.compact(
               org.json4s.jackson.JsonMethods.render(
                 org.json4s.JString(listPath)))},
         |    "summary":{"operation":"append"},"schema-id":0}},
         |  {"action":"set-snapshot-ref","ref-name":"main",
         |   "type":"branch","snapshot-id":$snapId}]}""".stripMargin

    val server = new IcebergRestCatalogServer
    try {
      server.register("fluss", "events", mloc1)
      val commitUrl = s"${server.url}/v1/namespaces/fluss/tables/events"

      // two racers asserting the SAME base: exactly one 200, one 409 —
      // the same arbitration matrix as the pointer-swap profile
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val gate = new java.util.concurrent.CountDownLatch(1)
      val racers = Seq(2L, 2L).map(id => Future {
        gate.await(); post(commitUrl, commitBody(id))._1
      })
      gate.countDown()
      val codes = racers.map(Await.result(_, 30.seconds)).sorted
      assert(codes == List(200, 409), s"got $codes")

      // the winning commit is visible: the catalog built and staged a
      // new metadata document; the foreign row reads back through
      // readFromMetadata with zero engine metadata in the flow
      val rows = IcebergRestClient
        .loadTable(spark, server.url, "fluss", "events")
        .orderBy("id").as[(Long, String)].collect().toSeq
      assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // time travel through the materialized document still serves
      // the pre-append state
      assert(IcebergRestClient.loadTable(spark, server.url, "fluss",
          "events", asOfSnapshotId = Some(1L))
        .orderBy("id").as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b")))
      // the served state is committed durably: current-snapshot-id
      // advanced and the old location is in the metadata-log
      val Some((newLoc, Some(head))) =
        IcebergRestClient.tableState(server.url, "fluss", "events")
      assert(head == 2L && newLoc != mloc1)
      val doc = graft.storage.TableFs.forPath(newLoc)
        .readString(newLoc).get
      assert(doc.contains("\"metadata-log\"") && doc.contains(mloc1))

      // re-adding the SAME snapshot id is the duplicate 409
      val (dupCode, dupResp) = post(commitUrl,
        commitBody(2L).replace("\"snapshot-id\":1}", "\"snapshot-id\":2}"))
      assert(dupCode == 409 && dupResp.contains("already exists"),
        s"$dupCode $dupResp")

      // an add-snapshot whose manifest list was NEVER staged → 400
      // (stage-then-commit, loudly enforced)
      val (mlCode, mlResp) = post(commitUrl, commitBody(3L)
        .replace("\"snapshot-id\":1}", "\"snapshot-id\":2}")
        .replace(listPath, s"$mdir/never-staged.avro"))
      assert(mlCode == 400 && mlResp.contains("unreadable"),
        s"$mlCode $mlResp")
    } finally server.stop()
  }
}
