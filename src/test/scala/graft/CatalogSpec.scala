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
    // Iceberg-shaped metadata row: parent lineage, manifest pointer,
    // summary map — all addressable from SQL
    val meta = extSession.sql(
      """SELECT parent_id, manifest_list, summary['added-records']
        |FROM graft.demo.orders__snapshots""".stripMargin).head()
    assert(meta.isNullAt(0))
    assert(meta.getString(1).endsWith("snap-000001.props"))
    assert(meta.getString(2) == "3")
    // joins/aggregates compose with the resolved relation
    assert(extSession.sql(
      """SELECT SUM(a.id) FROM graft.demo.orders a
        |JOIN graft.demo.orders__cold b ON a.id = b.id""".stripMargin)
      .head().getLong(0) == 6)
  }

  test("SQL write path: CREATE TABLE + the reference's INSERT INTO workflow") {
    // The reference workload is driven by SQL INSERT INTO
    // (reference README.md:211-216, 222, 247): load tables, enrich,
    // aggregate into a PK table. Replayed here end-to-end through the
    // graft catalog with no Scala-API calls for the writes.
    graft.tables.Tables.registerAll(spark, "/root/testdata/sf0.001")
    // defensive: purge managed leftovers from a crashed earlier run
    Seq("fluss_nation", "fluss_order", "nation_revenue")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS graft.wf.$t"))
    spark.sql("""CREATE TABLE graft.wf.fluss_nation
                |  (n_nationkey BIGINT, n_name STRING)
                |  TBLPROPERTIES ('primary-key' = 'n_nationkey')""".stripMargin)
    spark.sql("""CREATE TABLE graft.wf.fluss_order
                |  (o_orderkey BIGINT, o_custkey BIGINT,
                |   o_totalprice DECIMAL(15,2))""".stripMargin)
    spark.sql("""CREATE TABLE graft.wf.nation_revenue
                |  (nation_name STRING, revenue DECIMAL(25,2))
                |  TBLPROPERTIES ('primary-key' = 'nation_name')""".stripMargin)
    // 4.1 load
    spark.sql("INSERT INTO graft.wf.fluss_nation SELECT n_nationkey, n_name FROM nation")
    spark.sql("""INSERT INTO graft.wf.fluss_order
                |SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(15,2))
                |FROM orders""".stripMargin)
    // 4.3-shaped aggregate into the PK table (via the customer bridge)
    spark.sql("""INSERT INTO graft.wf.nation_revenue
                |SELECT n.n_name AS nation_name,
                |       CAST(SUM(o.o_totalprice) AS DECIMAL(25,2)) AS revenue
                |FROM graft.wf.fluss_order o
                |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                |LEFT JOIN graft.wf.fluss_nation n ON c.c_nationkey = n.n_nationkey
                |GROUP BY n.n_name""".stripMargin)

    val nOrders = spark.sql("SELECT COUNT(*) FROM orders").head().getLong(0)
    assert(spark.sql("SELECT COUNT(*) FROM graft.wf.fluss_order")
      .head().getLong(0) == nOrders)
    // PK upsert semantics: re-running the aggregate INSERT must not
    // duplicate rows (last write wins per nation)
    val n1 = spark.sql("SELECT COUNT(*) FROM graft.wf.nation_revenue")
      .head().getLong(0)
    spark.sql("""INSERT INTO graft.wf.nation_revenue
                |SELECT n.n_name, CAST(SUM(o.o_totalprice) AS DECIMAL(25,2))
                |FROM graft.wf.fluss_order o
                |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                |LEFT JOIN graft.wf.fluss_nation n ON c.c_nationkey = n.n_nationkey
                |GROUP BY n.n_name""".stripMargin)
    assert(spark.sql("SELECT COUNT(*) FROM graft.wf.nation_revenue")
      .head().getLong(0) == n1)
    // 5.1: tier the log table, then the cold-only (Trino-role) read and
    // the snapshots listing work over the SQL-written data
    val e = TieredCatalog.lookup("wf", "fluss_order").get
    TieredTable(spark, e.path).tier()
    assert(spark.sql("SELECT COUNT(*) FROM graft.wf.fluss_order__cold")
      .head().getLong(0) == nOrders)
    assert(spark.sql("SELECT COUNT(*) FROM graft.wf.fluss_order__snapshots")
      .head().getLong(0) >= 1)
    // top-5 nations straight off the PK table (reference 5.1)
    assert(spark.sql(
      """SELECT nation_name FROM graft.wf.nation_revenue
        |ORDER BY revenue DESC, nation_name LIMIT 5""".stripMargin).count() == 5)
    Seq("fluss_nation", "fluss_order", "nation_revenue")
      .foreach(t => spark.sql(s"DROP TABLE graft.wf.$t"))
  }

  test("CTAS: CREATE TABLE AS SELECT materializes through the tiered commit") {
    spark.sql("DROP TABLE IF EXISTS graft.wf.big_orders")
    graft.tables.Tables.registerAll(spark, "/root/testdata/sf0.001")
    spark.sql(
      """CREATE TABLE graft.wf.big_orders AS
        |SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(15,2)) AS price
        |FROM orders WHERE o_totalprice > 150000""".stripMargin)
    val expected = spark.sql(
      "SELECT COUNT(*) FROM orders WHERE o_totalprice > 150000").head().getLong(0)
    assert(expected > 0)
    assert(spark.sql("SELECT COUNT(*) FROM graft.wf.big_orders")
      .head().getLong(0) == expected)
    // the CTAS result is a real tiered table: the write landed in the
    // hot log (no snapshot yet), and tiering promotes it to a snapshot
    assert(spark.sql("SELECT COUNT(*) FROM graft.wf.big_orders__snapshots")
      .head().getLong(0) == 0)
    val e = TieredCatalog.lookup("wf", "big_orders").get
    TieredTable(spark, e.path).tier()
    assert(spark.sql("SELECT COUNT(*) FROM graft.wf.big_orders__snapshots")
      .head().getLong(0) == 1)
    assert(spark.sql("SELECT COUNT(*) FROM graft.wf.big_orders__cold")
      .head().getLong(0) == expected)
    spark.sql("DROP TABLE graft.wf.big_orders")
  }

  test("ALTER TABLE ADD COLUMN evolves the declared schema; __files lists tiers") {
    spark.sql("DROP TABLE IF EXISTS graft.wf.evo")
    // a previous JVM's managed table leaves its location on disk with no
    // registration for DROP to find — purge so the CREATE safety check
    // (refuse non-empty unregistered locations) can pass
    val leftover = java.nio.file.Paths.get(
      graft.plans.TieredCatalog.warehouse, "wf", "evo")
    if (java.nio.file.Files.exists(leftover)) {
      val s = java.nio.file.Files.walk(leftover)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(java.nio.file.Files.deleteIfExists(_))
      finally s.close()
    }
    spark.sql("CREATE TABLE graft.wf.evo (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.wf.evo VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE graft.wf.evo ADD COLUMN score DOUBLE")
    // pre-evolution rows surface NULL in the new column
    assert(spark.sql("SELECT COUNT(*) FROM graft.wf.evo WHERE score IS NULL")
      .head().getLong(0) == 2)
    spark.sql("INSERT INTO graft.wf.evo VALUES (3, 'c', 0.5)")
    assert(spark.sql("SELECT COUNT(*) FROM graft.wf.evo").head().getLong(0) == 3)
    assert(spark.sql(
      "SELECT SUM(CASE WHEN score IS NULL THEN 1 ELSE 0 END) FROM graft.wf.evo")
      .head().getLong(0) == 2)
    // rejected change kinds fail loudly instead of corrupting history
    // (RENAME/DROP are now supported — SchemaEvolutionSpec — so the
    // rejected representative is a TYPE change)
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.wf.evo ALTER COLUMN score TYPE STRING")
    }
    // __files: both appends are hot segments until tiering; then cold
    val hotRows = spark.sql(
      "SELECT tier, size_bytes FROM graft.wf.evo__files").collect()
    assert(hotRows.length == 2 && hotRows.forall(r =>
      r.getString(0) == "hot" && r.getLong(1) > 0))
    val e = TieredCatalog.lookup("wf", "evo").get
    TieredTable(spark, e.path).tier()
    val tiers = spark.sql("SELECT tier FROM graft.wf.evo__files")
      .collect().map(_.getString(0)).toSeq
    assert(tiers == Seq("cold"))
    spark.sql("DROP TABLE graft.wf.evo")
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

  test("merge-on-read SQL time travel resolves winners, never raw versions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cat3").toString
    val t = TieredTable(spark, s"$dir/mor", pk = Seq("k"), mergeOnRead = true)
    t.commitUpsert(Seq((1, "a")).toDF("k", "v"))
    t.commitUpsert(Seq((1, "a2")).toDF("k", "v"))
    TieredCatalog.register("demo", "mor", s"$dir/mor", pk = Seq("k"),
      mergeOnRead = true)
    // r9 (GraftMorReadRule): the raw snapshot holds both versions of k
    // plus __seq — the SQL face is the RESOLVED view at each snapshot
    val v1 = extSession.sql("SELECT * FROM graft.demo.mor VERSION AS OF 1")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(v1 == Seq(1 -> "a"))
    val now = extSession.sql("SELECT * FROM graft.demo.mor")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(now == Seq(1 -> "a2"))
  }

  test("$history reports current-state ancestry across a rollback") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-hist").toString
    val t = TieredTable(spark, s"$dir/h")
    t.appendLog(Seq(1L).toDF("id")); t.tier()
    val s1 = t.latestSnapshotId
    t.appendLog(Seq(2L).toDF("id")); t.tier()
    val s2 = t.latestSnapshotId
    t.appendLog(Seq(3L).toDF("id")); t.tier()
    val s3 = t.latestSnapshotId
    t.rollbackTo(s2)
    val s4 = t.latestSnapshotId
    TieredCatalog.register("demo", "hist_t", s"$dir/h")
    val rows = extSession.sql(
      """SELECT snapshot_id, is_current_ancestor
        |FROM graft.demo.`hist_t$history` ORDER BY snapshot_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    // the rolled-past snapshot (s3) is NOT an ancestor of the current
    // state; the rollback commit, its target, and the prefix are
    val expect = (1L to s4).map(id => id -> (id != s3))
    assert(rows == expect, s"s1=$s1 s2=$s2 s3=$s3 s4=$s4: $rows")
    // parent_id stays COMMIT lineage (linear); timestamps are real
    val p4 = extSession.sql(
      s"""SELECT parent_id, made_current_at
         |FROM graft.demo.`hist_t$$history`
         |WHERE snapshot_id = $s4""".stripMargin).head()
    assert(p4.getLong(0) == s3 && p4.getTimestamp(1) != null)
  }

  test("unknown tables under graft still error cleanly") {
    val e = intercept[Exception] {
      extSession.sql("SELECT * FROM graft.demo.nope").collect()
    }
    assert(e.getMessage.toLowerCase.contains("nope"))
  }

  test("SQL DELETE runs the copy-on-write commit and shows in snapshots") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-del").toString
    TieredCatalog.register("demo", "del_t", s"$dir/t")
    val t = TieredTable(spark, s"$dir/t")
    t.appendLog(Seq(1L, 2L, 3L, 4L).toDF("id")); t.tier()
    extSession.sql("DELETE FROM graft.demo.del_t WHERE id IN (2, 4)")
    assert(extSession.sql("SELECT id FROM graft.demo.del_t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // the delete is a first-class snapshot
    val ops = extSession.sql(
      "SELECT operation FROM graft.demo.del_t__snapshots ORDER BY snapshot_id")
      .collect().map(_.getString(0)).toSeq
    assert(ops == Seq("tier", "delete"))
    // deleting nothing commits nothing
    extSession.sql("DELETE FROM graft.demo.del_t WHERE id = 99")
    assert(extSession.sql(
      "SELECT COUNT(*) FROM graft.demo.del_t__snapshots").head().getLong(0) == 2)
  }

  test("SQL DELETE on an un-tiered hot-only table names tier() as the fix") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-del-hot").toString
    TieredCatalog.register("demo", "del_hot", s"$dir/t")
    val t = TieredTable(spark, s"$dir/t")
    t.appendLog(Seq(1L, 2L).toDF("id")) // hot segments, NO snapshot yet
    val e = intercept[Exception] {
      extSession.sql("DELETE FROM graft.demo.del_hot WHERE id = 1")
    }
    // the failure must say "tier first", not imply the table is empty
    assert(e.getMessage.contains("tier()"))
    assert(!e.getMessage.contains("nothing to delete"))
  }

  test("managed CREATE TABLE refuses a location holding committed state") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.wf.survivor")
    spark.sql("CREATE TABLE graft.wf.survivor (id BIGINT)")
    spark.sql("INSERT INTO graft.wf.survivor VALUES (1), (2)")
    val path = TieredCatalog.lookup("wf", "survivor").get.path
    // simulate a NEW process: the in-memory registry forgot the table.
    // The DURABLE catalog still remembers it, so the CREATE is refused
    // as a plain name conflict (the table exists, r8)
    TieredCatalog.unregister("wf", "survivor")
    val dup = intercept[Exception] {
      spark.sql("CREATE TABLE graft.wf.survivor (id BIGINT)")
    }
    assert(dup.getMessage.contains("already exists"))
    // second layer: even with the durable descriptor gone (a foreign
    // or crashed process left committed data at the managed location
    // with no catalog entry), the location guard still refuses
    TieredCatalog.unregister("wf", "survivor")
    TieredCatalog.deletePersisted("wf", "survivor")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.wf.survivor (id BIGINT)")
    }
    assert(e.getMessage.contains("not empty"))
    // the data survived the refused CREATE
    TieredCatalog.register("wf", "survivor", path)
    assert(spark.sql("SELECT COUNT(*) FROM graft.wf.survivor")
      .head().getLong(0) == 2)
    spark.sql("DROP TABLE graft.wf.survivor")
    // with the committed state dropped, the same CREATE now succeeds
    spark.sql("CREATE TABLE graft.wf.survivor (id BIGINT)")
    spark.sql("DROP TABLE graft.wf.survivor")
  }

  test("namespaces: SHOW DATABASES, USE db, auto-namespace CREATE") {
    val dir = Files.createTempDirectory("graft-ns").toString
    spark.sql("DROP TABLE IF EXISTS graft.nsdemo.t1")
    // CREATE TABLE into a FRESH database needs no CREATE DATABASE
    // (auto-namespace, the path-based-catalog stance)
    spark.sql(s"""CREATE TABLE graft.nsdemo.t1 (id BIGINT)
      |TBLPROPERTIES ('path' = '$dir/t1')""".stripMargin)
    try {
      val dbs = spark.sql("SHOW DATABASES IN graft").collect()
        .map(_.getString(0)).toSeq
      assert(dbs.contains("nsdemo"), dbs.toString)
      assert(spark.sql("SHOW TABLES IN graft.nsdemo").collect()
        .map(_.getString(1)).toSeq == Seq("t1"))
      // USE the namespace; unqualified resolution follows
      val prevCat = spark.sessionState.catalogManager.currentCatalog.name
      spark.sql("USE graft.nsdemo")
      try {
        spark.sql("INSERT INTO t1 SELECT * FROM VALUES (7L) AS v(id)")
        assert(spark.sql("SELECT id FROM t1").head().getLong(0) == 7L)
      } finally spark.sessionState.catalogManager.setCurrentCatalog(prevCat)
      // DESCRIBE resolves through the catalog schema
      assert(spark.sql("DESCRIBE TABLE graft.nsdemo.t1").collect()
        .exists(r => r.getString(0) == "id" && r.getString(1) == "bigint"))
      // CREATE DATABASE is an accepted no-op; DROP refuses non-empty,
      // CASCADE drops the tables with it
      spark.sql("CREATE DATABASE IF NOT EXISTS graft.nsdemo")
      val e = intercept[Exception](spark.sql("DROP DATABASE graft.nsdemo"))
      assert(e.getMessage.contains("CASCADE"))
      spark.sql("DROP DATABASE graft.nsdemo CASCADE")
      assert(TieredCatalog.lookup("nsdemo", "t1").isEmpty)
      assert(!spark.sql("SHOW DATABASES IN graft").collect()
        .map(_.getString(0)).contains("nsdemo"))
    } finally spark.sql("DROP TABLE IF EXISTS graft.nsdemo.t1")
  }

  test("__files reports normalized paths and real sizes for file: URIs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-uri").toString
    TieredCatalog.register("demo", "uri_t", s"file://$dir/t")
    val t = TieredTable(spark, s"file://$dir/t")
    t.appendLog(Seq(1L, 2L).toDF("id"))
    val rows = extSession.sql(
      "SELECT file_path, tier, size_bytes FROM graft.demo.uri_t__files")
      .collect()
    assert(rows.length == 1)
    // normalized absolute path (no scheme), resolvable → non-zero bytes
    assert(rows.head.getString(0).startsWith(s"$dir/t/log/"))
    assert(rows.head.getString(1) == "hot")
    assert(rows.head.getLong(2) > 0)
  }

  test("CREATE TABLE PARTITIONED BY lays out Hive dirs and prunes SQL reads") {
    spark.sql("DROP TABLE IF EXISTS graft.wf.evpart")
    // the registry is process-local: a table left by a crashed PREVIOUS
    // jvm is invisible to DROP IF EXISTS — clear its managed location
    val leftover = java.nio.file.Paths.get(
      s"${TieredCatalog.warehouse}/wf/evpart")
    if (Files.exists(leftover)) {
      val s = Files.walk(leftover)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(Files.deleteIfExists(_))
      finally s.close()
    }
    spark.sql(
      """CREATE TABLE graft.wf.evpart (id BIGINT, day STRING, v BIGINT)
        |PARTITIONED BY (day)""".stripMargin)
    spark.sql("INSERT INTO graft.wf.evpart VALUES (1, 'd0', 10), (2, 'd1', 20)")
    spark.sql("INSERT INTO graft.wf.evpart VALUES (3, 'd0', 30), (4, 'd2', 40)")
    val all = spark.sql("SELECT id FROM graft.wf.evpart")
    assert(all.count() == 4)
    val d0 = spark.sql("SELECT id FROM graft.wf.evpart WHERE day = 'd0' ORDER BY id")
    assert(d0.collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // the scan only touches the day=d0 directories
    val touched = spark.sql(
      "SELECT DISTINCT input_file_name() FROM graft.wf.evpart WHERE day = 'd0'")
      .collect().map(_.getString(0))
    assert(touched.nonEmpty && touched.forall(_.contains("day=d0")),
      s"non-pruned files touched: ${touched.mkString(", ")}")
    // non-identity transforms are rejected loudly
    val e = intercept[Exception] {
      spark.sql(
        """CREATE TABLE graft.wf.evpart2 (id BIGINT, ts TIMESTAMP)
          |PARTITIONED BY (days(ts))""".stripMargin)
    }
    assert(e.getMessage.contains("identity"))
    spark.sql("DROP TABLE graft.wf.evpart")
  }

  test("SHOW PARTITIONS lists live Hive partitions; partial specs " +
       "filter; partition DDL refuses loudly") {
    spark.sql("DROP TABLE IF EXISTS graft.wf.showp")
    spark.sql(
      """CREATE TABLE graft.wf.showp (id BIGINT, p STRING, q STRING)
        |PARTITIONED BY (p, q)""".stripMargin)
    spark.sql("INSERT INTO graft.wf.showp " +
      "SELECT id, CAST(id % 2 AS STRING), CAST(id % 3 AS STRING) " +
      "FROM range(60)")
    val all = spark.sql("SHOW PARTITIONS graft.wf.showp")
      .collect().map(_.getString(0)).toSet
    assert(all == Set("p=0/q=0", "p=0/q=1", "p=0/q=2",
      "p=1/q=0", "p=1/q=1", "p=1/q=2"), all.toString)
    val partial = spark.sql(
      "SHOW PARTITIONS graft.wf.showp PARTITION (p = '1')")
      .collect().map(_.getString(0)).toSet
    assert(partial == Set("p=1/q=0", "p=1/q=1", "p=1/q=2"))
    val add = intercept[Exception](spark.sql(
      "ALTER TABLE graft.wf.showp ADD PARTITION (p = '9', q = '9')"))
    assert(add.getMessage.contains("materialize"), add.getMessage)
    spark.sql("DROP TABLE graft.wf.showp")

    // declared PARTITIONED BY order wins over table-schema order:
    // dirs nest p=…/q=… even though the schema lists q before p
    spark.sql("DROP TABLE IF EXISTS graft.wf.showp2")
    spark.sql(
      """CREATE TABLE graft.wf.showp2 (id BIGINT, q STRING, p STRING)
        |PARTITIONED BY (p, q)""".stripMargin)
    spark.sql("INSERT INTO graft.wf.showp2 VALUES (1, 'qq', 'pp')")
    assert(spark.sql("SHOW PARTITIONS graft.wf.showp2")
      .collect().map(_.getString(0)).toSeq == Seq("p=pp/q=qq"),
      "SHOW PARTITIONS must render segments in layout order")
    spark.sql("DROP TABLE graft.wf.showp2")
  }

  test("CREATE OR REPLACE TABLE and RTAS replace through drop+create") {
    spark.sql("DROP TABLE IF EXISTS graft.wf.ror")
    spark.sql("DROP TABLE IF EXISTS graft.wf.ror2")
    spark.sql("CREATE TABLE graft.wf.ror (id BIGINT)")
    spark.sql("INSERT INTO graft.wf.ror VALUES (1)")
    spark.sql("CREATE OR REPLACE TABLE graft.wf.ror (id BIGINT, v STRING)")
    assert(spark.table("graft.wf.ror").columns.toSeq == Seq("id", "v"))
    assert(spark.table("graft.wf.ror").count() == 0,
      "REPLACE discards the old content with the old schema")
    spark.sql("CREATE OR REPLACE TABLE graft.wf.ror2 AS SELECT 1L AS id")
    assert(spark.table("graft.wf.ror2").count() == 1)
    spark.sql("DROP TABLE graft.wf.ror")
    spark.sql("DROP TABLE graft.wf.ror2")
  }

  test("TRUNCATE TABLE commits an empty state; history stays " +
       "time-travelable; a hot tail refuses") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.wf.trunc")
    spark.sql("CREATE TABLE graft.wf.trunc (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.wf.trunc VALUES (1, 'a'), (2, 'b')")
    val t = graft.storage.TieredTable(spark,
      graft.plans.TieredCatalog.lookup("wf", "trunc").get.path)
    // the INSERT lands hot — truncating over it must refuse
    val hot = intercept[Exception](spark.sql("TRUNCATE TABLE graft.wf.trunc"))
    assert(hot.getMessage.contains("tier()"), hot.getMessage)
    t.tier()
    // staging confs veto a direct truncation of main (same stance as
    // INSERT OVERWRITE under wap)
    spark.conf.set("spark.graft.wap.branch", "b1")
    try {
      val staged = intercept[Exception](
        spark.sql("TRUNCATE TABLE graft.wf.trunc"))
      assert(staged.getMessage.contains("not stageable"), staged.getMessage)
    } finally spark.conf.unset("spark.graft.wap.branch")
    spark.sql("TRUNCATE TABLE graft.wf.trunc")
    assert(spark.table("graft.wf.trunc").count() == 0)
    // history intact: the pre-truncate snapshot still reads
    assert(spark.sql("SELECT * FROM graft.wf.trunc VERSION AS OF 1")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // and the table accepts new rows after
    spark.sql("INSERT INTO graft.wf.trunc VALUES (3, 'c')")
    assert(spark.table("graft.wf.trunc").count() == 1)
    spark.sql("DROP TABLE graft.wf.trunc")
  }

  test("ALTER TABLE RENAME TO moves the identity, not the data; " +
       "taken targets refuse") {
    spark.sql("DROP TABLE IF EXISTS graft.wf.rn_old")
    spark.sql("DROP TABLE IF EXISTS graft.wf.rn_new")
    spark.sql("CREATE TABLE graft.wf.rn_old (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.wf.rn_old VALUES (1, 'a'), (2, 'b')")
    val path = graft.plans.TieredCatalog.lookup("wf", "rn_old").get.path

    spark.sql("ALTER TABLE graft.wf.rn_old RENAME TO wf.rn_new")
    assert(spark.table("graft.wf.rn_new").count() == 2)
    assert(graft.plans.TieredCatalog.lookup("wf", "rn_old").isEmpty,
      "the old name must be gone")
    assert(graft.plans.TieredCatalog.lookup("wf", "rn_new").get.path == path,
      "rename moves identity, never bytes")

    spark.sql("CREATE TABLE graft.wf.rn_taken (id BIGINT)")
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE graft.wf.rn_new RENAME TO wf.rn_taken"))
    assert(e2.getMessage.contains("already exists"))
    spark.sql("DROP TABLE graft.wf.rn_new")
    spark.sql("DROP TABLE graft.wf.rn_taken")
  }

}
