package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TieredTable
import graft.tables.Tables

class SqlSurfaceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("spark.sql works over registered fixture tables") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val top = spark.sql(
      """SELECT n_name AS nation_name,
        |       SUM(CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)) AS revenue_cents
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY revenue_cents DESC, nation_name LIMIT 5""".stripMargin)
    assert(top.count() == 5)
    // must agree with the DataFrame-API version of the same query
    val api = graft.queries.Parity.q4TopK(spark, "/root/testdata/sf0.001")
    assert(top.collect().toSeq == api.collect().toSeq)
  }

  test("graft_proctime(): per-record processing time, never constant-folded") {
    graft.functions.GraftFunctions.register(spark)
    val before = System.currentTimeMillis() * 1000L
    val got = spark.sql(
      "SELECT id, unix_micros(graft_proctime()) AS pt FROM range(0, 100)")
      .collect().map(_.getLong(1))
    val after = System.currentTimeMillis() * 1000L
    assert(got.forall(pt => pt >= before && pt <= after),
      "each row samples the wall clock at evaluation time")
    // nondeterministic contract: the optimizer must NOT fold it into a
    // query-constant literal (that would be current_timestamp semantics,
    // the documented divergence this expression exists to close)
    val plan = spark.sql("SELECT graft_proctime() FROM range(0, 1)")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_proctime"),
      s"must survive optimization as a per-row call:\n$plan")
  }

  test("the reference's `t$$snapshots` spelling resolves through backticks") {
    val dir = Files.createTempDirectory("graft-dollar").toString
    val t = TieredTable(spark, s"$dir/t")
    t.commitAppend(Seq(1L, 2L).toDF("id"))
    graft.plans.TieredCatalog.register("demo", "dollar", s"$dir/t")
    // README.md:275 verbatim shape (modulo catalog prefix): the `$`
    // suffix needs backticks in Spark identifiers; the `__snapshots`
    // twin stays for bare-identifier use
    val viaDollar = spark.sql(
      "SELECT snapshot_id, operation FROM graft.demo.`dollar$snapshots`")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaDollar == Seq((1L, "append")))
    assert(spark.sql("SELECT COUNT(*) FROM graft.demo.`dollar$cold`")
      .head().getLong(0) == 2L)
  }

  test("CREATE TABLE ... 'change-data-feed' publishes change files on tier") {
    spark.sql("DROP TABLE IF EXISTS graft.wf.cdf_sql")
    val leftover = java.nio.file.Paths.get(
      graft.plans.TieredCatalog.warehouse, "wf", "cdf_sql")
    if (Files.exists(leftover)) {
      val s = Files.walk(leftover)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(Files.deleteIfExists(_))
      finally s.close()
    }
    spark.sql(
      """CREATE TABLE graft.wf.cdf_sql (id BIGINT, v STRING)
        |TBLPROPERTIES('change-data-feed'='true')""".stripMargin)
    spark.sql("INSERT INTO graft.wf.cdf_sql VALUES (1, 'a'), (2, 'b')")
    // SQL INSERT lands in the hot log; the changelog follows the COLD
    // tier, so the change file appears at the tiering commit
    val e = graft.plans.TieredCatalog.lookup("wf", "cdf_sql").get
    TieredTable(spark, e.path, changeDataFeed = true).tier()
    val ops = spark.read.parquet(s"${e.path}/changes/snap-000001")
      .select("op").as[String].distinct().collect().toSeq
    assert(ops == Seq("+I"))
    // the property round-trips through SHOW CREATE TABLE
    val ddl = spark.sql("SHOW CREATE TABLE graft.wf.cdf_sql")
      .head().getString(0)
    assert(ddl.contains("change-data-feed"), ddl)
    spark.sql("DROP TABLE graft.wf.cdf_sql")
  }

  test("tiered table registers union/cold/snapshots views like the reference") {
    val dir = Files.createTempDirectory("graft-sql").toString
    val t = TieredTable(spark, s"$dir/t")
    t.appendLog(Seq(1L, 2L).toDF("id")); t.tier()
    t.appendLog(Seq(3L).toDF("id")) // hot tail
    t.createOrReplaceViews("orders_tiered")
    assert(spark.sql("SELECT COUNT(*) FROM orders_tiered").head().getLong(0) == 3)
    assert(spark.sql("SELECT COUNT(*) FROM orders_tiered__cold").head().getLong(0) == 2)
    val snaps = spark.sql(
      "SELECT snapshot_id, operation FROM orders_tiered__snapshots ORDER BY snapshot_id")
    assert(snaps.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("graft_changes TVF: the CDC changelog is queryable SQL") {
    val dir = Files.createTempDirectory("graft-tvf").toString
    val t = TieredTable(spark, s"$dir/t", pk = Seq("k"))
    t.commitUpsert(Seq((1, "a"), (2, "b")).toDF("k", "v")) // snap 1
    t.commitUpsert(Seq((2, "b2"), (3, "c")).toDF("k", "v")) // snap 2
    graft.plans.TieredCatalog.register("tvf", "kv", s"$dir/t", pk = Seq("k"))
    val got = spark.sql(
      """SELECT op, count(*) AS n, sum(k) AS key_sum
        |FROM graft_changes('tvf.kv', 1, 2)
        |GROUP BY op ORDER BY op""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("+I", 1L, 3L), ("+U", 1L, 2L), ("-U", 1L, 2L)))
    // the spliced plan is ordinary Catalyst: filters/projections compose
    assert(spark.sql(
      "SELECT v FROM graft_changes('tvf.kv', 1, 2) WHERE op = '+I'")
      .collect().map(_.getString(0)).toSeq == Seq("c"))
    // keyless tables name their key columns in the fourth argument
    val ta = TieredTable(spark, s"$dir/a")
    ta.appendLog(Seq(10L).toDF("id")); ta.tier()
    ta.appendLog(Seq(20L).toDF("id")); ta.tier()
    graft.plans.TieredCatalog.register("tvf", "applog", s"$dir/a")
    assert(spark.sql(
      "SELECT id, op FROM graft_changes('tvf.applog', 1, 2, 'id')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((20L, "+I")))
    // errors are loud and named: no key columns / unknown table
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft_changes('tvf.applog', 1, 2)").collect()
    }
    assert(e1.getMessage.contains("no primary key"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft_changes('tvf.nope', 1, 2)").collect()
    }
    assert(e2.getMessage.contains("unknown graft table"))
  }

  test("CREATE MATERIALIZED VIEW drives a continuous MV from pure SQL, exactly-once across restart") {
    val dir = Files.createTempDirectory("graft-mv-sql").toString
    val src = TieredTable(spark, s"$dir/src", changeDataFeed = true)
    graft.plans.TieredCatalog.register("mvdb", "src", s"$dir/src",
      changeDataFeed = true)
    src.commitAppend(Seq(("a", 10L), ("b", 20L), ("a", 5L)).toDF("k", "v"))

    spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.mvdb.rev
         |OPTIONS('path'='$dir/rev', 'checkpoint'='$dir/ckpt', 'interval'='100')
         |AS SELECT k, SUM(v) AS sum_v, COUNT(*) AS cnt
         |FROM graft.mvdb.src GROUP BY k""".stripMargin)
    val q1 = graft.plans.MaterializedViewSql.query("mvdb", "rev").get
    q1.processAllAvailable()
    def viewRows(): Set[(String, Long, Long)] =
      spark.sql("SELECT k, sum_v, cnt FROM graft.mvdb.rev")
        .as[(String, Long, Long)].collect().toSet
    assert(viewRows() == Set(("a", 15L, 2L), ("b", 20L, 1L)))

    // the view keeps following the source while running
    src.commitAppend(Seq(("b", 7L), ("c", 1L)).toDF("k", "v"))
    q1.processAllAvailable()
    assert(viewRows() == Set(("a", 15L, 2L), ("b", 27L, 2L), ("c", 1L, 1L)))

    // RESTART: drop (stream stops, state files stay), commit while the
    // maintainer is down, re-create on the same path/checkpoint — the
    // Spark checkpoint resumes the cursor and batch tags make any WAL
    // replay a no-op: totals reflect every source row exactly once
    spark.sql("DROP MATERIALIZED VIEW graft.mvdb.rev")
    assert(graft.plans.MaterializedViewSql.query("mvdb", "rev").isEmpty)
    src.commitAppend(Seq(("a", 100L)).toDF("k", "v"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.mvdb.rev
         |OPTIONS('path'='$dir/rev', 'checkpoint'='$dir/ckpt', 'interval'='100')
         |AS SELECT k, SUM(v) AS sum_v, COUNT(*) AS cnt
         |FROM graft.mvdb.src GROUP BY k""".stripMargin)
    val q2 = graft.plans.MaterializedViewSql.query("mvdb", "rev").get
    q2.processAllAvailable()
    assert(viewRows() ==
      Set(("a", 115L, 3L), ("b", 27L, 2L), ("c", 1L, 1L)),
      "restart must resume the checkpoint cursor — no loss, no double count")
    spark.sql("DROP MATERIALIZED VIEW graft.mvdb.rev")

    // multiple SUM columns ride the same maintenance step
    val multiSrc = TieredTable(spark, s"$dir/msrc", changeDataFeed = true)
    graft.plans.TieredCatalog.register("mvdb", "msrc", s"$dir/msrc",
      changeDataFeed = true)
    multiSrc.commitAppend(Seq(("a", 10L, 1L), ("a", 5L, 2L), ("b", 3L, 4L))
      .toDF("k", "v", "w"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.mvdb.multi
         |OPTIONS('path'='$dir/multi', 'checkpoint'='$dir/mckpt')
         |AS SELECT k, SUM(v) AS sum_v, SUM(w) AS sum_w, COUNT(*) AS cnt
         |FROM graft.mvdb.msrc GROUP BY k""".stripMargin)
    graft.plans.MaterializedViewSql.query("mvdb", "multi").get
      .processAllAvailable()
    assert(spark.sql("SELECT k, sum_v, sum_w, cnt FROM graft.mvdb.multi")
      .as[(String, Long, Long, Long)].collect().toSet ==
      Set(("a", 15L, 3L, 2L), ("b", 3L, 4L, 1L)))
    spark.sql("DROP MATERIALIZED VIEW graft.mvdb.multi")

    // unsupported shapes are refused at CREATE time, loudly
    val e1 = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvdb.bad AS
        |SELECT k, collect_list(v) AS a, COUNT(*) AS cnt
        |FROM graft.mvdb.src GROUP BY k""".stripMargin))
    assert(e1.getMessage.contains("unsupported select item"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvdb.bad AS
        |SELECT k, SUM(v) AS s, COUNT(*) AS c
        |FROM graft.mvdb.nosuch GROUP BY k""".stripMargin))
    assert(e2.getMessage.contains("unknown source table"))

    // OPTIONS refuse loudly: a malformed pair (unquoted keys) or an
    // unknown key must not silently repoint state/checkpoint
    val e3 = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.mvdb.bad
         |OPTIONS(path='$dir/x') AS
         |SELECT k, SUM(v) AS s, COUNT(*) AS c
         |FROM graft.mvdb.src GROUP BY k""".stripMargin))
    assert(e3.getMessage.contains("malformed OPTIONS"), e3.getMessage)
    val e4 = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.mvdb.bad
         |OPTIONS('chekpoint'='$dir/c') AS
         |SELECT k, SUM(v) AS s, COUNT(*) AS c
         |FROM graft.mvdb.src GROUP BY k""".stripMargin))
    assert(e4.getMessage.contains("unknown option"), e4.getMessage)
  }

  test("MV with MIN/MAX/AVG: retraction-correct bounds from pure SQL") {
    val dir = Files.createTempDirectory("graft-mv-minmax").toString
    // PK source: upserts and deletes produce -U/-D retractions in the
    // change feed — the case where MIN/MAX need the dirty-group repair
    val src = TieredTable(spark, s"$dir/src", pk = Seq("id"),
      changeDataFeed = true)
    graft.plans.TieredCatalog.register("mvdb", "msrc2", s"$dir/src",
      pk = Seq("id"), changeDataFeed = true)
    src.commitUpsert(Seq((1L, "a", 5L), (2L, "a", 9L), (3L, "b", 1L))
      .toDF("id", "k", "v"))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.mvdb.bounds
         |OPTIONS('path'='$dir/bounds', 'checkpoint'='$dir/bckpt')
         |AS SELECT k, SUM(v) AS sum_v, MIN(v) AS min_v, MAX(v) AS max_v,
         |          AVG(v) AS avg_v, COUNT(*) AS cnt
         |FROM graft.mvdb.msrc2 GROUP BY k""".stripMargin)
    val q = graft.plans.MaterializedViewSql.query("mvdb", "bounds").get
    q.processAllAvailable()
    def rows(): Set[(String, Long, Long, Long, Double, Long)] =
      spark.sql("""SELECT k, sum_v, min_v, max_v, avg_v, cnt
                  |FROM graft.mvdb.bounds""".stripMargin)
        .as[(String, Long, Long, Long, Double, Long)].collect().toSet
    assert(rows() == Set(("a", 14L, 5L, 9L, 7.0, 2L), ("b", 1L, 1L, 1L, 1.0, 1L)))

    // delete group a's current minimum — the maintained min must
    // repair to the runner-up (9), not stick at 5
    src.deleteWhere($"id" === 1L)
    q.processAllAvailable()
    assert(rows() == Set(("a", 9L, 9L, 9L, 9.0, 1L), ("b", 1L, 1L, 1L, 1.0, 1L)))

    // an upsert that LOWERS an existing key's value retracts the old
    // max: 9 -> 2 makes a's max repair downward through the same path
    src.commitUpsert(Seq((2L, "a", 2L)).toDF("id", "k", "v"))
    q.processAllAvailable()
    assert(rows() == Set(("a", 2L, 2L, 2L, 2.0, 1L), ("b", 1L, 1L, 1L, 1.0, 1L)))
    spark.sql("DROP MATERIALIZED VIEW graft.mvdb.bounds")
  }

  test("FOR SYSTEM_TIME AS OF temporal join parses and joins the current snapshot") {
    // The reference's enrichment query (README.md:222-239): orders
    // stream ⟕ customer FOR SYSTEM_TIME AS OF o.proctime ⟕ nation —
    // replayed as SQL. In batch over the snapshot-isolated catalog the
    // clause resolves to the dims' current committed snapshot.
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft-tj").toString
    graft.plans.TieredCatalog.register("tj", "customer", s"$dir/customer",
      pk = Seq("c_custkey"))
    graft.plans.TieredCatalog.register("tj", "nation", s"$dir/nation",
      pk = Seq("n_nationkey"))
    TieredTable(spark, s"$dir/customer", pk = Seq("c_custkey"))
      .commitUpsert(spark.table("customer"))
    TieredTable(spark, s"$dir/nation", pk = Seq("n_nationkey"))
      .commitUpsert(spark.table("nation"))

    val sqlRes = spark.sql(
      """SELECT o.o_orderkey, c.c_name, n.n_name
        |FROM orders o
        |LEFT JOIN graft.tj.customer FOR SYSTEM_TIME AS OF o.proctime AS c
        |  ON o.o_custkey = c.c_custkey
        |LEFT JOIN graft.tj.nation FOR SYSTEM_TIME AS OF o.proctime AS n
        |  ON c.c_nationkey = n.n_nationkey""".stripMargin)
    // must agree with the DataFrame lookup-join operator on the same dims
    val api = graft.operators.Enrich.lookupJoin2(
        spark.table("orders")
          .withColumn("c_custkey", org.apache.spark.sql.functions.col("o_custkey")),
        spark.table("customer"), "c_custkey",
        spark.table("nation").withColumnRenamed("n_nationkey", "c_nationkey"),
        "c_nationkey")
    assert(sqlRes.count() == spark.table("orders").count())
    val sqlSorted = sqlRes.orderBy("o_orderkey").collect().toSeq
    val apiSorted = api.select("o_orderkey", "c_name", "n_name")
      .orderBy("o_orderkey").collect().toSeq
    assert(sqlSorted == apiSorted)
  }

  test("temporal-join rewrite never touches valid SQL; event-time AS OF errors") {
    import org.apache.spark.sql.functions.col
    // a string literal containing the clause text is data, not syntax —
    // it must survive verbatim (the rewrite only runs on parse failure)
    val lit = spark.sql(
      "SELECT 'replayed FOR SYSTEM_TIME AS OF proctime' AS s")
      .head().getString(0)
    assert(lit == "replayed FOR SYSTEM_TIME AS OF proctime")
    // an event-time attribute is out of scope: fail loudly, never
    // silently join the current snapshot
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    intercept[Exception] {
      spark.sql(
        """SELECT * FROM orders o
          |LEFT JOIN graft.tj.customer FOR SYSTEM_TIME AS OF o.o_orderdate AS c
          |  ON o.o_custkey = c.c_custkey""".stripMargin)
    }
  }

  test("SHOW CREATE TABLE renders round-trippable DDL incl. graft properties") {
    val dir = Files.createTempDirectory("graft-sct").toString
    // purge preamble: a crashed earlier run may have left a durable
    // descriptor for this fixed name in the shared warehouse
    spark.sql("DROP TABLE IF EXISTS graft.sct.t")
    spark.sql(
      s"""CREATE TABLE graft.sct.t (id BIGINT, name STRING, pri STRING)
         |PARTITIONED BY (pri)
         |TBLPROPERTIES ('primary-key'='id', 'bloom-columns'='name',
         |               'path'='$dir/t')""".stripMargin)
    val ddl = spark.sql("SHOW CREATE TABLE graft.sct.t").head().getString(0)
    // the rendered statement carries the full table definition
    assert(ddl.contains("CREATE TABLE graft.sct.t"), ddl)
    assert(ddl.contains("PARTITIONED BY (pri)"), ddl)
    assert(ddl.contains("primary-key") && ddl.contains("bloom-columns"), ddl)
    assert(ddl.contains("path"), ddl)
    // ROUND TRIP: a fresh catalog (registry dropped, durable descriptor
    // removed, files kept — e.g. attaching the table in a DIFFERENT
    // warehouse) rebuilt by executing the rendered DDL re-attaches an
    // equivalent table
    graft.plans.TieredCatalog.unregister("sct", "t")
    graft.plans.TieredCatalog.deletePersisted("sct", "t")
    spark.sql(ddl)
    val e = graft.plans.TieredCatalog.lookup("sct", "t").get
    assert(e.pk == Seq("id") && e.bloomCols == Seq("name") &&
      e.partitionBy == Seq("pri") && e.path == s"$dir/t")
    // and the re-attached table is fully usable (PK upsert semantics)
    spark.sql("INSERT INTO graft.sct.t VALUES (1, 'a', 'hi'), (2, 'b', 'lo')")
    spark.sql("INSERT INTO graft.sct.t VALUES (2, 'b2', 'lo')")
    val rows = spark.sql(
      "SELECT id, name FROM graft.sct.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b2")))
    spark.sql("DROP TABLE graft.sct.t")
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF read past snapshots") {
    val dir = Files.createTempDirectory("graft-tt-sql").toString
    val t = TieredTable(spark, s"$dir/t")
    graft.plans.TieredCatalog.register("ttsql", "t", s"$dir/t")
    t.appendLog(Seq(1L, 2L).toDF("id")); t.tier()
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    t.appendLog(Seq(3L).toDF("id")); t.tier()
    assert(spark.sql("SELECT COUNT(*) FROM graft.ttsql.t VERSION AS OF 1")
      .head().getLong(0) == 2)
    assert(spark.sql("SELECT COUNT(*) FROM graft.ttsql.t VERSION AS OF 2")
      .head().getLong(0) == 3)
    // session timezone is UTC, so a UTC wall string addresses the epoch
    val tsStr = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(afterV1))
    assert(spark.sql(
      s"SELECT COUNT(*) FROM graft.ttsql.t TIMESTAMP AS OF '$tsStr'")
      .head().getLong(0) == 2)
    // agreement across the three temporal surfaces
    assert(spark.sql("SELECT SUM(id) FROM graft.ttsql.t VERSION AS OF 1")
      .head().getLong(0) ==
      t.readColdAsOf(1L).agg(org.apache.spark.sql.functions.sum("id"))
        .head().getLong(0))
  }
}
