package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{StreamingInsertSql, TieredCatalog}
import graft.storage.TieredTable

/** The reference's continuous SQL jobs (README.md:211-250) as pure SQL:
  * `EXECUTE STATEMENT SET BEGIN INSERT INTO … SELECT …; … END` starts
  * one continuous StreamingQuery per INSERT — chained enrich → revenue
  * topology, processing-time temporal dim joins, exactly-once across
  * STOP + re-EXECUTE on the same checkpoints.
  */
class StatementSetSqlSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("EXECUTE STATEMENT SET: the reference's chained enrich→revenue pipeline from pure SQL") {
    val dir = Files.createTempDirectory("graft-stmtset").toString
    val customer = TieredTable(spark, s"$dir/customer", pk = Seq("cust_key"))
    val nation = TieredTable(spark, s"$dir/nation", pk = Seq("nation_key"))
    val orders = TieredTable(spark, s"$dir/orders")
    TieredCatalog.register("ss", "customer", s"$dir/customer", pk = Seq("cust_key"))
    TieredCatalog.register("ss", "nation", s"$dir/nation", pk = Seq("nation_key"))
    TieredCatalog.register("ss", "orders", s"$dir/orders")
    customer.commitUpsert(Seq((1L, "alice", 10L), (2L, "bob", 20L))
      .toDF("cust_key", "name", "nation_key"))
    nation.commitUpsert(Seq((10L, "FRANCE"), (20L, "GERMANY"))
      .toDF("nation_key", "nation_name"))
    orders.appendLog(Seq((100L, 1L, 5.0), (101L, 2L, 7.0))
      .toDF("order_key", "cust_key", "total_price"))

    // chained sinks are DDL'd first — the declared schema lets the
    // downstream stream start against the still-empty upstream sink
    // (the reference CREATEs every table before EXECUTE, README.md:141-202)
    spark.sql("DROP TABLE IF EXISTS graft.ss.enriched")
    spark.sql("DROP TABLE IF EXISTS graft.ss.revenue")
    spark.sql(s"""CREATE TABLE graft.ss.enriched
      |  (order_key BIGINT, cust_key BIGINT, total_price DOUBLE,
      |   cust_name STRING, nation_name STRING)
      |  TBLPROPERTIES ('path' = '$dir/enriched')""".stripMargin)
    spark.sql(s"""CREATE TABLE graft.ss.revenue
      |  (nation_name STRING, revenue DOUBLE, cnt BIGINT)
      |  TBLPROPERTIES ('primary-key' = 'nation_name', 'path' = '$dir/revenue')""".stripMargin)

    val setSql =
      s"""EXECUTE STATEMENT SET
         |WITH('checkpoint'='$dir/ckpt', 'interval'='100')
         |BEGIN
         |  INSERT INTO graft.ss.enriched
         |    SELECT o.order_key, o.cust_key, o.total_price,
         |           c.name AS cust_name, n.nation_name
         |    FROM graft.ss.orders o
         |    LEFT JOIN graft.ss.customer FOR SYSTEM_TIME AS OF o.proctime AS c
         |      ON o.cust_key = c.cust_key
         |    LEFT JOIN graft.ss.nation FOR SYSTEM_TIME AS OF o.proctime AS n
         |      ON c.nation_key = n.nation_key;
         |  INSERT INTO graft.ss.revenue
         |    SELECT nation_name, SUM(total_price) AS revenue, COUNT(*) AS cnt
         |    FROM graft.ss.enriched GROUP BY nation_name;
         |END""".stripMargin
    spark.sql(setSql)
    val qEnrich = StreamingInsertSql.query("ss", "enriched").get
    val qRevenue = StreamingInsertSql.query("ss", "revenue").get

    def enrichedRows(): Set[(Long, String, String)] =
      spark.sql("SELECT order_key, cust_name, nation_name FROM graft.ss.enriched")
        .as[(Long, String, String)].collect().toSet
    def revenueRows(): Set[(String, Double, Long)] =
      spark.sql("SELECT nation_name, revenue, cnt FROM graft.ss.revenue")
        .as[(String, Double, Long)].collect().toSet

    qEnrich.processAllAvailable()
    qRevenue.processAllAvailable()
    assert(enrichedRows() == Set(
      (100L, "alice", "FRANCE"), (101L, "bob", "GERMANY")))
    assert(revenueRows() == Set(
      ("FRANCE", 5.0, 1L), ("GERMANY", 7.0, 1L)))

    // processing-time temporal join: the dim update is visible to the
    // NEXT batch; already-emitted rows never retract (README.md:236-238)
    customer.commitUpsert(Seq((1L, "alice", 20L))
      .toDF("cust_key", "name", "nation_key"))
    orders.appendLog(Seq((102L, 1L, 11.0))
      .toDF("order_key", "cust_key", "total_price"))
    qEnrich.processAllAvailable()
    qRevenue.processAllAvailable()
    assert(enrichedRows() == Set(
      (100L, "alice", "FRANCE"),       // emitted before the dim moved
      (101L, "bob", "GERMANY"),
      (102L, "alice", "GERMANY")))     // joined against the NEW dim state
    assert(revenueRows() == Set(
      ("FRANCE", 5.0, 1L), ("GERMANY", 18.0, 2L)))

    // exactly-once across restart: STOP both, append while down,
    // re-EXECUTE on the same checkpoints — cursors resume, batch tags
    // make any WAL replay a no-op
    spark.sql("STOP STREAMING INSERT INTO graft.ss.enriched")
    spark.sql("STOP STREAMING INSERT graft.ss.revenue")
    assert(StreamingInsertSql.query("ss", "enriched").isEmpty)
    orders.appendLog(Seq((103L, 2L, 3.0))
      .toDF("order_key", "cust_key", "total_price"))
    spark.sql(setSql)
    val q2e = StreamingInsertSql.query("ss", "enriched").get
    val q2r = StreamingInsertSql.query("ss", "revenue").get
    q2e.processAllAvailable()
    q2r.processAllAvailable()
    assert(enrichedRows().size == 4, "no loss, no double-append on restart")
    assert(revenueRows() == Set(
      ("FRANCE", 5.0, 1L), ("GERMANY", 21.0, 3L)))
    spark.sql("STOP STREAMING INSERT graft.ss.enriched")
    spark.sql("STOP STREAMING INSERT graft.ss.revenue")
    spark.sql("DROP TABLE graft.ss.enriched")
    spark.sql("DROP TABLE graft.ss.revenue")
  }

  test("statement-set statements may carry ';' inside string literals") {
    val dir = Files.createTempDirectory("graft-stmtsemi").toString
    val src = TieredTable(spark, s"$dir/src")
    TieredCatalog.register("ssq", "src", s"$dir/src")
    TieredCatalog.register("ssq", "out", s"$dir/out")
    src.appendLog(Seq(1L, 2L).toDF("id"))
    spark.sql(
      s"""EXECUTE STATEMENT SET WITH('checkpoint'='$dir/ckpt') BEGIN
         |  INSERT INTO graft.ssq.out
         |    SELECT id, ';' AS sep FROM graft.ssq.src;
         |END""".stripMargin)
    val q = StreamingInsertSql.query("ssq", "out").get
    q.processAllAvailable()
    assert(spark.sql("SELECT id, sep FROM graft.ssq.out")
      .as[(Long, String)].collect().toSet == Set((1L, ";"), (2L, ";")))
    spark.sql("STOP STREAMING INSERT graft.ssq.out")
  }

  test("statement-set statements may carry a SQL CASE … END expression " +
       "(the block closes only at the standalone END after the last ';')") {
    val dir = Files.createTempDirectory("graft-stmtcase").toString
    val src = TieredTable(spark, s"$dir/src")
    TieredCatalog.register("ssq", "csrc", s"$dir/src")
    TieredCatalog.register("ssq", "cout", s"$dir/out")
    src.appendLog(Seq(1L, 2L, 3L).toDF("id"))
    spark.sql(
      s"""EXECUTE STATEMENT SET WITH('checkpoint'='$dir/ckpt') BEGIN
         |  INSERT INTO graft.ssq.cout
         |    SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END
         |      AS parity
         |    FROM graft.ssq.csrc;
         |END""".stripMargin)
    val q = StreamingInsertSql.query("ssq", "cout").get
    q.processAllAvailable()
    assert(spark.sql("SELECT id, parity FROM graft.ssq.cout")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "odd"), (2L, "even"), (3L, "odd")))
    spark.sql("STOP STREAMING INSERT graft.ssq.cout")
  }

  test("DISTINCT body deduplicates ACROSS batches (streaming-agg lowering, not per-batch)") {
    val dir = Files.createTempDirectory("graft-stmtdist").toString
    val src = TieredTable(spark, s"$dir/src")
    val sink = TieredTable(spark, s"$dir/sink", pk = Seq("id"))
    TieredCatalog.register("sd", "src", s"$dir/src")
    TieredCatalog.register("sd", "sink", s"$dir/sink", pk = Seq("id"))
    src.appendLog(Seq(1L, 1L, 2L).toDF("id"))
    spark.sql(
      s"""EXECUTE STATEMENT SET WITH('checkpoint'='$dir/ckpt', 'interval'='100') BEGIN
         |  INSERT INTO graft.sd.sink SELECT DISTINCT id FROM graft.sd.src;
         |END""".stripMargin)
    val q = StreamingInsertSql.query("sd", "sink").get
    q.processAllAvailable()
    assert(spark.sql("SELECT id FROM graft.sd.sink")
      .as[Long].collect().toSet == Set(1L, 2L))
    // a duplicate arriving in a LATER batch is still a duplicate —
    // state lives in the Spark checkpoint, not the micro-batch
    src.appendLog(Seq(2L, 3L).toDF("id"))
    q.processAllAvailable()
    assert(spark.sql("SELECT id FROM graft.sd.sink")
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
    val n = sink.readUnion().count()
    assert(n == 3, s"PK sink must hold exactly the distinct ids, got $n")
    spark.sql("STOP STREAMING INSERT graft.sd.sink")
  }

  test("event-time hopping and session windows run through the same " +
       "streaming-aggregation lowering") {
    val dir = Files.createTempDirectory("graft-stmthop").toString
    val src = TieredTable(spark, s"$dir/src")
    TieredCatalog.register("hw", "src", s"$dir/src")
    def batch(rows: (Long, Long)*) = rows.toDF("sec", "v")
      .selectExpr("timestamp_seconds(sec) AS ts", "v")
    // rows at 1s, 7s (overlapping hops), 30s; session gap rows at 40s
    src.appendLog(batch((1L, 10L), (7L, 20L), (30L, 5L), (40L, 1L)))

    // HOPPING: 10s windows sliding by 5s — a row belongs to TWO
    // windows; finalized windows append once each
    val hopSink = TieredTable(spark, s"$dir/hop")
    TieredCatalog.register("hw", "hop", s"$dir/hop")
    spark.sql(
      s"""EXECUTE STATEMENT SET
         |WITH('checkpoint'='$dir/hopckpt', 'interval'='100',
         |     'watermark'='ts:0 seconds')
         |BEGIN
         |  INSERT INTO graft.hw.hop
         |    SELECT window.start AS ws, COUNT(*) AS n, SUM(v) AS sum_v
         |    FROM graft.hw.src
         |    GROUP BY window(ts, '10 seconds', '5 seconds');
         |END""".stripMargin)
    val hq = StreamingInsertSql.query("hw", "hop").get
    hq.processAllAvailable()
    // watermark reached 40s: every window before it finalized.
    // 1s ∈ [-5,5)+[0,10); 7s ∈ [0,10)+[5,15); 30s ∈ [25,35)+[30,40)
    val hop = spark.sql(
      "SELECT unix_timestamp(ws), n, sum_v FROM graft.hw.hop")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(hop == Seq((-5L, 1L, 10L), (0L, 2L, 30L), (5L, 1L, 20L),
      (25L, 1L, 5L), (30L, 1L, 5L)), hop.toString)
    spark.sql("STOP STREAMING INSERT graft.hw.hop")

    // SESSION windows, keyed per Spark's streaming contract (global
    // session aggregation is unsupported; APPEND mode only → keyless
    // sink): sessions per key, each emitted once when the watermark
    // passes its close. grp 0 holds 1s+7s (gap 6s → TWO sessions);
    // grp 1 holds 30s+40s — the 40s session stays open at watermark 40
    val sesSink = TieredTable(spark, s"$dir/ses")
    TieredCatalog.register("hw", "ses", s"$dir/ses")
    spark.sql(
      s"""EXECUTE STATEMENT SET
         |WITH('checkpoint'='$dir/sesckpt', 'interval'='100',
         |     'watermark'='ts:0 seconds')
         |BEGIN
         |  INSERT INTO graft.hw.ses
         |    SELECT session_window.start AS ss, grp, COUNT(*) AS n
         |    FROM (SELECT ts, v % 2 AS grp FROM graft.hw.src)
         |    GROUP BY grp, session_window(ts, '5 seconds');
         |END""".stripMargin)
    val sq = StreamingInsertSql.query("hw", "ses").get
    sq.processAllAvailable()
    val ses = spark.sql("SELECT unix_timestamp(ss), grp, n FROM graft.hw.ses")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(ses == Seq((1L, 0L, 1L), (7L, 0L, 1L), (30L, 1L, 1L)),
      ses.toString)
    spark.sql("STOP STREAMING INSERT graft.hw.ses")
  }

  test("event-time tumbling windows: WITH('watermark') + GROUP BY window " +
       "appends each finalized window exactly once") {
    val dir = Files.createTempDirectory("graft-stmtwin").toString
    val src = TieredTable(spark, s"$dir/src")
    val sink = TieredTable(spark, s"$dir/sink") // KEYLESS: append mode
    TieredCatalog.register("sw", "src", s"$dir/src")
    TieredCatalog.register("sw", "sink", s"$dir/sink")
    def batch(rows: (Long, Long)*) = rows.toDF("sec", "v")
      .selectExpr("timestamp_seconds(sec) AS ts", "v")
    // three rows in window [0,10), one at 25s (window [20,30))
    src.appendLog(batch((1L, 10L), (2L, 20L), (3L, 30L), (25L, 5L)))
    spark.sql(
      s"""EXECUTE STATEMENT SET
         |WITH('checkpoint'='$dir/ckpt', 'interval'='100',
         |     'watermark'='ts:0 seconds')
         |BEGIN
         |  INSERT INTO graft.sw.sink
         |    SELECT window.start AS ws, COUNT(*) AS n, SUM(v) AS sum_v
         |    FROM graft.sw.src GROUP BY window(ts, '10 seconds');
         |END""".stripMargin)
    val q = StreamingInsertSql.query("sw", "sink").get
    q.processAllAvailable()
    def rows(): Seq[(Long, Long, Long)] =
      spark.sql("SELECT unix_timestamp(ws), n, sum_v FROM graft.sw.sink")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // watermark reached 25s after the first batch → window [0,10)
    // finalized and emitted ONCE; [20,30) still open
    assert(rows() == Seq((0L, 3L, 60L)))
    // advancing event time past 30s closes [20,30); the earlier window
    // must NOT re-emit (append contract)
    src.appendLog(batch((45L, 1L)))
    q.processAllAvailable()
    assert(rows() == Seq((0L, 3L, 60L), (20L, 1L, 5L)))
    spark.sql("STOP STREAMING INSERT graft.sw.sink")

    // the same windowed body into a PK sink runs UPDATE mode: windows
    // surface immediately and refine in place, no watermark wait
    val usink = TieredTable(spark, s"$dir/usink", pk = Seq("ws"))
    TieredCatalog.register("sw", "usink", s"$dir/usink", pk = Seq("ws"))
    spark.sql(
      s"""EXECUTE STATEMENT SET
         |WITH('checkpoint'='$dir/uckpt', 'interval'='100',
         |     'watermark'='ts:0 seconds')
         |BEGIN
         |  INSERT INTO graft.sw.usink
         |    SELECT window.start AS ws, COUNT(*) AS n, SUM(v) AS sum_v
         |    FROM graft.sw.src GROUP BY window(ts, '10 seconds');
         |END""".stripMargin)
    val uq = StreamingInsertSql.query("sw", "usink").get
    uq.processAllAvailable()
    // every window visible, including ones the watermark has not
    // closed ([40,50)); counts are the full per-window aggregates
    assert(spark.sql("SELECT unix_timestamp(ws), n, sum_v FROM graft.sw.usink")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq ==
      Seq((0L, 3L, 60L), (20L, 1L, 5L), (40L, 1L, 1L)))
    spark.sql("STOP STREAMING INSERT graft.sw.usink")
  }

  test("remote-sink checkpoint keys are injective and die with the " +
       "table (r8 advice: sanitizer collisions + stale cursors)") {
    import graft.plans.StreamingInsertSql
    graft.storage.DemoObjectStore.withStore { fsUrl =>
      // the old lossy sanitizer mapped '/' and '_' to the same char —
      // these two DISTINCT bucket paths collided; the digest key must
      // separate them
      val a = s"$fsUrl/bkt/a_b/t"
      val b = s"$fsUrl/bkt/a/b_t"
      val ka = StreamingInsertSql.remoteCheckpointDir(a)
      val kb = StreamingInsertSql.remoteCheckpointDir(b)
      assert(ka != kb, s"distinct sink paths must not share a cursor: $ka")
      // stable across calls (same table → same cursor)…
      assert(StreamingInsertSql.remoteCheckpointDir(a) == ka)
      // …until the creation id goes away with the table directory:
      // a recreated table at the same path mints a NEW checkpoint, so
      // a restarted continuous INSERT can never resume a stale source
      // cursor and silently skip the new table's early rows
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(ka)) // simulate accumulated cursor state
      StreamingInsertSql.dropRemoteCheckpoint(a)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(ka)),
        "DROP must delete the engine-local checkpoint")
      graft.storage.TableFs.forPath(a).deleteFile(s"$a/meta/CREATION_ID")
      val ka2 = StreamingInsertSql.remoteCheckpointDir(a)
      assert(ka2 != ka, "a recreated table must mint a fresh checkpoint key")
    }
  }

  test("statement-set refusals are loud and named") {
    val dir = Files.createTempDirectory("graft-stmtbad").toString
    val src = TieredTable(spark, s"$dir/src")
    TieredCatalog.register("sb", "src", s"$dir/src")
    TieredCatalog.register("sb", "sink", s"$dir/sink")
    src.appendLog(Seq(1L).toDF("id"))
    def bad(sql: String): String =
      intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql))
        .getMessage

    assert(bad("EXECUTE STATEMENT SET BEGIN DELETE FROM graft.sb.src; END")
      .contains("only INSERT INTO"))
    assert(bad("EXECUTE STATEMENT SET BEGIN INSERT INTO graft.sb.nope SELECT id FROM graft.sb.src; END")
      .contains("unknown sink table"))
    assert(bad("EXECUTE STATEMENT SET BEGIN INSERT INTO graft.sb.sink SELECT id FROM graft.sb.ghost; END")
      .contains("unknown stream source"))
    assert(bad("EXECUTE STATEMENT SET BEGIN INSERT INTO graft.sb.src SELECT id FROM graft.sb.src; END")
      .contains("insert into itself"))
    // a grouped body emits an update changelog → PK sink required
    assert(bad("EXECUTE STATEMENT SET BEGIN INSERT INTO graft.sb.sink SELECT id, COUNT(*) AS c FROM graft.sb.src GROUP BY id; END")
      .contains("primary key"))
    assert(bad(
      """EXECUTE STATEMENT SET BEGIN
        |INSERT INTO graft.sb.sink SELECT id FROM graft.sb.src;
        |INSERT INTO graft.sb.sink SELECT id FROM graft.sb.src;
        |END""".stripMargin)
      .contains("one continuous writer per sink"))
    assert(bad("EXECUTE STATEMENT SET WITH(checkpoint='/x') BEGIN INSERT INTO graft.sb.sink SELECT id FROM graft.sb.src; END")
      .contains("malformed WITH"))
    assert(bad("EXECUTE STATEMENT SET WITH('chekpoint'='/x') BEGIN INSERT INTO graft.sb.sink SELECT id FROM graft.sb.src; END")
      .contains("unknown option"))
    assert(bad("EXECUTE STATEMENT SET WITH('watermark'='ts 10 seconds') BEGIN INSERT INTO graft.sb.sink SELECT id FROM graft.sb.src; END")
      .contains("<event-time column>:<delay>"))
    assert(bad("STOP STREAMING INSERT graft.sb.sink")
      .contains("no running continuous INSERT"))
    // the splice TVF is internal, not a user surface
    assert(bad("SELECT * FROM graft_stream_stmt(999999)")
      .contains("not a user TVF"))
  }
}
