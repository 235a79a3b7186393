package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.plans.{FlinkDialect, FlinkScript, TemporalJoinParser, TieredCatalog}
import graft.sources.FakerSource

/** Units for the Flink-SQL dialect layer: faker generator compilation,
  * quoted SET, catalog verbs, Flink CREATE TABLE rewriting, and the
  * script splitter. The end-to-end walkthrough is
  * [[ReferenceScriptSpec]].
  */
class FlinkDialectSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("faker DDL: deterministic generators honor ranges, types, escapes") {
    spark.sql("""CREATE TEMPORARY TABLE faker_probe (
      |  `k` INT,
      |  `price` DECIMAL(15, 2),
      |  `d` DATE,
      |  `prio` STRING
      |) WITH (
      |  'connector' = 'faker',
      |  'number-of-rows' = '500',
      |  'fields.k.expression' = '#{number.numberBetween ''0'',''20''}',
      |  'fields.price.expression' = '#{number.randomDouble ''3'',''1'',''1000''}',
      |  'fields.d.expression' = '#{date.past ''100'' ''DAYS''}',
      |  'fields.prio.expression' = '#{regexify ''(low|medium|high){1}''}'
      |)""".stripMargin)
    val df = spark.sql("SELECT * FROM faker_probe")
    assert(df.count() == 500)
    val k = df.agg(min("k"), max("k")).head()
    assert(k.getInt(0) >= 0 && k.getInt(1) <= 19)
    val prios = df.select("prio").distinct().collect().map(_.getString(0)).toSet
    assert(prios.subsetOf(Set("low", "medium", "high")) && prios.size == 3)
    val price = df.agg(min("price"), max("price")).head()
    assert(price.getDecimal(0).doubleValue >= 1.0 &&
      price.getDecimal(1).doubleValue < 1000.0)
    import java.sql.Date
    val d = df.agg(min("d"), max("d")).head()
    assert(!d.getAs[Date](0).before(Date.valueOf("2026-04-23")) &&
      !d.getAs[Date](1).after(Date.valueOf("2026-08-01")))
    // deterministic: a second read is bit-identical
    assert(df.orderBy("k", "price").collect().toSeq ==
      spark.sql("SELECT * FROM faker_probe").orderBy("k", "price")
        .collect().toSeq)
    // SHOW CREATE TABLE echoes the original DDL
    val ddl = spark.sql("SHOW CREATE TABLE faker_probe").head().getString(0)
    assert(ddl.contains("'connector' = 'faker'"))
    spark.catalog.dropTempView("faker_probe")
    FakerSource.unregister("faker_probe")
  }

  test("faker DDL: null-rate, unknown provider, non-faker connector") {
    spark.sql("""CREATE TEMPORARY TABLE faker_nulls (`k` INT) WITH (
      |  'connector' = 'faker', 'number-of-rows' = '1000',
      |  'fields.k.expression' = '#{number.numberBetween ''0'',''5''}',
      |  'fields.k.null-rate' = '0.2'
      |)""".stripMargin)
    val nulls = spark.sql("SELECT * FROM faker_nulls")
      .filter(col("k").isNull).count()
    assert(nulls > 120 && nulls < 280, s"~20% nulls expected, got $nulls")
    spark.catalog.dropTempView("faker_nulls")
    FakerSource.unregister("faker_nulls")

    val e1 = intercept[Exception](spark.sql(
      """CREATE TEMPORARY TABLE f_bad (`k` INT) WITH (
        |'connector' = 'faker', 'number-of-rows' = '1',
        |'fields.k.expression' = '#{chuck.fact}')""".stripMargin))
    assert(e1.getMessage.contains("not supported"))
    val e2 = intercept[Exception](spark.sql(
      """CREATE TEMPORARY TABLE f_kafka (`k` INT) WITH (
        |'connector' = 'kafka')""".stripMargin))
    assert(e2.getMessage.contains("faker"))
  }

  test("Flink quoted SET lands in session conf") {
    spark.sql("SET 'table.exec.sink.not-null-enforcer'='DROP'")
    assert(FlinkDialect.notNullEnforcer(spark) == "DROP")
    spark.sql("SET 'table.exec.sink.not-null-enforcer'='ERROR'")
    assert(FlinkDialect.notNullEnforcer(spark) == "ERROR")
    assert(!FlinkDialect.streamingMode(spark))
    spark.sql("SET 'execution.runtime-mode' = 'streaming'")
    assert(FlinkDialect.streamingMode(spark))
    spark.sql("SET 'execution.runtime-mode' = 'batch'")
    assert(!FlinkDialect.streamingMode(spark))
  }

  test("Flink CREATE TABLE: PK NOT ENFORCED, WITH props, PROCTIME, LTZ") {
    val dir = Files.createTempDirectory("graft-flinkddl").toString
    spark.sql("DROP TABLE IF EXISTS graft.fd.lake_t")
    spark.sql(s"""CREATE TABLE graft.fd.lake_t (
      |  `id` INT NOT NULL,
      |  `name` STRING,
      |  `ts` TIMESTAMP_LTZ,
      |  `pt` AS PROCTIME(),
      |  PRIMARY KEY (`id`) NOT ENFORCED
      |) WITH (
      |  'table.datalake.enabled' = 'true',
      |  'table.datalake.freshness' = '30s',
      |  'path' = '$dir/lake_t'
      |)""".stripMargin)
    val e = TieredCatalog.lookup("fd", "lake_t").get
    assert(e.pk == Seq("id") && e.datalake)
    val schema = spark.table("graft.fd.lake_t").schema
    assert(schema.fieldNames.toSeq == Seq("id", "name", "ts"))
    assert(schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(FlinkDialect.isProctime("pt") && FlinkDialect.isProctime("PT"))
    // the declared proctime attribute is accepted in FOR SYSTEM_TIME
    val sqlText = "SELECT * FROM a o LEFT JOIN b FOR SYSTEM_TIME AS OF " +
      "o.pt AS c ON o.id = c.id"
    assert(TemporalJoinParser.rewrite(sqlText) ==
      "SELECT * FROM a o LEFT JOIN b AS c ON o.id = c.id")
    // an undeclared column is NOT a proctime — the clause survives and
    // fails loudly downstream instead of silently joining the snapshot
    val ev = "SELECT * FROM a o LEFT JOIN b FOR SYSTEM_TIME AS OF " +
      "o.event_ts AS c ON o.id = c.id"
    assert(TemporalJoinParser.rewrite(ev) == ev)
    spark.sql("DROP TABLE graft.fd.lake_t")
    // DROP TABLE unregisters the declaration: the same AS OF x.pt no
    // longer collapses — once `lake_t` is gone there is no live table
    // for which `pt` means processing time (r8 advice: the old
    // process-global set silently snapshot-joined event-time columns
    // of unrelated tables forever)
    assert(!FlinkDialect.isProctime("pt"),
      "DROP TABLE must unregister its proctime columns")
    assert(TemporalJoinParser.rewrite(sqlText) == sqlText,
      "after DROP, the clause must survive and fail loudly downstream")
  }

  test("AS OF qualifier resolution: a table that declares its OWN " +
       "proctime is a provable non-match for other attributes") {
    FlinkDialect.registerProctime("dims", "ts")
    FlinkDialect.registerProctime("orders", "otime")
    try {
      // o binds `orders`, which declares otime (not ts) as proctime —
      // `o.ts` is provably NOT a processing-time attribute of orders
      // even though `dims` declares a ts proctime: the clause survives
      val ev = "SELECT * FROM orders o LEFT JOIN dims FOR SYSTEM_TIME " +
        "AS OF o.ts AS d ON o.id = d.id"
      assert(TemporalJoinParser.rewrite(ev) == ev,
        "an event-time ts of a proctime-declaring table must not collapse")
      // the declaring table's own attribute still collapses
      val ok = "SELECT * FROM orders o LEFT JOIN dims FOR SYSTEM_TIME " +
        "AS OF o.otime AS d ON o.id = d.id"
      assert(TemporalJoinParser.rewrite(ok) ==
        "SELECT * FROM orders o LEFT JOIN dims AS d ON o.id = d.id")
      // unresolvable qualifier (subquery alias) falls back to the
      // any-live-table check
      val sub = "SELECT * FROM (SELECT * FROM x) q LEFT JOIN dims " +
        "FOR SYSTEM_TIME AS OF q.ts AS d ON q.id = d.id"
      assert(TemporalJoinParser.rewrite(sub) ==
        "SELECT * FROM (SELECT * FROM x) q LEFT JOIN dims AS d ON q.id = d.id")
    } finally {
      FlinkDialect.unregisterProctime("dims")
      FlinkDialect.unregisterProctime("orders")
    }
  }

  test("script splitter: statement-set blocks, comments, quoted ';'") {
    val script =
      """-- a comment; with a semicolon
        |SET 'a'='b';
        |EXECUTE STATEMENT SET
        |BEGIN
        |  INSERT INTO x SELECT * FROM a;
        |  INSERT INTO y SELECT ';' FROM b;
        |END;
        |SELECT 1;
        |""".stripMargin
    val stmts = FlinkScript.split(script)
    assert(stmts.size == 3, stmts.mkString("\n---\n"))
    assert(stmts(0) == "SET 'a'='b'")
    assert(stmts(1).startsWith("EXECUTE STATEMENT SET") &&
      stmts(1).trim.endsWith("END"))
    assert(stmts(2) == "SELECT 1")
  }

  test("unbounded faker source runs as a continuous rate stream") {
    val dir = Files.createTempDirectory("graft-fkstream").toString
    spark.sql("""CREATE TEMPORARY TABLE ticker (`v` BIGINT) WITH (
      |  'connector' = 'faker', 'rows-per-second' = '500',
      |  'fields.v.expression' = '#{number.numberBetween ''0'',''100''}'
      |)""".stripMargin)
    spark.sql("DROP TABLE IF EXISTS graft.fk.tick_sink")
    spark.sql(s"""CREATE TABLE graft.fk.tick_sink (`v` BIGINT)
      |TBLPROPERTIES ('path' = '$dir/tick_sink')""".stripMargin)
    try {
      spark.sql(
        s"""EXECUTE STATEMENT SET WITH('checkpoint'='$dir/ckpt',
           |'interval'='100') BEGIN
           |  INSERT INTO graft.fk.tick_sink SELECT * FROM ticker;
           |END""".stripMargin)
      val q = graft.plans.StreamingInsertSql.query("fk", "tick_sink").get
      val sink = graft.storage.TieredTable(spark, s"$dir/tick_sink")
      val deadline = System.currentTimeMillis() + 30000
      def rows(): Long =
        try sink.readUnion().count()
        catch { case _: IllegalStateException => 0L }
      while (rows() == 0L && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(rows() > 0L, "rate-streamed faker rows reach the sink")
      assert(q.isActive, "an unbounded faker INSERT keeps running")
      val range = spark.sql(
        "SELECT MIN(v), MAX(v) FROM graft.fk.tick_sink").head()
      assert(range.getLong(0) >= 0 && range.getLong(1) <= 99)
    } finally {
      spark.sql("STOP STREAMING INSERT INTO graft.fk.tick_sink")
      spark.sql("DROP TABLE graft.fk.tick_sink")
      spark.catalog.dropTempView("ticker")
      FakerSource.unregister("ticker")
    }
  }

  test("sink NOT NULL policy: ERROR raises, DROP filters, PK implied") {
    val dir = Files.createTempDirectory("graft-nn").toString
    spark.sql("""CREATE TEMPORARY TABLE nullable_src (`k` BIGINT) WITH (
      |  'connector' = 'faker', 'number-of-rows' = '100',
      |  'fields.k.expression' = '#{number.numberBetween ''0'',''10''}',
      |  'fields.k.null-rate' = '0.3'
      |)""".stripMargin)
    spark.sql("DROP TABLE IF EXISTS graft.fk.nn_sink")
    spark.sql(s"""CREATE TABLE graft.fk.nn_sink (`k` BIGINT NOT NULL)
      |TBLPROPERTIES ('path' = '$dir/nn_sink')""".stripMargin)
    try {
      // ERROR (the Flink default, conf unset → ERROR) raises on the
      // first violating row
      spark.sql("SET 'table.exec.sink.not-null-enforcer'='ERROR'")
      val e = intercept[Exception](spark.sql(
        """EXECUTE STATEMENT SET BEGIN
          |  INSERT INTO graft.fk.nn_sink SELECT * FROM nullable_src;
          |END""".stripMargin))
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: messages(t.getCause)
      assert(messages(e).exists(m => m != null && m.contains("NOT NULL")),
        messages(e).mkString("\n"))

      // DROP filters the violating rows; survivors land
      spark.sql("SET 'table.exec.sink.not-null-enforcer'='DROP'")
      spark.sql(
        """EXECUTE STATEMENT SET BEGIN
          |  INSERT INTO graft.fk.nn_sink SELECT * FROM nullable_src;
          |END""".stripMargin)
      val expected = FakerSource.lookup("nullable_src").get
        .bounded(spark).filter(col("k").isNotNull).count()
      assert(expected > 0 && expected < 100)
      assert(spark.sql("SELECT COUNT(*) FROM graft.fk.nn_sink")
        .head().getLong(0) == expected)
    } finally {
      spark.sql("SET 'table.exec.sink.not-null-enforcer'='ERROR'")
      spark.sql("DROP TABLE graft.fk.nn_sink")
      spark.catalog.dropTempView("nullable_src")
      FakerSource.unregister("nullable_src")
    }
  }

  test("WATERMARK FOR DDL: the declared event-time contract drives " +
       "windowed streaming inserts") {
    val dir = Files.createTempDirectory("graft-wmddl").toString
    spark.sql("DROP TABLE IF EXISTS graft.fk.ev_src")
    spark.sql(s"""CREATE TABLE graft.fk.ev_src (
      |  `ts` TIMESTAMP_LTZ,
      |  `v` BIGINT,
      |  WATERMARK FOR `ts` AS `ts` - INTERVAL '0' SECOND
      |) WITH ('path' = '$dir/ev_src')""".stripMargin)
    assert(TieredCatalog.lookup("fk", "ev_src").get.watermark ==
      Some("ts:0 seconds"))
    // the declaration round-trips through SHOW CREATE TABLE
    assert(spark.sql("SHOW CREATE TABLE graft.fk.ev_src").head()
      .getString(0).contains("'watermark' = 'ts:0 seconds'"))
    spark.sql("DROP TABLE IF EXISTS graft.fk.ev_sink")
    spark.sql(s"""CREATE TABLE graft.fk.ev_sink (`ws` TIMESTAMP, `n` BIGINT)
      |TBLPROPERTIES ('path' = '$dir/ev_sink')""".stripMargin)
    val src = graft.storage.TieredTable(spark, s"$dir/ev_src")
    src.appendLog(Seq((1L, 10L), (3L, 30L), (25L, 5L)).toDF("sec", "v")
      .selectExpr("timestamp_seconds(sec) AS ts", "v"))
    try {
      // NO WITH('watermark') — the sink is keyless, so this only
      // starts because the SOURCE declares the event-time contract
      spark.sql(
        s"""EXECUTE STATEMENT SET
           |WITH('checkpoint'='$dir/ckpt', 'interval'='100')
           |BEGIN
           |  INSERT INTO graft.fk.ev_sink
           |    SELECT window.start AS ws, COUNT(*) AS n
           |    FROM graft.fk.ev_src GROUP BY window(ts, '10 seconds');
           |END""".stripMargin)
      val q = graft.plans.StreamingInsertSql.query("fk", "ev_sink").get
      q.processAllAvailable()
      // watermark reached 25s → window [0,10) finalized with 2 rows
      assert(spark.sql(
        "SELECT unix_timestamp(ws), n FROM graft.fk.ev_sink")
        .as[(Long, Long)].collect().toSeq == Seq((0L, 2L)))
    } finally {
      spark.sql("STOP STREAMING INSERT graft.fk.ev_sink")
      spark.sql("DROP TABLE graft.fk.ev_src")
      spark.sql("DROP TABLE graft.fk.ev_sink")
    }
  }

  test("INSERT OVERWRITE: Flink's batch replace verb, hot-tail guarded") {
    val dir = Files.createTempDirectory("graft-ow").toString
    spark.sql("DROP TABLE IF EXISTS graft.fk.ow_log")
    spark.sql(s"""CREATE TABLE graft.fk.ow_log (`k` BIGINT, `v` STRING)
      |TBLPROPERTIES ('path' = '$dir/ow_log')""".stripMargin)
    try {
      spark.sql("INSERT INTO graft.fk.ow_log SELECT * FROM VALUES " +
        "(1L, 'a'), (2L, 'b') AS t(k, v)")
      // the INSERT landed in the hot log — an overwrite would be
      // silently resurrected by the un-tiered tail, so it refuses
      val e = intercept[Exception](spark.sql(
        "INSERT OVERWRITE graft.fk.ow_log SELECT * FROM VALUES " +
          "(9L, 'z') AS t(k, v)"))
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: messages(t.getCause)
      assert(messages(e).exists(m => m != null && m.contains("un-tiered")),
        messages(e).mkString("\n"))
      spark.sql("CALL graft.system.tier('fk.ow_log')")
      spark.sql("INSERT OVERWRITE graft.fk.ow_log SELECT * FROM VALUES " +
        "(9L, 'z') AS t(k, v)")
      assert(spark.sql("SELECT k, v FROM graft.fk.ow_log")
        .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
      // history keeps the pre-overwrite snapshot time-travelable
      val snaps = spark.sql(
        """SELECT snapshot_id, operation FROM `graft`.`fk`.`ow_log$snapshots`
          |ORDER BY snapshot_id""".stripMargin)
        .as[(Long, String)].collect().toSeq
      assert(snaps.map(_._2) == Seq("tier", "overwrite"), snaps.toString)
      assert(spark.sql(
        s"SELECT COUNT(*) FROM graft.fk.ow_log VERSION AS OF ${snaps.head._1}")
        .head().getLong(0) == 2L)

      // PK sink: overwrite applies last-write-wins within the batch
      spark.sql("DROP TABLE IF EXISTS graft.fk.ow_pk")
    spark.sql(s"""CREATE TABLE graft.fk.ow_pk (`k` BIGINT NOT NULL,
        |`v` STRING, PRIMARY KEY (`k`) NOT ENFORCED)
        |WITH ('path' = '$dir/ow_pk')""".stripMargin)
      spark.sql("INSERT INTO graft.fk.ow_pk SELECT * FROM VALUES " +
        "(1L, 'old'), (2L, 'old') AS t(k, v)")
      spark.sql("INSERT OVERWRITE graft.fk.ow_pk SELECT * FROM VALUES " +
        "(5L, 'first'), (5L, 'last'), (6L, 'only') AS t(k, v)")
      assert(spark.sql("SELECT k, v FROM graft.fk.ow_pk ORDER BY k")
        .as[(Long, String)].collect().toSeq ==
        Seq((5L, "last"), (6L, "only")))
      spark.sql("DROP TABLE graft.fk.ow_pk")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft.fk.ow_log")
    }
  }

  test("CREATE CATALOG / USE CATALOG alias the graft catalog") {
    spark.sql("""CREATE CATALOG probe_catalog WITH (
      |  'type' = 'fluss', 'bootstrap.servers' = 'coordinator-server:9123'
      |)""".stripMargin)
    val before = spark.sessionState.catalogManager.currentCatalog.name
    try {
      spark.sql("USE CATALOG probe_catalog")
      assert(spark.sessionState.catalogManager.currentCatalog.name ==
        "probe_catalog")
      val dir = Files.createTempDirectory("graft-cat").toString
      spark.sql(s"""CREATE TABLE probe_t (`id` INT NOT NULL,
        |PRIMARY KEY (`id`) NOT ENFORCED) WITH ('path'='$dir/probe_t')
        |""".stripMargin)
      // unqualified name registered in the catalog's root namespace
      assert(TieredCatalog.lookup("", "probe_t").exists(_.pk == Seq("id")))
      val err = intercept[Exception](spark.sql("USE CATALOG nope_catalog"))
      assert(err.getMessage.contains("does not exist"))
      // DROP (not bare unregister): removes the durable-catalog
      // descriptor too, so suite re-runs can re-CREATE the name
      spark.sql("DROP TABLE probe_t")
      assert(TieredCatalog.lookup("", "probe_t").isEmpty)
    } finally {
      spark.sessionState.catalogManager.setCurrentCatalog(before)
      TieredCatalog.unregister("", "probe_t")
    }
  }
}
