package graft.plans

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.storage.TieredTable
import graft.streaming.StatementSet

/** The reference's continuous `INSERT INTO … SELECT` jobs as SQL —
  * Flink's `EXECUTE STATEMENT SET` verb verbatim
  * (/root/reference/README.md:211-250):
  *
  * {{{
  * EXECUTE STATEMENT SET
  * [WITH('checkpoint'='<dir>', 'interval'='<ms>',
  *       'watermark'='<event-time col>:<delay>')]
  * BEGIN
  *   INSERT INTO graft.db.enriched
  *     SELECT o.order_key, …, c.name AS cust_name
  *     FROM graft.db.orders o
  *     LEFT JOIN graft.db.customer FOR SYSTEM_TIME AS OF o.proctime AS c
  *       ON o.cust_key = c.cust_key;
  *   INSERT INTO graft.db.revenue
  *     SELECT nation_name, SUM(total_price) AS revenue, COUNT(*) AS cnt
  *     FROM graft.db.enriched GROUP BY nation_name;
  * END
  *
  * STOP STREAMING INSERT [INTO] graft.db.enriched
  * }}}
  *
  * Each INSERT becomes one continuous [[StreamingQuery]]; the set
  * starts them together through [[graft.streaming.StatementSet]]
  * (all-or-none startup — a statement that fails to start stops the
  * ones already running). A chained set — one statement's sink is the
  * next statement's source — pipelines naturally: the downstream file
  * stream discovers the upstream's committed segments, exactly the
  * reference's enrich → revenue topology.
  *
  * Lowering per statement (the STREAM is the leftmost FROM relation;
  * dims join to it, reference README.md:222-239):
  *
  *  - STATELESS body (projections/filters/joins): micro-batch
  *    re-analysis. The source's hot log is read as a file stream
  *    ([[TieredTable.readStreamLog]]) and each micro-batch executes
  *    the ORIGINAL SELECT with the stream relation shadowed by the
  *    batch — dim tables re-resolve through the catalog at every
  *    batch, which IS Flink's processing-time temporal join (dim
  *    state as of batch start, emitted rows never retracted;
  *    `FOR SYSTEM_TIME AS OF <proctime>` in the text is accepted and
  *    collapses per batch). Results append to the sink (or upsert,
  *    when the sink declares a PK) tagged by batch id — replays after
  *    a crash are no-ops, the exactly-once protocol every graft sink
  *    commit rides.
  *  - GROUPED body (`GROUP BY` / DISTINCT): Spark's OWN streaming
  *    aggregation in update mode — state lives in the Spark
  *    checkpoint, each trigger's updated groups upsert into the sink
  *    (which must declare a PK — a grouped changelog has no meaning
  *    in an append-only sink, refused at EXECUTE time). This is the
  *    reference's continuously-maintained `nation_revenue` INSERT.
  *    Dim joins inside a grouped body resolve once at start (Spark
  *    stream-static semantics), documented divergence; the
  *    change-feed-driven alternative is `CREATE MATERIALIZED VIEW`.
  *
  * Plan splicing uses the session-extension TVF pattern (no private
  * Spark API): the parsed SELECT — its stream relation rewritten to a
  * reserved shadow name, its alias preserved so qualified references
  * keep resolving — registers in [[planOf]], and
  * `graft_stream_stmt(<id>)` splices it back through the parser,
  * re-ANALYZED at every call site. One `sql()` per micro-batch is
  * driver-side planning cost only; at 100 TB the data path is
  * identical to the hand-built pipeline ([[graft.streaming.DemoPipeline]]).
  */
object StreamingInsertSql {

  /** Spliced-plan registry for the `graft_stream_stmt` TVF. */
  private val plans = TrieMap.empty[Long, LogicalPlan]
  private val nextId = new AtomicLong(0)
  /** Live continuous inserts of this process: sink → (query, shadow,
    * plan id, set id) — sink-keyed because one continuous writer per
    * sink is the well-defined topology (two interleaved writers would
    * race the commit lock batch by batch).
    */
  private case class Running(query: StreamingQuery, shadow: String,
                             planId: Long)
  private val running = TrieMap.empty[String, Running]

  private def key(db: String, table: String) =
    s"${db.toLowerCase}.${table.toLowerCase}"

  /** Engine-local checkpoint directory for a remote (bucket) sink.
    * Keyed INJECTIVELY: a readable sanitized tail of the path plus a
    * digest of (full path, table creation id) — the old lossy
    * char-replacement mapped '/' and '_' to the same character, so two
    * distinct bucket paths could share a cursor (r8 advice). The
    * creation id is a uuid persisted at `meta/CREATION_ID` in the
    * table directory (created on first use): a managed DROP TABLE
    * purges the directory, so recreating a table at the same path
    * mints a NEW id → a fresh checkpoint, never a stale source cursor
    * silently skipping the new table's early rows. An EXTERNAL drop
    * keeps the directory and its data — there resuming the cursor is
    * exactly right.
    */
  private[graft] def remoteCheckpointDir(path: String): String = {
    val fs = graft.storage.TableFs.forPath(path)
    val idFile = s"$path/meta/CREATION_ID"
    val id = fs.readString(idFile).getOrElse {
      val fresh = java.util.UUID.randomUUID().toString
      fs.writeString(idFile, fresh)
      fresh
    }
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$path|$id".getBytes("UTF-8"))
      .take(9).map("%02x".format(_)).mkString
    val human = path.replaceAll("[^A-Za-z0-9.]", "_").takeRight(48)
    s"${sys.props("java.io.tmpdir")}/graft-ckpt/$human-$digest"
  }

  /** Best-effort removal of a remote sink's engine-local checkpoint —
    * DROP TABLE calls this BEFORE the table directory (and with it the
    * creation id) disappears, so the cursor dies with the table.
    */
  private[graft] def dropRemoteCheckpoint(path: String): Unit =
    if (path.contains("://"))
      try {
        val dir = remoteCheckpointDir(path)
        graft.storage.TableFs.forPath(dir).deleteRecursively(dir)
      } catch { case scala.util.control.NonFatal(_) => () }

  /** The live query continuously inserting into `db.table`, if any. */
  def query(db: String, table: String): Option[StreamingQuery] =
    running.get(key(db, table)).map(_.query)

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" -> s"STATEMENT SET: $msg"))

  /** TVF body: splice statement `id`'s stored SELECT plan — unresolved,
    * so every call site re-analyzes it (shadow → current micro-batch,
    * dims → current committed snapshots).
    */
  def plan(args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val id = args match {
      case Seq(Literal(v: Int, IntegerType)) => v.toLong
      case Seq(Literal(v: Long, LongType)) => v
      case other => fail(s"graft_stream_stmt expects one integer statement " +
        s"id, got $other")
    }
    plans.get(id).getOrElse(fail(
      s"no registered statement plan $id — graft_stream_stmt is the " +
        "internal splice point of EXECUTE STATEMENT SET, not a user TVF"))
  }

  private val SetStmt =
    ("""(?is)\s*EXECUTE\s+STATEMENT\s+SET\s*""" +
     """(?:WITH\s*\((.*?)\)\s*)?BEGIN\s+(.*?)\s+END\s*;?\s*""").r
  private val InsertStmt =
    """(?is)\s*INSERT\s+INTO\s+([A-Za-z0-9_.`]+)\s+(SELECT\b.*)""".r
  private val StopStmt =
    ("""(?is)\s*STOP\s+STREAMING\s+INSERT\s+(?:INTO\s+)?""" +
     """([A-Za-z0-9_.`]+)\s*;?\s*""").r
  private val Opt = """'([^']*)'\s*=\s*'([^']*)'""".r

  /** Is `cat` a catalog name backed by [[GraftTableCatalog]] (the
    * builtin `graft` or a `CREATE CATALOG` alias)?
    */
  private def isGraftCatalog(cat: String): Boolean =
    cat.equalsIgnoreCase(TieredCatalog.CatalogName) ||
      SparkSession.active.conf.getOption(s"spark.sql.catalog.$cat")
        .contains(classOf[GraftTableCatalog].getName)

  /** Resolve a possibly-qualified table reference to (db, table).
    * Single-part names resolve against the current catalog/namespace
    * when the current catalog is graft-backed (the Flink-dialect
    * `USE CATALOG` flow), else the root namespace.
    */
  def resolveDbTable(raw: String): Option[(String, String)] =
    raw.replace("`", "").split("\\.").toSeq match {
      case Seq(cat, db, t) if isGraftCatalog(cat) => Some((db, t))
      case Seq(_, _, _) => None
      case Seq(db, t) => Some((db, t))
      case Seq(t) =>
        val cm = SparkSession.active.sessionState.catalogManager
        val db =
          if (isGraftCatalog(cm.currentCatalog.name))
            cm.currentNamespace.mkString(".")
          else ""
        Some((db, t))
      case _ => None
    }

  private def dbTable(raw: String, what: String): (String, String) =
    resolveDbTable(raw).getOrElse(
      fail(s"$what must be '[catalog.]<db>.<table>' or an unqualified " +
        s"name in the current graft catalog, got '$raw'"))

  /** Quote-aware `;` split — a semicolon inside a `'…'` SQL string
    * literal ('' = the escaped quote) does not end a statement.
    */
  private[plans] def splitStatements(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\'') { inStr = !inStr; cur.append(c) }
      else if (c == ';' && !inStr) { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Intercept the two statements; None = not ours, delegate. */
  def parse(sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case SetStmt(opts, body) =>
        val options = Option(opts).map { o =>
          val leftover = Opt.replaceAllIn(o, "").replaceAll("[\\s,]+", "")
          if (leftover.nonEmpty)
            fail(s"malformed WITH near '$leftover' — the form is " +
              "WITH('key'='value', …) with single-quoted keys and values")
          val pairs =
            Opt.findAllMatchIn(o).map(m => m.group(1) -> m.group(2)).toMap
          val unknown = pairs.keySet --
            Set("checkpoint", "interval", "watermark")
          if (unknown.nonEmpty)
            fail(s"unknown option(s) ${unknown.mkString(", ")} — " +
              "supported: checkpoint, interval, watermark")
          pairs.get("watermark").foreach { w =>
            if (!w.contains(":"))
              fail("watermark must be '<event-time column>:<delay>', " +
                s"e.g. 'ts:10 seconds', got '$w'")
          }
          pairs
        }.getOrElse(Map.empty)
        val stmts = splitStatements(body).map {
          case InsertStmt(sink, select) =>
            val (db, t) = dbTable(sink, "INSERT INTO target")
            (db, t, select)
          case other => fail(
            s"a statement set contains only INSERT INTO … SELECT " +
              s"statements, got: ${other.take(80)}")
        }
        if (stmts.isEmpty) fail("empty statement set")
        val dup = stmts.groupBy(s => key(s._1, s._2)).collect {
          case (k, g) if g.size > 1 => k
        }
        if (dup.nonEmpty)
          fail(s"multiple INSERTs into ${dup.mkString(", ")} — one " +
            "continuous writer per sink")
        Some(ExecuteStatementSetCommand(stmts, options))
      case StopStmt(sink) =>
        val (db, t) = dbTable(sink, "STOP STREAMING INSERT target")
        Some(StopStreamingInsertCommand(db, t))
      case _ => None
    }

  /** Parse a statement-set SELECT with the same strip-and-retry the
    * session parser applies: `FOR SYSTEM_TIME AS OF <proctime>` erases
    * only when the text does not already parse (string literals stay
    * intact).
    */
  private def parseSelect(select: String, session: SparkSession): LogicalPlan = {
    val p = session.sessionState.sqlParser
    try p.parseQuery(select)
    catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        val rewritten = TemporalJoinParser.rewrite(select)
        if (rewritten == select) throw e
        p.parseQuery(rewritten)
    }
  }

  /** The leftmost relation of the FROM tree — the STREAM of the
    * statement (reference shape: the stream is first, dims join to
    * it). Returns the relation and whether an enclosing alias already
    * qualifies it.
    */
  private def leftmostRelation(plan: LogicalPlan): (UnresolvedRelation, Boolean) = {
    def descend(p: LogicalPlan, aliased: Boolean): Option[(UnresolvedRelation, Boolean)] =
      p match {
        case r: UnresolvedRelation => Some((r, aliased))
        case SubqueryAlias(_, child) => descend(child, aliased = true)
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          descend(j.left, aliased = false)
        case other if other.children.size == 1 =>
          descend(other.children.head, aliased = false)
        case _ => None
      }
    descend(plan, aliased = false).getOrElse(fail(
      "could not find the stream relation — the FROM clause must start " +
        "with a registered graft table"))
  }

  private case class Lowered(db: String, table: String, selectText: String,
                             srcDb: String, srcTable: String,
                             grouped: Boolean, planId: Long, shadow: String,
                             faker: Boolean = false) {
    /** A bounded faker source loads as one batch (the finite generator
      * job that completes — Flink's bounded-source INSERT); only an
      * unbounded faker source runs as a rate stream.
      */
    def fakerBounded: Boolean =
      faker && graft.sources.FakerSource.lookup(srcTable)
        .exists(_.numRows.isDefined)
  }

  /** Validate one INSERT and register its spliced plan. Pure analysis —
    * nothing starts here.
    */
  private def lower(session: SparkSession, db: String, table: String,
                    select: String): Lowered = {
    val sinkEntry = TieredCatalog.lookup(db, table).getOrElse(
      fail(s"unknown sink table '$db.$table' — CREATE or register it first"))
    val parsed = parseSelect(select, session)
    val (srcRel, aliased) = leftmostRelation(parsed)
    // a source naming a registered faker table — bare, or through
    // Flink's default-catalog spelling
    // `default_catalog`.`default_database`.source_x (README.md:213-215)
    // — is the generator path (the reference's EXECUTE STATEMENT SET
    // loads); everything else must be a graft table
    val srcParts = srcRel.multipartIdentifier
    val faker = graft.sources.FakerSource.lookup(srcParts.last).isDefined &&
      (srcParts.size == 1 ||
        srcParts.init.map(_.toLowerCase) ==
          Seq("default_catalog", "default_database"))
    val (srcDb, srcTable) =
      if (faker) ("", srcParts.last)
      else dbTable(srcParts.mkString("."), "stream source")
    if (!faker && key(srcDb, srcTable) == key(db, table))
      fail(s"'$db.$table' cannot continuously insert into itself")
    if (!faker)
      TieredCatalog.lookup(srcDb, srcTable).getOrElse(
        fail(s"unknown stream source '$srcDb.$srcTable' — the leftmost FROM " +
          "relation must be a registered graft table or faker source"))
    // an Aggregate/Distinct ANYWHERE in the body (the root may be a
    // Sort/Limit over it) must take the streaming-aggregation lowering:
    // per-batch re-analysis would silently emit batch-partial groups
    val grouped = parsed.collectFirst {
      case _: Aggregate => (); case _: Distinct => ()
    }.isDefined
    // (grouped + keyless sink is checked at execute time — a WATERMARK
    // option turns it into append-mode windowed aggregation, which IS
    // meaningful for an append-only sink; see start())
    val id = nextId.incrementAndGet()
    val shadow = s"graft_stream_src_$id"
    // rewrite ONLY the stream relation to the shadow name; keep the
    // user's qualified references resolving by re-aliasing an unaliased
    // relation under its original terminal name
    // single-part dim references resolve against the PARSE-TIME current
    // catalog/namespace and are baked in fully qualified: the
    // micro-batch body re-analyzes inside the stream's CLONED session,
    // whose current catalog is not the statement author's (the
    // reference's unqualified `fluss_customer` after USE CATALOG,
    // README.md:222-239)
    val cm = session.sessionState.catalogManager
    def qualified(r: UnresolvedRelation): Option[Seq[String]] =
      r.multipartIdentifier match {
        case Seq(t) if isGraftCatalog(cm.currentCatalog.name) &&
          TieredCatalog.lookup(cm.currentNamespace.mkString("."), t).isDefined =>
          Some(Seq(cm.currentCatalog.name) ++ cm.currentNamespace ++ Seq(t))
        case _ => None
      }
    val spliced = parsed.transformUp {
      case r: UnresolvedRelation if r.eq(srcRel) =>
        val sub = UnresolvedRelation(Seq(shadow))
        if (aliased) sub
        else SubqueryAlias(r.multipartIdentifier.last, sub)
      case r: UnresolvedRelation =>
        qualified(r).map { q =>
          SubqueryAlias(r.multipartIdentifier.last, UnresolvedRelation(q))
        }.getOrElse(r)
    }
    plans.put(id, spliced)
    Lowered(db, table, select, srcDb, srcTable, grouped, id, shadow, faker)
  }

  private def tableOf(session: SparkSession,
                      e: TieredCatalog.Entry): TieredTable =
    // datalake entries export the Iceberg metadata chain on every
    // commit (incremental, O(Δ)) — the reference's tiering-service
    // interop for 'table.datalake.enabled' tables
    TieredTable(session, e.path, e.pk, e.mergeOnRead, e.partitionBy,
      e.bloomCols, changeDataFeed = e.changeDataFeed,
      icebergExport = e.datalake)

  /** NOT NULL columns of the sink's declared schema present in the
    * output — enforced per Flink's `table.exec.sink.not-null-enforcer`
    * (sql-client.sql:50): DROP filters violating rows (pushed-down
    * IsNotNull), ERROR (the Flink default) raises on the first
    * violating row via a codegen'd conditional.
    */
  private def declaredSchema(e: TieredCatalog.Entry)
      : Option[org.apache.spark.sql.types.StructType] =
    graft.storage.TableFs.forPath(e.path)
      .readString(s"${e.path}/meta/SCHEMA")
      .map(org.apache.spark.sql.types.StructType.fromDDL)

  /** Primary-key columns are implicitly NOT NULL (the Flink PK
    * contract) on top of the declared non-nullable columns.
    */
  private def notNullCols(e: TieredCatalog.Entry): Seq[String] =
    (declaredSchema(e)
      .map(_.fields.filter(!_.nullable).map(_.name).toSeq)
      .getOrElse(Nil) ++ e.pk).distinct

  /** SQL INSERT maps the SELECT's output to the sink's columns BY
    * POSITION, coercing types (the reference's enrichment INSERT emits
    * `c.name` and `n.name` — two `name` columns — into
    * `cust_name`/`nation_name`, and its revenue INSERT narrows the
    * widened SUM decimal back to the declared DECIMAL(15,2),
    * README.md:222-251): rename and cast to the declared schema when
    * one exists.
    */
  private def conformToSink(e: TieredCatalog.Entry, df: DataFrame): DataFrame =
    declaredSchema(e) match {
      case Some(s) =>
        if (s.size != df.columns.length)
          fail(s"INSERT produces ${df.columns.length} columns but the " +
            s"sink declares ${s.size} (${s.fieldNames.mkString(", ")})")
        import org.apache.spark.sql.functions.col
        df.toDF(s.fieldNames.toIndexedSeq: _*)
          .select(s.fields.toIndexedSeq.map(f =>
            col(f.name).cast(f.dataType).as(f.name)): _*)
      case None => df
    }

  private def applySinkPolicy(session: SparkSession, cols: Seq[String],
                              df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, raise_error, when}
    val present = cols.filter(df.columns.contains)
    if (present.isEmpty) df
    else FlinkDialect.notNullEnforcer(session) match {
      case "DROP" => graft.operators.SinkPolicy.enforceNotNull(df, present)
      case _ => df.select(df.columns.toSeq.map { c =>
        if (present.contains(c))
          when(col(c).isNull, raise_error(lit(
            s"column $c is NOT NULL but the insert produced a null row " +
              "(sink policy ERROR; SET 'table.exec.sink." +
              "not-null-enforcer'='DROP' to drop such rows)")))
            .otherwise(col(c)).as(c)
        else col(c)
      }: _*)
    }
  }

  /** Start one lowered statement as its continuous query. */
  private def start(session: SparkSession, low: Lowered,
                    options: Map[String, String]): StreamingQuery = {
    val k = key(low.db, low.table)
    if (running.contains(k))
      fail(s"a continuous INSERT into ${low.db}.${low.table} is already " +
        "running — STOP STREAMING INSERT it first")
    val sinkEntry = TieredCatalog.lookup(low.db, low.table).get
    val srcEntry =
      if (low.faker) None else TieredCatalog.lookup(low.srcDb, low.srcTable)
    val sink = tableOf(session, sinkEntry)
    // the source stream: a graft table's hot log, or an unbounded faker
    // generator's rate stream
    def sourceStream(): DataFrame = srcEntry match {
      case Some(e) =>
        val src = tableOf(session, e)
        // stream schema: the declared CREATE TABLE schema when one was
        // persisted (lets a chained set start against a still-empty
        // upstream sink — the reference DDLs every table first), else
        // the data's own schema
        val schema = graft.storage.TableFs.forPath(e.path)
          .readString(s"${e.path}/meta/SCHEMA")
          .map(org.apache.spark.sql.types.StructType.fromDDL)
          .getOrElse {
            try src.readUnion().schema
            catch {
              case _: IllegalStateException => fail(
                s"stream source '${low.srcDb}.${low.srcTable}' is empty " +
                  "and has no declared schema — CREATE TABLE it with " +
                  "columns or append a first batch")
            }
          }
        src.readStreamLog(schema)
      case None =>
        graft.sources.FakerSource.lookup(low.srcTable).get.stream(session)
    }
    val sinkNotNull = notNullCols(sinkEntry)
    val checkpoint = options.get("checkpoint")
      .map(c => s"$c/${low.db}.${low.table}")
      .getOrElse {
        if (sinkEntry.path.contains("://"))
          // remote (bucket) sink: the Spark checkpoint is ENGINE-LOCAL
          // cursor state, not table state — exactly-once rides the
          // batch-tagged commits, not checkpoint atomicity, so it does
          // not belong in the bucket (and Spark's checkpoint manager
          // wants rename/list semantics object stores don't promise).
          remoteCheckpointDir(sinkEntry.path)
        else s"${sinkEntry.path}/_insert_checkpoint"
      }
    val intervalMs = options.get("interval").map(_.toLong).getOrElse(1000L)
    val tagPrefix = s"stmtins-${key(low.db, low.table)}"
    // WITH('watermark'='<col>:<delay>') — the event-time contract:
    // applied to EVERY statement's stream in the set (split mixed
    // shapes into separate sets). With a PK sink the watermark merely
    // bounds aggregation state (update mode, late groups expire); with
    // a KEYLESS sink it changes the emission contract to APPEND mode —
    // each window emits ONCE, when the watermark passes its end, the
    // Flink tumbling-window INSERT semantics
    // (GROUP BY window(ts, '10 seconds') in Spark spelling).
    // explicit WITH option first, else the SOURCE table's declared
    // event-time contract (`WATERMARK FOR …` DDL / faker dialect)
    val declaredWm: Option[String] =
      if (low.faker)
        graft.sources.FakerSource.lookup(low.srcTable).flatMap(_.watermark)
      else srcEntry.flatMap(_.watermark)
    val watermark: Option[(String, String)] =
      options.get("watermark").orElse(declaredWm).map { w =>
        val Array(c, d) = w.split(":", 2)
        (c.trim, d.trim)
      }
    if (low.grouped && sinkEntry.pk.isEmpty && watermark.isEmpty)
      fail(s"a GROUP BY/DISTINCT statement emits an update changelog — " +
        s"sink '${low.db}.${low.table}' must declare a primary key, or " +
        "pass WITH('watermark'='<col>:<delay>') and group by " +
        "window(<col>, …) for append-mode finalized windows")
    def withWm(df: DataFrame): DataFrame =
      watermark.map { case (c, d) => df.withWatermark(c, d) }.getOrElse(df)

    def writeBatch(out0: DataFrame, batchId: Long): Unit = {
      val out = applySinkPolicy(session, sinkNotNull,
        conformToSink(sinkEntry, out0))
      if (sinkEntry.pk.nonEmpty)
        sink.commitUpsert(out, tag = Some(s"$tagPrefix-$batchId"))
      else sink.appendLog(out, tag = Some(s"$tagPrefix-$batchId"))
      // datalake-enabled sink: tier within the trigger — freshness =
      // trigger period, the reference's 30 s datalake SLA collapsed to
      // the micro-batch cadence (README.md:188-191); the constructed
      // sink also Iceberg-exports each commit (tableOf)
      if (sinkEntry.datalake && sinkEntry.pk.isEmpty) { sink.tier(); () }
    }

    val q =
      if (low.grouped) {
        // Spark-native streaming aggregation: the shadow is a STREAMING
        // temp view, the analyzed splice is a streaming aggregate. PK
        // sink → update-mode changelog upserting per trigger; keyless
        // sink (watermark required, enforced above) → append mode, one
        // emission per finalized window
        withWm(sourceStream()).createOrReplaceTempView(low.shadow)
        session.sql(s"SELECT * FROM graft_stream_stmt(${low.planId})")
          .writeStream
          .outputMode(if (sinkEntry.pk.nonEmpty) "update" else "append")
          .foreachBatch { (b: DataFrame, batchId: Long) =>
            writeBatch(b, batchId); (): Unit
          }
          .trigger(Trigger.ProcessingTime(intervalMs))
          .option("checkpointLocation", checkpoint)
          .start()
      } else {
        // micro-batch re-analysis: shadow = THIS batch, dims = their
        // current committed snapshots (processing-time temporal join)
        sourceStream().writeStream
          .foreachBatch { (b: DataFrame, batchId: Long) =>
            b.createOrReplaceTempView(low.shadow)
            val out = b.sparkSession.sql(
              s"SELECT * FROM graft_stream_stmt(${low.planId})")
            writeBatch(out, batchId)
            (): Unit
          }
          .trigger(Trigger.ProcessingTime(intervalMs))
          .option("checkpointLocation", checkpoint)
          .start()
      }
    running.put(k, Running(q, low.shadow, low.planId))
    q
  }

  /** One-shot load from a BOUNDED faker source — the finite generator
    * job that runs to completion (the reference's EXECUTE STATEMENT SET
    * dim/order loads, README.md:211-217; `rows-per-second` is demo
    * pacing, not semantics — the bounded dataset is identical, so the
    * local run fast-forwards it). A PK sink takes last-write-wins on
    * GENERATION order: the faker batch is narrow over `spark.range`,
    * so `monotonically_increasing_id` ascends with the row id.
    */
  private def runFakerLoad(session: SparkSession, low: Lowered): Unit = {
    import org.apache.spark.sql.functions.{col, monotonically_increasing_id}
    val sinkEntry = TieredCatalog.lookup(low.db, low.table).get
    val sink = tableOf(session, sinkEntry)
    val ft = graft.sources.FakerSource.lookup(low.srcTable).get
    try {
      ft.bounded(session).createOrReplaceTempView(low.shadow)
      val out0 = session.sql(s"SELECT * FROM graft_stream_stmt(${low.planId})")
      val out = applySinkPolicy(session, notNullCols(sinkEntry),
        conformToSink(sinkEntry, out0))
      if (sinkEntry.pk.nonEmpty) {
        val seq = graft.sources.FakerSource.SeqCol
        require(!out.columns.contains(seq), s"column $seq is reserved")
        val withSeq = out.withColumn(seq, monotonically_increasing_id())
        sink.commitUpsert(graft.operators.Upsert
          .latestByKey(withSeq, sinkEntry.pk, Seq(col(seq).desc)).drop(seq))
      } else {
        sink.appendLog(out)
        if (sinkEntry.datalake) { sink.tier(); () }
      }
    } finally {
      session.catalog.dropTempView(low.shadow)
      plans.remove(low.planId)
      (): Unit
    }
  }

  private[plans] def execute(session: SparkSession,
                             stmts: Seq[(String, String, String)],
                             options: Map[String, String]): Unit = {
    // validate EVERY statement before starting ANY (a set is one job)
    val lowered = stmts.map { case (db, t, select) =>
      lower(session, db, t, select)
    }
    // bounded faker loads run to completion first (they feed the
    // streaming statements of the same set); continuous statements
    // then start together
    val (bounded, continuous) = lowered.partition(_.fakerBounded)
    try bounded.foreach(runFakerLoad(session, _))
    catch {
      case e: Throwable =>
        lowered.foreach(low => plans.remove(low.planId))
        throw e
    }
    val set = StatementSet()
    continuous.foreach(low => set.add(start(session, low, options)))
    try set.run()
    catch {
      case e: Throwable =>
        // unwind everything this set touched — including spliced plans
        // of statements that never reached start()
        continuous.foreach { low =>
          cleanup(session, key(low.db, low.table))
          plans.remove(low.planId)
        }
        throw e
    }
  }

  private def cleanup(session: SparkSession, k: String): Unit =
    running.remove(k).foreach { r =>
      try r.query.stop() catch { case _: Throwable => }
      plans.remove(r.planId)
      session.catalog.dropTempView(r.shadow)
    }

  private[plans] def stop(session: SparkSession, db: String, table: String): Unit = {
    val k = key(db, table)
    val r = running.get(k).getOrElse(
      fail(s"no running continuous INSERT into $db.$table in this session"))
    StatementSet.stopGracefully(r.query)
    cleanup(session, k)
  }
}

/** Execution node for EXECUTE STATEMENT SET — an ordinary Spark
  * RunnableCommand, so `spark.sql(...)` starts the set eagerly like
  * any DDL. `stmts` = (sinkDb, sinkTable, selectText).
  */
case class ExecuteStatementSetCommand(stmts: Seq[(String, String, String)],
                                      options: Map[String, String])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    StreamingInsertSql.execute(session, stmts, options)
    Seq.empty
  }
}

/** Execution node for STOP STREAMING INSERT: graceful stop (lets the
  * in-flight trigger finish) + unregister; sink data stays.
  */
case class StopStreamingInsertCommand(db: String, table: String)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    StreamingInsertSql.stop(session, db, table)
    Seq.empty
  }
}
