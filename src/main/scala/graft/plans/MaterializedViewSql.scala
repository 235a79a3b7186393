package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.MaterializedView
import graft.storage.TieredTable

/** The streaming SQL surface for continuously-maintained aggregates —
  * the reference drives its always-fresh `nation_revenue` table with a
  * continuous `INSERT INTO … SELECT` job in SQL
  * (/root/reference/README.md:222-250); this is the same capability as
  * DDL over the graft catalog:
  *
  * {{{
  * CREATE MATERIALIZED VIEW graft.db.mv
  *   [OPTIONS('path'='…', 'checkpoint'='…', 'interval'='500')]
  * AS SELECT g1, …, SUM(v) AS sum_v, COUNT(*) AS cnt
  *    FROM graft.db.src GROUP BY g1, …
  *
  * DROP MATERIALIZED VIEW graft.db.mv
  * }}}
  *
  * Lowering: the statement is intercepted by [[TemporalJoinParser]]
  * (Spark's grammar has no MATERIALIZED VIEW), the `AS SELECT` body is
  * parsed by SPARK'S OWN parser and pattern-matched as a keyed
  * sum/count aggregate over one registered graft table, and execution
  * builds [[graft.operators.MaterializedView]] over the source's
  * change-data feed and starts its [[MaterializedView.startStream]]
  * StreamingQuery. The state table registers in [[TieredCatalog]], so
  * `SELECT * FROM graft.db.mv` reads the maintained aggregate like any
  * other table.
  *
  * Exactly-once across restarts is the startStream contract: the
  * consumption cursor lives in the Spark checkpoint (default
  * `<statePath>/_checkpoint`), state commits are tagged per batch, and
  * a WAL-replayed batch no-ops on its tag — so DROP + re-CREATE with
  * the same path/checkpoint resumes without double-counting.
  *
  * DROP stops the stream and unregisters the view but leaves the state
  * table's files on disk (external-table semantics — the restart path
  * depends on it; delete the directory to discard the view for good).
  *
  * Scope: the aggregate shape [[graft.operators.IncrementalAgg]]
  * maintains — any number of group columns, any number of SUM / MIN /
  * MAX / AVG columns, one COUNT(*)/COUNT(1) — over one CDF-enabled
  * source. MIN/MAX are retraction-correct via the dirty-group repair
  * ([[graft.operators.IncrementalAgg.applyDeltaFull]]); AVG rides
  * hidden accumulator columns in the state table (project explicit
  * columns rather than `SELECT *` to avoid seeing them). Anything
  * else fails loudly at CREATE time, never silently at maintenance
  * time.
  */
object MaterializedViewSql {

  /** Live views of this process: qualified name → (view, query). */
  private val running = TrieMap.empty[String, (MaterializedView, StreamingQuery)]

  def query(db: String, name: String): Option[StreamingQuery] =
    running.get(key(db, name)).map(_._2)

  private def key(db: String, name: String) =
    s"${db.toLowerCase}.${name.toLowerCase}"

  private val Create =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+([A-Za-z0-9_.`]+)\s*""" +
     """(?:OPTIONS\s*\((.*?)\)\s*)?AS\s+(SELECT\b.*)""").r
  private val Drop =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+([A-Za-z0-9_.`]+)\s*;?\s*""".r
  private val Opt = """'([^']*)'\s*=\s*'([^']*)'""".r

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" -> s"MATERIALIZED VIEW: $msg"))

  /** `graft.db.t` / `db.t` → (db, t). */
  private def dbTable(raw: String, what: String): (String, String) =
    raw.replace("`", "").split("\\.").toSeq match {
      case Seq(TieredCatalog.CatalogName, db, t) => (db, t)
      case Seq(db, t) => (db, t)
      case _ => fail(s"$what must be '<db>.<table>', got '$raw'")
    }

  /** Intercept the two statements; None = not ours, delegate. */
  def parse(sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case Create(name, opts, select) =>
        val (db, mv) = dbTable(name, "view name")
        val options = Option(opts).map { o =>
          // refuse-loudly, not skip-silently: a malformed pair (e.g.
          // unquoted keys) or an unknown key silently falling back to
          // defaults would repoint state/checkpoint without a word
          val leftover = Opt.replaceAllIn(o, "").replaceAll("[\\s,]+", "")
          if (leftover.nonEmpty)
            fail(s"malformed OPTIONS near '$leftover' — the form is " +
              "OPTIONS('key'='value', …) with single-quoted keys and values")
          val pairs =
            Opt.findAllMatchIn(o).map(m => m.group(1) -> m.group(2)).toMap
          val unknown = pairs.keySet -- Set("path", "checkpoint", "interval")
          if (unknown.nonEmpty)
            fail(s"unknown option(s) ${unknown.mkString(", ")} — " +
              "supported: path, checkpoint, interval")
          pairs
        }.getOrElse(Map.empty)
        Some(fromSelect(db, mv, options, delegate.parseQuery(select)))
      case Drop(name) =>
        val (db, mv) = dbTable(name, "view name")
        Some(DropMaterializedViewCommand(db, mv))
      case _ => None
    }

  /** Match the SELECT as `SELECT <groups…>, SUM(v) AS a, COUNT(*) AS b
    * FROM <one graft table> GROUP BY <groups…>` and build the CREATE
    * command. The body went through Spark's parser, so quoting,
    * comments, case, and whitespace are already normalized.
    */
  private def fromSelect(db: String, mv: String, options: Map[String, String],
                         plan: LogicalPlan): LogicalPlan = {
    def attr(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case UnresolvedAlias(a: UnresolvedAttribute, _) => Some(a.name)
      case _ => None
    }
    def relation(p: LogicalPlan): Option[Seq[String]] = p match {
      case r: UnresolvedRelation => Some(r.multipartIdentifier)
      case SubqueryAlias(_, child) => relation(child)
      case _ => None
    }
    plan match {
      case Aggregate(groupExprs, aggExprs, child, _) =>
        val src = relation(child).getOrElse(fail(
          "the view source must be a single graft table (no joins or " +
            "subqueries — materialize those upstream first)"))
        val (srcDb, srcTable) = dbTable(src.mkString("."), "source table")
        val groupCols = groupExprs.map(e => attr(e).getOrElse(fail(
          s"GROUP BY supports plain columns only, got $e")))
        val sums = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val mins = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val maxs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val avgs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var cntAlias: Option[String] = None
        def plainArg(fn: String, args: Seq[Expression]): String = args match {
          case Seq(a: UnresolvedAttribute) => a.name
          case other => fail(s"$fn argument must be a plain column, got $other")
        }
        aggExprs.foreach {
          case e if attr(e).isDefined =>
            if (!groupCols.contains(attr(e).get))
              fail(s"non-aggregate column ${attr(e).get} not in GROUP BY")
          case Alias(UnresolvedFunction(Seq(fn), args, _, _, _, _, _), name)
              if fn.equalsIgnoreCase("sum") =>
            sums += (plainArg("SUM", args) -> name)
          case Alias(UnresolvedFunction(Seq(fn), args, _, _, _, _, _), name)
              if fn.equalsIgnoreCase("min") =>
            mins += (plainArg("MIN", args) -> name)
          case Alias(UnresolvedFunction(Seq(fn), args, _, _, _, _, _), name)
              if fn.equalsIgnoreCase("max") =>
            maxs += (plainArg("MAX", args) -> name)
          case Alias(UnresolvedFunction(Seq(fn), args, _, _, _, _, _), name)
              if fn.equalsIgnoreCase("avg") =>
            avgs += (plainArg("AVG", args) -> name)
          case Alias(UnresolvedFunction(Seq(fn), args, _, _, _, _, _), name)
              if fn.equalsIgnoreCase("count") =>
            args match {
              case Seq(_: UnresolvedStar) | Seq(Literal(_, _)) =>
              case other => fail(s"COUNT must be COUNT(*) or COUNT(1), got $other")
            }
            if (cntAlias.isDefined) fail("exactly one COUNT column supported")
            cntAlias = Some(name)
          case other => fail(
            s"unsupported select item $other — the maintainable shape is " +
              "group columns + SUM/MIN/MAX/AVG(col) AS <alias> (any " +
              "number of each) + COUNT(*) AS <alias>")
        }
        if (sums.isEmpty) fail("a SUM(col) AS <alias> item is required")
        val aliases = sums.map(_._2) ++ mins.map(_._2) ++ maxs.map(_._2) ++
          avgs.map(_._2)
        if (aliases.distinct.size != aliases.size)
          fail("aggregate aliases must be distinct")
        CreateMaterializedViewCommand(db, mv, srcDb, srcTable, groupCols,
          sums.toSeq,
          cntAlias.getOrElse(fail("a COUNT(*) AS <alias> item is required")),
          options, mins.toSeq, maxs.toSeq, avgs.toSeq)
      case other => fail(
        s"the view body must be a GROUP BY aggregate, got:\n$other")
    }
  }

  private[plans] def startView(session: SparkSession, db: String, mv: String,
                               srcDb: String, srcTable: String,
                               groupCols: Seq[String],
                               sums: Seq[(String, String)], cntAlias: String,
                               options: Map[String, String],
                               mins: Seq[(String, String)] = Nil,
                               maxs: Seq[(String, String)] = Nil,
                               avgs: Seq[(String, String)] = Nil): Unit = {
    if (running.contains(key(db, mv)))
      fail(s"materialized view $db.$mv is already running — DROP it first")
    val entry = TieredCatalog.lookup(srcDb, srcTable).getOrElse(
      fail(s"unknown source table '$srcDb.$srcTable' — CREATE or register it first"))
    if (!entry.changeDataFeed)
      fail(s"source table '$srcDb.$srcTable' was not created with " +
        "'change-data-feed'='true' — the view maintains itself from the " +
        "change feed")
    val source = TieredTable(session, entry.path, entry.pk, entry.mergeOnRead,
      entry.partitionBy, entry.bloomCols, changeDataFeed = true)
    val statePath = options.getOrElse("path",
      s"${TieredCatalog.warehouse}/$db/$mv")
    val state = TieredTable(session, statePath)
    val view = new MaterializedView(source, state, entry.pk, groupCols,
      sums.head._1, sums.head._2, cntAlias, extraSums = sums.tail,
      mins = mins, maxs = maxs, avgs = avgs)
    val checkpoint = options.getOrElse("checkpoint", s"$statePath/_checkpoint")
    val intervalMs = options.get("interval").map(_.toLong).getOrElse(1000L)
    val q = view.startStream(checkpoint, intervalMs)
    TieredCatalog.register(db, mv, statePath)
    running.put(key(db, mv), (view, q))
  }

  private[plans] def stopView(db: String, mv: String): Unit = {
    val (_, q) = running.remove(key(db, mv)).getOrElse(
      fail(s"no running materialized view $db.$mv in this session"))
    q.stop()
    TieredCatalog.unregister(db, mv)
  }
}

/** Execution node for CREATE MATERIALIZED VIEW — an ordinary Spark
  * RunnableCommand, so `spark.sql(...)` runs it eagerly like any DDL.
  */
case class CreateMaterializedViewCommand(db: String, mv: String,
    srcDb: String, srcTable: String, groupCols: Seq[String],
    sums: Seq[(String, String)], cntAlias: String,
    options: Map[String, String],
    mins: Seq[(String, String)] = Nil,
    maxs: Seq[(String, String)] = Nil,
    avgs: Seq[(String, String)] = Nil)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    MaterializedViewSql.startView(session, db, mv, srcDb, srcTable,
      groupCols, sums, cntAlias, options, mins, maxs, avgs)
    Seq.empty
  }
}

/** Execution node for DROP MATERIALIZED VIEW: stop + unregister; state
  * files stay on disk (see [[MaterializedViewSql]] — restart depends
  * on them).
  */
case class DropMaterializedViewCommand(db: String, mv: String)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    MaterializedViewSql.stopView(db, mv)
    Seq.empty
  }
}
