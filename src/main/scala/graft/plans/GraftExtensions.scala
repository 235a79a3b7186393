package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Session extensions for the graft SQL surface. Registered with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (alongside
  * `spark.sql.catalog.graft=graft.plans.GraftTableCatalog`).
  *
  * Currently one extension: the `FOR SYSTEM_TIME AS OF` temporal-join
  * clause (the reference's most distinctive SQL construct,
  * /root/reference/README.md:236-238).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectParser((_, delegate) => new TemporalJoinParser(delegate))
}

object TemporalJoinParser {
  /** `FOR SYSTEM_TIME AS OF <proctime-attr>` where the attribute is a
    * (qualified) identifier or `PROCTIME()`. Event-time versioned joins
    * (AS OF an arbitrary expression) are out of scope, matching the
    * reference workload's processing-time-only usage.
    */
  private val AsOf =
    ("""(?is)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+""" +
     """(?:PROCTIME\s*\(\s*\)|[A-Za-z_][A-Za-z0-9_]*(?:\s*\.\s*[A-Za-z_][A-Za-z0-9_]*)*)""").r

  /** Strip the clause: in batch execution over the snapshot-isolated
    * graft catalog, "dim as of the probe row's processing time" IS the
    * dim's current committed snapshot at query resolution — a plain
    * join. (The same collapse Flink applies to processing-time temporal
    * joins in batch runtime mode; streaming per-batch semantics come
    * from re-resolving the dim per micro-batch, see
    * [[graft.streaming.DemoPipeline]].)
    */
  def rewrite(sqlText: String): String =
    AsOf.replaceAllIn(sqlText, "")
}

/** Delegating parser that erases `FOR SYSTEM_TIME AS OF <attr>` before
  * handing the text to Spark's parser. Purely textual by design: the
  * clause is not expressible as a Catalyst node Spark lacks — after the
  * batch-semantics collapse (see [[TemporalJoinParser.rewrite]]) the
  * remaining query is ordinary Spark SQL, so the built-in parser,
  * analyzer, and optimizer do all the real work.
  */
class TemporalJoinParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(TemporalJoinParser.rewrite(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(TemporalJoinParser.rewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
