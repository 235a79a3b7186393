package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, TimestampType}

/** PER-RECORD processing time — the reference's `PROCTIME()` semantics
  * (/root/reference/README.md:148: proctime advances per record), as
  * opposed to Spark's `current_timestamp()`, which is frozen per query
  * (batch) or per micro-batch (streaming). Each evaluated ROW samples
  * the wall clock, so two rows of one batch can carry different
  * proctimes — exactly the Flink behavior the repo previously
  * documented as a divergence (SURVEY §7).
  *
  * Nondeterministic by contract (the optimizer must not collapse,
  * reorder across barriers, or common-subexpression it), and codegen'd
  * — one `System.currentTimeMillis()` call inlined per row, no boxing,
  * stays inside WholeStageCodegen.
  *
  * Use where per-record arrival order matters (audit columns, arrival
  * tie-breaks). For reproducible pipelines the micro-batch-stable
  * `current_timestamp()` remains the default — reproducibility is why
  * it was chosen — this expression exists so the CHOICE is the user's,
  * not a missing feature.
  */
case class ProcTime() extends LeafExpression with Nondeterministic {

  override def nullable: Boolean = false
  override def dataType: DataType = TimestampType
  override def prettyName: String = "graft_proctime"

  override protected def initializeInternal(partitionIndex: Int): Unit = {}

  override protected def evalInternal(input: InternalRow): Any =
    System.currentTimeMillis() * 1000L // micros since epoch

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(
      code = code"""final long ${ev.value} =
         |java.lang.System.currentTimeMillis() * 1000L;""".stripMargin,
      isNull = FalseLiteral)
}
