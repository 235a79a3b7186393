package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Iceberg-spec `bucket[n]` partition transform over one
  * column — `(murmur3_x86_32(canonical_bytes(v)) & Int.MaxValue) % n`
  * per the public Iceberg spec (see [[graft.functions.IcebergTransforms]]
  * for the canonical byte forms and the spec-vector pinning).
  *
  * This is the WRITE-side stamping expression of the bucketed
  * merge-on-read layout ([[graft.storage.TieredTable]] `bucketBy`):
  * every delta write computes `__bucket = IcebergBucket(n, pk)` inside
  * WholeStageCodegen, so the engine's bucket dirs are bit-identical to
  * the Iceberg `bucket[n]` transform an external engine (Trino, Spark
  * + Iceberg) computes when pruning the exported table.
  *
  * Accepts int/long/date (long-family little-endian hash), string and
  * binary (raw-bytes hash). `n` is a literal layout constant, never a
  * column — bucket counts are table metadata.
  */
case class IcebergBucket(n: Int, child: Expression)
    extends UnaryExpression {
  require(n >= 1, s"bucket count must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DateType | StringType | BinaryType |
         TimestampType | TimestampNTZType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: unsupported value type ${other.sql} " +
        "(int/bigint/date/timestamp/string/binary)")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "iceberg_bucket"

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType | DateType =>
      graft.functions.IcebergTransforms.bucketLong(n, v.asInstanceOf[Int].toLong)
    case LongType | TimestampType | TimestampNTZType =>
      graft.functions.IcebergTransforms.bucketLong(n, v.asInstanceOf[Long])
    case StringType =>
      graft.functions.IcebergTransforms.bucketUtf8(
        n, v.asInstanceOf[UTF8String].getBytes)
    case BinaryType =>
      val b = v.asInstanceOf[Array[Byte]]
      (graft.functions.IcebergTransforms.murmur3(b, b.length) &
        Integer.MAX_VALUE) % n
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = "graft.functions.IcebergTransforms"
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case IntegerType | DateType =>
        s"${ev.value} = $k.bucketLong($n, (long) $v);"
      case LongType | TimestampType | TimestampNTZType =>
        s"${ev.value} = $k.bucketLong($n, $v);"
      case StringType =>
        s"${ev.value} = $k.bucketUtf8($n, $v.getBytes());"
      case BinaryType =>
        s"${ev.value} = ($k.murmur3($v, $v.length) & Integer.MAX_VALUE) % $n;"
      case other => throw new IllegalStateException(s"unreachable: $other")
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
