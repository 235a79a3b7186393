package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The graft catalog's SQL-callable function surface — DSv2
  * `FunctionCatalog` entries under the `system` namespace, the same
  * spelling Iceberg uses for its `catalog.system.bucket(...)` family:
  *
  * {{{
  *   SELECT graft.system.dot_product(a.emb, b.emb) ...
  *   SELECT graft.system.hash60(text) ...
  *   SELECT graft.system.shingle_hashes(split(text, ' '), 3) ...
  *   SELECT graft.system.bucket(16, doc_id) ...
  * }}}
  *
  * Unlike the session-registry spellings (`graft_dot`, registered by
  * [[graft.functions.GraftFunctions.register]]), these live IN the
  * catalog: no registration call, discoverable via
  * `SHOW FUNCTIONS IN graft.system`, resolvable from any session that
  * mounted the catalog. Every function binds a MAGIC-METHOD
  * implementation (`invoke` with exact primitive/internal types), so
  * Spark plans a codegen-friendly `Invoke` instead of the row-boxing
  * `produceResult` path — and the hash semantics are bit-identical to
  * the engine's Column/expression forms (hash60 = first 15 hex chars
  * of md5, base 16; shingles delegate to the SAME
  * [[graft.functions.expressions.ShingleHashes.compute]] the codegen'd
  * expression uses), so results stay oracle-stable across all three
  * surfaces.
  */
object GraftSqlFunctions {

  val Namespace: Array[String] = Array("system")

  private val names = Seq("dot_product", "hash60", "shingle_hashes", "bucket",
    "iceberg_bucket")

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Namespace))
      names.map(Identifier.of(Namespace, _)).toArray
    else Array.empty

  def load(ident: Identifier): Option[UnboundFunction] =
    if (!ident.namespace().sameElements(Namespace)) None
    else ident.name() match {
      case "dot_product" => Some(DotProductFn)
      case "hash60" => Some(Hash60Fn)
      case "shingle_hashes" => Some(ShingleHashesFn)
      case "bucket" => Some(BucketFn)
      case "iceberg_bucket" => Some(IcebergBucketFn)
      case _ => None
    }

  /** 60-bit md5 prefix — the engine-wide text hash
    * ([[graft.functions.TextFunctions.hash60]] is the Column form;
    * DuckDB oracles spell it `CAST('0x' || substr(md5(s),1,15) AS
    * BIGINT)`). First 8 digest bytes big-endian, shifted to 60 bits.
    */
  private[plans] def md5Hash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    v >>> 4
  }

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  object DotProductFn extends UnboundFunction {
    override def name(): String = "dot_product"
    override def description(): String =
      "dot_product(array<double>, array<double>) -> double — " +
        "strict left-to-right IEEE fold, same as the graft_dot expression"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 && inputType.fields.forall(
        _.dataType.isInstanceOf[ArrayType]),
        s"dot_product expects two array<double> arguments, got " +
          inputType.fields.map(_.dataType.sql).mkString(", "))
      DotProductBound
    }
  }

  object DotProductBound extends ScalarFunction[java.lang.Double] {
    override def name(): String = "dot_product"
    override def canonicalName(): String = "graft.system.dot_product"
    override def inputTypes(): Array[DataType] =
      Array(ArrayType(DoubleType), ArrayType(DoubleType))
    override def resultType(): DataType = DoubleType
    override def isResultNullable: Boolean = true
    /** Magic method: same loop as
      * [[graft.functions.expressions.DotProduct]] — keep them
      * semantically identical (bit-exact IEEE order).
      */
    def invoke(a: ArrayData, b: ArrayData): java.lang.Double = {
      if (a == null || b == null) return null
      val n = math.min(a.numElements(), b.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
      s
    }
    override def produceResult(row: org.apache.spark.sql.catalyst.InternalRow)
        : java.lang.Double =
      invoke(row.getArray(0), row.getArray(1))
  }

  object Hash60Fn extends UnboundFunction {
    override def name(): String = "hash60"
    override def description(): String =
      "hash60(string) -> bigint — first 15 hex chars of md5, base 16 " +
        "(the engine-wide 60-bit text fingerprint)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        "hash60 expects one string argument")
      Hash60Bound
    }
  }

  object Hash60Bound extends ScalarFunction[java.lang.Long] {
    override def name(): String = "hash60"
    override def canonicalName(): String = "graft.system.hash60"
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = true
    def invoke(s: UTF8String): java.lang.Long =
      if (s == null) null else md5Hash60(s.getBytes)
    override def produceResult(row: org.apache.spark.sql.catalyst.InternalRow)
        : java.lang.Long =
      invoke(row.getUTF8String(0))
  }

  object ShingleHashesFn extends UnboundFunction {
    override def name(): String = "shingle_hashes"
    override def description(): String =
      "shingle_hashes(array<string>, n) -> array<bigint> — sorted " +
        "distinct hash60 of the word n-gram shingles (concat_ws-' ' " +
        "window bytes); same kernel as the graft_shingle_hashes " +
        "expression"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        "shingle_hashes expects (array<string> tokens, int n)")
      ShingleHashesBound
    }
  }

  object ShingleHashesBound extends ScalarFunction[ArrayData] {
    override def name(): String = "shingle_hashes"
    override def canonicalName(): String = "graft.system.shingle_hashes"
    override def inputTypes(): Array[DataType] =
      Array(ArrayType(StringType), IntegerType)
    override def resultType(): DataType =
      ArrayType(LongType, containsNull = false)
    override def isResultNullable: Boolean = true
    def invoke(toks: ArrayData, n: Int): ArrayData = {
      if (toks == null) return null
      require(n >= 1, s"shingle width must be >= 1, got $n")
      graft.functions.expressions.ShingleHashes.compute(toks, n)
    }
    override def produceResult(row: org.apache.spark.sql.catalyst.InternalRow)
        : ArrayData =
      invoke(row.getArray(0), row.getInt(1))
  }

  /** `bucket(n, v)` — graft's md5/hash60 bucket transform, the
    * oracle-checkable one (DuckDB recomputes it relationally, t13).
    * NOT Iceberg's murmur3 bucket and NOT the `write.bucket-by` table
    * layout — those both use the Iceberg-spec kernel; use
    * `graft.system.iceberg_bucket(n, v)` to locate or pre-cluster rows
    * of a bucketed table. Longs/ints/dates hash their 8-byte
    * big-endian representation; strings hash their UTF-8 bytes.
    */
  object BucketFn extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, value) -> int — hash60-based bucket in [0, n); " +
        "value may be int/bigint/date/string. NOT the write.bucket-by " +
        "table layout; for that use graft.system.iceberg_bucket"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        "bucket expects (int n, value)")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket: the bucket count must be INT, got " +
          inputType.fields(0).dataType.sql)
      inputType.fields(1).dataType match {
        case LongType | IntegerType => BucketLongBound
        case DateType => BucketDateBound
        case StringType => BucketStringBound
        case other => throw new UnsupportedOperationException(
          s"bucket: unsupported value type ${other.sql} " +
            "(int/bigint/date/string)")
      }
    }
  }

  private[graft] def bucketOfLong(n: Int, v: Long): Int = {
    val bytes = new Array[Byte](8)
    var i = 0
    while (i < 8) { bytes(i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
    (((md5Hash60(bytes) % n) + n) % n).toInt
  }

  object BucketLongBound extends ScalarFunction[java.lang.Integer] {
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.system.bucket[long]"
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true
    def invoke(n: Int, v: Long): java.lang.Integer = {
      require(n >= 1, s"bucket count must be >= 1, got $n")
      bucketOfLong(n, v)
    }
    override def produceResult(row: org.apache.spark.sql.catalyst.InternalRow)
        : java.lang.Integer =
      if (row.isNullAt(0) || row.isNullAt(1)) null
      else invoke(row.getInt(0), row.getLong(1))
  }

  object BucketDateBound extends ScalarFunction[java.lang.Integer] {
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.system.bucket[date]"
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, DateType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true
    /** Dates hash their epoch-day as a long — same bucket as
      * `bucket(n, CAST(d AS BIGINT epoch days))` by construction.
      */
    def invoke(n: Int, days: Int): java.lang.Integer = {
      require(n >= 1, s"bucket count must be >= 1, got $n")
      bucketOfLong(n, days.toLong)
    }
    override def produceResult(row: org.apache.spark.sql.catalyst.InternalRow)
        : java.lang.Integer =
      if (row.isNullAt(0) || row.isNullAt(1)) null
      else invoke(row.getInt(0), row.getInt(1))
  }

  object BucketStringBound extends ScalarFunction[java.lang.Integer] {
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.system.bucket[string]"
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, StringType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true
    def invoke(n: Int, s: UTF8String): java.lang.Integer = {
      if (s == null) return null
      require(n >= 1, s"bucket count must be >= 1, got $n")
      (((md5Hash60(s.getBytes) % n) + n) % n).toInt
    }
    override def produceResult(row: org.apache.spark.sql.catalyst.InternalRow)
        : java.lang.Integer =
      if (row.isNullAt(0)) null
      else invoke(row.getInt(0), row.getUTF8String(1))
  }

  /** `iceberg_bucket(n, v)` — the Iceberg-spec `bucket[n]` transform
    * (murmur3_x86_32 seed 0 over the spec's canonical bytes; see
    * [[graft.functions.IcebergTransforms]]). This IS the
    * `write.bucket-by` table layout's hash: `iceberg_bucket(N, pk)`
    * equals the `__bucket` dir a key's rows live in, and equals the
    * `bucket[N]` partition value an external Iceberg engine computes
    * on the exported table. Spec-pinned by the published test vectors
    * (IcebergTransformsSpec); no relational oracle exists (DuckDB has
    * no murmur3), so the gate checks it through the bucketed-export
    * round-trip instead.
    */
  object IcebergBucketFn extends UnboundFunction {
    override def name(): String = "iceberg_bucket"
    override def description(): String =
      "iceberg_bucket(n, value) -> int — Iceberg-spec murmur3 " +
        "bucket[n] in [0, n); value may be int/bigint/date/string. " +
        "Matches the write.bucket-by table layout and the exported " +
        "Iceberg partition spec"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        "iceberg_bucket expects (int n, value)")
      require(inputType.fields(0).dataType == IntegerType,
        s"iceberg_bucket: the bucket count must be INT, got " +
          inputType.fields(0).dataType.sql)
      inputType.fields(1).dataType match {
        case LongType | IntegerType => IcebergBucketLongBound
        case DateType => IcebergBucketDateBound
        case StringType => IcebergBucketStringBound
        case other => throw new UnsupportedOperationException(
          s"iceberg_bucket: unsupported value type ${other.sql} " +
            "(int/bigint/date/string)")
      }
    }
  }

  object IcebergBucketLongBound extends ScalarFunction[java.lang.Integer] {
    override def name(): String = "iceberg_bucket"
    override def canonicalName(): String = "graft.system.iceberg_bucket[long]"
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true
    def invoke(n: Int, v: Long): java.lang.Integer = {
      require(n >= 1, s"bucket count must be >= 1, got $n")
      graft.functions.IcebergTransforms.bucketLong(n, v)
    }
    override def produceResult(row: org.apache.spark.sql.catalyst.InternalRow)
        : java.lang.Integer =
      if (row.isNullAt(0) || row.isNullAt(1)) null
      else invoke(row.getInt(0), row.getLong(1))
  }

  object IcebergBucketDateBound extends ScalarFunction[java.lang.Integer] {
    override def name(): String = "iceberg_bucket"
    override def canonicalName(): String = "graft.system.iceberg_bucket[date]"
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, DateType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true
    /** Dates hash their epoch-day as a long (the spec widens). */
    def invoke(n: Int, days: Int): java.lang.Integer = {
      require(n >= 1, s"bucket count must be >= 1, got $n")
      graft.functions.IcebergTransforms.bucketLong(n, days.toLong)
    }
    override def produceResult(row: org.apache.spark.sql.catalyst.InternalRow)
        : java.lang.Integer =
      if (row.isNullAt(0) || row.isNullAt(1)) null
      else invoke(row.getInt(0), row.getInt(1))
  }

  object IcebergBucketStringBound extends ScalarFunction[java.lang.Integer] {
    override def name(): String = "iceberg_bucket"
    override def canonicalName(): String = "graft.system.iceberg_bucket[string]"
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, StringType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true
    def invoke(n: Int, s: UTF8String): java.lang.Integer = {
      if (s == null) return null
      require(n >= 1, s"bucket count must be >= 1, got $n")
      graft.functions.IcebergTransforms.bucketUtf8(n, s.getBytes)
    }
    override def produceResult(row: org.apache.spark.sql.catalyst.InternalRow)
        : java.lang.Integer =
      if (row.isNullAt(0)) null
      else invoke(row.getInt(0), row.getUTF8String(1))
  }
}
