package graft.functions

import org.apache.spark.sql.SparkSession

import graft.functions.expressions.{DotProduct, ProcTime, ShingleHashes}

/** SQL registration for graft's custom Catalyst expressions, so the
  * DataFrame API and `spark.sql` expose the same surface:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT graft_dot(a.embedding, b.embedding) ...")
  * }}}
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.GraftSqlBridge.registerFunction(
      spark, "graft_dot",
      exprs => {
        require(exprs.length == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(exprs.head, exprs(1))
      })
    org.apache.spark.sql.GraftSqlBridge.registerFunction(
      spark, "graft_shingle_hashes",
      exprs => {
        require(exprs.length == 2,
          "graft_shingle_hashes(tokens, n) — n a literal int")
        require(exprs(1).foldable,
          "graft_shingle_hashes: shingle width must be a literal")
        val n = exprs(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_shingle_hashes: integer width expected, got $other")
        }
        ShingleHashes(exprs.head, n)
      })
    org.apache.spark.sql.GraftSqlBridge.registerFunction(
      spark, "graft_proctime",
      exprs => {
        require(exprs.isEmpty, "graft_proctime() takes no arguments")
        ProcTime()
      })
  }
}
