package graft.functions

import org.apache.spark.sql.SparkSession

import graft.functions.expressions.DotProduct

/** SQL registration for graft's custom Catalyst expressions, so the
  * DataFrame API and `spark.sql` expose the same surface:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT graft_dot(a.embedding, b.embedding) ...")
  * }}}
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftSqlBridge.registerFunction(
      spark, "graft_dot",
      exprs => {
        require(exprs.length == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(exprs.head, exprs(1))
      })
}
