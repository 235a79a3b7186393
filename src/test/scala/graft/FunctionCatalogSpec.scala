package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `graft.system.*` DSv2 function surface
  * ([[graft.plans.GraftSqlFunctions]]): catalog-resolved, SHOW
  * FUNCTIONS-discoverable, and bit-identical to the engine's
  * expression/Column spellings of the same kernels.
  */
class FunctionCatalogSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("dot_product matches the codegen'd expression bit-exactly") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(0.5, -1.0, 2.0)),
      (Array(0.1, 0.2), Array(0.3, 0.7))
    ).toDF("a", "b")
    df.createOrReplaceTempView("fc_vecs")
    val viaSql = spark.sql(
      "SELECT graft.system.dot_product(a, b) AS d FROM fc_vecs")
      .as[Double].collect().toSeq
    val viaExpr = df.select(org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expressions.DotProduct(
        org.apache.spark.sql.GraftSqlBridge.expression(col("a")),
        org.apache.spark.sql.GraftSqlBridge.expression(col("b")))).as("d"))
      .as[Double].collect().toSeq
    assert(viaSql == viaExpr)
    assert(viaSql.head == 1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0)
  }

  test("hash60 matches the Column form (md5-prefix semantics)") {
    val df = Seq("hello world", "", "graft").toDF("s")
    df.createOrReplaceTempView("fc_strs")
    val viaSql = spark.sql(
      "SELECT graft.system.hash60(s) AS h FROM fc_strs")
      .as[Long].collect().toSeq
    val viaCol = df.select(
      graft.functions.TextFunctions.hash60(col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("shingle_hashes shares the expression kernel; width comes from " +
       "a non-foldable column too (unlike the session registration)") {
    val df = Seq("the quick brown fox jumps").toDF("text")
    df.createOrReplaceTempView("fc_docs")
    val viaSql = spark.sql(
      """SELECT graft.system.shingle_hashes(split(text, ' '), 3) AS sh
        |FROM fc_docs""".stripMargin)
      .as[Seq[Long]].collect().head
    val viaExpr = df.select(org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expressions.ShingleHashes(
        org.apache.spark.sql.GraftSqlBridge.expression(
          split(col("text"), " ")), 3)).as("sh"))
      .as[Seq[Long]].collect().head
    assert(viaSql == viaExpr && viaSql.size == 3)
    // n as a real column (the catalog function binds it as data, the
    // session spelling requires a literal)
    val varied = spark.sql(
      """SELECT size(graft.system.shingle_hashes(split(text, ' '), n)) AS c
        |FROM (SELECT text, id AS n FROM fc_docs
        |      LATERAL VIEW explode(array(1, 2, 5)) t AS id)""".stripMargin)
      .as[Int].collect().toSeq.sorted
    // 5 distinct tokens: width 5 → 1 shingle, width 2 → 4, width 1 → 5
    assert(varied == Seq(1, 4, 5))
  }

  test("bucket is stable across types and stays in range") {
    val rows = spark.sql(
      """SELECT graft.system.bucket(16, CAST(42 AS BIGINT)) AS bl,
        |       graft.system.bucket(16, 42) AS bi,
        |       graft.system.bucket(16, 'doc-42') AS bs,
        |       graft.system.bucket(16, DATE '2024-05-17') AS bd,
        |       graft.system.bucket(16, CAST(NULL AS BIGINT)) AS bn
        |""".stripMargin).collect().head
    val bl = rows.getInt(0); val bi = rows.getInt(1)
    val bs = rows.getInt(2); val bd = rows.getInt(3)
    assert(bl == bi, "int and bigint of the same value share a bucket")
    assert(Seq(bl, bs, bd).forall(b => b >= 0 && b < 16))
    assert(rows.isNullAt(4), "null value → null bucket")
    // date bucket = epoch-day long bucket by construction
    val days = java.time.LocalDate.parse("2024-05-17").toEpochDay
    assert(bd == graft.plans.GraftSqlFunctions.bucketOfLong(16, days))
  }

  test("SHOW FUNCTIONS lists the system namespace") {
    val fns = spark.sql("SHOW FUNCTIONS IN graft.system")
      .as[String].collect().toSet
    assert(Seq("dot_product", "hash60", "shingle_hashes", "bucket")
      .forall(f => fns.exists(_.endsWith(f))), fns.toString)
  }

  test("unknown function and foreign namespace refuse loudly") {
    val e = intercept[Exception](
      spark.sql("SELECT graft.system.no_such_fn(1)").collect())
    assert(e.getMessage.contains("no_such_fn"))
  }
}
