package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfFS {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.queries.Lakehouse.demoTableByDate(spark, "/root/testdata/sf0.001")
    val base = t.readCold()
    base.select(min("o_orderdate"), max("o_orderdate")).show(false)
    val cond = col("o_orderdate").between(
      lit("1994-06-01").cast("date"), lit("1995-06-01").cast("date"))
    println("optimized: " + base.filter(cond).queryExecution.optimizedPlan)
    val fs = org.apache.spark.sql.GraftSqlBridge.translateConjuncts(base, cond)
    println("filters: " + fs.mkString(" | "))
    println("counts: " + t.skippingCounts(cond))
    spark.stop()
  }
}
