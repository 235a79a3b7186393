package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Seeded faker-equivalent generators for the reference's three source
  * tables (/root/reference/flink/sql/sql-client.sql:1-48). Deterministic:
  * every column is a pure function of the row id via xxhash64, so batch
  * and streaming runs over the same id range produce identical rows —
  * that's what makes the stream-vs-batch convergence tests exact.
  *
  * Distribution mapping (reference faker expr → ours):
  *  - `number.numberBetween(a,b)`  → pmod(xxhash64(tagged id), b-a) + a
  *  - `number.randomDouble(3,1,1000)` → 3-dp uniform via integer grid
  *  - `date.past(100 DAYS)`        → anchor date − uniform 0..99 days
  *  - `regexify '(low|medium|high)'` → element_at on hashed index
  */
object Datagen {
  private val M = DecimalType(15, 2)

  /** Uniform [0, n) long, deterministic per (tag, id). */
  private def u(tag: String, id: Column, n: Long): Column =
    pmod(xxhash64(lit(tag), id), lit(n))

  /** ~5% nulls, else uniform [a, b) — faker emits nulls too; the NOT NULL
    * DROP sink policy (sql-client.sql:50) is load-bearing downstream.
    */
  private def uNullable(tag: String, id: Column, a: Int, b: Int): Column =
    when(u(tag + ":null", id, 20) === 0, lit(null))
      .otherwise(u(tag, id, b - a) + a)

  private val nationNames = Seq(
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA")

  /** source_order columns as a function of the row-id column — shared by
    * the batch and rate-stream variants (sql-client.sql:1-18).
    */
  def orderColumns(id: Column): Seq[Column] = Seq(
    u("ok", id, 100000001L).as("order_key"),
    uNullable("ck", id, 0, 20).cast("int").as("cust_key"),
    ((u("tp", id, 999000L) / lit(1000.0)) + 1.0).cast(M).as("total_price"),
    date_sub(to_date(lit("2026-08-01")), u("od", id, 100L).cast("int"))
      .as("order_date"),
    element_at(
      array(lit("low"), lit("medium"), lit("high")),
      (u("op", id, 3L) + 1).cast("int")).as("order_priority"),
    concat(lit("Clerk"), (u("cl", id, 4L) + 1)).as("clerk"))

  /** Bounded batch of orders (number-of-rows, sql-client.sql:11). */
  def sourceOrder(spark: SparkSession, numRows: Long): DataFrame =
    spark.range(numRows).select(orderColumns(col("id")): _*)

  /** Unbounded rate-limited order stream (rows-per-second=10,
    * sql-client.sql:10); same deterministic columns keyed on the rate
    * source's monotonically increasing `value`.
    */
  def orderStream(spark: SparkSession, rowsPerSecond: Int = 10): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(orderColumns(col("value")): _*)

  /** source_customer: 200 rows over ≤20 distinct keys → duplicates force
    * last-write-wins upsert dedup (sql-client.sql:20-37).
    */
  def sourceCustomer(spark: SparkSession, numRows: Long = 200): DataFrame =
    spark.range(numRows).select(
      col("id").as("src_seq"), // arrival order → LWW tiebreak within a batch
      u("cck", col("id"), 20L).cast("int").as("cust_key"),
      concat(lit("Customer#"), u("cnm", col("id"), 1000L)).as("name"),
      concat(lit("555-"), u("cph", col("id"), 10000L)).as("phone"),
      uNullable("cnk", col("id"), 1, 20).cast("int").as("nation_key"),
      ((u("cab", col("id"), 999000L) / lit(1000.0)) + 1.0).cast(M).as("acctbal"),
      element_at(
        array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
          "HOUSEHOLD").map(lit): _*),
        (u("cms", col("id"), 5L) + 1).cast("int")).as("mktsegment"))

  /** source_nation: 100 rows over keys 1..19 (sql-client.sql:39-48). */
  def sourceNation(spark: SparkSession, numRows: Long = 100): DataFrame =
    spark.range(numRows).select(
      col("id").as("src_seq"),
      (u("nk", col("id"), 19L) + 1).cast("int").as("nation_key"),
      element_at(
        array(nationNames.map(lit): _*),
        (u("nnm", col("id"), 20L) + 1).cast("int")).as("name"))
}
