package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Every query in the engine addresses tables through this registry so the
  * physical location/format can change (plain parquet today, tiered
  * [[graft.storage.TieredTable]] for the lakehouse paths) without touching
  * query code.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Batch snapshot read of a fixture table. Plain parquet: Catalyst gets
    * predicate pushdown + column pruning + vectorized reads for free.
    *
    * `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark only reads
    * as a nanosecond long (`spark.sql.legacy.parquet.nanosAsLong=true`,
    * set in every session builder); normalize to a µs timestamp here with
    * exact integer division — the same ns→µs truncation DuckDB applies.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("CAST(ts div 1000 AS BIGINT)")))
    else df
  }

  /** Register all fixture tables as temp views so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
