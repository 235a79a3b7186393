package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Raw-text ingestion for training-data pipelines: JSONL / CSV / plain
  * text, with explicit schemas and corrupt-record quarantine — the web
  * crawl / data-dump entry path that feeds the dedup/quality operators.
  *
  * Policy mirrors the engine's NOT NULL stance
  * ([[graft.operators.SinkPolicy]]): bad input is never an error —
  * malformed records are captured in `_corrupt_record` and split out so
  * the pipeline keeps flowing and the rejects stay auditable.
  *
  * Scale: all readers are Spark file sources — distributed, splittable
  * (except .gz — prefer zstd/bzip2 or many files for parallelism),
  * schema enforced up front (no inference pass over 100 TB).
  */
object TextIngest {

  val CorruptCol = "_corrupt_record"

  /** JSONL with explicit schema; malformed lines land in
    * `_corrupt_record` instead of failing the job.
    */
  def jsonl(spark: SparkSession, schema: StructType,
            paths: String*): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(paths: _*)

  /** CSV with explicit schema, same quarantine policy. */
  def csv(spark: SparkSession, schema: StructType, header: Boolean,
          paths: String*): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .csv(paths: _*)

  /** One row per file: (path, content) — the document-per-file corpus
    * shape. `wholetext` keeps each document intact.
    */
  def documents(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("wholetext", "true").text(paths: _*)
      .withColumn("path", input_file_name())
      .select(col("path"), col("value").as("text"))

  /** Split a permissive read into (clean, quarantined). The clean side
    * drops the corrupt column; the quarantine keeps the raw line for
    * audit/repair.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    // localCheckpoint, not cache: one materialized read feeds both
    // branches, and the blocks are freed when the frames are GC'd —
    // callers never have to remember an unpersist
    val cached = df.localCheckpoint(true)
    val clean = cached.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = cached.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw"))
    (clean, bad)
  }
}
