package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media as opaque `binary` payloads with typed metadata,
  * decode/feature-extraction as partition-wise iterator transforms, and
  * frame sampling for the video path.
  *
  * The container ships no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub (raw payload bytes interpreted as
  * pixels); everything around it — schema, partitioning, the
  * mapPartitions batch shape, the feature schema — is the real
  * production plumbing and is tested. Swap [[decodeStub]] for a codec
  * call (javax.imageio / ffmpeg bindings) and nothing else changes.
  *
  * Scale notes: payloads never pass through the driver; feature
  * extraction is a narrow per-partition map (no shuffle); metadata-only
  * transforms ([[resizeMeta]], [[frameSample]]) are pure column ops that
  * never touch payload bytes — Parquet column pruning means a
  * frame-sampling query doesn't even read the binary column.
  */
object Multimodal {

  /** One decoded media item (the input contract of the decode stage). */
  case class MediaRow(media_id: Long, media_type: String, width: Int,
                      height: Int, n_frames: Int, payload: Array[Byte])

  /** Extracted features (the output contract of the decode stage). */
  case class MediaFeatures(media_id: Long, media_type: String,
                           n_bytes: Int, brightness: Double, phash: Long)

  /** Deterministic fake media corpus derived from an id column: payload =
    * 128 md5-derived bytes, metadata (type, dimensions, frame count) from
    * seeded hashes. Stands in for `spark.read.format("binaryFile")` or a
    * crawl table at the same schema.
    */
  def synthesize(df: DataFrame, idCol: String): DataFrame =
    Scale.widen(df.select(col(idCol).cast("long").as("media_id")))
      .withColumn("media_type", element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(hash60(concat(lit("mt:"), col("media_id"))), lit(3)) + 1).cast("int")))
      .withColumn("width",
        (pmod(hash60(concat(lit("w:"), col("media_id"))), lit(960)) + 64).cast("int"))
      .withColumn("height",
        (pmod(hash60(concat(lit("h:"), col("media_id"))), lit(540)) + 64).cast("int"))
      .withColumn("n_frames",
        (pmod(hash60(concat(lit("f:"), col("media_id"))), lit(240)) + 1).cast("int"))
      .withColumn("payload",
        unhex(repeat(md5(concat(lit("px:"), col("media_id"))), 8)))

  /** STUB DECODE — deterministic byte interpretation in place of a real
    * codec. Exact-integer byte sums keep it oracle-reproducible.
    */
  private def decodeStub(m: MediaRow): MediaFeatures = {
    val px = m.payload
    var sum = 0L
    var i = 0
    while (i < px.length) { sum += (px(i) & 0xff); i += 1 }
    // 7 bytes = 56 bits: stays positive in a signed 64-bit value on
    // every engine (no silent wrap vs checked-overflow divergence)
    var phash = 0L
    var j = 0
    while (j < 7 && j < px.length) { phash |= (px(j) & 0xffL) << (8 * j); j += 1 }
    MediaFeatures(m.media_id, m.media_type, px.length,
      sum.toDouble / px.length, phash)
  }

  /** Partition-wise decode + feature extraction: one iterator pass per
    * partition, no shuffle, payloads stay executor-side.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("width"),
        col("height"), col("n_frames"), col("payload"))
      .as[MediaRow]
      .mapPartitions(_.map(decodeStub))
  }

  /** Metadata-only resize: rescales dimensions, payload untouched (a
    * real pipeline would re-encode in the decode stage; the planner-
    * visible part — which columns are read/written — is identical).
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")))
    media
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Video frame sampling: one row per kept frame index (every `step`-th
    * of n_frames). Pure column op — never reads the payload column.
    */
  def frameSample(media: DataFrame, step: Int): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
          .as("frame_idx"))
}
