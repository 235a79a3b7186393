package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media as opaque `binary` payloads with typed metadata,
  * decode/feature-extraction as partition-wise iterator transforms, and
  * frame sampling for the video path.
  *
  * The IMAGE decode path is REAL: [[decodeImageFeatures]] decodes
  * PNG/JPEG/BMP/GIF payloads with the JDK's own `javax.imageio`
  * codecs and extracts raster dimensions, mean-luma brightness, and a
  * deterministic 8×8 average-hash perceptual hash. The container
  * ships no AUDIO/VIDEO codecs, so that leg of the decode remains a
  * clearly-marked deterministic stub ([[decodeStub]] — raw payload
  * bytes interpreted as samples); everything around it — schema,
  * partitioning, the mapPartitions batch shape, the feature schema —
  * is the real production plumbing and is tested. Swap the stub for
  * an ffmpeg binding and nothing else changes.
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

  /** One decoded IMAGE's features (the real-codec path). */
  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           n_bytes: Int, brightness: Double, phash: Long)

  /** REAL image decode — the JDK's own codecs (`javax.imageio` ships
    * PNG/JPEG/BMP/GIF with every JVM; the container's "no codec libs"
    * constraint binds only audio/video, which keep [[decodeStub]]).
    * Features per image: decoded raster dimensions, brightness = mean
    * luminance in [0,1], and the classic 8×8 AVERAGE-HASH perceptual
    * hash (64 grid cells, mean-thresholded). Sampling is
    * nearest-neighbor at fixed grid centers — no resampling filter —
    * so the bits are deterministic across JVMs and platforms.
    *
    * Undecodable payloads return None (quarantine rows, never a task
    * crash — the TextIngest corrupt-record stance applied to media).
    */
  private[graft] def imageFeatures(id: Long,
                                   payload: Array[Byte]): Option[ImageFeatures] = {
    val img =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map { im =>
      val w = im.getWidth
      val h = im.getHeight
      def lumaAt(x: Int, y: Int): Double = {
        val rgb = im.getRGB(x, y)
        // ITU-R BT.601 luma from the sRGB bytes
        (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)) / 255.0
      }
      // brightness over a bounded sample grid (≤ 64×64 nearest-sampled
      // pixels): O(1) per image regardless of resolution, exact on
      // images smaller than the grid
      val gw = math.min(64, w)
      val gh = math.min(64, h)
      var sum = 0.0
      var gy = 0
      while (gy < gh) {
        var gx = 0
        while (gx < gw) {
          sum += lumaAt((2 * gx + 1) * w / (2 * gw), (2 * gy + 1) * h / (2 * gh))
          gx += 1
        }
        gy += 1
      }
      val brightness = sum / (gw * gh)
      // 8×8 average hash: cell luma at grid centers, threshold by mean
      val cells = new Array[Double](64)
      var i = 0
      while (i < 64) {
        cells(i) = lumaAt((2 * (i % 8) + 1) * w / 16, (2 * (i / 8) + 1) * h / 16)
        i += 1
      }
      val mean = cells.sum / 64
      var phash = 0L
      i = 0
      while (i < 64) {
        if (cells(i) >= mean) phash |= (1L << i)
        i += 1
      }
      ImageFeatures(id, w, h, payload.length, brightness, phash)
    }
  }

  /** Partition-wise REAL image decode over (media_id, payload) —
    * same dataflow shape as [[decodeFeatures]] (narrow iterator map,
    * payloads never leave their executor); rows whose bytes no JDK
    * codec accepts are dropped (count the diff for quarantine
    * metrics).
    */
  def decodeImageFeatures(media: DataFrame): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => imageFeatures(id, bytes) })
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
