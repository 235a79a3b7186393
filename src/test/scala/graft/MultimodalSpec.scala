package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def media = Multimodal.synthesize(
    Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).toDF("id"), "id")

  test("synthesize: binary payload + typed metadata, deterministic") {
    val m = media
    assert(m.schema("payload").dataType == BinaryType)
    val rows = m.orderBy("media_id").collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getAs[Array[Byte]]("payload").length == 128))
    val again = media.orderBy("media_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("decodeFeatures: partition-wise, brightness in [0,255], stable phash") {
    val f = Multimodal.decodeFeatures(media).collect()
    assert(f.length == 8)
    assert(f.forall(x => x.brightness >= 0 && x.brightness <= 255))
    assert(f.forall(_.n_bytes == 128))
    val again = Multimodal.decodeFeatures(media).collect()
    assert(f.sortBy(_.media_id).map(_.phash).toSeq ==
      again.sortBy(_.media_id).map(_.phash).toSeq)
  }

  test("resizeMeta bounds the long side at maxSide, preserves small media") {
    val r = Multimodal.resizeMeta(media, 512).collect()
    assert(r.forall { row =>
      val (ow, oh) = (row.getAs[Int]("out_width"), row.getAs[Int]("out_height"))
      ow <= 512 && oh <= 512 && ow >= 1 && oh >= 1
    })
    assert(r.forall { row =>
      val (w, h) = (row.getAs[Int]("width"), row.getAs[Int]("height"))
      (w > 512 || h > 512) || (row.getAs[Int]("out_width") == w)
    })
  }

  test("frameSample explodes only videos, stride honored, payload pruned") {
    val fs = Multimodal.frameSample(media, step = 30)
    val rows = fs.collect()
    val videos = media.filter(col("media_type") === "video")
      .select("media_id", "n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.map(_.getLong(0)).toSet == videos.keySet)
    rows.groupBy(_.getLong(0)).foreach { case (id, g) =>
      assert(g.length == (videos(id) + 29) / 30)
    }
    // column pruning: the physical scan must not read the payload column
    val scan = fs.queryExecution.executedPlan.toString()
    assert(!scan.contains("payload"), "frame sampling must never read payload bytes")
  }

  // ---- REAL image decode (JDK javax.imageio codecs) ----

  /** Encode a width×height image whose pixel (x, y) has gray level
    * `level(x, y)` (0–255), in the given JDK-supported format.
    */
  private def encodeImage(w: Int, h: Int, fmt: String)
                         (level: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = level(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt codec")
    out.toByteArray
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("decodeImageFeatures: real PNG decode — dimensions, brightness, stable phash") {
    val dark = encodeImage(40, 30, "png")((_, _) => 40)
    val bright = encodeImage(40, 30, "png")((_, _) => 220)
    // left-dark/right-bright split: phash bits set exactly on the
    // right half of the 8×8 grid
    val split = encodeImage(64, 64, "png")((x, _) => if (x < 32) 0 else 255)
    val df = Seq((1L, dark), (2L, bright), (3L, split))
      .toDF("media_id", "payload")
    val got = Multimodal.decodeImageFeatures(df)
      .collect().map(f => f.media_id -> f).toMap
    assert(got.size == 3)
    assert(got(1L).width == 40 && got(1L).height == 30)
    // solid gray g decodes to brightness ≈ g/255 (sampled exactly)
    assert(math.abs(got(1L).brightness - 40.0 / 255) < 1e-9, got(1L))
    assert(math.abs(got(2L).brightness - 220.0 / 255) < 1e-9, got(2L))
    // the split image: columns 4..7 of each grid row are the bright
    // half → the high nibble of each row byte
    assert(got(3L).phash == 0xf0f0f0f0f0f0f0f0L,
      f"split-image phash must be the right-half mask, got ${got(3L).phash}%x")
    // decode is deterministic across runs
    val again = Multimodal.decodeImageFeatures(df)
      .collect().map(f => f.media_id -> f.phash).toMap
    assert(got.view.mapValues(_.phash).toMap == again)
  }

  test("real phash: re-encode invariant, small shift for small edits, far for different images") {
    def gradient(seed: Int) = (x: Int, y: Int) =>
      (x * 3 + y * 5 + seed * 37) % 256
    val pngA = encodeImage(100, 80, "png")(gradient(0))
    // lossless re-encode of the SAME pixels in another container
    val bmpA = encodeImage(100, 80, "bmp")(gradient(0))
    // small global brightening: most cells stay on their side of the
    // (also shifted) mean → small Hamming distance
    val pngA2 = encodeImage(100, 80, "png")((x, y) =>
      math.min(255, gradient(0)(x, y) + 8))
    val pngB = encodeImage(100, 80, "png")(gradient(9))
    val feats = Multimodal.decodeImageFeatures(
      Seq((1L, pngA), (2L, bmpA), (3L, pngA2), (4L, pngB))
        .toDF("media_id", "payload"))
      .collect().map(f => f.media_id -> f.phash).toMap
    assert(feats(1L) == feats(2L),
      "same pixels, different lossless container → identical phash")
    assert(hamming(feats(1L), feats(3L)) <= 8,
      s"slightly brightened image must stay near (got ${hamming(feats(1L), feats(3L))})")
    assert(hamming(feats(1L), feats(4L)) > 8,
      s"different image must be far (got ${hamming(feats(1L), feats(4L))})")
  }

  test("decodeImageFeatures quarantines undecodable payloads instead of crashing") {
    val good = encodeImage(16, 16, "png")((_, _) => 128)
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val got = Multimodal.decodeImageFeatures(
      Seq((1L, good), (2L, junk), (3L, Array.empty[Byte]))
        .toDF("media_id", "payload"))
      .collect()
    assert(got.map(_.media_id).toSeq == Seq(1L),
      "only the decodable payload survives; junk rows drop, no task crash")
  }
}
