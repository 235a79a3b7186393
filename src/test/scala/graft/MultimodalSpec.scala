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

  // ---- REAL audio decode (JDK javax.sound.sampled codecs) ----

  /** Encode interleaved [-1,1] samples as an audio file via the JDK's
    * own writer. `channels` consecutive samples form one frame.
    */
  private def encodeAudio(samples: Array[Double], sampleRate: Float = 8000f,
                          channels: Int = 1, bits: Int = 16,
                          big: Boolean = false, signed: Boolean = true,
                          aiff: Boolean = false): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bps = bits / 8
    val full = 1L << (bits - 1)
    val pcm = new Array[Byte](samples.length * bps)
    samples.zipWithIndex.foreach { case (s, i) =>
      val q = math.max(-full, math.min(full - 1, math.round(s * full)))
      val v = if (signed) q else q + full
      for (b <- 0 until bps) {
        val shift = if (big) 8 * (bps - 1 - b) else 8 * b
        pcm(i * bps + b) = ((v >> shift) & 0xff).toByte
      }
    }
    val fmt = new AudioFormat(sampleRate, bits, channels, signed, big)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm),
      fmt, samples.length / channels)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais,
      if (aiff) AudioFileFormat.Type.AIFF else AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeAudioFeatures: real WAV decode — duration, rms, peak, zcr") {
    val n = 8000
    val silence = Array.fill(n)(0.0)
    // ±0.5 square wave, period 8 → sign flips every 4 samples
    val square = Array.tabulate(n)(i => if (i % 8 < 4) 0.5 else -0.5)
    val sine = Array.tabulate(n)(i => 0.8 * math.sin(2 * math.Pi * 440 * i / 8000))
    val df = Seq(
      (1L, encodeAudio(silence)),
      (2L, encodeAudio(square)),
      (3L, encodeAudio(sine))).toDF("media_id", "payload")
    val got = Multimodal.decodeAudioFeatures(df)
      .collect().map(f => f.media_id -> f).toMap
    assert(got.size == 3)
    val s = got(1L)
    assert(s.sample_rate == 8000.0 && s.channels == 1 && s.n_frames == n)
    assert(s.duration_s == 1.0 && s.rms == 0.0 && s.peak == 0.0 &&
      s.zero_cross_rate == 0.0, s)
    // 0.5 quantizes exactly at 16 bits (16384/32768)
    assert(got(2L).rms == 0.5 && got(2L).peak == 0.5, got(2L))
    assert(math.abs(got(2L).zero_cross_rate - 0.25) < 0.01, got(2L))
    assert(math.abs(got(3L).rms - 0.8 / math.sqrt(2)) < 0.01, got(3L))
    assert(math.abs(got(3L).peak - 0.8) < 0.01, got(3L))
    // 440 Hz sine crosses zero 2·440 times/s → 880/7999 per step
    assert(math.abs(got(3L).zero_cross_rate - 880.0 / (n - 1)) < 0.005, got(3L))
  }

  test("audio decode: container/word-size invariance and stereo mixdown") {
    val n = 4000
    val sine = Array.tabulate(n)(i => 0.6 * math.sin(2 * math.Pi * 200 * i / 8000))
    val wav16 = encodeAudio(sine)
    // same samples, big-endian AIFF container → identical quantization
    val aiff16 = encodeAudio(sine, big = true, aiff = true)
    // 8-bit unsigned WAV → same signal within quantization error
    val wav8 = encodeAudio(sine, bits = 8, signed = false)
    // stereo with right = -left → mono mixdown is digital silence
    val stereo = Array.tabulate(2 * n)(i =>
      if (i % 2 == 0) sine(i / 2) else -sine(i / 2))
    val wavSt = encodeAudio(stereo, channels = 2)
    val got = Multimodal.decodeAudioFeatures(
      Seq((1L, wav16), (2L, aiff16), (3L, wav8), (4L, wavSt))
        .toDF("media_id", "payload"))
      .collect().map(f => f.media_id -> f).toMap
    assert(got(1L).rms == got(2L).rms,
      "same 16-bit samples, different container/endianness → identical rms")
    assert(got(1L).zero_cross_rate == got(2L).zero_cross_rate)
    assert(math.abs(got(1L).rms - got(3L).rms) < 0.01,
      "8-bit decode within quantization error of 16-bit")
    assert(got(4L).channels == 2 && got(4L).n_frames == n)
    assert(got(4L).rms == 0.0, "anti-phase stereo mixes down to silence")
  }

  test("synthesized real payloads all decode — the m5/m6 query substrate") {
    val ids = Seq(0L, 1L, 6L, 250L, 251L).toDF("id")
    val imgs = Multimodal.decodeImageFeatures(
      Multimodal.synthesizeImagePayloads(ids, "id")).collect()
    assert(imgs.length == 5, "every generated PNG must decode")
    assert(imgs.forall(f => f.width == 32 && f.height == 24))
    assert(imgs.map(_.phash).distinct.length > 1,
      "patterns vary by id — phashes must not collapse")
    val auds = Multimodal.decodeAudioFeatures(
      Multimodal.synthesizeAudioPayloads(ids, "id")).collect()
    assert(auds.length == 5, "every generated WAV must decode")
    assert(auds.forall(a => a.n_frames == 800 && a.sample_rate == 8000.0 &&
      a.channels == 1))
    // id 6 → amp 0.8 sine: rms ≈ 0.8/√2 over full periods
    val a6 = auds.find(_.media_id == 6L).get
    assert(math.abs(a6.rms - 0.8 / math.sqrt(2)) < 0.02, a6)
  }

  test("decodeGifFrames: real multi-frame GIF decode — frame count, " +
       "stride, per-frame phash equals the pre-encode raster's") {
    // a 4-frame animation, sampled at stride 2 → frames 0 and 2
    val gif = Multimodal.encodeGif(2L) // floorMod(2,5)+2 = 4 frames
    val got = Multimodal.decodeGifFrames(
        Seq((2L, gif)).toDF("media_id", "payload"), step = 2)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0, 2), got.toSeq)
    assert(got.forall(f => f.n_frames == 4 && f.width == 24 && f.height == 16))
    // each sampled frame's phash equals the phash of the SAME raster
    // independently encoded as a standalone PNG — proves the GIF path
    // decodes the right frame bit-for-bit (grays survive the palette)
    got.foreach { f =>
      val img = Multimodal.gifFrameImage(2L, f.frame_idx)
      val png = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", png)
      val still = Multimodal.imageFeatures(0L, png.toByteArray).get
      assert(still.phash == f.phash,
        s"frame ${f.frame_idx}: GIF phash ${f.phash} != still ${still.phash}")
    }
    // frames differ from each other (the animation actually animates)
    assert(got.map(_.phash).distinct.length == got.length)
    // stride 1 yields every frame
    assert(Multimodal.decodeGifFrames(
      Seq((2L, gif)).toDF("media_id", "payload"), step = 1).count() == 4)
  }

  test("decodeGifFrames quarantines undecodable payloads; synthesized " +
       "GIFs all decode — the m2b query substrate") {
    val junk = Array.tabulate[Byte](64)(i => (i * 11).toByte)
    val mixed = Multimodal.decodeGifFrames(
        Seq((1L, Multimodal.encodeGif(1L)), (2L, junk),
          (3L, Array.empty[Byte])).toDF("media_id", "payload"), step = 1)
      .collect()
    assert(mixed.map(_.media_id).distinct.toSeq == Seq(1L),
      "only the decodable GIF survives; junk drops, no task crash")
    val ids = Seq(0L, 1L, 4L, 250L, 251L).toDF("id")
    val frames = Multimodal.decodeGifFrames(
      Multimodal.synthesizeGifPayloads(ids, "id"), step = 2).collect()
    // floorMod(id,5)+2 frames each, stride 2 → ceil(n/2) rows
    val expect = Seq(0L, 1L, 4L, 250L, 251L)
      .map(id => (math.floorMod(id, 5L) + 2 + 1) / 2).sum
    assert(frames.length == expect, s"${frames.length} != $expect")
  }

  test("decodeAudioFeatures quarantines undecodable payloads instead of crashing") {
    val good = encodeAudio(Array.fill(100)(0.1))
    val junk = Array.tabulate[Byte](64)(i => (i * 13).toByte)
    val got = Multimodal.decodeAudioFeatures(
      Seq((1L, good), (2L, junk), (3L, Array.empty[Byte]))
        .toDF("media_id", "payload"))
      .collect()
    assert(got.map(_.media_id).toSeq == Seq(1L),
      "only the decodable payload survives; junk rows drop, no task crash")
  }
}
