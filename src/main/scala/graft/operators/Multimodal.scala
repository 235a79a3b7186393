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
  * deterministic 8×8 average-hash perceptual hash. The AUDIO decode
  * path is REAL too: [[decodeAudioFeatures]] decodes WAV/AIFF/AU PCM
  * payloads with the JDK's own `javax.sound.sampled` stack and
  * extracts duration, RMS loudness, peak, and zero-crossing rate.
  * The container ships no VIDEO codecs, so the general-video leg of
  * the decode remains a clearly-marked deterministic stub
  * ([[decodeStub]] — raw payload bytes interpreted as samples);
  * everything around it — schema, partitioning, the mapPartitions
  * batch shape, the feature schema — is the real production plumbing
  * and is tested. Swap the stub for an ffmpeg binding and nothing else
  * changes. One multi-frame container IS real without any new
  * dependency: ANIMATED GIF, whose frames the JDK's own reader decodes
  * ([[gifFrames]]/[[decodeGifFrames]] — frame count, stride sampling,
  * per-frame perceptual hash).
  *
  * Scale notes: payloads never pass through the driver; feature
  * extraction is a narrow per-partition map (no shuffle); metadata-only
  * transforms ([[resizeMeta]], [[frameSample]]) are pure column ops that
  * never touch payload bytes — Parquet column pruning means a
  * frame-sampling query doesn't even read the binary column.
  */
object Multimodal {

  /** Process-global, set once at object init (first decode/encode in
    * each JVM): ImageIO's default stream cache backs every
    * ImageInputStream/ImageOutputStream with a TEMP FILE — one
    * create+write+delete per image encoded or decoded. Every payload
    * here is an in-memory byte array, so the file cache is pure
    * overhead (guide §4.5: per-row heavyweight setup); heap-backed
    * streams produce bit-identical rasters and bytes.
    */
  javax.imageio.ImageIO.setUseCache(false)

  /** Thread-local ImageReader cache, keyed by container format: the
    * JDK readers are reusable across images via `setInput` but not
    * thread-safe, and `ImageIO.read`'s per-call provider probe +
    * reader instantiation is per-row overhead at decode volume
    * (guide §4.5 — initialise heavyweight state once per task, not
    * per row). Bounded: ≤4 formats per executor thread.
    */
  private val readerCache =
    ThreadLocal.withInitial[scala.collection.mutable.HashMap[
      String, javax.imageio.ImageReader]](() =>
      scala.collection.mutable.HashMap.empty)

  private def cachedReader(fmt: String): javax.imageio.ImageReader =
    readerCache.get().getOrElseUpdate(fmt,
      javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next())

  /** Container sniff from magic bytes — selects the cached reader; an
    * unrecognized magic falls back to ImageIO's own provider probing
    * (identical result, per-row cost).
    */
  private def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte &&
        b(2) == 'N'.toByte && b(3) == 'G'.toByte) "png"
    else if (b.length >= 6 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
        b(2) == 'F'.toByte && b(3) == '8'.toByte) "gif"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      "jpeg"
    else if (b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) "bmp"
    else null

  /** The JDK's audio file readers, resolved ONCE per JVM through the
    * public ServiceLoader SPI (java.desktop `provides … AudioFileReader`
    * — no JDK-internal API): `AudioSystem.getAudioInputStream` walks
    * the same provider list per call, paying an exception-throw per
    * non-matching container per row. Each probe gets a fresh
    * ByteArrayInputStream, so provider order cannot change which
    * reader ACCEPTS a given container (only one JDK reader accepts
    * each format); empty loader → AudioSystem fallback.
    */
  private lazy val audioFileReaders
      : Seq[javax.sound.sampled.spi.AudioFileReader] =
    try {
      import scala.jdk.CollectionConverters.IterableHasAsScala
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .asScala.toSeq
    } catch { case scala.util.control.NonFatal(_) => Nil }

  private def openAudio(payload: Array[Byte])
      : Option[javax.sound.sampled.AudioInputStream] = {
    if (audioFileReaders.isEmpty)
      return (
        try Some(javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload)))
        catch { case scala.util.control.NonFatal(_) => None })
    val it = audioFileReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      try return Some(r.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload)))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
        case _: java.io.IOException => ()
      }
    }
    None
  }

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
  private def lumaAt(im: java.awt.image.BufferedImage,
                     x: Int, y: Int): Double = {
    val rgb = im.getRGB(x, y)
    // ITU-R BT.601 luma from the sRGB bytes
    (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
      0.114 * (rgb & 0xff)) / 255.0
  }

  /** Mean luminance over a bounded sample grid (≤ 64×64 nearest-
    * sampled pixels): O(1) per image regardless of resolution, exact
    * on images smaller than the grid.
    */
  private def meanLuma(im: java.awt.image.BufferedImage): Double = {
    val w = im.getWidth; val h = im.getHeight
    val gw = math.min(64, w)
    val gh = math.min(64, h)
    var sum = 0.0
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw) {
        sum += lumaAt(im,
          (2 * gx + 1) * w / (2 * gw), (2 * gy + 1) * h / (2 * gh))
        gx += 1
      }
      gy += 1
    }
    sum / (gw * gh)
  }

  /** The classic 8×8 AVERAGE-HASH perceptual hash: cell luma at fixed
    * grid centers, mean-thresholded — nearest-neighbor sampling, no
    * resampling filter, so the bits are deterministic across JVMs.
    */
  private def avgHash(im: java.awt.image.BufferedImage): Long = {
    val w = im.getWidth; val h = im.getHeight
    val cells = new Array[Double](64)
    var i = 0
    while (i < 64) {
      cells(i) = lumaAt(im,
        (2 * (i % 8) + 1) * w / 16, (2 * (i / 8) + 1) * h / 16)
      i += 1
    }
    val mean = cells.sum / 64
    var phash = 0L
    i = 0
    while (i < 64) {
      if (cells(i) >= mean) phash |= (1L << i)
      i += 1
    }
    phash
  }

  /** Decode via the thread-cached reader for a sniffed container
    * (`ImageIO.read`'s exact setInput contract: seekForwardOnly,
    * ignoreMetadata — same decode, no per-row provider probe or
    * reader instantiation); unknown magic falls back to
    * `ImageIO.read`. Undecodable → None, as before.
    */
  private def decodeImage(payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] = {
    val fmt = sniffFormat(payload)
    if (fmt == null)
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    else {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val r = cachedReader(fmt)
        try {
          r.setInput(iis, true, true)
          Option(r.read(0))
        } catch { case scala.util.control.NonFatal(_) => None }
        finally r.setInput(null) // never pin a closed stream
      } finally iis.close()
    }
  }

  private[graft] def imageFeatures(id: Long,
                                   payload: Array[Byte]): Option[ImageFeatures] =
    decodeImage(payload).map { im =>
      ImageFeatures(id, im.getWidth, im.getHeight, payload.length,
        meanLuma(im), avgHash(im))
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

  /** Deterministic REAL-PNG payload for an id: a 32×24 gray gradient
    * whose pattern varies by id — a genuine JDK-encoded PNG, so the
    * decode path under test is the production one.
    */
  private[graft] def encodePng(id: Long): Array[Byte] = {
    val w = 32; val h = 24
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (x * 3 + y * 5 + (id % 251).toInt * 37) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** One sampled frame of one decoded ANIMATED GIF (the real-codec
    * multi-frame path).
    */
  case class GifFrameFeatures(media_id: Long, n_frames: Int, frame_idx: Int,
                              width: Int, height: Int, phash: Long)

  /** REAL animated-GIF frame sampling — the JDK's GIF `ImageReader`
    * decodes every frame of a multi-frame stream
    * (`getNumImages`/`read(i)`), which makes the video-pipeline
    * frame-sample leg REAL for one container format without any new
    * dependency (the ffmpeg-backed legs stay documented stubs). Every
    * `step`-th frame is decoded and perceptually hashed with the same
    * 8×8 average-hash as the still-image path. Frames are read as the
    * codec hands them (our synthesized GIFs are full frames; GIFs
    * using partial-frame disposal hash the partial raster — a
    * documented, deterministic choice). Undecodable payloads return
    * None (quarantine, never a task crash).
    */
  private[graft] def gifFrames(id: Long, payload: Array[Byte],
                               step: Int): Option[Seq[GifFrameFeatures]] =
    try {
      // sniffed GIF → the thread-cached reader (same default setInput
      // flags as before: random access, metadata on — getNumImages
      // needs both); other magics keep the per-row provider probe
      val cached = sniffFormat(payload) == "gif"
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val r =
        if (cached) cachedReader("gif")
        else {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); return None }
          readers.next()
        }
      try {
        r.setInput(iis)
        val n = r.getNumImages(true)
        Some((0 until n by step).map { i =>
          val im = r.read(i)
          GifFrameFeatures(id, n, i, im.getWidth, im.getHeight, avgHash(im))
        })
      } finally {
        if (cached) r.setInput(null) else r.dispose()
        iis.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Partition-wise REAL GIF frame decode: one narrow iterator pass,
    * payloads never leave their executor, one output row per sampled
    * frame. Same scale shape as [[decodeImageFeatures]].
    */
  def decodeGifFrames(media: DataFrame, step: Int): Dataset[GifFrameFeatures] = {
    require(step >= 1, "frame-sample step must be ≥ 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        gifFrames(id, bytes, step).getOrElse(Nil) })
  }

  /** One frame image of the deterministic synthetic animation: a
    * gray gradient whose pattern varies by (id, frame). Grays survive
    * GIF's 256-color palette exactly, so a decoded frame's pixels —
    * and therefore its average-hash — equal the pre-encode raster's.
    */
  private[graft] def gifFrameImage(id: Long, f: Int): java.awt.image.BufferedImage = {
    val w = 24; val h = 16
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (x * 7 + y * 13 + f * 29 + (id % 251).toInt * 37) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Deterministic REAL multi-frame GIF payload for an id (2–6 frames):
    * a genuine animated GIF written frame-by-frame through the JDK's
    * own sequence writer, so the multi-frame decode path under test is
    * the production one.
    */
  private[graft] def encodeGif(id: Long): Array[Byte] = {
    val n = (math.floorMod(id, 5L) + 2).toInt
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until n).foreach { f =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(gifFrameImage(id, f), null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  def synthesizeGifPayloads(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Scale.widen(df.select(col(idCol).cast("long").as("media_id")))
      .as[Long].mapPartitions(_.map(id => (id, encodeGif(id))))
      .toDF("media_id", "payload")
  }

  /** Deterministic REAL-WAV payload for an id: 0.1 s of a 16-bit mono
    * 8 kHz sine whose frequency/amplitude derive from the id — a
    * genuine RIFF/WAVE container written by the JDK's own writer.
    */
  private[graft] def encodeWav(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = 800
    val sr = 8000f
    val freq = 100.0 + (id % 40) * 20.0 // 100–880 Hz
    val amp = 0.2 + (id % 7) * 0.1      // 0.2–0.8
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = math.round(amp * math.sin(2 * math.Pi * freq * i / sr) * 32768).toInt
      val q = math.max(-32768, math.min(32767, s))
      pcm(2 * i) = (q & 0xff).toByte
      pcm(2 * i + 1) = ((q >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sr, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Real-encoded media corpora derived from an id column — the
    * [[synthesize]] stance with GENUINE payload bytes, so [[
    * decodeImageFeatures]]/[[decodeAudioFeatures]] exercise the real
    * codec end-to-end at any scale. Encoding is a narrow partition-wise
    * map; payloads are born and consumed executor-side.
    */
  def synthesizeImagePayloads(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Scale.widen(df.select(col(idCol).cast("long").as("media_id")))
      .as[Long].mapPartitions(_.map(id => (id, encodePng(id))))
      .toDF("media_id", "payload")
  }

  def synthesizeAudioPayloads(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Scale.widen(df.select(col(idCol).cast("long").as("media_id")))
      .as[Long].mapPartitions(_.map(id => (id, encodeWav(id))))
      .toDF("media_id", "payload")
  }

  /** One decoded AUDIO clip's features (the real-codec path). */
  case class AudioFeatures(media_id: Long, sample_rate: Double, channels: Int,
                           n_frames: Long, duration_s: Double, n_bytes: Int,
                           rms: Double, peak: Double, zero_cross_rate: Double)

  /** REAL audio decode — the JDK's own `javax.sound.sampled` stack
    * (WAV/AIFF/AU containers with PCM payloads ship with every JVM;
    * μ-law/a-law payloads convert through the JDK's codec). The
    * container's "no codec libs" constraint now binds only VIDEO,
    * which keeps [[decodeStub]].
    *
    * Features per clip, over the channel-averaged (mono-mixdown)
    * signal normalized to [-1, 1]:
    *  - `rms`: root-mean-square level — the standard loudness proxy
    *  - `peak`: max absolute sample
    *  - `zero_cross_rate`: sign changes per adjacent-sample step —
    *    the classic cheap voiced/unvoiced + noisiness signal (exact
    *    zeros keep the previous sign, so digital silence contributes
    *    no crossings)
    * plus the container facts: sample rate, channel count, frame
    * count, duration. Decode streams the PCM in bounded chunks — no
    * whole-clip sample buffer is materialized.
    *
    * Undecodable payloads return None (quarantine rows, never a task
    * crash — the [[imageFeatures]] stance applied to audio).
    */
  private[graft] def audioFeatures(id: Long,
                                   payload: Array[Byte]): Option[AudioFeatures] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val opened =
      try {
        openAudio(payload).flatMap { raw =>
          val enc = raw.getFormat.getEncoding
          // non-PCM payloads (μ-law/a-law) route through the JDK's
          // converter; raw PCM passes through untouched
          if (enc == AudioFormat.Encoding.PCM_SIGNED ||
              enc == AudioFormat.Encoding.PCM_UNSIGNED) Some(raw)
          else Some(AudioSystem.getAudioInputStream(
            AudioFormat.Encoding.PCM_SIGNED, raw))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    opened.flatMap { ais =>
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        val big = fmt.isBigEndian
        val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        if ((bits != 8 && bits != 16 && bits != 24 && bits != 32) || ch < 1)
          None
        else {
          val bps = bits / 8          // bytes per single-channel sample
          val frameBytes = bps * ch
          val full = (1L << (bits - 1)).toDouble // full-scale magnitude
          val shift = 64 - bits                  // sign-extension shift
          // one channel's sample at byte offset `off`, in [-1, 1]
          def sampleAt(b: Array[Byte], off: Int): Double = {
            var v = 0L
            if (big) {
              var i = 0
              while (i < bps) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
            } else {
              var i = bps - 1
              while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
            }
            val s = if (signed) (v << shift) >> shift else v - (1L << (bits - 1))
            s / full
          }
          // bounded-chunk streaming decode with partial-frame carry —
          // a clip never materializes as one sample array
          val buf = new Array[Byte](frameBytes * 4096)
          var carry = 0
          var nFrames = 0L
          var sumSq = 0.0
          var peak = 0.0
          var crossings = 0L
          var prevSign = 0
          var eof = false
          while (!eof) {
            val n = ais.read(buf, carry, buf.length - carry)
            if (n <= 0) eof = true
            else {
              val avail = carry + n
              val frames = avail / frameBytes
              var f = 0
              while (f < frames) {
                var acc = 0.0
                var c = 0
                while (c < ch) { acc += sampleAt(buf, f * frameBytes + c * bps); c += 1 }
                val mono = acc / ch
                sumSq += mono * mono
                val abs = math.abs(mono)
                if (abs > peak) peak = abs
                val sign = if (mono > 0) 1 else if (mono < 0) -1 else prevSign
                if (prevSign != 0 && sign != prevSign) crossings += 1
                prevSign = sign
                f += 1
              }
              carry = avail - frames * frameBytes
              if (carry > 0)
                System.arraycopy(buf, frames * frameBytes, buf, 0, carry)
              nFrames += frames
            }
          }
          if (nFrames == 0) None
          else Some(AudioFeatures(id, fmt.getSampleRate.toDouble, ch, nFrames,
            nFrames / fmt.getSampleRate.toDouble, payload.length,
            math.sqrt(sumSq / nFrames), peak,
            if (nFrames > 1) crossings.toDouble / (nFrames - 1) else 0.0))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally ais.close()
    }
  }

  /** Partition-wise REAL audio decode over (media_id, payload) — same
    * dataflow shape as [[decodeImageFeatures]] (narrow iterator map,
    * payloads never leave their executor); rows no JDK audio reader
    * accepts are dropped (count the diff for quarantine metrics).
    */
  def decodeAudioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => audioFeatures(id, bytes) })
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
