package graft.storage

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Iceberg v3 Puffin deletion vectors, from the PUBLIC specs alone
  * (Puffin file format + the `deletion-vector-v1` blob type of the
  * Iceberg v3 table spec; the bitmap is the "portable" 64-bit Roaring
  * serialization of the RoaringFormatSpec). This is the read-side
  * fidelity the reference's shared cold tier exists for
  * (/root/reference/trino/iceberg.properties:1-9): a modern writer
  * (Iceberg 1.8+, format-version 3) emits puffin-backed deletion
  * vectors where v2 wrote position-delete parquet files, and a foreign
  * v3 MoR table must round-trip through [[IcebergExport.readTable]].
  *
  * Blob layout (`deletion-vector-v1`):
  *   - 4 bytes big-endian: combined length of the magic and the vector
  *   - 4-byte magic sequence 0xD1 0xD3 0x39 0x64
  *   - the vector: portable 64-bit Roaring bitmap
  *   - 4 bytes big-endian: CRC-32 of magic + vector
  *
  * Portable 64-bit Roaring: 8-byte little-endian count of 32-bit
  * buckets, then per bucket a 4-byte little-endian high key followed by
  * a standard 32-bit Roaring bitmap (cookie 12346/12347; array, bitmap
  * and run containers — readers must accept all three; this writer
  * emits whichever is smallest per container, runOptimize-style).
  */
object Puffin {

  private val FileMagic: Array[Byte] = "PFA1".getBytes(StandardCharsets.UTF_8)
  private val DvMagic: Array[Byte] =
    Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)

  // ------------------------------------------------ roaring (32-bit leg)

  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347

  /** Serialize sorted distinct unsigned-int low words as one standard
    * 32-bit Roaring bitmap. Per container the smallest of the three
    * encodings wins — a run container (2 + 4·runs bytes) when the
    * values are run-dense, else array (2·card) below 4096 values, else
    * the 8 KiB bitmap — the same size rule RoaringBitmap's own
    * runOptimize applies. With any run container the bitmap uses the
    * SERIAL_COOKIE (12347) layout: run flags after the cookie, and the
    * offset header only at ≥4 containers (NO_OFFSET_THRESHOLD).
    */
  private def serializeRoaring32(values: Array[Int]): Array[Byte] = {
    val containers: Seq[(Int, Array[Int])] = values
      .groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      .map { case (k, vs) => (k, vs.map(_ & 0xFFFF).sorted) }
    val n = containers.size
    def runCount(vs: Array[Int]): Int = {
      var runs = 1
      var i = 1
      while (i < vs.length) { if (vs(i) != vs(i - 1) + 1) runs += 1; i += 1 }
      runs
    }
    val encoded: Seq[(Int, Array[Int], Array[Byte], Boolean)] =
      containers.map { case (k, vs) =>
        val runs = runCount(vs)
        val runSize = 2 + 4 * runs
        val altSize = if (vs.length <= 4096) 2 * vs.length else 8192
        if (runSize < altSize) {
          val b = ByteBuffer.allocate(runSize).order(ByteOrder.LITTLE_ENDIAN)
          b.putShort(runs.toShort)
          var start = vs(0)
          var prev = vs(0)
          var i = 1
          while (i < vs.length) {
            if (vs(i) != prev + 1) {
              b.putShort(start.toShort); b.putShort((prev - start).toShort)
              start = vs(i)
            }
            prev = vs(i)
            i += 1
          }
          b.putShort(start.toShort); b.putShort((prev - start).toShort)
          (k, vs, b.array(), true)
        } else if (vs.length <= 4096) {
          val b = ByteBuffer.allocate(2 * vs.length)
            .order(ByteOrder.LITTLE_ENDIAN)
          vs.foreach(v => b.putShort(v.toShort))
          (k, vs, b.array(), false)
        } else {
          val words = new Array[Long](1024)
          vs.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
          val b = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
          words.foreach(b.putLong)
          (k, vs, b.array(), false)
        }
      }
    val anyRun = encoded.exists(_._4)
    val bodies = encoded.map(_._3)
    if (!anyRun) {
      val headerSize = 8 + 4 * n + 4 * n // cookie+count, desc, offsets
      val out = ByteBuffer
        .allocate(headerSize + bodies.map(_.length).sum)
        .order(ByteOrder.LITTLE_ENDIAN)
      out.putInt(SerialCookieNoRun)
      out.putInt(n)
      encoded.foreach { case (k, vs, _, _) =>
        out.putShort(k.toShort); out.putShort((vs.length - 1).toShort)
      }
      var off = headerSize
      bodies.foreach { b => out.putInt(off); off += b.length }
      bodies.foreach(out.put)
      out.array()
    } else {
      val flags = new Array[Byte]((n + 7) / 8)
      encoded.zipWithIndex.foreach { case ((_, _, _, isRun), i) =>
        if (isRun) flags(i / 8) = (flags(i / 8) | (1 << (i % 8))).toByte
      }
      val hasOffsets = n >= 4
      val headerSize =
        4 + flags.length + 4 * n + (if (hasOffsets) 4 * n else 0)
      val out = ByteBuffer
        .allocate(headerSize + bodies.map(_.length).sum)
        .order(ByteOrder.LITTLE_ENDIAN)
      out.putInt(SerialCookie | ((n - 1) << 16))
      out.put(flags)
      encoded.foreach { case (k, vs, _, _) =>
        out.putShort(k.toShort); out.putShort((vs.length - 1).toShort)
      }
      if (hasOffsets) {
        var off = headerSize
        bodies.foreach { b => out.putInt(off); off += b.length }
      }
      bodies.foreach(out.put)
      out.array()
    }
  }

  /** Decode one standard 32-bit Roaring bitmap from `buf` (position
    * advances past it); returns unsigned values as Int bits.
    */
  private def deserializeRoaring32(buf: ByteBuffer): Array[Int] = {
    val cookie = buf.getInt
    val (n, runFlags, hasOffsets) =
      if ((cookie & 0xFFFF) == SerialCookie) {
        val count = (cookie >>> 16) + 1
        val flags = new Array[Byte]((count + 7) / 8)
        buf.get(flags)
        (count, flags, count >= 4)
      } else {
        require(cookie == SerialCookieNoRun,
          s"not a Roaring bitmap (cookie $cookie)")
        (buf.getInt, new Array[Byte](0), true)
      }
    def isRun(i: Int): Boolean =
      runFlags.nonEmpty && ((runFlags(i / 8) >> (i % 8)) & 1) == 1
    val keysCards = (0 until n).map { _ =>
      (buf.getShort & 0xFFFF, (buf.getShort & 0xFFFF) + 1)
    }
    if (hasOffsets) buf.position(buf.position() + 4 * n) // sequential read
    val out = Array.newBuilder[Int]
    keysCards.zipWithIndex.foreach { case ((key, card), i) =>
      val base = key << 16
      if (isRun(i)) {
        val nRuns = buf.getShort & 0xFFFF
        (0 until nRuns).foreach { _ =>
          val start = buf.getShort & 0xFFFF
          val len = buf.getShort & 0xFFFF
          (start to start + len).foreach(v => out += (base | v))
        }
      } else if (card <= 4096) {
        (0 until card).foreach(_ => out += (base | (buf.getShort & 0xFFFF)))
      } else {
        (0 until 1024).foreach { wi =>
          var w = buf.getLong
          while (w != 0) {
            val b = java.lang.Long.numberOfTrailingZeros(w)
            out += (base | (wi * 64 + b))
            w &= w - 1
          }
        }
      }
    }
    out.result()
  }

  // ---------------------------------------------- roaring (64-bit legs)

  private[storage] def serializeRoaring64(positions: Array[Long]): Array[Byte] = {
    val buckets = positions.distinct.sorted
      .groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
      .map { case (hi, ps) => (hi, serializeRoaring32(ps.map(p => (p & 0xFFFFFFFFL).toInt))) }
    val out = ByteBuffer
      .allocate(8 + buckets.map(4 + _._2.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(buckets.size.toLong)
    buckets.foreach { case (hi, bytes) => out.putInt(hi); out.put(bytes) }
    out.array()
  }

  private[storage] def deserializeRoaring64(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nBuckets = buf.getLong
    val out = Array.newBuilder[Long]
    (0L until nBuckets).foreach { _ =>
      val hi = (buf.getInt.toLong & 0xFFFFFFFFL) << 32
      deserializeRoaring32(buf).foreach(v => out += (hi | (v.toLong & 0xFFFFFFFFL)))
    }
    out.result()
  }

  // -------------------------------------------- deletion-vector-v1 blob

  def serializeDVBlob(positions: Array[Long]): Array[Byte] = {
    val vector = serializeRoaring64(positions)
    val crc = new java.util.zip.CRC32
    crc.update(DvMagic)
    crc.update(vector)
    val out = ByteBuffer.allocate(4 + 4 + vector.length + 4) // BE default
    out.putInt(4 + vector.length)
    out.put(DvMagic)
    out.put(vector)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  def deserializeDVBlob(blob: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(blob) // big-endian default
    val combined = buf.getInt
    // the blob must hold: 4-byte length + `combined` (magic+vector) +
    // 4-byte CRC — so combined can be at most blob.length - 8
    require(combined >= 4 && combined <= blob.length - 8,
      s"deletion vector blob: bad combined length $combined for ${blob.length} bytes")
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(java.util.Arrays.equals(magic, DvMagic),
      s"deletion vector blob: bad magic ${magic.map(b => f"$b%02x").mkString}")
    val vector = new Array[Byte](combined - 4)
    buf.get(vector)
    val stored = buf.getInt
    val crc = new java.util.zip.CRC32
    crc.update(DvMagic)
    crc.update(vector)
    require(crc.getValue.toInt == stored,
      "deletion vector blob: CRC-32 mismatch (corrupt puffin content)")
    deserializeRoaring64(vector)
  }

  // --------------------------------------------------------- puffin file

  /** Write one Puffin file holding one `deletion-vector-v1` blob per
    * referenced data file. Returns, per input DV in order,
    * (referencedDataFile, contentOffset, contentSizeInBytes) — exactly
    * the three v3 manifest-entry fields (ids 143/144/145) an external
    * reader resolves the blob with — plus the total file size (the
    * manifest entry's file_size_in_bytes). Safe to call from executor
    * tasks: no Spark state touched, so a DV-emitting export can write
    * its puffin files where the positions already live.
    */
  def writeDeletionVectorFile(path: String,
                              dvs: Seq[(String, Array[Long])],
                              snapshotId: Long,
                              sequenceNumber: Long): (Seq[(String, Long, Long)], Long) = {
    val blobs = dvs.map { case (ref, ps) => (ref, ps.length, serializeDVBlob(ps)) }
    var offset = FileMagic.length.toLong
    val refs = blobs.map { case (ref, card, bytes) =>
      val r = (ref, offset, bytes.length.toLong, card)
      offset += bytes.length
      r
    }
    def jstr(s: String) =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val footerJson = ("{\"blobs\":[" + refs.map { case (ref, off, len, card) =>
      s"""{"type":"deletion-vector-v1","fields":[],""" +
        s""""snapshot-id":$snapshotId,"sequence-number":$sequenceNumber,""" +
        s""""offset":$off,"length":$len,"properties":{""" +
        s""""referenced-data-file":${jstr(ref)},"cardinality":"$card"}}"""
    }.mkString(",") + "],\"properties\":{\"created-by\":\"graft\"}}")
      .getBytes(StandardCharsets.UTF_8)
    val out = ByteBuffer.allocate(
      FileMagic.length + blobs.map(_._3.length).sum +
        FileMagic.length + footerJson.length + 4 + 4 + FileMagic.length)
    out.put(FileMagic)
    blobs.foreach(b => out.put(b._3))
    out.put(FileMagic)
    out.put(footerJson)
    out.order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(footerJson.length)
    out.putInt(0) // flags: footer payload uncompressed
    out.put(FileMagic)
    TableFs.forPath(path).writeBytes(path, out.array())
    (refs.map { case (ref, off, len, _) => (ref, off, len) },
      out.array().length.toLong)
  }

  /** Resolve one deletion vector from a Puffin file by the manifest
    * entry's (content_offset, content_size_in_bytes) — a ranged read,
    * never the whole file (at scale a Puffin file aggregates many DVs).
    * Safe to call from executor tasks: no Spark state touched.
    */
  def readDeletionVector(path: String, offset: Long, length: Long): Array[Long] = {
    val blob = TableFs.forPath(path).readRange(path, offset, length.toInt)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"puffin file $path (offset $offset, $length bytes)"))
    require(blob.length == length,
      s"puffin $path: ranged read returned ${blob.length} of $length bytes")
    deserializeDVBlob(blob)
  }
}
