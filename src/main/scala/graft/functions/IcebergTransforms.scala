package graft.functions

import java.nio.charset.StandardCharsets

/** The Iceberg partition-transform hash kernels, implemented to the
  * PUBLIC spec (iceberg.apache.org/spec — "Partition Transforms" and
  * Appendix B "32-bit Hash Requirements"): `bucket[N](v)` is
  * `(murmur3_x86_32(canonical_bytes(v), seed = 0) & Int.MaxValue) % N`
  * with the spec's canonical byte forms:
  *
  *   - int, long, date (epoch days), time/timestamp (micros):
  *     hash of the 8-byte LITTLE-ENDIAN long (ints widen first, so
  *     `bucket(v: int) == bucket(v: long)` — spec requirement)
  *   - string: hash of the UTF-8 bytes
  *   - binary/fixed: hash of the raw bytes
  *   - decimal: hash of the minimal two's-complement BIG-endian bytes
  *     of the unscaled value
  *
  * This is deliberately NOT Spark's `hash()` (seed 42, different byte
  * handling) and NOT the engine's md5-based `hash60` — it exists so a
  * `write.bucket-by` table's `__bucket` dirs ARE an Iceberg
  * `bucket[N]` partition spec, externally readable with working
  * bucket pruning (the reference's Trino-over-the-cold-tier role,
  * fluss-iceberg/trino/iceberg.properties:1-9). Pinned bit-for-bit by
  * the spec's published test vectors in IcebergTransformsSpec.
  *
  * The murmur3_x86_32 implementation below is the public-domain
  * algorithm (Austin Appleby, MurmurHash3.cpp) specialized to seed 0.
  */
object IcebergTransforms {

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  /** murmur3_x86_32 over `len` bytes of `data`, seed 0. */
  def murmur3(data: Array[Byte], len: Int): Int = {
    var h1 = 0
    val nblocks = len >>> 2
    var i = 0
    while (i < nblocks) {
      val base = i << 2
      var k1 = (data(base) & 0xff) |
        ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) |
        ((data(base + 3) & 0xff) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    val tail = nblocks << 2
    var k1 = 0
    val rem = len & 3
    if (rem >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    // finalize
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Spec hash of an int/long/date/time/timestamp value: murmur3 of
    * the 8-byte little-endian representation.
    */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (v >>> (8 * i)).toByte; i += 1 }
    murmur3(b, 8)
  }

  /** Spec hash of a string: murmur3 of its UTF-8 bytes. */
  def hashUtf8(bytes: Array[Byte]): Int = murmur3(bytes, bytes.length)

  def hashString(s: String): Int =
    hashUtf8(s.getBytes(StandardCharsets.UTF_8))

  /** `bucket[n]` of a long-family value (int/long/date/timestamp). */
  def bucketLong(n: Int, v: Long): Int =
    (hashLong(v) & Integer.MAX_VALUE) % n

  /** `bucket[n]` of a string's UTF-8 bytes (UTF8String-friendly). */
  def bucketUtf8(n: Int, bytes: Array[Byte]): Int =
    (hashUtf8(bytes) & Integer.MAX_VALUE) % n

  def bucketString(n: Int, s: String): Int =
    (hashString(s) & Integer.MAX_VALUE) % n
}
