package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IcebergTransforms

/** Pins [[IcebergTransforms]] bit-for-bit to the PUBLIC Iceberg spec's
  * Appendix-B test vectors (iceberg.apache.org/spec — "Appendix B:
  * 32-bit Hash Requirements"). These are the published values every
  * conforming engine must produce; if they hold, the exported
  * `bucket[N]` partition values are what Trino/Spark+Iceberg compute,
  * and bucket pruning on the exported table is correct.
  */
class IcebergTransformsSpec extends AnyFunSuite {

  test("spec vectors: int/long 34 hash to 2017239379 (widening rule)") {
    assert(IcebergTransforms.hashLong(34L) == 2017239379)
    // ints widen to long before hashing — same value, same hash
    assert(IcebergTransforms.hashLong(34) == 2017239379)
  }

  test("spec vector: string 'iceberg' hashes to 1210000089") {
    assert(IcebergTransforms.hashString("iceberg") == 1210000089)
  }

  test("spec vector: date 2017-11-16 (epoch days) hashes to -653330422") {
    val days = java.time.LocalDate.of(2017, 11, 16).toEpochDay
    assert(days == 17486L)
    assert(IcebergTransforms.hashLong(days) == -653330422)
  }

  test("spec vector: timestamp 2017-11-16T22:31:08 (micros) hashes " +
       "to -2047944441") {
    val micros = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(IcebergTransforms.hashLong(micros) == -2047944441)
  }

  test("bucket[n] = (hash & Int.MaxValue) % n, non-negative, stable " +
       "across int/long forms") {
    for (n <- Seq(1, 2, 7, 16, 128); v <- Seq(-5L, 0L, 34L, 1L << 40)) {
      val b = IcebergTransforms.bucketLong(n, v)
      assert(b >= 0 && b < n, s"bucket($n, $v) = $b out of range")
    }
    // known derivation from the spec vector: hash(34) = 2017239379
    assert(IcebergTransforms.bucketLong(16, 34L) == 2017239379 % 16)
    assert(IcebergTransforms.bucketString(16, "iceberg") == 1210000089 % 16)
  }

  test("murmur3 tail handling: lengths 1..7 differ from any 4-block " +
       "prefix collapse (regression net for the tail branch)") {
    val bytes = "abcdefg".getBytes("UTF-8")
    val hashes = (1 to 7).map(len => IcebergTransforms.murmur3(bytes, len))
    assert(hashes.distinct.size == 7, s"tail collision: $hashes")
  }
}
