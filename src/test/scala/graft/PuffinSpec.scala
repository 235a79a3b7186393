package graft.storage

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Puffin `deletion-vector-v1` encoding to the PUBLIC specs:
  * blob framing (BE length, D1 D3 39 64 magic, CRC-32), the portable
  * 64-bit Roaring layout, and all three 32-bit container kinds on the
  * read side (array, bitmap, run — a foreign writer may emit any).
  * The end-to-end v3 table resolution lives in ForeignReaderSpec; this
  * spec isolates the byte-level kernel.
  */
class PuffinSpec extends AnyFunSuite {

  test("DV blob round-trips sparse positions (array containers)") {
    val ps = Array(0L, 2L, 5L, 65536L, 1000000L)
    assert(Puffin.deserializeDVBlob(Puffin.serializeDVBlob(ps)).toSeq ==
      ps.toSeq)
  }

  test("a dense container (>4096 values) round-trips as a bitmap " +
       "container") {
    val ps = (0L until 5000L).toArray
    assert(Puffin.deserializeDVBlob(Puffin.serializeDVBlob(ps)).toSeq ==
      ps.toSeq)
    // spanning two 16-bit container keys, mixed dense + sparse
    val mixed = ((0L until 4200L) ++ Seq(70000L, 70002L)).toArray
    assert(Puffin.deserializeDVBlob(Puffin.serializeDVBlob(mixed)).toSeq ==
      mixed.toSeq)
  }

  test("positions above 2^32 land in their own high-key bucket") {
    val ps = Array(1L, (1L << 32) + 7L, 5L << 32)
    assert(Puffin.deserializeDVBlob(Puffin.serializeDVBlob(ps)).toSeq ==
      ps.sorted.toSeq)
  }

  test("run containers (cookie 12347) decode — the shape a foreign " +
       "writer's optimizer may emit") {
    val bb = ByteBuffer.allocate(27).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(1L)            // one 32-bit bucket
    bb.putInt(0)              // high key 0
    bb.putInt(12347)          // SERIAL_COOKIE, (1-1)<<16 containers
    bb.put(0x01.toByte)       // container 0 is a run container
    bb.putShort(0)            // container key
    bb.putShort(10)           // cardinality-1 (11 values)
    bb.putShort(1)            // one run
    bb.putShort(10); bb.putShort(10) // start 10, length-1 10 → 10..20
    assert(Puffin.deserializeRoaring64(bb.array()).toSeq == (10L to 20L))
  }

  test("CRC corruption refuses loudly") {
    val blob = Puffin.serializeDVBlob(Array(1L, 2L, 3L))
    blob(blob.length - 1) = (blob(blob.length - 1) ^ 0xFF).toByte
    val e = intercept[IllegalArgumentException](
      Puffin.deserializeDVBlob(blob))
    assert(e.getMessage.contains("CRC-32"))
  }

  test("puffin file: blobs resolve via (offset, length) ranged reads; " +
       "PFA1 magic opens and closes the file; footer JSON is parseable") {
    val dir = Files.createTempDirectory("graft-puffin").toString
    val path = s"$dir/dv.puffin"
    val dv1 = (0L until 100L by 3).toArray
    val dv2 = Array(7L, 8L, 9L)
    val (refs, totalSize) = Puffin.writeDeletionVectorFile(path,
      Seq("file:/data/a.parquet" -> dv1, "file:/data/b.parquet" -> dv2),
      snapshotId = 42L, sequenceNumber = 5L)
    assert(refs.map(_._1) ==
      Seq("file:/data/a.parquet", "file:/data/b.parquet"))
    assert(totalSize ==
      Files.readAllBytes(java.nio.file.Paths.get(path)).length)
    refs.zip(Seq(dv1, dv2)).foreach { case ((_, off, len), expected) =>
      assert(Puffin.readDeletionVector(path, off, len).toSeq ==
        expected.toSeq)
    }
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(new String(bytes.take(4)) == "PFA1")
    assert(new String(bytes.takeRight(4)) == "PFA1")
    // footer payload: [..][payload][size:4 LE][flags:4][magic:4]
    val size = ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    val payload = new String(bytes.slice(
      bytes.length - 12 - size, bytes.length - 12), "UTF-8")
    val json = org.json4s.jackson.JsonMethods.parse(payload)
    val blobs = (json \ "blobs").asInstanceOf[org.json4s.JArray].arr
    assert(blobs.size == 2)
    assert(blobs.forall(b => (b \ "type") ==
      org.json4s.JString("deletion-vector-v1")))
  }

  test("writer emits run containers when run-dense, and a long dense " +
       "run serializes SMALLER than its bitmap") {
    // one full-ish run of 10k consecutive positions: as a bitmap the
    // first container alone is 8 KiB; as runs the whole vector is tiny
    val dense = (100L until 10100L).toArray
    val blob = Puffin.serializeDVBlob(dense)
    assert(blob.length < 200, s"run encoding expected, got ${blob.length}B")
    assert(Puffin.deserializeDVBlob(blob).toSeq == dense.toSeq)
  }

  test("property: random position sets round-trip write → read across " +
       "all three container kinds (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // mixes dense runs (run containers), mid-density scatter (array),
    // and >4096-per-container floods (bitmap), across 16-bit container
    // and 32-bit bucket boundaries
    val genRun = for {
      start <- Gen.chooseNum(0L, 1L << 40)
      len <- Gen.chooseNum(1, 9000)
    } yield (start until start + len).toVector
    val genScatter = Gen.listOf(Gen.chooseNum(0L, 1L << 40)).map(_.toVector)
    val genPositions: Gen[Array[Long]] = for {
      runs <- Gen.listOf(genRun)
      scatter <- genScatter
    } yield (runs.flatten ++ scatter).distinct.sorted.toArray
    val prop = Prop.forAll(genPositions) { ps =>
      Puffin.deserializeDVBlob(Puffin.serializeDVBlob(ps))
        .sameElements(ps)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("run-container output decodes identically in the FOREIGN python " +
       "reader (second decoder, not our own)") {
    assume(new java.io.File("tools/iceberg_reader.py").exists())
    import scala.sys.process._
    val pyOk = scala.util.Try(
      Seq("python3", "-c", "import duckdb").! == 0).getOrElse(false)
    assume(pyOk, "driver-side python3 unavailable")
    // run + array + bitmap containers and a high 32-bit bucket
    val ps = ((100L until 8000L) ++ Seq(70000L, 70002L, 70004L) ++
      (1L << 33 until (1L << 33) + 5000 by 1) ++
      Seq((1L << 33) + 99999L)).toArray.distinct.sorted
    val dir = Files.createTempDirectory("graft-puffin-py").toString
    val blob = Puffin.serializeDVBlob(ps)
    Files.write(java.nio.file.Paths.get(s"$dir/dv.bin"), blob)
    val got = Seq("python3", "-c",
      s"""import sys; sys.path.insert(0, 'tools')
         |import iceberg_reader as r
         |ps = r._dv_positions('$dir/dv.bin', 0, ${blob.length})
         |print(','.join(map(str, ps)))""".stripMargin).!!.trim
    assert(got == ps.mkString(","))
  }
}
