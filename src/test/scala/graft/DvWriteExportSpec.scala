package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{IcebergExport, TieredTable}

/** The format-version-3 DELETION-VECTOR WRITE path: the engine's own
  * merge-on-read export emitting puffin `deletion-vector-v1` blobs
  * (positions of rows superseded by later-sequence versions of the
  * same key) instead of v2 equality-delete parquet — the artifacts an
  * Iceberg 1.8+ writer leaves. Closes the write half of the round-11
  * read-side work (storage/Puffin.scala): the reference's shared cold
  * tier (/root/reference/trino/iceberg.properties:1-9) is read AND
  * written by current-generation engines, so fidelity matters in both
  * directions.
  *
  * Also pins the vacuum interaction this spec's work surfaced: a
  * retention pass that drops the writing snapshot of a still-live
  * delta must not collapse its data sequence (the dir's snap-%06d
  * name is the vacuum-proof source), or external readers resurrect
  * every superseded row.
  */
class DvWriteExportSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val pythonOk: Boolean =
    try scala.sys.process.Process(
      Seq("python3", "-c", "import duckdb")).! == 0
    catch { case _: Throwable => false }

  private def runReader(args: Seq[String]): Map[String, Any] = {
    val out = new StringBuilder
    val code = scala.sys.process.Process(
      Seq("python3", "tools/iceberg_reader.py") ++ args)
      .!(scala.sys.process.ProcessLogger(l => { out.append(l); () },
        l => { out.append(l); () }))
    assert(code == 0, s"foreign reader exit $code: $out")
    val json = org.json4s.jackson.JsonMethods.parse(out.toString)
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    json.extract[Map[String, Any]]
  }

  private def dump(df: org.apache.spark.sql.DataFrame, dir: String): String = {
    df.write.mode("overwrite").parquet(dir)
    s"$dir/*.parquet"
  }

  /** Three overlapping upsert waves → last-write-wins fixture. */
  private def threeWaves(dir: String): TieredTable = {
    val t = TieredTable(spark, s"$dir/t", pk = Seq("id"), mergeOnRead = true)
    t.commitUpsert(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "amt"))                                     // seq 1
    t.commitUpsert(Seq((2L, "B2", 22L), (4L, "d", 40L))
      .toDF("id", "v", "amt"))                                     // seq 2
    t.commitUpsert(Seq((1L, "A3", 11L)).toDF("id", "v", "amt"))    // seq 3
    t
  }
  private val resolved =
    Set((1L, "A3", 11L), (2L, "B2", 22L), (3L, "c", 30L), (4L, "d", 40L))

  test("v3 export: the engine's OWN export emits puffin DVs — delete " +
       "manifests carry PUFFIN entries with fields 143-145, no " +
       "equality content, and the chain resolves last-write-wins") {
    val dir = Files.createTempDirectory("graft-dvw").toString
    val t = threeWaves(dir)
    IcebergExport.export(t, formatVersion = 3)
    val mdir = s"${t.tablePath}/metadata"

    val hint = Files.readString(java.nio.file.Paths.get(
      s"$mdir/version-hint.text")).trim.toInt
    assert(Files.readString(java.nio.file.Paths.get(
      f"$mdir/v$hint%05d.metadata.json")).contains("\"format-version\":3"))

    // the head's delete manifest: every entry is a puffin DV (content
    // 1, PUFFIN, 143-145 populated); no equality deletes anywhere
    val delEntries = IcebergExport
      .readAvro(s"$mdir/manifest-del-000003.avro")._1
      .map(_.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord])
    assert(delEntries.nonEmpty)
    delEntries.foreach { df =>
      assert(df.get("content") == 1, df.toString)
      assert(df.get("file_format").toString == "PUFFIN")
      assert(df.get("referenced_data_file") != null)
      assert(df.get("content_offset") != null)
      assert(df.get("content_size_in_bytes") != null)
      // the referenced blob is decodable at exactly that range
      val ps = graft.storage.Puffin.readDeletionVector(
        df.get("file_path").toString,
        df.get("content_offset").asInstanceOf[Long],
        df.get("content_size_in_bytes").asInstanceOf[Long])
      assert(ps.length ==
        df.get("record_count").asInstanceOf[Long], df.toString)
    }
    // no eqdel dirs in a pure-v3 export
    assert(!new java.io.File(mdir).listFiles()
      .exists(_.getName.startsWith("eqdel-")))

    // resolution: superseded versions gone, winners intact
    assert(IcebergExport.readTable(spark, t.tablePath)
      .as[(Long, String, Long)].collect().toSet == resolved)
    // time travel: snapshot 2's DV set resolves THAT state
    assert(IcebergExport.readTable(spark, t.tablePath,
        asOfSnapshotId = Some(2L))
      .as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 10L), (2L, "B2", 22L), (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("v3-exported table round-trips through the FOREIGN python " +
       "reader (tools/iceberg_reader.py resolves OUR write)") {
    assume(pythonOk, "driver-side python3+duckdb unavailable")
    val dir = Files.createTempDirectory("graft-dvw-py").toString
    val t = threeWaves(dir)
    IcebergExport.export(t, formatVersion = 3)
    val r = runReader(Seq(t.tablePath, "--compare",
      dump(resolved.toSeq.toDF("id", "v", "amt"), s"$dir/expected")))
    assert(r("rows") == 4 && r("match") == true, r.toString)
    assert(r("deletes").toString.toInt >= 1, s"DV entries applied: $r")
  }

  test("format-version switch forces a re-export; same-version " +
       "re-export is the fingerprint no-op") {
    val dir = Files.createTempDirectory("graft-dvw-sw").toString
    val t = threeWaves(dir)
    val v2loc = IcebergExport.export(t)
    val v3loc = IcebergExport.export(t, formatVersion = 3)
    assert(v2loc != v3loc, "switching to v3 must write a new version")
    assert(IcebergExport.export(t, formatVersion = 3) == v3loc,
      "unchanged v3 re-export must be a no-op")
    assert(IcebergExport.readTable(spark, t.tablePath)
      .as[(Long, String, Long)].collect().toSet == resolved)
  }

  test("vacuum of an UNCOMPACTED merge-on-read table: the export keeps " +
       "each surviving delta's original data sequence (dir-name " +
       "vintage), so external readers do not resurrect superseded " +
       "rows — both format versions") {
    for (fv <- Seq(2, 3)) {
      val dir = Files.createTempDirectory(s"graft-dvw-vac$fv").toString
      val t = threeWaves(dir)
      t.vacuum(keepLast = 1) // head still references all three deltas
      IcebergExport.export(t, fv)
      assert(IcebergExport.readTable(spark, t.tablePath)
        .as[(Long, String, Long)].collect().toSet == resolved,
        s"format-version $fv after vacuum")
    }
  }

  test("expire + re-export: expired snapshots' dv-snap artifacts are " +
       "GC'd, and every puffin blob a RETAINED delete manifest " +
       "references still exists (no dangling DV after retention)") {
    val dir = Files.createTempDirectory("graft-dvw-gc").toString
    val t = threeWaves(dir)
    IcebergExport.export(t, formatVersion = 3)
    val mdir = s"${t.tablePath}/metadata"
    def dvFiles: Set[String] = new java.io.File(mdir).listFiles()
      .map(_.getName).filter(_.startsWith("dv-snap-")).toSet
    assert(dvFiles.exists(_.startsWith("dv-snap-000002")))
    assert(dvFiles.exists(_.startsWith("dv-snap-000003")))

    t.vacuum(keepLast = 1) // drops snapshots 1 and 2
    IcebergExport.export(t, formatVersion = 3)
    assert(!dvFiles.exists(_.startsWith("dv-snap-000002")),
      "expired snapshot 2's DV artifacts must be reclaimed")
    assert(dvFiles.exists(_.startsWith("dv-snap-000003")),
      "the retained head's DV artifacts must survive")

    // every blob the retained chain references resolves — decode each
    val delEntries = IcebergExport
      .readAvro(s"$mdir/manifest-del-000003.avro")._1
      .map(_.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord])
    assert(delEntries.nonEmpty)
    delEntries.foreach { df =>
      graft.storage.Puffin.readDeletionVector(
        df.get("file_path").toString,
        df.get("content_offset").asInstanceOf[Long],
        df.get("content_size_in_bytes").asInstanceOf[Long])
    }
    assert(IcebergExport.readTable(spark, t.tablePath)
      .as[(Long, String, Long)].collect().toSet == resolved)
  }

  test("PARTITIONED merge-on-read v3 export: DVs are scoped to their " +
       "referenced file's partition and the chain resolves — the q24 " +
       "combination under deletion vectors") {
    val dir = Files.createTempDirectory("graft-dvw-part").toString
    val t = TieredTable(spark, s"$dir/t", pk = Seq("id", "region"),
      mergeOnRead = true, partitionBy = Seq("region"))
    t.commitUpsert(Seq((1L, "eu", 10L), (2L, "us", 20L), (3L, "eu", 30L))
      .toDF("id", "region", "amt"))                              // seq 1
    t.commitUpsert(Seq((1L, "eu", 11L), (4L, "us", 40L))
      .toDF("id", "region", "amt"))                              // seq 2
    IcebergExport.export(t, formatVersion = 3)
    val mdir = s"${t.tablePath}/metadata"
    val delEntries = IcebergExport
      .readAvro(s"$mdir/manifest-del-000002.avro")._1
      .map(_.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord])
    assert(delEntries.nonEmpty)
    delEntries.foreach { df =>
      assert(df.get("file_format").toString == "PUFFIN")
      // the DV entry carries its referenced file's identity partition
      val part = df.get("partition")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
      assert(part.get("region") != null, df.toString)
      assert(df.get("referenced_data_file").toString
        .contains(s"region=${part.get("region")}"), df.toString)
    }
    assert(IcebergExport.readTable(spark, t.tablePath)
      .select("id", "region", "amt").as[(Long, String, Long)]
      .collect().toSet ==
      Set((1L, "eu", 11L), (2L, "us", 20L), (3L, "eu", 30L),
        (4L, "us", 40L)))
    if (pythonOk) {
      val r = runReader(Seq(t.tablePath, "--compare",
        dump(Seq((1L, "eu", 11L), (2L, "us", 20L), (3L, "eu", 30L),
          (4L, "us", 40L)).toDF("id", "region", "amt"), s"$dir/expected")))
      assert(r("rows") == 4 && r("match") == true, r.toString)
    }
  }

  test("BUCKETED merge-on-read v3 export: DVs ride the bucket[N] spec " +
       "(the q33/q34 layout under deletion vectors) and an upsert wave " +
       "with NO overlapping keys emits an empty-but-valid delete " +
       "manifest") {
    val dir = Files.createTempDirectory("graft-dvw-bkt").toString
    val t = TieredTable(spark, s"$dir/t", pk = Seq("id"),
      mergeOnRead = true, bucketBy = 4)
    t.commitUpsert(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "v"))                                          // seq 1
    t.commitUpsert(Seq((4L, "d"), (5L, "e")).toDF("id", "v"))    // seq 2:
                                           // disjoint keys — no deletions
    t.commitUpsert(Seq((2L, "B3")).toDF("id", "v"))              // seq 3
    IcebergExport.export(t, formatVersion = 3)
    val mdir = s"${t.tablePath}/metadata"
    // seq-2's delete manifest exists (later dirs supersede) but its DV
    // set is EMPTY — no key overlapped; seq-3's carries the id=2 DV
    val del2 = IcebergExport.readAvro(s"$mdir/manifest-del-000002.avro")._1
    assert(del2.isEmpty, s"disjoint wave must emit no DVs: $del2")
    val del3 = IcebergExport.readAvro(s"$mdir/manifest-del-000003.avro")._1
      .map(_.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord])
    assert(del3.nonEmpty)
    assert(del3.forall(_.get("file_format").toString == "PUFFIN"))
    assert(del3.map(_.get("record_count").asInstanceOf[Long]).sum == 1L,
      "exactly the superseded id=2 row is deleted")
    assert(IcebergExport.readTable(spark, t.tablePath)
      .select("id", "v").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B3"), (3L, "c"), (4L, "d"), (5L, "e")))
  }

  test("range read PRUNES merge-on-read tables under both delete " +
       "representations: deletes are file-local in the anti-join " +
       "formulation, so readTableWhereLong scans fewer files and " +
       "returns exactly filter(full read)") {
    for (fv <- Seq(2, 3)) {
      val dir = Files.createTempDirectory(s"graft-dvw-prune$fv").toString
      val t = TieredTable(spark, s"$dir/t", pk = Seq("id"),
        mergeOnRead = true)
      // three id bands in separate commits → three data files with
      // tight [min,max]; wave 4 supersedes one key per band
      t.commitUpsert((1L to 100L).map(i => (i, s"a$i"))
        .toDF("id", "v").coalesce(1))                             // seq 1
      t.commitUpsert((1001L to 1100L).map(i => (i, s"b$i"))
        .toDF("id", "v").coalesce(1))                             // seq 2
      t.commitUpsert((2001L to 2100L).map(i => (i, s"c$i"))
        .toDF("id", "v").coalesce(1))                             // seq 3
      t.commitUpsert(Seq((50L, "A"), (1050L, "B"), (2050L, "C"))
        .toDF("id", "v").coalesce(1))                             // seq 4
      IcebergExport.export(t, fv)

      val full = IcebergExport.readTable(spark, t.tablePath)
      val pruned = IcebergExport.readTableWhereLong(
        spark, t.tablePath, "id", 1001L, 1100L)
      // answers first: identical to filter(full), superseded id=1050
      // resolved to its wave-4 version
      val expect = full
        .filter(org.apache.spark.sql.functions.col("id")
          .between(1001L, 1100L))
        .as[(Long, String)].collect().toSet
      assert(pruned.as[(Long, String)].collect().toSet == expect)
      assert(expect.contains((1050L, "B")) && expect.size == 100)
      // and the plan reads FEWER data files than the full scan — the
      // band predicate prunes the other two bands' files
      assert(pruned.inputFiles.length < full.inputFiles.length,
        s"fv$fv: expected pruning, got ${pruned.inputFiles.length} of " +
          s"${full.inputFiles.length} files")
    }
  }

  test("BUCKET-RESIDENT v3 export: executors write the puffin DV files " +
       "into the object store and the chain resolves from bucket " +
       "objects alone — the full-stack composition under deletion " +
       "vectors") {
    val base = ObjectStoreStub.freshBucketFsUrl() + "/dvw"
    val t = TieredTable(spark, base, pk = Seq("id"), mergeOnRead = true)
    t.commitUpsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))  // seq 1
    t.commitUpsert(Seq((2L, "B2"), (3L, "c")).toDF("id", "v")) // seq 2
    val mloc = IcebergExport.export(t, formatVersion = 3)
    assert(mloc.startsWith("graftos://"), mloc)
    val keys = ObjectStoreStub.keysUnder(
      base.replaceFirst("^graftos://[^/]+/", ""))
    assert(keys.exists(k => k.contains("metadata/dv-snap-") &&
      k.endsWith(".puffin")),
      s"puffin DV files must be bucket objects: ${keys.filter(
        _.contains("metadata")).mkString(", ")}")
    assert(IcebergExport.readTable(spark, base)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B2"), (3L, "c")),
      "the DV-carrying chain must resolve from bucket objects alone")
  }

  test("pruned read where EVERY DV's referenced file is pruned: the " +
       "decode is skipped entirely and the kept band reads unchanged") {
    val dir = Files.createTempDirectory("graft-dvw-prune0").toString
    val t = TieredTable(spark, s"$dir/t", pk = Seq("id"),
      mergeOnRead = true)
    t.commitUpsert((1L to 100L).map(i => (i, s"a$i"))
      .toDF("id", "v").coalesce(1))                             // seq 1
    t.commitUpsert((1001L to 1100L).map(i => (i, s"b$i"))
      .toDF("id", "v").coalesce(1))                             // seq 2
    t.commitUpsert(Seq((50L, "A")).toDF("id", "v").coalesce(1)) // seq 3:
                                           // supersedes band 1 only
    IcebergExport.export(t, formatVersion = 3)
    // range over band 2: band 1 and the wave file ([50,50]) prune out,
    // so the ONLY DV (on band 1's file) references a pruned file —
    // zero decodable descriptors, and the kept band must read intact
    val pruned = IcebergExport.readTableWhereLong(
      spark, t.tablePath, "id", 1001L, 1100L)
    assert(pruned.as[(Long, String)].collect().toSet ==
      (1001L to 1100L).map(i => (i, s"b$i")).toSet)
    assert(pruned.inputFiles.length == 1, pruned.inputFiles.toSeq)
  }

  test("HAND-BUILT v3 table: a DV blob and puffin file encoded " +
       "byte-by-byte in the spec (second encoder — not " +
       "attachDeletionVectors) resolve identically in both readers") {
    import java.nio.{ByteBuffer, ByteOrder}
    import org.apache.avro.generic.GenericData
    val dir = Files.createTempDirectory("graft-dvw-hand").toString
    val t = TieredTable(spark, s"$dir/t")
    t.commitAppend(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "v").coalesce(1)) // one data file, rows 0..2
    IcebergExport.export(t)
    val mdir = s"${t.tablePath}/metadata"
    val dataFile = IcebergExport.readAvro(s"$mdir/manifest-000001.avro")._1
      .map(_.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord])
      .map(_.get("file_path").toString).head

    // ---- the blob, by hand: positions {0, 2} as one array container
    val roaring32 = ByteBuffer.allocate(8 + 4 + 4 + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    roaring32.putInt(12346)   // SERIAL_COOKIE_NO_RUNCONTAINER
    roaring32.putInt(1)       // one container
    roaring32.putShort(0)     // key 0
    roaring32.putShort(1)     // cardinality-1 = 1 (2 values)
    roaring32.putInt(16)      // container body offset (8+4+4 header)
    roaring32.putShort(0); roaring32.putShort(2) // values 0, 2
    val vector = ByteBuffer.allocate(8 + 4 + roaring32.capacity())
      .order(ByteOrder.LITTLE_ENDIAN)
    vector.putLong(1L)        // one 32-bit bucket
    vector.putInt(0)          // high key 0
    vector.put(roaring32.array())
    val magic = Array(0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)
    val crc = new java.util.zip.CRC32
    crc.update(magic); crc.update(vector.array())
    val blob = ByteBuffer.allocate(4 + 4 + vector.capacity() + 4)
    blob.putInt(4 + vector.capacity()) // BE combined length
    blob.put(magic).put(vector.array())
    blob.putInt(crc.getValue.toInt)

    // ---- the puffin file, by hand: PFA1 | blob | PFA1 footer PFA1
    val pfa1 = "PFA1".getBytes("UTF-8")
    val dvPath = s"$mdir/hand-dv.puffin"
    def jstr(s: String) =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val footer = (s"""{"blobs":[{"type":"deletion-vector-v1","fields":[],""" +
      s""""snapshot-id":1,"sequence-number":1,"offset":4,""" +
      s""""length":${blob.capacity()},"properties":{""" +
      s""""referenced-data-file":${jstr(dataFile)},"cardinality":"2"}}],""" +
      s""""properties":{}}""").getBytes("UTF-8")
    val pf = ByteBuffer.allocate(
      4 + blob.capacity() + 4 + footer.length + 4 + 4 + 4)
    pf.put(pfa1).put(blob.array()).put(pfa1).put(footer)
    pf.order(ByteOrder.LITTLE_ENDIAN)
    pf.putInt(footer.length).putInt(0)
    pf.put(pfa1)
    Files.write(java.nio.file.Paths.get(dvPath), pf.array())

    // ---- delete manifest + list splice + metadata bump (the shared
    // table plumbing; the encoder under test is the bytes above)
    val entrySchema =
      IcebergExport.manifestEntrySchema(Nil, v3DeleteFields = true)
    val e = new GenericData.Record(entrySchema)
    e.put("status", 1)
    e.put("snapshot_id", 1L)
    e.put("sequence_number", 1L)
    e.put("file_sequence_number", 1L)
    val df0 = new GenericData.Record(
      entrySchema.getField("data_file").schema())
    df0.put("content", 1)
    df0.put("file_path", dvPath)
    df0.put("file_format", "PUFFIN")
    df0.put("partition", new GenericData.Record(
      df0.getSchema.getField("partition").schema()))
    df0.put("record_count", 2L)
    df0.put("file_size_in_bytes", pf.capacity().toLong)
    df0.put("referenced_data_file", dataFile)
    df0.put("content_offset", 4L)
    df0.put("content_size_in_bytes", blob.capacity().toLong)
    e.put("data_file", df0)
    val delPath = s"$mdir/manifest-hand-dv.avro"
    val delLen = IcebergExport.writeAvro(delPath, entrySchema, Map(
      "partition-spec" -> "[]", "partition-spec-id" -> "0",
      "format-version" -> "3", "content" -> "deletes"), Seq(e))
    val listPath = s"$mdir/snap-000001-manifest-list.avro"
    val (mfs, listMeta) = IcebergExport.readAvro(listPath)
    val mf = new GenericData.Record(IcebergExport.ManifestFileSchema)
    mf.put("manifest_path", delPath)
    mf.put("manifest_length", delLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 1)
    mf.put("sequence_number", 1L)
    mf.put("min_sequence_number", 1L)
    mf.put("added_snapshot_id", 1L)
    mf.put("added_files_count", 1)
    mf.put("existing_files_count", 0)
    mf.put("deleted_files_count", 0)
    mf.put("added_rows_count", 2L)
    mf.put("existing_rows_count", 0L)
    mf.put("deleted_rows_count", 0L)
    IcebergExport.writeAvro(listPath, IcebergExport.ManifestFileSchema,
      listMeta.filterNot(_._1.startsWith("avro.")), mfs :+ mf)
    val hint = Files.readString(java.nio.file.Paths.get(
      s"$mdir/version-hint.text")).trim.toInt
    val mpath = java.nio.file.Paths.get(f"$mdir/v$hint%05d.metadata.json")
    Files.writeString(mpath, Files.readString(mpath)
      .replace("\"format-version\":2", "\"format-version\":3"))

    // rows 0 and 2 gone in the engine read…
    assert(IcebergExport.readTable(spark, t.tablePath)
      .as[(Long, String)].collect().toSet == Set((2L, "b")))
    // …and in the foreign reader, from the same hand-built bytes
    if (pythonOk) {
      val r = runReader(Seq(t.tablePath, "--compare",
        dump(Seq((2L, "b")).toDF("id", "v"), s"$dir/expected")))
      assert(r("rows") == 1 && r("match") == true, r.toString)
    }
  }
}
