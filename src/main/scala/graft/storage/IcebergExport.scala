package graft.storage

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Apache-Iceberg-v2 metadata EXPORT for a [[TieredTable]] cold tier —
  * the reference's core interop promise re-expressed: a second engine
  * reads the tiered data with its OWN Iceberg reader, zero graft code
  * involved (/root/reference/README.md:257-292 — Trino queries the
  * Iceberg tier directly via a plain Iceberg catalog).
  *
  * [[export]] writes, next to (never instead of) the graft manifest:
  *
  * {{{
  * <table>/metadata/version-hint.text        # current metadata version
  * <table>/metadata/v<N>.metadata.json       # Iceberg table metadata
  * <table>/metadata/snap-<id>-manifest-list.avro
  * <table>/metadata/manifest-<id>.avro
  * }}}
  *
  * all per the Iceberg spec: table metadata is JSON with schemas
  * carrying assigned field-ids; manifest lists and manifests are Avro
  * files whose record fields carry the spec's reserved field-ids
  * (manifest_path=500, …, data_file.file_path=100, …) and whose file
  * key-value metadata carries `schema` / `partition-spec` /
  * `format-version`, exactly what external readers key on. Every
  * RETAINED graft snapshot exports as an Iceberg snapshot (sequence
  * number = graft snapshot id), so Iceberg time travel sees the same
  * history as [[TieredTable.readColdAsOf]].
  *
  * [[readTable]] is the in-suite second engine: it resolves data files
  * ONLY through the exported artifacts (version-hint → metadata.json →
  * manifest-list Avro → manifest Avro → parquet paths) — no graft
  * manifest, no [[TieredTable]] code — and the q19 oracle cross-checks
  * the result against DuckDB's recomputation. (DuckDB's own `iceberg`
  * extension would be the ideal oracle but is not installable in the
  * zero-egress sandbox; the independent-reader path keeps the check
  * honest: a wrong manifest, a missed file, or a bad path breaks it.)
  *
  * Scope: unpartitioned, non-merge-on-read tables — the shape of the
  * reference's tiered log tables. Partitioned layouts put key=value
  * values in directory names (not data pages), and merge-on-read PK
  * tables need positional/equality deletes; both are documented
  * refusals rather than silent wrong answers.
  *
  * Scale: export is a METADATA-ONLY pass — it lists the snapshot's
  * files and reads parquet footers for record counts (the same numbers
  * a cluster writer returns in task commit messages); no data file is
  * read or rewritten. Cost is O(files), not O(rows).
  */
object IcebergExport {

  /** Iceberg v2 `manifest_file` record (the manifest-list entry), with
    * the spec's reserved field-ids attached as Avro field properties.
    */
  private val ManifestFileSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514}
      |]}""".stripMargin)

  /** Iceberg v2 `manifest_entry` with nested `data_file` (r2). The
    * `partition` struct (r102) is empty — unpartitioned spec. Optional
    * per-column stats fields are omitted (legal per spec; graft's own
    * skipping stats live in the `_graft_stats` sidecars).
    */
  private val ManifestEntrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |{"name":"content","type":"int","field-id":134},
      |{"name":"file_path","type":"string","field-id":100},
      |{"name":"file_format","type":"string","field-id":101},
      |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
      |{"name":"record_count","type":"long","field-id":103},
      |{"name":"file_size_in_bytes","type":"long","field-id":104}
      |]}}]}""".stripMargin)

  private def metadataDir(table: TieredTable): Path =
    Paths.get(table.tablePath, "metadata")

  /** Spark type → Iceberg schema-JSON type string (primitives) or
    * nested object. Field-ids are assigned depth-first starting from
    * `nextId` — the Iceberg rule that every field, nested included,
    * owns a distinct id.
    */
  private def icebergType(dt: DataType, nextId: () => Int): Any = dt match {
    case BooleanType => "boolean"
    case IntegerType | ShortType | ByteType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case _: TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case a: ArrayType =>
      Map("type" -> "list", "element-id" -> nextId(),
        "element" -> icebergType(a.elementType, nextId),
        "element-required" -> !a.containsNull)
    case m: MapType =>
      Map("type" -> "map", "key-id" -> nextId(), "value-id" -> nextId(),
        "key" -> icebergType(m.keyType, nextId),
        "value" -> icebergType(m.valueType, nextId),
        "value-required" -> !m.valueContainsNull)
    case s: StructType =>
      Map("type" -> "struct", "fields" -> s.fields.map { f =>
        Map("id" -> nextId(), "name" -> f.name, "required" -> !f.nullable,
          "type" -> icebergType(f.dataType, nextId))
      }.toSeq)
    case other => throw new IllegalArgumentException(
      s"no Iceberg mapping for Spark type $other")
  }

  /** (schema object for metadata.json, last assigned column id). */
  private def icebergSchema(st: StructType): (Map[String, Any], Int) = {
    var id = 0
    val nextId = () => { id += 1; id }
    val fields = st.fields.map { f =>
      Map("id" -> nextId(), "name" -> f.name, "required" -> !f.nullable,
        "type" -> icebergType(f.dataType, nextId))
    }.toSeq
    (Map("type" -> "struct", "schema-id" -> 0,
      "fields" -> fields), id)
  }

  /** Minimal dependency-free JSON render (strings, numbers, booleans,
    * maps, seqs) — metadata.json is small and flat enough that pulling
    * a serializer dependency in for it is not worth the coupling.
    */
  private def toJson(v: Any): String = v match {
    case null => "null"
    case s: String =>
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < 0x20 => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    case b: Boolean => b.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Double => n.toString
    case m: Map[_, _] =>
      m.map { case (k, x) => toJson(k.toString) + ":" + toJson(x) }
        .mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(toJson).mkString("[", ",", "]")
    case other => throw new IllegalArgumentException(
      s"unrenderable JSON value: $other (${other.getClass})")
  }

  /** Parquet part files under a snapshot data dir, with per-file
    * (rows, bytes) from the footer — the manifest entry's accounting.
    */
  private def partFiles(dir: String): Seq[(String, Long, Long)] = {
    val conf = new Configuration()
    val stream = Files.walk(Paths.get(dir))
    val files =
      try stream.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .toList.sortBy(_.toString)
      finally stream.close()
    files.map { f =>
      val reader = ParquetFileReader.open(conf, new HadoopPath(f.toString))
      val rows = try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      finally reader.close()
      (f.toString, rows, Files.size(f))
    }
  }

  private def writeAvro(path: Path, schema: Schema,
                        meta: Map[String, String],
                        records: Seq[GenericRecord]): Unit = {
    val writer =
      new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => writer.setMeta(k, v) }
    writer.create(schema, path.toFile)
    try records.foreach(writer.append)
    finally writer.close()
  }

  private def readAvro(path: String): (Seq[GenericRecord], Map[String, String]) = {
    val reader =
      new DataFileReader[GenericRecord](new File(path), new GenericDatumReader[GenericRecord]())
    try {
      val metas = reader.getMetaKeys.asScala.map { k =>
        k -> new String(reader.getMeta(k), StandardCharsets.UTF_8)
      }.toMap
      (reader.iterator().asScala.toList, metas)
    } finally reader.close()
  }

  /** Export the table's retained snapshot history as an Iceberg v2
    * table rooted at the graft table path. Idempotent per call; each
    * call writes a new metadata version (the Iceberg pattern — metadata
    * files are immutable, `version-hint.text` names the current one).
    * Returns the metadata.json path.
    */
  def export(table: TieredTable): Path = {
    require(table.partitionBy.isEmpty,
      "Iceberg export supports unpartitioned tables: a hive-layout " +
        "partition value lives in directory names, which a file-list " +
        "reader cannot recover — read the partitioned layout through " +
        "TieredTable instead")
    val head = table.currentSnapshot.getOrElse(
      throw new IllegalStateException(
        s"no snapshot to export in ${table.tablePath}"))
    val mdir = metadataDir(table)
    Files.createDirectories(mdir)

    // merge-on-read PK deltas carry __seq and need Iceberg delete files
    // to resolve — refuse rather than export raw unresolved deltas
    require(!table.mergeOnRead,
      "Iceberg export supports copy-on-write tables only (a merge-on-" +
        "read delta needs Iceberg delete files to resolve)")
    val snaps = (1L to head.id).flatMap(table.snapshot(_))
    require(snaps.exists(_.id == head.id), "head manifest must be readable")

    // file dir → snapshot id that ADDED it (first snapshot listing it)
    val addedBy: Map[String, Long] =
      snaps.flatMap(s => s.files.map(_ -> s.id))
        .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).min }

    val snapshotObjs = snaps.map { s =>
      // one manifest per snapshot, listing every live file of that
      // snapshot; files added earlier carry EXISTING status with their
      // original (data) sequence number — the v2 inheritance rules
      val entries = s.files.flatMap { dir =>
        val addedIn = addedBy(dir)
        partFiles(dir).map { case (path, rows, bytes) =>
          val e = new GenericData.Record(ManifestEntrySchema)
          e.put("status", if (addedIn == s.id) 1 else 0) // ADDED / EXISTING
          e.put("snapshot_id", addedIn)
          e.put("sequence_number", addedIn)       // data sequence number
          e.put("file_sequence_number", addedIn)
          val df = new GenericData.Record(
            ManifestEntrySchema.getField("data_file").schema())
          df.put("content", 0)                    // DATA
          df.put("file_path", path)
          df.put("file_format", "PARQUET")
          df.put("partition", new GenericData.Record(
            df.getSchema.getField("partition").schema()))
          df.put("record_count", rows)
          df.put("file_size_in_bytes", bytes)
          e.put("data_file", df)
          e
        }
      }
      val (schemaObj, _) = icebergSchema(table.readColdAsOf(s.id).schema)
      val manifestPath = mdir.resolve(f"manifest-${s.id}%06d.avro")
      writeAvro(manifestPath, ManifestEntrySchema, Map(
        "schema" -> toJson(schemaObj),
        "schema-id" -> "0",
        "partition-spec" -> "[]",
        "partition-spec-id" -> "0",
        "format-version" -> "2",
        "content" -> "data"), entries)

      val mf = new GenericData.Record(ManifestFileSchema)
      mf.put("manifest_path", manifestPath.toString)
      mf.put("manifest_length", Files.size(manifestPath))
      mf.put("partition_spec_id", 0)
      mf.put("content", 0) // data manifest
      mf.put("sequence_number", s.id)
      mf.put("min_sequence_number",
        s.files.map(addedBy).minOption.getOrElse(s.id))
      mf.put("added_snapshot_id", s.id)
      val added = entries.count(_.get("status") == 1)
      mf.put("added_files_count", added)
      mf.put("existing_files_count", entries.size - added)
      mf.put("deleted_files_count", 0)
      val addedRows = entries.filter(_.get("status") == 1)
        .map(_.get("data_file").asInstanceOf[GenericRecord]
          .get("record_count").asInstanceOf[Long]).sum
      val totalRows = entries
        .map(_.get("data_file").asInstanceOf[GenericRecord]
          .get("record_count").asInstanceOf[Long]).sum
      mf.put("added_rows_count", addedRows)
      mf.put("existing_rows_count", totalRows - addedRows)
      mf.put("deleted_rows_count", 0L)

      val listPath = mdir.resolve(f"snap-${s.id}%06d-manifest-list.avro")
      writeAvro(listPath, ManifestFileSchema, Map(
        "snapshot-id" -> s.id.toString,
        "sequence-number" -> s.id.toString,
        "format-version" -> "2"), Seq(mf))

      Map(
        "snapshot-id" -> s.id,
        "parent-snapshot-id" -> s.parentId.getOrElse(-1L),
        "sequence-number" -> s.id,
        "timestamp-ms" -> s.committedAt,
        "manifest-list" -> listPath.toString,
        "summary" -> (Map("operation" ->
          (if (s.op == "tier" || s.op == "append") "append" else "overwrite"))
          ++ s.summary),
        "schema-id" -> 0)
    }

    val (schemaObj, lastColId) = icebergSchema(table.readCold().schema)
    val version = currentVersion(mdir).getOrElse(0) + 1
    val metadata = Map(
      "format-version" -> 2,
      // deterministic per table path so re-exports describe the SAME
      // Iceberg table, not a new identity each call
      "table-uuid" -> UUID.nameUUIDFromBytes(
        table.tablePath.getBytes(StandardCharsets.UTF_8)).toString,
      "location" -> table.tablePath,
      "last-sequence-number" -> head.id,
      "last-updated-ms" -> head.committedAt,
      "last-column-id" -> lastColId,
      "current-schema-id" -> 0,
      "schemas" -> Seq(schemaObj),
      "default-spec-id" -> 0,
      "partition-specs" -> Seq(Map("spec-id" -> 0, "fields" -> Seq.empty[Any])),
      "last-partition-id" -> 999,
      "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Seq.empty[Any])),
      "properties" -> Map("write.format.default" -> "parquet"),
      "current-snapshot-id" -> head.id,
      "snapshots" -> snapshotObjs,
      "snapshot-log" -> snaps.map(s =>
        Map("timestamp-ms" -> s.committedAt, "snapshot-id" -> s.id)),
      "metadata-log" -> Seq.empty[Any])

    val mpath = mdir.resolve(f"v$version%05d.metadata.json")
    Files.write(mpath, toJson(metadata).getBytes(StandardCharsets.UTF_8))
    Files.write(mdir.resolve("version-hint.text"),
      version.toString.getBytes(StandardCharsets.UTF_8))
    mpath
  }

  private def currentVersion(mdir: Path): Option[Int] = {
    val hint = mdir.resolve("version-hint.text")
    if (Files.exists(hint))
      Files.readString(hint).trim.toIntOption
    else None
  }

  // ---- the independent reader (the in-suite "second engine") ----

  private def jsonAt(v: org.json4s.JValue, key: String): org.json4s.JValue =
    v.asInstanceOf[org.json4s.JObject].obj
      .collectFirst { case (k, x) if k == key => x }
      .getOrElse(org.json4s.JNothing)

  private def jLong(v: org.json4s.JValue): Long = v match {
    case org.json4s.JInt(n) => n.toLong
    case org.json4s.JLong(n) => n
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }

  /** Read an exported table AS ICEBERG: resolve the current (or
    * `asOfSnapshotId`) snapshot's data files purely from the exported
    * metadata chain and scan them. Shares no code or state with
    * [[TieredTable]]'s read path — the point is that nothing but the
    * Iceberg artifacts drives the scan.
    */
  def readTable(spark: SparkSession, tablePath: String,
                asOfSnapshotId: Option[Long] = None): DataFrame = {
    import org.json4s.jackson.JsonMethods
    val mdir = Paths.get(tablePath, "metadata")
    val version = currentVersion(mdir).getOrElse(
      throw new IllegalStateException(s"no version-hint.text under $mdir"))
    val mpath = mdir.resolve(f"v$version%05d.metadata.json")
    val md = JsonMethods.parse(Files.readString(mpath))
    val currentId = asOfSnapshotId.getOrElse(
      jLong(jsonAt(md, "current-snapshot-id")))
    val snap = jsonAt(md, "snapshots").asInstanceOf[org.json4s.JArray]
      .arr.find(s => jLong(jsonAt(s, "snapshot-id")) == currentId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $currentId not in $mpath"))
    val listPath = jsonAt(snap, "manifest-list") match {
      case org.json4s.JString(p) => p
      case other => throw new IllegalStateException(s"bad manifest-list: $other")
    }
    val (manifestFiles, _) = readAvro(listPath)
    val dataFiles = manifestFiles.flatMap { mf =>
      val (entries, _) = readAvro(mf.get("manifest_path").toString)
      entries.collect {
        // status 2 = DELETED: the file left the table in this snapshot
        case e if e.get("status").asInstanceOf[Int] != 2 =>
          e.get("data_file").asInstanceOf[GenericRecord]
            .get("file_path").toString
      }
    }
    require(dataFiles.nonEmpty, s"snapshot $currentId lists no data files")
    spark.read.option("mergeSchema", "true").parquet(dataFiles: _*)
  }
}
