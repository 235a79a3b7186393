package graft.storage

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** The filesystem surface [[TieredTable]] and [[FileStats]] need,
  * abstracted over WHERE the table lives: java.nio for local paths
  * (atomic rename available and used), Hadoop `FileSystem` for
  * `scheme://` paths ([[GraftObjectFileSystem]] for the object-store
  * data plane — no rename relied on there; publication is marker
  * objects + the MetaStore manifest CAS).
  *
  * Paths are plain strings throughout — the same strings Spark's
  * readers/writers take — so one code path serves both worlds.
  */
private[graft] trait TableFs {
  def mkdirs(path: String): Unit
  def exists(path: String): Boolean
  /** None = absent. */
  def readString(path: String): Option[String]
  def writeString(path: String, body: String): Unit
  /** None = absent. */
  def readBytes(path: String): Option[Array[Byte]]
  /** Ranged read of `length` bytes at `offset` — the access pattern a
    * Puffin deletion-vector blob needs (one file aggregates many DVs;
    * reading it whole per DV would be O(file) instead of O(blob)).
    * Default falls back to a full read + slice; stores with real
    * ranged GETs override.
    */
  def readRange(path: String, offset: Long, length: Int): Option[Array[Byte]] =
    readBytes(path).map { b =>
      java.util.Arrays.copyOfRange(b, offset.toInt,
        math.min(offset + length, b.length.toLong).toInt)
    }
  def writeBytes(path: String, body: Array[Byte]): Unit
  /** Publish: atomic rename locally; Hadoop rename (copy+delete on an
    * object store) remotely — remote callers must not rely on
    * atomicity and use marker objects instead.
    */
  def move(src: String, dst: String): Unit
  /** Duplicate one file. Never buffers whole objects in memory:
    * local = filesystem copy, remote = server-side object copy where
    * the store supports it ([[GraftObjectFileSystem.copyObject]]),
    * else a bounded-buffer stream copy.
    */
  def copy(src: String, dst: String): Unit
  /** Remove a file or a whole tree; false = nothing existed. */
  def deleteRecursively(path: String): Boolean
  def deleteFile(path: String): Unit
  /** Immediate child NAMES (files and dirs), empty if absent. */
  def listNames(path: String): Seq[String]
  /** All regular files under `path` (recursive) as (path, size). */
  def listFiles(path: String): Seq[(String, Long)]
}

private[graft] object TableFs {
  /** Conf for facade use outside a session (sidecar IO in
    * [[FileStats]]): a plain Configuration with the graftos scheme
    * registered — the object-store FS needs nothing else.
    */
  lazy val hadoopConf: Configuration = {
    val c = new Configuration()
    GraftObjectFileSystem.register(c)
    c
  }

  def forPath(path: String): TableFs =
    if (path.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*"))
      new HadoopTableFs(hadoopConf)
    else LocalTableFs
}

private[graft] object LocalTableFs extends TableFs {
  override def mkdirs(path: String): Unit =
    Files.createDirectories(Paths.get(path))
  override def exists(path: String): Boolean = Files.exists(Paths.get(path))
  override def readString(path: String): Option[String] = {
    val p = Paths.get(path)
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }
  override def writeString(path: String, body: String): Unit =
    Files.writeString(Paths.get(path), body)
  override def readBytes(path: String): Option[Array[Byte]] = {
    val p = Paths.get(path)
    if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
  }
  override def readRange(path: String, offset: Long,
                         length: Int): Option[Array[Byte]] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else {
      val ch = Files.newByteChannel(p)
      try {
        ch.position(offset)
        val buf = java.nio.ByteBuffer.allocate(length)
        var n = 0
        while (n >= 0 && buf.hasRemaining) n = ch.read(buf)
        Some(java.util.Arrays.copyOf(buf.array(), buf.position()))
      } finally ch.close()
    }
  }
  override def writeBytes(path: String, body: Array[Byte]): Unit =
    Files.write(Paths.get(path), body)
  override def move(src: String, dst: String): Unit =
    Files.move(Paths.get(src), Paths.get(dst), StandardCopyOption.ATOMIC_MOVE)
  override def copy(src: String, dst: String): Unit =
    Files.copy(Paths.get(src), Paths.get(dst),
      StandardCopyOption.REPLACE_EXISTING)
  override def deleteRecursively(path: String): Boolean = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return false
    Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(Files.deleteIfExists(_))
    true
  }
  override def deleteFile(path: String): Unit =
    Files.deleteIfExists(Paths.get(path))
  override def listNames(path: String): Seq[String] =
    Option(new File(path).list()).map(_.toSeq).getOrElse(Nil)
  override def listFiles(path: String): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(path)
    if (!Files.exists(root)) return Nil
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => p.toString -> Files.size(p)).toList
    finally s.close()
  }
}

private[graft] class HadoopTableFs(conf: Configuration) extends TableFs {
  private def fsOf(path: String): FileSystem =
    new HPath(path).getFileSystem(conf)
  override def mkdirs(path: String): Unit =
    fsOf(path).mkdirs(new HPath(path))
  override def exists(path: String): Boolean =
    fsOf(path).exists(new HPath(path))
  override def readString(path: String): Option[String] = {
    val fs = fsOf(path)
    val p = new HPath(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val out = new java.io.ByteArrayOutputStream()
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
      finally in.close()
      Some(new String(out.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
    }
  }
  override def writeString(path: String, body: String): Unit =
    writeBytes(path, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  override def readBytes(path: String): Option[Array[Byte]] = {
    val fs = fsOf(path)
    val p = new HPath(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val out = new java.io.ByteArrayOutputStream()
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
      finally in.close()
      Some(out.toByteArray)
    }
  }
  override def readRange(path: String, offset: Long,
                         length: Int): Option[Array[Byte]] = {
    val fs = fsOf(path)
    val p = new HPath(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      // positioned read — the object-store FS serves it as a ranged GET
      try { val buf = new Array[Byte](length); in.readFully(offset, buf); Some(buf) }
      finally in.close()
    }
  }
  override def writeBytes(path: String, body: Array[Byte]): Unit = {
    val out = fsOf(path).create(new HPath(path), true)
    try out.write(body)
    finally out.close()
  }
  override def move(src: String, dst: String): Unit =
    if (!fsOf(src).rename(new HPath(src), new HPath(dst)))
      throw new java.io.IOException(s"rename $src -> $dst failed")
  override def copy(src: String, dst: String): Unit = fsOf(src) match {
    case g: GraftObjectFileSystem => g.copyObject(new HPath(src), new HPath(dst))
    case fs =>
      val in = fs.open(new HPath(src))
      try {
        val out = fs.create(new HPath(dst), true)
        try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        finally out.close()
      } finally in.close()
  }
  override def deleteRecursively(path: String): Boolean =
    fsOf(path).delete(new HPath(path), true)
  override def deleteFile(path: String): Unit = {
    val fs = fsOf(path)
    val p = new HPath(path)
    if (fs.exists(p)) fs.delete(p, false)
    ()
  }
  override def listNames(path: String): Seq[String] = {
    val fs = fsOf(path)
    val p = new HPath(path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).map(_.getPath.getName).toSeq
  }
  override def listFiles(path: String): Seq[(String, Long)] = {
    val fs = fsOf(path)
    val p = new HPath(path)
    if (!fs.exists(p)) return Nil
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile) buf += st.getPath.toString -> st.getLen
    }
    buf.toList
  }
}
