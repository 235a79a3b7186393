package graft.storage

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** The key-value primitive set a TieredTable commit needs from its
  * metadata store — deliberately exactly the operations an object store
  * offers (GET / PUT / conditional PUT / DELETE), so the commit
  * protocol is provably portable off the local filesystem.
  *
  * The reference deployment arbitrates commits through an Iceberg REST
  * catalog over a MinIO/S3 warehouse
  * (/root/reference/fluss-iceberg/docker-compose.yml:126-155,
  * /root/reference/fluss-iceberg/trino/iceberg.properties:2-4); the
  * catalog's job reduces to one primitive: an atomic "write this
  * metadata object unless it already exists" (S3 `If-None-Match: *`
  * conditional PUT, GCS `ifGenerationMatch=0`). [[putIfAbsent]] is that
  * primitive. [[TieredTable]] routes every manifest/pointer operation
  * through this trait, so swapping [[LocalFsMetaStore]] for an S3-backed
  * implementation changes no commit logic.
  *
  * Contract:
  *  - [[putIfAbsent]] is ATOMIC and EXCLUSIVE: of N concurrent callers
  *    on one key, exactly one returns true; the rest see false and the
  *    winner's body is what [[get]] returns.
  *  - [[put]] is an atomic overwrite: a concurrent [[get]] sees the old
  *    body or the new one, never a prefix.
  *  - Keys are flat strings (one namespace per table); values are small
  *    text manifests — O(#snapshots) driver-side metadata, never data.
  */
trait MetaStore {
  def get(key: String): Option[String]

  /** Atomically create `key` with `body` iff absent; true = this caller
    * won the key. The cross-process compare-and-swap commits ride on.
    */
  def putIfAbsent(key: String, body: String): Boolean

  /** Atomic unconditional overwrite (the `LATEST` pointer swap). */
  def put(key: String, body: String): Unit

  def delete(key: String): Unit

  /** Keys starting with `prefix`, sorted — the S3 ListObjectsV2 shape.
    * Used for DISCOVERABLE key families whose names are not derivable
    * (snapshot tags); manifest ids stay sequential probes, so the hot
    * commit path never depends on listing consistency.
    */
  def listKeys(prefix: String): Seq[String]

  /** Display/diagnostic location of a key (a filesystem path, an object
    * URL, ...) — what metadata tables report as `manifest_list`.
    */
  def location(key: String): String
}

/** Local-filesystem store: one file per key under `dir`.
  *
  * [[putIfAbsent]] needs a true O_EXCL claim: `Files.createFile` is
  * POSIX `open(O_CREAT|O_EXCL)` — exactly one process can create the
  * file — and the body then lands via temp-write + `ATOMIC_MOVE`
  * replacing only our own zero-byte claim. A plain
  * exists-check-then-rename would NOT do this (Linux `rename(2)`
  * silently replaces, so two same-key committers would both "succeed"
  * and the slower one would overwrite the winner). Crash window: a
  * process dying between claim and content leaves an empty file; the
  * key reads as claimed-but-unparseable and commits against it fail
  * loudly (operator repairs) rather than guessing — the stance Iceberg
  * takes on orphaned metadata.
  */
class LocalFsMetaStore(dir: Path) extends MetaStore {
  Files.createDirectories(dir)

  override def get(key: String): Option[String] = {
    val p = dir.resolve(key)
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  override def putIfAbsent(key: String, body: String): Boolean = {
    val target = dir.resolve(key)
    try Files.createFile(target) // the CAS: create-exclusive claim
    catch {
      case _: java.nio.file.FileAlreadyExistsException => return false
    }
    val tmp = Files.createTempFile(dir, key, ".tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, target,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    true
  }

  override def put(key: String, body: String): Unit = {
    val tmp = Files.createTempFile(dir, key, ".tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, dir.resolve(key),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def delete(key: String): Unit =
    Files.deleteIfExists(dir.resolve(key))

  override def listKeys(prefix: String): Seq[String] = {
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith(prefix) && !n.endsWith(".tmp"))
      .toSeq.sorted
    finally s.close()
  }

  override def location(key: String): String = dir.resolve(key).toString
}

/** In-memory object-store stand-in: the S3/MinIO conditional-PUT
  * semantics with none of the filesystem's rename machinery — no
  * directories, no renames, no O_EXCL, just the four object operations.
  * A [[TieredTable]] running against this store (MetaStoreSpec) proves
  * the commit protocol uses ONLY the portable primitive set; it is also
  * free of the local store's claim/content crash window because the
  * conditional PUT carries the full body in one atomic operation —
  * exactly why the object-store deployment is the more robust one.
  */
class InMemoryMetaStore(name: String = "mem") extends MetaStore {
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  override def get(key: String): Option[String] = Option(objects.get(key))

  override def putIfAbsent(key: String, body: String): Boolean =
    objects.putIfAbsent(key, body) == null

  override def put(key: String, body: String): Unit = objects.put(key, body)

  override def delete(key: String): Unit = objects.remove(key)

  override def listKeys(prefix: String): Seq[String] =
    objects.keySet().asScala.filter(_.startsWith(prefix)).toSeq.sorted

  override def location(key: String): String = s"$name://$key"
}
