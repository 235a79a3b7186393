package graft

/** Test fixture over [[graft.storage.InMemoryObjectStoreServer]] (the
  * S3/MinIO stand-in): one shared listener for the whole test JVM,
  * fresh bucket per test so suites share the socket without sharing
  * state. Serves both planes — [[graft.storage.HttpMetaStore]]
  * metadata and [[graft.storage.GraftObjectFileSystem]] data.
  */
object ObjectStoreStub {
  private val bucketSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  // daemon-style: the test JVM exits regardless; never stopped, same
  // stance as the shared SparkSession
  lazy val server = new graft.storage.InMemoryObjectStoreServer()

  /** A fresh namespace URL, e.g. `http://127.0.0.1:PORT/b3`. */
  def freshBucketUrl(): String =
    s"http://127.0.0.1:${server.port}/b${bucketSeq.incrementAndGet()}"

  /** Same fresh namespace as a `graftos://` table-root URI. */
  def freshBucketFsUrl(): String =
    freshBucketUrl().replaceFirst("^http://", "graftos://")

  /** Keys currently held under a prefix — spec introspection. */
  def keysUnder(prefix: String): Seq[String] = server.keysUnder(prefix)
}
