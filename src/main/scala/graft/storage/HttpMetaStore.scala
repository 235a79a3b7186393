package graft.storage

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Wire-level sibling of [[InMemoryMetaStore]]: the metadata primitive
  * set spoken over HTTP to an object store, with [[putIfAbsent]] as the
  * S3-style `If-None-Match: *` conditional PUT — the exact mechanism
  * the reference's warehouse arbitration reduces to (MinIO/S3 behind an
  * Iceberg REST catalog, /root/reference/fluss-iceberg/
  * docker-compose.yml:126-155). A [[TieredTable]] pointed at this store
  * commits over the network with NO commit-logic change — the proof
  * that the protocol never depended on filesystem rename.
  *
  * Semantics mapping (the S3 conditional-write contract):
  *  - `putIfAbsent` → `PUT` with `If-None-Match: *`; `200/201` = this
  *    caller created the object, `412 Precondition Failed` = the key
  *    exists (someone else won). Atomicity is the SERVER's duty — S3,
  *    GCS (`ifGenerationMatch=0`), MinIO and the test stub all arbitrate
  *    concurrent conditional writes server-side, which is what makes
  *    the client a thin translation layer.
  *  - `put` → unconditional `PUT` (the LATEST pointer swap; last writer
  *    wins, readers see old or new body, never a prefix — HTTP messages
  *    are atomic units).
  *  - `get` → `GET` (`404` = absent); `delete` → `DELETE`.
  *
  * Failure stance: any status outside the mapped set raises — a commit
  * must never interpret a 500 or a timeout as "key exists" (that would
  * turn a transient outage into a phantom lost commit). Retrying is the
  * caller's policy ([[TieredTable.retryOnConflict]] for CAS losses;
  * infrastructure retries belong outside the primitive).
  *
  * Scale: metadata objects are O(#snapshots) small text bodies — one
  * round trip per commit step, no data bytes ever transit this store.
  */
class HttpMetaStore(baseUrl: String,
                    timeout: Duration = Duration.ofSeconds(10)) extends MetaStore {
  private val base = baseUrl.stripSuffix("/")
  private val client = HttpClient.newBuilder()
    .connectTimeout(timeout)
    .build()

  private def uri(key: String): URI = {
    // keys are flat names (snap-NNNNNN.props, LATEST) — encode anyway so
    // a hostile key cannot smuggle path segments
    val enc = java.net.URLEncoder.encode(key, "UTF-8")
    URI.create(s"$base/$enc")
  }

  private def send(req: HttpRequest): HttpResponse[String] =
    client.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))

  override def get(key: String): Option[String] = {
    val r = send(HttpRequest.newBuilder(uri(key)).timeout(timeout).GET().build())
    r.statusCode() match {
      case 200 => Some(r.body())
      case 404 => None
      case s => throw new java.io.IOException(
        s"GET ${uri(key)} returned $s")
    }
  }

  override def putIfAbsent(key: String, body: String): Boolean = {
    val r = send(HttpRequest.newBuilder(uri(key))
      .timeout(timeout)
      .header("If-None-Match", "*")
      .PUT(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build())
    r.statusCode() match {
      case 200 | 201 => true
      case 412 => false // precondition failed: the key already exists
      case s => throw new java.io.IOException(
        s"conditional PUT ${uri(key)} returned $s — refusing to guess " +
          "whether the key exists")
    }
  }

  override def put(key: String, body: String): Unit = {
    val r = send(HttpRequest.newBuilder(uri(key))
      .timeout(timeout)
      .PUT(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build())
    if (r.statusCode() != 200 && r.statusCode() != 201)
      throw new java.io.IOException(
        s"PUT ${uri(key)} returned ${r.statusCode()}")
  }

  override def delete(key: String): Unit = {
    val r = send(HttpRequest.newBuilder(uri(key))
      .timeout(timeout).DELETE().build())
    if (r.statusCode() != 200 && r.statusCode() != 204 &&
        r.statusCode() != 404)
      throw new java.io.IOException(
        s"DELETE ${uri(key)} returned ${r.statusCode()}")
  }

  /** Prefix listing via the store's `?list` (the S3 ListObjectsV2
    * role): lines of `size\tmtime\tfullKey`; keys are returned relative
    * to this store's base prefix and filtered client-side. PAGINATED:
    * the store caps each response and signals `x-list-truncated`; the
    * loop resumes with `start-after` until the listing drains — a
    * catalog with more tables than one page must not silently lose the
    * tail.
    */
  override def listKeys(prefix: String): Seq[String] = {
    val basePath = URI.create(base).getPath.stripPrefix("/")
    val out = Seq.newBuilder[String]
    var startAfter: Option[String] = None
    var more = true
    while (more) {
      val q = "list" + startAfter.fold("")(sa =>
        "&start-after=" +
          java.net.URLEncoder.encode(sa, "UTF-8").replace("+", "%20"))
      val r = send(HttpRequest.newBuilder(URI.create(s"$base?$q"))
        .timeout(timeout).GET().build())
      r.statusCode() match {
        case 200 =>
          val lines = r.body().split("\n").toSeq.filter(_.nonEmpty)
          lines.foreach { line =>
            val full = line.split("\t").last
            val rel = full.stripPrefix(basePath).stripPrefix("/")
            if (rel.nonEmpty && rel.startsWith(prefix) && !rel.contains("/"))
              out += rel
          }
          more = lines.nonEmpty &&
            r.headers().firstValue("x-list-truncated").orElse("") == "true"
          startAfter = lines.lastOption.map(_.split("\t").last)
        case 404 => more = false
        case s => throw new java.io.IOException(
          s"LIST $base returned $s")
      }
    }
    out.result().sorted
  }

  override def location(key: String): String = uri(key).toString
}
