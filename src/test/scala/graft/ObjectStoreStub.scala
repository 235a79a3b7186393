package graft

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, Executors}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process HTTP object store for [[graft.storage.HttpMetaStore]]
  * (metadata plane) and [[graft.storage.GraftObjectFileSystem]] (data
  * plane) tests: the S3 conditional-write semantics over real sockets.
  * The server runs a thread pool (requests genuinely race) and
  * arbitration is one ConcurrentHashMap.putIfAbsent per conditional
  * PUT — the server-side atomicity the S3 contract promises.
  *
  * Objects are BYTES with an mtime (parquet files transit this store);
  * `GET /k?list` returns `size TAB mtime TAB key` lines for the exact
  * key and every key under `k/` — the prefix listing every object
  * store offers.
  *
  * Route shape: `/<bucket>/<key>`; each test takes a fresh bucket so
  * suites share one listener without sharing state.
  */
object ObjectStoreStub {
  private case class Obj(bytes: Array[Byte], mtime: Long)
  private val objects = new ConcurrentHashMap[String, Obj]()
  private val bucketSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.setExecutor(Executors.newFixedThreadPool(8))
    s.createContext("/", (ex: HttpExchange) => handle(ex))
    s.start()
    // daemon-style: the test JVM exits regardless; never stopped, same
    // stance as the shared SparkSession
    s
  }

  /** A fresh namespace URL, e.g. `http://127.0.0.1:PORT/b3`. */
  def freshBucketUrl(): String = {
    val port = server.getAddress.getPort
    s"http://127.0.0.1:$port/b${bucketSeq.incrementAndGet()}"
  }

  /** Same fresh namespace as a `graftos://` table-root URI. */
  def freshBucketFsUrl(): String =
    freshBucketUrl().replaceFirst("^http://", "graftos://")

  /** Keys currently held under a prefix — spec introspection. */
  def keysUnder(prefix: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala
      .filter(k => k == prefix || k.startsWith(prefix + "/")).toSeq.sorted
  }

  private def respond(ex: HttpExchange, status: Int,
                      body: Array[Byte] = Array.empty): Unit = {
    // -1 = no body (204); 0 = chunked would confuse clients, use length
    ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length)
    val os: OutputStream = ex.getResponseBody
    try if (body.nonEmpty) os.write(body)
    finally os.close()
  }

  private def decode(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def handle(ex: HttpExchange): Unit = {
    try {
      val key = ex.getRequestURI.getRawPath.stripPrefix("/")
        .split("/", -1).map(decode).mkString("/")
      val listing = Option(ex.getRequestURI.getQuery).contains("list")
      ex.getRequestMethod match {
        case "GET" if listing =>
          import scala.jdk.CollectionConverters._
          val lines = objects.entrySet().asScala
            .filter(e => e.getKey == key || e.getKey.startsWith(key + "/"))
            .toSeq.sortBy(_.getKey)
            .map(e => s"${e.getValue.bytes.length}\t${e.getValue.mtime}\t${e.getKey}")
          respond(ex, 200, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
        case "GET" =>
          Option(objects.get(key)) match {
            case Some(o) => respond(ex, 200, o.bytes)
            case None => respond(ex, 404)
          }
        case "PUT" =>
          val body = ex.getRequestBody.readAllBytes()
          val obj = Obj(body, System.currentTimeMillis())
          val conditional =
            Option(ex.getRequestHeaders.getFirst("If-None-Match"))
              .contains("*")
          if (conditional) {
            // the atomic server-side arbitration: exactly one winner
            if (objects.putIfAbsent(key, obj) == null) respond(ex, 201)
            else respond(ex, 412)
          } else {
            objects.put(key, obj)
            respond(ex, 200)
          }
        case "DELETE" =>
          objects.remove(key)
          respond(ex, 204)
        case _ => respond(ex, 405)
      }
    } catch {
      case scala.util.control.NonFatal(_) => respond(ex, 500)
    } finally ex.close()
  }
}
