package graft

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, Executors}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process HTTP object store for [[graft.storage.HttpMetaStore]]
  * tests: the S3 conditional-write semantics over real sockets. The
  * server runs a thread pool (requests genuinely race) and arbitration
  * is one ConcurrentHashMap.putIfAbsent per conditional PUT — the
  * server-side atomicity the S3 contract promises.
  *
  * Route shape: `/<bucket>/<key>`; each test takes a fresh bucket so
  * suites share one listener without sharing state.
  */
object ObjectStoreStub {
  private val objects = new ConcurrentHashMap[String, String]()
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

  private def respond(ex: HttpExchange, status: Int, body: String = ""): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    // -1 = no body (204); 0 = chunked would confuse clients, use length
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    val os: OutputStream = ex.getResponseBody
    try if (bytes.nonEmpty) os.write(bytes)
    finally os.close()
  }

  private def handle(ex: HttpExchange): Unit = {
    try {
      val key = ex.getRequestURI.getPath.stripPrefix("/")
      ex.getRequestMethod match {
        case "GET" =>
          Option(objects.get(key)) match {
            case Some(b) => respond(ex, 200, b)
            case None => respond(ex, 404)
          }
        case "PUT" =>
          val body = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          val conditional =
            Option(ex.getRequestHeaders.getFirst("If-None-Match"))
              .contains("*")
          if (conditional) {
            // the atomic server-side arbitration: exactly one winner
            if (objects.putIfAbsent(key, body) == null) respond(ex, 201)
            else respond(ex, 412)
          } else {
            objects.put(key, body)
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
