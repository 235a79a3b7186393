package graft.storage

import java.io.OutputStream
import java.net.InetSocketAddress
import java.util.concurrent.{ConcurrentHashMap, Executors}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** The Iceberg REST catalog role — the reference stack's
  * `iceberg-rest` service on port 8181
  * (/root/reference/fluss-iceberg/docker-compose.yml:127-133), which
  * is HOW Trino discovers the tiered tables (`trino/catalog/
  * iceberg.properties` points at it): tables are named in a catalog
  * and loaded over HTTP, never by filesystem path.
  *
  * Serves the read-side subset of the REST catalog OpenAPI an
  * external query engine drives:
  *
  *  - `GET /v1/config` → engine handshake
  *  - `GET /v1/namespaces` → namespace listing
  *  - `GET /v1/namespaces/{ns}/tables` → table listing
  *  - `GET /v1/namespaces/{ns}/tables/{t}` → `LoadTableResult`:
  *    `metadata-location` plus the full embedded table-metadata
  *    document (served through [[TableFs]], so a bucket-resident
  *    metadata chain is proxied straight from the bucket)
  *
  * Registration is the catalog-commit surface: `register` swaps the
  * table's current metadata pointer (what a real REST catalog does on
  * every Iceberg commit) — re-register after each [[IcebergExport
  * .export]] and external readers see the new snapshot atomically.
  */
class IcebergRestCatalogServer {
  private val tables =
    new ConcurrentHashMap[(String, String), String]() // (ns, t) → metadata loc

  val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.setExecutor(Executors.newFixedThreadPool(4))
    s.createContext("/", (ex: HttpExchange) => handle(ex))
    s.start()
    s
  }

  def port: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)

  /** Point `ns.table` at a metadata.json location (idempotent swap —
    * the catalog commit).
    */
  def register(ns: String, table: String, metadataLocation: String): Unit =
    tables.put((ns, table), metadataLocation)

  def unregister(ns: String, table: String): Unit =
    tables.remove((ns, table))

  private def respond(ex: HttpExchange, status: Int, json: String): Unit = {
    val body = json.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, body.length)
    val os: OutputStream = ex.getResponseBody
    try os.write(body) finally os.close()
  }

  private def err(ex: HttpExchange, status: Int, msg: String): Unit =
    respond(ex, status, JsonMethods.compact(JsonMethods.render(
      "error" -> (("message" -> msg) ~ ("code" -> status)))))

  private def handle(ex: HttpExchange): Unit = {
    try {
      val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
        .map(java.net.URLDecoder.decode(_, "UTF-8")).toSeq
      (ex.getRequestMethod, parts) match {
        case ("GET", Seq("v1", "config")) =>
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(
            ("defaults" -> org.json4s.JObject()) ~
              ("overrides" -> org.json4s.JObject()))))
        case ("GET", Seq("v1", "namespaces")) =>
          import scala.jdk.CollectionConverters._
          val nss = tables.keySet().asScala.map(_._1).toSeq.distinct.sorted
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(
            "namespaces" -> nss.map(Seq(_)))))
        case ("GET", Seq("v1", "namespaces", ns, "tables")) =>
          import scala.jdk.CollectionConverters._
          val ids = tables.keySet().asScala.filter(_._1 == ns)
            .map(_._2).toSeq.sorted
            .map(t => ("namespace" -> Seq(ns)) ~ ("name" -> t))
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(
            "identifiers" -> ids)))
        case ("GET", Seq("v1", "namespaces", ns, "tables", t)) =>
          Option(tables.get((ns, t))) match {
            case None => err(ex, 404, s"Table does not exist: $ns.$t")
            case Some(loc) =>
              TableFs.forPath(loc).readString(loc) match {
                case None => err(ex, 500,
                  s"metadata location unreadable: $loc")
                case Some(body) =>
                  respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                    ("metadata-location" -> loc) ~
                      ("metadata" -> JsonMethods.parse(body)))))
              }
          }
        case _ => err(ex, 404, "route not found")
      }
    } catch {
      case e: Throwable => err(ex, 500, String.valueOf(e.getMessage))
    }
  }
}

/** The external engine's side of the protocol: discover and scan a
  * table knowing ONLY the catalog URL and the table name — the Trino
  * read path of the reference, with [[IcebergExport.readFromMetadata]]
  * as the scan (no [[TieredTable]] code anywhere in the flow).
  */
object IcebergRestClient {

  private def get(url: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(30000)
    val status = conn.getResponseCode
    val is = if (status < 400) conn.getInputStream else conn.getErrorStream
    val body =
      if (is == null) ""
      else try new String(is.readAllBytes(), "UTF-8") finally is.close()
    (status, body)
  }

  def listNamespaces(baseUrl: String): Seq[String] = {
    val (status, body) = get(s"$baseUrl/v1/namespaces")
    require(status == 200, s"listNamespaces: HTTP $status $body")
    (JsonMethods.parse(body) \ "namespaces") match {
      case org.json4s.JArray(nss) => nss.collect {
        case org.json4s.JArray(List(org.json4s.JString(n))) => n
      }
      case _ => Nil
    }
  }

  def listTables(baseUrl: String, ns: String): Seq[String] = {
    val (status, body) =
      get(s"$baseUrl/v1/namespaces/${enc(ns)}/tables")
    require(status == 200, s"listTables: HTTP $status $body")
    (JsonMethods.parse(body) \ "identifiers") match {
      case org.json4s.JArray(ids) => ids.map(i =>
        (i \ "name").asInstanceOf[org.json4s.JString].s)
      case _ => Nil
    }
  }

  /** Load `ns.table` through the catalog and scan it purely from the
    * served metadata document.
    */
  def loadTable(spark: SparkSession, baseUrl: String, ns: String,
                table: String,
                asOfSnapshotId: Option[Long] = None): DataFrame = {
    val (status, body) =
      get(s"$baseUrl/v1/namespaces/${enc(ns)}/tables/${enc(table)}")
    if (status == 404)
      throw new NoSuchElementException(s"table $ns.$table not in catalog")
    require(status == 200, s"loadTable: HTTP $status $body")
    val md = JsonMethods.parse(body) \ "metadata"
    IcebergExport.readFromMetadata(spark, md, asOfSnapshotId)
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
}
