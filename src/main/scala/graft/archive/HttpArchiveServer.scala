package graft.archive

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import java.util.regex.{Pattern, PatternSyntaxException}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** The reference's archive-access HTTP API (version 1.0) as a real
  * process a user can curl — the layer the engine stopped short of
  * through round 7. Fresh implementation of the CONTRACT of
  * Api10Controller.java (cassandra-pv-archiver-server/.../web/
  * archiveaccess/controller/Api10Controller.java:127-345) over
  * [[ConfiguredArchive]], on the JDK's built-in `HttpServer` (no new
  * dependency):
  *
  *   - `GET <ctx>/` — fixed one-archive info array
  *     (Api10Controller.java:122-137)
  *   - `GET <ctx>/1/samples/<channel>?start=S&end=E[&count=N]` —
  *     JSON v1 sample array. The channel is the URL-DECODED extra path
  *     (Api10Controller.extractExtraPathInfo → URLDecoder, :359-375),
  *     taken from the RAW request path so an encoded `/` (%2F) stays
  *     inside the name instead of splitting it into path segments.
  *     Missing/empty/unknown channel → 404; `start`/`end` missing or
  *     non-numeric, `start < 0`, `end < start`, `count <= 0` → 400
  *     (:246-279). Both bounds are served widened — AT_OR_BEFORE lower
  *     / AT_OR_AFTER upper — exactly the modes the reference's
  *     controller passes on BOTH its raw and decimated paths
  *     (:388-394, :455-462); `count` still drives resolution
  *     selection through [[ResolutionPlanner]].
  *   - `GET <ctx>/1/channels-by-pattern/<glob>` — case-insensitive
  *     `*`/`?` glob over the configured channel names, sorted
  *     (:160-175, compileGlobPattern :307-345).
  *   - `GET <ctx>/1/channels-by-regexp/<regexp>` — anchored
  *     `Pattern.matches` semantics; a bad pattern is 400 with the
  *     parse message (:189-211).
  *
  * Responses are `application/json; charset=UTF-8` and the sample
  * array is STREAMED — each element comes off the
  * [[ConfiguredArchive.serveJson]] `toLocalIterator`, so the server
  * never materializes a result, matching the reference's
  * generator-per-sample loop (:520-533). `prettyPrint` puts each
  * element on its own line (the reference delegates to Jackson's
  * default pretty printer; our elements are pre-serialized JsonV1
  * objects, so prettiness applies to the array framing).
  *
  * A typed-union store (the 21-type `vtype` layout) is auto-detected
  * and served through [[ConfiguredArchive.serveJsonTyped]] — the FULL
  * wire format (enum labels, array elements, aggregated minMaxDouble
  * with metadata, markers), which is the reference's only serving
  * path (`serializeSampleToJsonV1`); scalar stores keep the scalar
  * serializer.
  *
  * One deliberate divergence: the reference serves archived data for
  * DISABLED channels (disabling stops archiving, not retrieval); this
  * engine's [[ConfiguredArchive]] refuses them
  * ([[ChannelDisabledException]]), which the edge maps to 403 so the
  * refusal is visible rather than a lying 404.
  */
object HttpArchiveServer {

  /** The reference's servlet context for the API. */
  val ContextPath = "/archive-access/api/1.0/archive"

  final case class Running(server: HttpServer,
                           pool: java.util.concurrent.ExecutorService) {
    def port: Int = server.getAddress.getPort
    def baseUrl: String = s"http://localhost:$port$ContextPath"
    def stop(): Unit = { server.stop(0); pool.shutdown() }
  }

  /** Start serving `configPath`/`storePath` on `port` (0 = ephemeral).
    * Requests are handled on a fixed pool (`threads`, default 8) — the
    * Spark session and scheduler are thread-safe, so concurrent
    * requests interleave their small jobs instead of queueing behind
    * one another's scheduling round trips (measured: HTTPLAT row).
    */
  def start(spark: SparkSession, configPath: String, storePath: String,
            backend: StoreBackend = ManifestBackend,
            port: Int = 0, threads: Int = 8): Running = {
    // typed-union stores (the `vtype` discriminator on the raw level)
    // serve the FULL 21-type wire format — the reference has exactly
    // one serving path (serializeSampleToJsonV1 on typed samples);
    // the scalar path is this engine's simplification for
    // scalar-double stores. Detected once, lazily (the store may be
    // populated after the server starts).
    lazy val typed =
      try backend.read(spark, storePath, 0L).columns.contains("vtype")
      catch { case _: Throwable => false }
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext(ContextPath, (ex: HttpExchange) =>
      try handle(spark, configPath, storePath, backend, typed, ex)
      catch {
        case e: Throwable =>
          // last-resort 500 — contract errors are mapped before this
          try sendError(ex, 500, s"internal error: ${e.getMessage}")
          catch { case _: Throwable => () }
      } finally ex.close())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    server.setExecutor(pool)
    server.start()
    Running(server, pool)
  }

  private def handle(spark: SparkSession, configPath: String,
                     storePath: String, backend: StoreBackend,
                     typed: => Boolean, ex: HttpExchange): Unit = {
    if (ex.getRequestMethod != "GET") { sendError(ex, 405, "GET only"); return }
    // RAW path: getPath percent-decodes, which would split an encoded
    // '/' inside a channel name into path segments — the reference
    // reads request.getRequestURI (undecoded) for the same reason
    val rawPath = ex.getRequestURI.getRawPath
    val rest = rawPath.stripPrefix(ContextPath)
    val params = queryParams(ex)
    rest match {
      case "" | "/" => sendJson(ex,
        """[{"key":1,"name":"Graft","description":"Spark Graft Archive"}]""")
      case p if p.startsWith("/1/samples/") =>
        samples(spark, configPath, storePath, backend, typed, ex,
          decodePath(p.stripPrefix("/1/samples/")), params)
      case p if p.startsWith("/1/channels-by-pattern/") =>
        val glob = decodePath(p.stripPrefix("/1/channels-by-pattern/"))
        listChannels(spark, configPath, ex, params,
          Pattern.compile(ChannelRegistry.globToRegex(glob)))
      case p if p.startsWith("/1/channels-by-regexp/") =>
        val re = decodePath(p.stripPrefix("/1/channels-by-regexp/"))
        try listChannels(spark, configPath, ex, params,
          Pattern.compile("^(?:" + re + ")$"))
        catch {
          case e: PatternSyntaxException =>
            sendError(ex, 400, s"Invalid regular expression: ${e.getMessage}")
        }
      case _ => sendError(ex, 404, "not found")
    }
  }

  private def samples(spark: SparkSession, configPath: String,
                      storePath: String, backend: StoreBackend,
                      typed: => Boolean, ex: HttpExchange, channel: String,
                      params: Map[String, String]): Unit = {
    if (channel.isEmpty) { sendError(ex, 404, "not found"); return }
    // parameter validation per Api10Controller.java:246-279: a missing
    // or non-numeric required param is 400 (Spring's @RequestParam
    // binding), as are the explicit range/count checks
    val start = params.get("start").flatMap(_.toLongOption)
    val end = params.get("end").flatMap(_.toLongOption)
    val countRaw = params.get("count")
    val count = countRaw.map(_.toLongOption)
    if (start.isEmpty || end.isEmpty || count.exists(_.isEmpty)) {
      sendError(ex, 400, "start and end (and count, if given) must be integers")
      return
    }
    if (start.get < 0L || end.get < start.get) {
      sendError(ex, 400, "require 0 <= start <= end")
      return
    }
    if (count.exists(_.exists(_ <= 0L))) {
      sendError(ex, 400, "count must be positive")
      return
    }
    val it =
      try {
        if (typed)
          ConfiguredArchive.serveJsonTyped(spark, configPath, storePath,
            channel, start.get, end.get, count.flatten, backend)
        else
          ConfiguredArchive.serveJson(spark, configPath, storePath, channel,
            start.get, end.get, count.flatten, backend,
            loMode = Some(ArchiveReader.AtOrWidened),
            hiMode = Some(ArchiveReader.AtOrWidened))
      }
      catch {
        case _: NoSuchChannelException => sendError(ex, 404, "not found"); return
        case e: ChannelDisabledException =>
          sendError(ex, 403, e.getMessage); return
        // a CONFIGURED channel with no stored data trips the engine's
        // fail-fast require (unknown names already 404'd above via the
        // config resolution) — the reference serves an empty array for
        // a channel that exists but has no samples
        case _: IllegalArgumentException => Iterator.empty[String]
      }
    streamJsonArray(ex, it, pretty = params.contains("prettyPrint"))
  }

  private def listChannels(spark: SparkSession, configPath: String,
                           ex: HttpExchange, params: Map[String, String],
                           pattern: Pattern): Unit = {
    // metadata-sized: the config state is a driver-side Seq, matched
    // and sorted like the reference's SortedMap-backed cache walk
    val names = ConfigCommands.state(spark, configPath).configs
      .map(_.name).filter(n => pattern.matcher(n).matches()).sorted
    streamJsonArray(ex, names.iterator.map(jsonString),
      pretty = params.contains("prettyPrint"))
  }

  /** JSON string literal: quote/backslash/control-char escaped. */
  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  // ---- plumbing ------------------------------------------------------

  /** The reference decodes the extra path info with plain URLDecoder
    * UTF-8 (Api10Controller.java:366-369). URLDecoder treats '+' as a
    * space, and so therefore does this edge — channel names with real
    * plus signs arrive as %2B, exactly as the reference requires.
    */
  private def decodePath(raw: String): String =
    URLDecoder.decode(raw, StandardCharsets.UTF_8)

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).toSeq
      .flatMap(_.split("&").toSeq)
      .filter(_.nonEmpty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => decodePath(k) -> decodePath(v)
          case Array(k) => decodePath(k) -> ""
        }
      }.toMap

  private def sendJson(ex: HttpExchange, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      "application/json; charset=UTF-8")
    ex.sendResponseHeaders(200, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.getResponseBody.close()
  }

  private def sendError(ex: HttpExchange, code: Int, msg: String): Unit = {
    val bytes = msg.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=UTF-8")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.getResponseBody.close()
  }

  /** Chunked-streamed JSON array: one element written per iterator
    * step, nothing materialized — length 0 in sendResponseHeaders is
    * the JDK server's chunked-transfer mode.
    */
  private def streamJsonArray(ex: HttpExchange, elems: Iterator[String],
                              pretty: Boolean): Unit = {
    ex.getResponseHeaders.set("Content-Type",
      "application/json; charset=UTF-8")
    ex.sendResponseHeaders(200, 0L)
    val out = ex.getResponseBody
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
    w("[")
    var first = true
    elems.foreach { e =>
      if (!first) w(",")
      if (pretty) w("\n  ")
      w(e)
      first = false
    }
    if (pretty && !first) w("\n")
    w("]")
    out.close()
  }
}
