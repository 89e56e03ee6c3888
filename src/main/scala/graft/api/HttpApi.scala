package graft.api

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions.{col, expr, lit}

import graft.codec.{Codec, JsonCodec}
import graft.core._
import graft.expressions.GraftFunctions
import graft.lens.{EphemeralLens, MapFn}
import graft.store._

/** Thin REST façade over the engine — the reference's HTTP surface
  * (library/controllers/) re-expressed over the Spark-backed store. Uses
  * the JDK's HttpServer (zero dependencies); every route is a direct
  * call into the engine API, so the server adds no semantics of its own.
  *
  * Routes (reference counterpart in parens):
  *   GET    /{datasets|lenses}/A:N/records/           record listing (dataset-controller:156)
  *   GET    /{datasets|lenses|meta}/A:N/records/R[.ext] read one (as ext codec)
  *   PUT    /datasets/A:N/records/R                    write (body by Content-Type)
  *   DELETE /datasets/A:N/records/R                    delete record
  *   POST   /datasets/A:N/records/                     bulk merge of {id: value}
  *   GET    /{datasets|lenses}/A:N/export/flat-file.ext[?at=V]  flat export
  *   GET    /changes?since=ts                          SSE catch-up events
  * Ephemeral lenses need a map FUNCTION, which HTTP can't carry without
  * a JS engine (absent in this container) — exposed on the Scala API
  * (EphemeralLens) instead.
  */
final class HttpApi(store: Store, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val commitLog = new graft.streaming.CommitLog(store).install()

  def boundPort: Int = server.getAddress.getPort
  def start(): HttpApi = { server.setExecutor(null); server.start(); this }
  def stop(): Unit = server.stop(0)

  server.createContext("/", (ex: HttpExchange) => handle(ex))

  private def handle(ex: HttpExchange): Unit = {
    try route(ex)
    catch {
      case e: NoSuchElementException => respond(ex, 404, s"not found: ${e.getMessage}")
      case e: IllegalArgumentException => respond(ex, 400, String.valueOf(e.getMessage))
      case e: Throwable => respond(ex, 500, s"${e.getClass.getSimpleName}: ${e.getMessage}")
    } finally ex.close()
  }

  private val RecordsPat = "^/(datasets|lenses|meta)/([^:/]+):([^:/]+)/records/$".r
  private val RecordPat = "^/(datasets|lenses|meta)/([^:/]+):([^:/]+)/records/([^/]+?)(\\.([a-z]+))?$".r
  private val ExportPat = "^/(datasets|lenses)/([^:/]+):([^:/]+)/export/flat-file\\.([a-z]+)$".r

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    (method, path) match {
      case ("GET", RecordsPat(source, author, name)) =>
        val p = DataPath(source, author, name)
        if (!ReadPath.exists(store, p)) return respond(ex, 404, "no such collection")
        // {id: {version, hash}} listing (dataset-controller.js:156);
        // goes through readPath so the virtual /meta source lists too.
        // The natural-order sort runs on the cluster (codegen'd
        // natural_key range-partitioned sort) and toLocalIterator holds
        // at most one partition on the driver, so a billion-record
        // collection lists without a driver-side collect. `?start=` /
        // `?limit=` paginate: start is inclusive by natural order, so a
        // client resumes from the last id it saw (skipping one row).
        val qp = queryParams(ex)
        val limit = qp.get("limit").map(_.toInt)
        val start = qp.get("start")
        GraftFunctions.register(store.spark)
        val base = ReadPath.read(store, p).select(
          col("id"), col("version"), col("hash"),
          expr("natural_key(id)").as("nk"))
        val page = start.fold(base)(s =>
          base.filter(col("nk") >= lit(NaturalOrder.naturalKey(s))))
        import scala.jdk.CollectionConverters._
        var it = page.orderBy(col("nk")).toLocalIterator().asScala
        limit.foreach(n => it = it.take(n))
        ex.getResponseHeaders.set("Content-Type", mimeFor("json"))
        ex.sendResponseHeaders(200, 0)
        val out: OutputStream = ex.getResponseBody
        out.write('{')
        var first = true
        it.foreach { r =>
          if (!first) out.write(',')
          first = false
          val entry = JsonCodec.encodeString(PoStr(r.getString(0))) + ":" +
            JsonCodec.encodeString(PoObj(
              "version" -> PoInt(r.getLong(1)), "hash" -> PoStr(r.getString(2))))
          out.write(entry.getBytes(UTF_8))
        }
        out.write('}')
        out.close()
      case ("GET", RecordPat(source, author, name, rid, _, ext)) =>
        val p = DataPath(source, author, name, Some(rid))
        val v = ReadPath.readRecord(store, p)
          .getOrElse(return respond(ex, 404, "no such record"))
        respondValue(ex, 200, v, Option(ext).getOrElse("json"))
      case ("PUT", RecordPat("datasets", author, name, rid, _, _)) =>
        val codec = codecFor(ex).getOrElse(JsonCodec)
        val value = codec.decode(ex.getRequestBody.readAllBytes())
        val version = store.dataset(author, name).write(rid, value)
        respondValue(ex, 200, PoObj("version" -> PoInt(version)), "json")
      case ("DELETE", RecordPat("datasets", author, name, rid, _, _)) =>
        val version = store.dataset(author, name).delete(rid)
        respondValue(ex, 200, PoObj("version" -> PoInt(version)), "json")
      case ("POST", RecordsPat("datasets", author, name)) =>
        val codec = codecFor(ex).getOrElse(JsonCodec)
        codec.decode(ex.getRequestBody.readAllBytes()) match {
          case PoObj(fields) =>
            val entries = fields.toSeq.map { case (id, v) =>
              WriteEntry(id, if (v == PoNull || v == PoUndefined) None else Some(v))
            }
            val version = store.dataset(author, name)
              .writeEntries(entries, WriteMode.Merge)
            respondValue(ex, 200, PoObj("version" -> PoInt(version)), "json")
          case _ => respond(ex, 400, "body must be an {id: value} object")
        }
      case ("GET", ExportPat(source, author, name, ext)) =>
        val p = DataPath(source, author, name)
        if (!ReadPath.exists(store, p)) return respond(ex, 404, "no such collection")
        val q = Option(ex.getRequestURI.getQuery).map(_.split("&").toSeq).getOrElse(Seq.empty)
        val at = q.collectFirst { case kv if kv.startsWith("at=") => kv.drop(3).toLong }
        val after = q.collectFirst { case kv if kv.startsWith("after=") => kv.drop(6).toLong }
        val chunks = Export.flatFile(store, p, ext, at, after)
        ex.getResponseHeaders.set("Content-Type", mimeFor(ext))
        ex.sendResponseHeaders(200, 0)
        val out: OutputStream = ex.getResponseBody
        chunks.foreach(out.write)
        out.close()
      case ("GET", "/changes") =>
        // ?since=ts[&seq=n]: full-cursor resume is exact; ts-only resume
        // re-delivers that millisecond (at-least-once) rather than
        // losing same-ms commits
        val qp = queryParams(ex)
        val since = qp.get("since").map(_.toLong).getOrElse(0L)
        val seq = qp.get("seq").map(_.toLong).getOrElse(-1L)
        val body = commitLog.eventsSince(since, seq).mkString("\n")
        respond(ex, 200, body)
      case _ => respond(ex, 404, s"no route: $method $path")
    }
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).map(_.split("&").toSeq).getOrElse(Seq.empty)
      .flatMap(kv => kv.split("=", 2) match {
        case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, UTF_8))
        case _ => None
      }).toMap

  private def codecFor(ex: HttpExchange): Option[Codec] =
    Option(ex.getRequestHeaders.getFirst("Content-Type")).flatMap { ct =>
      Seq("json", "cbor", "yaml", "xml", "msgpack", "jsonl", "html")
        .flatMap(Codec.byExtension)
        .find(_.handles.exists(h => ct.startsWith(h)))
    }

  private def mimeFor(ext: String): String =
    Codec.byExtension(ext).flatMap(_.handles.headOption)
      .getOrElse("application/octet-stream")

  private def respondValue(ex: HttpExchange, code: Int, v: PoValue, ext: String): Unit = {
    val codec = Codec.byExtension(ext)
      .getOrElse(throw new IllegalArgumentException(s"no codec for .$ext"))
    val bytes = codec.encode(v)
    ex.getResponseHeaders.set("Content-Type", mimeFor(ext))
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
  }
}
