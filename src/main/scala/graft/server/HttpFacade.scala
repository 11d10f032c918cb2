package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.operators.NativeQuery
import graft.sources.LookupRegistry

/** Thin HTTP query façade — the reference's actual entry points
  * (sql/.../http/SqlResource.java:73 `/druid/v2/sql`,
  * server/.../QueryResource.java:90 `/druid/v2`), so a reference user can
  * POST the same request bodies at this engine:
  *
  *  - POST /druid/v2        body = a native JSON query → rows
  *  - POST /druid/v2/sql    body = {"query": "...", "resultFormat":
  *                          "object" (default) | "array"} or a bare SQL
  *                          string → rows
  *
  * Responses are JSON arrays of row objects (resultFormat "object", the
  * reference's SQL default) or row arrays ("array"). Rendering rides
  * `Dataset.toJSON`, so types (timestamps, arrays, structs) serialize the
  * way Spark defines them — a documented simplification of the reference's
  * per-query-type envelope (timeseries' {timestamp, result} nesting).
  *
  * This is a DRIVER-side convenience for parity testing and small result
  * sets (`collect()` on the driver — the reference's broker has the same
  * materialize-at-broker shape); large exports should write through a sink.
  */
object HttpFacade {

  final class Facade(server: HttpServer) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  def start(spark: SparkSession, resolve: NativeQuery.Resolver,
      lookups: LookupRegistry = LookupRegistry.global, port: Int = 0): Facade = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

    server.createContext("/druid/v2/sql", handler { body =>
      val (sqlText, format) = JsonMethods.parseOpt(body) match {
        case Some(o: JObject) =>
          val q = (o \ "query") match {
            case JString(s) => s
            case _ => throw new IllegalArgumentException("missing \"query\"")
          }
          val fmt = (o \ "resultFormat") match {
            case JString(f) => f; case _ => "object"
          }
          (q, fmt)
        case _ => (body, "object") // bare SQL string body
      }
      graft.functions.GraftSqlFunctions.register(spark)
      render(spark.sql(sqlText), format)
    })

    // registered second so the more specific /druid/v2/sql path wins
    server.createContext("/druid/v2", handler { body =>
      render(NativeQuery.run(spark, body, resolve, lookups), "object")
    })

    server.start()
    new Facade(server)
  }

  private def handler(f: String => String): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val (status, payload) =
        try {
          if (ex.getRequestMethod != "POST")
            (405, """{"error":"POST only"}""")
          else {
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            (200, f(body))
          }
        } catch {
          case e: Throwable =>
            (500, JsonMethods.compact(JsonMethods.render(
              JObject("error" -> JString(String.valueOf(e.getMessage))))))
        }
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
  }

  private def render(df: DataFrame, format: String): String = {
    val objects = df.toJSON.collect()
    format match {
      case "object" => objects.mkString("[", ",", "]")
      case "array" =>
        // row arrays in column order, values taken from the object rendering
        val cols = df.columns
        val rows = objects.map { o =>
          val parsed = JsonMethods.parse(o)
          JArray(cols.toList.map(c => parsed \ c match {
            case JNothing => JNull // toJSON omits null cells
            case v => v
          }))
        }
        JsonMethods.compact(JsonMethods.render(JArray(rows.toList)))
      case other => throw new IllegalArgumentException(s"resultFormat: $other")
    }
  }
}
