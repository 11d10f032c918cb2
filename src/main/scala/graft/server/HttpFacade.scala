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
      val (sqlText, format, header) = JsonMethods.parseOpt(body) match {
        case Some(o: JObject) =>
          val q = (o \ "query") match {
            case JString(s) => s
            case _ => throw new IllegalArgumentException("missing \"query\"")
          }
          val fmt = (o \ "resultFormat") match {
            case JString(f) => f; case _ => "object"
          }
          val hdr = (o \ "header") match { case JBool(b) => b; case _ => false }
          // typed positional parameters (SqlQuery.java `parameters`:
          // [{"type":"VARCHAR","value":...}, ...] bound to `?` in order)
          val params = (o \ "parameters") match {
            case JArray(ps) => ps.map {
              case p: JObject => ((p \ "type") match {
                case JString(t) => t.toUpperCase; case _ => "VARCHAR"
              }, p \ "value")
              case other => throw new IllegalArgumentException(s"parameter: $other")
            }
            case _ => Nil
          }
          (bindParameters(q, params), fmt, hdr)
        case _ => (body, "object", false) // bare SQL string body
      }
      graft.functions.GraftSqlFunctions.register(spark)
      render(spark.sql(sqlText), format, header)
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

  private def render(df: DataFrame, format: String, header: Boolean = false): String = {
    val objects = df.toJSON.collect()
    format match {
      case "object" => objects.mkString("[", ",", "]")
      case "array" =>
        // row arrays in column order, values taken from the object rendering;
        // header=true prepends the column-name row (SqlResource's header)
        val cols = df.columns
        val rows = objects.map { o =>
          val parsed = JsonMethods.parse(o)
          JArray(cols.toList.map(c => parsed \ c match {
            case JNothing => JNull // toJSON omits null cells
            case v => v
          }))
        }
        val withHeader =
          if (header) JArray(cols.toList.map(JString(_))) +: rows.toSeq else rows.toSeq
        JsonMethods.compact(JsonMethods.render(JArray(withHeader.toList)))
      case other => throw new IllegalArgumentException(s"resultFormat: $other")
    }
  }

  /** Bind positional `?` placeholders to typed parameter literals — the
    * reference's prepared-statement path (SqlQuery.java getParameterList →
    * Calcite TypedValue binding). Literal rendering by declared SQL type;
    * `?` inside string literals and line comments is left alone. */
  private[server] def bindParameters(sql: String,
      params: Seq[(String, JValue)]): String = {
    if (params.isEmpty) return sql
    val out = new StringBuilder
    var inString = false
    var inComment = false
    var next = 0
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inComment) {
        out.append(c); if (c == '\n') inComment = false
      } else if (inString) {
        out.append(c); if (c == '\'') inString = false
      } else c match {
        case '\'' => inString = true; out.append(c)
        case '-' if i + 1 < sql.length && sql.charAt(i + 1) == '-' =>
          inComment = true; out.append(c)
        case '?' =>
          if (next >= params.length)
            throw new IllegalArgumentException(s"parameter ${next + 1} not supplied")
          out.append(literal(params(next))); next += 1
        case other => out.append(other)
      }
      i += 1
    }
    out.toString
  }

  private def literal(p: (String, JValue)): String = {
    val (tpe, v) = p
    def str = v match {
      case JString(s) => s
      case JInt(n) => n.toString
      case JLong(n) => n.toString
      case JDouble(d) => d.toString
      case JDecimal(d) => d.toString
      case JBool(b) => b.toString
      case other => throw new IllegalArgumentException(s"parameter value: $other")
    }
    v match {
      case JNull => "NULL"
      case _ => tpe match {
        case "VARCHAR" | "CHAR" => "'" + str.replace("'", "''") + "'"
        case "INTEGER" | "BIGINT" | "SMALLINT" | "TINYINT" =>
          BigDecimal(str).toBigInt.toString
        case "FLOAT" | "REAL" | "DOUBLE" | "DECIMAL" | "NUMERIC" =>
          BigDecimal(str).toString
        case "BOOLEAN" => str.toBoolean.toString
        case "TIMESTAMP" => "TIMESTAMP '" + str.replace("'", "''") + "'"
        case "DATE" => "DATE '" + str.replace("'", "''") + "'"
        case other => throw new IllegalArgumentException(s"parameter type: $other")
      }
    }
  }
}
