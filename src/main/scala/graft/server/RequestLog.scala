package graft.server

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Native/SQL request logging (reference: server/.../server/log/
  * RequestLogger.java + LoggingRequestLogger.java, fed by
  * QueryLifecycle.emitLogsAndMetrics, QueryLifecycle.java:290-355): one
  * structured line per query — timestamp, remote address, the query (native
  * JSON, or the {query, context} object for SQL), and a stats map with
  * query/time (millis), query/bytes, success, and on failure the exception
  * plus interrupted/reason for cancellations and timeouts
  * (RequestLogLine.getNativeQueryLine/getSqlQueryLine, tab-joined).
  *
  * Lines go to the slf4j logger (the reference's LoggingRequestLogger
  * target) and into a bounded in-memory ring readable by ops tooling and
  * the façade spec.
  */
object RequestLog {
  final case class Entry(
      timestamp: String,
      remoteAddr: String,
      queryJson: String, // native query JSON; "" for SQL lines (RequestLogLine.java:96-100)
      statsJson: String,
      sqlJson: Option[String]) {
    def line: String =
      (Seq(timestamp, remoteAddr, queryJson, statsJson) ++ sqlJson).mkString("\t")
    def success: Boolean = statsJson.contains("\"success\":true")
  }
}

final class RequestLog(capacity: Int = 1000) {
  import RequestLog.Entry

  private val logger = org.slf4j.LoggerFactory.getLogger(classOf[RequestLog])
  private val entries = new java.util.ArrayDeque[Entry](math.min(capacity, 1024))

  private def now(): String = java.time.Instant.now().toString

  private def statsJson(durationMs: Long, bytes: Long, exception: Option[Throwable]): String = {
    val base: Seq[(String, JValue)] = Seq(
      "query/time" -> JLong(durationMs),
      "query/bytes" -> JLong(bytes),
      "success" -> JBool(exception.isEmpty))
    val failure: Seq[(String, JValue)] = exception.toSeq.flatMap { e =>
      val interrupted = e match {
        // the reference marks QueryInterruptedException/QueryTimeoutException
        // with interrupted+reason (QueryLifecycle.java:337-341)
        case _: HttpFacade.QueryCancelledException => true
        case _: HttpFacade.QueryTimedOutException => true
        case _ => false
      }
      ("exception" -> (JString(e.toString): JValue)) +:
        (if (interrupted)
          Seq("interrupted" -> (JBool(true): JValue), "reason" -> (JString(e.toString): JValue))
        else Nil)
    }
    JsonMethods.compact(JsonMethods.render(JObject((base ++ failure): _*)))
  }

  private def add(e: Entry): Unit = {
    entries.synchronized {
      if (entries.size >= capacity) entries.pollFirst()
      entries.addLast(e)
    }
    logger.info(e.line)
  }

  def logNative(remoteAddr: String, queryJson: String, durationMs: Long,
      bytes: Long, exception: Option[Throwable]): Unit =
    add(Entry(now(), remoteAddr, queryJson,
      statsJson(durationMs, bytes, exception), None))

  def logSql(remoteAddr: String, sql: String, context: JValue, durationMs: Long,
      bytes: Long, exception: Option[Throwable]): Unit = {
    val ctx = context match { case o: JObject => o; case _ => JObject() }
    add(Entry(now(), remoteAddr, "",
      statsJson(durationMs, bytes, exception),
      Some(JsonMethods.compact(JsonMethods.render(JObject(
        "query" -> JString(sql), "context" -> ctx))))))
  }

  def recent: Seq[Entry] = entries.synchronized {
    import scala.jdk.CollectionConverters._
    entries.asScala.toVector
  }
}
