package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.{Instant, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
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
  *  - POST /druid/v2        body = a native JSON query → per-query-type
  *                          result envelopes (below)
  *  - POST /druid/v2/sql    body = {"query": "...", "resultFormat":
  *                          "object" (default) | "array" | "objectLines" |
  *                          "arrayLines" | "csv", "header": bool,
  *                          "typesHeader": bool, "sqlTypesHeader": bool,
  *                          "parameters": [...]} or a bare SQL string
  *
  * SQL responses mirror ResultFormat.java's writers byte-for-byte where the
  * engines' value renderings agree: object/array are one JSON array ending
  * in LF (ObjectWriter/ArrayWriter.writeResponseEnd), the Lines formats put
  * one JSON value per line and terminate with a blank line, csv quotes
  * RFC-4180-style and also terminates with a blank line (CsvWriter.java:63
  * "an extra blank line, so users can tell the response was not cut off").
  * header=true emits the column-name header; typesHeader/sqlTypesHeader add
  * the Druid-type and SQL-type rows (ArrayWriter) or nest
  * {"type","sqlType"} objects per column (ObjectWriter.writeHeader).
  * Errors return the reference's QueryException JSON {error, errorMessage,
  * errorClass, host} with 400 for planning errors (SqlPlanningException:
  * "SQL parse failed" / "Plan validation failed") and 500 otherwise; every
  * SQL response carries X-Druid-SQL-Query-Id (SqlResource.java:75), taken
  * from context.sqlQueryId when set.
  *
  * Native results carry the reference's per-query-type envelopes
  * (the result examples under docs/querying, `*QueryQueryToolChest.java`):
  * timeseries rows nest as `{"timestamp", "result": {...}}` (grand-total
  * row: null timestamp), topN and search as one `{"timestamp", "result":
  * [...]}` bucket, groupBy as `{"version": "v1", "timestamp", "event":
  * {...}}`, timeBoundary/dataSourceMetadata as `{"timestamp", "result":
  * {...}}`, scan as `{"segmentId": null, "columns", "events"}` honoring
  * list/compactedList resultFormats (segments are not a query-time concept
  * here; the reference itself nulls segmentId under time ordering),
  * segmentMetadata as one merged SegmentAnalysis object with a per-column
  * ColumnAnalysis map. SQL supports
  * `EXPLAIN PLAN FOR ...`
  * (DruidPlanner.java:669 — one row with PLAN + RESOURCES columns; the plan
  * text here is Spark's, since Catalyst is the planner).
  *
  * This is a DRIVER-side convenience for parity testing and small result
  * sets (the reference's broker has the same materialize-at-broker shape);
  * `maxResultRows` bounds the driver materialization — results past the cap
  * fail loudly instead of OOMing. Large exports should write through a sink.
  */
object HttpFacade {

  final class Facade(server: HttpServer, val requestLog: RequestLog,
      val planCache: PlanCache, val resultCache: ResultCache) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  /** Small LRU of compiled native-query DataFrames (What's-wrong r8 #2: the
    * tiny-query latency floor is plan construction + analysis + codegen of
    * large comparator expression trees, constant at any data scale — a
    * repeated JSON shape should not pay it twice). Results are NOT cached —
    * execution always runs; only the compiled plan is reused, and Spark's
    * codegen cache then reuses the generated classes. Keys include the
    * lookup registry's generation and the ingest layer's data generation,
    * so a lookup update or an in-process write/compaction invalidates every
    * cached plan (the reference's CachingClusteredClient keys on segment
    * identifiers the same way); execution-irrelevant context keys (queryId,
    * timeout, priority, lane) are stripped from the key so per-request ids
    * don't defeat the cache. */
  /** Cache key normalization shared by the plan and result caches:
    * execution-irrelevant context keys (queryId, timeout, priority, lane)
    * and cache-control flags are stripped so per-request ids don't defeat
    * the caches. */
  private[server] def normalizeBody(body: String): String =
    JsonMethods.parseOpt(body) match {
      case Some(o: JObject) =>
        val ctx = (o \ "context") match {
          case c: JObject => JObject(c.obj.filterNot(kv =>
            Set("queryId", "timeout", "priority", "lane",
              "useCache", "populateCache").contains(kv._1)))
          case _ => JObject()
        }
        JsonMethods.compact(JsonMethods.render(
          JObject(o.obj.filterNot(_._1 == "context") ++
            (if (ctx.obj.nonEmpty) List("context" -> (ctx: JValue)) else Nil))))
      case _ => body
    }

  private[server] final class PlanCache(lookups: LookupRegistry, capacity: Int = 64) {
    private val hitCount = new java.util.concurrent.atomic.AtomicLong(0L)
    private val missCount = new java.util.concurrent.atomic.AtomicLong(0L)
    private val map =
      new java.util.LinkedHashMap[(String, Long, Long), DataFrame](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long, Long), DataFrame]): Boolean =
          size() > capacity
      }

    def get(body: String)(build: => DataFrame): DataFrame =
      getKeyed("native:" + normalizeBody(body))(build)

    /** SQL-route plans cache under the BOUND statement text (positional
      * parameters are already inlined, so the key carries the parameter
      * signature) plus every execution-relevant planner knob. */
    def getSql(boundSql: String, knobs: String)(build: => DataFrame): DataFrame =
      getKeyed("sql:" + knobs + ":" + boundSql)(build)

    private def getKeyed(norm: String)(build: => DataFrame): DataFrame = {
      val key = (norm, lookups.generation,
        graft.sources.BatchIngest.dataGeneration)
      map.synchronized(Option(map.get(key))) match {
        case Some(df) => hitCount.incrementAndGet(); df
        case None =>
          val df = build
          map.synchronized(map.put(key, df))
          missCount.incrementAndGet()
          df
      }
    }

    /** Drop every cached plan. The generation keys only see IN-PROCESS
      * writes (BatchIngest.write/registerSpec, lookup updates) — data
      * rewritten by an external writer (a direct spark write to the same
      * path, another process) is invisible to them, so operators must POST
      * the invalidation endpoint after out-of-band changes. */
    def invalidateAll(): Unit = map.synchronized(map.clear())

    def hits: Long = hitCount.get()
    def misses: Long = missCount.get()
  }

  /** Native-route RESULT cache (the reference's broker-level result cache,
    * CachingClusteredClient.java:506-537 + CacheStrategy): the rendered
    * response payload keyed on the normalized query body and the same
    * lookup/ingest generation keys as the plan cache, so an in-process
    * write or lookup update invalidates automatically. Per-query `context`
    * flags `useCache` / `populateCache` opt out (CacheUtil.isUseResultCache
    * /isPopulateResultCache — Druid's broker defaults both true when the
    * cache is configured). Entries above `maxEntryBytes` are not stored
    * (the reference's `cache.resultLevelCacheLimit`). Same out-of-band
    * caveat as the plan cache: external writers require the admin
    * invalidation endpoint (which clears BOTH caches). */
  private[server] final class ResultCache(lookups: LookupRegistry,
      capacity: Int = 64, maxEntryBytes: Int = 2 << 20) {
    private val hitCount = new java.util.concurrent.atomic.AtomicLong(0L)
    private val missCount = new java.util.concurrent.atomic.AtomicLong(0L)
    private val map =
      new java.util.LinkedHashMap[(String, Long, Long), String](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long, Long), String]): Boolean =
          size() > capacity
      }
    def get(body: String, useCache: Boolean, populateCache: Boolean)
        (build: => String): String =
      getKeyed("native:" + normalizeBody(body), useCache, populateCache)(build)

    /** SQL-route results cache under the BOUND statement + every
      * execution-relevant knob INCLUDING the plan-check context flags and
      * the response format — a hit skips planning AND the plan checks, so
      * a different check/format combination must key separately. */
    def getSql(boundSql: String, knobs: String, useCache: Boolean,
        populateCache: Boolean)(build: => String): String =
      getKeyed("sql:" + knobs + ":" + boundSql, useCache, populateCache)(build)

    private def getKeyed(norm: String, useCache: Boolean, populateCache: Boolean)
        (build: => String): String = {
      val key = (norm, lookups.generation,
        graft.sources.BatchIngest.dataGeneration)
      if (useCache) map.synchronized(Option(map.get(key))) match {
        case Some(payload) => hitCount.incrementAndGet(); return payload
        case None => ()
      }
      val payload = build
      missCount.incrementAndGet()
      if (populateCache && payload.length <= maxEntryBytes)
        map.synchronized(map.put(key, payload))
      payload
    }
    def invalidateAll(): Unit = map.synchronized(map.clear())
    def hits: Long = hitCount.get()
    def misses: Long = missCount.get()
  }

  // the requesting client's address, set per-exchange by the handlers so
  // the request log can record it (the reference passes remoteAddr through
  // RequestLogLine.forNative/forSql)
  private val currentRemoteAddr = new ThreadLocal[String] {
    override def initialValue(): String = ""
  }

  /** Raised when a request's query was cancelled through the DELETE
    * endpoints; rendered as the reference's QUERY_CANCELLED QueryException
    * (QueryInterruptedException.java:47 "Query cancelled", HTTP 500 —
    * SqlResourceTest.testCancelBetweenPlanAndExecute). */
  private[server] final class QueryCancelledException
    extends RuntimeException("Query canceled")

  /** Raised when the query's `timeout` context parameter elapses; rendered
    * as the reference's QueryTimeoutException — error "Query timeout",
    * HTTP 504 (QueryTimeoutException.java:39-41; SqlResourceTest
    * .testQueryTimeoutException asserts the code + class). */
  private[server] final class QueryTimedOutException
    extends RuntimeException("Query Timed Out!")

  /** Raised when the server's concurrent-query capacity is exhausted;
    * rendered as the reference's QueryCapacityExceededException — error
    * "Query capacity exceeded", HTTP 429 (QueryCapacityExceededException
    * .java:41-47, the QueryScheduler's laning guard;
    * SqlResourceTest.testTooManyRequests). */
  private[server] final class QueryCapacityException private (msg: String)
    extends RuntimeException(msg)
  private[server] object QueryCapacityException {
    // TOTAL_ERROR_MESSAGE_TEMPLATE / LANE_ERROR_MESSAGE_TEMPLATE
    // (QueryCapacityExceededException.java:41-44)
    def total(capacity: Int): QueryCapacityException = new QueryCapacityException(
      s"Too many concurrent queries, total query capacity of $capacity exceeded. " +
        "Please try your query again later.")
    def lane(lane: String, capacity: Int): QueryCapacityException = new QueryCapacityException(
      s"Too many concurrent queries for lane '$lane', query capacity of $capacity exceeded. " +
        "Please try your query again later.")
  }

  /** Guards the session-level conf toggles the SQL entry points apply
    * around each query (ANSI off for Druid's lenient-cast semantics, the
    * optional per-query sqlTimeZone). The server runs requests on a thread
    * pool, so naive save/set/restore races: a query could save ANOTHER
    * query's toggled value and "restore" the session to it permanently.
    * ANSI-off is reference-counted (first query in saves the true session
    * value, last one out restores it); a query that changes the session
    * time zone runs exclusively, since two zones cannot share one session.
    */
  private[server] object SessionScope {
    private val rw = new java.util.concurrent.locks.ReentrantReadWriteLock
    private var depth = 0
    private var savedAnsi: Option[String] = None

    private def enterAnsiOff(spark: SparkSession): Unit = synchronized {
      if (depth == 0) {
        savedAnsi = spark.conf.getOption("spark.sql.ansi.enabled")
        spark.conf.set("spark.sql.ansi.enabled", "false")
      }
      depth += 1
    }
    private def exitAnsiOff(spark: SparkSession): Unit = synchronized {
      depth -= 1
      if (depth == 0) savedAnsi match {
        case Some(v) => spark.conf.set("spark.sql.ansi.enabled", v)
        case None => spark.conf.unset("spark.sql.ansi.enabled")
      }
    }

    /** Run with ANSI off; concurrent callers share the toggle safely. */
    def run[A](spark: SparkSession)(body: => A): A = {
      rw.readLock.lock()
      enterAnsiOff(spark)
      try body finally {
        exitAnsiOff(spark)
        rw.readLock.unlock()
      }
    }

    /** Run with ANSI off AND the session time zone set — exclusive. */
    def runZoned[A](spark: SparkSession, zone: java.time.ZoneId)(body: => A): A = {
      rw.writeLock.lock()
      val prevZone = spark.conf.getOption("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", zone.getId)
      enterAnsiOff(spark)
      try body finally {
        exitAnsiOff(spark)
        prevZone match {
          case Some(v) => spark.conf.set("spark.sql.session.timeZone", v)
          case None => spark.conf.unset("spark.sql.session.timeZone")
        }
        rw.writeLock.unlock()
      }
    }
  }

  /** Total concurrency guard — the QueryScheduler's total-lane analog.
    * `limit <= 0` means unlimited (the default: this driver-side facade is
    * usually single-tenant; a shared broker sets a limit sized to its
    * executor slots so queued queries fail fast instead of piling onto the
    * scheduler). */
  /** Total + per-lane concurrency guard — the QueryScheduler analog. The
    * "low" lane follows HiLoQueryLaningStrategy: a query lands there when
    * its context names the lane or carries a negative priority
    * (HiLoQueryLaningStrategy.java:76-85), and the lane's capacity is
    * ceil(total × maxLowPercent / 100) (QueryLaningStrategy.java:57-60).
    * A full lane rejects with the lane-flavored capacity message; the lane
    * permit holds while the total permit is acquired so the two compose. */
  private[server] final class CapacityGuard(limit: Int, maxLowPercent: Int = 0) {
    private val sem =
      if (limit > 0) Some(new java.util.concurrent.Semaphore(limit)) else None
    private val lowLimit =
      if (limit > 0 && maxLowPercent > 0) math.ceil(limit * maxLowPercent / 100.0).toInt
      else 0
    private val lowSem =
      if (lowLimit > 0) Some(new java.util.concurrent.Semaphore(lowLimit)) else None

    def run[A](body: => A): A = run(None, None)(body)

    def run[A](lane: Option[String], priority: Option[Int])(body: => A): A = {
      val effectiveLane =
        lane.orElse(if (priority.exists(_ < 0)) Some("low") else None)
      val lowHeld = (effectiveLane, lowSem) match {
        case (Some("low"), Some(ls)) =>
          if (!ls.tryAcquire()) throw QueryCapacityException.lane("low", lowLimit)
          true
        case _ => false
      }
      try sem match {
        case None => body
        case Some(s) =>
          if (!s.tryAcquire()) throw QueryCapacityException.total(limit)
          try body finally s.release()
      } finally if (lowHeld) lowSem.get.release()
    }
  }

  /** queryId → running-query registry backing `DELETE /druid/v2/{id}` and
    * `DELETE /druid/v2/sql/{id}` (QueryResource.java:142-166 cancelQuery via
    * the QueryScheduler; SqlResource.java:264-290 via the
    * SqlLifecycleManager). Each query runs inside a Spark job group named
    * after its queryId; cancel() kills the group's active jobs
    * (SparkContext.cancelJobGroup with task interruption) and flags the
    * entry so a cancel that lands between plan and execute still fails the
    * request — the reference removes the lifecycle snapshot the same way. */
  private[server] final class CancelRegistry(sc: org.apache.spark.SparkContext) {
    final class State(val groupId: String, val runner: Thread) {
      @volatile var cancelled = false
      @volatile var timedOut = false
      // guards runner.interrupt() against the request having already
      // finished (an interrupt landing after run() returned would poison
      // the pooled handler thread mid-response)
      val lock = new Object
      var finished = false
      def abort(timeout: Boolean): Unit = lock.synchronized {
        if (!finished) {
          if (timeout) timedOut = true else cancelled = true
          sc.cancelJobGroupAndFutureJobs(groupId)
          // cancelJobGroup alone can leave the driver thread parked in
          // AQE's stage-event loop (withFinalPlanUpdate waits on a queue
          // that a killed stage never feeds) — interrupting the handler
          // thread unblocks any such wait
          runner.interrupt()
        }
      }
    }
    private val counter = new java.util.concurrent.atomic.AtomicLong
    private val running = scala.collection.concurrent.TrieMap.empty[String, State]
    // one shared watchdog thread arms every per-query `timeout` context
    // parameter (QueryContexts.TIMEOUT_KEY); firing cancels the query's job
    // group the same way a DELETE does
    private lazy val watchdog =
      java.util.concurrent.Executors.newSingleThreadScheduledExecutor((r: Runnable) => {
        val t = new Thread(r, "graft-query-timeout"); t.setDaemon(true); t
      })

    def run[A](queryId: String, timeoutMillis: Long = 0L)(body: => A): A = {
      val st = new State(s"graft-query-$queryId-${counter.incrementAndGet()}",
        Thread.currentThread())
      running.put(queryId, st)
      // thread-local: the handler thread submits the query's jobs, so the
      // group tags exactly this request's work; interruptOnCancel kills the
      // running tasks, not just pending stages
      sc.setJobGroup(st.groupId, s"queryId=$queryId", interruptOnCancel = true)
      val timer =
        if (timeoutMillis <= 0L) None
        else Some(watchdog.schedule(new Runnable {
          override def run(): Unit = st.abort(timeout = true)
        }, timeoutMillis, java.util.concurrent.TimeUnit.MILLISECONDS))
      try {
        val out = body
        if (st.timedOut) throw new QueryTimedOutException
        if (st.cancelled) throw new QueryCancelledException
        out
      } catch {
        case e: Throwable =>
          if (st.timedOut) throw new QueryTimedOutException
          else if (st.cancelled) throw new QueryCancelledException
          else throw e
      } finally {
        timer.foreach(_.cancel(false))
        st.lock.synchronized { st.finished = true }
        Thread.interrupted() // clear a raced interrupt before thread reuse
        sc.clearJobGroup()
        running.remove(queryId)
      }
    }

    def cancel(queryId: String): Boolean = running.remove(queryId) match {
      case Some(st) =>
        // ...AndFutureJobs (inside abort): a cancel landing while the
        // request is still planning (no job submitted yet) must also void
        // the jobs it would submit next — plain cancelJobGroup only kills
        // active ones
        st.abort(timeout = false)
        true
      case None => false
    }
  }

  /** Server-level default query context (DefaultQueryConfig.java — the
    * `druid.query.default.context.*` runtime properties): each entry is
    * merged under the request's own `context`, and a key the request
    * already sets always wins (QueryResourceTest
    * .testGoodQueryWithQueryConfigOverrideDefault /
    * testGoodQueryWithQueryConfigDoesNotOverrideQueryContext — the
    * lifecycle's initialize() only copies default keys absent from the
    * query's context). Applies to both the native and SQL routes, like the
    * reference's QueryLifecycle/SqlLifecycle sharing one supplier. */
  private def withDefaultContext(body: String, defaults: JObject): String =
    if (defaults.obj.isEmpty) body
    else JsonMethods.parseOpt(body) match {
      case Some(o: JObject) =>
        val reqCtx = (o \ "context") match { case c: JObject => c; case _ => JObject() }
        val merged = JObject(
          defaults.obj.filterNot(kv => reqCtx.obj.exists(_._1 == kv._1)) ++ reqCtx.obj)
        JsonMethods.compact(JsonMethods.render(
          JObject(o.obj.filterNot(_._1 == "context") :+ ("context" -> (merged: JValue)))))
      case _ => body
    }

  def start(spark: SparkSession, resolve: NativeQuery.Resolver,
      lookups: LookupRegistry = LookupRegistry.global, port: Int = 0,
      maxResultRows: Int = 100000, maxConcurrentQueries: Int = 0,
      maxLowPercent: Int = 0, defaultContext: JObject = JObject()): Facade = {
    // the embedder's session may ride Spark defaults (128-key hash-agg
    // fallback, JVM timezone); the engine's plan guarantees are a library
    // concern — apply them here, never clobbering explicit settings
    graft.GraftSession.configure(spark)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // a request pool (vs the default single dispatcher thread) so a DELETE
    // cancellation can be served while a POST query is still executing —
    // the reference's Jetty broker is multi-threaded the same way
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
      (r: Runnable) => { val t = new Thread(r, "graft-http"); t.setDaemon(true); t }))

    // the reference's JDBC transport (DruidAvaticaJsonHandler.AVATICA_PATH);
    // the longer context path wins over /druid/v2/sql for both the trailing-
    // slash and bare spellings (the reference accepts both:
    // DruidAvaticaJsonHandler.java:38-39)
    val avatica = new AvaticaEndpoint(spark,
      s"127.0.0.1:${server.getAddress.getPort}", maxResultRows = maxResultRows)
    server.createContext("/druid/v2/sql/avatica", statusHandler(avatica.handle))

    val cancels = new CancelRegistry(spark.sparkContext)
    val capacity = new CapacityGuard(maxConcurrentQueries, maxLowPercent)
    val requestLog = new RequestLog()
    val planCache = new PlanCache(lookups)
    val resultCache = new ResultCache(lookups)

    server.createContext("/druid/v2/sql", sqlHandler(cancels, capacity, requestLog, defaultContext) { body =>
      val (sqlText, format, header, typesHeader, sqlTypesHeader, context) =
        JsonMethods.parseOpt(body) match {
        case Some(o: JObject) =>
          val q = (o \ "query") match {
            case JString(s) => s
            case _ => throw new IllegalArgumentException("missing \"query\"")
          }
          // deserialization is case-insensitive (ResultFormatTest
          // .testDeserializeWithDifferentCase: OBJECTLINES/objectlines/
          // oBjEcTlInEs all resolve)
          val fmt = (o \ "resultFormat") match {
            case JString(f) => canonicalFormat(f); case _ => "object"
          }
          val hdr = (o \ "header") match { case JBool(b) => b; case _ => false }
          // SqlQuery.java:75-82 rejects type headers without the header row —
          // request validation in the @JsonCreator, a 400-class bad request
          val tHdr = (o \ "typesHeader") match { case JBool(b) => b; case _ => false }
          val sHdr = (o \ "sqlTypesHeader") match { case JBool(b) => b; case _ => false }
          if (tHdr && !hdr)
            throw new IllegalArgumentException("Cannot include 'typesHeader' without 'header'")
          if (sHdr && !hdr)
            throw new IllegalArgumentException("Cannot include 'sqlTypesHeader' without 'header'")
          val ctx = (o \ "context") match { case c: JObject => c; case _ => JObject() }
          // typed positional parameters (SqlQuery.java `parameters`:
          // [{"type":"VARCHAR","value":...}, ...] bound to `?` in order)
          val params = (o \ "parameters") match {
            case JArray(ps) => ps.map {
              case p: JObject => ((p \ "type") match {
                case JString(t) => t.toUpperCase; case _ => "VARCHAR"
              }, p \ "value")
              // a null entry is an explicitly-unbound position
              // (CalciteParameterQueryTest.testPartiallyMissingParameterInTheMiddle)
              case JNull => null
              case other => throw new IllegalArgumentException(s"parameter: $other")
            }
            case _ => Nil
          }
          (bindParameters(q, params), fmt, hdr, tHdr, sHdr, ctx)
        case _ => // bare SQL string body
          (body, "object", false, false, false, JObject())
      }
      // context-parameter validation (reference: QueryContexts.java —
      // maxNumericInFilters must be positive and may not exceed the
      // system cap of 100)
      (context \ "maxNumericInFilters") match {
        case JInt(n) if n <= 0 =>
          throw new IllegalArgumentException("[maxNumericInFilters] must be greater than 0")
        case JInt(n) if n > 100 =>
          throw new IllegalArgumentException(
            "Expected parameter[maxNumericInFilters] cannot exceed system set value of [100]")
        case _ => ()
      }
      val requireTime = (context \ "requireTimeCondition") match {
        case JBool(b) => b; case _ => false
      }
      // GroupByQueryConfig.CTX_KEY_ENABLE_MULTI_VALUE_UNNESTING (default true)
      val mvUnnesting = (context \ "groupByEnableMultiValueUnnesting") match {
        case JBool(b) => b; case _ => true
      }
      val maxNumericIn = (context \ "maxNumericInFilters") match {
        case JInt(n) => Some(n.toInt); case _ => None
      }
      // PlannerContext.CTX_SQL_TIME_ZONE: evaluate AND render in the
      // query's zone (SqlResourceTest.testTimestampsInResponseLosAngeles
      // TimeZone expects "1999-12-31T16:00:00.000-08:00")
      val sqlZone = (context \ "sqlTimeZone") match {
        case JString(z) => Some(java.time.ZoneId.of(z)); case _ => None
      }
      // PlannerContext.CTX_SQL_OUTER_LIMIT: cap the outermost result —
      // consoles set it to bound ad-hoc queries without editing the SQL
      val outerLimit = (context \ "sqlOuterLimit") match {
        case JInt(n) => Some(n.toInt); case JLong(n) => Some(n.toInt); case _ => None
      }
      // PlannerConfig.useApproximateCountDistinct — COUNT(DISTINCT) plans to
      // an HLL++ estimate (opt-in here; the engine's default stays exact)
      val approxCountDistinct = (context \ "useApproximateCountDistinct") match {
        case JBool(b) => b; case _ => false
      }
      graft.functions.GraftSqlFunctions.register(spark)
      // metadata queries see the live catalog without a manual re-register
      SystemSchema.refreshIfMetadataQuery(spark, sqlText)
      // Druid SQL never throws on a malformed cast — a mismatched-type
      // comparison plans to null / no-match (sql/.../planner/Calcites.java
      // lenient coercion; CalciteParameterQueryTest.java:623 binds VARCHAR
      // 'wat' against a float and expects 0 rows, not an error) — so the
      // SQL endpoint analyzes queries with ANSI cast errors off via the
      // thread-safe SessionScope (concurrent requests share the toggle).
      def evaluate(): String = {
        val ExplainRe = "(?is)\\s*EXPLAIN\\s+PLAN\\s+FOR\\s+(.*)".r
        sqlText match {
          case ExplainRe(inner) => renderObjects(explainRows(spark, inner),
            Seq(ColMeta("PLAN", Some("STRING"), "VARCHAR"),
              ColMeta("RESOURCES", Some("STRING"), "VARCHAR")),
            format, header, typesHeader, sqlTypesHeader)
          case _ => graft.sources.SqlInsertDml.parse(sqlText) match {
            case Some(_) =>
              // INSERT DML routes through the ingest path; where the reference
              // hands back an ingest task handle, this facade reports the
              // published row count (the write is synchronous here)
              val published = graft.sources.SqlInsertDml.run(spark, sqlText)
              renderObjects(Seq(JObject("inserted" -> JLong(published.count()))),
                Seq(ColMeta("inserted", Some("LONG"), "BIGINT")),
                format, header, typesHeader, sqlTypesHeader)
            case None =>
              def build(): DataFrame = {
                val df1 = spark.sql(sqlText)
                val df0 =
                  if (approxCountDistinct) graft.plans.PlannerChecks.approximateCountDistinct(df1)
                  else df1
                outerLimit.fold(df0)(df0.limit)
              }
              // repeated dashboard SQL pays the same constant
              // plan-construction floor as native JSON, so the compiled
              // DataFrame caches under the BOUND text (parameters already
              // inlined) + planner knobs + zone. Skipped for metadata
              // queries (the plan would snapshot catalog temp views) and
              // statements with evaluation-time "now" functions
              // (ComputeCurrentTime would freeze them into the cached plan).
              val lower = sqlText.toLowerCase(java.util.Locale.ROOT)
              val trimmed = lower.trim
              // only plain read statements: DDL/SET execute eagerly inside
              // spark.sql and must never be skipped by a cache hit
              val cacheable =
                (trimmed.startsWith("select") || trimmed.startsWith("with") ||
                  trimmed.startsWith("values")) &&
                !lower.contains("information_schema.") &&
                !lower.contains("sys.") && !lower.contains("current_") &&
                !lower.contains("now()") && !lower.contains("localtimestamp")
              val knobs = s"$approxCountDistinct:$outerLimit:" +
                sqlZone.map(_.getId).getOrElse("UTC")
              def produce(): String = {
                val df = if (cacheable) planCache.getSql(sqlText, knobs)(build())
                         else build()
                if (requireTime) graft.plans.PlannerChecks.requireTimeCondition(df)
                if (!mvUnnesting) graft.plans.PlannerChecks.requireNoMultiValueUnnesting(df)
                maxNumericIn.foreach(graft.plans.PlannerChecks.requireMaxNumericInFilters(df, _))
                render(df, format, header, typesHeader, sqlTypesHeader, maxResultRows,
                  sqlZone.getOrElse(ZoneOffset.UTC))
              }
              // result-level cache over the rendered payload (same
              // cacheability rules as the plan cache; the key adds the
              // plan-check flags and the response format, so a hit never
              // skips a check or format the entry wasn't produced under)
              def ctxBool(name: String, default: Boolean): Boolean =
                (context \ name) match { case JBool(b) => b; case _ => default }
              val resultKnobs = s"$knobs:$requireTime:$mvUnnesting:$maxNumericIn:" +
                s"$format:$header:$typesHeader:$sqlTypesHeader"
              if (cacheable)
                resultCache.getSql(sqlText, resultKnobs,
                  ctxBool("useCache", true), ctxBool("populateCache", true))(produce())
              else produce()
          }
        }
      }
      sqlZone match {
        case Some(z) => SessionScope.runZoned(spark, z)(evaluate())
        case None => SessionScope.run(spark)(evaluate())
      }
    })

    // registered second so the more specific /druid/v2/sql path wins.
    // DELETE /druid/v2/{id} is the native cancellation endpoint
    // (QueryResource.java:142-166 cancelQuery): the reference answers 202
    // even for an id the scheduler never registered (it only warns), so the
    // status is ACCEPTED either way
    // the id assigned to the in-flight native request: generated ONCE per
    // request (in respHeaders, which runs first on the same handler thread)
    // and reused for cancel registration, so the X-Druid-Query-Id a client
    // reads back is always the id DELETE /druid/v2/{id} can cancel — the
    // reference assigns the id in QueryLifecycle.initialize before both
    val nativeAssignedId = new ThreadLocal[String]
    server.createContext("/druid/v2", statusHandler(rawBody => {
      // one request-log line per query — success or failure — matching
      // QueryLifecycle.emitLogsAndMetrics feeding the RequestLogger
      val startNs = System.nanoTime()
      def elapsedMs() = (System.nanoTime() - startNs) / 1000000L
      // server-level context defaults merge under the request's context
      // (request keys win), and the merged body is what executes — so a
      // default like skipEmptyBuckets/priority reaches the query exactly as
      // if the client had set it (QueryLifecycle.initialize)
      val body = withDefaultContext(rawBody, defaultContext)
      try {
        val q = JsonMethods.parse(body)
        val queryId = Option(nativeAssignedId.get)
          .getOrElse(java.util.UUID.randomUUID().toString)
        val timeoutMs = (q \ "context" \ "timeout") match {
          case JInt(n) => n.toLong; case JLong(n) => n; case _ => 0L
        }
        // result cache first (broker result-level cache): a hit returns the
        // rendered payload without planning or executing; context flags
        // useCache/populateCache opt out per query
        def ctxBool(name: String, default: Boolean): Boolean =
          (q \ "context" \ name) match { case JBool(b) => b; case _ => default }
        def exec(): String =
          resultCache.get(body, ctxBool("useCache", true), ctxBool("populateCache", true)) {
            envelope(q,
              planCache.get(body)(NativeQuery.run(spark, body, resolve, lookups)),
              maxResultRows)
          }
        val lane = (q \ "context" \ "lane") match {
          case JString(l) => Some(l); case _ => None
        }
        val priority = (q \ "context" \ "priority") match {
          case JInt(n) => Some(n.toInt); case JLong(n) => Some(n.toInt); case _ => None
        }
        // every query is cancel-registered under its assigned id (the
        // reference's QueryScheduler registers unconditionally), so a DELETE
        // with the returned header id works even without a client queryId
        val payload =
          capacity.run(lane, priority)(cancels.run(queryId, timeoutMs)(exec()))
        requestLog.logNative(currentRemoteAddr.get, body, elapsedMs(),
          payload.getBytes(StandardCharsets.UTF_8).length.toLong, None)
        (200, payload)
      } catch { case e: Throwable =>
        requestLog.logNative(currentRemoteAddr.get, body, elapsedMs(), 0L, Some(e))
        throw e
      }
    }, onDelete = Some(id => { cancels.cancel(id); 202 }),
      // X-Druid-Query-Id on every native response — the context's id when
      // the client set one, a fresh one otherwise (QueryResource
      // QUERY_ID_RESPONSE_HEADER; the SQL route stamps its SQL analog)
      respHeaders = body => {
        val id = try JsonMethods.parse(body) \ "context" \ "queryId" match {
          case JString(s) => s
          case _ => java.util.UUID.randomUUID().toString
        } catch { case _: Throwable => java.util.UUID.randomUUID().toString }
        nativeAssignedId.set(id)
        Seq("X-Druid-Query-Id" -> id)
      }))

    // lookup admin CRUD + introspection (LookupCoordinatorResource.java,
    // LookupIntrospectionResource.java) over the registry the lookup
    // datasource / LOOKUP() / extraction fns already read from
    server.createContext("/druid/coordinator/v1/lookups", restHandler(
      (method, sub, body) => LookupResource.config(spark, lookups, method, sub, body)))
    server.createContext("/druid/v1/lookups/introspect", restHandler(
      (method, sub, _) => LookupResource.introspect(lookups, method, sub)))

    // node status + client info (StatusResource.java, ClientInfoResource
    // .java); /druid/v2/datasources wins over the /druid/v2 query context
    // by longest-prefix routing
    server.createContext("/status", restHandler(
      (method, sub, _) => StatusResource.status(spark, method, sub)))
    server.createContext("/druid/v2/datasources", restHandler(
      (method, sub, _) => StatusResource.datasources(spark, method, sub)))
    // coordinator datasource/segment admin reads over the segment inventory
    server.createContext("/druid/coordinator/v1/datasources", restHandler(
      (method, sub, _) => DataSourcesResource.handle(spark, method, sub)))
    // overlord supervisor admin over the sys.supervisors registry
    server.createContext("/druid/indexer/v1/supervisor", restHandler(
      (method, sub, body) => SupervisorResource.handle(method, sub, body)))
    // rollup-catalog admin: register/list/drop rollup materializations so a
    // facade-only embedder gets the RollupRewrite redirect; streamed-rollup
    // handoffs into the global catalog surface in GET. A successful
    // register/drop invalidates BOTH caches — cached plans compiled against
    // the previous catalog would keep serving the old scan, and cached
    // RESULTS computed from it are just as stale (the reference's broker
    // drops cached per-segment results on datasource change the same way)
    server.createContext("/druid/coordinator/v1/rollups", restHandler(
      (method, sub, body) => {
        val r = RollupResource.handle(spark,
          graft.plans.RollupRewrite.globalCatalog, method, sub, body)
        if (method != "GET" && r._1 == 200) {
          planCache.invalidateAll(); resultCache.invalidateAll()
        }
        r
      }))
    // cluster reads: leader/isLeader/loadstatus/servers + overlord tasks
    // (the longer lookups/datasources/supervisor contexts win over these)
    val selfAddress = s"127.0.0.1:${server.getAddress.getPort}"
    server.createContext("/druid/coordinator/v1", restHandler(
      (method, sub, _) => ClusterResource.coordinator(spark, selfAddress, method, sub)))
    server.createContext("/druid/indexer/v1", restHandler(
      (method, sub, _) => ClusterResource.overlord(spark, method, sub)))

    // plan-cache admin: DELETE (or POST …/invalidate) drops every cached
    // plan. The cache's generation keys only observe IN-PROCESS writes
    // (BatchIngest / lookup registry); data rewritten out-of-band — an
    // external writer, a direct spark write to a served path — is invisible
    // to them, so operators hit this endpoint after such changes (the
    // reference's broker exposes the same per-cache admin surface).
    server.createContext("/druid/admin/planCache", restHandler(
      (method, sub, _) => method match {
        // out-of-band data change: BOTH caches hold artifacts of the old
        // data, so the documented invalidation endpoint clears both
        case "DELETE" =>
          planCache.invalidateAll(); resultCache.invalidateAll()
          (200, """{"invalidated":true}""")
        case "POST" if sub.stripPrefix("/") == "invalidate" =>
          planCache.invalidateAll(); resultCache.invalidateAll()
          (200, """{"invalidated":true}""")
        case "GET" =>
          (200, s"""{"hits":${planCache.hits},"misses":${planCache.misses}}""")
        case _ => (405, "")
      }))
    // result-cache admin sibling (stats + targeted invalidation)
    server.createContext("/druid/admin/resultCache", restHandler(
      (method, sub, _) => method match {
        case "DELETE" => resultCache.invalidateAll(); (200, """{"invalidated":true}""")
        case "GET" =>
          (200, s"""{"hits":${resultCache.hits},"misses":${resultCache.misses}}""")
        case _ => (405, "")
      }))

    server.start()
    new Facade(server, requestLog, planCache, resultCache)
  }

  /** Method-and-path routing handler for the REST-ish admin resources:
    * passes (method, sub-path, body) through and writes (status, body) back
    * (an empty body sends just the status, like Response.status().build()). */
  private def restHandler(f: (String, String, String) => (Int, String)): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (status, payload) =
          try {
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val sub = ex.getRequestURI.getPath.stripPrefix(ex.getHttpContext.getPath) +
              Option(ex.getRequestURI.getQuery).map("?" + _).getOrElse("")
            f(ex.getRequestMethod, sub, body)
          } catch { case e: Throwable => queryError(e) }
        if (payload.isEmpty) {
          ex.sendResponseHeaders(status, -1)
        } else {
          val bytes = payload.getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(status, bytes.length)
          ex.getResponseBody.write(bytes)
        }
        ex.close()
      }
    }

  private def handler(f: String => String): HttpHandler =
    statusHandler(body => (200, f(body)))

  /** Like handler, but `f` chooses the HTTP status itself (the Avatica
    * endpoint answers 500 with its own ErrorResponse envelope on failure,
    * matching Calcite's AvaticaJsonHandler). `onDelete` serves
    * `DELETE <context>/{id}` — the cancellation routes — returning just a
    * status with an empty body, like the reference's Response.status(...)
    * .build(). */
  private def statusHandler(f: String => (Int, String),
      onDelete: Option[String => Int] = None,
      respHeaders: String => Seq[(String, String)] = _ => Nil): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      if (ex.getRequestMethod == "DELETE" && onDelete.isDefined) {
        val id = ex.getRequestURI.getPath
          .stripPrefix(ex.getHttpContext.getPath).stripPrefix("/")
        val status = try onDelete.get(id) catch { case _: Throwable => 500 }
        ex.sendResponseHeaders(status, -1)
        ex.close()
        return
      }
      val (status, payload) =
        try {
          if (ex.getRequestMethod != "POST")
            (405, """{"error":"POST only"}""")
          else {
            currentRemoteAddr.set(Option(ex.getRemoteAddress)
              .map(_.getAddress.getHostAddress).getOrElse(""))
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            try respHeaders(body).foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
            catch { case _: Throwable => }
            f(body)
          }
        } catch { case e: Throwable => queryError(e) }
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
  }

  /** The SQL endpoint's wrapper: stamps X-Druid-SQL-Query-Id on EVERY
    * response (SqlResource.java:75,173 — context.sqlQueryId when the client
    * set one, a fresh id otherwise, including on errors: SqlResourceTest
    * .testErrorResponseReturnSameQueryIdWhenSetInContext), serves the
    * format's content type (ResultFormat.java:38-96 — array/object JSON,
    * the Lines formats text/plain, csv text/csv), and renders failures as
    * the reference's QueryException envelope. */
  private def sqlHandler(cancels: CancelRegistry, capacity: CapacityGuard,
      requestLog: RequestLog, defaultContext: JObject = JObject())(
      f: String => String): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      // DELETE /druid/v2/sql/{id}: 202 when the id names a registered
      // in-flight query, 404 otherwise (SqlResource.java:264-290;
      // SqlResourceTest.testCancelInvalidQuery expects NOT_FOUND)
      if (ex.getRequestMethod == "DELETE") {
        val id = ex.getRequestURI.getPath
          .stripPrefix(ex.getHttpContext.getPath).stripPrefix("/")
        val status = if (cancels.cancel(id)) 202 else 404
        ex.sendResponseHeaders(status, -1)
        ex.close()
        return
      }
      val body =
        if (ex.getRequestMethod == "POST")
          withDefaultContext(
            new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8),
            defaultContext)
        else ""
      val parsed = JsonMethods.parseOpt(body)
      val sqlQueryId = parsed.flatMap(o => (o \ "context" \ "sqlQueryId") match {
        case JString(id) => Some(id); case _ => None
      }).getOrElse(java.util.UUID.randomUUID().toString)
      val format = parsed.flatMap(o => (o \ "resultFormat") match {
        case JString(fmt) => Some(canonicalFormat(fmt)); case _ => None
      }).getOrElse("object")
      // context.timeout in millis (QueryContexts.TIMEOUT_KEY)
      val timeoutMs = parsed.map(o => (o \ "context" \ "timeout") match {
        case JInt(n) => n.toLong; case JLong(n) => n; case _ => 0L
      }).getOrElse(0L)
      // lane assignment: context.lane, or the low lane on negative priority
      // (HiLoQueryLaningStrategy.java:76-85)
      val lane = parsed.flatMap(o => (o \ "context" \ "lane") match {
        case JString(l) => Some(l); case _ => None
      })
      val priority = parsed.flatMap(o => (o \ "context" \ "priority") match {
        case JInt(n) => Some(n.toInt); case JLong(n) => Some(n.toInt); case _ => None
      })
      val startNs = System.nanoTime()
      def elapsedMs() = (System.nanoTime() - startNs) / 1000000L
      val remoteAddr = Option(ex.getRemoteAddress)
        .map(_.getAddress.getHostAddress).getOrElse("")
      val sqlText = parsed.flatMap(o => (o \ "query") match {
        case JString(s) => Some(s); case _ => None
      }).getOrElse("")
      val sqlContext = parsed.map(o => o \ "context").getOrElse(JNothing)
      val (status, payload, contentType) =
        try {
          if (ex.getRequestMethod != "POST")
            (405, """{"error":"POST only"}""", "application/json")
          // registered for the request's full lifecycle — parse, plan,
          // execute — like SqlLifecycleManager.add at doPost entry, so a
          // cancel landing between plan and execute still voids the request
          else {
            val out = capacity.run(lane, priority)(cancels.run(sqlQueryId, timeoutMs)(f(body)))
            requestLog.logSql(remoteAddr, sqlText, sqlContext, elapsedMs(),
              out.getBytes(StandardCharsets.UTF_8).length.toLong, None)
            (200, out, format match {
              case "objectLines" | "arrayLines" => "text/plain"
              case "csv" => "text/csv"
              case _ => "application/json"
            })
          }
        } catch { case e: Throwable =>
          requestLog.logSql(remoteAddr, sqlText, sqlContext, elapsedMs(), 0L, Some(e))
          val (s, p) = queryError(e); (s, p, "application/json")
        }
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", contentType)
      ex.getResponseHeaders.set("X-Druid-SQL-Query-Id", sqlQueryId)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
  }

  /** Exceeding `maxResultRows` is the reference's "Resource limit exceeded"
    * QueryException (ResourceLimitExceededException, HTTP 400). */
  private[server] final class ResourceLimitExceededException(msg: String)
    extends RuntimeException(msg)

  /** Map a failure to the reference's QueryException JSON — {error,
    * errorMessage, errorClass, host} (QueryException.java) — with
    * SqlPlanningException's error codes (SqlPlanningException.java:36-38:
    * parse failures are "SQL parse failed" with the Calcite parser class,
    * planning/validation failures "Plan validation failed") at HTTP 400
    * (BadQueryException), and "Unknown exception" at 500 for the rest. */
  private[server] def queryError(e: Throwable): (Int, String) = {
    val (status, code, errorClass) = e match {
      case _: QueryCancelledException =>
        // QueryInterruptedException.QUERY_CANCELLED at 500
        // (SqlResourceTest.testCancelBetweenPlanAndExecute asserts
        // INTERNAL_SERVER_ERROR + this error code)
        (500, "Query cancelled", "java.util.concurrent.CancellationException")
      case _: QueryTimedOutException =>
        // QueryTimeoutException.STATUS_CODE = 504, not the generic 500
        (504, "Query timeout", "org.apache.druid.query.QueryTimeoutException")
      case _: QueryCapacityException =>
        // QueryCapacityExceededException.STATUS_CODE = 429
        (429, "Query capacity exceeded",
          "org.apache.druid.query.QueryCapacityExceededException")
      case _: org.apache.spark.sql.catalyst.parser.ParseException =>
        (400, "SQL parse failed", "org.apache.calcite.sql.parser.SqlParseException")
      // malformed native-query JSON → BadJsonQueryException envelope
      // (BadJsonQueryException.java:28-29, BadQueryException.STATUS_CODE=400;
      // QueryResourceTest.testBadQuery)
      case _: com.fasterxml.jackson.core.JsonProcessingException =>
        (400, "Json parse failed", "com.fasterxml.jackson.core.JsonParseException")
      // unknown/unsupported query type → QueryUnsupportedException at 501
      // (QueryUnsupportedException.java:39-40). Matched on the dedicated
      // type, not UnsupportedOperationException broadly — an incidental UOE
      // from Spark/library code is an internal error, not a 501
      case _: graft.operators.QueryUnsupportedException =>
        (501, "Unsupported query", "org.apache.druid.query.QueryUnsupportedException")
      case _: ResourceLimitExceededException =>
        (400, "Resource limit exceeded",
          "org.apache.druid.query.ResourceLimitExceededException")
      // subquery inlining past maxSubqueryRows — same envelope as the
      // broker's ResourceLimitExceededException
      // (ClientQuerySegmentWalker.java:166-336)
      case _: graft.operators.SubqueryRowLimitExceededException =>
        (400, "Resource limit exceeded",
          "org.apache.druid.query.ResourceLimitExceededException")
      case _: org.apache.spark.sql.AnalysisException =>
        (400, "Plan validation failed", "org.apache.calcite.tools.ValidationException")
      case _: IllegalArgumentException =>
        (400, "Plan validation failed", "org.apache.calcite.tools.ValidationException")
      case other => (500, "Unknown exception", other.getClass.getName)
    }
    (status, JsonMethods.compact(JsonMethods.render(JObject(
      "error" -> JString(code),
      "errorMessage" -> JString(String.valueOf(e.getMessage)),
      "errorClass" -> JString(errorClass),
      "host" -> JNull))))
  }

  /** Materialize at most `maxRows` result rows as parsed JSON objects;
    * one row past the cap fails the request instead of OOMing the driver. */
  private def materialize(df: DataFrame, maxRows: Int): Seq[JObject] = {
    val objects = df.toJSON.limit(maxRows + 1).collect()
    if (objects.length > maxRows)
      throw new ResourceLimitExceededException(s"result exceeds maxResultRows=$maxRows")
    objects.toSeq.map(o => JsonMethods.parse(o).asInstanceOf[JObject])
  }

  /** Druid renders bucket timestamps as ISO-8601 with milliseconds in UTC
    * (e.g. "2012-01-01T00:00:00.000Z"); normalize Spark's rendering. */
  private val IsoMillis =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(ZoneOffset.UTC)
  private[server] def isoMillis(v: JValue): JValue = v match {
    case JString(s) =>
      val inst =
        try Some(Instant.parse(s))
        catch { case _: Exception =>
          try Some(OffsetDateTime.parse(s).toInstant)
          catch { case _: Exception =>
            try Some(LocalDateTime.parse(s).toInstant(ZoneOffset.UTC))
            catch { case _: Exception =>
              try Some(java.time.LocalDate.parse(s).atStartOfDay(ZoneOffset.UTC).toInstant)
              catch { case _: Exception => None }
            }
          }
        }
      inst.fold(v: JValue)(i => JString(IsoMillis.format(i)))
    case other => other
  }

  /** isoMillis in a query-specified zone: the offset renders instead of Z
    * (the reference uses ISODateTimeFormat with the sqlTimeZone; DATE cells
    * are that zone's midnight). */
  private val IsoMillisOffset = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
  private[server] def isoMillisZoned(v: JValue, zone: java.time.ZoneId): JValue =
    if (zone == ZoneOffset.UTC) isoMillis(v)
    else v match {
      case JString(s) =>
        val inst =
          try Some(Instant.parse(s))
          catch { case _: Exception =>
            try Some(OffsetDateTime.parse(s).toInstant)
            catch { case _: Exception =>
              try Some(LocalDateTime.parse(s).atZone(zone).toInstant)
              catch { case _: Exception =>
                try Some(java.time.LocalDate.parse(s).atStartOfDay(zone).toInstant)
                catch { case _: Exception => None }
              }
            }
          }
        inst.fold(v: JValue)(i => JString(IsoMillisOffset.withZone(zone).format(i)))
      case other => other
    }

  /** serializeDateTimeAsLong (docs/querying/query-context.md:55 — "DateTime
    * is serialized as long in the result returned by Broker"): render a
    * timestamp cell as epoch millis instead of ISO-8601. Parsing mirrors
    * [[isoMillis]]; unparseable cells pass through unchanged. */
  private[server] def epochMillis(v: JValue): JValue = v match {
    case JString(s) =>
      isoMillis(JString(s)) match {
        case JString(iso) if iso.endsWith("Z") =>
          try JLong(Instant.parse(iso).toEpochMilli)
          catch { case _: Exception => v }
        case _ => v
      }
    case other => other
  }

  /** Wrap native rows in the reference's per-query-type result envelope. */
  private[server] def envelope(q: JValue, df: DataFrame, maxRows: Int): String = {
    val timeCol = (q \ "timeColumn") match { case JString(t) => t; case _ => "__time" }
    // serializeDateTimeAsLong: timestamps render as epoch-millis longs
    // (query-context.md:55; the ...Inner variant governs broker<->data
    // transport in the reference — no such hop here, accepted as a no-op)
    val dtAsLong = (q \ "context" \ "serializeDateTimeAsLong") match {
      case JBool(b) => b; case JString("true") => true; case _ => false
    }
    def renderTs(v: JValue): JValue = if (dtAsLong) epochMillis(v) else isoMillis(v)
    // granularity-all buckets stamp with the first interval start, the
    // reference's bucket time for a single all-granularity bucket
    val intervalStart: JValue = ((q \ "intervals") match {
      case JArray(JString(iv) :: _) => JString(iv.split('/')(0))
      case o: JObject => (o \ "intervals") match {
        case JArray(JString(iv) :: _) => JString(iv.split('/')(0))
        case _ => JNull
      }
      case _ => JNull
    }) match { case s: JString => renderTs(s); case other => other }
    def rowTs(fields: List[JField]): JValue =
      fields.collectFirst { case (`timeCol`, v) => renderTs(v) }.getOrElse(JNull)
    def event(fields: List[JField]): JObject = JObject(fields.filterNot(_._1 == timeCol))

    val rows = materialize(df, maxRows)
    val queryType = (q \ "queryType") match { case JString(t) => t; case _ => "" }
    val out: JValue = queryType match {
      case "timeseries" =>
        // TimeseriesQueryQueryToolChest: {timestamp, result}; the grandTotal
        // row "will have no timestamp" (docs/querying/timeseriesquery.md)
        JArray(rows.toList.map { o =>
          JObject("timestamp" -> rowTs(o.obj), "result" -> event(o.obj))
        })
      case "topN" =>
        // TopNQueryQueryToolChest: one bucket per granularity period; this
        // engine computes exact all-granularity topN → a single bucket
        JArray(List(JObject(
          "timestamp" -> (rows.headOption.map(o => rowTs(o.obj)).getOrElse(JNull) match {
            case JNull => intervalStart; case ts => ts
          }),
          "result" -> JArray(rows.toList.map(o => event(o.obj))))))
      case "groupBy" | "movingAverage" =>
        // GroupByQueryQueryToolChest: {version: "v1", timestamp, event} —
        // movingAverage rows are groupBy-shaped Rows in the reference too
        // (MovingAverageQueryToolChest decorates the groupBy runner)
        JArray(rows.toList.map { o =>
          val ts = rowTs(o.obj) match { case JNull => intervalStart; case t => t }
          JObject("version" -> JString("v1"), "timestamp" -> ts, "event" -> event(o.obj))
        })
      case "search" =>
        // docs/querying/searchquery.md: one bucket of {dimension, value,
        // count} hits (all-granularity here, like topN)
        JArray(List(JObject(
          "timestamp" -> intervalStart,
          "result" -> JArray(rows.toList))))
      case "timeBoundary" =>
        // timeboundaryquery.md: [{timestamp: minTime, result: {min/max}}] —
        // boundary values render Druid-style ISO millis like the timestamp
        JArray(rows.toList.map { o =>
          val result = JObject(o.obj.map { case (k, v) => k -> renderTs(v) })
          val fields = result.obj.toMap
          val ts = fields.get("minTime").orElse(fields.get("maxTime")).getOrElse(JNull)
          JObject("timestamp" -> ts, "result" -> result)
        })
      case "dataSourceMetadata" =>
        // datasourcemetadataquery.md: timestamp = maxIngestedEventTime
        JArray(rows.toList.map { o =>
          val result = JObject(o.obj.map { case (k, v) => k -> renderTs(v) })
          val ts = result.obj.toMap.get("maxIngestedEventTime").getOrElse(JNull)
          JObject("timestamp" -> ts, "result" -> result)
        })
      case "scan" =>
        // scan-query.md: [{segmentId, columns, events}] — segments are not a
        // query-time concept on this engine, so one batch with a null
        // segmentId (the reference itself reports null under time ordering);
        // events render as objects ("list", the default) or positional
        // arrays ("compactedList")
        val columns = df.columns.toList
        val events: List[JValue] = (q \ "resultFormat") match {
          case JString("compactedList") =>
            rows.toList.map { o =>
              val m = o.obj.toMap
              JArray(columns.map(c => m.getOrElse(c, JNull)))
            }
          case _ => rows.toList
        }
        JArray(List(JObject(
          "segmentId" -> JNull,
          "columns" -> JArray(columns.map(JString(_))),
          "events" -> JArray(events))))
      case "segmentMetadata" =>
        // SegmentMetadataQueryQueryToolChest merged response: a list of
        // SegmentAnalysis objects {id, intervals, columns: {name:
        // ColumnAnalysis}, size, numRows, aggregators, timestampSpec,
        // queryGranularity, rollup} (SegmentAnalysis.java:43-51,
        // ColumnAnalysis.java:42-50); this engine computes one merged
        // analysis over the datasource, so id is the toolchest's "merged"
        // (SegmentMetadataQueryQueryToolChest.java:350)
        def jnum(v: JValue): Long = v match {
          case JInt(i) => i.toLong
          case JLong(l) => l
          case JDouble(d) => d.toLong
          case _ => 0L
        }
        def druidType(sparkType: String): (String, Boolean) = {
          val isMv = sparkType.startsWith("array<")
          val base = if (isMv) sparkType.stripPrefix("array<").stripSuffix(">") else sparkType
          val t = base match {
            case "string" => "STRING"
            case "bigint" | "int" | "smallint" | "tinyint" | "long" |
                 "timestamp" | "timestamp_ntz" | "date" | "boolean" => "LONG"
            case "double" => "DOUBLE"
            case "float" => "FLOAT"
            case d if d.startsWith("decimal") => "DOUBLE"
            case _ => "COMPLEX"
          }
          (t, isMv)
        }
        val maps = rows.toList.map(_.obj.toMap)
        val colEntries: List[JField] = maps.map { m =>
          val name = m.get("column").collect { case JString(s) => s }.getOrElse("")
          val (tpe, mv) = druidType(
            m.get("type").collect { case JString(s) => s }.getOrElse(""))
          name -> (JObject(
            "type" -> JString(tpe),
            "hasMultipleValues" -> JBool(mv),
            "hasNulls" -> JBool(m.get("nullCount").exists(jnum(_) > 0L)),
            "size" -> JInt(BigInt(m.get("size_bytes").map(jnum).getOrElse(0L))),
            "cardinality" -> m.getOrElse("cardinality", JNull),
            "minValue" -> m.getOrElse("minValue", JNull),
            "maxValue" -> m.getOrElse("maxValue", JNull),
            "errorMessage" -> JNull): JValue)
        }
        val first = maps.headOption.getOrElse(Map.empty)
        JArray(List(JObject(
          "id" -> JString("merged"),
          "intervals" -> JNull,
          "columns" -> JObject(colEntries),
          "size" -> JInt(BigInt(maps.map(m => m.get("size_bytes").map(jnum).getOrElse(0L)).sum)),
          "numRows" -> JInt(BigInt(first.get("numRows").map(jnum).getOrElse(0L))),
          "aggregators" -> first.getOrElse("aggregators", JNull),
          "timestampSpec" -> first.getOrElse("timestampSpec", JNull),
          "queryGranularity" -> first.getOrElse("queryGranularity", JNull),
          "rollup" -> first.getOrElse("rollup", JNull))))
      case _ => JArray(rows.toList) // flat rows (documented simplification)
    }
    JsonMethods.compact(JsonMethods.render(out))
  }

  /** ResultFormat names parse case-insensitively (ResultFormat.java enum
    * deserialization, ResultFormatTest.testDeserializeWithDifferentCase);
    * unknown names pass through to renderObjects' error. */
  private[server] def canonicalFormat(f: String): String = f.toLowerCase match {
    case "object" => "object"
    case "array" => "array"
    case "objectlines" => "objectLines"
    case "arraylines" => "arrayLines"
    case "csv" => "csv"
    case _ => f
  }

  /** A result column's name plus its two header typings: the Druid type
    * string (RowSignature asTypeString — None renders a null type, the
    * reference's untypable-column case) and the SQL type name
    * (RelDataType.getSqlTypeName). */
  private[server] final case class ColMeta(name: String, druidType: Option[String],
      sqlType: String)

  /** Spark type → (Druid type string, SQL type name), the two header rows
    * of ResultFormat writers. Timestamps are LONG/TIMESTAMP like the
    * reference's __time (SqlResourceTest EXPECTED_TYPES/EXPECTED_SQL_TYPES);
    * structs have no Druid type and SQL type ROW (SqlResourceTest
    * .testArrayResultFormatWithHeader_nullColumnType). */
  private[server] def colMeta(field: org.apache.spark.sql.types.StructField): ColMeta = {
    import org.apache.spark.sql.types._
    def druid(dt: DataType): Option[String] = dt match {
      case StringType => Some("STRING")
      case LongType | IntegerType | ShortType | ByteType | BooleanType |
           TimestampType | TimestampNTZType | DateType => Some("LONG")
      case FloatType => Some("FLOAT")
      case DoubleType => Some("DOUBLE")
      case _: DecimalType => Some("DOUBLE")
      case ArrayType(e, _) => druid(e).map(t => s"ARRAY<$t>")
      case BinaryType => Some("COMPLEX")
      case _ => None
    }
    val sqlType = field.dataType match {
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case DateType => "DATE"
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case BooleanType => "BOOLEAN"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case _: DecimalType => "DECIMAL"
      case StringType => "VARCHAR"
      case _: ArrayType => "ARRAY"
      case _: StructType => "ROW"
      case _ => "OTHER"
    }
    ColMeta(field.name, druid(field.dataType), sqlType)
  }

  private def render(df: DataFrame, format: String, header: Boolean,
      typesHeader: Boolean, sqlTypesHeader: Boolean, maxRows: Int,
      zone: java.time.ZoneId = ZoneOffset.UTC): String = {
    import org.apache.spark.sql.types.{DateType, TimestampType}
    val metas = df.schema.fields.toSeq.map(colMeta)
    // timestamp AND date cells render Druid-style ISO millis
    // ("2000-01-01T00:00:00.000Z" — SqlResourceTest.testTimestampsInResponse
    // expects CAST(__time AS DATE) as full midnight ISO too), not Spark's
    // variable-precision JSON rendering; a sqlTimeZone context renders the
    // zone's offset instead of Z ("1999-12-31T16:00:00.000-08:00")
    val tsCols = df.schema.fields.collect {
      case f if f.dataType == TimestampType || f.dataType == DateType => f.name
    }.toSet
    // toJSON drops null cells; the reference's object rows carry every
    // column explicitly (ObjectWriter.writeRowField is called per column),
    // so rebuild each row over the full schema, nulls included
    val rows = materialize(df, maxRows).map { o =>
      JObject(metas.toList.map { m =>
        m.name -> (o \ m.name match {
          case JNothing => JNull
          case v if tsCols(m.name) => isoMillisZoned(v, zone)
          case v => v
        })
      })
    }
    renderObjects(rows, metas, format, header, typesHeader, sqlTypesHeader)
  }

  /** Render result rows in one of ResultFormat.java's five formats, with
    * the writers' exact header and termination shapes. */
  private[server] def renderObjects(parsed: Seq[JObject], metas: Seq[ColMeta],
      format: String, header: Boolean, typesHeader: Boolean,
      sqlTypesHeader: Boolean): String = {
    val cols = metas.map(_.name)
    // ObjectWriter.writeHeader: {"col": null, ...} bare, or {"col":
    // {"type": ..., "sqlType": ...}, ...} when type headers are requested
    def headerObj: JObject =
      if (!typesHeader && !sqlTypesHeader)
        JObject(cols.toList.map(c => c -> (JNull: JValue)))
      else JObject(metas.toList.map { m =>
        val fields =
          (if (typesHeader)
            List("type" -> m.druidType.fold(JNull: JValue)(JString(_))) else Nil) ++
          (if (sqlTypesHeader) List("sqlType" -> (JString(m.sqlType): JValue)) else Nil)
        m.name -> (JObject(fields): JValue)
      })
    // ArrayWriter.writeHeader: a names row, then a Druid-types row iff
    // typesHeader, then a SQL-types row iff sqlTypesHeader
    def arrayHeaderRows: Seq[JValue] =
      Seq(JArray(cols.toList.map(JString(_): JValue))) ++
      (if (typesHeader)
        Seq(JArray(metas.toList.map(_.druidType.fold(JNull: JValue)(JString(_))))) else Nil) ++
      (if (sqlTypesHeader)
        Seq(JArray(metas.toList.map(m => JString(m.sqlType): JValue))) else Nil)
    def rowArray(o: JObject): JValue =
      JArray(cols.toList.map(c => o \ c match {
        case JNothing => JNull // toJSON omits null cells
        case v => v
      }))
    def jsonLine(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))
    format match {
      case "object" =>
        val headerRow = if (header) Seq(headerObj: JValue) else Nil
        // writeResponseEnd terminates the array with LF (ObjectWriter.java:63)
        jsonLine(JArray((headerRow ++ parsed).toList)) + "\n"
      case "array" =>
        val withHeader =
          (if (header) arrayHeaderRows else Nil) ++ parsed.map(rowArray)
        jsonLine(JArray(withHeader.toList)) + "\n"
      case "objectLines" | "arrayLines" =>
        // one JSON value per LF-terminated line; writeResponseEnd adds the
        // blank trailer line (ObjectLinesWriter/ArrayLinesWriter)
        val lines =
          if (format == "objectLines")
            (if (header) Seq(headerObj: JValue) else Nil) ++ parsed
          else (if (header) arrayHeaderRows else Nil) ++ parsed.map(rowArray)
        lines.map(l => jsonLine(l) + "\n").mkString + "\n"
      case "csv" =>
        val headerLines: Seq[String] =
          if (!header) Nil
          else Seq(cols.map(csvField).mkString(",")) ++
            (if (typesHeader)
              Seq(metas.map(_.druidType.fold("")(csvField)).mkString(",")) else Nil) ++
            (if (sqlTypesHeader)
              Seq(metas.map(m => csvField(m.sqlType)).mkString(",")) else Nil)
        val dataLines = parsed.map(o => csvRow(o, cols))
        // like the Lines formats, a blank trailer line ends the response
        (headerLines ++ dataLines).map(_ + "\n").mkString + "\n"
      case other => throw new IllegalArgumentException(s"resultFormat: $other")
    }
  }

  /** RFC-4180-ish quoting (the reference's opencsv CSVWriter defaults):
    * quote a field only when it contains a quote, comma, or newline; double
    * embedded quotes. */
  private def csvField(s: String): String =
    if (s.exists(c => c == '"' || c == ',' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def csvRow(o: JObject, cols: Seq[String]): String = {
    val vals = cols.map(c => o \ c match {
      case JNothing | JNull => "" // "CSV cannot differentiate null and empty string"
      case JString(s) => s
      case v => JsonMethods.compact(JsonMethods.render(v))
    })
    // CsvWriter.writeRowEnd: a single-empty-field row is written quoted so
    // users can't confuse it with the blank trailer line
    if (vals.length == 1 && vals.head.isEmpty) "\"\""
    else vals.map(csvField).mkString(",")
  }

  /** `EXPLAIN PLAN FOR <sql>`: one row with PLAN + RESOURCES VARCHAR columns
    * (DruidPlanner.getExplainStructType, DruidPlanner.java:669). PLAN is the
    * Catalyst plan (this engine's native form, where the reference embeds
    * its native JSON); RESOURCES lists the referenced datasources as the
    * reference's resource-action JSON string. */
  private[server] def explainRows(spark: SparkSession, sql: String): Seq[JObject] = {
    // resource collection (typing, sys/metadata exclusion, INSERT write
    // targets, EXTERN) lives in PlannerResources — the same set the
    // reference's authorizer sees
    val resourceSet = PlannerResources.analyze(spark, sql)
    // `EXPLAIN PLAN FOR INSERT ...` explains the inner SELECT's plan (the
    // reference renders the underlying scan query: CalciteInsertDmlTest
    // .testExplainInsertFromExternal)
    val plan = graft.sources.SqlInsertDml.parse(sql) match {
      case Some(ins) =>
        val selectSql = graft.sources.SqlInsertDml.rewriteExtern(spark, ins.selectSql)
        spark.sql(selectSql).queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode).trim
      case None =>
        spark.sql(sql).queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode).trim
    }
    val resources = JsonMethods.compact(JsonMethods.render(JArray(
      resourceSet.toList.sortBy(r => (r.name, r.resourceType))
        .map(r => JObject("name" -> JString(r.name), "type" -> JString(r.resourceType))))))
    Seq(JObject("PLAN" -> JString(plan), "RESOURCES" -> JString(resources)))
  }

  /** Bind positional `?` placeholders to typed parameter literals — the
    * reference's prepared-statement path (SqlQuery.java getParameterList →
    * Calcite TypedValue binding). Literal rendering by declared SQL type;
    * `?` inside string literals, `--` line comments, and (*) block comments
    * is left alone. */
  private[server] def bindParameters(sql: String,
      params: Seq[(String, JValue)]): String = {
    if (params.isEmpty) return sql
    val out = new StringBuilder
    var inString = false
    var inComment = false
    var inBlock = false
    var next = 0
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inBlock) {
        out.append(c)
        if (c == '*' && i + 1 < sql.length && sql.charAt(i + 1) == '/') {
          out.append('/'); i += 1; inBlock = false
        }
      } else if (inComment) {
        out.append(c); if (c == '\n') inComment = false
      } else if (inString) {
        out.append(c); if (c == '\'') inString = false
      } else c match {
        case '\'' => inString = true; out.append(c)
        case '-' if i + 1 < sql.length && sql.charAt(i + 1) == '-' =>
          inComment = true; out.append(c)
        case '/' if i + 1 < sql.length && sql.charAt(i + 1) == '*' =>
          inBlock = true; out.append("/*"); i += 1
        case '?' =>
          // the reference's unbound-parameter surface (SqlPlanningException,
          // 0-indexed position: CalciteParameterQueryTest
          // .testPartiallyMissingParameter expects position[1])
          if (next >= params.length || params(next) == null)
            throw new IllegalArgumentException(s"Parameter at position[$next] is not bound")
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
        case "TIMESTAMP" =>
          // Druid accepts epoch-millis TIMESTAMP parameters
          // (CalciteParameterQueryTest.java:374 binds DateTimes millis)
          val s = v match {
            case JInt(_) | JLong(_) =>
              LocalDateTime.ofInstant(Instant.ofEpochMilli(str.toLong), ZoneOffset.UTC)
                .format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
            case _ => str
          }
          "TIMESTAMP '" + s.replace("'", "''") + "'"
        case "DATE" => "DATE '" + str.replace("'", "''") + "'"
        case other => throw new IllegalArgumentException(s"parameter type: $other")
      }
    }
  }
}
