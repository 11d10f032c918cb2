package graft.server

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The node status + client-info surface every reference deployment serves:
  *
  * StatusResource (server/.../StatusResource.java, `@Path("/status")`):
  *
  *   GET /status            → {"version", "modules": [], "memory":
  *                            {maxMemory,totalMemory,freeMemory,usedMemory,
  *                             directMemory}} (Status/Memory:100-160)
  *   GET /status/health     → `true` (literal JSON boolean, :90-94 — load
  *                            balancers poll this)
  *   GET /status/properties → the node's runtime properties (:65-74; here
  *                            the Spark session conf, the engine's analog)
  *
  * ClientInfoResource (server/.../ClientInfoResource.java,
  * `@Path("/druid/v2/datasources")`):
  *
  *   GET /druid/v2/datasources                  → queryable datasource names
  *   GET /druid/v2/datasources/{ds}             → {"dimensions", "metrics"}
  *   GET /druid/v2/datasources/{ds}/dimensions  → dimension names
  *   GET /druid/v2/datasources/{ds}/metrics     → metric names
  *
  * The dimension/metric split mirrors the rollup model used by
  * sys.segments: non-numeric non-time columns are dimensions, numeric
  * non-time columns are metrics (the reference reads the same split off
  * its segment descriptors).
  */
object StatusResource {

  def Version = "graft-" + org.apache.spark.SPARK_VERSION

  def status(spark: SparkSession, method: String, rawSubPath: String): (Int, String) = {
    if (method != "GET") return (405, """{"error":"GET only"}""")
    rawSubPath.takeWhile(_ != '?').split("/").filter(_.nonEmpty).toList match {
      case Nil =>
        val rt = Runtime.getRuntime
        val direct =
          try java.nio.ByteBuffer.allocateDirect(0).capacity().toLong max -1L
          catch { case _: Throwable => -1L }
        ok(JObject(
          "version" -> JString(Version),
          "modules" -> JArray(Nil),
          "memory" -> JObject(
            "maxMemory" -> JLong(rt.maxMemory),
            "totalMemory" -> JLong(rt.totalMemory),
            "freeMemory" -> JLong(rt.freeMemory),
            "usedMemory" -> JLong(rt.totalMemory - rt.freeMemory),
            "directMemory" -> JLong(direct))))
      case List("health") => (200, "true")
      case List("properties") =>
        ok(JObject(spark.conf.getAll.toList.sortBy(_._1)
          .map { case (k, v) => k -> (JString(v): JValue) }))
      case other => (404, s"""{"error":"/status/${other.mkString("/")}"}""")
    }
  }

  def datasources(spark: SparkSession, method: String, rawSubPath: String): (Int, String) = {
    if (method != "GET") return (405, """{"error":"GET only"}""")
    val subPath = rawSubPath.takeWhile(_ != '?')
    def names: Seq[String] = spark.catalog.listTables().collect().map(_.name).sorted.toSeq
    def split(ds: String): Option[(Seq[String], Seq[String])] =
      if (!names.contains(ds)) None
      else {
        val fields = spark.table(ds).schema.fields.filterNot(_.name == "__time")
        val (metrics, dims) = fields.partition(
          _.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
        Some((dims.map(_.name).toSeq, metrics.map(_.name).toSeq))
      }
    subPath.split("/").filter(_.nonEmpty).toList match {
      case Nil => ok(JArray(names.toList.map(JString(_))))
      case ds :: rest => split(ds) match {
        case None => (204, "") // reference: unauthorized/unknown filters to empty
        case Some((dims, metrics)) => rest match {
          case Nil => ok(JObject(
            "dimensions" -> JArray(dims.toList.map(JString(_))),
            "metrics" -> JArray(metrics.toList.map(JString(_)))))
          case List("dimensions") => ok(JArray(dims.toList.map(JString(_))))
          case List("metrics") => ok(JArray(metrics.toList.map(JString(_))))
          case other => (404, s"""{"error":"${other.mkString("/")}"}""")
        }
      }
    }
  }

  private def ok(v: JValue): (Int, String) =
    (200, JsonMethods.compact(JsonMethods.render(v)))
}

/** The remaining coordinator/overlord cluster reads:
  *
  * CoordinatorResource (server/.../http/CoordinatorResource.java):
  *   GET /druid/coordinator/v1/leader     → the leader address (the driver)
  *   GET /druid/coordinator/v1/isLeader   → {"leader": true} (the driver IS
  *                                          the leader; the reference 404s
  *                                          only on non-leaders)
  *   GET /druid/coordinator/v1/loadstatus → {datasource: percent loaded} —
  *                                          shared storage keeps every
  *                                          registered segment servable, so
  *                                          each datasource reports 100.0
  *
  * ServersResource (server/.../http/ServersResource.java):
  *   GET /druid/coordinator/v1/servers[?simple] → host names / simple maps
  *   GET /servers/{name}[?simple]               → {host,tier,type,priority,
  *                                                 currSize,maxSize} (:53)
  *   GET /servers/{name}/segments               → served segment ids
  *
  * OverlordResource (indexing-service/.../http/OverlordResource.java):
  *   GET /druid/indexer/v1/tasks            → TaskStatusPlus-shaped rows for
  *                                            active streaming queries
  *   GET /druid/indexer/v1/task/{id}/status → {"task": id, "status": {...}}
  */
object ClusterResource {

  def coordinator(spark: SparkSession, serverAddress: String, method: String,
      rawSubPath: String): (Int, String) = {
    if (method != "GET") return (405, """{"error":"GET only"}""")
    val subPath = rawSubPath.takeWhile(_ != '?')
    val simple = rawSubPath.contains("?") && rawSubPath.contains("simple")
    def execs = spark.sparkContext.statusTracker.getExecutorInfos.toSeq
    def simpleServer(e: org.apache.spark.SparkExecutorInfo, i: Int): JObject = JObject(
      "host" -> JString(s"${e.host}:${e.port}"),
      "tier" -> JString("_default_tier"), "type" -> JString("historical"),
      "priority" -> JInt(0),
      "currSize" -> JLong(e.usedOnHeapStorageMemory + e.usedOffHeapStorageMemory),
      "maxSize" -> JLong(e.totalOnHeapStorageMemory + e.totalOffHeapStorageMemory))
    subPath.split("/").filter(_.nonEmpty).toList match {
      case List("leader") => ok(JString(s"http://$serverAddress"))
      case List("isLeader") => ok(JObject("leader" -> JBool(true)))
      case List("loadstatus") =>
        val datasources =
          if (!spark.catalog.tableExists("sys.segments")) Nil
          else spark.table("sys.segments").select("datasource").distinct()
            .collect().map(_.getString(0)).sorted.toList
        ok(JObject(datasources.map(d => d -> (JDouble(100.0): JValue))))
      case List("servers") =>
        if (simple) ok(JArray(execs.zipWithIndex.toList.map {
          case (e, i) => simpleServer(e, i): JValue
        }))
        else ok(JArray(execs.toList.map(e => JString(s"${e.host}:${e.port}"): JValue)))
      case List("servers", name) =>
        execs.zipWithIndex.find { case (e, _) => s"${e.host}:${e.port}" == name } match {
          case Some((e, i)) => ok(simpleServer(e, i))
          case None => (404, """{"error":"server not found"}""")
        }
      case List("servers", name, "segments") =>
        if (!execs.exists(e => s"${e.host}:${e.port}" == name))
          (404, """{"error":"server not found"}""")
        else {
          // shared storage: every data server serves every registered segment
          val ids =
            if (!spark.catalog.tableExists("sys.segments")) Nil
            else spark.table("sys.segments").select("segment_id")
              .collect().map(_.getString(0)).sorted.toList
          ok(JArray(ids.map(JString(_))))
        }
      case other => (404, s"""{"error":"${other.mkString("/")}"}""")
    }
  }

  def overlord(spark: SparkSession, method: String,
      rawSubPath: String): (Int, String) = {
    if (method != "GET") return (405, """{"error":"GET only"}""")
    def tasks = spark.streams.active.toSeq
    def taskRow(q: org.apache.spark.sql.streaming.StreamingQuery): JObject = {
      val created = q.recentProgress.headOption.map(_.timestamp).getOrElse("")
      JObject("id" -> JString(q.id.toString),
        "groupId" -> JString(q.runId.toString),
        "type" -> JString("index_spark_streaming"),
        "createdTime" -> JString(created),
        "statusCode" -> JString("RUNNING"),
        "status" -> JString("RUNNING"),
        "runnerStatusCode" -> JString("RUNNING"),
        "dataSource" -> JString(Option(q.name).getOrElse("")),
        "errorMsg" -> JNull)
    }
    rawSubPath.takeWhile(_ != '?').split("/").filter(_.nonEmpty).toList match {
      case List("tasks") => ok(JArray(tasks.toList.map(taskRow(_): JValue)))
      case List("task", id, "status") =>
        tasks.find(_.id.toString == id) match {
          case Some(q) => ok(JObject("task" -> JString(id),
            "status" -> taskRow(q)))
          case None => (404, s"""{"error":"[$id] does not exist"}""")
        }
      case List("task", id) =>
        tasks.find(_.id.toString == id) match {
          case Some(q) => ok(JObject("task" -> JString(id), "payload" -> taskRow(q)))
          case None => (404, s"""{"error":"[$id] does not exist"}""")
        }
      case other => (404, s"""{"error":"${other.mkString("/")}"}""")
    }
  }

  private def ok(v: JValue): (Int, String) =
    (200, JsonMethods.compact(JsonMethods.render(v)))
}

/** The coordinator's datasource/segment admin reads
  * (server/.../http/DataSourcesResource.java,
  * `@Path("/druid/coordinator/v1/datasources")`), served from the
  * sys.segments inventory (SystemSchema.registerSegments):
  *
  *   GET /                          → datasource names
  *   GET /{ds}                      → the "simple" summary: {"tiers":
  *                                    {tier: {segments stats}}, "segments":
  *                                    {count,size,replicatedSize,minTime,
  *                                    maxTime}} (getSimpleDatasource:740)
  *   GET /{ds}/segments             → served segment ids (:597)
  *   GET /{ds}/segments/{segmentId} → {"metadata": {...}, "servers": [...]}
  *                                    (:619; shared storage → every data
  *                                    server serves every segment)
  *
  * Unknown datasources answer 404 like
  * logAndCreateDataSourceNotFoundResponse. The inventory is coordination
  * metadata (one row per file), so the driver-side materialization here is
  * bounded the same way the reference coordinator's own heap copy is.
  */
object DataSourcesResource {

  def handle(spark: SparkSession, method: String, rawSubPath: String): (Int, String) = {
    if (method != "GET") return (405, """{"error":"GET only"}""")
    val subPath = rawSubPath.takeWhile(_ != '?')
    if (!spark.catalog.tableExists("sys.segments"))
      return handleEmpty(subPath)
    val segs = spark.table("sys.segments")
    import org.apache.spark.sql.functions._
    // the per-segment read is matched on the raw path: segment ids here are
    // file paths/URIs whose consecutive slashes a split would collapse
    val SegmentRe = "^([^/]+)/segments/(.+)$".r
    subPath.stripPrefix("/") match {
      case SegmentRe(ds, segmentId) =>
        val row = segs.filter(col("datasource") === ds)
          .filter(col("segment_id") === segmentId).collect().headOption
        return row match {
          case None => (204, "")
          case Some(r) =>
            val fields = segs.schema.fieldNames.toList
            val metadata = JObject(fields.zipWithIndex.map { case (f, i) =>
              f -> (r.get(i) match {
                case null => JNull
                case l: Long => JLong(l)
                case v => JString(v.toString)
              })
            })
            val servers =
              try spark.table("sys.servers").select("server").collect()
                .map(_.getString(0)).toList
              catch { case _: Throwable => Nil }
            ok(JObject("metadata" -> metadata,
              "servers" -> JArray(servers.map(JString(_)))))
        }
      case _ => ()
    }
    subPath.split("/").filter(_.nonEmpty).toList match {
      case Nil =>
        val names = segs.select("datasource").distinct()
          .collect().map(_.getString(0)).sorted
        ok(JArray(names.toList.map(JString(_))))
      case ds :: rest =>
        val mine = segs.filter(col("datasource") === ds)
        val summary = mine.agg(
          count(lit(1)).as("n"), sum(col("size")).as("sz"),
          sum(col("size") * col("num_replicas")).as("rsz"),
          min(col("start")).as("mn"), max(col("`end`")).as("mx")).head()
        if (summary.getLong(0) == 0L)
          return (404, s"""{"error":"datasource [$ds] not found"}""")
        rest match {
          case Nil =>
            val stats = JObject(
              "count" -> JLong(summary.getLong(0)),
              "size" -> JLong(summary.getLong(1)),
              "replicatedSize" -> JLong(summary.getLong(2)),
              "minTime" -> JString(String.valueOf(summary.get(3))),
              "maxTime" -> JString(String.valueOf(summary.get(4))))
            ok(JObject("tiers" -> JObject("_default_tier" -> stats), "segments" -> stats))
          case List("segments") =>
            val ids = mine.select("segment_id").collect().map(_.getString(0)).sorted
            ok(JArray(ids.toList.map(JString(_))))
          case other => (404, s"""{"error":"${other.mkString("/")}"}""")
        }
    }
  }

  private def handleEmpty(subPath: String): (Int, String) =
    subPath.split("/").filter(_.nonEmpty).toList match {
      case Nil => ok(JArray(Nil))
      case ds :: _ => (404, s"""{"error":"datasource [$ds] not found"}""")
    }

  private def ok(v: JValue): (Int, String) =
    (200, JsonMethods.compact(JsonMethods.render(v)))
}
