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

  def status(spark: SparkSession, method: String, subPath: String): (Int, String) = {
    if (method != "GET") return (405, """{"error":"GET only"}""")
    subPath.split("/").filter(_.nonEmpty).toList match {
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

  def datasources(spark: SparkSession, method: String, subPath: String): (Int, String) = {
    if (method != "GET") return (405, """{"error":"GET only"}""")
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
