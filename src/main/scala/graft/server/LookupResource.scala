package graft.server

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.sources.LookupRegistry

/** The lookup admin + introspection HTTP surface, served over the process
  * LookupRegistry:
  *
  * Coordinator config CRUD (server/.../http/LookupCoordinatorResource.java —
  * `@Path("/druid/coordinator/v1/lookups")`, config endpoints at :97-360):
  *
  *   GET    /config                  → tier names
  *   GET    /config/all              → {tier: {lookup: container}}
  *   GET    /config/{tier}           → lookup names in the tier (404 unknown)
  *   GET    /config/{tier}/{lookup}  → the container spec (404 unknown)
  *   POST   /config/{tier}/{lookup}  → create/update from a container (202)
  *   DELETE /config/{tier}/{lookup}  → drop (202, 404 when absent)
  *
  * The container is the reference's LookupExtractorFactoryMapContainer:
  * `{"version": v, "lookupExtractorFactory": {"type": "map", "map": {...}}}`
  * (the pre-0.10 `{"type": "map", ...}` spelling is accepted too). This
  * engine has no tier routing — every server sees every lookup — so the
  * single tier is `__default` (the reference's default tier name,
  * LookupConfig.DEFAULT_TIER).
  *
  * Introspection (server/.../lookup/LookupIntrospectionResource.java
  * `@Path("/druid/v1/lookups/introspect")` routing to the map factory's
  * handler, MapLookupExtractorFactory.java:132-151):
  *
  *   GET /{lookupId}         → the full key→value map
  *   GET /{lookupId}/keys    → the key list
  *   GET /{lookupId}/values  → the value list
  *
  * Reads are bounded by the registry's `asMap` cap — introspecting a
  * lookup bigger than the driver-side limit fails loudly rather than
  * OOMing, the same guard the scalar-lookup path uses.
  */
object LookupResource {

  val DefaultTier = "__default"

  /** Handle a coordinator `/druid/coordinator/v1/lookups` request.
    * `subPath` is the path after the resource root. Returns (status, body). */
  def config(spark: SparkSession, lookups: LookupRegistry, method: String,
      rawSubPath: String, body: String): (Int, String) = {
    val subPath = rawSubPath.takeWhile(_ != '?')
    val parts = subPath.split("/").filter(_.nonEmpty).toList
    (method, parts) match {
      case ("GET", List("config")) =>
        ok(JArray(List(JString(DefaultTier))))
      case ("GET", List("config", "all")) =>
        ok(JObject(DefaultTier -> JObject(
          lookups.names.toList.map(n => n -> container(lookups, n)))))
      case ("GET", List("config", DefaultTier)) =>
        ok(JArray(lookups.names.toList.map(JString(_))))
      case ("GET", List("config", tier)) => notFound(s"tier [$tier] not found")
      case ("GET", List("config", DefaultTier, name)) =>
        if (lookups.contains(name)) ok(container(lookups, name))
        else notFound(s"lookup [$name] not found")
      case ("POST", List("config", DefaultTier, name)) =>
        val spec = JsonMethods.parseOpt(body).getOrElse(
          return (400, error("malformed lookup container")))
        val factory = (spec \ "lookupExtractorFactory") match {
          case JNothing => spec // pre-0.10 bare-factory spelling
          case f => f
        }
        (factory \ "type") match {
          case JString("map") => ()
          case JString(other) =>
            return (400, error(s"unsupported lookupExtractorFactory type [$other]"))
          case _ => return (400, error("missing lookupExtractorFactory type"))
        }
        val entries = (factory \ "map") match {
          case JObject(fields) => fields.map {
            case (k, JString(v)) => k -> v
            case (k, JNull) => k -> null
            case (k, v) => k -> JsonMethods.compact(JsonMethods.render(v))
          }
          case _ => return (400, error("missing map"))
        }
        val version = (spec \ "version") match {
          case JString(v) => v; case _ => null
        }
        import spark.implicits._
        lookups.register(name, entries.toDF("k", "v"), version)
        (202, "")
      case ("DELETE", List("config", DefaultTier, name)) =>
        if (lookups.remove(name)) (202, "") else notFound(s"lookup [$name] not found")
      case ("POST" | "DELETE", List("config", tier, _)) =>
        notFound(s"tier [$tier] not found")
      case _ => (405, error(s"unsupported: $method $subPath"))
    }
  }

  /** Handle a `/druid/v1/lookups/introspect` request. */
  def introspect(lookups: LookupRegistry, method: String,
      rawSubPath: String): (Int, String) = {
    if (method != "GET") return (405, error("GET only"))
    val parts = rawSubPath.takeWhile(_ != '?').split("/").filter(_.nonEmpty).toList
    parts match {
      case name :: rest if lookups.contains(name) =>
        val m = lookups.asMap(name)
        rest match {
          case Nil =>
            ok(JObject(m.toList.sortBy(_._1).map { case (k, v) =>
              k -> (if (v == null) JNull else JString(v): JValue)
            }))
          case List("keys") => ok(JArray(m.keys.toList.sorted.map(JString(_))))
          case List("values") =>
            ok(JArray(m.toList.sortBy(_._1).map(_._2)
              .map(v => if (v == null) JNull else JString(v): JValue)))
          case _ => notFound(s"unsupported introspection: ${rest.mkString("/")}")
        }
      case name :: _ => notFound(s"lookup [$name] not found")
      case Nil => notFound("lookup id required")
    }
  }

  private def container(lookups: LookupRegistry, name: String): JValue = {
    val m = lookups.asMap(name)
    JObject(
      "version" -> lookups.version(name).fold(JNull: JValue)(JString(_)),
      "lookupExtractorFactory" -> JObject(
        "type" -> JString("map"),
        "map" -> JObject(m.toList.sortBy(_._1).map { case (k, v) =>
          k -> (if (v == null) JNull else JString(v): JValue)
        })))
  }

  private def ok(v: JValue): (Int, String) =
    (200, JsonMethods.compact(JsonMethods.render(v)))
  private def error(msg: String): String =
    JsonMethods.compact(JsonMethods.render(JObject("error" -> JString(msg))))
  private def notFound(msg: String): (Int, String) = (404, error(msg))
}
