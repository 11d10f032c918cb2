package graft.server

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The overlord's supervisor admin surface
  * (indexing-service/.../supervisor/SupervisorResource.java,
  * `@Path("/druid/indexer/v1/supervisor")`), over the same supervisor
  * registry sys.supervisors serves:
  *
  *   POST /                       → register/update a supervisor spec →
  *                                  {"id": id} (specPost:95)
  *   GET  /                       → supervisor ids; `?state=true` or
  *                                  `?full` → status objects (specGetAll:123)
  *   GET  /{id}                   → the registered spec (specGet:193)
  *   GET  /{id}/status            → {"id", "generationTime", "payload"}
  *                                  (specGetStatus:213 SupervisorReport)
  *   GET  /{id}/health            → {"healthy": true} (specGetHealth:233)
  *   POST /{id}/suspend | /resume → toggle, returns the updated spec
  *                                  (specSuspendOrResume:312-326)
  *   POST /{id}/terminate         → remove → {"id": id}; the deprecated
  *                                  /shutdown aliases it (:331-345)
  *   POST /suspendAll|/resumeAll|/terminateAll → {"status": "success"}
  *
  * Unknown ids answer the reference's 404 `{"error": "[id] does not
  * exist"}`. Supervisor STATE here is registry truth: the Structured
  * Streaming queries themselves run under Spark's lifecycle
  * (StreamingIngest registers them on start); suspend marks intent the
  * same way the reference persists a suspended spec.
  */
object SupervisorResource {
  import SystemSchema.SupervisorEntry

  def handle(method: String, rawSubPath: String, body: String): (Int, String) = {
    val (subPath, query) = rawSubPath.indexOf('?') match {
      case -1 => (rawSubPath, "")
      case i => (rawSubPath.substring(0, i), rawSubPath.substring(i + 1))
    }
    val parts = subPath.split("/").filter(_.nonEmpty).toList
    (method, parts) match {
      case ("POST", Nil) =>
        val spec = JsonMethods.parseOpt(body) match {
          case Some(o: JObject) => o
          case _ => return (400, error("malformed supervisor spec"))
        }
        // the reference derives the id from the spec's dataSource
        // (SeekableStreamSupervisorSpec.getId); accept an explicit id too
        val id = Seq(spec \ "id",
            spec \ "spec" \ "dataSchema" \ "dataSource",
            spec \ "dataSchema" \ "dataSource")
          .collectFirst { case JString(s) => s }
          .getOrElse(return (400, error("No dataSources found to perform authorization checks")))
        val tpe = (spec \ "type") match { case JString(t) => t; case _ => "kafka" }
        val source = Seq(spec \ "spec" \ "ioConfig" \ "topic",
            spec \ "ioConfig" \ "topic", spec \ "source")
          .collectFirst { case JString(s) => s }.getOrElse(id)
        val suspended = (spec \ "suspended") match { case JBool(b) => b; case _ => false }
        SystemSchema.registerSupervisor(SupervisorEntry(id, tpe, source,
          JsonMethods.compact(JsonMethods.render(spec)), suspended))
        ok(JObject("id" -> JString(id)))
      case ("GET", Nil) =>
        val wantStatus = query.contains("state") || query.contains("full") ||
          query.contains("system")
        if (!wantStatus)
          ok(JArray(SystemSchema.supervisors.map(e => JString(e.id): JValue).toList))
        else ok(JArray(SystemSchema.supervisors.toList.map { e =>
          val state = if (e.suspended) "SUSPENDED" else "RUNNING"
          val baseFields: List[JField] = List(
            "id" -> JString(e.id), "state" -> JString(state),
            "detailedState" -> JString(state),
            "healthy" -> JBool(!e.suspended),
            "suspended" -> JBool(e.suspended))
          val fullFields: List[JField] =
            if (query.contains("full") || query.contains("system"))
              List("type" -> JString(e.supervisorType),
                "source" -> JString(e.source),
                "spec" -> JsonMethods.parse(e.spec))
            else Nil
          JObject(baseFields ++ fullFields): JValue
        }))
      case ("GET", List(id)) => withSupervisor(id)(e => ok(JsonMethods.parse(e.spec)))
      case ("GET", List(id, "status")) => withSupervisor(id) { e =>
        val state = if (e.suspended) "SUSPENDED" else "RUNNING"
        ok(JObject(
          "id" -> JString(e.id),
          "generationTime" -> JString(java.time.Instant.now.toString),
          "payload" -> JObject(
            "dataSource" -> JString(e.id), "stream" -> JString(e.source),
            "state" -> JString(state), "detailedState" -> JString(state),
            "healthy" -> JBool(!e.suspended), "suspended" -> JBool(e.suspended))))
      }
      case ("GET", List(id, "health")) =>
        withSupervisor(id)(_ => ok(JObject("healthy" -> JBool(true))))
      case ("POST", List(id, "suspend")) => toggle(id, suspended = true)
      case ("POST", List(id, "resume")) => toggle(id, suspended = false)
      case ("POST", List(id, "terminate" | "shutdown")) =>
        if (SystemSchema.removeSupervisor(id)) ok(JObject("id" -> JString(id)))
        else notFound(id)
      case ("POST", List("suspendAll")) =>
        SystemSchema.supervisors.foreach(e =>
          SystemSchema.setSupervisorSuspended(e.id, suspended = true))
        ok(JObject("status" -> JString("success")))
      case ("POST", List("resumeAll")) =>
        SystemSchema.supervisors.foreach(e =>
          SystemSchema.setSupervisorSuspended(e.id, suspended = false))
        ok(JObject("status" -> JString("success")))
      case ("POST", List("terminateAll")) =>
        SystemSchema.supervisors.foreach(e => SystemSchema.removeSupervisor(e.id))
        ok(JObject("status" -> JString("success")))
      case _ => (405, error(s"unsupported: $method $subPath"))
    }
  }

  private def toggle(id: String, suspended: Boolean): (Int, String) =
    SystemSchema.setSupervisorSuspended(id, suspended) match {
      case Some(e) => ok(JsonMethods.parse(e.spec) match {
        case o: JObject => JObject(o.obj.filterNot(_._1 == "suspended") :+
          ("suspended" -> (JBool(suspended): JValue)))
        case other => other
      })
      case None => notFound(id)
    }

  private def withSupervisor(id: String)(
      f: SupervisorEntry => (Int, String)): (Int, String) =
    SystemSchema.supervisor(id).map(f).getOrElse(notFound(id))

  private def notFound(id: String): (Int, String) =
    (404, error(s"[$id] does not exist"))
  private def error(msg: String): String =
    JsonMethods.compact(JsonMethods.render(JObject("error" -> JString(msg))))
  private def ok(v: JValue): (Int, String) =
    (200, JsonMethods.compact(JsonMethods.render(v)))
}
