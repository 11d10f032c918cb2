package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.server.HttpFacade
import graft.sources.Sources

/** Integration spec for the HTTP façade: POSTs the EXISTING gate JSON
  * (graft.queries.NativeQueries.TimeseriesGateJson) verbatim at /druid/v2,
  * and SQL at /druid/v2/sql, over the sf0.001 tables — the same request
  * bodies a reference user sends to QueryResource/SqlResource. */
class HttpFacadeSpec extends SparkSpecBase {

  private def post(port: Int, path: String, body: String): (Int, JValue) = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json")
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), JsonMethods.parse(resp.body()))
  }

  test("POST /druid/v2 runs the native timeseries gate JSON verbatim") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      val (status, json) = post(facade.port, "/druid/v2",
        graft.queries.NativeQueries.TimeseriesGateJson)
      assert(status == 200)
      val rows = json.asInstanceOf[JArray].arr
      assert(rows.nonEmpty)
      // every row carries the declared agg/post-agg names
      val first = rows.head.asInstanceOf[JObject].obj.toMap
      assert(Set("cnt", "sum_qty", "avg_qty").subsetOf(first.keySet))
      // counts are positive within the filtered interval
      assert(rows.forall(r => (r \ "cnt") match {
        case JInt(n) => n >= 0; case JLong(n) => n >= 0; case _ => false
      }))
    } finally facade.stop()
  }

  test("POST /druid/v2/sql runs SQL with object and array result formats") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      Sources.table(spark, sf(), "nation").createOrReplaceTempView("nation")
      val (s1, obj) = post(facade.port, "/druid/v2/sql",
        """{"query": "SELECT n_regionkey, count(*) AS cnt FROM nation GROUP BY 1 ORDER BY 1"}""")
      assert(s1 == 200)
      val objRows = obj.asInstanceOf[JArray].arr
      assert(objRows.size == 5)
      assert((objRows.head \ "cnt") == JInt(5))

      val (s2, arr) = post(facade.port, "/druid/v2/sql",
        """{"query": "SELECT n_regionkey, count(*) AS cnt FROM nation GROUP BY 1 ORDER BY 1",
            "resultFormat": "array"}""")
      assert(s2 == 200)
      val arrRows = arr.asInstanceOf[JArray].arr
      assert(arrRows.size == 5)
      assert(arrRows.head == JArray(List(JInt(0), JInt(5))))
    } finally facade.stop()
  }

  test("errors surface as JSON with status 500") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      val (status, json) = post(facade.port, "/druid/v2", """{"queryType": "nope"}""")
      assert(status == 500)
      assert((json \ "error").isInstanceOf[JString])
    } finally facade.stop()
  }
}
