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

  test("POST /druid/v2/sql binds typed positional parameters (SqlQuery.java parameters)") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      Sources.table(spark, sf(), "nation").createOrReplaceTempView("nation")
      // CalciteParameterQueryTest.java:84 shape: params in SELECT and LIMIT
      val (s1, out) = post(facade.port, "/druid/v2/sql",
        """{"query": "SELECT 1 + ?, n_name FROM nation ORDER BY n_nationkey LIMIT ?",
            "resultFormat": "array",
            "parameters": [{"type":"INTEGER","value":1}, {"type":"INTEGER","value":1}]}""")
      assert(s1 == 200)
      assert(out.asInstanceOf[JArray].arr == List(JArray(List(JInt(2), JString("NATION_0")))))

      // VARCHAR param in a filter; '?' inside a string literal is untouched
      val (s2, out2) = post(facade.port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS cnt FROM nation WHERE n_name = ? AND n_name <> 'who?'",
            "parameters": [{"type":"VARCHAR","value":"NATION_3"}]}""")
      assert(s2 == 200)
      assert((out2.asInstanceOf[JArray].arr.head \ "cnt") == JInt(1))
    } finally facade.stop()
  }

  test("POST /druid/v2/sql header=true prepends the column-name row") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      Sources.table(spark, sf(), "region").createOrReplaceTempView("region")
      val (s, out) = post(facade.port, "/druid/v2/sql",
        """{"query": "SELECT r_regionkey FROM region ORDER BY 1 LIMIT 2",
            "resultFormat": "array", "header": true}""")
      assert(s == 200)
      val rows = out.asInstanceOf[JArray].arr
      assert(rows.head == JArray(List(JString("r_regionkey"))))
      assert(rows.tail == List(JArray(List(JInt(0))), JArray(List(JInt(1)))))
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
