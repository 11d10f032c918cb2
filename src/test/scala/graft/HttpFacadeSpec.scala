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

  test("POST /druid/v2 runs the native timeseries gate JSON verbatim, with the " +
      "{timestamp, result} envelope (docs/querying/timeseriesquery.md)") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      val (status, json) = post(facade.port, "/druid/v2",
        graft.queries.NativeQueries.TimeseriesGateJson)
      assert(status == 200)
      val rows = json.asInstanceOf[JArray].arr
      assert(rows.nonEmpty)
      // every bucket nests as {"timestamp": ISO millis, "result": {aggs}}
      rows.foreach { r =>
        assert((r \ "timestamp").isInstanceOf[JString])
        val result = (r \ "result").asInstanceOf[JObject].obj.toMap
        assert(Set("cnt", "sum_qty", "avg_qty").subsetOf(result.keySet))
        // the time column never leaks into the result object
        assert(!result.contains("l_shipdate"))
      }
      // timestamps render Druid-style: ISO-8601 with milliseconds, UTC
      val ts = (rows.head \ "timestamp").asInstanceOf[JString].s
      assert(ts.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z"""))
      assert(rows.forall(r => (r \ "result" \ "cnt") match {
        case JInt(n) => n >= 0; case JLong(n) => n >= 0; case _ => false
      }))
    } finally facade.stop()
  }

  test("POST /druid/v2 topN and groupBy envelopes (topnquery.md, groupbyquery.md)") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      // topN: ONE granularity bucket holding the ranked dimension rows
      val (s1, topn) = post(facade.port, "/druid/v2",
        """{
          "queryType": "topN",
          "dataSource": "nation",
          "timeColumn": "n_nationkey",
          "dimension": "n_regionkey",
          "metric": "cnt",
          "threshold": 3,
          "aggregations": [{"type": "count", "name": "cnt"}]
        }""")
      assert(s1 == 200)
      val buckets = topn.asInstanceOf[JArray].arr
      assert(buckets.size == 1)
      val result = (buckets.head \ "result").asInstanceOf[JArray].arr
      assert(result.size == 3)
      assert(result.forall(r => (r \ "cnt") == JInt(5)))
      assert(result.forall(r => (r \ "n_regionkey") != JNothing))

      // groupBy: one {"version": "v1", "timestamp", "event"} object per row
      val (s2, gby) = post(facade.port, "/druid/v2",
        """{
          "queryType": "groupBy",
          "dataSource": "region",
          "timeColumn": "r_regionkey",
          "dimensions": ["r_name"],
          "aggregations": [{"type": "count", "name": "cnt"}],
          "limitSpec": {"type": "default", "columns": ["r_name"], "limit": 2}
        }""")
      assert(s2 == 200)
      val rows = gby.asInstanceOf[JArray].arr
      assert(rows.size == 2)
      rows.foreach { r =>
        assert((r \ "version") == JString("v1"))
        assert((r \ "event" \ "cnt") == JInt(1))
        assert((r \ "event" \ "r_name").isInstanceOf[JString])
      }
    } finally facade.stop()
  }

  test("POST /druid/v2 scan, search, timeBoundary and dataSourceMetadata envelopes") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      // scan (scan-query.md): one {segmentId: null, columns, events} batch;
      // compactedList renders events as positional arrays
      val (s1, scan) = post(facade.port, "/druid/v2",
        """{
          "queryType": "scan",
          "dataSource": "region",
          "timeColumn": "r_regionkey",
          "columns": ["r_regionkey", "r_name"],
          "resultFormat": "compactedList",
          "limit": 2
        }""")
      assert(s1 == 200)
      val batch = scan.asInstanceOf[JArray].arr.head
      assert((batch \ "segmentId") == JNull)
      assert((batch \ "columns") == JArray(List(JString("r_regionkey"), JString("r_name"))))
      val events = (batch \ "events").asInstanceOf[JArray].arr
      assert(events.size == 2)
      assert(events.head == JArray(List(JInt(0), JString("AFRICA"))))

      // search (searchquery.md): one bucket of {dimension, value, count}
      val (s2, search) = post(facade.port, "/druid/v2",
        """{
          "queryType": "search",
          "dataSource": "region",
          "timeColumn": "r_regionkey",
          "searchDimensions": ["r_name"],
          "query": {"type": "insensitive_contains", "value": "americ"}
        }""")
      assert(s2 == 200)
      val hits = (search.asInstanceOf[JArray].arr.head \ "result").asInstanceOf[JArray].arr
      assert(hits.size == 1)
      assert((hits.head \ "dimension") == JString("r_name"))
      assert((hits.head \ "value") == JString("AMERICA"))
      assert((hits.head \ "count") == JInt(1))

      // timeBoundary (timeboundaryquery.md): timestamp = minTime
      val (s3, tb) = post(facade.port, "/druid/v2",
        """{"queryType": "timeBoundary", "dataSource": "orders", "timeColumn": "o_orderdate"}""")
      assert(s3 == 200)
      val tbRow = tb.asInstanceOf[JArray].arr.head
      assert((tbRow \ "timestamp") == (tbRow \ "result" \ "minTime"))
      assert((tbRow \ "result" \ "maxTime").isInstanceOf[JString])

      // dataSourceMetadata: timestamp = maxIngestedEventTime
      val (s4, dsm) = post(facade.port, "/druid/v2",
        """{"queryType": "dataSourceMetadata", "dataSource": "orders", "timeColumn": "o_orderdate"}""")
      assert(s4 == 200)
      val dsmRow = dsm.asInstanceOf[JArray].arr.head
      assert((dsmRow \ "timestamp") == (dsmRow \ "result" \ "maxIngestedEventTime"))
    } finally facade.stop()
  }

  test("POST /druid/v2 segmentMetadata nests a merged SegmentAnalysis (SegmentAnalysis.java:43)") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      val (s, out) = post(facade.port, "/druid/v2",
        """{
          "queryType": "segmentMetadata",
          "dataSource": "region",
          "timeColumn": "r_regionkey",
          "analysisTypes": ["minmax", "size"]
        }""")
      assert(s == 200)
      val analyses = out.asInstanceOf[JArray].arr
      assert(analyses.size == 1) // one merged analysis
      val a = analyses.head
      assert((a \ "id") == JString("merged")) // SegmentMetadataQueryQueryToolChest.java:350
      // columns is a MAP of name -> ColumnAnalysis (ColumnAnalysis.java:42)
      val cols = (a \ "columns").asInstanceOf[JObject].obj.toMap
      assert(cols.keySet == Set("r_regionkey", "r_name"))
      val nameCol = cols("r_name")
      assert((nameCol \ "type") == JString("STRING"))
      assert((nameCol \ "hasMultipleValues") == JBool(false))
      assert((nameCol \ "hasNulls") == JBool(false))
      assert((nameCol \ "cardinality") == JInt(5))
      assert((nameCol \ "minValue") == JString("AFRICA"))
      assert((nameCol \ "maxValue") == JString("MIDDLE EAST"))
      assert((nameCol \ "errorMessage") == JNull)
      assert((cols("r_regionkey") \ "type") == JString("LONG"))
      // table-level fields: numRows, total size, spec analyses null here
      assert((a \ "numRows") == JInt(5))
      val size = (a \ "size").asInstanceOf[JInt].num.toLong
      assert(size > 0L)
      assert((a \ "rollup") == JNull)
    } finally facade.stop()
  }

  test("EXPLAIN PLAN FOR returns the PLAN + RESOURCES row (DruidPlanner.java:669)") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      Sources.table(spark, sf(), "nation").createOrReplaceTempView("nation")
      val (s, out) = post(facade.port, "/druid/v2/sql",
        """{"query": "EXPLAIN PLAN FOR SELECT COUNT(*) FROM nation"}""")
      assert(s == 200)
      val row = out.asInstanceOf[JArray].arr.head
      val plan = (row \ "PLAN").asInstanceOf[JString].s
      assert(plan.contains("Physical Plan"))
      val resources = JsonMethods.parse((row \ "RESOURCES").asInstanceOf[JString].s)
      assert(resources == JArray(List(
        JObject("name" -> JString("nation"), "type" -> JString("DATASOURCE")))))
    } finally facade.stop()
  }

  test("EXPLAIN PLAN FOR INSERT from EXTERN (CalciteInsertDmlTest.java:564)") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      val extern =
        """TABLE(EXTERN('{\"type\":\"inline\",\"data\":\"a,b,1\"}',""" +
          """'{\"type\":\"csv\",\"columns\":[\"x\",\"y\",\"z\"]}',""" +
          """'[{\"name\":\"x\",\"type\":\"STRING\"},{\"name\":\"y\",\"type\":\"STRING\"},{\"name\":\"z\",\"type\":\"LONG\"}]'))"""
      val (s, out) = post(facade.port, "/druid/v2/sql",
        s"""{"query": "EXPLAIN PLAN FOR INSERT INTO dst_explain SELECT * FROM $extern PARTITIONED BY ALL TIME"}""")
      assert(s == 200)
      val row = out.asInstanceOf[JArray].arr.head
      // the plan is the inner SELECT's (the reference renders the scan query)
      assert((row \ "PLAN").asInstanceOf[JString].s.contains("Physical Plan"))
      // the reference's expected resources JSON: the fixed EXTERNAL resource
      // plus the write target (testExplainInsertFromExternal)
      val resources = JsonMethods.parse((row \ "RESOURCES").asInstanceOf[JString].s)
      assert(resources == JArray(List(
        JObject("name" -> JString("EXTERNAL"), "type" -> JString("EXTERNAL")),
        JObject("name" -> JString("dst_explain"), "type" -> JString("DATASOURCE")))))
      // EXPLAIN must not have executed the insert
      assert(!spark.catalog.tableExists("dst_explain"))
    } finally facade.stop()
  }

  test("maxResultRows guards the driver-side materialization") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name),
      maxResultRows = 3)
    try {
      Sources.table(spark, sf(), "nation").createOrReplaceTempView("nation")
      val (ok, small) = post(facade.port, "/druid/v2/sql",
        """{"query": "SELECT n_name FROM nation LIMIT 3"}""")
      assert(ok == 200 && small.asInstanceOf[JArray].arr.size == 3)
      val (status, err) = post(facade.port, "/druid/v2/sql",
        """{"query": "SELECT n_name FROM nation"}""")
      // the reference's ResourceLimitExceededException surface: QueryException
      // JSON at HTTP 400 (SqlResourceTest.testResourceLimitExceeded)
      assert(status == 400)
      assert((err \ "error") == JString("Resource limit exceeded"))
      assert((err \ "errorMessage").asInstanceOf[JString].s.contains("maxResultRows"))
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

  test("header=true prepends the null-valued column object for the object format " +
      "(ObjectWriter.writeHeader)") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      Sources.table(spark, sf(), "region").createOrReplaceTempView("region")
      val (s, out) = post(facade.port, "/druid/v2/sql",
        """{"query": "SELECT r_regionkey, r_name FROM region ORDER BY 1 LIMIT 1",
            "header": true}""")
      assert(s == 200)
      val rows = out.asInstanceOf[JArray].arr
      assert(rows.head == JObject("r_regionkey" -> JNull, "r_name" -> JNull))
      assert((rows(1) \ "r_regionkey") == JInt(0))
    } finally facade.stop()
  }

  test("'?' inside block comments does not consume a parameter") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      Sources.table(spark, sf(), "nation").createOrReplaceTempView("nation")
      val (s, out) = post(facade.port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS cnt /* not a param? */ FROM nation WHERE n_name = ?",
            "parameters": [{"type":"VARCHAR","value":"NATION_3"}]}""")
      assert(s == 200)
      assert((out.asInstanceOf[JArray].arr.head \ "cnt") == JInt(1))
    } finally facade.stop()
  }

  test("errors surface as QueryException JSON (QueryResource: bad native query → 400)") {
    val facade = HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
    try {
      val (status, json) = post(facade.port, "/druid/v2", """{"queryType": "nope"}""")
      assert(status == 400)
      assert((json \ "error").isInstanceOf[JString])
      assert((json \ "errorMessage").isInstanceOf[JString])
      assert((json \ "host") == JNull)
    } finally facade.stop()
  }
}
