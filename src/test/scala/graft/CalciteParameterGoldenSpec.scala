package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.server.{HttpFacade, SystemSchema}
import graft.sources.Sources

/** Round-6 golden tranche: CalciteParameterQueryTest.java (744 LoC — typed
  * positional `?` parameters through the SQL endpoint, the reference's
  * prepared-statement path SqlQuery.java getParameterList).
  *
  * Every case POSTs {"query", "parameters": [{"type","value"},...]} at the
  * façade's /druid/v2/sql, exactly as a reference client would. Expected
  * rows are the reference's sql-compatible-mode values. Adaptations:
  * Druid's planned not-selector matches nulls (`<>` spelled null-safely),
  * long/long division spelled DIV, and the INFORMATION_SCHEMA case asserts
  * against this engine's own schema (JDBC_TYPE codes are type-system
  * specific) while keeping the reference's aggregate shape. */
class CalciteParameterGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val foo: DataFrame = {
    val rows = Seq(
      // __time, dim1, dim2, m1, m2, l1, f1, cnt
      (ts("2000-01-01 00:00:00"), "",     "a",   1.0f, 1.0, Some(7L),      Some(1.0f), 1L),
      (ts("2000-01-02 00:00:00"), "10.1", null,  2.0f, 2.0, Some(325323L), Some(0.1f), 1L),
      (ts("2000-01-03 00:00:00"), "2",    "",    3.0f, 3.0, Some(0L),      Some(0.0f), 1L),
      (ts("2001-01-01 00:00:00"), "1",    "a",   4.0f, 4.0, None: Option[Long], None: Option[Float], 1L),
      (ts("2001-01-02 00:00:00"), "def",  "abc", 5.0f, 5.0, None: Option[Long], None: Option[Float], 1L),
      (ts("2001-01-03 00:00:00"), "abc",  null,  6.0f, 6.0, None: Option[Long], None: Option[Float], 1L))
    rows.toDF("__time", "dim1", "dim2", "m1", "m2", "l1", "f1", "cnt")
  }

  private lazy val facade: HttpFacade.Facade = {
    foo.createOrReplaceTempView("foo")
    foo.createOrReplaceTempView("numfoo")
    SystemSchema.register(spark)
    HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
  }

  /** POST a parameterized query; returns (status, rows in array format). */
  private def post(query: String, params: String): (Int, List[List[JValue]]) = {
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      "query" -> JString(query), "resultFormat" -> JString("array"))))
    val withParams = body.dropRight(1) + s""","parameters":$params}"""
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${facade.port}/druid/v2/sql"))
      .POST(HttpRequest.BodyPublishers.ofString(withParams))
      .header("Content-Type", "application/json")
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    val rows = JsonMethods.parse(resp.body()) match {
      case JArray(rs) => rs.map { case JArray(cells) => cells; case other => List(other) }
      case other => List(List(other))
    }
    (resp.statusCode(), rows)
  }

  private def rows(query: String, params: String): List[List[JValue]] = {
    val (status, out) = post(query, params)
    assert(status == 200, s"unexpected status $status: $out")
    out
  }
  private def num(v: JValue): Double = v match {
    case JInt(n) => n.toDouble; case JLong(n) => n.toDouble
    case JDouble(d) => d; case JDecimal(d) => d.toDouble
    case other => fail(s"not numeric: $other")
  }

  test("testSelectConstantParamGetsConstant (CalciteParameterQueryTest.java:58)") {
    assert(num(rows("SELECT 1 + ?", """[{"type":"INTEGER","value":1}]""").head.head) == 2)
  }

  test("testParamsGetOptimizedIntoConstant (:84)") {
    val r = rows("SELECT 1 + ?, dim1 FROM foo LIMIT ?",
      """[{"type":"INTEGER","value":1},{"type":"INTEGER","value":1}]""").head
    assert(num(r(0)) == 2 && r(1) == JString(""))
  }

  test("testParametersInSelectAndFilter (:110)") {
    val r = rows("SELECT exp(count(*)) + ?, sum(m2) FROM foo WHERE dim2 = ?",
      """[{"type":"INTEGER","value":10},{"type":"INTEGER","value":0}]""").head
    assert(num(r(0)) == 11.0 && r(1) == JNull)
  }

  test("testSelectTrimFamilyWithParameters — 17 parameters through TRIM parsing (:142)") {
    // columns aliased: RTRIM(?, ?) and TRIM(TRAILING ? FROM ?) otherwise
    // auto-name identically and the object-keyed array rendering collides
    val q =
      """SELECT TRIM(BOTH ? FROM ?) c0, TRIM(TRAILING ? FROM ?) c1, TRIM(? FROM ?) c2,
        |TRIM(TRAILING FROM ?) c3, TRIM(?) c4, BTRIM(?) c5, BTRIM(?, ?) c6,
        |LTRIM(?) c7, LTRIM(?, ?) c8, RTRIM(?) c9, RTRIM(?, ?) c10, COUNT(*) c11 FROM foo""".stripMargin
    val params =
      """[{"type":"VARCHAR","value":"x"},{"type":"VARCHAR","value":"xfoox"},
        |{"type":"VARCHAR","value":"x"},{"type":"VARCHAR","value":"xfoox"},
        |{"type":"VARCHAR","value":" "},{"type":"VARCHAR","value":" foo "},
        |{"type":"VARCHAR","value":" foo "},{"type":"VARCHAR","value":" foo "},
        |{"type":"VARCHAR","value":" foo "},{"type":"VARCHAR","value":"xfoox"},
        |{"type":"VARCHAR","value":"x"},{"type":"VARCHAR","value":" foo "},
        |{"type":"VARCHAR","value":"xfoox"},{"type":"VARCHAR","value":"x"},
        |{"type":"VARCHAR","value":" foo "},{"type":"VARCHAR","value":"xfoox"},
        |{"type":"VARCHAR","value":"x"}]""".stripMargin.replace("\n", "")
    val r = rows(q, params).head
    assert(r.take(11).map { case JString(s) => s; case o => fail(s"$o") } == List(
      "foo", "xfoo", "foo", " foo", "foo", "foo", "foo", "foo ", "foox", " foo", "xfoo"))
    assert(num(r(11)) == 6)
  }

  test("testParamsInInformationSchema (:209)") {
    // reference aggregates JDBC_TYPE over foo's columns; codes here are this
    // engine's java.sql.Types mapping, asserted self-consistently: 8 columns
    // = timestamp(93) + varchar(12)*2 + float(6)*2 + double(8) + bigint(-5)*2
    val r = rows(
      """SELECT COUNT(JDBC_TYPE), SUM(JDBC_TYPE), MIN(JDBC_TYPE), MAX(JDBC_TYPE)
        |FROM INFORMATION_SCHEMA.COLUMNS WHERE TABLE_SCHEMA = ? AND TABLE_NAME = ?""".stripMargin,
      """[{"type":"VARCHAR","value":"druid"},{"type":"VARCHAR","value":"foo"}]""").head
    assert(num(r(0)) == 8)
    assert(num(r(1)) == 93 + 12 * 2 + 6 * 2 + 8 - 5 * 2)
    assert(num(r(2)) == -5 && num(r(3)) == 93)
  }

  test("testParamsInSelectExpressionAndLimit (:233)") {
    val out = rows("SELECT SUBSTRING(dim2, ?, ?) FROM foo LIMIT ?",
      """[{"type":"INTEGER","value":1},{"type":"INTEGER","value":1},{"type":"INTEGER","value":2}]""")
    assert(out == List(List(JString("a")), List(JNull)))
  }

  test("testParamsTuckedInACast (:263)") {
    val out = rows(
      "SELECT dim1, m1, COUNT(*) FROM foo WHERE m1 - CAST(? as INT) = dim1 GROUP BY dim1, m1",
      """[{"type":"INTEGER","value":1}]""")
    assert(out.map(r => (r(0), num(r(1)), num(r(2)))) == List((JString("2"), 3.0, 1)))
  }

  test("testParametersInStrangePlaces — filtered-agg ratio in HAVING (:296)") {
    val out = rows(
      """SELECT dim1, COUNT(*) FILTER(WHERE NOT dim2 <=> ?) DIV COUNT(*) as ratio
        |FROM foo GROUP BY dim1
        |HAVING COUNT(*) FILTER(WHERE NOT dim2 <=> ?) DIV COUNT(*) = ? ORDER BY 1""".stripMargin,
      """[{"type":"VARCHAR","value":"a"},{"type":"VARCHAR","value":"a"},{"type":"INTEGER","value":1}]""")
    assert(out.map(r => (r(0), num(r(1)))) == List(
      (JString("10.1"), 1), (JString("2"), 1), (JString("abc"), 1), (JString("def"), 1)))
  }

  test("testParametersInCases (:340)") {
    val r = rows(
      """SELECT CASE 'foo'
        |WHEN ? THEN SUM(cnt) / CAST(? as INT)
        |WHEN ? THEN SUM(m1) / CAST(? as INT)
        |WHEN ? THEN SUM(m2) / CAST(? as INT) END FROM foo""".stripMargin,
      """[{"type":"VARCHAR","value":"bar"},{"type":"INTEGER","value":10},
        |{"type":"VARCHAR","value":"foo"},{"type":"INTEGER","value":10},
        |{"type":"VARCHAR","value":"baz"},{"type":"INTEGER","value":10}]""".stripMargin.replace("\n", ""))
    assert(num(r.head.head) == 2.1)
  }

  test("testTimestamp (millis value) / testTimestampString / testDate (:374, :411, :447)") {
    val q = "SELECT exp(count(*)) + ?, sum(m2) FROM foo WHERE __time >= ?"
    for (p2 <- Seq(
        """{"type":"TIMESTAMP","value":32472144000000}""",
        """{"type":"TIMESTAMP","value":"2999-01-01 00:00:00"}""",
        """{"type":"DATE","value":"2999-01-01"}""")) {
      val r = rows(q, s"""[{"type":"INTEGER","value":10},$p2]""").head
      assert(num(r(0)) == 11.0 && r(1) == JNull, s"with param $p2")
    }
  }

  test("testDoubles / testFloats / testLongs (:484, :533, :555)") {
    assert(num(rows("SELECT COUNT(*) FROM foo WHERE cnt > ? and cnt < ?",
      """[{"type":"DOUBLE","value":1.1},{"type":"FLOAT","value":100000001.0}]""").head.head) == 0)
    assert(num(rows("SELECT COUNT(*) FROM foo WHERE cnt = ? or cnt = ?",
      """[{"type":"DOUBLE","value":1.0},{"type":"FLOAT","value":100000001.0}]""").head.head) == 6)
    assert(num(rows("SELECT COUNT(*) FROM foo WHERE cnt = ?",
      """[{"type":"REAL","value":1.0}]""").head.head) == 6)
    assert(num(rows("SELECT COUNT(*) FROM numfoo WHERE l1 > ?",
      """[{"type":"BIGINT","value":3}]""").head.head) == 2)
  }

  test("testMissingParameter / partially missing / in the middle reject (:577, :592, :607)") {
    assert(post("SELECT COUNT(*) FROM numfoo WHERE l1 > ?", "[]")._1 != 200)
    // testPartiallyMissingParameter (CalciteParameterQueryTest.java): the
    // reference's SqlPlanningException names the 0-indexed unbound position
    val (s1, b1) = post("SELECT COUNT(*) FROM numfoo WHERE l1 > ? AND f1 = ?",
      """[{"type":"BIGINT","value":3}]""")
    assert(s1 != 200)
    assert(b1.toString.contains("Parameter at position[1] is not bound"))
    // testPartiallyMissingParameterInTheMiddle: a null entry leaves ITS
    // position unbound even though a later position is bound
    val (s2, b2) = post("SELECT 1 + ?, dim1 FROM foo LIMIT ?",
      """[null,{"type":"INTEGER","value":1}]""")
    assert(s2 != 200)
    assert(b2.toString.contains("Parameter at position[0] is not bound"))
  }

  test("testWrongTypeParameter — mismatched type binds to no rows (:623)") {
    assert(num(rows("SELECT COUNT(*) FROM numfoo WHERE l1 > ? AND f1 = ?",
      """[{"type":"BIGINT","value":3},{"type":"VARCHAR","value":"wat"}]""").head.head) == 0)
  }

  test("testNullParameter (:668)") {
    val out = rows(
      "SELECT COALESCE(dim2, ?, ?), COUNT(*) FROM foo GROUP BY 1 ORDER BY 1",
      """[{"type":"VARCHAR","value":"parameter"},{"type":"VARCHAR","value":null}]""")
    assert(out.map(r => (r(0), num(r(1)))) == List(
      (JString(""), 1), (JString("a"), 2), (JString("abc"), 1), (JString("parameter"), 2)))
  }
}
