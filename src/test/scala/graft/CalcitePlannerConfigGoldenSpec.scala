package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.server.{HttpFacade, SystemSchema}
import graft.sources.Sources

/** CalciteQueryTest planner-config golden tranche: the EXPLAIN battery,
  * the requireTimeCondition battery (PlannerConfig.isRequireTimeCondition →
  * `plans.PlannerChecks`), and query-context validation — all driven over
  * the HTTP façade exactly as a reference client would.
  *
  * The reference asserts its native-JSON plan strings; this engine's PLAN
  * column carries the Catalyst plan (documented in HttpFacade), so the
  * EXPLAIN cases assert the response SHAPE and the RESOURCES contract
  * (datasource vs view typing, system tables excluded) rather than the
  * plan text. */
class CalcitePlannerConfigGoldenSpec extends SparkSpecBase
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // the shared session outlives this suite — drop the persistent `view`
  // database so later suites' INFORMATION_SCHEMA snapshots don't see it
  override def afterAll(): Unit = {
    facade.stop()
    spark.sql("DROP DATABASE IF EXISTS `view` CASCADE")
    super.afterAll()
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val foo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   1.0f, 1.0d, 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], 2.0f, 2.0d, 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    3.0f, 3.0d, 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   4.0f, 4.0d, 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), 5.0f, 5.0d, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], 6.0f, 6.0d, 1L)
  ).toDF("__time", "dim1", "dim2", "m1", "m2", "cnt")

  private lazy val facade: HttpFacade.Facade = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
    SystemSchema.register(spark)
    // the reference's view.aview — a persistent (catalog) view, so EXPLAIN
    // resources can type it VIEW; persistent views cannot reference temp
    // views, so the body snapshots aview's rows (SUBSTRING(dim1, 1, 1)
    // where dim2 = 'a') the same way SystemSchema inlines its views
    spark.sql("CREATE DATABASE IF NOT EXISTS `view`")
    spark.sql("CREATE OR REPLACE VIEW `view`.aview AS " +
      "SELECT * FROM (VALUES (''), ('1')) AS t(dim1_firstchar)")
    HttpFacade.start(spark, name => Sources.table(spark, sf(), name))
  }

  /** POST {"query", "context"} in array format; returns (status, body). */
  private def post(query: String, context: String = null): (Int, String) = {
    val base = JObject("query" -> JString(query), "resultFormat" -> JString("array"))
    val body0 = JsonMethods.compact(JsonMethods.render(base))
    val body = if (context == null) body0 else body0.dropRight(1) + s""","context":$context}"""
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${facade.port}/druid/v2/sql"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json")
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def rows(body: String): List[List[JValue]] = JsonMethods.parse(body) match {
    case JArray(rs) => rs.map { case JArray(cells) => cells; case other => List(other) }
    case other => List(List(other))
  }

  /** EXPLAIN responses are one [PLAN, RESOURCES] row; parse RESOURCES. */
  private def explain(query: String): (String, List[(String, String)]) = {
    val (status, body) = post(query)
    assert(status == 200, body)
    val r = rows(body)
    assert(r.length == 1 && r.head.length == 2, body)
    val plan = r.head.head match { case JString(s) => s; case x => x.toString }
    val resources = JsonMethods.parse(r.head(1) match { case JString(s) => s; case x => JsonMethods.compact(JsonMethods.render(x)) }) match {
      case JArray(items) => items.map { i =>
        ((i \ "name") match { case JString(s) => s; case _ => "" },
          (i \ "type") match { case JString(s) => s; case _ => "" })
      }
      case _ => Nil
    }
    (plan, resources)
  }

  // ---- EXPLAIN battery ----

  test("testExplainSelectStar + testExplainSelectStarWithOverrides (CalciteQueryTest.java:7062)") {
    val (plan, resources) = explain("EXPLAIN PLAN FOR SELECT * FROM foo")
    assert(plan.nonEmpty)
    assert(resources == List(("foo", "DATASOURCE")))
    // the reference's useNativeQueryExplain toggles between two plan
    // RENDERINGS of the same query; this engine has one (Catalyst) rendering,
    // so the override context is accepted and ignored
    val (status, _) = post("EXPLAIN PLAN FOR SELECT * FROM foo", """{"useNativeQueryExplain": true}""")
    assert(status == 200)
  }

  test("testExplainCountStarOnView (CalciteQueryTest.java:4285) — view typed VIEW in RESOURCES") {
    val (plan, resources) = explain(
      "EXPLAIN PLAN FOR SELECT COUNT(*) FROM `view`.aview WHERE dim1_firstchar <> 'z'")
    assert(plan.nonEmpty)
    assert(resources == List(("aview", "VIEW")))
  }

  test("testExplainExactCountDistinctOfSemiJoinResult (CalciteQueryTest.java:7008)") {
    val (plan, resources) = explain(
      """EXPLAIN PLAN FOR SELECT COUNT(*)
        |FROM (
        |  SELECT DISTINCT dim2 FROM foo
        |  WHERE SUBSTRING(dim2, 1, 1) IN (
        |    SELECT SUBSTRING(dim1, 1, 1) FROM foo WHERE dim1 IS NOT NULL))""".stripMargin)
    assert(plan.nonEmpty)
    assert(resources == List(("foo", "DATASOURCE")))
  }

  test("testExplainInformationSchemaColumns (CalciteQueryTest.java:354) — system tables are not resources") {
    val (plan, resources) = explain(
      """EXPLAIN PLAN FOR SELECT column_name, data_type
        |FROM information_schema.columns
        |WHERE table_schema = 'druid' AND table_name = 'foo'""".stripMargin)
    assert(plan.nonEmpty)
    assert(resources.isEmpty) // reference: resources = "[]"
  }

  test("testExplainMultipleTopLevelUnionAllQueries (CalciteQueryTest.java:7141)") {
    val (plan, resources) = explain(
      """EXPLAIN PLAN FOR SELECT dim1 FROM foo
        |UNION ALL (SELECT dim1 FROM foo WHERE dim1 = '42'
        |UNION ALL SELECT dim1 FROM foo WHERE dim1 = '44')""".stripMargin)
    // Catalyst may fold the whole union over a literal fixture; the
    // contract under test is the single [PLAN, RESOURCES] row with the
    // datasource listed once
    assert(plan.nonEmpty)
    assert(resources == List(("foo", "DATASOURCE"))) // deduplicated, like the reference
  }

  // ---- requireTimeCondition battery ----

  private val requireTimeCtx = """{"requireTimeCondition": true}"""

  test("testRequireTimeConditionPositive (CalciteQueryTest.java:11685)") {
    // simple timeseries: the filter rides an aliased __time
    val (s1, b1) = post(
      """SELECT SUM(cnt) s, gran FROM (
        |  SELECT __time AS t, TIME_FLOOR(__time, 'P1M') AS gran, cnt FROM foo) x
        |WHERE t >= '2000-01-01' AND t < '2002-01-01'
        |GROUP BY gran ORDER BY gran""".stripMargin, requireTimeCtx)
    assert(s1 == 200, b1)
    assert(rows(b1).map(_.head) == List(JInt(3), JInt(3)))
    // nested groupby needs the condition only on the innermost query
    val (s2, b2) = post(
      """SELECT SUM(cnt) s, COUNT(*) c
        |FROM (SELECT dim2, SUM(cnt) AS cnt FROM foo WHERE __time >= '2000-01-01' GROUP BY dim2)""".stripMargin,
      requireTimeCtx)
    assert(s2 == 200, b2)
    assert(rows(b2) == List(List(JInt(6), JInt(4))))
    // semi-join: time condition on both the outer query and the subquery
    val (s3, b3) = post(
      """SELECT COUNT(*) c FROM foo
        |WHERE __time >= '2000-01-01' AND SUBSTRING(dim2, 1, 1) IN (
        |  SELECT SUBSTRING(dim1, 1, 1) FROM foo
        |  WHERE dim1 <> '' AND __time >= '2000-01-01')""".stripMargin, requireTimeCtx)
    assert(s3 == 200, b3)
    assert(rows(b3) == List(List(JInt(3))))
  }

  test("testRequireTimeConditionLogicalValuePositive (CalciteQueryTest.java:11827)") {
    val (status, body) = post("SELECT 2 + 2 AS a", requireTimeCtx)
    assert(status == 200, body)
    assert(rows(body) == List(List(JInt(4))))
  }

  test("testRequireTimeConditionSimpleQueryNegative (CalciteQueryTest.java:11850)") {
    val (status, body) = post(
      """SELECT SUM(cnt) s, gran FROM (
        |  SELECT __time AS t, TIME_FLOOR(__time, 'P1M') AS gran, cnt FROM foo) x
        |GROUP BY gran ORDER BY gran""".stripMargin, requireTimeCtx)
    assert(status != 200 && body.contains("__time column"), body)
  }

  test("testRequireTimeConditionSubQueryNegative (CalciteQueryTest.java:11870)") {
    val (status, body) = post(
      """SELECT SUM(cnt) s, COUNT(*) c
        |FROM (SELECT dim2, SUM(cnt) AS cnt FROM foo GROUP BY dim2)""".stripMargin, requireTimeCtx)
    assert(status != 200 && body.contains("__time column"), body)
  }

  test("testRequireTimeConditionSemiJoinNegative (CalciteQueryTest.java:11888) — subquery alone is not enough") {
    val (status, body) = post(
      """SELECT COUNT(*) c FROM foo
        |WHERE SUBSTRING(dim2, 1, 1) IN (
        |  SELECT SUBSTRING(dim1, 1, 1) FROM foo
        |  WHERE dim1 <> '' AND __time >= '2000-01-01')""".stripMargin, requireTimeCtx)
    assert(status != 200 && body.contains("__time column"), body)
  }

  // ---- context-parameter validation ----

  test("testZeroMaxNumericInFilter (CalciteQueryTest.java:6947)") {
    val (status, body) = post(
      "SELECT COUNT(*) c FROM foo WHERE m1 IN (1, 2, 3)",
      """{"maxNumericInFilters": 0}""")
    assert(status != 200 && body.contains("[maxNumericInFilters] must be greater than 0"), body)
  }

  test("testQueryWithMoreThanMaxNumericInFilter (CalciteQueryTest.java) — numeric IN over the cap rejects") {
    val (status, body) = post(
      "SELECT COUNT(*) c FROM foo WHERE m1 IN (1, 2, 3)",
      """{"maxNumericInFilters": 2}""")
    assert(status != 200, body)
    assert(body.contains("The number of values in the IN clause for [m1] in query exceeds " +
      "configured maxNumericFilter limit of [2] for INs. Cast [3] values of IN clause to String"), body)
  }

  test("maxNumericInFilters positive cases: within the cap runs; string INs are exempt") {
    // within the cap (the testHighestMaxNumericInFilter query shape with a
    // legal context value — its 20000 over-system-cap variant is
    // testZeroMaxNumericInFilter's sibling, covered above)
    val (s1, b1) = post(
      "SELECT COUNT(*) c FROM foo WHERE m1 IN (1, 2, 3)",
      """{"maxNumericInFilters": 3}""")
    assert(s1 == 200, b1)
    // a STRING IN list is exempt at any length (the reference plans it to
    // one InFilter — only numeric INs fan out into per-value BoundFilters)
    val (s2, b2) = post(
      "SELECT COUNT(*) c FROM foo WHERE dim1 IN ('10.1', '2', 'abc', 'def')",
      """{"maxNumericInFilters": 2}""")
    assert(s2 == 200, b2)
  }
}
