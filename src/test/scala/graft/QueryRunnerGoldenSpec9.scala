package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 9 over the shared TestIndex fixture
  * ([[TestIndexFixture]]): GroupByQueryRunnerTest.java time-extraction and
  * typed-numerics depth — day-of-week extraction dims across the full
  * coverage (with the skipped Friday), sums over typed numeric DIMENSION
  * columns, and nested queries re-typing and filtering the inner numerics
  * (string selector + numeric bound over LONG/FLOAT inner dims). */
class QueryRunnerGoldenSpec9 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def relEq(got: Double, exp: Double, tol: Double = 1e-6): Boolean =
    math.abs(got - exp) <= math.abs(exp) * tol

  private def dbl(r: Row, name: String): Double =
    r.getAs[Number](name).doubleValue()

  test("testGroupByTimeExtraction (GroupByQueryRunnerTest.java:8284): market " +
      "× dayOfWeek (timeFormat EEEE over __time) across the full coverage — " +
      "Wednesday/Thursday carry 14 weeks, the skipped Friday 13") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "filter": {"type": "or", "fields": [
          {"type": "selector", "dimension": "market", "value": "spot"},
          {"type": "selector", "dimension": "market", "value": "upfront"}]},
        "dimensions": [
          {"type": "default", "dimension": "market", "outputName": "market"},
          {"type": "extraction", "dimension": "__time", "outputName": "dayOfWeek",
           "extractionFn": {"type": "timeFormat", "format": "EEEE"}}
        ],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"}
        ],
        "postAggregations": [
          {"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
           "fields": [
             {"type": "fieldAccess", "fieldName": "rows"},
             {"type": "fieldAccess", "fieldName": "index"},
             {"type": "constant", "value": 1}]}]
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[String]("dayOfWeek"),
        r.getAs[Long]("rows"), dbl(r, "index")))
      .sortBy(t => (t._1, t._2))
    val expected = Seq(
      ("spot", "Friday", 117L, 13219.574157714844),
      ("spot", "Monday", 117L, 13557.738830566406),
      ("spot", "Saturday", 117L, 13493.751281738281),
      ("spot", "Sunday", 117L, 13585.541015625),
      ("spot", "Thursday", 126L, 14279.127197265625),
      ("spot", "Tuesday", 117L, 13199.471435546875),
      ("spot", "Wednesday", 126L, 14271.368591308594),
      ("upfront", "Friday", 26L, 27297.8623046875),
      ("upfront", "Monday", 26L, 27619.58447265625),
      ("upfront", "Saturday", 26L, 27820.83154296875),
      ("upfront", "Sunday", 26L, 24791.223876953125),
      ("upfront", "Thursday", 28L, 28562.748901367188),
      ("upfront", "Tuesday", 26L, 26968.280639648438),
      ("upfront", "Wednesday", 28L, 28985.5751953125))
    assert(rows.length == expected.length, s"got ${rows.length} rows")
    rows.zip(expected).foreach { case ((m, d, n, i), (em, ed, en, ei)) =>
      assert(m == em && d == ed && n == en, s"($m,$d,$n) vs ($em,$ed,$en)")
      assert(relEq(i, ei), s"$m/$d index: $i vs $ei")
    }
  }

  test("testGroupByWithAggsOnNumericDimensions (GroupByQueryRunnerTest" +
      ".java:10869): long and double sums over the typed NUMERIC DIMENSION " +
      "columns (the JS aggregators of the original equal the double sums — " +
      "javascript non-goal)") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "selector", "dimension": "quality", "value": "technology"},
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "qlLong", "fieldName": "qualityLong"},
          {"type": "doubleSum", "name": "qlFloat", "fieldName": "qualityLong"},
          {"type": "doubleSum", "name": "qfFloat", "fieldName": "qualityFloat"},
          {"type": "longSum", "name": "qfLong", "fieldName": "qualityFloat"}
        ]
      }""").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString,
        r.getAs[String]("alias"), r.getAs[Long]("rows"), r.getAs[Long]("qlLong"),
        dbl(r, "qlFloat"), dbl(r, "qfFloat"), r.getAs[Long]("qfLong"))).toSeq
    assert(rows == Seq(
      ("2011-04-01", "technology", 1L, 1700L, 1700.0, 17000.0, 17000L),
      ("2011-04-02", "technology", 1L, 1700L, 1700.0, 17000.0, 17000L)),
      s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByNestedWithInnerQueryNumerics (GroupByQueryRunnerTest" +
      ".java:10565): the outer query re-types the inner LONG/FLOAT dims and " +
      "filters them with a STRING selector and an exclusive numeric bound") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy",
          "dataSource": "testIndex",
          "granularity": "day",
          "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
          "filter": {"type": "in", "dimension": "quality", "values": ["entertainment"]},
          "dimensions": [
            {"type": "default", "dimension": "quality", "outputName": "alias"},
            {"type": "default", "dimension": "qualityLong", "outputName": "ql_alias", "outputType": "LONG"},
            {"type": "default", "dimension": "qualityFloat", "outputName": "qf_alias", "outputType": "FLOAT"}
          ],
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"}
          ]
        }},
        "filter": {"type": "and", "fields": [
          {"type": "selector", "dimension": "ql_alias", "value": "1200"},
          {"type": "bound", "dimension": "qf_alias",
           "lower": "11095.0", "upper": "12005.0",
           "lowerStrict": true, "upperStrict": true, "ordering": "numeric"}]},
        "dimensions": [
          {"type": "default", "dimension": "ql_alias", "outputName": "quallong", "outputType": "LONG"},
          {"type": "default", "dimension": "qf_alias", "outputName": "qualfloat", "outputType": "FLOAT"}
        ],
        "aggregations": [
          {"type": "longSum", "name": "ql_alias_sum", "fieldName": "ql_alias"},
          {"type": "doubleSum", "name": "qf_alias_sum", "fieldName": "qf_alias"}
        ]
      }""").collect()
    assert(rows.length == 1, s"got:\n${rows.mkString("\n")}")
    val r = rows(0)
    assert(r.getAs[Long]("quallong") == 1200L)
    assert(dbl(r, "qualfloat") == 12000.0)
    assert(r.getAs[Long]("ql_alias_sum") == 2400L)
    assert(dbl(r, "qf_alias_sum") == 24000.0)
  }
}
