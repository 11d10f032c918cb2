package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 10 over the shared TestIndex fixture
  * ([[TestIndexFixture]]): GroupByQueryRunnerTest.java typed-numerics
  * decorations and extractions — regex/list-filtered dimension specs over
  * LONG/FLOAT columns (rejected values group as NULL), null-producing
  * searchQuery extractions re-typed in an outer query, __time and FLOAT
  * dims re-aggregated through a nested query, and strlen extraction with a
  * LONG outputType. */
class QueryRunnerGoldenSpec10 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def dbl(r: Row, name: String): Double =
    r.getAs[Number](name).doubleValue()

  test("testGroupByDecorationOnNumerics (GroupByQueryRunnerTest.java:10494): " +
      "regexFiltered over a LONG dim and listFiltered over a FLOAT dim " +
      "match the values' STRING forms; rejected values group as NULL") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "in", "dimension": "quality",
                   "values": ["entertainment", "technology"]},
        "dimensions": [
          {"type": "regexFiltered",
           "delegate": {"type": "default", "dimension": "qualityLong",
                        "outputName": "ql", "outputType": "LONG"},
           "pattern": "1700"},
          {"type": "listFiltered",
           "delegate": {"type": "default", "dimension": "qualityFloat",
                        "outputName": "qf", "outputType": "FLOAT"},
           "values": ["17000.0"], "isWhitelist": true}
        ],
        "aggregations": [{"type": "count", "name": "count"}]
      }""").collect()
      .map(r => (if (r.isNullAt(r.fieldIndex("ql"))) null
                 else java.lang.Long.valueOf(r.getAs[Long]("ql")),
        if (r.isNullAt(r.fieldIndex("qf"))) null
        else java.lang.Double.valueOf(dbl(r, "qf")),
        r.getAs[Long]("count")))
      .sortBy(t => if (t._1 == null) Long.MinValue else t._1.longValue())
    assert(rows.toSeq == Seq((null, null, 2L), (1700L, 17000.0, 2L)),
      s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByNestedWithInnerQueryOutputNullNumerics (GroupByQueryRunner" +
      "Test.java:10637): a searchQuery extraction nulls non-matching typed " +
      "numerics in the inner query; the outer re-types and sums them — the " +
      "null group sums to NULL") {
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
          "filter": {"type": "in", "dimension": "quality",
                     "values": ["entertainment", "business"]},
          "dimensions": [
            {"type": "default", "dimension": "quality", "outputName": "alias"},
            {"type": "extraction", "dimension": "qualityLong", "outputName": "ql_alias",
             "outputType": "LONG",
             "extractionFn": {"type": "searchQuery",
               "query": {"type": "contains", "value": "1200", "caseSensitive": false}}},
            {"type": "extraction", "dimension": "qualityFloat", "outputName": "qf_alias",
             "outputType": "FLOAT",
             "extractionFn": {"type": "searchQuery",
               "query": {"type": "contains", "value": "1200", "caseSensitive": false}}},
            {"type": "extraction", "dimension": "qualityDouble", "outputName": "qd_alias",
             "outputType": "DOUBLE",
             "extractionFn": {"type": "searchQuery",
               "query": {"type": "contains", "value": "1200", "caseSensitive": false}}}
          ],
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"}
          ]
        }},
        "dimensions": [
          {"type": "default", "dimension": "ql_alias", "outputName": "quallong", "outputType": "LONG"},
          {"type": "default", "dimension": "qf_alias", "outputName": "qualfloat", "outputType": "FLOAT"},
          {"type": "default", "dimension": "qd_alias", "outputName": "qualdouble", "outputType": "DOUBLE"}
        ],
        "aggregations": [
          {"type": "longSum", "name": "ql_alias_sum", "fieldName": "ql_alias"},
          {"type": "doubleSum", "name": "qf_alias_sum", "fieldName": "qf_alias"},
          {"type": "doubleSum", "name": "qd_alias_sum", "fieldName": "qd_alias"}
        ]
      }""").collect()
      .sortBy(r => if (r.isNullAt(r.fieldIndex("quallong"))) -1L
                   else r.getAs[Long]("quallong"))
    assert(rows.length == 2, s"got:\n${rows.mkString("\n")}")
    val nullRow = rows(0)
    assert(nullRow.isNullAt(nullRow.fieldIndex("quallong")))
    assert(nullRow.isNullAt(nullRow.fieldIndex("qualfloat")))
    assert(nullRow.isNullAt(nullRow.fieldIndex("ql_alias_sum")))
    assert(nullRow.isNullAt(nullRow.fieldIndex("qf_alias_sum")))
    val r1200 = rows(1)
    assert(r1200.getAs[Long]("quallong") == 1200L)
    assert(dbl(r1200, "qualfloat") == 12000.0)
    assert(dbl(r1200, "qualdouble") == 12000.0)
    assert(r1200.getAs[Long]("ql_alias_sum") == 2400L)
    assert(dbl(r1200, "qf_alias_sum") == 24000.0)
    assert(dbl(r1200, "qd_alias_sum") == 24000.0)
  }

  test("testGroupByNestedWithInnerQueryNumericsWithLongTime (GroupByQuery" +
      "RunnerTest.java:10725): inner __time LONG and FLOAT index dims " +
      "re-aggregated by the outer query — longMax over millis, doubleMax " +
      "over the float32 re-typed index") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy",
          "dataSource": "testIndex",
          "granularity": "all",
          "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
          "dimensions": [
            {"type": "default", "dimension": "market", "outputName": "alias"},
            {"type": "default", "dimension": "__time", "outputName": "time_alias", "outputType": "LONG"},
            {"type": "default", "dimension": "index", "outputName": "index_alias", "outputType": "FLOAT"}
          ],
          "aggregations": [{"type": "count", "name": "rows"}]
        }},
        "dimensions": [
          {"type": "default", "dimension": "alias", "outputName": "market"},
          {"type": "default", "dimension": "time_alias", "outputName": "time_alias2", "outputType": "LONG"}
        ],
        "aggregations": [
          {"type": "longMax", "name": "time_alias_max", "fieldName": "time_alias"},
          {"type": "doubleMax", "name": "index_alias_max", "fieldName": "index_alias"}
        ]
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[Long]("time_alias2"),
        r.getAs[Long]("time_alias_max"), dbl(r, "index_alias_max")))
      .sortBy(t => (t._1, t._2))
    val apr1 = 1301616000000L
    val apr2 = 1301702400000L
    assert(rows.toSeq == Seq(
      ("spot", apr1, apr1, 158.74722290039062),
      ("spot", apr2, apr2, 166.01605224609375),
      ("total_market", apr1, apr1, 1522.043701171875),
      ("total_market", apr2, apr2, 1321.375),
      ("upfront", apr1, apr1, 1447.3411865234375),
      ("upfront", apr2, apr2, 1144.3424072265625)), s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByStringOutputAsLong (GroupByQueryRunnerTest.java:10812): a " +
      "strlen extraction with a LONG outputType — 'entertainment'.length " +
      "groups as 13L") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "selector", "dimension": "quality", "value": "entertainment"},
        "dimensions": [{"type": "extraction", "dimension": "quality",
          "outputName": "alias", "outputType": "LONG",
          "extractionFn": {"type": "strlen"}}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ]
      }""").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString,
        r.getAs[Long]("alias"), r.getAs[Long]("rows"), r.getAs[Long]("idx"))).toSeq
    assert(rows == Seq(
      ("2011-04-01", 13L, 1L, 158L),
      ("2011-04-02", 13L, 1L, 166L)), s"got:\n${rows.mkString("\n")}")
  }
}
