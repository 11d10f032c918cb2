package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 7 over the shared TestIndex fixture
  * ([[TestIndexFixture]]): TimeBoundaryQueryRunnerTest.java and the
  * remaining GroupByQueryRunnerTest.java corners — bound-restricted and
  * filtered time boundaries, string-expression virtual columns, two
  * multi-value dimensions over one column (element cross product), the
  * lookup rename family, alphanumeric limit ordering, empty subqueries,
  * and first/last re-folded over an inner query's day buckets. Each test
  * cites its reference method and asserts the reference's published vectors. */
class QueryRunnerGoldenSpec7 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def day(r: Row): String =
    r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString

  // -------------------------------------------------------- timeBoundary

  test("testTimeBoundary + testTimeBoundaryMax + testTimeBoundaryMin " +
      "(TimeBoundaryQueryRunnerTest.java:204,221,240): both bounds / max " +
      "only / min only over the full data") {
    val both = run("""{"queryType": "timeBoundary", "dataSource": "testIndex"}""")
      .collect()
    assert(both.length == 1)
    assert(both(0).getAs[java.time.LocalDateTime]("minTime").toString == "2011-01-12T00:00")
    assert(both(0).getAs[java.time.LocalDateTime]("maxTime").toString == "2011-04-15T00:00")

    val maxOnly = run(
      """{"queryType": "timeBoundary", "dataSource": "testIndex", "bound": "maxTime"}""")
      .collect()
    assert(maxOnly.length == 1)
    assert(maxOnly(0).schema.fieldNames.toSeq == Seq("maxTime"))
    assert(maxOnly(0).getAs[java.time.LocalDateTime]("maxTime").toString == "2011-04-15T00:00")

    val minOnly = run(
      """{"queryType": "timeBoundary", "dataSource": "testIndex", "bound": "minTime"}""")
      .collect()
    assert(minOnly.length == 1)
    assert(minOnly(0).schema.fieldNames.toSeq == Seq("minTime"))
    assert(minOnly(0).getAs[java.time.LocalDateTime]("minTime").toString == "2011-01-12T00:00")
  }

  test("testFilteredTimeBoundaryQueryNoMatches (TimeBoundaryQueryRunnerTest" +
      ".java:188): a filter matching nothing yields an EMPTY result, not a " +
      "null-bounds row") {
    val rows = run(
      """{"queryType": "timeBoundary", "dataSource": "testIndex",
          "filter": {"type": "selector", "dimension": "quality", "value": "foobar"}}""")
      .collect()
    assert(rows.isEmpty, s"got:\n${rows.mkString("\n")}")
  }

  // ------------------------------------------------------------- groupBy

  test("testGroupByWithStringVirtualColumn (GroupByQueryRunnerTest.java:1038): " +
      "a math-expr string-concat virtual column (quality + 'x') groups like " +
      "a dimension") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "virtualColumns": [{"type": "expression", "name": "vc",
          "expression": "quality + 'x'", "outputType": "STRING"}],
        "dimensions": [{"type": "default", "dimension": "vc", "outputName": "alias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"), r.getAs[Long]("idx")))
      .sortBy(t => (t._1, t._2))
    val expected = Seq(
      ("2011-04-01", "automotivex", 1L, 135L), ("2011-04-01", "businessx", 1L, 118L),
      ("2011-04-01", "entertainmentx", 1L, 158L), ("2011-04-01", "healthx", 1L, 120L),
      ("2011-04-01", "mezzaninex", 3L, 2870L), ("2011-04-01", "newsx", 1L, 121L),
      ("2011-04-01", "premiumx", 3L, 2900L), ("2011-04-01", "technologyx", 1L, 78L),
      ("2011-04-01", "travelx", 1L, 119L),
      ("2011-04-02", "automotivex", 1L, 147L), ("2011-04-02", "businessx", 1L, 112L),
      ("2011-04-02", "entertainmentx", 1L, 166L), ("2011-04-02", "healthx", 1L, 113L),
      ("2011-04-02", "mezzaninex", 3L, 2447L), ("2011-04-02", "newsx", 1L, 114L),
      ("2011-04-02", "premiumx", 3L, 2505L), ("2011-04-02", "technologyx", 1L, 97L),
      ("2011-04-02", "travelx", 1L, 126L))
    assert(rows.toSeq == expected, s"got:\n${rows.mkString("\n")}")
  }

  test("testTwoMultiValueDimensions (GroupByQueryRunnerTest.java:2157): the " +
      "SAME multi-value column grouped twice explodes to the element cross " +
      "product — 4 combos of {a, preferred} after the selector filter") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "selector", "dimension": "placementish", "value": "a"},
        "dimensions": [
          {"type": "default", "dimension": "placementish", "outputName": "alias"},
          {"type": "default", "dimension": "placementish", "outputName": "alias2"}
        ],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ]
      }""").collect()
      .map(r => (r.getAs[String]("alias"), r.getAs[String]("alias2"),
        r.getAs[Long]("rows"), r.getAs[Long]("idx")))
      .sortBy(t => (t._1, t._2))
    assert(rows.toSeq == Seq(
      ("a", "a", 2L, 282L), ("a", "preferred", 2L, 282L),
      ("preferred", "a", 2L, 282L), ("preferred", "preferred", 2L, 282L)),
      s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByWithSimpleRename (GroupByQueryRunnerTest.java:3288): an " +
      "injective non-retaining lookup renames every quality value") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "extraction", "dimension": "quality", "outputName": "alias",
          "extractionFn": {"type": "lookup",
            "lookup": {"type": "map", "map": {
              "automotive": "automotive0", "business": "business0",
              "entertainment": "entertainment0", "health": "health0",
              "mezzanine": "mezzanine0", "news": "news0", "premium": "premium0",
              "technology": "technology0", "travel": "travel0"}},
            "retainMissingValue": false, "injective": true, "optimize": false}}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"), r.getAs[Long]("idx")))
      .sortBy(t => (t._1, t._2))
    val expected = Seq(
      ("2011-04-01", "automotive0", 1L, 135L), ("2011-04-01", "business0", 1L, 118L),
      ("2011-04-01", "entertainment0", 1L, 158L), ("2011-04-01", "health0", 1L, 120L),
      ("2011-04-01", "mezzanine0", 3L, 2870L), ("2011-04-01", "news0", 1L, 121L),
      ("2011-04-01", "premium0", 3L, 2900L), ("2011-04-01", "technology0", 1L, 78L),
      ("2011-04-01", "travel0", 1L, 119L),
      ("2011-04-02", "automotive0", 1L, 147L), ("2011-04-02", "business0", 1L, 112L),
      ("2011-04-02", "entertainment0", 1L, 166L), ("2011-04-02", "health0", 1L, 113L),
      ("2011-04-02", "mezzanine0", 3L, 2447L), ("2011-04-02", "news0", 1L, 114L),
      ("2011-04-02", "premium0", 3L, 2505L), ("2011-04-02", "technology0", 1L, 97L),
      ("2011-04-02", "travel0", 1L, 126L))
    assert(rows.toSeq == expected, s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByWithAlphaNumericDimensionOrder (GroupByQueryRunnerTest" +
      ".java:4794): the ALPHANUMERIC limit comparator orders embedded " +
      "numbers numerically — health09 < health20 < health105 < health999") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "extraction", "dimension": "quality", "outputName": "alias",
          "extractionFn": {"type": "lookup",
            "lookup": {"type": "map", "map": {
              "automotive": "health105", "business": "health20",
              "entertainment": "travel47", "health": "health55",
              "mezzanine": "health09", "news": "health0000",
              "premium": "health999", "technology": "travel123",
              "travel": "travel555"}},
            "retainMissingValue": false, "injective": false, "optimize": false}}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ],
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "alias", "dimensionOrder": "alphanumeric"}]}
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"), r.getAs[Long]("idx")))
      .toSeq
    val expected = Seq(
      ("2011-04-01", "health0000", 1L, 121L), ("2011-04-01", "health09", 3L, 2870L),
      ("2011-04-01", "health20", 1L, 118L), ("2011-04-01", "health55", 1L, 120L),
      ("2011-04-01", "health105", 1L, 135L), ("2011-04-01", "health999", 3L, 2900L),
      ("2011-04-01", "travel47", 1L, 158L), ("2011-04-01", "travel123", 1L, 78L),
      ("2011-04-01", "travel555", 1L, 119L),
      ("2011-04-02", "health0000", 1L, 114L), ("2011-04-02", "health09", 3L, 2447L),
      ("2011-04-02", "health20", 1L, 112L), ("2011-04-02", "health55", 1L, 113L),
      ("2011-04-02", "health105", 1L, 147L), ("2011-04-02", "health999", 3L, 2505L),
      ("2011-04-02", "travel47", 1L, 166L), ("2011-04-02", "travel123", 1L, 97L),
      ("2011-04-02", "travel555", 1L, 126L))
    assert(rows == expected, s"got:\n${rows.mkString("\n")}")
  }

  test("testEmptySubquery (GroupByQueryRunnerTest.java:5979): an outer query " +
      "over an inner query with no rows returns nothing") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy",
          "dataSource": "testIndex",
          "granularity": "day",
          "intervals": ["2020-04-02T00:00:00.000Z/P1D"],
          "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"}
          ]
        }},
        "dimensions": [],
        "aggregations": [{"type": "doubleMax", "name": "idx", "fieldName": "idx"}]
      }""").collect()
    assert(rows.isEmpty, s"got:\n${rows.mkString("\n")}")
  }

  test("testSubqueryWithFirstLast (GroupByQueryRunnerTest.java:7227): the " +
      "outer MONTH first/last re-fold the inner query's per-day longFirst/" +
      "longLast by the inner rows' day-bucket timestamps") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "granularity": "month",
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy",
          "dataSource": "testIndex",
          "granularity": "day",
          "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
          "dimensions": [{"type": "default", "dimension": "market", "outputName": "market"}],
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longFirst", "name": "innerfirst", "fieldName": "index"},
            {"type": "longLast", "name": "innerlast", "fieldName": "index"}
          ]
        }},
        "dimensions": [],
        "aggregations": [
          {"type": "longFirst", "name": "first", "fieldName": "innerfirst"},
          {"type": "longLast", "name": "last", "fieldName": "innerlast"}
        ]
      }""").collect()
      .map(r => (day(r), r.getAs[Long]("first"), r.getAs[Long]("last"))).toSeq
    assert(rows == Seq(
      ("2011-01-01", 100L, 943L),
      ("2011-02-01", 132L, 1101L),
      ("2011-03-01", 153L, 1063L),
      ("2011-04-01", 135L, 780L)), s"got:\n${rows.mkString("\n")}")
  }
}
