package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 8 over the shared TestIndex fixture
  * ([[TestIndexFixture]]): more TopNQueryRunnerTest.java and
  * GroupByQueryRunnerTest.java corners — collapsing extractions, dimension
  * metric specs over re-typed columns (LONG __time, unparseable DOUBLE,
  * DOUBLE float), typed numeric-dimension aggregations, numeric bound
  * filters excluding everything, null previousStop pagination, and groupBy
  * over empty intervals / regex filters / nonexistent leading dimensions.
  * Each test cites its reference method and asserts the reference's
  * published vectors. JavaScript extractions are expressed as stringFormat
  * and noted (javascript is a declared non-goal). */
class QueryRunnerGoldenSpec8 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def relEq(got: Double, exp: Double, tol: Double = 1e-6): Boolean =
    math.abs(got - exp) <= math.abs(exp) * tol

  private def dbl(r: Row, name: String): Double =
    r.getAs[Number](name).doubleValue()

  private val CommonAggs =
    """{"type": "count", "name": "rows"},
       {"type": "doubleSum", "name": "index", "fieldName": "index"},
       {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}"""

  // ----------------------------------------------------------------- topN

  test("testTopNDimExtractionToOne (TopNQueryRunnerTest.java:2198): a " +
      "constant extraction collapses every dimension value into ONE ranked " +
      "row holding the full totals (the JS constant fn is the placeholder-" +
      "free stringFormat — javascript non-goal)") {
    val rows = run(
      s"""{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": {"type": "extraction", "dimension": "market",
          "outputName": "market",
          "extractionFn": {"type": "stringFormat", "format": "POTATO"}},
        "metric": "rows",
        "threshold": 10,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "aggregations": [$CommonAggs],
        "postAggregations": [
          {"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
           "fields": [
             {"type": "fieldAccess", "fieldName": "rows"},
             {"type": "fieldAccess", "fieldName": "index"},
             {"type": "constant", "value": 1}]}]
      }""").collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[String]("market") == "POTATO")
    assert(r.getAs[Long]("rows") == 1209L)
    assert(relEq(dbl(r, "index"), 503332.5071372986d))
    assert(relEq(dbl(r, "addRowsIndexConstant"), 504542.5071372986d))
    assert(dbl(r, "uniques") == TestIndexFixture.Uniques9)
  }

  test("testTopNOverPartialNullDimensionWithFilterOnNOTNullValue " +
      "(TopNQueryRunnerTest.java:3963): selecting the non-null value keeps " +
      "only its group") {
    val rows = run(
      s"""{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": "partial_null_column",
        "metric": "uniques",
        "threshold": 1000,
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "selector", "dimension": "partial_null_column", "value": "value"},
        "aggregations": [$CommonAggs]
      }""").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("partial_null_column") == "value")
    assert(rows(0).getAs[Long]("rows") == 4L)
    assert(relEq(dbl(rows(0), "index"), 4875.669692d))
    assert(dbl(rows(0), "uniques") == TestIndexFixture.Uniques2)
  }

  test("testAlphaNumericTopNWithNullPreviousStop + testNumericDimensionTopN" +
      "WithNullPreviousStop (TopNQueryRunnerTest.java:3995,4034): dimension " +
      "metric specs with a null previousStop paginate from the start") {
    for (ordering <- Seq("alphanumeric", "numeric")) {
      val rows = run(
        s"""{
          "queryType": "topN",
          "dataSource": "testIndex",
          "granularity": "all",
          "dimension": "market",
          "metric": {"type": "dimension", "ordering": "$ordering", "previousStop": null},
          "threshold": 2,
          "intervals": ["2011-04-02T00:00:00.000Z/P1D"],
          "aggregations": [{"type": "count", "name": "rows"}]
        }""").collect()
        .map(r => (r.getAs[String]("market"), r.getAs[Long]("rows"))).toSeq
      assert(rows == Seq(("spot", 9L), ("total_market", 2L)), s"$ordering: $rows")
    }
  }

  test("testSortOnTimeAsLong (TopNQueryRunnerTest.java:5072): __time " +
      "re-typed LONG under the numeric dimension comparator — the first 4 " +
      "day millis") {
    val rows = run(
      """{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": {"type": "default", "dimension": "__time",
                      "outputName": "__time_alias", "outputType": "LONG"},
        "metric": {"type": "dimension", "ordering": "numeric"},
        "threshold": 4,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
      }""").collect().map(_.getAs[Long]("__time_alias")).toSeq
    assert(rows == Seq(1294790400000L, 1294876800000L, 1294963200000L, 1295049600000L),
      s"got $rows")
  }

  test("testSortOnStringAsDouble (TopNQueryRunnerTest.java:5108): an " +
      "unparseable DOUBLE re-type of a string dimension collapses to the " +
      "single NULL group") {
    val rows = run(
      """{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": {"type": "default", "dimension": "market",
                      "outputName": "alias", "outputType": "DOUBLE"},
        "metric": {"type": "dimension", "ordering": "numeric"},
        "threshold": 4,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
      }""").collect()
    assert(rows.length == 1)
    assert(rows(0).isNullAt(rows(0).fieldIndex("alias")))
  }

  test("testSortOnDoubleAsDouble (TopNQueryRunnerTest.java:5136): the " +
      "DOUBLE-typed index dimension sorts numerically — raw double values, " +
      "unlike the truncating LONG re-type") {
    val rows = run(
      """{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": {"type": "default", "dimension": "index",
                      "outputName": "index_alias", "outputType": "DOUBLE"},
        "metric": {"type": "dimension", "ordering": "numeric"},
        "threshold": 4,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
      }""").collect().map(r => dbl(r, "index_alias")).toSeq
    assert(rows == Seq(59.021022d, 59.266595d, 67.73117d, 68.573162d), s"got $rows")
  }

  test("testFullOnTopNWithAggsOnNumericDims (TopNQueryRunnerTest.java:5508): " +
      "long/double sums over the typed NUMERIC DIMENSION columns " +
      "(qualityLong/qualityFloat) alongside the common aggregators") {
    val rows = run(
      s"""{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": "market",
        "metric": "index",
        "threshold": 4,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "aggregations": [$CommonAggs,
          {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
          {"type": "doubleMin", "name": "minIndex", "fieldName": "index"},
          {"type": "longSum", "name": "qlLong", "fieldName": "qualityLong"},
          {"type": "doubleSum", "name": "qlFloat", "fieldName": "qualityLong"},
          {"type": "doubleSum", "name": "qfFloat", "fieldName": "qualityFloat"},
          {"type": "longSum", "name": "qfLong", "fieldName": "qualityFloat"}]
      }""").collect()
    val expected = Seq(
      ("total_market", 186L, 215679.82879638672d, TestIndexFixture.Uniques2,
        1743.92175d, 792.3260498046875d, 279000L, 279000.0, 2790000.0, 2790000L),
      ("upfront", 186L, 192046.1060180664d, TestIndexFixture.Uniques2,
        1870.061029d, 545.9906005859375d, 279000L, 279000.0, 2790000.0, 2790000L),
      ("spot", 837L, 95606.57232284546d, TestIndexFixture.Uniques9,
        277.273533d, 59.02102279663086d, 1171800L, 1171800.0, 11718000.0, 11718000L))
    assert(rows.length == 3)
    rows.zip(expected).foreach {
      case (r, (m, n, i, u, mx, mn, qll, qlf, qff, qfl)) =>
        assert(r.getAs[String]("market") == m, s"row: $r")
        assert(r.getAs[Long]("rows") == n)
        assert(relEq(dbl(r, "index"), i), s"$m index")
        assert(dbl(r, "uniques") == u)
        assert(relEq(dbl(r, "maxIndex"), mx), s"$m max")
        assert(relEq(dbl(r, "minIndex"), mn), s"$m min")
        assert(r.getAs[Long]("qlLong") == qll)
        assert(dbl(r, "qlFloat") == qlf)
        assert(dbl(r, "qfFloat") == qff)
        assert(r.getAs[Long]("qfLong") == qfl)
    }
  }

  test("testFullOnTopNBoundFilterAndLongSumMetric (TopNQueryRunnerTest" +
      ".java:5607): an exclusive numeric bound below the data's minimum " +
      "index excludes every row — empty result") {
    val rows = run(
      """{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": {"type": "default", "dimension": "market", "outputName": "Market"},
        "metric": "Count",
        "threshold": 5,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "filter": {"type": "bound", "dimension": "index",
                   "lower": "0", "upper": "46.64980229268867",
                   "lowerStrict": true, "upperStrict": true,
                   "ordering": "numeric"},
        "aggregations": [{"type": "longSum", "name": "Count", "fieldName": "qualityLong"}]
      }""").collect()
    assert(rows.isEmpty, s"got:\n${rows.mkString("\n")}")
  }

  // ----------------------------------------------------------- groupBy

  test("testGroupByWithNoResult (GroupByQueryRunnerTest.java:3528): an " +
      "empty interval with first/last and cardinality aggregators yields " +
      "no rows") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2020-04-02T00:00:00.000Z/P1D"],
        "dimensions": [{"type": "default", "dimension": "market", "outputName": "market"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "index", "fieldName": "index"},
          {"type": "cardinality", "name": "qualityCardinality", "fields": ["quality"]},
          {"type": "longFirst", "name": "first", "fieldName": "index"},
          {"type": "longLast", "name": "last", "fieldName": "index"}
        ]
      }""").collect()
    assert(rows.isEmpty, s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByWithRegEx (GroupByQueryRunnerTest.java:5464): a regex " +
      "filter on quality under P1M granularity — 2 automotive rows bucketed " +
      "at 2011-04-01") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": {"type": "period", "period": "P1M"},
        "intervals": ["2011-04-02T00:00:00.000Z/2011-04-04T00:00:00.000Z"],
        "filter": {"type": "regex", "dimension": "quality", "pattern": "auto.*"},
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "quality"}],
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString,
        r.getAs[String]("quality"), r.getAs[Long]("rows"))).toSeq
    assert(rows == Seq(("2011-04-01", "automotive", 2L)), s"got $rows")
  }

  test("testGroupByWithNonexistentDimension (GroupByQueryRunnerTest.java:5485): " +
      "a missing LEADING dimension groups as a constant NULL column " +
      "alongside the real one") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": {"type": "period", "period": "P1M"},
        "intervals": ["2011-04-02T00:00:00.000Z/2011-04-04T00:00:00.000Z"],
        "dimensions": [
          {"type": "default", "dimension": "billy", "outputName": "billy"},
          {"type": "default", "dimension": "quality", "outputName": "quality"}
        ],
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
      .map(r => (Option(r.getAs[String]("billy")), r.getAs[String]("quality"),
        r.getAs[Long]("rows")))
      .sortBy(_._2)
    assert(rows.toSeq == Seq(
      (None, "automotive", 2L), (None, "business", 2L), (None, "entertainment", 2L),
      (None, "health", 2L), (None, "mezzanine", 6L), (None, "news", 2L),
      (None, "premium", 6L), (None, "technology", 2L), (None, "travel", 2L)),
      s"got:\n${rows.mkString("\n")}")
  }
}
