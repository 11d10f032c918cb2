package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 5 over the shared TestIndex fixture
  * ([[TestIndexFixture]]): TopNQueryRunnerTest.java depth — empty intervals,
  * hyperUnique over a missing column, first/last aggregators as the ranking
  * metric (long and float32 storage), ranking by uniques, inverted numeric
  * metric, chained dependent post-aggregators, null and partially-null
  * dimensions, __time as a LONG dimension, dimension-metric sort over a
  * re-typed numeric column without aggregators, and a cardinality ranking
  * metric. Each test cites its reference method and asserts the reference's
  * published result vectors (doubles at the reference's own 1e-6 relative
  * tolerance; float32 values exactly via Float→double widening).
  */
class QueryRunnerGoldenSpec5 extends SparkSpecBase {

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

  private val AddRowsIndexConstant =
    """{"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
        "fields": [
          {"type": "fieldAccess", "fieldName": "rows"},
          {"type": "fieldAccess", "fieldName": "index"},
          {"type": "constant", "value": 1}]}"""

  test("testEmptyTopN (TopNQueryRunnerTest.java:277): an interval past all " +
      "data yields an empty topN result") {
    val rows = run(
      s"""{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": "market",
        "metric": "index",
        "threshold": 4,
        "intervals": ["2020-04-02T00:00:00.000Z/P1D"],
        "aggregations": [$CommonAggs,
          {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
          {"type": "doubleMin", "name": "minIndex", "fieldName": "index"},
          {"type": "doubleFirst", "name": "first", "fieldName": "index"}],
        "postAggregations": [$AddRowsIndexConstant]
      }""").collect()
    assert(rows.isEmpty, s"got:\n${rows.mkString("\n")}")
  }

  test("testTopNOverMissingUniques (TopNQueryRunnerTest.java:634): " +
      "hyperUnique over a NONEXISTENT column estimates 0.0 for every " +
      "dimension value") {
    val rows = run(
      """{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": "market",
        "metric": "uniques",
        "threshold": 3,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "aggregations": [
          {"type": "hyperUnique", "name": "uniques", "fieldName": "missingUniques"}]
      }""").collect()
      .map(r => (r.getAs[String]("market"), dbl(r, "uniques"))).toSeq
    assert(rows == Seq(("spot", 0.0), ("total_market", 0.0), ("upfront", 0.0)),
      s"got:\n${rows.mkString("\n")}")
  }

  test("testTopNOverFirstLastAggregator (TopNQueryRunnerTest.java:819): " +
      "longFirst/longLast per MONTH rank by the 'last' metric — truncating " +
      "long reads of the float32 index, ties by time broken in encounter order") {
    val rows = run(
      """{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "month",
        "dimension": "market",
        "metric": "last",
        "threshold": 3,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "aggregations": [
          {"type": "longFirst", "name": "first", "fieldName": "index"},
          {"type": "longLast", "name": "last", "fieldName": "index"}]
      }""").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString,
        r.getAs[String]("market"), r.getAs[Long]("first"), r.getAs[Long]("last")))
      .toSeq
    val expected = Seq(
      ("2011-01-01", "total_market", 1000L, 1127L),
      ("2011-01-01", "upfront", 800L, 943L),
      ("2011-01-01", "spot", 100L, 155L),
      ("2011-02-01", "total_market", 1203L, 1292L),
      ("2011-02-01", "upfront", 1667L, 1101L),
      ("2011-02-01", "spot", 132L, 114L),
      ("2011-03-01", "total_market", 1124L, 1366L),
      ("2011-03-01", "upfront", 1166L, 1063L),
      ("2011-03-01", "spot", 153L, 125L),
      ("2011-04-01", "total_market", 1314L, 1029L),
      ("2011-04-01", "upfront", 1447L, 780L),
      ("2011-04-01", "spot", 135L, 120L))
    assert(rows == expected, s"got:\n${rows.mkString("\n")}")
  }

  test("testTopNOverFirstLastFloatAggregatorUsingFloatColumn " +
      "(TopNQueryRunnerTest.java:1010): floatFirst/floatLast keep the " +
      "float32 storage values exactly") {
    val rows = run(
      """{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "month",
        "dimension": "market",
        "metric": "last",
        "threshold": 3,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "aggregations": [
          {"type": "floatFirst", "name": "first", "fieldName": "index"},
          {"type": "floatLast", "name": "last", "fieldName": "index"}]
      }""").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString,
        r.getAs[String]("market"), dbl(r, "first"), dbl(r, "last")))
    val janFeb = Seq(
      ("2011-01-01", "total_market", 1000f, 1127.23095703125f),
      ("2011-01-01", "upfront", 800f, 943.4971923828125f),
      ("2011-01-01", "spot", 100f, 155.7449493408203f),
      ("2011-02-01", "total_market", 1203.4656f, 1292.5428466796875f),
      ("2011-02-01", "upfront", 1667.497802734375f, 1101.918212890625f),
      ("2011-02-01", "spot", 132.123779296875f, 114.2845687866211f))
    assert(rows.length == 12)
    rows.take(6).zip(janFeb).foreach { case (g, (d, m, f, l)) =>
      assert(g._1 == d && g._2 == m, s"row: $g")
      assert(g._3 == f.toDouble, s"$d $m first: $g")
      assert(g._4 == l.toDouble, s"$d $m last: $g")
    }
  }

  test("testTopNByUniques (TopNQueryRunnerTest.java:1281): ranking by the " +
      "uniques estimate — spot's 9 first, the 2-estimate tie in dimension " +
      "order") {
    val rows = run(
      s"""{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": "market",
        "metric": {"type": "numeric", "metric": "uniques"},
        "threshold": 4,
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "aggregations": [$CommonAggs],
        "postAggregations": [$AddRowsIndexConstant]
      }""").collect()
    val expected = Seq(
      ("spot", 18L, 2231.876812d, 2250.876812d, TestIndexFixture.Uniques9),
      ("total_market", 4L, 5351.814783d, 5356.814783d, TestIndexFixture.Uniques2),
      ("upfront", 4L, 4875.669692d, 4880.669692d, TestIndexFixture.Uniques2))
    assert(rows.length == 3)
    rows.zip(expected).foreach { case (r, (m, n, i, arc, u)) =>
      assert(r.getAs[String]("market") == m, s"row: $r")
      assert(r.getAs[Long]("rows") == n)
      assert(relEq(dbl(r, "index"), i), s"$m index: $r")
      assert(relEq(dbl(r, "addRowsIndexConstant"), arc), s"$m arc: $r")
      assert(dbl(r, "uniques") == u, s"$m uniques: $r")
    }
  }

  test("testInvertedTopNQuery (TopNQueryRunnerTest.java:3391): inverted " +
      "numeric metric ranks ASCENDING by index sum") {
    val rows = run(
      s"""{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": "market",
        "metric": {"type": "inverted", "metric": {"type": "numeric", "metric": "index"}},
        "threshold": 3,
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "aggregations": [$CommonAggs],
        "postAggregations": [$AddRowsIndexConstant]
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[Long]("rows"))).toSeq
    assert(rows == Seq(("spot", 18L), ("upfront", 4L), ("total_market", 4L)),
      s"got:\n${rows.mkString("\n")}")
  }

  test("testTopNDependentPostAgg (TopNQueryRunnerTest.java:3537): a post-agg " +
      "referencing ANOTHER post-agg (dependentPostAgg = 1 + " +
      "addRowsIndexConstant + rows) ranks the result; the finalizing " +
      "arithmetic post-agg reads uniques + 1") {
    val rows = run(
      s"""{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": "market",
        "metric": "dependentPostAgg",
        "threshold": 4,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "aggregations": [$CommonAggs,
          {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
          {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}],
        "postAggregations": [$AddRowsIndexConstant,
          {"type": "arithmetic", "name": "dependentPostAgg", "fn": "+", "fields": [
            {"type": "constant", "value": 1},
            {"type": "fieldAccess", "fieldName": "addRowsIndexConstant"},
            {"type": "fieldAccess", "fieldName": "rows"}]},
          {"type": "arithmetic", "name": "hyperUniqueFinalizingPostAggMetric",
           "fn": "+", "fields": [
            {"type": "hyperUniqueCardinality", "fieldName": "uniques"},
            {"type": "constant", "value": 1}]}]
      }""").collect()
    val expected = Seq(
      ("total_market", 186L, 215679.82879638672d, 215866.82879638672d,
        216053.82879638672d, TestIndexFixture.Uniques2, 1743.92175d, 792.3260498046875d),
      ("upfront", 186L, 192046.1060180664d, 192233.1060180664d,
        192420.1060180664d, TestIndexFixture.Uniques2, 1870.061029d, 545.9906005859375d),
      ("spot", 837L, 95606.57232284546d, 96444.57232284546d,
        97282.57232284546d, TestIndexFixture.Uniques9, 277.273533d, 59.02102279663086d))
    assert(rows.length == 3)
    rows.zip(expected).foreach { case (r, (m, n, i, arc, dep, u, mx, mn)) =>
      assert(r.getAs[String]("market") == m, s"row: $r")
      assert(r.getAs[Long]("rows") == n)
      assert(relEq(dbl(r, "index"), i), s"$m index: $r")
      assert(relEq(dbl(r, "addRowsIndexConstant"), arc), s"$m arc: $r")
      assert(relEq(dbl(r, "dependentPostAgg"), dep), s"$m dep: $r")
      assert(dbl(r, "uniques") == u)
      assert(dbl(r, "hyperUniqueFinalizingPostAggMetric") == u + 1.0, s"$m hufin: $r")
      assert(relEq(dbl(r, "maxIndex"), mx), s"$m max: $r")
      assert(relEq(dbl(r, "minIndex"), mn), s"$m min: $r")
    }
  }

  test("testTopNOverNullDimension (TopNQueryRunnerTest.java:3801): topN over " +
      "a NONEXISTENT dimension yields the single all-null group with full " +
      "totals") {
    val rows = run(
      s"""{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": "null_column",
        "metric": "index",
        "threshold": 4,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "aggregations": [$CommonAggs,
          {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
          {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}],
        "postAggregations": [$AddRowsIndexConstant]
      }""").collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.isNullAt(r.fieldIndex("null_column")))
    assert(r.getAs[Long]("rows") == 1209L)
    assert(relEq(dbl(r, "index"), 503332.5071372986d), s"index: $r")
    assert(relEq(dbl(r, "addRowsIndexConstant"), 504542.5071372986d))
    assert(dbl(r, "uniques") == TestIndexFixture.Uniques9)
    assert(relEq(dbl(r, "maxIndex"), 1870.061029d))
    assert(relEq(dbl(r, "minIndex"), 59.02102279663086d))
  }

  test("testTopNOverPartialNullDimension (TopNQueryRunnerTest.java:3891): a " +
      "dimension with real nulls keeps the null group as a row — 22 null " +
      "rows vs 4 'value' rows, ranked by uniques") {
    val rows = run(
      s"""{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": "partial_null_column",
        "metric": "uniques",
        "threshold": 1000,
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "aggregations": [$CommonAggs]
      }""").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("partial_null_column")))
    assert(rows(0).getAs[Long]("rows") == 22L)
    assert(relEq(dbl(rows(0), "index"), 7583.691513061523d))
    assert(dbl(rows(0), "uniques") == TestIndexFixture.Uniques9)
    assert(rows(1).getAs[String]("partial_null_column") == "value")
    assert(rows(1).getAs[Long]("rows") == 4L)
    assert(relEq(dbl(rows(1), "index"), 4875.669692d))
    assert(dbl(rows(1), "uniques") == TestIndexFixture.Uniques2)
  }

  test("testTopNOverPartialNullDimensionWithFilterOnNullValue " +
      "(TopNQueryRunnerTest.java:3931): selector null over the partially-" +
      "null dimension keeps only the null group") {
    val rows = run(
      s"""{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": "partial_null_column",
        "metric": "uniques",
        "threshold": 1000,
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "selector", "dimension": "partial_null_column", "value": null},
        "aggregations": [$CommonAggs]
      }""").collect()
    assert(rows.length == 1)
    assert(rows(0).isNullAt(rows(0).fieldIndex("partial_null_column")))
    assert(rows(0).getAs[Long]("rows") == 22L)
    assert(relEq(dbl(rows(0), "index"), 7583.691513061523d))
    assert(dbl(rows(0), "uniques") == TestIndexFixture.Uniques9)
  }

  test("testFullOnTopNLongTimeColumn (TopNQueryRunnerTest.java:4964): __time " +
      "as a LONG dimension ranks the 13-row days by maxIndex — epoch-millis " +
      "dimension values") {
    val rows = run(
      s"""{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": {"type": "default", "dimension": "__time",
                      "outputName": "time_alias", "outputType": "LONG"},
        "metric": "maxIndex",
        "threshold": 4,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "aggregations": [$CommonAggs,
          {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
          {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}],
        "postAggregations": [$AddRowsIndexConstant]
      }""").collect()
    val expected = Seq(
      (1296345600000L, 5497.331253051758d, 1870.061029d, 97.02391052246094d),
      (1298678400000L, 6541.463027954102d, 1862.737933d, 83.099365234375d),
      (1301529600000L, 6814.467971801758d, 1734.27490234375d, 93.39083862304688d),
      (1294876800000L, 6077.949111938477d, 1689.0128173828125d, 94.87471008300781d))
    assert(rows.length == 4)
    rows.zip(expected).foreach { case (r, (t, i, mx, mn)) =>
      assert(r.getAs[Long]("time_alias") == t, s"row: $r")
      assert(r.getAs[Long]("rows") == 13L)
      assert(relEq(dbl(r, "index"), i), s"$t index: $r")
      assert(relEq(dbl(r, "maxIndex"), mx), s"$t max: $r")
      assert(relEq(dbl(r, "minIndex"), mn), s"$t min: $r")
    }
  }

  test("testSortOnDoubleAsLong (TopNQueryRunnerTest.java:5039): an " +
      "aggregator-less topN over the float index re-typed LONG, ranked by " +
      "the numeric dimension comparator ascending — truncated long values") {
    val rows = run(
      """{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": {"type": "default", "dimension": "index",
                      "outputName": "index_alias", "outputType": "LONG"},
        "metric": {"type": "dimension", "ordering": "numeric"},
        "threshold": 4,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
      }""").collect()
    assert(rows.head.schema.fieldNames.toSeq == Seq("index_alias"))
    assert(rows.map(_.getAs[Long]("index_alias")).toSeq == Seq(59L, 67L, 68L, 69L))
  }

  test("testTopNQueryByComplexMetric (TopNQueryRunnerTest.java:3440): ranking " +
      "by a cardinality aggregator over the quality dimension reproduces the " +
      "reference's HLLC estimates exactly (UNIQUES_9 / UNIQUES_2)") {
    val rows = run(
      """{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": "market",
        "metric": {"type": "numeric", "metric": "numVals"},
        "threshold": 10,
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "aggregations": [
          {"type": "cardinality", "name": "numVals",
           "fields": [{"type": "default", "dimension": "quality",
                       "outputName": "quality"}], "byRow": false}]
      }""").collect()
      .map(r => (r.getAs[String]("market"), dbl(r, "numVals"))).toSeq
    assert(rows == Seq(
      ("spot", TestIndexFixture.Uniques9),
      ("total_market", TestIndexFixture.Uniques2),
      ("upfront", TestIndexFixture.Uniques2)), s"got:\n${rows.mkString("\n")}")
  }
}
