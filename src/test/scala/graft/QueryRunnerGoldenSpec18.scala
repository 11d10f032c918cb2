package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 18 over the shared TestIndex fixture: the FullOn
  * TopN tail — typed numeric dims ranked by metric aggregates, virtual
  * columns (LONG identity, string concat), ranking over a STRING post-agg,
  * ranking over hyperUnique (raw + expression post-agg + rounded),
  * list-filtered decorations on numeric/numeric-string dims, the all-nulls
  * extraction, __time with a string extraction, strlen-as-LONG outputs, the
  * extraction filter pair, numeric-null previousStop, and the non-bitmap
  * time-bound filter. Each test cites its reference method; double sums at
  * 1e-5 relative tolerance, HLLC uniques exact.
  */
class QueryRunnerGoldenSpec18 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)
  import TestIndexFixture.{Uniques1, Uniques2, Uniques9}

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def relEq(got: Double, exp: Double, tol: Double = 1e-5): Boolean =
    math.abs(got - exp) <= math.abs(exp) * tol

  private val FirstToThird =
    """["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]"""
  private val FullOn =
    """["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]"""

  private val CommonPlusMinMax = """[
      {"type": "count", "name": "rows"},
      {"type": "doubleSum", "name": "index", "fieldName": "index"},
      {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"},
      {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
      {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}]"""

  // the shared qualityLong/qualityFloat/qns FullOn vector (maxIndex-ranked):
  // (dimValue-as-long, rows, index, uniques, maxIndex, minIndex)
  private val QlFullOn = Seq(
    (1400L, 279L, 217725.41940800005, Uniques1, 1870.061029, 91.270553),
    (1600L, 279L, 210865.67977600006, Uniques1, 1862.737933, 99.284525),
    (1000L, 93L, 12270.807093, Uniques1, 277.273533, 71.315931),
    (1200L, 93L, 12086.472791, Uniques1, 193.787574, 84.710523))

  private def checkQl(df: DataFrame, alias: String,
      expected: Seq[(Long, Long, Double, Double, Double, Double)],
      dimOf: Row => Long): Unit = {
    val got = df.collect()
    assert(got.length == expected.length, got.mkString("\n"))
    got.zip(expected).foreach { case (r, (d, n, i, u, mx, mn)) =>
      assert(dimOf(r) == d, s"${dimOf(r)} vs $d")
      assert(r.getAs[Long]("rows") == n)
      assert(relEq(r.getAs[Double]("index"), i))
      assert(r.getAs[Double]("uniques") == u)
      assert(relEq(r.getAs[Double]("maxIndex"), mx))
      assert(relEq(r.getAs[Double]("minIndex"), mn))
    }
  }

  test("testFullOnTopNLongVirtualColumn (TopNQueryRunnerTest.java:4545): an " +
      "identity LONG virtual column ranked by maxIndex") {
    val df = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "virtualColumns": [{"type": "expression", "name": "ql_expr",
          "expression": "qualityLong", "outputType": "LONG"}],
        "dimension": {"type": "default", "dimension": "ql_expr",
          "outputName": "ql_alias", "outputType": "LONG"},
        "metric": {"type": "numeric", "metric": "maxIndex"},
        "threshold": 4,
        "aggregations": $CommonPlusMinMax
      }""")
    checkQl(df, "ql_alias", QlFullOn, _.getAs[Long]("ql_alias"))
  }

  test("testFullOnTopNFloatColumnAsString (TopNQueryRunnerTest.java:4401): " +
      "a bare float dim renders its STRING form ('14000.0') and ranks by " +
      "maxIndex") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": {"type": "default", "dimension": "qualityFloat",
          "outputName": "qf_alias"},
        "metric": {"type": "numeric", "metric": "maxIndex"},
        "threshold": 4,
        "aggregations": $CommonPlusMinMax
      }""").collect()
      .map(r => (r.getAs[String]("qf_alias"), r.getAs[Long]("rows"))).toSeq
    assert(got == Seq(("14000.0", 279L), ("16000.0", 279L), ("10000.0", 93L),
      ("12000.0", 93L)), got.mkString(","))
  }

  test("testFullOnTopNNumericStringColumnWithDecoration (:5370) / " +
      "testFullOnTopNDecorationOnNumeric (:5439) (TopNQueryRunnerTest): " +
      "listFiltered decorations over LONG-typed numeric-string and numeric " +
      "dims — the whitelist drops a group, the survivors keep full " +
      "aggregates") {
    val df = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": {"type": "listFiltered",
          "delegate": {"type": "default", "dimension": "qualityNumericString",
            "outputName": "qns_alias", "outputType": "LONG"},
          "values": ["120000", "140000", "160000"]},
        "metric": {"type": "numeric", "metric": "maxIndex"},
        "threshold": 4,
        "aggregations": $CommonPlusMinMax
      }""")
    checkQl(df, "qns_alias", Seq(
      (140000L, 279L, 217725.41940800005, Uniques1, 1870.061029, 91.270553),
      (160000L, 279L, 210865.67977600006, Uniques1, 1862.737933, 99.284525),
      (120000L, 93L, 12086.472791, Uniques1, 193.787574, 84.710523)),
      _.getAs[Long]("qns_alias"))
    val df2 = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": {"type": "listFiltered",
          "delegate": {"type": "default", "dimension": "qualityLong",
            "outputName": "ql_alias", "outputType": "LONG"},
          "values": ["1200", "1400", "1600"]},
        "metric": {"type": "numeric", "metric": "maxIndex"},
        "threshold": 4,
        "aggregations": $CommonPlusMinMax
      }""")
    checkQl(df2, "ql_alias", Seq(
      (1400L, 279L, 217725.41940800005, Uniques1, 1870.061029, 91.270553),
      (1600L, 279L, 210865.67977600006, Uniques1, 1862.737933, 99.284525),
      (1200L, 93L, 12086.472791, Uniques1, 193.787574, 84.710523)),
      _.getAs[Long]("ql_alias"))
  }

  test("testFullOnTopNStringOutputAsLong (TopNQueryRunnerTest.java:5296): " +
      "strlen extraction with LONG outputType ranked by maxIndex — " +
      "9 (mezzanine), 7 (premium) lead") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": {"type": "extraction", "dimension": "quality",
          "outputName": "alias", "outputType": "LONG",
          "extractionFn": {"type": "strlen"}},
        "metric": {"type": "numeric", "metric": "maxIndex"},
        "threshold": 4,
        "aggregations": $CommonPlusMinMax
      }""").collect()
      .map(r => (r.getAs[Long]("alias"), r.getAs[Long]("rows"),
        r.getAs[Double]("index"))).toSeq
    assert(got.map(_._1) == Seq(9L, 7L, 10L, 13L), got.mkString(","))
    assert(got.map(_._2) == Seq(279L, 279L, 186L, 93L))
    assert(relEq(got(0)._3, 217725.41940800005) && relEq(got(1)._3, 210865.67977600006),
      got.mkString(","))
  }

  test("testFullOnTopNLongTimeColumnWithExFn (TopNQueryRunnerTest.java:5168): " +
      "a string extraction over __time sees the epoch-millis LONG — " +
      "'super-1296345600000' groups rank by maxIndex") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": {"type": "extraction", "dimension": "__time",
          "outputName": "time_alias",
          "extractionFn": {"type": "stringFormat", "format": "super-%s"}},
        "metric": {"type": "numeric", "metric": "maxIndex"},
        "threshold": 4,
        "aggregations": $CommonPlusMinMax
      }""").collect()
      .map(r => (r.getAs[String]("time_alias"), r.getAs[Long]("rows"),
        r.getAs[Double]("index"))).toSeq
    assert(got.map(_._1) == Seq("super-1296345600000", "super-1298678400000",
      "super-1301529600000", "super-1294876800000"), got.mkString(","))
    assert(got.map(_._2) == Seq(13L, 13L, 13L, 13L))
    assert(relEq(got(0)._3, 5497.331253051758) && relEq(got(1)._3, 6541.463027954102) &&
      relEq(got(2)._3, 6814.467971801758) && relEq(got(3)._3, 6077.949111938477),
      got.mkString(","))
  }

  test("testFullOnTopNDimExtractionAllNulls (TopNQueryRunnerTest.java:5243): " +
      "an all-null-producing extraction collapses everything into one null " +
      "group (the reference's javascript null fn as a never-matching regex)") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": {"type": "extraction", "dimension": "market",
          "outputName": "market",
          "extractionFn": {"type": "regex", "expr": "^(xyzzy)$$",
            "replaceMissingValue": true}},
        "metric": {"type": "numeric", "metric": "index"},
        "threshold": 4,
        "aggregations": $CommonPlusMinMax
      }""").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("market") == null)
    assert(r.getAs[Long]("rows") == 1209L)
    assert(relEq(r.getAs[Double]("index"), 503332.5071372986))
    assert(r.getAs[Double]("uniques") == Uniques9)
  }

  test("testFullOnTopNOverPostAggsOnDimension (TopNQueryRunnerTest.java:501): " +
      "ranking on a STRING expression post-agg (market + 'x') — " +
      "lexicographic descending") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": "market",
        "metric": {"type": "numeric", "metric": "dimPostAgg"},
        "threshold": 4,
        "aggregations": $CommonPlusMinMax,
        "postAggregations": [{"type": "expression", "name": "dimPostAgg",
          "expression": "market + 'x'"}]
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[String]("dimPostAgg"),
        r.getAs[Long]("rows"))).toSeq
    assert(got == Seq(("upfront", "upfrontx", 186L),
      ("total_market", "total_marketx", 186L), ("spot", "spotx", 837L)),
      got.mkString(","))
  }

  test("testFullOnTopNOverUniques (TopNQueryRunnerTest.java:571): ranking " +
      "by the hyperUnique estimate — spot(9) first, tie 2-2 broken by dim") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": "market",
        "metric": {"type": "numeric", "metric": "uniques"},
        "threshold": 3,
        "aggregations": $CommonPlusMinMax
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[Long]("rows"),
        r.getAs[Double]("uniques"))).toSeq
    assert(got == Seq(("spot", 837L, Uniques9), ("total_market", 186L, Uniques2),
      ("upfront", 186L, Uniques2)), got.mkString(","))
  }

  test("testTopNOverHyperUniqueExpression (:717) / " +
      "testTopNOverHyperUniqueExpressionRounded (:771) (TopNQueryRunnerTest): " +
      "an expression post-agg over the finalized estimate " +
      "(uniques + 1), fractional and rounded") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": "market",
        "metric": {"type": "numeric", "metric": "hyperUniqueFinalizingPostAggMetric"},
        "threshold": 3,
        "aggregations": [{"type": "hyperUnique", "name": "uniques",
          "fieldName": "quality_uniques"}],
        "postAggregations": [{"type": "expression",
          "name": "hyperUniqueFinalizingPostAggMetric",
          "expression": "uniques + 1"}]
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[Double]("uniques"),
        r.getAs[Double]("hyperUniqueFinalizingPostAggMetric"))).toSeq
    assert(got == Seq(
      ("spot", Uniques9, Uniques9 + 1),
      ("total_market", Uniques2, Uniques2 + 1),
      ("upfront", Uniques2, Uniques2 + 1)), got.mkString(","))

    val rounded = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": "market",
        "metric": {"type": "numeric", "metric": "hyperUniqueFinalizingPostAggMetric"},
        "threshold": 3,
        "aggregations": [{"type": "hyperUnique", "name": "uniques",
          "fieldName": "quality_uniques", "round": true}],
        "postAggregations": [{"type": "expression",
          "name": "hyperUniqueFinalizingPostAggMetric",
          "expression": "uniques + 1"}]
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[Long]("uniques"),
        r.getAs[Long]("hyperUniqueFinalizingPostAggMetric"))).toSeq
    assert(rounded == Seq(("spot", 9L, 10L), ("total_market", 2L, 3L),
      ("upfront", 2L, 3L)), rounded.mkString(","))
  }

  test("testTopNStringVirtualColumn (TopNQueryRunnerTest.java:4618): a " +
      "string concat virtual column as the ranked dimension") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "virtualColumns": [{"type": "expression", "name": "vc",
          "expression": "market + ' ' + market", "outputType": "STRING"}],
        "dimension": "vc",
        "metric": {"type": "numeric", "metric": "rows"},
        "threshold": 4,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"}]
      }""").collect()
      .map(r => (r.getAs[String]("vc"), r.getAs[Long]("rows"))).toSeq
    assert(got == Seq(("spot spot", 18L), ("total_market total_market", 4L),
      ("upfront upfront", 4L)), got.mkString(","))
  }

  test("testNumericDimensionTopNWithNullPreviousStop (TopNQueryRunnerTest" +
      ".java:4034): numeric dimension ordering with a NULL previousStop " +
      "pages from the start") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimension": "market",
        "metric": {"type": "dimension", "ordering": "numeric",
          "previousStop": null},
        "threshold": 2,
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[Long]("rows"))).toSeq
    assert(got == Seq(("spot", 9L), ("total_market", 2L)), got.mkString(","))
  }

  test("testTopNWithExtractionFilter (TopNQueryRunnerTest.java:4074): an " +
      "extraction filter (lookup spot→spot0) keeps only the mapped rows") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimension": "market",
        "metric": {"type": "numeric", "metric": "rows"},
        "threshold": 3,
        "filter": {"type": "extraction", "dimension": "market",
          "value": "spot0",
          "extractionFn": {"type": "lookup", "lookup": {"type": "map",
            "map": {"spot": "spot0"}}, "retainMissingValue": false,
            "injective": true}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}]
      }""").collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("market") == "spot")
    assert(got.head.getAs[Long]("rows") == 18L)
    assert(relEq(got.head.getAs[Double]("index"), 2231.876812))
    assert(got.head.getAs[Double]("uniques") == Uniques9)
  }

  test("testTopNWithExtractionFilterNoExistingValue (:4189) / ...AndFiltered" +
      "AggregatorCaseNoExistingValue context (TopNQueryRunnerTest): a " +
      "replace-missing extraction filter over the absent column keeps " +
      "every row, and a FILTERED aggregator under the same filter " +
      "aggregates everything") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": "null_column",
        "metric": {"type": "numeric", "metric": "index"},
        "threshold": 4,
        "filter": {"type": "extraction", "dimension": "null_column",
          "value": "NULL",
          "extractionFn": {"type": "lookup", "lookup": {"type": "map",
            "map": {}}, "retainMissingValue": false,
            "replaceMissingValueWith": "NULL"}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"},
          {"type": "filtered",
           "filter": {"type": "extraction", "dimension": "null_column",
             "value": "NULL",
             "extractionFn": {"type": "lookup", "lookup": {"type": "map",
               "map": {}}, "retainMissingValue": false,
               "replaceMissingValueWith": "NULL"}},
           "aggregator": {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"}},
          {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}]
      }""").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("null_column") == null)
    assert(r.getAs[Long]("rows") == 1209L)
    assert(relEq(r.getAs[Double]("index"), 503332.5071372986))
    assert(r.getAs[Double]("uniques") == Uniques9)
    assert(relEq(r.getAs[Double]("maxIndex"), 1870.061029))
    assert(relEq(r.getAs[Double]("minIndex"), 59.02102279663086))
  }

  test("testTopNWithNonBitmapFilter (TopNQueryRunnerTest.java:5643): a " +
      "numeric bound on __time executes (0 < millis < Long.MAX_VALUE keeps " +
      "everything); ranked by a doubleSum over qualityDouble") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimension": "market",
        "metric": {"type": "numeric", "metric": "count"},
        "threshold": 4,
        "filter": {"type": "bound", "dimension": "__time",
          "lower": "0", "upper": "9223372036854775807",
          "lowerStrict": true, "upperStrict": true, "ordering": "numeric"},
        "aggregations": [{"type": "doubleSum", "name": "count",
          "fieldName": "qualityDouble"}]
      }""").collect()
    assert(got.length == 3)
    assert(got.map(_.getAs[String]("market")).toSet ==
      Set("spot", "total_market", "upfront"))
  }

  test("testFullOnTopNFloatColumnWithExFn (TopNQueryRunnerTest.java:4326): a " +
      "string extraction over the double index column ranked by index " +
      "(the reference's javascript renders 1000.0 as '1000'; stringFormat " +
      "keeps the column's own string form 'super-1000.0' — adaptation noted)") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": {"type": "extraction", "dimension": "index",
          "outputName": "index_alias",
          "extractionFn": {"type": "stringFormat", "format": "super-%s"}},
        "metric": {"type": "numeric", "metric": "index"},
        "threshold": 4,
        "aggregations": $CommonPlusMinMax
      }""").collect()
      .map(r => (r.getAs[String]("index_alias"), r.getAs[Long]("rows"),
        r.getAs[Double]("index"))).toSeq
    assert(got.map(_._1) == Seq("super-1000.0", "super-1870.061029",
      "super-1862.737933", "super-1743.92175"), got.mkString(","))
    assert(got.map(_._2) == Seq(2L, 1L, 1L, 1L))
    assert(relEq(got(0)._3, 2000.0) && relEq(got(1)._3, 1870.061029), got.mkString(","))
  }
}
