package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 17 over the shared TestIndex fixture: the TopN
  * dim-extraction tail — the FastTopN lookup rename variants (optimal /
  * unoptimal / replace-missing), the lexicographic namespace variants, the
  * regex-extraction previousStop quartet (plain + inverted), the null- and
  * empty-string-producing extraction fns, missing columns, the constant
  * time extraction, cardinality with extraction fns, __time as a metric
  * input, day-of-week time extraction, typed numeric-null dimensions, and
  * the expression-lambda aggregator pair. Each test cites its reference
  * method; the reference's JavaScript fns are expressed as stringFormat /
  * filtered-aggregator equivalents (javascript is a documented non-goal).
  */
class QueryRunnerGoldenSpec17 extends SparkSpecBase {

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

  private val CommonAggs = """[
      {"type": "count", "name": "rows"},
      {"type": "doubleSum", "name": "index", "fieldName": "index"},
      {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}]"""
  private val Aric = """[{"type": "arithmetic", "name": "addRowsIndexConstant",
      "fn": "+", "fields": [
        {"type": "constant", "name": "const", "value": 1},
        {"type": "fieldAccess", "name": "rows", "fieldName": "rows"},
        {"type": "fieldAccess", "name": "index", "fieldName": "index"}]}]"""

  test("testTopNDimExtractionFastTopNOptimal (:2576) / " +
      "testTopNDimExtractionFastTopNUnOptimal (:2640) / " +
      "testTopNDimExtractionFastTopNOptimalWithReplaceMissing (:2447) / " +
      "testTopNDimExtractionFastTopNUnOptimalWithReplaceMissing (:2511) " +
      "(TopNQueryRunnerTest): lookup-renamed markets rank by rows " +
      "under every injective/replace-missing flag combination") {
    for (flags <- Seq(
        """"retainMissingValue": false, "replaceMissingValueWith": "MISSING", "injective": true""",
        """"retainMissingValue": false, "replaceMissingValueWith": "MISSING", "injective": false""",
        """"retainMissingValue": true, "injective": true""",
        """"retainMissingValue": true, "injective": false""")) {
      val got = run(s"""{
          "queryType": "topN", "dataSource": "testIndex",
          "granularity": "all", "intervals": $FirstToThird,
          "dimension": {"type": "extraction", "dimension": "market",
            "outputName": "market",
            "extractionFn": {"type": "lookup", "lookup": {"type": "map",
              "map": {"spot": "2spot0", "total_market": "1total_market0",
                      "upfront": "3upfront0"}}, $flags}},
          "metric": {"type": "numeric", "metric": "rows"},
          "threshold": 4,
          "aggregations": $CommonAggs,
          "postAggregations": $Aric
        }""").collect()
        .map(r => (r.getAs[String]("market"), r.getAs[Long]("rows"),
          r.getAs[Double]("uniques"))).toSeq
      assert(got == Seq(("2spot0", 18L, Uniques9), ("1total_market0", 4L, Uniques2),
        ("3upfront0", 4L, Uniques2)), s"flags=$flags: ${got.mkString(",")}")
    }
  }

  test("testTopNLexicographicDimExtractionOptimalNamespace (:2706) / " +
      "testTopNLexicographicDimExtractionUnOptimalNamespace (:2772) / " +
      "testTopNLexicographicDimExtractionOptimalNamespaceWithRunner (:2839) " +
      "(TopNQueryRunnerTest): lexicographic rank ON the renamed values — " +
      "1total_market, 2spot, 3upfront") {
    for (injective <- Seq(true, false)) {
      val got = run(s"""{
          "queryType": "topN", "dataSource": "testIndex",
          "granularity": "all", "intervals": $FirstToThird,
          "dimension": {"type": "extraction", "dimension": "market",
            "outputName": "market",
            "extractionFn": {"type": "lookup", "lookup": {"type": "map",
              "map": {"spot": "2spot", "total_market": "1total_market",
                      "upfront": "3upfront"}},
              "retainMissingValue": true, "injective": $injective}},
          "metric": {"type": "dimension", "ordering": "lexicographic"},
          "threshold": 4,
          "aggregations": $CommonAggs,
          "postAggregations": $Aric
        }""").collect()
        .map(r => (r.getAs[String]("market"), r.getAs[Long]("rows"),
          r.getAs[Double]("index"))).toSeq
      assert(got.map(_._1) == Seq("1total_market", "2spot", "3upfront"))
      assert(got.map(_._2) == Seq(4L, 18L, 4L))
      assert(relEq(got(0)._3, 5351.814783) && relEq(got(1)._3, 2231.876812) &&
        relEq(got(2)._3, 4875.669692), got.mkString(","))
    }
  }

  test("testTopNLexicographicDimExtraction (:2905) / " +
      "testInvertedTopNLexicographicDimExtraction2 (:2963) " +
      "(TopNQueryRunnerTest): regex " +
      "first-char / third-char extraction ranked both directions") {
    def q(expr: String, metric: String): Seq[String] = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimension": {"type": "extraction", "dimension": "market",
          "outputName": "market",
          "extractionFn": {"type": "regex", "expr": "$expr"}},
        "metric": $metric,
        "threshold": 4,
        "aggregations": $CommonAggs
      }""").collect().map(_.getAs[String]("market")).toSeq
    assert(q("(.)", """{"type": "dimension", "ordering": "lexicographic"}""")
      == Seq("s", "t", "u"))
    assert(q("..(.)", """{"type": "inverted", "metric":
        {"type": "dimension", "ordering": "lexicographic"}}""")
      == Seq("t", "o", "f"))
  }

  test("testTopNLexicographicDimExtractionWithPreviousStop (:3000) / " +
      "testTopNLexicographicDimExtractionWithSortingPreservedAndPreviousStop " +
      "(:3040) / testInvertedTopNLexicographicDimExtractionWithPreviousStop " +
      "(:3080) / testInvertedTopNLexicographicDimExtractionWithPreviousStop2 " +
      "(:3120) (TopNQueryRunnerTest): previousStop " +
      "pagination over extracted values, both directions") {
    def q(expr: String, metric: String): Seq[String] = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimension": {"type": "extraction", "dimension": "market",
          "outputName": "market",
          "extractionFn": {"type": "regex", "expr": "$expr"}},
        "metric": $metric,
        "threshold": 4,
        "aggregations": $CommonAggs
      }""").collect().map(_.getAs[String]("market")).toSeq
    assert(q("(.)", """{"type": "dimension", "ordering": "lexicographic",
        "previousStop": "s"}""") == Seq("t", "u"))
    assert(q("(.)", """{"type": "inverted", "metric": {"type": "dimension",
        "ordering": "lexicographic", "previousStop": "u"}}""") == Seq("t", "s"))
    assert(q("..(.)", """{"type": "inverted", "metric": {"type": "dimension",
        "ordering": "lexicographic", "previousStop": "p"}}""") == Seq("o", "f"))
  }

  test("testTopNWithNullProducingDimExtractionFn (TopNQueryRunnerTest.java:" +
      "3221): an extraction mapping total_market to NULL ranks the null " +
      "group between spot and upfront (rows tie, nulls-first dim break)") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimension": {"type": "extraction", "dimension": "market",
          "outputName": "market",
          "extractionFn": {"type": "regex", "expr": "^((?!total_market$$).*)$$",
            "replaceMissingValue": true}},
        "metric": {"type": "numeric", "metric": "rows"},
        "threshold": 4,
        "aggregations": $CommonAggs,
        "postAggregations": $Aric
      }""").collect()
      .map(r => (Option(r.getAs[String]("market")), r.getAs[Long]("rows"),
        r.getAs[Double]("index"))).toSeq
    assert(got.map(_._1) == Seq(Some("spot"), None, Some("upfront")), got.mkString(","))
    assert(got.map(_._2) == Seq(18L, 4L, 4L))
    assert(relEq(got(1)._3, 5351.814783), got(1)._3.toString)
  }

  test("testTopNWithEmptyStringProducingDimExtractionFn (TopNQueryRunnerTest" +
      ".java:3309): total_market extracted to EMPTY STRING — '' is a real " +
      "group distinct from null") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimension": {"type": "extraction", "dimension": "market",
          "outputName": "market",
          "extractionFn": {"type": "lookup", "lookup": {"type": "map",
            "map": {"total_market": ""}}, "retainMissingValue": true}},
        "metric": {"type": "numeric", "metric": "rows"},
        "threshold": 4,
        "aggregations": $CommonAggs,
        "postAggregations": $Aric
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[Long]("rows"))).toSeq
    assert(got == Seq(("spot", 18L), ("", 4L), ("upfront", 4L)), got.mkString(","))
  }

  test("testTopNOnMissingColumn (:383) / WithExtractionFn (:409) (TopNQuery" +
      "RunnerTest): a nonexistent ranked column groups null (or its " +
      "constant extraction) over all 1209 rows") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": {"type": "default", "dimension": "nonexistentColumn",
          "outputName": "alias"},
        "metric": {"type": "numeric", "metric": "rows"},
        "threshold": 4,
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("alias") == null)
    assert(got.head.getAs[Long]("rows") == 1209L)
    val got2 = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": {"type": "extraction", "dimension": "nonexistentColumn",
          "outputName": "alias",
          "extractionFn": {"type": "stringFormat", "format": "theValue"}},
        "metric": {"type": "numeric", "metric": "rows"},
        "threshold": 4,
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
    assert(got2.length == 1)
    assert(got2.head.getAs[String]("alias") == "theValue")
    assert(got2.head.getAs[Long]("rows") == 1209L)
  }

  test("testTopNDimExtractionTimeToOneLong (TopNQueryRunnerTest.java:2240): " +
      "a constant '42' extraction over __time with LONG outputType merges " +
      "everything into t=42") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": {"type": "extraction", "dimension": "__time",
          "outputName": "t", "outputType": "LONG",
          "extractionFn": {"type": "stringFormat", "format": "42"}},
        "metric": {"type": "numeric", "metric": "rows"},
        "threshold": 10,
        "aggregations": $CommonAggs,
        "postAggregations": $Aric
      }""").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("t") == 42L)
    assert(r.getAs[Long]("rows") == 1209L)
    assert(relEq(r.getAs[Double]("index"), 503332.5071372986))
    assert(r.getAs[Double]("uniques") == Uniques9)
  }

  test("testTopNDimExtractionNoAggregators (TopNQueryRunnerTest.java:2408): " +
      "aggregator-less extraction topN emits the bare extracted values") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimension": {"type": "extraction", "dimension": "market",
          "outputName": "market",
          "extractionFn": {"type": "regex", "expr": "(.)"}},
        "metric": {"type": "lexicographic"},
        "threshold": 4
      }""").collect().map(_.getAs[String]("market")).toSeq
    assert(got == Seq("s", "t", "u"), got.mkString(","))
  }

  test("testTopNQueryCardinalityAggregatorWithExtractionFn (TopNQueryRunner" +
      "Test.java:3488): constant extraction on BOTH the ranked dim and the " +
      "cardinality field — one 'hello' group, numVals = UNIQUES_1") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimension": {"type": "extraction", "dimension": "market",
          "outputName": "market",
          "extractionFn": {"type": "stringFormat", "format": "hello"}},
        "metric": {"type": "numeric", "metric": "numVals"},
        "threshold": 10,
        "aggregations": [{"type": "cardinality", "name": "numVals",
          "fields": [{"type": "extraction", "dimension": "quality",
            "outputName": "quality",
            "extractionFn": {"type": "stringFormat", "format": "hello"}}],
          "byRow": false}]
      }""").collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("market") == "hello")
    assert(got.head.getAs[Double]("numVals") == Uniques1,
      got.head.getAs[Double]("numVals").toString)
  }

  test("testTopNWithTimeColumn (TopNQueryRunnerTest.java:3698): __time as a " +
      "longSum input is epoch millis; the reference's javascript day-2 " +
      "predicate as a filtered count ranks the markets") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimension": "market",
        "metric": {"type": "numeric", "metric": "ntimestamps"},
        "threshold": 3,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "filtered",
           "filter": {"type": "bound", "dimension": "__time",
             "lower": "1301702400000", "ordering": "numeric"},
           "aggregator": {"type": "count", "name": "ntimestamps"}},
          {"type": "longSum", "name": "sumtime", "fieldName": "__time"}]
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[Long]("rows"),
        r.getAs[Long]("ntimestamps"), r.getAs[Long]("sumtime"))).toSeq
    assert(got == Seq(
      ("spot", 18L, 9L, 23429865600000L),
      ("total_market", 4L, 2L, 5206636800000L),
      ("upfront", 4L, 2L, 5206636800000L)), got.mkString("\n"))
  }

  test("testTopNTimeExtraction (TopNQueryRunnerTest.java:3754): day-of-week " +
      "EEEE extraction ranked by index — Wednesday then Thursday") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": {"type": "extraction", "dimension": "__time",
          "outputName": "dayOfWeek",
          "extractionFn": {"type": "timeFormat", "format": "EEEE"}},
        "metric": {"type": "numeric", "metric": "index"},
        "threshold": 2,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"}],
        "postAggregations": $Aric
      }""").collect()
      .map(r => (r.getAs[String]("dayOfWeek"), r.getAs[Long]("rows"),
        r.getAs[Double]("index"))).toSeq
    assert(got.map(t => (t._1, t._2)) == Seq(("Wednesday", 182L), ("Thursday", 182L)))
    assert(relEq(got(0)._3, 76010.28100585938) && relEq(got(1)._3, 75203.26300811768),
      got.mkString(","))
  }

  test("testTopNOverNullDimensionWithFilter (TopNQueryRunnerTest.java:3846): " +
      "selector(null) on the absent column keeps every row; one null group " +
      "with the full-on aggregates") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": "null_column",
        "filter": {"type": "selector", "dimension": "null_column", "value": null},
        "metric": {"type": "numeric", "metric": "index"},
        "threshold": 4,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"},
          {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
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

  test("testAggregateOnLongNumericNull (:5875) / " +
      "testAggregateOnDoubleNumericNull (:5907) / " +
      "testAggregateOnFloatNumericNull (:5939) " +
      "(TopNQueryRunnerTest): typed nullable dims rank numerically " +
      "with the null group first") {
    for ((dim, typ) <- Seq(("longNumericNull", "LONG"),
        ("doubleNumericNull", "DOUBLE"), ("floatNumericNull", "FLOAT"))) {
      val got = run(s"""{
          "queryType": "topN", "dataSource": "testIndex",
          "granularity": "all", "intervals": $FullOn,
          "dimension": {"type": "default", "dimension": "$dim",
            "outputName": "dim", "outputType": "$typ"},
          "metric": {"type": "dimension", "ordering": "numeric"},
          "threshold": 10000,
          "aggregations": [{"type": "count", "name": "count"}]
        }""").collect()
        .map(r => (Option(r.get(r.fieldIndex("dim")))
          .map(_.asInstanceOf[Number].doubleValue), r.getAs[Long]("count"))).toSeq
      assert(got == Seq((None, 279L), (Some(10.0), 93L), (Some(20.0), 93L),
        (Some(40.0), 93L), (Some(50.0), 279L), (Some(70.0), 279L),
        (Some(80.0), 93L)), s"$dim: ${got.mkString(",")}")
    }
  }

  test("testExpressionAggregator (TopNQueryRunnerTest.java:5971): lambda " +
      "count/sum/decomposed-sum/distinct-set aggregators per market " +
      "(threshold covers all three groups)") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": "market",
        "metric": {"type": "numeric", "metric": "diy_count"},
        "threshold": 4,
        "aggregations": [
          {"type": "expression", "name": "diy_count", "fields": [],
           "initialValue": "0", "fold": "__acc + 1",
           "combine": "__acc + diy_count", "isNullUnlessAggregated": false},
          {"type": "expression", "name": "diy_sum", "fields": ["index"],
           "initialValue": "0.0", "fold": "__acc + index"},
          {"type": "expression", "name": "array_agg_distinct",
           "fields": ["quality"], "accumulatorIdentifier": "acc",
           "initialValue": "[]",
           "fold": "array_set_add(acc, quality)",
           "combine": "array_set_add_all(acc, array_agg_distinct)"}]
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[Long]("diy_count"),
        r.getAs[Double]("diy_sum"),
        r.getSeq[String](r.fieldIndex("array_agg_distinct")).toList)).toSeq
    assert(got.map(_._1) == Seq("spot", "total_market", "upfront"))
    assert(got.map(_._2) == Seq(837L, 186L, 186L))
    assert(relEq(got(0)._3, 95606.57232284546) &&
      relEq(got(1)._3, 215679.82879638672) && relEq(got(2)._3, 192046.1060180664),
      got.map(_._3).mkString(","))
    assert(got(0)._4 == List("automotive", "business", "entertainment", "health",
      "mezzanine", "news", "premium", "technology", "travel"))
    assert(got(1)._4 == List("mezzanine", "premium"))
    assert(got(2)._4 == List("mezzanine", "premium"))
  }

  test("testExpressionAggregatorComplex (TopNQueryRunnerTest.java:6085): the " +
      "hyper_unique() lambda accumulator matches the cardinality aggregator " +
      "exactly — UNIQUES_9/2/2 per market") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimension": "market",
        "metric": {"type": "numeric", "metric": "carExpr"},
        "threshold": 4,
        "aggregations": [
          {"type": "cardinality", "name": "car", "fields": ["quality"],
           "byRow": false},
          {"type": "expression", "name": "carExpr", "fields": ["quality"],
           "initialValue": "hyper_unique()",
           "fold": "hyper_unique_add(quality, __acc)",
           "combine": "hyper_unique_add(carExpr, __acc)",
           "finalize": "hyper_unique_estimate(o)"}]
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[Double]("car"),
        r.getAs[Double]("carExpr"))).toSeq
    assert(got.map(_._1) == Seq("spot", "total_market", "upfront"))
    assert(got.map(_._2) == Seq(Uniques9, Uniques2, Uniques2), got.mkString(","))
    assert(got.map(_._3) == Seq(Uniques9, Uniques2, Uniques2), got.mkString(","))
  }
}
