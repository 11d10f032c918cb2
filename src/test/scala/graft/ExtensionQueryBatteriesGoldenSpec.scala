package graft

import org.apache.spark.sql.DataFrame
import graft.operators.NativeQuery

/** The remaining extensions-core QUERY-CONTEXT batteries (r16 widening —
  * the same class of suites as the r16 histogram asks):
  *
  *  - FixedBucketsHistogramGroupByQueryTest / FixedBucketsHistogramTopN
  *    QueryTest (extensions-core/histogram): the exact-bucket histogram
  *    through groupBy/topN shapes — bucket counts are EXACT longs, the
  *    median via APPROX_QUANTILE_FIXED_BUCKETS. The reference's OVERFLOW
  *    outlier mode runs verbatim (outliers stay out of the buckets; the
  *    reference's separate outlier counters are not part of the count
  *    rendering — no outliers exist in [0, 2000) here anyway).
  *  - VarianceTimeseriesQueryTest / VarianceTopNQueryTest
  *    (extensions-core/stats): variance + stddev through timeseries (with
  *    the null-filter-on-nonexistent-dimension match-all) and topN-over-
  *    uniques shapes. Welford/Chan folds are merge-order-sensitive in the
  *    low bits (the reference's OWN expected values differ between asc and
  *    desc runs at ~1e-12 relative), so variance asserts at 1e-6 relative.
  *  - The same-name post-aggregator rejection
  *    (testGroupByWithSameNameComplexPostAgg → IllegalArgumentException,
  *    Queries.verifyAggregations' "[histo] already defined").
  */
class ExtensionQueryBatteriesGoldenSpec extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def relEq(got: Double, exp: Double, tol: Double = 1e-6): Boolean =
    math.abs(got - exp) <= math.abs(exp).max(1e-9) * tol

  private val FullOn = """["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]"""

  test("FixedBucketsHistogramGroupByQueryTest.testGroupByWithFixedHistogram" +
      "Agg (:160-220): marketalias desc limit 1 → upfront, exact bucket " +
      "counts 0,0,4,33,66,35,25,11,10,2 and median 969.6969604492188") {
    val r = run(
      s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimensions": [{"type": "default", "dimension": "market",
                        "outputName": "marketalias"}],
        "limitSpec": {"type": "default", "limit": 1,
          "columns": [{"dimension": "marketalias", "direction": "descending"}]},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "fixedBucketsHistogram", "name": "histo",
           "fieldName": "index", "numBuckets": 10,
           "lowerLimit": 0, "upperLimit": 2000,
           "outlierHandlingMode": "overflow"}]
      }""").head()
    assert(r.getAs[String]("marketalias") == "upfront")
    assert(r.getAs[Long]("rows") == 186L)
    assert(r.getAs[String]("histo") == "0,0,4,33,66,35,25,11,10,2")
    graft.functions.GraftSqlFunctions.register(spark)
    testIndex.createOrReplaceTempView("fixed_histo_src")
    val q = spark.sql(
      """SELECT APPROX_QUANTILE_FIXED_BUCKETS(index, 0.5, 10, 0, 2000) AS q
        |FROM fixed_histo_src WHERE market = 'upfront'""".stripMargin)
      .head().getDouble(0)
    assert(relEq(q, 969.6969604492188, 1e-6), s"median $q")
  }

  test("testGroupByWithSameNameComplexPostAgg (:221-253): a post-aggregator " +
      "reusing an aggregator's output name is rejected ('already defined')") {
    val e = intercept[IllegalArgumentException] { run(
      s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimensions": [{"type": "default", "dimension": "market",
                        "outputName": "marketalias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "fixedBucketsHistogram", "name": "histo",
           "fieldName": "index", "numBuckets": 10,
           "lowerLimit": 0, "upperLimit": 2000,
           "outlierHandlingMode": "overflow"}],
        "postAggregations": [
          {"type": "arithmetic", "name": "histo", "fn": "+",
           "fields": [{"type": "fieldAccess", "fieldName": "rows"},
                      {"type": "constant", "value": 1}]}]
      }""") }
    assert(e.getMessage.contains("already defined"))
  }

  test("FixedBucketsHistogramTopNQueryTest.testTopNWithFixedHistogramAgg " +
      "(:106-239): full-on topN by the dependent post-agg with exact " +
      "bucket counts per market and the three medians") {
    val rows = run(
      s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "dimension": "market",
        "metric": "dependentPostAgg", "threshold": 4,
        "intervals": $FullOn,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"},
          {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
          {"type": "doubleMin", "name": "minIndex", "fieldName": "index"},
          {"type": "fixedBucketsHistogram", "name": "histo",
           "fieldName": "index", "numBuckets": 10,
           "lowerLimit": 0, "upperLimit": 2000,
           "outlierHandlingMode": "overflow"}],
        "postAggregations": [
          {"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
           "fields": [{"type": "constant", "value": 1},
                      {"type": "fieldAccess", "fieldName": "rows"},
                      {"type": "fieldAccess", "fieldName": "index"}]},
          {"type": "arithmetic", "name": "dependentPostAgg", "fn": "+",
           "fields": [{"type": "constant", "value": 1},
                      {"type": "fieldAccess", "fieldName": "addRowsIndexConstant"},
                      {"type": "fieldAccess", "fieldName": "rows"}]}]
      }""").collect()
    assert(rows.length == 3)
    val expected = Seq(
      ("total_market", 186L, 215679.82879638672, "0,0,0,1,21,105,42,12,5,0"),
      ("upfront", 186L, 192046.1060180664, "0,0,4,33,66,35,25,11,10,2"),
      ("spot", 837L, 95606.57232284546, "835,2,0,0,0,0,0,0,0,0"))
    rows.zip(expected).foreach { case (r, (mkt, n, idx, histo)) =>
      assert(r.getAs[String]("market") == mkt)
      assert(r.getAs[Long]("rows") == n, s"rows @ $mkt")
      assert(relEq(r.getAs[Double]("index"), idx), s"index @ $mkt")
      assert(r.getAs[String]("histo") == histo, s"histo @ $mkt")
    }
    // the reference's quantile post-agg medians, via the SQL aggregate
    graft.functions.GraftSqlFunctions.register(spark)
    testIndex.createOrReplaceTempView("fixed_histo_src")
    val medians = spark.sql(
      """SELECT market, APPROX_QUANTILE_FIXED_BUCKETS(index, 0.5, 10, 0, 2000) AS q
        |FROM fixed_histo_src GROUP BY market""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(relEq(medians("total_market"), 1135.238, 1e-4))
    assert(relEq(medians("upfront"), 969.69696, 1e-4))
    assert(relEq(medians("spot"), 100.23952, 1e-4))
  }

  test("VarianceTimeseriesQueryTest.testTimeseriesWithNullFilterOnNon" +
      "ExistentDimension (:77-125): a null selector on a missing dim " +
      "matches all rows; per-day variance + stddev over FIRST_TO_THIRD") {
    val rows = run(
      """{
        "queryType": "timeseries", "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "selector", "dimension": "bobby", "value": null},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"},
          {"type": "variance", "name": "index_var", "fieldName": "index"}],
        "postAggregations": [
          {"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
           "fields": [{"type": "constant", "value": 1},
                      {"type": "fieldAccess", "fieldName": "rows"},
                      {"type": "fieldAccess", "fieldName": "index"}]},
          {"type": "stddev", "name": "index_stddev", "fieldName": "index_var"}]
      }""").collect()
    assert(rows.length == 2)
    val expected = Seq(
      ("2011-04-01", 13L, 6626.151596069336, 368885.689155086, 607.35960448081),
      ("2011-04-02", 13L, 5833.2095947265625, 259061.60216419376, 508.98094479478675))
    rows.zip(expected).foreach { case (r, (day, n, idx, v, sd)) =>
      assert(r.getAs[Any]("__time").toString.take(10) == day)
      assert(r.getAs[Long]("rows") == n)
      assert(relEq(r.getAs[Double]("index"), idx))
      assert(relEq(r.getAs[Double]("addRowsIndexConstant"), idx + n + 1))
      assert(r.getAs[Double]("uniques") == TestIndexFixture.Uniques9)
      assert(relEq(r.getAs[Double]("index_var"), v), s"var @ $day: ${r.getAs[Double]("index_var")}")
      assert(relEq(r.getAs[Double]("index_stddev"), sd), s"stddev @ $day")
    }
  }

  test("VarianceTopNQueryTest.testFullOnTopNOverUniques (:68-140): topN by " +
      "uniques threshold 3 — spot/total_market/upfront with index_var") {
    val rows = run(
      s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "dimension": "market",
        "metric": "uniques", "threshold": 3,
        "intervals": $FullOn,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"},
          {"type": "variance", "name": "index_var", "fieldName": "index"},
          {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
          {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}],
        "postAggregations": [
          {"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
           "fields": [{"type": "constant", "value": 1},
                      {"type": "fieldAccess", "fieldName": "rows"},
                      {"type": "fieldAccess", "fieldName": "index"}]}]
      }""").collect()
    assert(rows.length == 3)
    val expected = Seq(
      ("spot", 837L, 95606.57232284546, TestIndexFixture.Uniques9, 439.3851694586573),
      ("total_market", 186L, 215679.82879638672, TestIndexFixture.Uniques2, 27679.900887366413),
      ("upfront", 186L, 192046.1060180664, TestIndexFixture.Uniques2, 79699.9780741607))
    rows.zip(expected).foreach { case (r, (mkt, n, idx, uniq, v)) =>
      assert(r.getAs[String]("market") == mkt)
      assert(r.getAs[Long]("rows") == n)
      assert(relEq(r.getAs[Double]("index"), idx))
      assert(r.getAs[Double]("uniques") == uniq)
      assert(relEq(r.getAs[Double]("index_var"), v), s"var @ $mkt")
    }
  }
}
