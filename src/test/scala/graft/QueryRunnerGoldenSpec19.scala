package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 19 over the shared TestIndex fixture: the
  * timeseries FILTER family — selector/OR/IN/regex market filters, AND-OR
  * multi-dim mixes, multi-value element filters (equivalent to their
  * single-value quality forms), nonexistent dimensions and values (both
  * zero-filled and skipEmptyBuckets), inverted filters over absent columns,
  * full-on min/max aggregator sextet, varying granularities under a filter,
  * and the timestampResultField context. Each test cites its reference
  * method; long sums exact, double sums at 1e-5 relative tolerance, HLLC
  * uniques exact.
  */
class QueryRunnerGoldenSpec19 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)
  import TestIndexFixture.{Uniques1, Uniques2, Uniques9}

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def relEq(got: Double, exp: Double, tol: Double = 1e-5): Boolean =
    math.abs(got - exp) <= math.abs(exp) * tol

  private def day(r: Row): String =
    r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString

  private val FirstToThird =
    """["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]"""
  private val FullOn =
    """["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]"""

  /** rows + LONGSUM index + uniques + addRowsIndexConstant — the shape of
    * the Filter1/2/3 family. */
  private def tsLongSum(filter: String,
      intervals: String = FirstToThird): Seq[(String, Long, Long, Double, Double)] =
    run(s"""{
      "queryType": "timeseries", "dataSource": "testIndex",
      "granularity": "day", "intervals": $intervals,
      "filter": $filter,
      "aggregations": [
        {"type": "count", "name": "rows"},
        {"type": "longSum", "name": "index", "fieldName": "index"},
        {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}],
      "postAggregations": [{"type": "arithmetic", "name": "addRowsIndexConstant",
        "fn": "+", "fields": [
          {"type": "constant", "name": "const", "value": 1},
          {"type": "fieldAccess", "name": "rows", "fieldName": "rows"},
          {"type": "fieldAccess", "name": "index", "fieldName": "index"}]}]
    }""").collect().map(r => (day(r), r.getAs[Long]("rows"),
      r.getAs[Long]("index"), r.getAs[Double]("addRowsIndexConstant"),
      r.getAs[Double]("uniques"))).sortBy(_._1).toSeq

  test("testTimeseriesWithFilter1 (:1200) / testTimeseriesWithFilter2 " +
      "(:1250) / testTimeseriesWithFilter3 (:1297) " +
      "(TimeseriesQueryRunnerTest): per-market selector filters " +
      "reshape the day vector") {
    assert(tsLongSum("""{"type": "selector", "dimension": "market", "value": "spot"}""")
      == Seq(("2011-04-01", 9L, 1102L, 1112.0, Uniques9),
             ("2011-04-02", 9L, 1120L, 1130.0, Uniques9)))
    assert(tsLongSum("""{"type": "selector", "dimension": "market", "value": "upfront"}""")
      == Seq(("2011-04-01", 2L, 2681L, 2684.0, Uniques2),
             ("2011-04-02", 2L, 2193L, 2196.0, Uniques2)))
    assert(tsLongSum("""{"type": "selector", "dimension": "market", "value": "total_market"}""")
      == Seq(("2011-04-01", 2L, 2836L, 2839.0, Uniques2),
             ("2011-04-02", 2L, 2514L, 2517.0, Uniques2)))
  }

  test("testTimeseriesWithOrFilter (:1102) / testTimeseriesWithInFilter " +
      "(:1539) (TimeseriesQueryRunnerTest): all-markets OR and IN filters " +
      "keep the full days") {
    val expected = Seq(("2011-04-01", 13L, 6619L, 6633.0, Uniques9),
      ("2011-04-02", 13L, 5827L, 5841.0, Uniques9))
    assert(tsLongSum("""{"type": "or", "fields": [
        {"type": "selector", "dimension": "market", "value": "spot"},
        {"type": "selector", "dimension": "market", "value": "upfront"},
        {"type": "selector", "dimension": "market", "value": "total_market"}]}""")
      == expected)
    assert(tsLongSum("""{"type": "in", "dimension": "market",
        "values": ["spot", "upfront", "total_market"]}""") == expected)
  }

  test("testTimeseriesWithRegexFilter (TimeseriesQueryRunnerTest.java:1149): " +
      "'^.p.*$' matches spot and upfront") {
    assert(tsLongSum("""{"type": "regex", "dimension": "market", "pattern": "^.p.*$$"}""")
      == Seq(("2011-04-01", 11L, 3783L, 3795.0, Uniques9),
             ("2011-04-02", 11L, 3313L, 3325.0, Uniques9)))
  }

  /** rows + DOUBLESUM index + uniques — the multi-dim family's shape. */
  private def tsDoubleSum(filter: String): Seq[(String, Long, Double, Double)] =
    run(s"""{
      "queryType": "timeseries", "dataSource": "testIndex",
      "granularity": "day", "intervals": $FirstToThird,
      "filter": $filter,
      "aggregations": [
        {"type": "count", "name": "rows"},
        {"type": "doubleSum", "name": "index", "fieldName": "index"},
        {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}]
    }""").collect().map(r => (day(r), r.getAs[Long]("rows"),
      r.getAs[Double]("index"), r.getAs[Double]("uniques"))).sortBy(_._1).toSeq

  test("testTimeseriesWithMultiDimFilterAndOr (:1344) / " +
      "testTimeseriesWithNonExistentFilterAndMultiDimAndOr (:1597) " +
      "(TimeseriesQueryRunnerTest): " +
      "spot AND (automotive OR business) — a bogus OR leg changes nothing") {
    val expected = Seq(("2011-04-01", 2L, 254.4554443359375, Uniques2),
      ("2011-04-02", 2L, 260.4129638671875, Uniques2))
    val got = tsDoubleSum("""{"type": "and", "fields": [
        {"type": "selector", "dimension": "market", "value": "spot"},
        {"type": "or", "fields": [
          {"type": "selector", "dimension": "quality", "value": "automotive"},
          {"type": "selector", "dimension": "quality", "value": "business"}]}]}""")
    val gotBogus = tsDoubleSum("""{"type": "and", "fields": [
        {"type": "selector", "dimension": "market", "value": "spot"},
        {"type": "or", "fields": [
          {"type": "selector", "dimension": "quality", "value": "automotive"},
          {"type": "selector", "dimension": "quality", "value": "business"},
          {"type": "selector", "dimension": "quality", "value": "billyblank"}]}]}""")
    for (g <- Seq(got, gotBogus)) {
      assert(g.length == 2)
      g.zip(expected).foreach { case ((d, n, i, u), (ed, en, ei, eu)) =>
        assert(d == ed && n == en && u == eu, s"($d,$n,$u)")
        assert(relEq(i, ei), s"$d index $i vs $ei")
      }
    }
  }

  test("testTimeseriesWithOtherMultiDimFilter (TimeseriesQueryRunnerTest" +
      ".java:1438): spot AND business — single row per day") {
    val got = tsDoubleSum("""{"type": "and", "fields": [
        {"type": "selector", "dimension": "market", "value": "spot"},
        {"type": "selector", "dimension": "quality", "value": "business"}]}""")
    assert(got.map(t => (t._1, t._2, t._4)) ==
      Seq(("2011-04-01", 1L, Uniques1), ("2011-04-02", 1L, Uniques1)))
    assert(relEq(got(0)._3, 118.57034) && relEq(got(1)._3, 112.987027), got.mkString(","))
  }

  test("testTimeseriesWithMultiValueDimFilter2 (:2088) / " +
      "testTimeseriesWithMultiValueDimFilterAndOr1 (:2119) / " +
      "testTimeseriesWithMultiValueDimFilterAndOr2 (:2159) " +
      "(TimeseriesQueryRunnerTest): an MV-element filter is " +
      "exactly its single-value quality equivalent") {
    def pairsEqual(mvFilter: String, svFilter: String): Unit = {
      val mv = tsDoubleSum(mvFilter)
      val sv = tsDoubleSum(svFilter)
      assert(mv == sv, s"$mv\nvs\n$sv")
      assert(mv.nonEmpty && mv.forall(_._2 > 0))
    }
    pairsEqual(
      """{"type": "selector", "dimension": "placementish", "value": "a"}""",
      """{"type": "selector", "dimension": "quality", "value": "automotive"}""")
    pairsEqual(
      """{"type": "and", "fields": [
          {"type": "selector", "dimension": "market", "value": "spot"},
          {"type": "selector", "dimension": "placementish", "value": "a"}]}""",
      """{"type": "and", "fields": [
          {"type": "selector", "dimension": "market", "value": "spot"},
          {"type": "selector", "dimension": "quality", "value": "automotive"}]}""")
    pairsEqual(
      """{"type": "and", "fields": [
          {"type": "selector", "dimension": "market", "value": "spot"},
          {"type": "or", "fields": [
            {"type": "selector", "dimension": "placementish", "value": "a"},
            {"type": "selector", "dimension": "placementish", "value": "b"}]}]}""",
      """{"type": "and", "fields": [
          {"type": "selector", "dimension": "market", "value": "spot"},
          {"type": "or", "fields": [
            {"type": "selector", "dimension": "quality", "value": "automotive"},
            {"type": "selector", "dimension": "quality", "value": "business"}]}]}""")
  }

  test("testTimeseriesWithNonExistentFilter (:1792) / " +
      "testTimeseriesWithFilterOnNonExistentDimension (:1644) " +
      "(TimeseriesQueryRunnerTest): no-match filters " +
      "still ZERO-FILL the buckets — rows 0, null sums") {
    for (f <- Seq(
        """{"type": "selector", "dimension": "market", "value": "billy"}""",
        """{"type": "selector", "dimension": "bobby", "value": "billy"}""")) {
      val got = run(s"""{
          "queryType": "timeseries", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FirstToThird,
          "filter": $f,
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "doubleSum", "name": "index", "fieldName": "index"}]
        }""").collect().sortBy(r => day(r))
      assert(got.length == 2, got.mkString("\n"))
      got.foreach { r =>
        assert(r.getAs[Long]("rows") == 0L)
        assert(r.isNullAt(r.fieldIndex("index")))
      }
    }
  }

  test("testTimeseriesWithFilterOnNonExistentDimensionSkipBuckets (Timeseries" +
      "QueryRunnerTest.java:1683): skipEmptyBuckets suppresses the " +
      "zero-filled rows entirely") {
    val got = run(s"""{
        "queryType": "timeseries", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "filter": {"type": "selector", "dimension": "bobby", "value": "billy"},
        "context": {"skipEmptyBuckets": true},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"}]
      }""").collect()
    assert(got.isEmpty, got.mkString("\n"))
  }

  test("testTimeseriesWithNullFilterOnNonExistentDimension (:1704) / " +
      "testTimeseriesWithInvertedFilterOnNonExistentDimension (:1748) / " +
      "testTimeseriesWithNonExistentFilterInOr and " +
      "testTimeseriesWithNonExistentFilterAndMultiDim shapes " +
      "(TimeseriesQueryRunnerTest): null-selector and " +
      "NOT(selector) on an absent column keep every row") {
    val expected = Seq(("2011-04-01", 13L, 6626.151596069336, Uniques9),
      ("2011-04-02", 13L, 5833.2095947265625, Uniques9))
    for (f <- Seq(
        """{"type": "selector", "dimension": "bobby", "value": null}""",
        """{"type": "not", "field":
            {"type": "selector", "dimension": "bobby", "value": "sally"}}""")) {
      val got = tsDoubleSum(f)
      assert(got.length == 2, got.mkString("\n"))
      got.zip(expected).foreach { case ((d, n, i, u), (ed, en, ei, eu)) =>
        assert(d == ed && n == en && u == eu)
        assert(relEq(i, ei), s"$d index $i vs $ei")
      }
    }
  }

  test("testFullOnTimeseriesMinMaxAggregators (TimeseriesQueryRunnerTest" +
      ".java:380): the six typed min/max aggregators over the full " +
      "interval — 59/1870 long, 59.021022/1870.061029 double, float32 forms") {
    val got = run(s"""{
        "queryType": "timeseries", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "aggregations": [
          {"type": "longMin", "name": "lmin", "fieldName": "index"},
          {"type": "longMax", "name": "lmax", "fieldName": "index"},
          {"type": "doubleMin", "name": "dmin", "fieldName": "index"},
          {"type": "doubleMax", "name": "dmax", "fieldName": "index"},
          {"type": "floatMin", "name": "fmin", "fieldName": "index"},
          {"type": "floatMax", "name": "fmax", "fieldName": "index"}]
      }""").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("lmin") == 59L && r.getAs[Long]("lmax") == 1870L)
    assert(relEq(r.getAs[Double]("dmin"), 59.021022) &&
      relEq(r.getAs[Double]("dmax"), 1870.061029))
    assert(math.abs(r.getAs[Float]("fmin") - 59.021023f) < 0.001f &&
      math.abs(r.getAs[Float]("fmax") - 1870.061f) < 0.01f)
  }

  test("testTimeseriesWithVaryingGranWithFilter (TimeseriesQueryRunnerTest" +
      ".java:1000): P1M then DAY granularity over the one-day interval " +
      "under the all-markets filter") {
    def q(gran: String): Seq[(String, Long, Long)] = run(s"""{
        "queryType": "timeseries", "dataSource": "testIndex",
        "granularity": $gran,
        "intervals": ["2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "in", "dimension": "market",
          "values": ["spot", "upfront", "total_market"]},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }""").collect().map(r => (day(r), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).toSeq
    assert(q("""{"type": "period", "period": "P1M"}""")
      == Seq(("2011-04-01", 13L, 5827L)))
    assert(q(""""DAY"""") == Seq(("2011-04-02", 13L, 5827L)))
  }

  test("testTimeseriesWithTimestampResultFieldContextForMapResponse (:2748) " +
      "/ testTimeseriesWithTimestampResultFieldContextForArrayResponse " +
      "(TimeseriesQueryRunnerTest): the " +
      "timestampResultField context materializes each bucket's epoch " +
      "millis as a value column") {
    val got = run(s"""{
        "queryType": "timeseries", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "context": {"timestampResultField": "d0"},
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect().sortBy(r => day(r))
    assert(got.length == 2)
    got.foreach { r =>
      val millis = r.getAs[Long]("d0")
      val bucketMillis = r.getAs[java.time.LocalDateTime]("__time")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      assert(millis == bucketMillis, s"$millis vs $bucketMillis")
      assert(r.getAs[Long]("rows") == 13L)
    }
  }
}
