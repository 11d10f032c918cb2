package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 16 over the shared TestIndex fixture: the TopN
  * core-vector tail — testTopN and its filter variants (selector, OR,
  * nonexistent values, nonexistent dims), the multi-value dimension filter
  * family (per-element matching AND per-element unnesting of the ranked
  * dimension), aggregator-less lexicographic topN, and the four
  * previousStop pagination corners (plain + inverted, existing +
  * non-existing stop values). Each test cites its reference method; rows
  * exact, double sums at 1e-5 relative tolerance (the reference's own
  * expected vectors mix exact-double and float32-rounded forms and its
  * TestHelper compares approximately), HLLC uniques exact.
  */
class QueryRunnerGoldenSpec16 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)
  import TestIndexFixture.{Uniques1, Uniques2, Uniques9}

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def relEq(got: Double, exp: Double, tol: Double = 1e-5): Boolean =
    math.abs(got - exp) <= math.abs(exp) * tol

  private val FirstToThird =
    """["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]"""

  /** The reference's commonAggregators + addRowsIndexConstant topN shape. */
  private def topn(dimension: String, metric: String, threshold: Int,
      filter: String = null, intervals: String = FirstToThird): String = s"""{
      "queryType": "topN", "dataSource": "testIndex",
      "granularity": "all", "intervals": $intervals,
      "dimension": "$dimension",
      "metric": $metric,
      "threshold": $threshold,
      ${if (filter == null) "" else s""""filter": $filter,"""}
      "aggregations": [
        {"type": "count", "name": "rows"},
        {"type": "doubleSum", "name": "index", "fieldName": "index"},
        {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}],
      "postAggregations": [{"type": "arithmetic", "name": "addRowsIndexConstant",
        "fn": "+", "fields": [
          {"type": "constant", "name": "const", "value": 1},
          {"type": "fieldAccess", "name": "rows", "fieldName": "rows"},
          {"type": "fieldAccess", "name": "index", "fieldName": "index"}]}]
    }"""

  private def rowsOf(df: DataFrame, dim: String): Seq[(String, Long, Double, Double, Double)] =
    df.collect().map(r => (r.getAs[String](dim), r.getAs[Long]("rows"),
      r.getAs[Double]("index"), r.getAs[Double]("addRowsIndexConstant"),
      r.getAs[Double]("uniques"))).toSeq

  private def check(got: Seq[(String, Long, Double, Double, Double)],
      expected: Seq[(String, Long, Double, Double, Double)]): Unit = {
    assert(got.length == expected.length,
      s"${got.length} vs ${expected.length}:\n${got.mkString("\n")}")
    got.zip(expected).foreach { case ((d, n, i, a, u), (ed, en, ei, ea, eu)) =>
      assert(d == ed && n == en, s"($d,$n) vs ($ed,$en)")
      assert(relEq(i, ei), s"$d index $i vs $ei")
      assert(relEq(a, ea), s"$d aric $a vs $ea")
      assert(u == eu, s"$d uniques $u vs $eu")
    }
  }

  private val Spot = ("spot", 18L, 2231.876812, 2250.876812, Uniques9)
  private val TotalMarket = ("total_market", 4L, 5351.814783, 5356.814783, Uniques2)
  private val Upfront = ("upfront", 4L, 4875.669692, 4880.669692, Uniques2)
  private val NumericMetric = """{"type": "numeric", "metric": "index"}"""

  test("testTopN (TopNQueryRunnerTest.java:1233): market by doubleSum " +
      "index, threshold 4 — total_market, upfront, spot") {
    check(rowsOf(run(topn("market", NumericMetric, 4)), "market"),
      Seq(TotalMarket, Upfront, Spot))
  }

  test("testTopNWithOrFilter1 (:1329) / testTopNWithOrFilter2 (:1377) / " +
      "testTopNWithFilter1 (:1418) " +
      "(TopNQueryRunnerTest): IN filters narrow the ranked set") {
    check(rowsOf(run(topn("market", NumericMetric, 4,
      """{"type": "in", "dimension": "market",
          "values": ["total_market", "upfront", "spot"]}""")), "market"),
      Seq(TotalMarket, Upfront, Spot))
    check(rowsOf(run(topn("market", NumericMetric, 4,
      """{"type": "in", "dimension": "market", "values": ["total_market", "upfront"]}""")),
      "market"), Seq(TotalMarket, Upfront))
    check(rowsOf(run(topn("market", NumericMetric, 4,
      """{"type": "selector", "dimension": "market", "value": "upfront"}""")),
      "market"), Seq(Upfront))
  }

  test("testTopNWithFilter2 (TopNQueryRunnerTest.java:1452): a quality " +
      "filter reshapes every market's aggregates") {
    check(rowsOf(run(topn("market", NumericMetric, 4,
      """{"type": "selector", "dimension": "quality", "value": "mezzanine"}""")),
      "market"), Seq(
        ("upfront", 2L, 2591.68359375, 2594.68359375, Uniques1),
        ("total_market", 2L, 2508.39599609375, 2511.39599609375, Uniques1),
        ("spot", 2L, 220.63774871826172, 223.63774871826172, Uniques1)))
  }

  test("testTopNWithFilter2OneDay (TopNQueryRunnerTest.java:1500): the same " +
      "filter over a single day") {
    check(rowsOf(run(topn("market", NumericMetric, 4,
      """{"type": "selector", "dimension": "quality", "value": "mezzanine"}""",
      """["2011-04-01T00:00:00.000Z/2011-04-02T00:00:00.000Z"]""")), "market"),
      Seq(
        ("upfront", 1L, 1447.34116, 1449.34116, Uniques1),
        ("total_market", 1L, 1314.839715, 1316.839715, Uniques1),
        ("spot", 1L, 109.705815, 111.705815, Uniques1)))
  }

  test("testTopNWithNonExistentFilterInOr (:1560) / " +
      "testTopNWithNonExistentFilter (:1593) / " +
      "testTopNWithNonExistentFilterMultiDim (:1614) (TopNQueryRunnerTest): " +
      "values absent from the data drop out; all-absent yields empty") {
    check(rowsOf(run(topn("market", NumericMetric, 4,
      """{"type": "in", "dimension": "market",
          "values": ["total_market", "upfront", "billyblank"]}""")), "market"),
      Seq(TotalMarket, Upfront))
    assert(run(topn("market", NumericMetric, 4,
      """{"type": "selector", "dimension": "market", "value": "billyblank"}"""))
      .collect().isEmpty)
    assert(run(topn("market", NumericMetric, 4,
      """{"type": "and", "fields": [
          {"type": "selector", "dimension": "market", "value": "billyblank"},
          {"type": "selector", "dimension": "quality", "value": "mezzanine"}]}"""))
      .collect().isEmpty)
  }

  test("testTopNWithMultiValueDimFilter1 (:1655) / " +
      "testTopNWithMultiValueDimFilter2 (:1694) (TopNQueryRunnerTest): " +
      "a filter on an MV element is exactly the equivalent " +
      "single-value quality filter") {
    val viaMv = rowsOf(run(topn("market", NumericMetric, 4,
      """{"type": "selector", "dimension": "placementish", "value": "m"}""")), "market")
    val viaQuality = rowsOf(run(topn("market", NumericMetric, 4,
      """{"type": "selector", "dimension": "quality", "value": "mezzanine"}""")), "market")
    assert(viaMv == viaQuality, s"$viaMv\nvs\n$viaQuality")
    val viaMv2 = rowsOf(run(topn("quality", NumericMetric, 4,
      """{"type": "in", "dimension": "placementish", "values": ["m", "a", "b"]}""")), "quality")
    val viaQuality2 = rowsOf(run(topn("quality", NumericMetric, 4,
      """{"type": "in", "dimension": "quality",
          "values": ["mezzanine", "automotive", "business"]}""")), "quality")
    assert(viaMv2 == viaQuality2, s"$viaMv2\nvs\n$viaQuality2")
  }

  test("testTopNWithMultiValueDimFilter3 (:1733) / " +
      "testTopNWithMultiValueDimFilter4 (:1760) / " +
      "testTopNWithMultiValueDimFilter5 (:1800) " +
      "(TopNQueryRunnerTest): ranking ON the MV dimension unnests per " +
      "element while the filter matches per element") {
    check(rowsOf(run(topn("placementish", NumericMetric, 4,
      """{"type": "selector", "dimension": "placementish", "value": "a"}""")),
      "placementish"), Seq(
        ("a", 2L, 283.31103515625, 286.31103515625, Uniques1),
        ("preferred", 2L, 283.31103515625, 286.31103515625, Uniques1)))
    check(rowsOf(run(topn("placementish", NumericMetric, 4,
      """{"type": "in", "dimension": "placementish", "values": ["a", "b"]}""")),
      "placementish"), Seq(
        ("preferred", 4L, 514.868408203125, 519.868408203125, Uniques2),
        ("a", 2L, 283.31103515625, 286.31103515625, Uniques1),
        ("b", 2L, 231.557373046875, 234.557373046875, Uniques1)))
    check(rowsOf(run(topn("placementish", NumericMetric, 4,
      """{"type": "selector", "dimension": "placementish", "value": "preferred"}""")),
      "placementish"), Seq(
        ("preferred", 26L, 12459.361190795898, 12486.361190795898, Uniques9),
        ("p", 6L, 5407.213653564453, 5414.213653564453, Uniques1),
        ("m", 6L, 5320.717338562012, 5327.717338562012, Uniques1),
        ("t", 4L, 422.3440856933594, 427.3440856933594, Uniques2)))
  }

  test("testTopNWithNonExistentDimension (:1856) / " +
      "testTopNWithNonExistentDimensionAndActualFilter (:1886) / " +
      "testTopNWithNonExistentDimensionAndNonExistentFilter (:1914) " +
      "(TopNQueryRunnerTest): a nonexistent " +
      "ranked dimension groups everything under null; a nonexistent-dim " +
      "NULL filter matches every row") {
    check(rowsOf(run(topn("doesn't exist", NumericMetric, 1)), "doesn't exist")
        .map { case (d, n, i, a, u) => (d, n, i, a, u) },
      Seq((null, 26L, 12459.361190795898, 12486.361190795898, Uniques9)))
    check(rowsOf(run(topn("doesn't exist", NumericMetric, 4,
      """{"type": "selector", "dimension": "market", "value": "upfront"}""")),
      "doesn't exist"), Seq((null, 4L, 4875.669692, 4880.669692, Uniques2)))
    check(rowsOf(run(topn("doesn't exist", NumericMetric, 1,
      """{"type": "selector", "dimension": "doesn't exist", "value": null}""")),
      "doesn't exist"), Seq((null, 26L, 12459.361190795898, 12486.361190795898, Uniques9)))
  }

  test("testTopNLexicographicNoAggregators (TopNQueryRunnerTest.java:2004): " +
      "aggregator-less lexicographic topN emits the bare ordered dimension") {
    val got = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimension": "market",
        "metric": {"type": "dimension", "ordering": "lexicographic"},
        "threshold": 4
      }""").collect().map(_.getAs[String]("market")).toSeq
    assert(got == Seq("spot", "total_market", "upfront"), got.mkString(","))
  }

  test("testTopNLexicographicWithPreviousStop (:2037) / " +
      "testTopNLexicographicWithNonExistingPreviousStop (:2077) / " +
      "testTopNInvertedLexicographicWithPreviousStop (:2117) / " +
      "testTopNInvertedLexicographicWithNonExistingPreviousStop (:2157) " +
      "(TopNQueryRunnerTest): previousStop pagination, both directions, " +
      "stop values present and absent") {
    def q(metric: String): Seq[String] = run(s"""{
        "queryType": "topN", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimension": "market",
        "metric": $metric,
        "threshold": 4,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"}]
      }""").collect().map(_.getAs[String]("market")).toSeq
    assert(q("""{"type": "dimension", "ordering": "lexicographic",
                 "previousStop": "spot"}""") == Seq("total_market", "upfront"))
    assert(q("""{"type": "dimension", "ordering": "lexicographic",
                 "previousStop": "t"}""") == Seq("total_market", "upfront"))
    assert(q("""{"type": "inverted", "metric": {"type": "dimension",
                 "ordering": "lexicographic", "previousStop": "upfront"}}""")
      == Seq("total_market", "spot"))
    assert(q("""{"type": "inverted", "metric": {"type": "dimension",
                 "ordering": "lexicographic", "previousStop": "u"}}""")
      == Seq("total_market", "spot"))
  }
}
