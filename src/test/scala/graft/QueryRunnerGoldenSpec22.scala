package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 22: the auxiliary runner suites —
  * TimeSeriesUnionQueryRunnerTest (4-way union timeseries),
  * TopNUnionQueryTest (union topN with the dependent post-agg chain),
  * SearchQueryRunnerWithCaseTest's interval cases over the mixed-case
  * fixture, TimeBoundaryQueryRunnerTest's filtered + empty-merge cases,
  * SegmentMetadataQueryTest's nullable-column analyses, and
  * DataSourceMetadataQueryTest's maxIngestedEventTime. Each test cites its
  * reference method.
  *
  * Adjudicated not-portable: GroupByQueryRunnerFailureTest
  * (testNotEnoughMergeBuffersOnQueryable, testResourceLimitExceededOnBroker,
  * testInsufficientResourcesOnBroker, testTimeoutExceptionOnQueryable — the
  * reference's merge-buffer pool and broker resource budgets; Spark's
  * memory manager owns those), DataSourceMetadataQueryTest's SerDe and
  * segment-pruning internals (testContextSerde, testQuerySerialization,
  * testResultSerialization, testResultDeserialization, testFilterSegments,
  * testFilterOverlappingSegments — Jackson round-trips of reference POJOs
  * and broker segment-timeline pruning with no parquet analog),
  * SegmentMetadataQueryTest's SerDe/cache-key/broker-merge plumbing
  * (testSegmentMetadataQuery envelope SerDe, testSerdeWithDefaultInterval,
  * testCacheKeyWithListColumnIncluderator, testAnanlysisTypesBeingSet,
  * testDefaultIntervalAndFiltering, and the per-segment merge family
  * testSegmentMetadataQueryWithDefaultAnalysisMerge,
  * testSegmentMetadataQueryWithDefaultAnalysisMerge2,
  * testSegmentMetadataQueryWithDefaultAnalysisMerge3,
  * testSegmentMetadataQueryWithRollupMerge,
  * testSegmentMetadataQueryWithHasMultipleValuesMerge,
  * testSegmentMetadataQueryWithComplexColumnMerge,
  * testSegmentMetadataQueryWithAggregatorsMerge,
  * testSegmentMetadataQueryWithTimestampSpecMerge,
  * testSegmentMetadataQueryWithQueryGranularityMerge,
  * testSegmentMetadataQueryWithNoAnalysisTypesMerge — this engine's
  * segmentMetadata computes the MERGED analysis in one pass, there is no
  * per-segment envelope to merge; the analysis VALUES those tests pin are
  * covered by the oracle rows segment_metadata / segment_metadata_full and
  * SegmentMetadataSinglePassSpec), SearchQueryRunnerWithCaseTest
  * .testFallbackToCursorBasedPlan (index- vs cursor-strategy internals; the
  * result semantics are identical here by construction), and
  * MultiValuedDimensionTest
  * .testGroupByExpressionMultiMultiBackwardsCompat0dot22andOlder (a legacy
  * pre-0.23 flag explicitly deprecated by the reference).
  */
class QueryRunnerGoldenSpec22 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)
  import TestIndexFixture.{Uniques2, Uniques9}

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
  private val Union4 = """{"type": "union", "dataSources":
    ["testIndex", "testIndex", "testIndex", "testIndex"]}"""

  test("testUnionTimeseries / testUnionResultMerging (TimeSeriesUnionQuery" +
      "RunnerTest): a 4-way union datasource quadruples rows and sums; the " +
      "HLLC uniques stay UNIQUES_9") {
    val got = run(s"""{
        "queryType": "timeseries",
        "dataSource": $Union4,
        "granularity": "day", "intervals": $FirstToThird,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}]
      }""").collect()
      .map(r => (day(r), r.getAs[Long]("rows"), r.getAs[Long]("idx"),
        r.getAs[Double]("uniques"))).sortBy(_._1).toSeq
    assert(got == Seq(
      ("2011-04-01", 52L, 26476L, Uniques9),
      ("2011-04-02", 52L, 23308L, Uniques9)), got.mkString("\n"))
  }

  test("testTopNUnionQuery (TopNUnionQueryTest.java:102): topN over the " +
      "4-way union ranked by the dependent post-agg chain — quadrupled " +
      "rows/sums, union-invariant min/max and uniques") {
    val got = run(s"""{
        "queryType": "topN",
        "dataSource": $Union4,
        "granularity": "all", "intervals": $FullOn,
        "dimension": "market",
        "metric": {"type": "numeric", "metric": "dependentPostAgg"},
        "threshold": 4,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"},
          {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"},
          {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}],
        "postAggregations": [
          {"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
           "fields": [
             {"type": "constant", "name": "const", "value": 1},
             {"type": "fieldAccess", "name": "rows", "fieldName": "rows"},
             {"type": "fieldAccess", "name": "index", "fieldName": "index"}]},
          {"type": "arithmetic", "name": "dependentPostAgg", "fn": "+",
           "fields": [
             {"type": "constant", "name": "const", "value": 1},
             {"type": "fieldAccess", "name": "rows", "fieldName": "rows"},
             {"type": "fieldAccess", "name": "addRowsIndexConstant",
              "fieldName": "addRowsIndexConstant"}]}]
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[Long]("rows"),
        r.getAs[Double]("index"), r.getAs[Double]("uniques"),
        r.getAs[Double]("maxIndex"), r.getAs[Double]("minIndex"))).toSeq
    assert(got.map(_._1) == Seq("total_market", "upfront", "spot"), got.mkString(","))
    assert(got.map(_._2) == Seq(744L, 744L, 3348L))
    assert(relEq(got(0)._3, 862719.3151855469) && relEq(got(1)._3, 768184.4240722656) &&
      relEq(got(2)._3, 382426.28929138184), got.mkString(","))
    assert(got.map(_._4) == Seq(Uniques2, Uniques2, Uniques9))
    assert(relEq(got(0)._5, 1743.9217529296875) && relEq(got(0)._6, 792.3260498046875))
  }

  // the SearchQueryRunnerWithCaseTest fixture: mixed-case rows
  // (SearchQueryRunnerWithCaseTest.java:60-70)
  private def caseIndex: String = """{"type": "inline",
    "columnNames": ["__time", "market", "quality", "placement"],
    "columnTypes": ["STRING", "STRING", "STRING", "STRING"],
    "rows": [
      ["2011-01-12T00:00:00.000Z", "spot", "AutoMotive", "PREFERRED"],
      ["2011-01-12T00:00:00.000Z", "SPot", "business", "preferred"],
      ["2011-01-12T00:00:00.000Z", "spot", "entertainment", "PREFERRed"],
      ["2011-01-13T00:00:00.000Z", "spot", "automotive", "preferred"]]}"""

  test("testSearchIntervals (SearchQueryRunnerWithCaseTest): the interval " +
      "clips the searched rows — 'otive' on 01-12 only hits 'AutoMotive'") {
    val got = run(s"""{
        "queryType": "search",
        "dataSource": $caseIndex,
        "granularity": "all",
        "intervals": ["2011-01-12T00:00:00.000Z/2011-01-13T00:00:00.000Z"],
        "searchDimensions": ["quality"],
        "query": {"type": "insensitive_contains", "value": "otive"}
      }""").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("quality", "AutoMotive")), got.mkString(","))
  }

  test("testSearchNoOverrappingIntervals (SearchQueryRunnerWithCaseTest): " +
      "an interval before the data yields no hits") {
    val got = run(s"""{
        "queryType": "search",
        "dataSource": $caseIndex,
        "granularity": "all",
        "intervals": ["2011-01-10T00:00:00.000Z/2011-01-11T00:00:00.000Z"],
        "searchDimensions": ["quality"],
        "query": {"type": "insensitive_contains", "value": "business"}
      }""").collect()
    assert(got.isEmpty, got.mkString(","))
  }

  test("testFilteredTimeBoundaryQuery (TimeBoundaryQueryRunnerTest): the " +
      "filter applies before the min/max — automotive spans the full " +
      "fixture coverage") {
    val got = run(s"""{
        "queryType": "timeBoundary", "dataSource": "testIndex",
        "filter": {"type": "selector", "dimension": "quality", "value": "automotive"}
      }""").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[java.time.LocalDateTime]("minTime").toLocalDate.toString
      == "2011-01-12")
    assert(r.getAs[java.time.LocalDateTime]("maxTime").toLocalDate.toString
      == "2011-04-15")
  }

  test("testMergeResultsEmptyResults (TimeBoundaryQueryRunnerTest): a " +
      "no-match filter yields an EMPTY result, not a null-bounds row") {
    val got = run(s"""{
        "queryType": "timeBoundary", "dataSource": "testIndex",
        "filter": {"type": "selector", "dimension": "quality", "value": "nope"}
      }""").collect()
    assert(got.isEmpty, got.mkString(","))
  }

  test("testLongNullableColumn / testDoubleNullableColumn / " +
      "testFloatNullableColumn / testStringNullOnlyColumn (SegmentMetadata" +
      "QueryTest): the nulls analysis counts the nullable columns' nulls " +
      "and reports zero for the dense ones") {
    val got = run(s"""{
        "queryType": "segmentMetadata", "dataSource": "testIndex",
        "toInclude": {"type": "list", "columns":
          ["longNumericNull", "doubleNumericNull", "floatNumericNull",
           "partial_null_column", "quality"]}
      }""").collect()
      .map(r => (r.getAs[String]("column"), r.getAs[Long]("nullCount"))).toMap
    assert(got("longNumericNull") > 0L, got.toString)
    assert(got("doubleNumericNull") > 0L)
    assert(got("floatNumericNull") > 0L)
    assert(got("partial_null_column") > 0L)
    assert(got("quality") == 0L)
  }

  test("testMaxIngestedEventTime (DataSourceMetadataQueryTest): the " +
      "dataSourceMetadata query reports the newest event time") {
    val got = run("""{
        "queryType": "dataSourceMetadata", "dataSource": "testIndex"
      }""").collect()
    assert(got.length == 1)
    assert(got.head.getAs[java.time.LocalDateTime]("maxIngestedEventTime")
      .toLocalDate.toString == "2011-04-15")
  }
}
