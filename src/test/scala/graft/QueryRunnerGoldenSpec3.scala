package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 3 over the shared TestIndex fixture
  * ([[TestIndexFixture]]): TimeseriesQueryRunnerTest.java depth — the
  * zero-fill/coverage-clipping corners (aligned and unaligned granularities,
  * out-of-coverage intervals), aggregator-less queries, the filtered-agg
  * family over present/absent dimensions, first/last across months, bound
  * and lookup-extraction filters, the timestampResultField context, the
  * __time-as-long aggregator view, expression-lambda aggregators, and
  * cardinality over expression virtual columns / complex columns. Each test
  * cites its reference method and asserts the reference's published result
  * vectors (longs/strings exact, doubles at the reference's own 1e-6
  * relative tolerance, float-typed values via Float→double widening).
  *
  * JavaScript pieces of the originals are dropped and noted per test
  * (javascript is a declared non-goal).
  */
class QueryRunnerGoldenSpec3 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def relEq(got: Double, exp: Double, tol: Double = 1e-6): Boolean =
    math.abs(got - exp) <= math.abs(exp) * tol

  private def day(r: Row): String =
    r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString

  private def instant(r: Row): String =
    r.getAs[java.time.LocalDateTime]("__time").toString

  private def dbl(r: Row, name: String): Double =
    r.getAs[Number](name).doubleValue()

  // the reference's commonAggregators (QueryRunnerTestHelper.java:214-218)
  private val CommonAggs =
    """{"type": "count", "name": "rows"},
       {"type": "doubleSum", "name": "index", "fieldName": "index"},
       {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}"""

  // ADD_ROWS_INDEX_CONSTANT (QueryRunnerTestHelper.java:230-238)
  private val AddRowsIndexConstant =
    """{"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
        "fields": [
          {"type": "fieldAccess", "fieldName": "rows"},
          {"type": "fieldAccess", "fieldName": "index"},
          {"type": "constant", "value": 1}]}"""

  // ------------------------------------------------- coverage / zero-fill

  test("testEmptyTimeseries (TimeseriesQueryRunnerTest.java:168): an " +
      "interval past all data still yields ONE all-granularity row — count " +
      "0, sums and doubleFirst null (sql-compatible null mode)") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2020-04-02T00:00:00.000Z/P1D"],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"},
          {"type": "doubleFirst", "name": "first", "fieldName": "index"}
        ]
      }""").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("rows") == 0L)
    assert(rows(0).isNullAt(rows(0).fieldIndex("index")))
    assert(rows(0).isNullAt(rows(0).fieldIndex("first")))
  }

  test("testTimeseriesNoAggregators (TimeseriesQueryRunnerTest.java:313): " +
      "aggregator-less DAY query emits one empty row per bucket across the " +
      "data's coverage — 94 days from 2011-01-12 to 2011-04-15 inclusive, " +
      "including the skipped day 2011-01-21") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]
      }""").collect()
    assert(rows.length == 94, s"got ${rows.length}")
    assert(rows.head.schema.fieldNames.toSeq == Seq("__time"))
    assert(day(rows.head) == "2011-01-12")
    assert(day(rows.last) == "2011-04-15")
    assert(rows.map(day).contains("2011-01-21")) // the skipped day still buckets
  }

  test("testTimeseriesQueryBeyondTimeRangeOfData (TimeseriesQueryRunnerTest" +
      ".java:1072): a DAY interval entirely past the data's coverage " +
      "zero-fills NOTHING — empty result, not a spine of zero rows") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2015-01-01T00:00:00.000Z/2015-01-10T00:00:00.000Z"],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ]
      }""").collect()
    assert(rows.isEmpty, s"got:\n${rows.mkString("\n")}")
  }

  test("testTimeseriesGranularityNotAlignedOnSegmentBoundariesWithFilter " +
      "(TimeseriesQueryRunnerTest.java:843): P7D in America/Los_Angeles " +
      "anchors weekly buckets to the epoch Thursday in LA wall clock; " +
      "offset-bearing interval endpoints normalize to UTC") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": {"type": "period", "period": "P7D",
                        "timeZone": "America/Los_Angeles"},
        "intervals": ["2011-01-12T00:00:00.000-08:00/2011-01-20T00:00:00.000-08:00"],
        "filter": {"type": "in", "dimension": "market",
                   "values": ["spot", "upfront", "total_market"]},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ]
      }""").collect()
      .map(r => (instant(r), r.getAs[Long]("rows"), r.getAs[Long]("idx"))).toSeq
    assert(rows == Seq(
      ("2011-01-06T08:00", 13L, 6071L),
      ("2011-01-13T08:00", 91L, 33382L)), s"got:\n${rows.mkString("\n")}")
  }

  test("testTimeseriesQueryZeroFilling (TimeseriesQueryRunnerTest.java:893): " +
      "HOUR buckets zero-fill between observed data but clip to the data's " +
      "coverage — 25 rows for a 17-day interval whose data ends 2011-04-15, " +
      "zero rows carrying count 0 and null longSum") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "hour",
        "intervals": ["2011-04-14T00:00:00.000Z/2011-05-01T00:00:00.000Z"],
        "filter": {"type": "in", "dimension": "market",
                   "values": ["spot", "upfront", "total_market"]},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ]
      }""").collect()
    assert(rows.length == 25, s"got ${rows.length}")
    assert(instant(rows.head) == "2011-04-14T00:00")
    assert(rows.head.getAs[Long]("rows") == 13L)
    assert(rows.head.getAs[Long]("idx") == 4907L)
    rows.slice(1, 24).foreach { r =>
      assert(r.getAs[Long]("rows") == 0L, s"zero row: $r")
      assert(r.isNullAt(r.fieldIndex("idx")), s"zero row: $r")
    }
    assert(instant(rows.last) == "2011-04-15T00:00")
    assert(rows.last.getAs[Long]("rows") == 13L)
    assert(rows.last.getAs[Long]("idx") == 4717L)
  }

  test("testTimeseriesQueryGranularityNotAlignedWithRollupGranularity " +
      "(TimeseriesQueryRunnerTest.java:960): PT1H with a 60000ms origin " +
      "buckets at :01 — the single result bucket STARTS BEFORE the query " +
      "interval (2011-04-14T23:01Z for rows at 2011-04-15T00:00Z)") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": {"type": "period", "period": "PT1H",
                        "origin": "1970-01-01T00:01:00.000Z"},
        "intervals": ["2011-04-15T00:00:00.000Z/2012-01-01T00:00:00.000Z"],
        "filter": {"type": "in", "dimension": "market",
                   "values": ["spot", "upfront", "total_market"]},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ]
      }""").collect()
      .map(r => (instant(r), r.getAs[Long]("rows"), r.getAs[Long]("idx"))).toSeq
    assert(rows == Seq(("2011-04-14T23:01", 13L, 4717L)),
      s"got:\n${rows.mkString("\n")}")
  }

  // ------------------------------------------------------------ first/last

  test("testTimeseriesWithFirstLastAggregator (TimeseriesQueryRunnerTest" +
      ".java:1949): doubleFirst/doubleLast per MONTH pick the first/last " +
      "row in time order, ties broken by encounter order (ascending " +
      "traversal); the reference asserts float-wrapped constants at its " +
      "1e-6 relative tolerance (TestHelper.assertExpectedResults)") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "month",
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "aggregations": [
          {"type": "doubleFirst", "name": "first", "fieldName": "index"},
          {"type": "doubleLast", "name": "last", "fieldName": "index"}
        ]
      }""").collect()
    val expected = Seq(
      ("2011-01-01", 100.000000f, 943.497198f),
      ("2011-02-01", 132.123776f, 1101.918270f),
      ("2011-03-01", 153.059937f, 1063.201156f),
      ("2011-04-01", 135.885094f, 780.271977f))
    assert(rows.length == 4)
    rows.zip(expected).foreach { case (r, (d, f, l)) =>
      assert(day(r) == d)
      assert(relEq(dbl(r, "first"), f.toDouble), s"$d first: $r")
      assert(relEq(dbl(r, "last"), l.toDouble), s"$d last: $r")
    }
  }

  // --------------------------------------------------- filtered-agg family

  private def filteredAggCase(extraAggs: String): Row = {
    val rows = run(
      s"""{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "aggregations": [$CommonAggs, $extraAggs],
        "postAggregations": [$AddRowsIndexConstant]
      }""").collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("rows") == 26L)
    assert(relEq(dbl(r, "index"), 12459.361190795898d), s"index: $r")
    assert(dbl(r, "uniques") == TestIndexFixture.Uniques9, s"uniques: $r")
    assert(relEq(dbl(r, "addRowsIndexConstant"), 12486.361190795898d), s"arc: $r")
    r
  }

  test("testTimeSeriesWithFilteredAgg (TimeseriesQueryRunnerTest.java:2199): " +
      "filtered count over market=spot inside common aggs — 18 of 26 rows") {
    val r = filteredAggCase(
      """{"type": "filtered", "name": "filteredAgg",
          "filter": {"type": "selector", "dimension": "market", "value": "spot"},
          "aggregator": {"type": "count", "name": "filteredAgg"}}""")
    assert(r.getAs[Long]("filteredAgg") == 18L)
  }

  test("testTimeSeriesWithFilteredAggAndExpressionFilteredAgg " +
      "(TimeseriesQueryRunnerTest.java:2244): expression-field long/double/" +
      "float sums of if(market=='spot',1,0) alongside the filtered count") {
    val r = filteredAggCase(
      """{"type": "filtered", "name": "filteredAgg",
          "filter": {"type": "selector", "dimension": "market", "value": "spot"},
          "aggregator": {"type": "count", "name": "filteredAgg"}},
         {"type": "longSum", "name": "altLongCount",
          "expression": "if (market == 'spot', 1, 0)"},
         {"type": "doubleSum", "name": "altDoubleCount",
          "expression": "if (market == 'spot', 1, 0)"},
         {"type": "floatSum", "name": "altFloatCount",
          "expression": "if (market == 'spot', 1, 0)"}""")
    assert(r.getAs[Long]("filteredAgg") == 18L)
    assert(r.getAs[Long]("altLongCount") == 18L)
    assert(dbl(r, "altDoubleCount") == 18.0)
    assert(dbl(r, "altFloatCount") == 18.0)
  }

  test("testTimeSeriesWithFilteredAggDimensionNotPresentNotNullValue " +
      "(TimeseriesQueryRunnerTest.java:2312): a selector on a NONEXISTENT " +
      "dimension with a non-null value matches nothing — filtered count 0") {
    val r = filteredAggCase(
      """{"type": "filtered", "name": "filteredAgg",
          "filter": {"type": "selector", "dimension": "abraKaDabra", "value": "Lol"},
          "aggregator": {"type": "count", "name": "filteredAgg"}}""")
    assert(r.getAs[Long]("filteredAgg") == 0L)
  }

  test("testTimeSeriesWithFilteredAggDimensionNotPresentNullValue " +
      "(TimeseriesQueryRunnerTest.java:2358): a selector on a NONEXISTENT " +
      "dimension with a null value matches every row — filtered count 26") {
    val r = filteredAggCase(
      """{"type": "filtered", "name": "filteredAgg",
          "filter": {"type": "selector", "dimension": "abraKaDabra", "value": null},
          "aggregator": {"type": "count", "name": "filteredAgg"}}""")
    assert(r.getAs[Long]("filteredAgg") == 26L)
  }

  test("testTimeSeriesWithFilteredAggValueNotPresent (TimeseriesQueryRunner" +
      "Test.java:2404): NOT(selector market='LolLol') matches all 26 rows") {
    val r = filteredAggCase(
      """{"type": "filtered", "name": "filteredAgg",
          "filter": {"type": "not", "field":
            {"type": "selector", "dimension": "market", "value": "LolLol"}},
          "aggregator": {"type": "count", "name": "filteredAgg"}}""")
    assert(r.getAs[Long]("filteredAgg") == 26L)
  }

  test("testTimeSeriesWithFilteredAggInvertedNullValue (TimeseriesQueryRunner" +
      "Test.java:2451): NOT(selector market=null) matches all 26 rows of a " +
      "never-null dimension") {
    val r = filteredAggCase(
      """{"type": "filtered", "name": "filteredAgg",
          "filter": {"type": "not", "field":
            {"type": "selector", "dimension": "market", "value": null}},
          "aggregator": {"type": "count", "name": "filteredAgg"}}""")
    assert(r.getAs[Long]("filteredAgg") == 26L)
  }

  // ------------------------------------------------------- time column agg

  test("testTimeseriesWithTimeColumn (TimeseriesQueryRunnerTest.java:2496): " +
      "longSum over __time reads the time column as epoch MILLIS " +
      "(sumtime = 13×(apr1 + apr2) = 33843139200000; the JS count-if " +
      "aggregator of the original is dropped — javascript non-goal)") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "sumtime", "fieldName": "__time"}
        ]
      }""").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("rows") == 26L)
    assert(rows(0).getAs[Long]("sumtime") == 33843139200000L)
  }

  // ------------------------------------------------------- filters (depth)

  test("testTimeseriesWithBoundFilter1 (TimeseriesQueryRunnerTest.java:2536): " +
      "AND of three lexicographic bounds — ('spa','spot'] ∩ ['spot','spotify')" +
      " ∩ ['SPOT','spot'] — selects exactly market='spot'") {
    val rows = run(
      s"""{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "and", "fields": [
          {"type": "bound", "dimension": "market", "lower": "spa",
           "upper": "spot", "lowerStrict": true, "ordering": "lexicographic"},
          {"type": "bound", "dimension": "market", "lower": "spot",
           "upper": "spotify", "upperStrict": true, "ordering": "lexicographic"},
          {"type": "bound", "dimension": "market", "lower": "SPOT",
           "upper": "spot", "ordering": "lexicographic"}
        ]},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "index", "fieldName": "index"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}
        ],
        "postAggregations": [$AddRowsIndexConstant]
      }""").collect()
      .map(r => (day(r), r.getAs[Long]("rows"), r.getAs[Long]("index"),
        dbl(r, "addRowsIndexConstant"), dbl(r, "uniques"))).toSeq
    assert(rows == Seq(
      ("2011-04-01", 9L, 1102L, 1112.0, TestIndexFixture.Uniques9),
      ("2011-04-02", 9L, 1120L, 1130.0, TestIndexFixture.Uniques9)),
      s"got:\n${rows.mkString("\n")}")
  }

  test("testTimeSeriesWithSelectionFilterLookupExtractionFn " +
      "(TimeseriesQueryRunnerTest.java:2873): selector market='upfront' " +
      "under a {spot→upfront} lookup with retainMissingValue matches both " +
      "spot and upfront rows — 11 per day") {
    val rows = run(
      s"""{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "selector", "dimension": "market", "value": "upfront",
          "extractionFn": {"type": "lookup",
            "lookup": {"type": "map", "map": {"spot": "upfront"}},
            "retainMissingValue": true, "injective": true, "optimize": true}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "index", "fieldName": "index"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}
        ],
        "postAggregations": [$AddRowsIndexConstant]
      }""").collect()
      .map(r => (day(r), r.getAs[Long]("rows"), r.getAs[Long]("index"),
        dbl(r, "addRowsIndexConstant"), dbl(r, "uniques"))).toSeq
    assert(rows == Seq(
      ("2011-04-01", 11L, 3783L, 3795.0, TestIndexFixture.Uniques9),
      ("2011-04-02", 11L, 3313L, 3325.0, TestIndexFixture.Uniques9)),
      s"got:\n${rows.mkString("\n")}")
  }

  // ------------------------------------------------- limit / ts result field

  test("testTimeseriesWithLimit (TimeseriesQueryRunnerTest.java:2939): " +
      "limit 10 truncates the full-coverage DAY spine to its first 10 buckets") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "limit": 10,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}
        ]
      }""").collect()
    assert(rows.length == 10)
    assert(day(rows.head) == "2011-01-12")
    assert(day(rows.last) == "2011-01-21")
  }

  test("testTimeseriesWithPostAggregatorReferencingTimestampResultField " +
      "(TimeseriesQueryRunnerTest.java:2970): the timestampResultField " +
      "context key materializes the bucket millis as a result column a " +
      "fieldAccess post-agg can read") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "selector", "dimension": "market", "value": "spot"},
        "postAggregations": [
          {"type": "fieldAccess", "name": "timestampInPostAgg", "fieldName": "myTimestamp"}
        ],
        "context": {"timestampResultField": "myTimestamp"}
      }""").collect()
      .map(r => (day(r), r.getAs[Long]("myTimestamp"),
        r.getAs[Long]("timestampInPostAgg"))).toSeq
    val apr1 = 1301616000000L // 2011-04-01T00:00:00Z
    val apr2 = 1301702400000L
    assert(rows == Seq(
      ("2011-04-01", apr1, apr1),
      ("2011-04-02", apr2, apr2)), s"got:\n${rows.mkString("\n")}")
  }

  // ------------------------------------------------- expression lambda aggs

  test("testTimeseriesWithExpressionAggregator (TimeseriesQueryRunnerTest" +
      ".java:3017): lambda count (no fields), lambda double sum, and " +
      "array_set_add distinct-collection per DAY (the original's " +
      "diy_decomposed_sum needs the initialCombineValue two-type combine " +
      "lifecycle — not supported, its value equals diy_sum here)") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "aggregations": [
          {"type": "expression", "name": "diy_count",
           "fields": [], "initialValue": "0",
           "isNullUnlessAggregated": false,
           "shouldAggregateNullInputs": false,
           "fold": "__acc + 1", "combine": "__acc + diy_count"},
          {"type": "expression", "name": "diy_sum",
           "fields": ["index"], "initialValue": "0.0",
           "shouldAggregateNullInputs": false,
           "fold": "__acc + index"},
          {"type": "expression", "name": "array_agg_distinct",
           "fields": ["market"], "accumulatorIdentifier": "acc",
           "initialValue": "[]",
           "shouldAggregateNullInputs": true,
           "fold": "array_set_add(acc, market)",
           "combine": "array_set_add_all(acc, array_agg_distinct)"}
        ]
      }""").collect()
    val expected = Seq(
      ("2011-04-01", 13L, 6626.151569d),
      ("2011-04-02", 13L, 5833.209718d))
    assert(rows.length == 2)
    rows.zip(expected).foreach { case (r, (d, c, s)) =>
      assert(day(r) == d)
      assert(r.getAs[Long]("diy_count") == c, s"$d count: $r")
      assert(relEq(dbl(r, "diy_sum"), s), s"$d sum: $r")
      assert(r.getAs[scala.collection.Seq[String]]("array_agg_distinct").sorted
        == Seq("spot", "total_market", "upfront"), s"$d distinct: $r")
    }
  }

  // ----------------------------------------------------- cardinality depth

  test("testTimeseriesCardinalityAggOnMultiStringExpression " +
      "(TimeseriesQueryRunnerTest.java:3167): cardinality over an expression " +
      "virtual column concat(quality,market) reproduces the reference's " +
      "HLLC estimate of the 13 distinct pairs EXACTLY (13.041435202975777)") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "virtualColumns": [
          {"type": "expression", "name": "v0",
           "expression": "concat(quality,market)", "outputType": "STRING"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "cardinality", "name": "numVals",
           "fields": ["v0"], "byRow": false}
        ]
      }""").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("rows") == 26L)
    assert(dbl(rows(0), "numVals") == 13.041435202975777d,
      s"numVals: ${dbl(rows(0), "numVals")}")
  }

  test("testTimeseriesCardinalityAggOnHyperUnique (TimeseriesQueryRunnerTest" +
      ".java:3204): cardinality over a stored COMPLEX column counts nothing " +
      "(0.0 — no dimension selector) while hyperUnique over the same column " +
      "unions the collectors to the exact UNIQUES_9") {
    val rows = run(
      """{
        "queryType": "timeseries",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "cardinality", "name": "cardinality",
           "fields": ["quality_uniques"], "byRow": false},
          {"type": "hyperUnique", "name": "hyperUnique", "fieldName": "quality_uniques"}
        ]
      }""").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("rows") == 26L)
    assert(dbl(rows(0), "cardinality") == 0.0d)
    assert(dbl(rows(0), "hyperUnique") == TestIndexFixture.Uniques9)
  }
}
