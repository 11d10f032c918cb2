package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 6 over the shared TestIndex fixture
  * ([[TestIndexFixture]]): SearchQueryRunnerTest.java and
  * ScanQueryRunnerTest.java depth — search across default (all) dimensions,
  * filtered search, fragment specs, empty results, missing dimensions vs
  * null values, numeric sort, extraction and typed dimensions over __time
  * and the float metric; scan column projection (incl. __time and
  * nonexistent columns), filters with lookup extraction, limit-0-unlimited,
  * and ascending/descending time ordering with segment-row-order tie
  * breaking. Each test cites its reference method and asserts the
  * reference's published vectors.
  *
  * JavaScript extractions are expressed as stringFormat and noted per test
  * (javascript is a declared non-goal).
  */
class QueryRunnerGoldenSpec6 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def hits(json: String): Set[(String, String, Long)] =
    run(json).collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  private def searchJson(body: String): String =
    s"""{
      "queryType": "search",
      "dataSource": "testIndex",
      "granularity": "all",
      "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
      $body
    }"""

  // ------------------------------------------------------------- search

  test("testSearchWithDimensionQuality (SearchQueryRunnerTest.java:265): " +
      "'a' restricted to the quality dimension") {
    val got = hits(searchJson(
      """"searchDimensions": ["quality"],
         "query": {"type": "insensitive_contains", "value": "a"}"""))
    assert(got == Set(
      ("quality", "automotive", 93L), ("quality", "mezzanine", 279L),
      ("quality", "travel", 93L), ("quality", "health", 93L),
      ("quality", "entertainment", 93L)), s"got $got")
  }

  test("testSearchWithDimensionsQualityAndProvider (SearchQueryRunnerTest" +
      ".java:305): 'a' over quality + market") {
    val got = hits(searchJson(
      """"searchDimensions": ["quality", "market"],
         "query": {"type": "insensitive_contains", "value": "a"}"""))
    assert(got == Set(
      ("quality", "automotive", 93L), ("quality", "mezzanine", 279L),
      ("quality", "travel", 93L), ("quality", "health", 93L),
      ("quality", "entertainment", 93L), ("market", "total_market", 186L)),
      s"got $got")
  }

  test("testSearchWithDimensionsPlacementAndProvider (SearchQueryRunnerTest" +
      ".java:333): 'mark' over placementish + market hits only total_market") {
    val got = hits(searchJson(
      """"searchDimensions": ["placementish", "market"],
         "query": {"type": "insensitive_contains", "value": "mark"}"""))
    assert(got == Set(("market", "total_market", 186L)), s"got $got")
  }

  test("testFragmentSearch (SearchQueryRunnerTest.java:249): ALL fragments " +
      "must match — ['auto','ve'] hits only automotive") {
    val got = hits(searchJson(
      """"query": {"type": "fragment", "values": ["auto", "ve"]}"""))
    assert(got == Set(("quality", "automotive", 93L)), s"got $got")
  }

  test("testSearchWithSingleFilter1 (SearchQueryRunnerTest.java:397): " +
      "filtered to total_market×mezzanine, searching quality for 'a'") {
    val got = hits(searchJson(
      """"searchDimensions": ["quality"],
         "filter": {"type": "and", "fields": [
           {"type": "selector", "dimension": "market", "value": "total_market"},
           {"type": "selector", "dimension": "quality", "value": "mezzanine"}]},
         "query": {"type": "insensitive_contains", "value": "a"}"""))
    assert(got == Set(("quality", "mezzanine", 93L)), s"got $got")
  }

  test("testSearchWithMultiOrFilter (SearchQueryRunnerTest.java:464): OR of " +
      "two quality selectors — one matches nothing") {
    val got = hits(searchJson(
      """"searchDimensions": ["quality"],
         "filter": {"type": "or", "fields": [
           {"type": "selector", "dimension": "quality", "value": "total_market"},
           {"type": "selector", "dimension": "quality", "value": "automotive"}]},
         "query": {"type": "insensitive_contains", "value": "a"}"""))
    assert(got == Set(("quality", "automotive", 93L)), s"got $got")
  }

  test("testSearchWithEmptyResults + testSearchWithFilterEmptyResults " +
      "(SearchQueryRunnerTest.java:488,504): no value match / a " +
      "contradictory AND filter both yield zero hits") {
    assert(hits(searchJson(
      """"query": {"type": "insensitive_contains", "value": "abcd123"}""")).isEmpty)
    assert(hits(searchJson(
      """"filter": {"type": "and", "fields": [
           {"type": "selector", "dimension": "market", "value": "total_market"},
           {"type": "selector", "dimension": "quality", "value": "automotive"}]},
         "query": {"type": "insensitive_contains", "value": "a"}""")).isEmpty)
  }

  test("testSearchNonExistingDimension + testSearchWithNotExistedDimension " +
      "(SearchQueryRunnerTest.java:527,772): a MISSING dimension has no " +
      "selector — zero hits even under a match-all query") {
    assert(hits(searchJson(
      """"searchDimensions": ["does_not_exist"],
         "query": {"type": "insensitive_contains", "value": "a"}""")).isEmpty)
    assert(hits(searchJson(""""searchDimensions": ["asdf"]""")).isEmpty)
  }

  test("testSearchAll (SearchQueryRunnerTest.java:544): the empty-string " +
      "spec and the ABSENT query both match every market value") {
    val expected = Set(
      ("market", "spot", 837L), ("market", "total_market", 186L),
      ("market", "upfront", 186L))
    assert(hits(searchJson(
      """"searchDimensions": ["market"],
         "query": {"type": "insensitive_contains", "value": ""}""")) == expected)
    assert(hits(searchJson(""""searchDimensions": ["market"]""")) == expected)
  }

  test("testSearchWithNumericSort (SearchQueryRunnerTest.java:573): 'a' over " +
      "DEFAULT (all) dimensions, hits ordered by VALUE under the numeric " +
      "comparator") {
    val got = run(searchJson(
      """"query": {"type": "insensitive_contains", "value": "a"},
         "sort": {"type": "numeric"}"""))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("placementish", "a", 93L),
      ("quality", "automotive", 93L),
      ("quality", "entertainment", 93L),
      ("quality", "health", 93L),
      ("quality", "mezzanine", 279L),
      ("market", "total_market", 186L),
      ("quality", "travel", 93L),
      ("partial_null_column", "value", 186L)), s"got:\n${got.mkString("\n")}")
  }

  test("testSearchOnTime (SearchQueryRunnerTest.java:597): a timeFormat " +
      "EEEE extraction over __time searched for 'Friday' — 13 Fridays of " +
      "13 rows") {
    val got = hits(searchJson(
      """"searchDimensions": [{"type": "extraction", "dimension": "__time",
           "outputName": "__time2",
           "extractionFn": {"type": "timeFormat", "format": "EEEE"}}],
         "query": {"type": "insensitive_contains", "value": "Friday"}"""))
    assert(got == Set(("__time2", "Friday", 169L)), s"got $got")
  }

  test("testSearchOnLongColumn + WithExFn (SearchQueryRunnerTest.java:624," +
      "646): __time as a LONG dimension searches its millis string; a " +
      "non-time extraction sees the millis (stringFormat for the JS concat)") {
    assert(hits(searchJson(
      """"searchDimensions": [{"type": "default", "dimension": "__time",
           "outputName": "__time", "outputType": "LONG"}],
         "query": {"type": "contains", "value": "1297123200000"}"""))
      == Set(("__time", "1297123200000", 13L)))
    assert(hits(searchJson(
      """"searchDimensions": [{"type": "extraction", "dimension": "__time",
           "outputName": "__time",
           "extractionFn": {"type": "stringFormat", "format": "super-%s"}}],
         "query": {"type": "contains", "value": "1297123200000"}"""))
      == Set(("__time", "super-1297123200000", 13L)))
  }

  test("testSearchOnFloatColumn + WithExFn (SearchQueryRunnerTest.java:671," +
      "694): search renders numeric hit values from the column's NATIVE " +
      "float32 type — a default spec's outputType does not re-type the hit") {
    assert(hits(searchJson(
      """"searchDimensions": [{"type": "default", "dimension": "index",
           "outputName": "index", "outputType": "DOUBLE"}],
         "query": {"type": "contains", "value": "100.7"}"""))
      == Set(("index", "100.706057", 1L), ("index", "100.775597", 1L)))
    assert(hits(searchJson(
      """"searchDimensions": [{"type": "extraction", "dimension": "index",
           "outputName": "index",
           "extractionFn": {"type": "stringFormat", "format": "super-%s"}}],
         "query": {"type": "contains", "value": "100.7"}"""))
      == Set(("index", "super-100.706057", 1L), ("index", "super-100.775597", 1L)))
  }

  test("testSearchWithExtractionFilter1 (SearchQueryRunnerTest.java:357): a " +
      "retainMissingValue lookup maps automotive→automotive☃ in BOTH the " +
      "filter and the searched dimension") {
    val got = hits(searchJson(
      """"searchDimensions": [{"type": "extraction", "dimension": "quality",
           "extractionFn": {"type": "lookup",
             "lookup": {"type": "map", "map": {"automotive": "automotive☃"}},
             "retainMissingValue": true, "injective": true, "optimize": true}}],
         "filter": {"type": "selector", "dimension": "quality", "value": "automotive☃",
           "extractionFn": {"type": "lookup",
             "lookup": {"type": "map", "map": {"automotive": "automotive☃"}},
             "retainMissingValue": true, "injective": true, "optimize": true}},
         "query": {"type": "contains", "value": "☃"}"""))
    assert(got == Set(("quality", "automotive☃", 93L)), s"got $got")
  }

  test("testSearchWithNullValueInDimension (SearchQueryRunnerTest.java:720): " +
      "a PRESENT column's null values DO hit a match-all query (sql-" +
      "compatible null mode), unlike missing dimensions") {
    val got = NativeQuery.run(spark,
      """{
        "queryType": "search",
        "dataSource": {"type": "inline",
          "columnNames": ["__time", "name", "tbl"],
          "columnTypes": ["STRING", "STRING", "STRING"],
          "rows": [["2016-12-16T07:00:00.000Z", "name1", null],
                   ["2016-12-16T07:01:10.000Z", "name2", "table"]]},
        "granularity": "all",
        "searchDimensions": ["tbl"]
      }""", _ => testIndex).collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2))).toSet
    assert(got == Set(("tbl", Some("table"), 1L), ("tbl", None, 1L)), s"got $got")
  }

  // --------------------------------------------------------------- scan

  private def scanJson(body: String): String =
    s"""{
      "queryType": "scan",
      "dataSource": "testIndex",
      "intervals": ["2011-01-12T00:00:00.000Z/2011-01-14T00:00:00.000Z"],
      $body
    }"""

  test("testSelectWithUnderscoreUnderscoreTime (ScanQueryRunnerTest.java:246): " +
      "projecting __time alongside a dim and a metric — 26 rows over the " +
      "two-day window") {
    val rows = run(scanJson(""""columns": ["__time", "market", "index"]""")).collect()
    assert(rows.length == 26)
    assert(rows.head.schema.fieldNames.toSeq == Seq("__time", "market", "index"))
    val perDay = rows.groupBy(_.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString)
      .view.mapValues(_.length).toMap
    assert(perDay == Map("2011-01-12" -> 13, "2011-01-13" -> 13), s"got $perDay")
  }

  test("testFullOnSelectWithFilterAndLimit (ScanQueryRunnerTest.java:372): " +
      "market=spot over two days projects 18 rows; limits {3,1,5,7} " +
      "truncate and limit 0 is UNLIMITED") {
    for (limit <- Seq(3, 1, 5, 7, 0)) {
      val rows = run(scanJson(
        s""""filter": {"type": "selector", "dimension": "market", "value": "spot"},
           "columns": ["quality", "index"],
           "limit": $limit""")).collect()
      val expected = if (limit == 0) 18 else math.min(limit, 18)
      assert(rows.length == expected, s"limit $limit: got ${rows.length}")
      assert(rows.head.schema.fieldNames.toSeq == Seq("quality", "index"))
    }
  }

  test("testSelectWithFilterLookupExtractionFn (ScanQueryRunnerTest.java:430): " +
      "a non-retaining lookup maps only total_market→replaced; the selector " +
      "keeps its 4 rows") {
    val rows = run(scanJson(
      """"filter": {"type": "selector", "dimension": "market", "value": "replaced",
           "extractionFn": {"type": "lookup",
             "lookup": {"type": "map", "map": {"total_market": "replaced"}},
             "retainMissingValue": false, "injective": true, "optimize": true}},
         "columns": ["quality", "index"]""")).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("mezzanine", "mezzanine", "premium", "premium"))
  }

  test("testFullSelectNoResults (ScanQueryRunnerTest.java:487): an AND of " +
      "two different selector values on one dimension scans nothing") {
    val rows = run(scanJson(
      """"filter": {"type": "and", "fields": [
           {"type": "selector", "dimension": "market", "value": "spot"},
           {"type": "selector", "dimension": "market", "value": "foo"}]}""")).collect()
    assert(rows.isEmpty)
  }

  test("testFullSelectNoDimensionAndMetric (ScanQueryRunnerTest.java:509): " +
      "projecting only NONEXISTENT columns still returns every row, " +
      "null-valued") {
    val rows = run(scanJson(""""columns": ["foo", "foo2"]""")).collect()
    assert(rows.length == 26)
    assert(rows.head.schema.fieldNames.toSeq == Seq("foo", "foo2"))
    assert(rows.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("testFullOnSelectWithFilterLimitAndAscendingTimeOrderingListFormat " +
      "(ScanQueryRunnerTest.java:534): ascending time order breaks " +
      "timestamp ties in SEGMENT ROW ORDER — the file's quality sequence") {
    val fileOrder = Seq("automotive", "business", "entertainment", "health",
      "mezzanine", "news", "premium", "technology", "travel")
    val full = fileOrder ++ fileOrder // 01-12 then 01-13
    for (limit <- Seq(3, 1, 5, 7, 0)) {
      val rows = run(scanJson(
        s""""filter": {"type": "selector", "dimension": "market", "value": "spot"},
           "columns": ["__time", "quality", "index"],
           "order": "ascending",
           "limit": $limit""")).collect()
      val expected = if (limit == 0) full else full.take(limit)
      assert(rows.map(_.getString(1)).toSeq == expected, s"limit $limit")
    }
  }

  test("testFullOnSelectWithFilterLimitAndDescendingTimeOrderingListFormat " +
      "(ScanQueryRunnerTest.java:622): descending time order reverses the " +
      "row order entirely — reverse file order within equal timestamps") {
    val fileOrder = Seq("automotive", "business", "entertainment", "health",
      "mezzanine", "news", "premium", "technology", "travel")
    val fullDesc = (fileOrder ++ fileOrder).reverse
    for (limit <- Seq(3, 1, 5, 7, 0)) {
      val rows = run(scanJson(
        s""""filter": {"type": "selector", "dimension": "market", "value": "spot"},
           "columns": ["__time", "quality", "index"],
           "order": "descending",
           "limit": $limit""")).collect()
      val expected = if (limit == 0) fullDesc else fullDesc.take(limit)
      assert(rows.map(_.getString(1)).toSeq == expected, s"limit $limit")
    }
  }
}
