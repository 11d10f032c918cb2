package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 20 over the shared TestIndex fixture: the Search
  * and Scan runner tails. Search: AND-filtered searches, single-filter
  * searches, the same-value-in-multiple-dims pair (per-ELEMENT counts over
  * the MV dimension), string extractions over long (__time) and double
  * columns. Scan: the full-on select pair (virtual column over every row),
  * dims+mets projections, and filter+limit+time-ordering slices in both
  * directions. Each test cites its reference method.
  *
  * Adjudicated not-portable here: testSearchHitSerDe (Jackson SerDe of the
  * reference's SearchHit POJO — no analog), testSearchWithCardinality (a
  * doubly-merged segment fixture — segment-merge infrastructure, the query
  * semantics are covered by the other search cases),
  * testScanQueryTimeout / testScanQueryTimeoutMerge /
  * testScanQueryTimeoutZeroDoesntTimeOut (query-runner timeout
  * plumbing — the HTTP facade's timeout surface is spec'd in
  * HttpFacadeSpec), and the CompactedList RESULT FORMAT variants (a
  * wire-level rendering of the same rows — the row content is asserted
  * here; resultFormats are an HTTP-surface concern).
  */
class QueryRunnerGoldenSpec20 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private val FullOn =
    """["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]"""
  private val I_0112_0114 =
    """["2011-01-12T00:00:00.000Z/2011-01-14T00:00:00.000Z"]"""

  private def hits(json: String): Set[(String, String, Long)] =
    run(json).collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  private def searchJson(body: String): String =
    s"""{
      "queryType": "search", "dataSource": "testIndex",
      "granularity": "all", "intervals": $FullOn,
      $body
    }"""

  // ------------------------------------------------------------- search

  test("testSearchWithSingleFilter2 (:421) / testSearchMultiAndFilter " +
      "(:440) (SearchQueryRunnerTest): selector and AND filters restrict " +
      "the searched rows before matching") {
    assert(hits(searchJson(
      """"searchDimensions": ["market"],
         "filter": {"type": "selector", "dimension": "market", "value": "total_market"},
         "query": {"type": "insensitive_contains", "value": "a"}"""))
      == Set(("market", "total_market", 186L)))
    assert(hits(searchJson(
      """"searchDimensions": ["quality"],
         "filter": {"type": "and", "fields": [
           {"type": "selector", "dimension": "market", "value": "spot"},
           {"type": "selector", "dimension": "quality", "value": "automotive"}]},
         "query": {"type": "insensitive_contains", "value": "a"}"""))
      == Set(("quality", "automotive", 93L)))
  }

  test("testSearchSameValueInMultiDims (:200) / " +
      "testSearchSameValueInMultiDims2 (:224) (SearchQueryRunnerTest): " +
      "'e' matches placement 'preferred' per row and placementish " +
      "per ELEMENT — dim order in the spec does not change the hit set") {
    val expected = Set(
      ("placement", "preferred", 1209L),
      ("placementish", "e", 93L),
      ("placementish", "preferred", 1209L))
    assert(hits(searchJson(
      """"searchDimensions": ["placement", "placementish"],
         "query": {"type": "insensitive_contains", "value": "e"}""")) == expected)
    assert(hits(searchJson(
      """"searchDimensions": ["placementish", "placement"],
         "query": {"type": "insensitive_contains", "value": "e"}""")) == expected)
  }

  test("testSearchOnLongColumnWithExFn (SearchQueryRunnerTest.java:646): a " +
      "string extraction over __time searches the prefixed epoch millis " +
      "(the reference's javascript prefix as stringFormat)") {
    assert(hits(searchJson(
      """"searchDimensions": [{"type": "extraction", "dimension": "__time",
           "outputName": "__time",
           "extractionFn": {"type": "stringFormat", "format": "super-%s"}}],
         "query": {"type": "insensitive_contains", "value": "1297123200000"}"""))
      == Set(("__time", "super-1297123200000", 13L)))
  }

  test("testSearchOnFloatColumnWithExFn (SearchQueryRunnerTest.java:694): a " +
      "string extraction over the double index column — two single-row hits " +
      "containing '100.7'") {
    assert(hits(searchJson(
      """"searchDimensions": [{"type": "extraction", "dimension": "index",
           "outputName": "index",
           "extractionFn": {"type": "stringFormat", "format": "super-%s"}}],
         "query": {"type": "insensitive_contains", "value": "100.7"}"""))
      == Set(("index", "super-100.706057", 1L), ("index", "super-100.775597", 1L)))
  }

  test("testSearchWithDimensionProvider shape (SearchQueryRunnerTest): a " +
      "bare market provider under query 'a' — only total_market contains " +
      "an 'a'") {
    assert(hits(searchJson(
      """"searchDimensions": ["market"],
         "query": {"type": "insensitive_contains", "value": "a"}"""))
      == Set(("market", "total_market", 186L)))
  }

  // ------------------------------------------------------------- scan

  test("testFullOnSelect (:206) / testFullOnSelectAsCompactedList (:226) " +
      "(ScanQueryRunnerTest): a full scan with the expr virtual column " +
      "(index + 10 as " +
      "FLOAT) over the first two days — 26 rows, expr tracks index") {
    val got = run(s"""{
        "queryType": "scan", "dataSource": "testIndex",
        "intervals": $I_0112_0114,
        "virtualColumns": [{"type": "expression", "name": "expr",
          "expression": "index + 10", "outputType": "FLOAT"}]
      }""").collect()
    assert(got.length == 26, got.length.toString)
    got.foreach { r =>
      val idx = r.getAs[Double]("index")
      val expr = r.getAs[Float]("expr")
      assert(math.abs(expr - (idx + 10)) < 0.01, s"$expr vs ${idx + 10}")
    }
  }

  test("testSelectWithDimsAndMets (:299) / " +
      "testSelectWithDimsAndMetsAsCompactedList (:340) (ScanQueryRunnerTest): " +
      "a two-column projection keeps exactly market + index") {
    val df = run(s"""{
        "queryType": "scan", "dataSource": "testIndex",
        "intervals": $I_0112_0114,
        "columns": ["market", "index"]
      }""")
    assert(df.columns.toSeq == Seq("market", "index"))
    val got = df.collect()
    assert(got.length == 26)
    assert(got.map(_.getAs[String]("market")).toSet ==
      Set("spot", "total_market", "upfront"))
  }

  test("testFullOnSelectWithFilterLimitAndAscendingTimeOrderingCompactedListFormat " +
      "(:745) / " +
      "testFullOnSelectWithFilterLimitAndDescendingTimeOrderingCompactedListFormat " +
      "(:834) (ScanQueryRunnerTest): " +
      "filter spot + time order asc/desc with limits 3/1/5 — slices of " +
      "the 18 spot rows") {
    for (limit <- Seq(3, 1, 5); asc <- Seq(true, false)) {
      val got = run(s"""{
          "queryType": "scan", "dataSource": "testIndex",
          "intervals": $I_0112_0114,
          "filter": {"type": "selector", "dimension": "market", "value": "spot"},
          "columns": ["__time", "market", "index"],
          "order": "${if (asc) "ascending" else "descending"}",
          "limit": $limit
        }""").collect()
      assert(got.length == limit, s"limit=$limit asc=$asc: ${got.length}")
      assert(got.forall(_.getAs[String]("market") == "spot"))
      val times = got.map(_.getAs[java.time.LocalDateTime]("__time").toString)
      val sorted = if (asc) times.sorted else times.sorted.reverse
      assert(times.toSeq == sorted.toSeq, times.mkString(","))
    }
  }
}
