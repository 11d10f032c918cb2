package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 13 over the shared TestIndex fixture: the
  * lookup-extraction RENAME family (rebucket / retain-missing /
  * replace-missing flag combinations), the extraction-dim-FILTER family
  * (value-mapped-to-null-or-empty, search-value-not-in-map, null-key
  * replacement, many-to-one optimization, null dims under every filter
  * kind), the empty-string-producing extraction, dimFilter having specs
  * with extraction fns, and lookup + limit + sortByDimsFirst. Each test
  * cites its reference method. SQL-compatible null handling throughout
  * (the reference's non-replaceWithDefault branches). The reference's
  * JavaScript extraction/filter legs are adapted to JSON-expressible
  * equivalents (stringFormat / arithmetic-equivalent bounds) — javascript
  * is a documented non-goal.
  */
class QueryRunnerGoldenSpec13 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def day(r: Row): String =
    r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString

  private val FirstToThird =
    """["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]"""

  private def collect(df: DataFrame): Seq[(String, String, Long, Long)] =
    df.collect().map(r => (day(r), r.getAs[String]("alias"),
      r.getAs[Long]("rows"), r.getAs[Long]("idx")))
      .sortBy(t => (t._1, Option(t._2))).toSeq

  private val QualityRenameMap =
    """{"automotive": "automotive0", "business": "business0",
        "entertainment": "entertainment0", "health": "health0",
        "mezzanine": "mezzanine0", "news": "news0", "premium": "premium0",
        "technology": "technology0", "travel": "travel0"}"""

  test("testGroupByWithRebucketRename (:3043) / " +
      "testGroupByWithSimpleRenameRetainMissingNonInjective (:3114) / " +
      "testGroupByWithSimpleRenameRetainMissing (:3185) / " +
      "testGroupByWithSimpleRenameAndMissingString (:3239) " +
      "(GroupByQueryRunnerTest): every " +
      "retain/replace/injective flag combination over a total map produces " +
      "the same renamed DAY vector") {
    val expected = Seq(
      ("2011-04-01", "automotive0", 1L, 135L), ("2011-04-01", "business0", 1L, 118L),
      ("2011-04-01", "entertainment0", 1L, 158L), ("2011-04-01", "health0", 1L, 120L),
      ("2011-04-01", "mezzanine0", 3L, 2870L), ("2011-04-01", "news0", 1L, 121L),
      ("2011-04-01", "premium0", 3L, 2900L), ("2011-04-01", "technology0", 1L, 78L),
      ("2011-04-01", "travel0", 1L, 119L),
      ("2011-04-02", "automotive0", 1L, 147L), ("2011-04-02", "business0", 1L, 112L),
      ("2011-04-02", "entertainment0", 1L, 166L), ("2011-04-02", "health0", 1L, 113L),
      ("2011-04-02", "mezzanine0", 3L, 2447L), ("2011-04-02", "news0", 1L, 114L),
      ("2011-04-02", "premium0", 3L, 2505L), ("2011-04-02", "technology0", 1L, 97L),
      ("2011-04-02", "travel0", 1L, 126L))
    for (flags <- Seq(
        """"retainMissingValue": false, "injective": false""",
        """"retainMissingValue": true, "injective": false""",
        """"retainMissingValue": true, "injective": true""",
        """"replaceMissingValueWith": "MISSING", "injective": true""")) {
      val got = collect(run(s"""{
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FirstToThird,
          "dimensions": [{"type": "extraction", "dimension": "quality",
            "outputName": "alias",
            "extractionFn": {"type": "lookup",
              "lookup": {"type": "map", "map": $QualityRenameMap}, $flags}}],
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"}]
        }"""))
      assert(got == expected, s"flags=$flags:\n${got.mkString("\n")}")
    }
  }

  test("testGroupByWithExtractionDimFilterCaseMappingValueIsNullOrEmpty " +
      "(GroupByQueryRunnerTest.java:9039): filter value '' matches only the " +
      "key mapped to EMPTY STRING (news) — a null-mapped key (mezzanine) " +
      "does NOT match in SQL-compatible null handling") {
    val got = collect(run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "filter": {"type": "extraction", "dimension": "quality", "value": "",
          "extractionFn": {"type": "lookup",
            "lookup": {"type": "map", "map": {
              "automotive": "automotive0", "business": "business0",
              "entertainment": "entertainment0", "health": "health0",
              "mezzanine": null, "news": "", "premium": "premium0",
              "technology": "technology0", "travel": "travel0"}},
            "retainMissingValue": false, "injective": true}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }"""))
    assert(got == Seq(
      ("2011-04-01", "news", 1L, 121L), ("2011-04-02", "news", 1L, 114L)),
      got.mkString("\n"))
  }

  test("testGroupByWithExtractionDimFilterWhenSearchValueNotInTheMap " +
      "(GroupByQueryRunnerTest.java:9088): an empty lookup maps everything " +
      "to null — filtering for a non-null value matches nothing") {
    val rows = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "filter": {"type": "extraction", "dimension": "quality",
          "value": "NOT_THERE",
          "extractionFn": {"type": "lookup",
            "lookup": {"type": "map", "map": {}},
            "retainMissingValue": false, "injective": true}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }""").collect()
    assert(rows.isEmpty, rows.mkString("\n"))
  }

  test("testGroupByWithExtractionDimFilterKeyisNull (GroupByQueryRunnerTest" +
      ".java:9115): replaceMissingValueWith rewrites the null dimension — " +
      "the filter then matches every row and groups stay null") {
    val got = collect(run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "null_column", "outputName": "alias"}],
        "filter": {"type": "extraction", "dimension": "null_column",
          "value": "REPLACED_VALUE",
          "extractionFn": {"type": "lookup",
            "lookup": {"type": "map", "map": {"": "NOT_USED"}},
            "retainMissingValue": false,
            "replaceMissingValueWith": "REPLACED_VALUE"}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }"""))
    assert(got == Seq(
      ("2011-04-01", null, 13L, 6619L), ("2011-04-02", null, 13L, 5827L)),
      got.mkString("\n"))
  }

  test("testGroupByWithExtractionDimFilterOptimazitionManyToOne (GroupBy" +
      "QueryRunnerTest.java:9342): optimize=true rewrites the extraction " +
      "filter to an IN over the map's preimage — mezzanine+news match") {
    val got = collect(run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "filter": {"type": "extraction", "dimension": "quality",
          "value": "newsANDmezzanine",
          "extractionFn": {"type": "lookup",
            "lookup": {"type": "map", "map":
              {"mezzanine": "newsANDmezzanine", "news": "newsANDmezzanine"}},
            "retainMissingValue": false, "injective": true, "optimize": true}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }"""))
    assert(got == Seq(
      ("2011-04-01", "mezzanine", 3L, 2870L), ("2011-04-01", "news", 1L, 121L),
      ("2011-04-02", "mezzanine", 3L, 2447L), ("2011-04-02", "news", 1L, 114L)),
      got.mkString("\n"))
  }

  test("testGroupByWithExtractionDimFilterNullDims (GroupByQueryRunnerTest" +
      ".java:9381): a replace-missing extraction over an absent column " +
      "matches every row; the null groups aggregate whole days") {
    val got = collect(run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "null_column", "outputName": "alias"}],
        "filter": {"type": "extraction", "dimension": "null_column",
          "value": "EMPTY",
          "extractionFn": {"type": "lookup",
            "lookup": {"type": "map", "map": {"": "SHOULD_NOT_BE_USED"}},
            "retainMissingValue": false,
            "replaceMissingValueWith": "EMPTY", "optimize": true}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }"""))
    assert(got == Seq(
      ("2011-04-01", null, 13L, 6619L), ("2011-04-02", null, 13L, 5827L)),
      got.mkString("\n"))
  }

  test("testGroupByWithAllFiltersOnNullDimsWithExtractionFns (GroupByQuery" +
      "RunnerTest.java:9509): selector+in+bound+regex+search filters ANDed, " +
      "each applying a replace-missing extraction over the absent column " +
      "(the reference's sixth, javascript, leg is a documented non-goal)") {
    val exFn = """{"type": "lookup",
      "lookup": {"type": "map", "map": {"": "EMPTY"}},
      "retainMissingValue": false, "replaceMissingValueWith": "EMPTY",
      "optimize": true}"""
    val got = collect(run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "null_column", "outputName": "alias"}],
        "filter": {"type": "and", "fields": [
          {"type": "selector", "dimension": "null_column", "value": "EMPTY",
           "extractionFn": $exFn},
          {"type": "in", "dimension": "null_column",
           "values": ["NOT-EMPTY", "FOOBAR", "EMPTY"], "extractionFn": $exFn},
          {"type": "bound", "dimension": "null_column", "lower": "EMPTY",
           "upper": "EMPTY", "lowerStrict": false, "upperStrict": false,
           "ordering": "alphanumeric", "extractionFn": $exFn},
          {"type": "regex", "dimension": "null_column", "pattern": "EMPTY",
           "extractionFn": $exFn},
          {"type": "search", "dimension": "null_column",
           "query": {"type": "contains", "value": "EMPTY", "caseSensitive": true},
           "extractionFn": $exFn}]},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }"""))
    assert(got == Seq(
      ("2011-04-01", null, 13L, 6619L), ("2011-04-02", null, 13L, 5827L)),
      got.mkString("\n"))
  }

  test("testGroupByWithEmptyStringProducingDimExtractionFn (GroupByQuery" +
      "RunnerTest.java:3614): an extraction producing EMPTY STRING groups " +
      "'' distinct from null (expressed as regex-first-letter cascaded " +
      "into a lookup mapping m→'' — the reference uses an inline fn " +
      "subclass with the same value behavior)") {
    val got = collect(run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "extraction", "dimension": "quality",
          "outputName": "alias",
          "extractionFn": {"type": "cascade", "extractionFns": [
            {"type": "regex", "expr": "(\\\\w{1})"},
            {"type": "lookup", "lookup": {"type": "map", "map": {"m": ""}},
             "retainMissingValue": true}]}}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }"""))
    assert(got == Seq(
      ("2011-04-01", "", 3L, 2870L), ("2011-04-01", "a", 1L, 135L),
      ("2011-04-01", "b", 1L, 118L), ("2011-04-01", "e", 1L, 158L),
      ("2011-04-01", "h", 1L, 120L), ("2011-04-01", "n", 1L, 121L),
      ("2011-04-01", "p", 3L, 2900L), ("2011-04-01", "t", 2L, 197L),
      ("2011-04-02", "", 3L, 2447L), ("2011-04-02", "a", 1L, 147L),
      ("2011-04-02", "b", 1L, 112L), ("2011-04-02", "e", 1L, 166L),
      ("2011-04-02", "h", 1L, 113L), ("2011-04-02", "n", 1L, 114L),
      ("2011-04-02", "p", 3L, 2505L), ("2011-04-02", "t", 2L, 223L)),
      got.mkString("\n"))
  }

  test("testDimFilterHavingSpecWithExtractionFns (GroupByQueryRunnerTest" +
      ".java:5217): dimFilter having with extraction fns over AGGREGATED " +
      "columns — stringFormat selector on idx OR a numeric bound on rows " +
      "(the reference's javascript num+10 leg expressed as the equivalent " +
      "bound, javascript being a documented non-goal)") {
    val got = collect(run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": {"type": "period", "period": "P1M"},
        "intervals": ["2011-04-02T00:00:00.000Z/2011-04-04T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "having": {"type": "filter", "filter": {"type": "or", "fields": [
          {"type": "bound", "dimension": "rows", "lower": "2",
           "lowerStrict": true, "ordering": "numeric"},
          {"type": "selector", "dimension": "idx", "value": "super-217",
           "extractionFn": {"type": "stringFormat", "format": "super-%s"}}]}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }"""))
    assert(got == Seq(
      ("2011-04-01", "business", 2L, 217L),
      ("2011-04-01", "mezzanine", 6L, 4420L),
      ("2011-04-01", "premium", 6L, 4416L)), got.mkString("\n"))
  }

  test("testGroupByWithLookupAndLimitAndSortByDimsFirst (GroupByQueryRunner" +
      "Test.java:4852): alphanumeric limit over a digit-valued lookup with " +
      "sortByDimsFirst — dim-major, bucket-minor, first 11 rows") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "extraction", "dimension": "quality",
          "outputName": "alias",
          "extractionFn": {"type": "lookup",
            "lookup": {"type": "map", "map": {
              "automotive": "9", "business": "8", "entertainment": "7",
              "health": "6", "mezzanine": "5", "news": "4", "premium": "3",
              "technology": "2", "travel": "1"}},
            "retainMissingValue": false, "injective": false}}],
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "alias", "dimensionOrder": "alphanumeric"}],
          "limit": 11},
        "context": {"sortByDimsFirst": true},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).toSeq
    assert(got == Seq(
      ("2011-04-01", "1", 1L, 119L), ("2011-04-02", "1", 1L, 126L),
      ("2011-04-01", "2", 1L, 78L), ("2011-04-02", "2", 1L, 97L),
      ("2011-04-01", "3", 3L, 2900L), ("2011-04-02", "3", 3L, 2505L),
      ("2011-04-01", "4", 1L, 121L), ("2011-04-02", "4", 1L, 114L),
      ("2011-04-01", "5", 3L, 2870L), ("2011-04-02", "5", 3L, 2447L),
      ("2011-04-01", "6", 1L, 120L)), got.mkString("\n"))
  }
}
