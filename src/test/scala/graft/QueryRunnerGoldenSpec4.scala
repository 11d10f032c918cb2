package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 4 over the shared TestIndex fixture
  * ([[TestIndexFixture]]): GroupByQueryRunnerTest.java depth — duration
  * granularity, aggregator-less groupBy, order/having on hyperUnique metrics
  * (raw and finalized), subqueries with different intervals and with
  * post-aggregators, grouping on COMPLEX columns, __time as a typed LONG
  * dimension (plain and extraction), numeric-string dims re-typed in a
  * nested query, nullable numeric dims under an implicit limit ordering, and
  * a timestamp_floor virtual-column dimension. Each test cites its reference
  * method and asserts the reference's published result vectors.
  *
  * JavaScript pieces are expressed with engine equivalents and noted per
  * test (javascript is a declared non-goal).
  */
class QueryRunnerGoldenSpec4 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def day(r: Row): String =
    r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString

  private def dbl(r: Row, name: String): Double =
    r.getAs[Number](name).doubleValue()

  // the per-(day, quality) longSum(index) base vectors of FIRST_TO_THIRD —
  // GroupByQueryRunnerTest.testGroupBy's published expected rows
  private val BaseDay1 = Seq(
    ("automotive", 1L, 135L), ("business", 1L, 118L), ("entertainment", 1L, 158L),
    ("health", 1L, 120L), ("mezzanine", 3L, 2870L), ("news", 1L, 121L),
    ("premium", 3L, 2900L), ("technology", 1L, 78L), ("travel", 1L, 119L))
  private val BaseDay2 = Seq(
    ("automotive", 1L, 147L), ("business", 1L, 112L), ("entertainment", 1L, 166L),
    ("health", 1L, 113L), ("mezzanine", 3L, 2447L), ("news", 1L, 114L),
    ("premium", 3L, 2505L), ("technology", 1L, 97L), ("travel", 1L, 126L))

  test("testGroupByWithDurationGranularity (GroupByQueryRunnerTest.java:1164): " +
      "duration 86400 MILLIS (1.44 min, not a day) still buckets the " +
      "midnight-stamped rows one bucket per day — at floor(midnight, 86400ms), " +
      "not at midnight") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": {"type": "duration", "duration": 86400},
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ]
      }""").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("__time"),
        r.getAs[String]("alias"), r.getAs[Long]("rows"), r.getAs[Long]("idx")))
      .sortBy(t => (t._1.toString, t._2))
    def floor86400(isoDay: String): java.time.LocalDateTime = {
      val ms = java.time.LocalDate.parse(isoDay).atStartOfDay()
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ms - ms % 86400L), java.time.ZoneOffset.UTC)
    }
    val expected =
      BaseDay1.map { case (a, r, i) => (floor86400("2011-04-01"), a, r, i) } ++
      BaseDay2.map { case (a, r, i) => (floor86400("2011-04-02"), a, r, i) }
    assert(rows.toSeq == expected, s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByNoAggregators (GroupByQueryRunnerTest.java:1264): an " +
      "aggregator-less groupBy emits the distinct (day, quality) rows with " +
      "no metric columns") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}]
      }""").collect()
    assert(rows.head.schema.fieldNames.toSeq == Seq("__time", "alias"))
    val got = rows.map(r => (day(r), r.getAs[String]("alias"))).sortBy(t => (t._1, t._2))
    val qualities = Seq("automotive", "business", "entertainment", "health",
      "mezzanine", "news", "premium", "technology", "travel")
    val expected = qualities.map(("2011-04-01", _)) ++ qualities.map(("2011-04-02", _))
    assert(got.toSeq == expected.sortBy(t => (t._1, t._2)), s"got:\n${got.mkString("\n")}")
  }

  // ------------------------------------------------ hyperUnique order/having

  private val UniquesAggs =
    """{"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}"""
  private val FinalizingPostAgg =
    """{"type": "hyperUniqueCardinality", "name": "hyperUniqueFinalizingPostAggMetric",
        "fieldName": "uniques"}"""

  private def marketUniques(limitSpec: String, having: String): Seq[(String, Double, Double)] =
    run(
      s"""{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "market", "outputName": "market"}],
        "aggregations": [$UniquesAggs],
        "postAggregations": [$FinalizingPostAgg],
        "limitSpec": $limitSpec
        $having
      }""").collect()
      .map(r => (r.getAs[String]("market"), dbl(r, "uniques"),
        dbl(r, "hyperUniqueFinalizingPostAggMetric"))).toSeq

  test("testGroupByWithOrderOnHyperUnique (GroupByQueryRunnerTest.java:4561): " +
      "limitSpec ordering DESCENDING on the uniques metric — spot's 9 " +
      "estimate first, the 2-estimate tie keeps dimension order") {
    val rows = marketUniques(
      """{"type": "default", "limit": 3,
          "columns": [{"dimension": "uniques", "direction": "descending"}]}""", "")
    assert(rows == Seq(
      ("spot", TestIndexFixture.Uniques9, TestIndexFixture.Uniques9),
      ("total_market", TestIndexFixture.Uniques2, TestIndexFixture.Uniques2),
      ("upfront", TestIndexFixture.Uniques2, TestIndexFixture.Uniques2)),
      s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByWithHavingOnHyperUnique (GroupByQueryRunnerTest.java:4627): " +
      "greaterThan having on the RAW uniques metric keeps only spot") {
    val rows = marketUniques(
      """{"type": "default", "limit": 3,
          "columns": [{"dimension": "uniques", "direction": "descending"}]}""",
      """, "having": {"type": "greaterThan", "aggregation": "uniques", "value": 8}""")
    assert(rows == Seq(
      ("spot", TestIndexFixture.Uniques9, TestIndexFixture.Uniques9)),
      s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByWithHavingOnFinalizedHyperUnique (GroupByQueryRunnerTest" +
      ".java:4676): having and ordering on the FINALIZING POST-AGG name " +
      "behave identically — having evaluates after post-aggregation") {
    val rows = marketUniques(
      """{"type": "default", "limit": 3,
          "columns": [{"dimension": "hyperUniqueFinalizingPostAggMetric",
                       "direction": "descending"}]}""",
      """, "having": {"type": "greaterThan",
          "aggregation": "hyperUniqueFinalizingPostAggMetric", "value": 8}""")
    assert(rows == Seq(
      ("spot", TestIndexFixture.Uniques9, TestIndexFixture.Uniques9)),
      s"got:\n${rows.mkString("\n")}")
  }

  // ----------------------------------------------------------- subqueries

  test("testDifferentIntervalSubquery (GroupByQueryRunnerTest.java:5861): the " +
      "outer SECOND_ONLY interval clips the inner FIRST_TO_THIRD result — " +
      "doubleMax over 2011-04-02 only") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "granularity": "day",
        "intervals": ["2011-04-02T00:00:00.000Z/P1D"],
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy",
          "dataSource": "testIndex",
          "granularity": "day",
          "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
          "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"}
          ]
        }},
        "dimensions": [],
        "aggregations": [{"type": "doubleMax", "name": "idx", "fieldName": "idx"}]
      }""").collect()
    assert(rows.length == 1)
    assert(day(rows(0)) == "2011-04-02")
    assert(dbl(rows(0), "idx") == 2505.0)
  }

  test("testSubqueryWithPostAggregators (GroupByQueryRunnerTest.java:6001): " +
      "the outer query re-aggregates the inner's ARITHMETIC POST-AGG column " +
      "and applies its own post-agg on top (identity JS dim filter dropped — " +
      "javascript non-goal)") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy",
          "dataSource": "testIndex",
          "granularity": "day",
          "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
          "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx_subagg", "fieldName": "index"}
          ],
          "postAggregations": [
            {"type": "arithmetic", "name": "idx_subpostagg", "fn": "+", "fields": [
              {"type": "fieldAccess", "fieldName": "idx_subagg"},
              {"type": "constant", "name": "thousand", "value": 1000}]}
          ]
        }},
        "dimensions": [{"type": "default", "dimension": "alias", "outputName": "alias"}],
        "aggregations": [
          {"type": "longSum", "name": "rows", "fieldName": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "idx_subpostagg"}
        ],
        "postAggregations": [
          {"type": "arithmetic", "name": "idx_post", "fn": "+", "fields": [
            {"type": "fieldAccess", "fieldName": "idx"},
            {"type": "constant", "name": "ten_thousand", "value": 10000}]}
        ]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"), dbl(r, "idx_post")))
      .sortBy(t => (t._1, t._2))
    val expected =
      (BaseDay1.map { case (a, n, i) => ("2011-04-01", a, n, i + 1000L, i + 11000.0) } ++
       BaseDay2.map { case (a, n, i) => ("2011-04-02", a, n, i + 1000L, i + 11000.0) })
        .sortBy(t => (t._1, t._2))
    assert(rows.toSeq == expected, s"got:\n${rows.mkString("\n")}")
  }

  // ------------------------------------------------ complex / typed / time

  test("testGroupByComplexColumn (GroupByQueryRunnerTest.java:9854): grouping " +
      "on a stored COMPLEX column yields one NULL group, and a selector " +
      "null filter over it matches every row") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "quality_uniques",
                        "outputName": "quality_uniques"}],
        "filter": {"type": "selector", "dimension": "quality_uniques", "value": null},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ]
      }""").collect()
    assert(rows.length == 1)
    assert(rows(0).isNullAt(rows(0).fieldIndex("quality_uniques")))
    assert(rows(0).getAs[Long]("rows") == 26L)
    assert(rows(0).getAs[Long]("idx") == 12446L)
  }

  test("testGroupByLongTimeColumn (GroupByQueryRunnerTest.java:9983): __time " +
      "as a LONG-typed dimension reads epoch millis") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "__time",
                        "outputName": "time_alias", "outputType": "LONG"}],
        "filter": {"type": "selector", "dimension": "quality", "value": "entertainment"},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ]
      }""").collect()
      .map(r => (day(r), r.getAs[Long]("time_alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).toSeq
    assert(rows == Seq(
      ("2011-04-01", 1301616000000L, 1L, 158L),
      ("2011-04-02", 1301702400000L, 1L, 166L)), s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByLongTimeColumnWithExFn (GroupByQueryRunnerTest.java:10026): " +
      "a non-time extraction fn over __time sees the epoch-millis LONG " +
      "(the original's 'super-' JS concat is the stringFormat extraction — " +
      "javascript non-goal)") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "extraction", "dimension": "__time",
                        "outputName": "time_alias",
                        "extractionFn": {"type": "stringFormat", "format": "super-%s"}}],
        "filter": {"type": "selector", "dimension": "quality", "value": "entertainment"},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("time_alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).toSeq
    assert(rows == Seq(
      ("2011-04-01", "super-1301616000000", 1L, 158L),
      ("2011-04-02", "super-1301702400000", 1L, 166L)), s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByNumericStringsAsNumeric (GroupByQueryRunnerTest.java:10380): " +
      "inner dims on numeric columns re-typed LONG/FLOAT in the outer query " +
      "— including the same inner alias read at BOTH types and __time " +
      "re-read as a LONG dimension") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy",
          "dataSource": "testIndex",
          "granularity": "day",
          "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
          "dimensions": [
            {"type": "default", "dimension": "qualityLong", "outputName": "ql_alias"},
            {"type": "default", "dimension": "qualityFloat", "outputName": "qf_alias"},
            {"type": "default", "dimension": "__time", "outputName": "time_alias"}
          ],
          "filter": {"type": "selector", "dimension": "quality", "value": "entertainment"},
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"}
          ]
        }},
        "dimensions": [
          {"type": "default", "dimension": "time_alias", "outputName": "time_alias2", "outputType": "LONG"},
          {"type": "default", "dimension": "ql_alias", "outputName": "ql_alias_long", "outputType": "LONG"},
          {"type": "default", "dimension": "qf_alias", "outputName": "qf_alias_float", "outputType": "FLOAT"},
          {"type": "default", "dimension": "ql_alias", "outputName": "ql_alias_float", "outputType": "FLOAT"}
        ],
        "aggregations": [{"type": "count", "name": "count"}]
      }""").collect()
      .map(r => (r.getAs[Long]("time_alias2"), r.getAs[Long]("ql_alias_long"),
        dbl(r, "qf_alias_float"), dbl(r, "ql_alias_float"), r.getAs[Long]("count")))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1301616000000L, 1200L, 12000.0, 1200.0, 1L),
      (1301702400000L, 1200L, 12000.0, 1200.0, 1L)), s"got:\n${rows.mkString("\n")}")
  }

  // ------------------------------------------- nullable dims / virtual time

  test("testGroupByOnNullableLong (GroupByQueryRunnerTest.java:11950): " +
      "LONG-typed dim over a nullable column under an implicit limit — " +
      "null group first, then typed ascending order") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "longNumericNull",
                        "outputName": "nullable", "outputType": "LONG"}],
        "aggregations": [{"type": "count", "name": "rows"}],
        "limitSpec": {"type": "default", "limit": 5}
      }""").collect()
      .map(r => (if (r.isNullAt(r.fieldIndex("nullable"))) null
                 else java.lang.Long.valueOf(r.getAs[Long]("nullable")),
        r.getAs[Long]("rows"))).toSeq
    assert(rows == Seq((null, 6L), (10L, 2L), (20L, 2L), (40L, 2L), (50L, 6L)),
      s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByOnNullableDouble (GroupByQueryRunnerTest.java:11991): " +
      "DOUBLE-typed dim over a nullable column under an implicit limit — " +
      "null group first, then typed ascending order") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "doubleNumericNull",
                        "outputName": "nullable", "outputType": "DOUBLE"}],
        "aggregations": [{"type": "count", "name": "rows"}],
        "limitSpec": {"type": "default", "limit": 5}
      }""").collect()
      .map(r => (if (r.isNullAt(r.fieldIndex("nullable"))) null
                 else java.lang.Double.valueOf(dbl(r, "nullable")),
        r.getAs[Long]("rows"))).toSeq
    assert(rows == Seq((null, 6L), (10.0, 2L), (20.0, 2L), (40.0, 2L), (50.0, 6L)),
      s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByOnVirtualColumnTimeFloor (GroupByQueryRunnerTest.java:12159): " +
      "a timestamp_floor expression virtual column grouped as a LONG dim " +
      "yields the day-bucket millis") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "virtualColumns": [
          {"type": "expression", "name": "v",
           "expression": "timestamp_floor(__time, 'P1D')", "outputType": "LONG"}],
        "dimensions": [{"type": "default", "dimension": "v", "outputName": "v",
                        "outputType": "LONG"}],
        "aggregations": [{"type": "count", "name": "rows"}],
        "limitSpec": {"type": "default", "limit": 5}
      }""").collect()
      .map(r => (r.getAs[Long]("v"), r.getAs[Long]("rows"))).toSeq
    assert(rows == Seq((1301616000000L, 13L), (1301702400000L, 13L)),
      s"got:\n${rows.mkString("\n")}")
  }
}
