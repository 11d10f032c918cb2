package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 11 over the shared TestIndex fixture
  * ([[TestIndexFixture]]): the merge + complex-metric tail the round-12
  * verdict named — the testMergeResults* family (partial-result merge
  * semantics, expressed as SPLIT interval lists: the reference simulates two
  * daily segments and re-merges, which a coarse-granularity query over the
  * two day intervals must reproduce), testMergedHavingSpec, the
  * forceLimitPushDown family, the numeric-strings decoration remainder,
  * cardinality aggregators at the groupBy level (float metric / expression
  * VC / stored COMPLEX), the CardinalityAggregatorTest byRow/byValue
  * multi-value unit vectors, and filtered aggregators with
  * extraction-lookup filters. Each test cites its reference method; longs/
  * strings exact, doubles at 1e-6 relative tolerance, HLLC estimates exact.
  */
class QueryRunnerGoldenSpec11 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def relEq(got: Double, exp: Double, tol: Double = 1e-6): Boolean =
    math.abs(got - exp) <= math.abs(exp) * tol

  private def day(r: Row): String =
    r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString

  // the two "segments" of the merge family: the reference splits
  // 2011-04-02/2011-04-04 into two daily runs and merges
  // (GroupByQueryRunnerTest.java:3890-3914)
  private val SplitIntervals =
    """["2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z",
        "2011-04-03T00:00:00.000Z/2011-04-04T00:00:00.000Z"]"""

  // the merged P1M expected vector (GroupByQueryRunnerTest.java:3916-3926)
  private val MergedRows = Seq(
    ("automotive", 2L, 269L), ("business", 2L, 217L),
    ("entertainment", 2L, 319L), ("health", 2L, 216L),
    ("mezzanine", 6L, 4420L), ("news", 2L, 221L),
    ("premium", 6L, 4416L), ("technology", 2L, 177L), ("travel", 2L, 243L))

  private def mergeQueryJson(granularity: String, extra: String = ""): String =
    s"""{
      "queryType": "groupBy",
      "dataSource": "testIndex",
      "granularity": $granularity,
      "intervals": $SplitIntervals,
      "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
      "aggregations": [
        {"type": "count", "name": "rows"},
        {"type": "longSum", "name": "idx", "fieldName": "index"}
      ]$extra
    }"""

  test("testMergeResults (GroupByQueryRunnerTest.java:3877): two daily " +
      "segment intervals re-aggregate into ONE P1M bucket (2011-04-01); " +
      "the ALL-granularity variant merges to the same 9 rows") {
    val p1m = run(mergeQueryJson("""{"type": "period", "period": "P1M"}"""))
      .collect()
    assert(p1m.forall(r => day(r) == "2011-04-01"),
      "P1M buckets both days into the month start")
    val got = p1m.map(r => (r.getAs[String]("alias"), r.getAs[Long]("rows"),
      r.getAs[Long]("idx"))).sortBy(_._1).toSeq
    assert(got == MergedRows, s"got:\n${got.mkString("\n")}")

    val allGran = run(mergeQueryJson("\"all\""))
      .collect().map(r => (r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).sortBy(_._1).toSeq
    assert(allGran == MergedRows, s"got:\n${allGran.mkString("\n")}")
  }

  test("testMergeResultsWithLimitAndOffset (GroupByQueryRunnerTest.java:3951" +
      "/3961 doTestMergeResultsWithValidLimit): every (limit, offset) slice " +
      "of the alias-ascending merged stream (grid of the reference's " +
      "exhaustive 19x21 loop)") {
    for (limit <- Seq(1, 3, 9, 10, 19); offset <- Seq(0, 3, 8, 9, 20)) {
      val got = run(mergeQueryJson(
        """{"type": "period", "period": "P1M"}""",
        s""", "limitSpec": {"type": "default", "limit": $limit, "offset": $offset}"""))
        .collect().map(r => (r.getAs[String]("alias"), r.getAs[Long]("rows"),
          r.getAs[Long]("idx"))).toSeq
      val expected = MergedRows.slice(offset, offset + limit)
      assert(got == expected, s"limit=$limit offset=$offset got:\n$got")
    }
  }

  test("testMergeResultsWithNegativeLimit (GroupByQueryRunnerTest.java:4167): " +
      "limit -1 is rejected like DefaultLimitSpec's construction check") {
    intercept[IllegalArgumentException] {
      run(mergeQueryJson(
        """{"type": "period", "period": "P1M"}""",
        """, "limitSpec": {"type": "default", "limit": -1}""")).collect()
    }
  }

  test("testMergeResultsWithOrderBy (GroupByQueryRunnerTest.java:4181): the " +
      "four limitSpec orderings (idx asc, rows+idx asc, idx desc, rows+idx " +
      "desc) over the merged P1M rows") {
    def q(columns: String): Seq[(String, Long, Long)] =
      run(mergeQueryJson(
        """{"type": "period", "period": "P1M"}""",
        s""", "limitSpec": {"type": "default", "columns": [$columns]}"""))
        .collect().map(r => (r.getAs[String]("alias"), r.getAs[Long]("rows"),
          r.getAs[Long]("idx"))).toSeq
    val byIdx = MergedRows.sortBy(_._3)
    val byRowsIdx = MergedRows.sortBy(t => (t._2, t._3))
    assert(q("""{"dimension": "idx", "direction": "ascending", "dimensionOrder": "numeric"}""")
      == byIdx)
    assert(q("""{"dimension": "rows", "direction": "ascending", "dimensionOrder": "numeric"},
                {"dimension": "idx", "direction": "ascending", "dimensionOrder": "numeric"}""")
      == byRowsIdx)
    assert(q("""{"dimension": "idx", "direction": "descending", "dimensionOrder": "numeric"}""")
      == byIdx.reverse)
    assert(q("""{"dimension": "rows", "direction": "descending", "dimensionOrder": "numeric"},
                {"dimension": "idx", "direction": "descending", "dimensionOrder": "numeric"}""")
      == byRowsIdx.reverse)
  }

  test("testMergeResultsAcrossMultipleDaysWithLimitAndOrderBy (GroupByQuery" +
      "RunnerTest.java:4075): DAY granularity, limit 14, idx descending " +
      "crosses the day boundary mid-limit") {
    val got = run(
      s"""{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ],
        "limitSpec": {"type": "default", "limit": 14,
          "columns": [{"dimension": "idx", "direction": "descending", "dimensionOrder": "numeric"}]}
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).toSeq
    val expected = Seq(
      ("2011-04-01", "premium", 3L, 2900L),
      ("2011-04-01", "mezzanine", 3L, 2870L),
      ("2011-04-01", "entertainment", 1L, 158L),
      ("2011-04-01", "automotive", 1L, 135L),
      ("2011-04-01", "news", 1L, 121L),
      ("2011-04-01", "health", 1L, 120L),
      ("2011-04-01", "travel", 1L, 119L),
      ("2011-04-01", "business", 1L, 118L),
      ("2011-04-01", "technology", 1L, 78L),
      ("2011-04-02", "premium", 3L, 2505L),
      ("2011-04-02", "mezzanine", 3L, 2447L),
      ("2011-04-02", "entertainment", 1L, 166L),
      ("2011-04-02", "automotive", 1L, 147L),
      ("2011-04-02", "travel", 1L, 126L))
    assert(got == expected, s"got:\n${got.mkString("\n")}")
  }

  test("testMergeResultsAcrossMultipleDaysWithLimitAndOrderByUsingMathExpressions " +
      "Expressions (GroupByQueryRunnerTest.java:4117): the longSum rides a " +
      "FLOAT expression virtual column 'index * 2 + indexMin / 10'") {
    val got = run(
      s"""{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "virtualColumns": [
          {"type": "expression", "name": "expr",
           "expression": "index * 2 + indexMin / 10", "outputType": "FLOAT"}],
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "expr"}
        ],
        "limitSpec": {"type": "default", "limit": 14,
          "columns": [{"dimension": "idx", "direction": "descending", "dimensionOrder": "numeric"}]}
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).toSeq
    val expected = Seq(
      ("2011-04-01", "premium", 3L, 6090L),
      ("2011-04-01", "mezzanine", 3L, 6030L),
      ("2011-04-01", "entertainment", 1L, 333L),
      ("2011-04-01", "automotive", 1L, 285L),
      ("2011-04-01", "news", 1L, 255L),
      ("2011-04-01", "health", 1L, 252L),
      ("2011-04-01", "travel", 1L, 251L),
      ("2011-04-01", "business", 1L, 248L),
      ("2011-04-01", "technology", 1L, 165L),
      ("2011-04-02", "premium", 3L, 5262L),
      ("2011-04-02", "mezzanine", 3L, 5141L),
      ("2011-04-02", "entertainment", 1L, 348L),
      ("2011-04-02", "automotive", 1L, 309L),
      ("2011-04-02", "travel", 1L, 265L))
    assert(got == expected, s"got:\n${got.mkString("\n")}")
  }

  test("testMergedHavingSpec (GroupByQueryRunnerTest.java:5267): the OR " +
      "having (rows > 2 || idx == 217) applies AFTER the cross-segment " +
      "merge — business qualifies only via the merged idx") {
    val got = run(mergeQueryJson(
      """{"type": "period", "period": "P1M"}""",
      """, "having": {"type": "or", "havingSpecs": [
           {"type": "greaterThan", "aggregation": "rows", "value": 2},
           {"type": "equalTo", "aggregation": "idx", "value": 217}
         ]}"""))
      .collect().map(r => (r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).sortBy(_._1).toSeq
    assert(got == Seq(("business", 2L, 217L), ("mezzanine", 6L, 4420L),
      ("premium", 6L, 4416L)), s"got:\n${got.mkString("\n")}")
  }

  // ------------------------------------------------ limit pushdown family
  // forceLimitPushDown (GroupByQueryConfig.CTX_KEY_FORCE_LIMIT_PUSH_DOWN)
  // asks the reference for per-segment partial limits merged at the broker;
  // the single-phase Spark aggregate produces the same rows, so the flag is
  // accepted and the MERGED vectors are pinned.

  test("testMergeResultsWithLimitPushDown (GroupByQueryRunnerTest.java:11279): " +
      "alias descending, limit 5, under forceLimitPushDown") {
    val got = run(mergeQueryJson("\"all\"",
      """, "limitSpec": {"type": "default", "limit": 5,
           "columns": [{"dimension": "alias", "direction": "descending"}]},
         "context": {"forceLimitPushDown": true}"""))
      .collect().map(r => (r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).toSeq
    assert(got == Seq(("travel", 2L, 243L), ("technology", 2L, 177L),
      ("premium", 6L, 4416L), ("news", 2L, 221L), ("mezzanine", 6L, 4420L)),
      s"got:\n${got.mkString("\n")}")
  }

  test("testMergeResultsWithLimitPushDownSortByAgg (GroupByQueryRunnerTest" +
      ".java:11349): idx descending, limit 5") {
    val got = run(mergeQueryJson("\"all\"",
      """, "limitSpec": {"type": "default", "limit": 5,
           "columns": [{"dimension": "idx", "direction": "descending", "dimensionOrder": "numeric"}]},
         "context": {"forceLimitPushDown": true}"""))
      .collect().map(r => (r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).toSeq
    assert(got == Seq(("mezzanine", 6L, 4420L), ("premium", 6L, 4416L),
      ("entertainment", 2L, 319L), ("automotive", 2L, 269L),
      ("travel", 2L, 243L)), s"got:\n${got.mkString("\n")}")
  }

  test("testMergeResultsWithLimitPushDownSortByAggWithOffset (GroupByQuery" +
      "RunnerTest.java:11416): offset 2, limit 3 into the idx-descending " +
      "stream") {
    val got = run(mergeQueryJson("\"all\"",
      """, "limitSpec": {"type": "default", "limit": 3, "offset": 2,
           "columns": [{"dimension": "idx", "direction": "descending", "dimensionOrder": "numeric"}]},
         "context": {"forceLimitPushDown": true}"""))
      .collect().map(r => (r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).toSeq
    assert(got == Seq(("entertainment", 2L, 319L), ("automotive", 2L, 269L),
      ("travel", 2L, 243L)), s"got:\n${got.mkString("\n")}")
  }

  test("testMergeResultsWithLimitPushDownSortByDimDim (GroupByQueryRunnerTest" +
      ".java:11482): two descending dimension keys, limit 5") {
    val got = run(
      s"""{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": $SplitIntervals,
        "dimensions": [
          {"type": "default", "dimension": "quality", "outputName": "alias"},
          {"type": "default", "dimension": "market", "outputName": "market"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ],
        "limitSpec": {"type": "default", "limit": 5, "columns": [
          {"dimension": "alias", "direction": "descending"},
          {"dimension": "market", "direction": "descending"}]},
        "context": {"forceLimitPushDown": true}
      }""").collect()
      .map(r => (r.getAs[String]("alias"), r.getAs[String]("market"),
        r.getAs[Long]("rows"), r.getAs[Long]("idx"))).toSeq
    assert(got == Seq(
      ("travel", "spot", 2L, 243L), ("technology", "spot", 2L, 177L),
      ("premium", "upfront", 2L, 1817L), ("premium", "total_market", 2L, 2342L),
      ("premium", "spot", 2L, 257L)), s"got:\n${got.mkString("\n")}")
  }

  test("testMergeResultsWithLimitPushDownSortByDimAggDim (GroupByQueryRunner" +
      "Test.java:11554): alias desc, then idx desc, then market desc") {
    val got = run(
      s"""{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": $SplitIntervals,
        "dimensions": [
          {"type": "default", "dimension": "quality", "outputName": "alias"},
          {"type": "default", "dimension": "market", "outputName": "market"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ],
        "limitSpec": {"type": "default", "limit": 5, "columns": [
          {"dimension": "alias", "direction": "descending"},
          {"dimension": "idx", "direction": "descending", "dimensionOrder": "numeric"},
          {"dimension": "market", "direction": "descending"}]},
        "context": {"forceLimitPushDown": true}
      }""").collect()
      .map(r => (r.getAs[String]("alias"), r.getAs[String]("market"),
        r.getAs[Long]("rows"), r.getAs[Long]("idx"))).toSeq
    assert(got == Seq(
      ("travel", "spot", 2L, 243L), ("technology", "spot", 2L, 177L),
      ("premium", "total_market", 2L, 2342L), ("premium", "upfront", 2L, 1817L),
      ("premium", "spot", 2L, 257L)), s"got:\n${got.mkString("\n")}")
  }

  // ------------------------------------------- numeric strings decoration

  test("testGroupByNumericStringsAsNumericWithDecoration (GroupByQueryRunner" +
      "Test.java:10438): regexFiltered LONG + listFiltered FLOAT over the " +
      "numeric-string column; 'entertainment' rows decorate to the null " +
      "group") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "in", "dimension": "quality",
                   "values": ["entertainment", "technology"]},
        "dimensions": [
          {"type": "regexFiltered",
           "delegate": {"type": "default", "dimension": "qualityNumericString",
                        "outputName": "ql", "outputType": "LONG"},
           "pattern": "170000"},
          {"type": "listFiltered",
           "delegate": {"type": "default", "dimension": "qualityNumericString",
                        "outputName": "qf", "outputType": "FLOAT"},
           "values": ["170000"], "isWhitelist": true}
        ],
        "aggregations": [{"type": "count", "name": "count"}],
        "limitSpec": {"type": "default",
          "columns": [{"dimension": "ql", "dimensionOrder": "numeric"}]}
      }""").collect()
    assert(rows.length == 2, s"got:\n${rows.mkString("\n")}")
    val nullRow = rows(0)
    assert(nullRow.isNullAt(nullRow.fieldIndex("ql")))
    assert(nullRow.isNullAt(nullRow.fieldIndex("qf")))
    assert(nullRow.getAs[Long]("count") == 2L)
    val r17 = rows(1)
    assert(r17.getAs[Long]("ql") == 170000L)
    assert(r17.getAs[Number]("qf").doubleValue() == 170000.0)
    assert(r17.getAs[Long]("count") == 2L)
  }

  // --------------------------------------------- cardinality, groupBy level

  test("testGroupByCardinalityAggOnFloat (GroupByQueryRunnerTest.java:9647): " +
      "cardinality over the DOUBLE index metric per (day, market) — the " +
      "distinct-value estimates reproduce the reference's constants") {
    val rows = run(
      s"""{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "market", "outputName": "alias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "cardinality", "name": "numVals", "fields": ["index"], "byRow": false}
        ],
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "alias"}]}
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Double]("numVals")))
      .sortBy(t => (t._1, t._2)).toSeq
    val expected = Seq(
      ("2011-04-01", "spot", 9L, 8.015665809687173),
      ("2011-04-01", "total_market", 2L, 2.000977198748901),
      ("2011-04-01", "upfront", 2L, 2.000977198748901),
      ("2011-04-02", "spot", 9L, 9.019833517963864),
      ("2011-04-02", "total_market", 2L, 2.000977198748901),
      ("2011-04-02", "upfront", 2L, 2.000977198748901))
    assert(rows == expected, s"got:\n${rows.mkString("\n")}")
  }

  test("testGroupByCardinalityAggOnMultiStringExpression (GroupByQueryRunner" +
      "Test.java:9732): the groupBy spelling of the concat(quality,market) " +
      "VC cardinality — 13.041435202975777 exactly") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "virtualColumns": [
          {"type": "expression", "name": "v0",
           "expression": "concat(quality,market)", "outputType": "STRING"}],
        "dimensions": [],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "cardinality", "name": "numVals", "fields": ["v0"], "byRow": false}
        ]
      }""").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("rows") == 26L)
    assert(rows(0).getAs[Double]("numVals") == 13.041435202975777)
  }

  test("testGroupByCardinalityAggOnHyperUnique (GroupByQueryRunnerTest.java" +
      ":9767): cardinality over a stored COMPLEX column estimates 0.0 (no " +
      "dimension selector) while hyperUnique over it unions to UNIQUES_9") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "cardinality", "name": "cardinality",
           "fields": ["quality_uniques"], "byRow": false},
          {"type": "hyperUnique", "name": "hyperUnique", "fieldName": "quality_uniques"}
        ]
      }""").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("rows") == 26L)
    assert(rows(0).getAs[Double]("cardinality") == 0.0)
    assert(rows(0).getAs[Double]("hyperUnique") == TestIndexFixture.Uniques9)
  }

  // ------------------------- CardinalityAggregatorTest multi-value vectors

  // dim1 single-value, dim2 multi-value
  // (CardinalityAggregatorTest.java:210-226 VALUES1/VALUES2)
  private val CardinalityMvInline =
    """{"type": "inline",
       "columnNames": ["d1", "d2"],
       "columnTypes": ["string", "ARRAY<STRING>"],
       "rows": [
         ["a", ["a"]], ["b", ["b"]], ["c", ["c"]], ["a", ["x"]],
         ["a", ["a"]], [null, ["e"]], ["b", ["b"]],
         ["b", [null, "x"]], ["b", ["x", null]],
         ["b", ["y", "x"]], ["a", ["x", "y"]], ["a", ["x", "y", "a"]]
       ]}"""

  test("testAggregateRows (CardinalityAggregatorTest.java:382): byRow over " +
      "(single-value, multi-value) counts 9 distinct tuples — MV elements " +
      "sort before joining, a null dim contributes nothing, and the " +
      "(null,x)/(x,null) rows collapse to one tuple") {
    val df = run(
      s"""{
        "queryType": "groupBy",
        "dataSource": $CardinalityMvInline,
        "dimensions": [],
        "aggregations": [
          {"type": "cardinality", "name": "billy",
           "fields": ["d1", "d2"], "byRow": true, "round": true}
        ]
      }""")
    assert(df.head().getAs[Long]("billy") == 9L)
  }

  test("testAggregateValues (CardinalityAggregatorTest.java:398): byValue " +
      "unions every ELEMENT of both fields into one collector — nulls " +
      "skipped (SQL-compatible), {a,b,c,x,e,y} = 6") {
    val df = run(
      s"""{
        "queryType": "groupBy",
        "dataSource": $CardinalityMvInline,
        "dimensions": [],
        "aggregations": [
          {"type": "cardinality", "name": "billy",
           "fields": ["d1", "d2"], "byRow": false, "round": true}
        ]
      }""")
    assert(df.head().getAs[Long]("billy") == 6L)
  }

  // --------------------------------- filtered aggregators, extraction tail

  test("testGroupByNoMatchingPrefilter (GroupByQueryRunnerTest.java:11921): " +
      "a filtered longSum whose NOT-null filter matches nothing leaves the " +
      "unfiltered count intact (limit 1)") {
    val rows = run(
      """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "filter": {"type": "selector", "dimension": "market", "value": "spot"},
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "quality"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "filtered", "name": "index",
           "filter": {"type": "not", "field":
             {"type": "selector", "dimension": "longNumericNull", "value": null}},
           "aggregator": {"type": "longSum", "name": "index", "fieldName": "index"}}
        ],
        "limitSpec": {"type": "default", "limit": 1}
      }""").collect()
      .map(r => (day(r), r.getAs[String]("quality"), r.getAs[Long]("rows"),
        r.getAs[Long]("index"))).toSeq
    assert(rows == Seq(("2011-04-01", "automotive", 1L, 135L)),
      s"got:\n${rows.mkString("\n")}")
  }

  test("testTopNWithExtractionFilterAndFilteredAggregatorCaseNoExistingValue " +
      "(TopNQueryRunnerTest.java:4123): an empty-map lookup extraction with " +
      "replaceMissingValueWith 'NULL' matches every row of the nonexistent " +
      "column; the filtered doubleMax sees all rows") {
    val rows = run(
      s"""{
        "queryType": "topN",
        "dataSource": "testIndex",
        "granularity": "all",
        "dimension": "null_column",
        "metric": "index",
        "threshold": 4,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "filter": {"type": "extraction", "dimension": "null_column", "value": "NULL",
          "extractionFn": {"type": "lookup", "lookup": {"type": "map", "map": {}},
            "retainMissingValue": false, "replaceMissingValueWith": "NULL",
            "injective": false, "optimize": false}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "index", "fieldName": "index"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"},
          {"type": "filtered", "name": "maxIndex",
           "filter": {"type": "extraction", "dimension": "null_column", "value": "NULL",
             "extractionFn": {"type": "lookup", "lookup": {"type": "map", "map": {}},
               "retainMissingValue": false, "replaceMissingValueWith": "NULL",
               "injective": false, "optimize": false}},
           "aggregator": {"type": "doubleMax", "name": "maxIndex", "fieldName": "index"}},
          {"type": "doubleMin", "name": "minIndex", "fieldName": "index"}
        ],
        "postAggregations": [
          {"type": "arithmetic", "name": "addRowsIndexConstant", "fn": "+",
           "fields": [{"type": "constant", "value": 1},
                      {"type": "fieldAccess", "fieldName": "rows"},
                      {"type": "fieldAccess", "fieldName": "index"}]}
        ]
      }""").collect()
    assert(rows.length == 1, s"got ${rows.length} rows")
    val r = rows(0)
    assert(r.isNullAt(r.fieldIndex("null_column")))
    assert(r.getAs[Long]("rows") == 1209L)
    assert(relEq(r.getAs[Double]("index"), 503332.5071372986))
    assert(relEq(r.getAs[Double]("addRowsIndexConstant"), 504542.5071372986))
    assert(r.getAs[Double]("uniques") == TestIndexFixture.Uniques9)
    assert(relEq(r.getAs[Double]("maxIndex"), 1870.061029))
    assert(relEq(r.getAs[Double]("minIndex"), 59.02102279663086))
  }
}
