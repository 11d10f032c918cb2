package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 15 over the shared TestIndex fixture: the typed
  * numeric-column family (LONG/FLOAT/DOUBLE dims descending, extraction fns
  * over numerics, nullable numerics, having on long+float, STRING-default
  * outputType rendering), virtual-column groupBys, output-name validation
  * ('__time' reserved, duplicate outputs), uniques orderings, merged having
  * specs over split intervals, the double-mean aggregator, and the __time
  * longSum. Each test cites its reference method. The reference's
  * JavaScript extraction legs ('super-'+str, identity) are expressed as
  * stringFormat extractions (javascript is a documented non-goal).
  */
class QueryRunnerGoldenSpec15 extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def relEq(got: Double, exp: Double, tol: Double = 1e-6): Boolean =
    math.abs(got - exp) <= math.abs(exp) * tol

  private def day(r: Row): String =
    r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString

  private val FirstToThird =
    """["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"]"""
  private val FullOn =
    """["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"]"""

  // ---- typed numeric dimensions ----

  test("testGroupByLongColumnDescending (:9884) / " +
      "testGroupByFloatColumnDescending (:10121) / " +
      "testGroupByDoubleColumnDescending (:10171) (GroupByQueryRunnerTest): " +
      "typed numeric dims with a numeric-desc limitSpec — 1700/17000 before " +
      "1200/12000") {
    def q(dim: String, outputType: String, alias: String): Seq[(AnyVal, Long, Long)] =
      run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "$dim",
          "outputName": "$alias", "outputType": "$outputType"}],
        "filter": {"type": "in", "dimension": "quality",
          "values": ["entertainment", "technology"]},
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "$alias", "direction": "descending", "dimensionOrder": "numeric"}]},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }""").collect().map(r => (r.get(r.fieldIndex(alias)).asInstanceOf[AnyVal],
        r.getAs[Long]("rows"), r.getAs[Long]("idx"))).toSeq
    assert(q("qualityLong", "LONG", "ql_alias") ==
      Seq((1700L, 2L, 175L), (1200L, 2L, 324L)))
    assert(q("qualityFloat", "FLOAT", "qf_alias") ==
      Seq((17000.0f, 2L, 175L), (12000.0f, 2L, 324L)))
    assert(q("qualityDouble", "DOUBLE", "alias") ==
      Seq((17000.0d, 2L, 175L), (12000.0d, 2L, 324L)))
  }

  test("testGroupByLongColumnWithExFn (:9934) / " +
      "testGroupByFloatColumnWithExFn (:10221) (GroupByQueryRunnerTest): " +
      "a string extraction over numeric " +
      "columns renders the reference string forms ('super-1200', " +
      "'super-158.747224')") {
    def q(dim: String): Seq[(String, String, Long, Long)] = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "extraction", "dimension": "$dim",
          "outputName": "alias",
          "extractionFn": {"type": "stringFormat", "format": "super-%s"}}],
        "filter": {"type": "selector", "dimension": "quality", "value": "entertainment"},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).sortBy(_._1).toSeq
    assert(q("qualityLong") == Seq(
      ("2011-04-01", "super-1200", 1L, 158L),
      ("2011-04-02", "super-1200", 1L, 166L)))
    assert(q("index") == Seq(
      ("2011-04-01", "super-158.747224", 1L, 158L),
      ("2011-04-02", "super-166.016049", 1L, 166L)))
  }

  test("testGroupByLongAndFloatOutputAsString (GroupByQueryRunnerTest.java:" +
      "10330): dims WITHOUT outputType are STRING-typed — a LONG column " +
      "renders '1200', a FLOAT column '12000.0'") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [
          {"type": "default", "dimension": "qualityLong", "outputName": "ql_alias"},
          {"type": "default", "dimension": "qualityFloat", "outputName": "qf_alias"}],
        "filter": {"type": "selector", "dimension": "quality", "value": "entertainment"},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("ql_alias"), r.getAs[String]("qf_alias"),
        r.getAs[Long]("rows"), r.getAs[Long]("idx"))).sortBy(_._1).toSeq
    assert(got == Seq(
      ("2011-04-01", "1200", "12000.0", 1L, 158L),
      ("2011-04-02", "1200", "12000.0", 1L, 166L)), got.mkString("\n"))
  }

  test("testGroupByWithHavingSpecOnLongAndFloat (GroupByQueryRunnerTest" +
      ".java:10273): dimFilter having selecting on LONG, __time-as-LONG, " +
      "and FLOAT outputs simultaneously") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimensions": [
          {"type": "default", "dimension": "market", "outputName": "alias"},
          {"type": "default", "dimension": "qualityLong", "outputName": "ql_alias", "outputType": "LONG"},
          {"type": "default", "dimension": "__time", "outputName": "time_alias", "outputType": "LONG"},
          {"type": "default", "dimension": "index", "outputName": "index_alias", "outputType": "FLOAT"}],
        "having": {"type": "filter", "filter": {"type": "and", "fields": [
          {"type": "selector", "dimension": "ql_alias", "value": "1400"},
          {"type": "selector", "dimension": "time_alias", "value": "1301616000000"},
          {"type": "bound", "dimension": "index_alias", "lower": "1310.0",
           "upper": "1320.0", "lowerStrict": true, "upperStrict": true,
           "ordering": "numeric"}]}},
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
    assert(got.length == 1, got.mkString("\n"))
    val r = got.head
    assert(r.getAs[String]("alias") == "total_market")
    assert(r.getAs[Long]("ql_alias") == 1400L)
    assert(r.getAs[Long]("time_alias") == 1301616000000L)
    assert(math.abs(r.getAs[Float]("index_alias") - 1314.8397f) < 0.001f)
    assert(r.getAs[Long]("rows") == 1L)
  }

  test("testGroupByOnNullableFloat (:12074) / " +
      "testGroupByOnNullableDoubleNoLimitPushdown (:12032) " +
      "(GroupByQueryRunnerTest): nullable numeric dims " +
      "group null first under the ascending limit 5") {
    def q(dim: String, outputType: String): Seq[(Option[Double], Long)] = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "$dim",
          "outputName": "nullable", "outputType": "$outputType"}],
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "nullable", "direction": "ascending", "dimensionOrder": "numeric"}],
          "limit": 5},
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
      .map(r => (Option(r.get(r.fieldIndex("nullable")))
        .map(_.asInstanceOf[Number].doubleValue), r.getAs[Long]("rows"))).toSeq
    val expected = Seq((None, 6L), (Some(10.0), 2L), (Some(20.0), 2L),
      (Some(40.0), 2L), (Some(50.0), 6L))
    assert(q("floatNumericNull", "FLOAT") == expected)
    assert(q("doubleNumericNull", "DOUBLE") == expected)
  }

  test("testGroupByOnVirtualColumn (GroupByQueryRunnerTest.java:12115): a " +
      "LONG expression virtual column dim plus a longSum over an " +
      "expression ('1 + two') — first 5 products ascending") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "virtualColumns": [
          {"type": "expression", "name": "v",
           "expression": "qualityDouble * qualityLong", "outputType": "LONG"},
          {"type": "expression", "name": "two", "expression": "2"}],
        "dimensions": [{"type": "default", "dimension": "v",
          "outputName": "v", "outputType": "LONG"}],
        "limitSpec": {"type": "default", "limit": 5},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "twosum", "expression": "1 + two"}]
      }""").collect()
      .map(r => (r.getAs[Long]("v"), r.getAs[Long]("rows"), r.getAs[Long]("twosum"))).toSeq
    assert(got == Seq(
      (10000000L, 2L, 6L), (12100000L, 2L, 6L), (14400000L, 2L, 6L),
      (16900000L, 2L, 6L), (19600000L, 6L, 18L)), got.mkString("\n"))
  }

  test("testGroupByNestedOuterExtractionFnOnFloatInner (GroupByQueryRunner" +
      "Test.java:10937): identity extraction with FLOAT outputType survives " +
      "the nested hop — one (technology, 17000.0) group") {
    val got = run(s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FirstToThird,
          "dimensions": [
            {"type": "default", "dimension": "quality", "outputName": "alias"},
            {"type": "extraction", "dimension": "qualityFloat",
             "outputName": "qf_inner", "outputType": "FLOAT",
             "extractionFn": {"type": "stringFormat", "format": "%s"}}],
          "filter": {"type": "selector", "dimension": "quality", "value": "technology"},
          "aggregations": [{"type": "count", "name": "rows"}]
        }},
        "granularity": "all", "intervals": $FirstToThird,
        "dimensions": [
          {"type": "default", "dimension": "alias", "outputName": "alias"},
          {"type": "extraction", "dimension": "qf_inner",
           "outputName": "qf_outer", "outputType": "FLOAT",
           "extractionFn": {"type": "stringFormat", "format": "%s"}}],
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
    assert(got.length == 1, got.mkString("\n"))
    assert(got.head.getAs[String]("alias") == "technology")
    assert(got.head.getAs[Float]("qf_outer") == 17000.0f)
    assert(got.head.getAs[Long]("rows") == 2L)
  }

  test("testGroupByNestedDoubleTimeExtractionFnWithLongOutputTypes (GroupBy" +
      "QueryRunnerTest.java:10985): DAY timeFormat-as-millis inner, WEEK " +
      "re-extraction outer over the inner LONG — week start 2011-03-28") {
    val got = run(s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FirstToThird,
          "dimensions": [
            {"type": "default", "dimension": "quality", "outputName": "alias"},
            {"type": "extraction", "dimension": "__time",
             "outputName": "time_day", "outputType": "LONG",
             "extractionFn": {"type": "timeFormat", "granularity": "day",
               "asMillis": true}}],
          "filter": {"type": "selector", "dimension": "quality", "value": "technology"},
          "aggregations": [{"type": "count", "name": "rows"}]
        }},
        "granularity": "all", "intervals": $FirstToThird,
        "dimensions": [
          {"type": "default", "dimension": "alias", "outputName": "alias"},
          {"type": "extraction", "dimension": "time_day",
           "outputName": "time_week", "outputType": "LONG",
           "extractionFn": {"type": "timeFormat", "granularity": "week",
             "asMillis": true}}],
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
    assert(got.length == 1, got.mkString("\n"))
    assert(got.head.getAs[String]("alias") == "technology")
    assert(got.head.getAs[Long]("time_week") == 1301270400000L)
    assert(got.head.getAs[Long]("rows") == 2L)
  }

  // ---- misc engine-surface goldens ----

  test("testGroupByOnMissingColumn (GroupByQueryRunnerTest.java:760): a " +
      "nonexistent plain dim groups null; a nonexistent dim under a " +
      "constant stringFormat groups 'foo'") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "dimensions": [
          {"type": "default", "dimension": "nonexistent0", "outputName": "alias0"},
          {"type": "extraction", "dimension": "nonexistent1", "outputName": "alias1",
           "extractionFn": {"type": "stringFormat", "format": "foo"}}],
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("alias0") == null)
    assert(got.head.getAs[String]("alias1") == "foo")
    assert(got.head.getAs[Long]("rows") == 26L)
  }

  test("testGroupByWithStringPostAggregator (GroupByQueryRunnerTest.java:" +
      "790): a STRING expression post-agg (alias + 'x') orders the " +
      "limitSpec descending, time-major") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "post", "direction": "descending"}], "limit": 2147483647},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}],
        "postAggregations": [{"type": "expression", "name": "post",
          "expression": "alias + 'x'"}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("post"), r.getAs[Long]("idx"))).toSeq
    assert(got.take(3) == Seq(
      ("2011-04-01", "travelx", 119L), ("2011-04-01", "technologyx", 78L),
      ("2011-04-01", "premiumx", 2900L)), got.take(3).mkString("\n"))
    assert(got.length == 18)
    assert(got.drop(9).take(2) == Seq(
      ("2011-04-02", "travelx", 126L), ("2011-04-02", "technologyx", 97L)))
  }

  test("testGroupByWithStringVirtualColumnVectorizable (GroupByQueryRunner" +
      "Test.java:1101): cast(quality, 'STRING') virtual column groups like " +
      "the raw dimension") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "virtualColumns": [{"type": "expression", "name": "vc",
          "expression": "cast(quality, 'STRING')", "outputType": "STRING"}],
        "dimensions": [{"type": "default", "dimension": "vc", "outputName": "alias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).sortBy(t => (t._1, t._2)).toSeq
    assert(got.length == 18)
    assert(got.head == ("2011-04-01", "automotive", 1L, 135L))
    assert(got.last == ("2011-04-02", "travel", 1L, 126L))
    assert(got.map(_._4).sum == 12446L) // 04-01: 6619 + 04-02: 5827
  }

  test("testGroupByWithOutputNameCollisions (GroupByQueryRunnerTest.java:" +
      "1201) / testGroupByWithUniquesAndPostAggWithSameName (:3380): a " +
      "duplicate output name across dims/aggs/post-aggs is rejected " +
      "('[alias] already defined')") {
    val ex = intercept[IllegalArgumentException] {
      run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "alias", "fieldName": "index"}]
      }""").collect()
    }
    assert(ex.getMessage.contains("[alias] already defined"), ex.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "hyperUnique", "name": "quality_uniques", "fieldName": "quality_uniques"}],
        "postAggregations": [{"type": "hyperUniqueCardinality",
          "name": "quality_uniques", "fieldName": "quality_uniques"}]
      }""").collect()
    }
    assert(ex2.getMessage.contains("[quality_uniques] already defined"), ex2.getMessage)
  }

  test("testGroupByTimeExtractionNamedUnderUnderTime (:5914) / " +
      "testGroupByWithUnderUnderTimeAsDimensionNameWithHavingAndLimit " +
      "(:5948) (GroupByQueryRunnerTest): '__time' is rejected as an " +
      "output name") {
    for (dims <- Seq(
        """[{"type": "default", "dimension": "market", "outputName": "market"},
            {"type": "extraction", "dimension": "__time", "outputName": "__time",
             "extractionFn": {"type": "timeFormat", "format": "EEEE"}}]""",
        """[{"type": "default", "dimension": "quality", "outputName": "__time"}]""")) {
      val ex = intercept[IllegalArgumentException] {
        run(s"""{
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FirstToThird,
          "dimensions": $dims,
          "aggregations": [{"type": "count", "name": "rows"}]
        }""").collect()
      }
      assert(ex.getMessage.contains("'__time' cannot be used as an output name"),
        ex.getMessage)
    }
  }

  test("testGroupByWithSortDimsFirst (GroupByQueryRunnerTest.java:1216): " +
      "sortByDimsFirst emits dim-major, bucket-minor rows") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "alias", "direction": "ascending"}], "limit": 4},
        "context": {"sortByDimsFirst": true},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("idx"))).toSeq
    assert(got == Seq(
      ("2011-04-01", "automotive", 135L), ("2011-04-02", "automotive", 147L),
      ("2011-04-01", "business", 118L), ("2011-04-02", "business", 112L)),
      got.mkString("\n"))
  }

  test("testGroupByWithUniques (GroupByQueryRunnerTest.java:3355): the " +
      "dimension-less hyperUnique groupBy reproduces UNIQUES_9") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "hyperUnique", "name": "uniques", "fieldName": "quality_uniques"}]
      }""").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("rows") == 26L)
    assert(got.head.getAs[Double]("uniques") == TestIndexFixture.Uniques9)
  }

  test("testGroupByWithSameCaseOrdering (:4474) / testGroupByWithOrderLimit4 " +
      "(:4523) (GroupByQueryRunnerTest): desc market limit 3 — " +
      "upfront, total_market, spot") {
    for (out <- Seq("marketalias", "market")) {
      val got = run(s"""{
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "all", "intervals": $FullOn,
          "dimensions": [{"type": "default", "dimension": "market", "outputName": "$out"}],
          "limitSpec": {"type": "default", "columns": [
            {"dimension": "$out", "direction": "descending"}], "limit": 3},
          "aggregations": [{"type": "count", "name": "rows"}]
        }""").collect()
        .map(r => (r.getAs[String](out), r.getAs[Long]("rows"))).toSeq
      assert(got == Seq(("upfront", 186L), ("total_market", 186L), ("spot", 837L)),
        got.mkString("\n"))
    }
  }

  test("testGroupByWithLimitOnFinalizedHyperUnique (GroupByQueryRunnerTest" +
      ".java:4726): ordering on the FINALIZED hyperUnique post-agg, " +
      "lexicographic dim tie-break — spot(9), total_market(2), upfront(2)") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimensions": [{"type": "default", "dimension": "market", "outputName": "market"}],
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "hyperUniqueFinalizingPostAggMetric",
           "direction": "descending", "dimensionOrder": "numeric"}], "limit": 3},
        "aggregations": [{"type": "hyperUnique", "name": "uniques",
          "fieldName": "quality_uniques"}],
        "postAggregations": [{"type": "hyperUniqueCardinality",
          "name": "hyperUniqueFinalizingPostAggMetric", "fieldName": "uniques"}]
      }""").collect()
      .map(r => (r.getAs[String]("market"), r.getAs[Double]("uniques"),
        r.getAs[Double]("hyperUniqueFinalizingPostAggMetric"))).toSeq
    assert(got == Seq(
      ("spot", TestIndexFixture.Uniques9, TestIndexFixture.Uniques9),
      ("total_market", TestIndexFixture.Uniques2, TestIndexFixture.Uniques2),
      ("upfront", TestIndexFixture.Uniques2, TestIndexFixture.Uniques2)),
      got.mkString("\n"))
  }

  test("testPostAggMergedHavingSpec (GroupByQueryRunnerTest.java:4950): " +
      "having on a POST-AGG over split daily intervals merged under P1M — " +
      "only mezzanine/premium clear 1000") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": {"type": "period", "period": "P1M"},
        "intervals": ["2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z",
                      "2011-04-03T00:00:00.000Z/2011-04-04T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "having": {"type": "or", "havingSpecs": [
          {"type": "greaterThan", "aggregation": "addRowsIndexConstant", "value": 1000}]},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "index", "fieldName": "index"}],
        "postAggregations": [{"type": "arithmetic", "name": "addRowsIndexConstant",
          "fn": "+", "fields": [
            {"type": "constant", "name": "const", "value": 1},
            {"type": "fieldAccess", "name": "rows", "fieldName": "rows"},
            {"type": "fieldAccess", "name": "index", "fieldName": "index"}]}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("index"), r.getAs[Double]("addRowsIndexConstant")))
      .sortBy(_._2).toSeq
    assert(got == Seq(
      ("2011-04-01", "mezzanine", 6L, 4420L, 4427.0),
      ("2011-04-01", "premium", 6L, 4416L, 4423.0)), got.mkString("\n"))
  }

  test("testCustomAggregatorHavingSpec (GroupByQueryRunnerTest.java:5424): " +
      "OR having (rows=3 OR idxDouble>135) over the exact double sums") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
        "having": {"type": "or", "havingSpecs": [
          {"type": "equalTo", "aggregation": "rows", "value": 3},
          {"type": "greaterThan", "aggregation": "idxDouble", "value": 135.00}]},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "doubleSum", "name": "idxDouble", "fieldName": "index"}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Double]("idxDouble"))).sortBy(t => (t._1, t._2)).toSeq
    val expected = Seq(
      ("2011-04-01", "automotive", 1L, 135.885094), ("2011-04-01", "entertainment", 1L, 158.747224),
      ("2011-04-01", "mezzanine", 3L, 2871.8866900000003), ("2011-04-01", "premium", 3L, 2900.798647),
      ("2011-04-02", "automotive", 1L, 147.425935), ("2011-04-02", "entertainment", 1L, 166.016049),
      ("2011-04-02", "mezzanine", 3L, 2448.830613), ("2011-04-02", "premium", 3L, 2506.415148))
    assert(got.length == expected.length, got.mkString("\n"))
    got.zip(expected).foreach { case ((d, a, n, x), (ed, ea, en, ex)) =>
      assert(d == ed && a == ea && n == en, s"($d,$a,$n) vs ($ed,$ea,$en)")
      assert(relEq(x, ex), s"$a idxDouble $x vs $ex")
    }
  }

  test("testDoubleMeanQuery (GroupByQueryRunnerTest.java:5887): doubleMean " +
      "over the nullable double skips nulls — 51.0 in SQL-compatible mode") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "aggregations": [{"type": "doubleMean", "name": "meanOnDouble",
          "fieldName": "doubleNumericNull"}]
      }""").collect()
    assert(got.length == 1)
    assert(math.abs(got.head.getAs[Double]("meanOnDouble") - 51.0) < 0.0001,
      got.head.getAs[Double]("meanOnDouble").toString)
  }

  test("testGroupByWithTimeColumn (GroupByQueryRunnerTest.java:8250): " +
      "__time as an aggregator INPUT is epoch millis — the longSum and the " +
      "day-2 filtered count (the reference's javascript time predicate as " +
      "a filtered aggregator)") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FirstToThird,
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "filtered",
           "filter": {"type": "bound", "dimension": "__time",
             "lower": "1301702400000", "ordering": "numeric"},
           "aggregator": {"type": "count", "name": "ntimestamps"}},
          {"type": "longSum", "name": "sumtime", "fieldName": "__time"}]
      }""").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("rows") == 26L)
    assert(r.getAs[Long]("ntimestamps") == 13L)
    assert(r.getAs[Long]("sumtime") == 33843139200000L, r.getAs[Long]("sumtime").toString)
  }
}
