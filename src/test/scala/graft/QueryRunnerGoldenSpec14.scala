package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.NativeQuery

/** Runner-golden tranche 14 over the shared TestIndex fixture: the
  * forceLimitPushDown family (plain, offset, long-extraction dim not in the
  * limit spec, split-interval merge; the two cases the reference REJECTS as
  * pushdown-implementation limits — post-agg ordering, having present — are
  * SUPERSETS here: Catalyst's TakeOrderedAndProject pushdown has neither
  * restriction, so the queries execute with their well-defined results) and
  * the nested-groupBy subquery tail (multiple outer intervals, outer
  * virtual columns, outer cardinality, inner post-aggs + having, the
  * multi-column lambda aggregator, and the hyperUnique-through-post-agg
  * hop). Each test cites its reference method; the reference's JavaScript
  * filter/aggregator legs are adapted to TRUE filters / expression-lambda
  * folds (javascript is a documented non-goal).
  */
class QueryRunnerGoldenSpec14 extends SparkSpecBase {

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

  // ---- forceLimitPushDown family ----

  test("testGroupByLimitPushDown (GroupByQueryRunnerTest.java:11033) / " +
      "testGroupByLimitPushDownWithOffset (:11081): market desc under " +
      "forceLimitPushDown — " +
      "limit 2 then (limit 1, offset 2) slices of upfront/total_market/spot") {
    def q(limitSpec: String): Seq[(String, Long)] = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimensions": [{"type": "default", "dimension": "market", "outputName": "marketalias"}],
        "limitSpec": $limitSpec,
        "context": {"forceLimitPushDown": true},
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
      .map(r => (r.getAs[String]("marketalias"), r.getAs[Long]("rows"))).toSeq
    assert(q("""{"type": "default", "columns": [
        {"dimension": "marketalias", "direction": "descending"}], "limit": 2}""")
      == Seq(("upfront", 186L), ("total_market", 186L)))
    assert(q("""{"type": "default", "columns": [
        {"dimension": "marketalias", "direction": "descending"}],
        "limit": 1, "offset": 2}""")
      == Seq(("spot", 837L)))
  }

  test("testGroupByLimitPushDownWithLongDimensionNotInLimitSpec (GroupBy" +
      "QueryRunnerTest.java:11130): bare limit over a LONG strlen extraction " +
      "dim truncates the NUMERICALLY-ordered stream at 6 of 7 groups") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimensions": [{"type": "extraction", "dimension": "quality",
          "outputName": "qualityLen", "outputType": "LONG",
          "extractionFn": {"type": "strlen"}}],
        "limitSpec": {"type": "default", "limit": 6},
        "context": {"forceLimitPushDown": true},
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
      .map(r => (r.getAs[Long]("qualityLen"), r.getAs[Long]("rows"))).toSeq
    assert(got == Seq((4L, 93L), (6L, 186L), (7L, 279L), (8L, 93L),
      (9L, 279L), (10L, 186L)), got.mkString("\n"))
  }

  test("testMergeLimitPushDownResultsWithLongDimensionNotInLimitSpec " +
      "(GroupByQueryRunnerTest.java:11209): the same bare-limit query over " +
      "TWO daily segment intervals re-merges into 7 ALL-granularity groups") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all",
        "intervals": ["2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z",
                      "2011-04-03T00:00:00.000Z/2011-04-04T00:00:00.000Z"],
        "dimensions": [{"type": "extraction", "dimension": "quality",
          "outputName": "qualityLen", "outputType": "LONG",
          "extractionFn": {"type": "strlen"}}],
        "limitSpec": {"type": "default", "limit": 20},
        "context": {"forceLimitPushDown": true},
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
      .map(r => (r.getAs[Long]("qualityLen"), r.getAs[Long]("rows"))).toSeq
    assert(got == Seq((4L, 2L), (6L, 4L), (7L, 6L), (8L, 2L), (9L, 6L),
      (10L, 4L), (13L, 2L)), got.mkString("\n"))
  }

  test("testGroupByLimitPushDownPostAggNotSupported (GroupByQueryRunnerTest" +
      ".java:11639): the reference rejects pushdown ordered by a post-agg " +
      "('Limit push down when sorting by a post aggregator is not " +
      "supported'); SUPERSET: Catalyst orders by the constant and limits") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimensions": [{"type": "default", "dimension": "market", "outputName": "marketalias"}],
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "constant", "direction": "descending", "dimensionOrder": "numeric"}],
          "limit": 2},
        "context": {"forceLimitPushDown": true},
        "aggregations": [{"type": "count", "name": "rows"}],
        "postAggregations": [{"type": "constant", "name": "constant", "value": 1}]
      }""").collect()
    assert(got.length == 2)
    assert(got.forall(_.getAs[Number]("constant").doubleValue == 1.0))
  }

  test("testRejectForceLimitPushDownWithHaving (GroupByQueryRunnerTest.java:" +
      "11855): the reference rejects forced pushdown with a having spec " +
      "('Cannot force limit push down when a having spec is present'); " +
      "SUPERSET: having applies before the ordered limit") {
    val got = run(s"""{
        "queryType": "groupBy", "dataSource": "testIndex",
        "granularity": "all", "intervals": $FullOn,
        "dimensions": [{"type": "default", "dimension": "market", "outputName": "marketalias"}],
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "marketalias", "direction": "descending"}], "limit": 2},
        "context": {"forceLimitPushDown": true},
        "having": {"type": "greaterThan", "aggregation": "rows", "value": 10},
        "aggregations": [{"type": "count", "name": "rows"}]
      }""").collect()
      .map(r => (r.getAs[String]("marketalias"), r.getAs[Long]("rows"))).toSeq
    assert(got == Seq(("upfront", 186L), ("total_market", 186L)), got.mkString("\n"))
  }

  // ---- subquery tail ----

  test("testEmptySubqueryWithLimitPushDown (GroupByQueryRunnerTest.java:" +
      "11678): an inner query over an interval with no data yields an " +
      "empty outer result") {
    val rows = run(s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day",
          "intervals": ["2020-04-02T00:00:00.000Z/2020-04-03T00:00:00.000Z"],
          "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
          "limitSpec": {"type": "default", "columns": [
            {"dimension": "alias", "direction": "descending"}], "limit": 5},
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"}]
        }},
        "granularity": "day", "intervals": $FirstToThird,
        "limitSpec": {"type": "default", "limit": 5},
        "aggregations": [{"type": "doubleMax", "name": "idx", "fieldName": "idx"}]
      }""").collect()
    assert(rows.isEmpty, rows.mkString("\n"))
  }

  test("testSubqueryWithMultipleIntervalsInOuterQuery (GroupByQueryRunner" +
      "Test.java:5597): outer intervals clip the inner DAY buckets — both " +
      "days survive because bucket timestamps are interval starts") {
    val got = run(s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FirstToThird,
          "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
          "filter": {"type": "true"},
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"},
            {"type": "longSum", "name": "indexMaxPlusTen", "fieldName": "indexMaxPlusTen"}]
        }},
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-01T23:58:00.000Z",
                      "2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "alias", "outputName": "alias"}],
        "aggregations": [
          {"type": "longSum", "name": "rows", "fieldName": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "idx"}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      ("2011-04-01", "automotive", 1L, 135L), ("2011-04-01", "business", 1L, 118L),
      ("2011-04-01", "entertainment", 1L, 158L), ("2011-04-01", "health", 1L, 120L),
      ("2011-04-01", "mezzanine", 3L, 2870L), ("2011-04-01", "news", 1L, 121L),
      ("2011-04-01", "premium", 3L, 2900L), ("2011-04-01", "technology", 1L, 78L),
      ("2011-04-01", "travel", 1L, 119L),
      ("2011-04-02", "automotive", 1L, 147L), ("2011-04-02", "business", 1L, 112L),
      ("2011-04-02", "entertainment", 1L, 166L), ("2011-04-02", "health", 1L, 113L),
      ("2011-04-02", "mezzanine", 3L, 2447L), ("2011-04-02", "news", 1L, 114L),
      ("2011-04-02", "premium", 3L, 2505L), ("2011-04-02", "technology", 1L, 97L),
      ("2011-04-02", "travel", 1L, 126L)), got.mkString("\n"))
  }

  test("testSubqueryWithMultipleIntervalsInOuterQueryWithLimitPushDown " +
      "(GroupByQueryRunnerTest.java:11711): inner desc-limit 12, outer " +
      "desc-limit 15 — day 1's nine aliases then day 2's first three") {
    val got = run(s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FirstToThird,
          "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
          "filter": {"type": "true"},
          "limitSpec": {"type": "default", "columns": [
            {"dimension": "alias", "direction": "descending"}], "limit": 12},
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"},
            {"type": "longSum", "name": "indexMaxPlusTen", "fieldName": "indexMaxPlusTen"}]
        }},
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-01T23:58:00.000Z",
                      "2011-04-02T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "alias", "outputName": "alias"}],
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "alias", "direction": "descending"}], "limit": 15},
        "aggregations": [
          {"type": "longSum", "name": "rows", "fieldName": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "idx"}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"))).toSeq
    assert(got == Seq(
      ("2011-04-01", "travel", 1L, 119L), ("2011-04-01", "technology", 1L, 78L),
      ("2011-04-01", "premium", 3L, 2900L), ("2011-04-01", "news", 1L, 121L),
      ("2011-04-01", "mezzanine", 3L, 2870L), ("2011-04-01", "health", 1L, 120L),
      ("2011-04-01", "entertainment", 1L, 158L), ("2011-04-01", "business", 1L, 118L),
      ("2011-04-01", "automotive", 1L, 135L),
      ("2011-04-02", "travel", 1L, 126L), ("2011-04-02", "technology", 1L, 97L),
      ("2011-04-02", "premium", 3L, 2505L)), got.mkString("\n"))
  }

  test("testDifferentGroupingSubqueryMultipleAggregatorsOnSameField (GroupBy" +
      "QueryRunnerTest.java:5770): two aggregators reading the same inner " +
      "column and two reading the same inner POST-AGG") {
    val got = run(s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FirstToThird,
          "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"}],
          "postAggregations": [{"type": "arithmetic", "name": "post_agg",
            "fn": "+", "fields": [
              {"type": "fieldAccess", "name": "idx", "fieldName": "idx"},
              {"type": "fieldAccess", "name": "idx", "fieldName": "idx"}]}]
        }},
        "granularity": "day", "intervals": $FirstToThird,
        "aggregations": [
          {"type": "doubleMax", "name": "idx1", "fieldName": "idx"},
          {"type": "doubleMax", "name": "idx2", "fieldName": "idx"},
          {"type": "doubleMax", "name": "idx3", "fieldName": "post_agg"},
          {"type": "doubleMax", "name": "idx4", "fieldName": "post_agg"}]
      }""").collect()
      .map(r => (day(r), r.getAs[Double]("idx1"), r.getAs[Double]("idx2"),
        r.getAs[Double]("idx3"), r.getAs[Double]("idx4"))).sortBy(_._1).toSeq
    assert(got == Seq(
      ("2011-04-01", 2900.0, 2900.0, 5800.0, 5800.0),
      ("2011-04-02", 2505.0, 2505.0, 5010.0, 5010.0)), got.mkString("\n"))
  }

  test("testDifferentGroupingSubqueryWithFilter (GroupByQueryRunnerTest" +
      ".java:5819): outer OR-of-selectors filter over the inner dimension") {
    val got = run(s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FirstToThird,
          "dimensions": [{"type": "default", "dimension": "quality", "outputName": "quality"}],
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"}]
        }},
        "granularity": "day", "intervals": $FirstToThird,
        "filter": {"type": "or", "fields": [
          {"type": "selector", "dimension": "quality", "value": "automotive"},
          {"type": "selector", "dimension": "quality", "value": "premium"},
          {"type": "selector", "dimension": "quality", "value": "mezzanine"},
          {"type": "selector", "dimension": "quality", "value": "business"},
          {"type": "selector", "dimension": "quality", "value": "entertainment"},
          {"type": "selector", "dimension": "quality", "value": "health"},
          {"type": "selector", "dimension": "quality", "value": "news"},
          {"type": "selector", "dimension": "quality", "value": "technology"},
          {"type": "selector", "dimension": "quality", "value": "travel"}]},
        "aggregations": [{"type": "doubleMax", "name": "idx", "fieldName": "idx"}]
      }""").collect()
      .map(r => (day(r), r.getAs[Double]("idx"))).sortBy(_._1).toSeq
    assert(got == Seq(("2011-04-01", 2900.0), ("2011-04-02", 2505.0)),
      got.mkString("\n"))
  }

  test("testSubqueryWithOuterVirtualColumns (GroupByQueryRunnerTest.java:" +
      "6829): a constant virtual column summed over the inner rows counts " +
      "the 18 day-quality groups") {
    val got = run(s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FullOn,
          "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}]
        }},
        "granularity": "all", "intervals": $FirstToThird,
        "virtualColumns": [{"type": "expression", "name": "expr",
          "expression": "1", "outputType": "FLOAT"}],
        "aggregations": [{"type": "longSum", "name": "count", "fieldName": "expr"}]
      }""").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("count") == 18L)
  }

  test("testSubqueryWithOuterCardinalityAggregator (GroupByQueryRunnerTest" +
      ".java:6854): byValue cardinality over the inner market×quality " +
      "groups reproduces UNIQUES_9 exactly") {
    val got = run(s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "all", "intervals": $FullOn,
          "dimensions": [
            {"type": "default", "dimension": "market", "outputName": "market"},
            {"type": "default", "dimension": "quality", "outputName": "quality"}],
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "index", "fieldName": "index"}]
        }},
        "granularity": "all", "intervals": $FullOn,
        "aggregations": [{"type": "cardinality", "name": "car",
          "fields": ["quality"], "byRow": false}]
      }""").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Double]("car") == TestIndexFixture.Uniques9,
      got.head.getAs[Double]("car").toString)
  }

  test("testSubqueryWithPostAggregatorsAndHaving (GroupByQueryRunnerTest" +
      ".java:6275): inner post-agg + having(<3800) filters mezzanine/" +
      "premium out of day 1 only; outer re-sums the inner post-agg") {
    val got = run(s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FirstToThird,
          "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx_subagg", "fieldName": "index"}],
          "postAggregations": [{"type": "arithmetic", "name": "idx_subpostagg",
            "fn": "+", "fields": [
              {"type": "fieldAccess", "name": "the_idx_subagg", "fieldName": "idx_subagg"},
              {"type": "constant", "name": "thousand", "value": 1000}]}],
          "having": {"type": "lessThan", "aggregation": "idx_subpostagg", "value": 3800},
          "limitSpec": {"type": "default", "columns": [{"dimension": "alias"}]}
        }},
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "alias", "outputName": "alias"}],
        "aggregations": [
          {"type": "longSum", "name": "rows", "fieldName": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "idx_subpostagg"}],
        "postAggregations": [{"type": "arithmetic", "name": "idx_post",
          "fn": "+", "fields": [
            {"type": "fieldAccess", "name": "the_idx_agg", "fieldName": "idx"},
            {"type": "constant", "name": "ten_thousand", "value": 10000}]}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"), r.getAs[Double]("idx_post")))
      .sortBy(t => (t._1, t._2)).toSeq
    val expected = Seq(
      ("2011-04-01", "automotive", 1L, 1135L, 11135.0),
      ("2011-04-01", "business", 1L, 1118L, 11118.0),
      ("2011-04-01", "entertainment", 1L, 1158L, 11158.0),
      ("2011-04-01", "health", 1L, 1120L, 11120.0),
      ("2011-04-01", "news", 1L, 1121L, 11121.0),
      ("2011-04-01", "technology", 1L, 1078L, 11078.0),
      ("2011-04-01", "travel", 1L, 1119L, 11119.0),
      ("2011-04-02", "automotive", 1L, 1147L, 11147.0),
      ("2011-04-02", "business", 1L, 1112L, 11112.0),
      ("2011-04-02", "entertainment", 1L, 1166L, 11166.0),
      ("2011-04-02", "health", 1L, 1113L, 11113.0),
      ("2011-04-02", "mezzanine", 3L, 3447L, 13447.0),
      ("2011-04-02", "news", 1L, 1114L, 11114.0),
      ("2011-04-02", "premium", 3L, 3505L, 13505.0),
      ("2011-04-02", "technology", 1L, 1097L, 11097.0),
      ("2011-04-02", "travel", 1L, 1126L, 11126.0))
    assert(got == expected, got.mkString("\n"))
  }

  test("testSubqueryWithMultiColumnAggregators (GroupByQueryRunnerTest" +
      ".java:6549): the reference's javascript sum(index + strlen(market)) " +
      "expressed as an expression-lambda fold; double inner sum truncates " +
      "through the outer longSum; desc-alias limit 5") {
    val got = run(s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FirstToThird,
          "dimensions": [{"type": "default", "dimension": "quality", "outputName": "alias"}],
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "doubleSum", "name": "idx_subagg", "fieldName": "index"},
            {"type": "expression", "name": "js_agg",
             "fields": ["index", "market"], "initialValue": "0.0",
             "fold": "__acc + index + strlen(market)",
             "combine": "__acc + js_agg"}],
          "postAggregations": [{"type": "arithmetic", "name": "idx_subpostagg",
            "fn": "+", "fields": [
              {"type": "fieldAccess", "name": "the_idx_subagg", "fieldName": "idx_subagg"},
              {"type": "constant", "name": "thousand", "value": 1000}]}],
          "having": {"type": "lessThan", "aggregation": "idx_subpostagg", "value": 3800},
          "limitSpec": {"type": "default", "columns": [{"dimension": "alias"}]}
        }},
        "granularity": "day", "intervals": $FirstToThird,
        "dimensions": [{"type": "default", "dimension": "alias", "outputName": "alias"}],
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "alias", "direction": "descending"}], "limit": 5},
        "aggregations": [
          {"type": "longSum", "name": "rows", "fieldName": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "idx_subpostagg"},
          {"type": "doubleSum", "name": "js_outer_agg", "fieldName": "js_agg"}],
        "postAggregations": [{"type": "arithmetic", "name": "idx_post",
          "fn": "+", "fields": [
            {"type": "fieldAccess", "name": "the_idx_agg", "fieldName": "idx"},
            {"type": "constant", "name": "ten_thousand", "value": 10000}]}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"), r.getAs[Double]("idx_post"),
        r.getAs[Double]("js_outer_agg"))).toSeq
    val expected = Seq(
      ("2011-04-01", "travel", 1L, 1119L, 11119.0, 123.92274475097656),
      ("2011-04-01", "technology", 1L, 1078L, 11078.0, 82.62254333496094),
      ("2011-04-01", "news", 1L, 1121L, 11121.0, 125.58358001708984),
      ("2011-04-01", "health", 1L, 1120L, 11120.0, 124.13470458984375),
      ("2011-04-01", "entertainment", 1L, 1158L, 11158.0, 162.74722290039062))
    assert(got.length == 5, got.mkString("\n"))
    got.zip(expected).foreach { case ((d, a, n, x, p, js), (ed, ea, en, ex, ep, ejs)) =>
      assert(d == ed && a == ea && n == en && x == ex && p == ep,
        s"($d,$a,$n,$x,$p) vs ($ed,$ea,$en,$ex,$ep)")
      assert(relEq(js, ejs), s"$a js_outer_agg $js vs $ejs")
    }
  }

  test("testSubqueryWithHyperUniquesPostAggregator (GroupByQueryRunnerTest" +
      ".java:7170): the raw HLLC collector survives a fieldAccess POST-AGG " +
      "hop through the subquery; the outer re-fold finalizes to UNIQUES_9") {
    val got = run(s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "groupBy", "dataSource": "testIndex",
          "granularity": "day", "intervals": $FirstToThird,
          "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "longSum", "name": "idx", "fieldName": "index"},
            {"type": "hyperUnique", "name": "quality_uniques_inner",
             "fieldName": "quality_uniques"}],
          "postAggregations": [{"type": "fieldAccess",
            "name": "quality_uniques_inner_post",
            "fieldName": "quality_uniques_inner"}]
        }},
        "granularity": "all", "intervals": $FirstToThird,
        "aggregations": [
          {"type": "longSum", "name": "rows", "fieldName": "rows"},
          {"type": "longSum", "name": "idx", "fieldName": "idx"},
          {"type": "hyperUnique", "name": "quality_uniques_outer",
           "fieldName": "quality_uniques_inner_post"}],
        "postAggregations": [{"type": "hyperUniqueCardinality",
          "name": "quality_uniques_outer_post",
          "fieldName": "quality_uniques_outer"}]
      }""").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("rows") == 26L)
    assert(r.getAs[Long]("idx") == 12446L)
    assert(r.getAs[Double]("quality_uniques_outer") == TestIndexFixture.Uniques9)
    assert(r.getAs[Double]("quality_uniques_outer_post") == TestIndexFixture.Uniques9)
  }
}
