package graft

import org.apache.spark.sql.DataFrame
import graft.operators.NativeQuery

/** VarianceGroupByQueryTest.java goldens (extensions-core/stats/.../
  * variance) over the canonical TestIndex fixture: the native `variance`
  * aggregator (no inputType → the factory's FLOAT default — index values
  * accumulate at float32 even though the column is double,
  * VarianceAggregatorFactory.getInputType:315 — finalized DOUBLE) and the
  * `stddev` StandardDeviationPostAggregator, through day/month
  * granularities, having on the post-agg, and a limit ordered by it. The
  * 737.0179286322613-style pins are the reference's own. */
class VarianceGroupByGoldenSpec extends SparkSpecBase {

  private lazy val testIndex: DataFrame = TestIndexFixture.testIndex(spark)
  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => testIndex)

  private def day(r: org.apache.spark.sql.Row): String =
    r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString

  // The variance fold is ORDER-DEPENDENT in its low bits, and the
  // reference's expected constants encode ITS segment layout (the runner's
  // incremental+persisted split merges mezzanine's rows through the
  // ratio-weighted fold). Groups whose rows fold sequentially here match
  // to the last bit (premium); split-order-sensitive groups (mezzanine)
  // match to 1e-7 relative — the collector formula itself is pinned
  // bit-exactly by VarianceSqlGoldenSpec.
  private def close(a: Double, b: Double): Boolean =
    a == b || math.abs(a - b) <= 1e-7 * math.max(math.abs(a), math.abs(b))

  test("testGroupByVarianceOnly (:101) + testGroupBy (:142): variance + " +
      "stddev post-agg per (day, quality)") {
    val rows = run("""{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"dimension": "quality", "outputName": "alias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "variance", "name": "index_var", "fieldName": "index"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ],
        "postAggregations": [
          {"type": "stddev", "name": "index_stddev", "fieldName": "index_var"}
        ]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("idx"), r.getAs[Double]("index_stddev"),
        r.getAs[Double]("index_var")))
      .sortBy(t => (t._1, t._2)).toSeq

    val expected = Seq(
      ("2011-04-01", "automotive", 1L, 135L, 0.0, 0.0),
      ("2011-04-01", "business", 1L, 118L, 0.0, 0.0),
      ("2011-04-01", "entertainment", 1L, 158L, 0.0, 0.0),
      ("2011-04-01", "health", 1L, 120L, 0.0, 0.0),
      ("2011-04-01", "mezzanine", 3L, 2870L, 737.0179286322613, 543195.4271253889),
      ("2011-04-01", "news", 1L, 121L, 0.0, 0.0),
      ("2011-04-01", "premium", 3L, 2900L, 726.6322593583996, 527994.4403402924),
      ("2011-04-01", "technology", 1L, 78L, 0.0, 0.0),
      ("2011-04-01", "travel", 1L, 119L, 0.0, 0.0),
      ("2011-04-02", "automotive", 1L, 147L, 0.0, 0.0),
      ("2011-04-02", "business", 1L, 112L, 0.0, 0.0),
      ("2011-04-02", "entertainment", 1L, 166L, 0.0, 0.0),
      ("2011-04-02", "health", 1L, 113L, 0.0, 0.0),
      ("2011-04-02", "mezzanine", 3L, 2447L, 611.3420766546617, 373739.13468843425),
      ("2011-04-02", "news", 1L, 114L, 0.0, 0.0),
      ("2011-04-02", "premium", 3L, 2505L, 621.3898134843073, 386125.30030206224),
      ("2011-04-02", "technology", 1L, 97L, 0.0, 0.0),
      ("2011-04-02", "travel", 1L, 126L, 0.0, 0.0))
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._4 == e._4, s"$g vs $e")
      assert(close(g._5, e._5) && close(g._6, e._6), s"$g vs $e")
    }
  }

  test("testPostAggHavingSpec (:187): having greaterThan on the stddev " +
      "post-agg, then a limit ordered by it") {
    val base = """{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "P1M",
        "intervals": ["2011-04-02T00:00:00.000Z/2011-04-04T00:00:00.000Z"],
        "dimensions": [{"dimension": "quality", "outputName": "alias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "index", "fieldName": "index"},
          {"type": "variance", "name": "index_var", "fieldName": "index"}
        ],
        "postAggregations": [
          {"type": "stddev", "name": "index_stddev", "fieldName": "index_var"}
        ],
        "having": {"type": "or", "havingSpecs": [
          {"type": "greaterThan", "aggregation": "index_stddev", "value": 15}]}%s
      }"""
    val rows = run(base.format("")).collect()
      .map(r => (r.getAs[String]("alias"), r.getAs[Long]("rows"),
        r.getAs[Long]("index"), r.getAs[Double]("index_var"),
        r.getAs[Double]("index_stddev")))
      .sortBy(_._1).toSeq
    val expected = Seq(
      ("automotive", 2L, 269L, 299.0009819048282, 17.29164485827847),
      ("mezzanine", 6L, 4420L, 254083.76447001836, 504.06722217380724),
      ("premium", 6L, 4416L, 252279.2020389339, 502.27403082275106))
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g vs $e")
      assert(close(g._4, e._4) && close(g._5, e._5), s"$g vs $e")
    }

    val limited = run(base.format(
      """, "limitSpec": {"type": "default", "limit": 2, "columns": [
        |    {"dimension": "index_stddev", "direction": "ascending"}]}""".stripMargin))
      .collect()
      .map(r => (r.getAs[String]("alias"), r.getAs[Double]("index_stddev"))).toSeq
    assert(limited.map(_._1) == Seq("automotive", "premium"), limited.mkString(","))
    assert(close(limited(0)._2, 17.29164485827847))
    assert(close(limited(1)._2, 502.27403082275106))
  }

  test("testGroupByZtestPostAgg (:242): zscore2sample over the idx/stddev " +
      "conversion rates, limit desc by it — premium's z = 36.54266309285626") {
    val rows = run("""{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"dimension": "quality", "outputName": "alias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "variance", "name": "index_var", "fieldName": "index"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ],
        "postAggregations": [
          {"type": "stddev", "name": "index_stddev", "fieldName": "index_var"},
          {"type": "zscore2sample", "name": "ztest",
           "successCount1": {"type": "fieldAccess", "fieldName": "idx"},
           "sample1Size": {"type": "constant", "value": 100000},
           "successCount2": {"type": "fieldAccess", "fieldName": "index_stddev"},
           "sample2Size": {"type": "constant", "value": 100000}}
        ],
        "limitSpec": {"type": "default", "limit": 1, "columns": [
          {"dimension": "ztest", "direction": "descending"}]}
      }""").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("alias") == "premium")
    assert(r.getAs[Long]("rows") == 3L && r.getAs[Long]("idx") == 2900L)
    assert(close(r.getAs[Double]("index_stddev"), 726.632270328514))
    assert(close(r.getAs[Double]("ztest"), 36.54266309285626))
  }

  test("testGroupByTestPvalueZscorePostAgg (:283): pvalue2tailedZtest — a " +
      "zero 'z-score' gives p = 1.0, sorted first under DESC") {
    val rows = run("""{
        "queryType": "groupBy",
        "dataSource": "testIndex",
        "granularity": "day",
        "intervals": ["2011-04-01T00:00:00.000Z/2011-04-03T00:00:00.000Z"],
        "dimensions": [{"dimension": "quality", "outputName": "alias"}],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "variance", "name": "index_var", "fieldName": "index"},
          {"type": "longSum", "name": "idx", "fieldName": "index"}
        ],
        "postAggregations": [
          {"type": "stddev", "name": "index_stddev", "fieldName": "index_var"},
          {"type": "pvalue2tailedZtest", "name": "pvalueZscore",
           "zScore": {"type": "fieldAccess", "fieldName": "index_stddev"}}
        ],
        "limitSpec": {"type": "default", "limit": 1, "columns": [
          {"dimension": "pvalueZscore", "direction": "descending"}]}
      }""").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("alias") == "automotive")
    assert(r.getAs[Long]("rows") == 1L && r.getAs[Long]("idx") == 135L)
    assert(r.getAs[Double]("index_var") == 0.0)
    assert(r.getAs[Double]("pvalueZscore") == 1.0)
  }
}
