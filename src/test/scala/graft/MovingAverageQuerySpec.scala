package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.operators.NativeQuery

/** r15: the movingAverage query type (extensions-contrib/
  * moving-average-query — MovingAverageQueryRunner.java,
  * MovingAverageIterableTest.java semantics): lookback extension, empty
  * buckets per averager null policy, cycleSize stepping, per-dimension
  * window isolation, postAveragers, and the period-only restriction. */
class MovingAverageQuerySpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val registered: Unit = {
    Seq(
      (ts("2020-01-01 00:00:00"), "a", 10L),
      (ts("2020-01-02 00:00:00"), "a", 20L),
      (ts("2020-01-04 00:00:00"), "a", 40L), // 01-03 missing for a
      (ts("2020-01-02 00:00:00"), "b", 5L)   // only one day for b
    ).toDF("__time", "g", "v").createOrReplaceTempView("ma_src")
  }

  private def run(json: String): DataFrame = {
    registered
    NativeQuery.run(spark, json, name => spark.table(name))
  }

  // the bucket column is timestamp_ntz (collects as LocalDateTime)
  private def day(r: org.apache.spark.sql.Row): String =
    r.getAs[Any]("__time").toString.take(10)

  private val base =
    """"dataSource": "ma_src",
       "granularity": {"type": "period", "period": "P1D"},
       "intervals": ["2020-01-03T00:00:00/2020-01-05T00:00:00"],
       "dimensions": [{"type": "default", "dimension": "g"}],
       "aggregations": [{"type": "longSum", "name": "total", "fieldName": "v"}]"""

  test("doubleMean counts empty buckets as 0 in a CONSTANT denominator; " +
      "the lookback extends BEFORE the interval (MovingAverageQueryRunner" +
      ".java:95-101, DoubleMeanAverager.java)") {
    val out = run(
      s"""{
        "queryType": "movingAverage", $base,
        "averagers": [
          {"type": "doubleMean", "name": "avg3", "fieldName": "total", "buckets": 3},
          {"type": "doubleMeanNoNulls", "name": "avgNN", "fieldName": "total", "buckets": 3},
          {"type": "longSum", "name": "sum3", "fieldName": "total", "buckets": 3},
          {"type": "longMax", "name": "max3", "fieldName": "total", "buckets": 3}
        ]
      }""").collect().map(r => (day(r), r.getAs[String]("g"),
        r.getAs[Any]("avg3"), r.getAs[Any]("avgNN"), r.getAs[Any]("sum3"), r.getAs[Any]("max3")))
    // output rows trim to the interval (01-03, 01-04) even though the scan
    // reached back to 01-01; time-major then dimension order
    assert(out.toSeq == Seq(
      // 01-03 @ a: window [10, 20, gap] → mean 30/3, noNulls 15, sum 30, max 20
      ("2020-01-03", "a", 10.0, 15.0, 30L, 20L),
      // 01-03 @ b: [gap, 5, gap] → mean 5/3, noNulls 5, sum 5, max 5
      ("2020-01-03", "b", 5.0 / 3.0, 5.0, 5L, 5L),
      // 01-04 @ a: [20, gap, 40] → mean 60/3, noNulls 30, sum 60, max 40
      ("2020-01-04", "a", 20.0, 30.0, 60L, 40L),
      // 01-04 @ b: [5, gap, gap] → mean 5/3, noNulls 5, sum 5, max 5
      ("2020-01-04", "b", 5.0 / 3.0, 5.0, 5L, 5L)))
  }

  test("cycleSize steps the window — buckets=4, cycleSize=2 averages " +
      "positions {0, 2} only (the day-of-week mechanism, BaseAverager" +
      ".computeResult)") {
    val out = run(
      s"""{
        "queryType": "movingAverage", $base,
        "averagers": [
          {"type": "doubleMean", "name": "cyc", "fieldName": "total",
           "buckets": 4, "cycleSize": 2}
        ]
      }""").collect().filter(_.getAs[String]("g") == "a")
      .map(r => (day(r), r.getAs[Double]("cyc")))
    // 01-03 pairs with 01-01: [gap→0? no — (null + 10)/2 = 5.0]
    // 01-04 pairs with 01-02: (40 + 20)/2 = 30.0
    assert(out.toSeq == Seq(("2020-01-03", 5.0), ("2020-01-04", 30.0)))
  }

  test("no dimensions → one global series (the timeseries form)") {
    val out = run(
      """{
        "queryType": "movingAverage",
        "dataSource": "ma_src",
        "granularity": {"type": "period", "period": "P1D"},
        "intervals": ["2020-01-03T00:00:00/2020-01-05T00:00:00"],
        "aggregations": [{"type": "longSum", "name": "total", "fieldName": "v"}],
        "averagers": [
          {"type": "longMean", "name": "avg", "fieldName": "total", "buckets": 3}]
      }""").collect().map(r => (day(r), r.getAs[Double]("avg")))
    // global daily totals: 01-01=10, 01-02=25, 01-03=gap, 01-04=40
    assert(out.toSeq == Seq(
      ("2020-01-03", 35.0 / 3.0), ("2020-01-04", 65.0 / 3.0)))
  }

  test("postAveragers compute over averager outputs (PostAverager" +
      "AggregatorCalculator.java)") {
    val out = run(
      s"""{
        "queryType": "movingAverage", $base,
        "averagers": [
          {"type": "doubleMean", "name": "avg3", "fieldName": "total", "buckets": 3}],
        "postAveragers": [
          {"type": "arithmetic", "name": "ratio", "fn": "/", "fields": [
            {"type": "fieldAccess", "fieldName": "total"},
            {"type": "fieldAccess", "fieldName": "avg3"}]}]
      }""").collect().filter(r => r.getAs[String]("g") == "a" && day(r) == "2020-01-04")
    // 01-04 @ a: total 40, avg3 20 → ratio 2.0
    assert(out.head.getAs[Double]("ratio") == 2.0)
  }

  test("constant averager and limitSpec") {
    val out = run(
      s"""{
        "queryType": "movingAverage", $base,
        "averagers": [
          {"type": "constant", "name": "c", "retval": 1.5},
          {"type": "doubleMean", "name": "avg3", "fieldName": "total", "buckets": 3}],
        "limitSpec": {"type": "default",
          "columns": [{"dimension": "avg3", "direction": "descending"}],
          "limit": 2}
      }""").collect().map(r => (r.getAs[String]("g"), r.getAs[Float]("c"), r.getAs[Double]("avg3")))
    assert(out.toSeq == Seq(("a", 1.5f, 20.0), ("a", 1.5f, 10.0)))
  }

  test("having filters final rows AFTER averagers, before sort/limit " +
      "(MovingAverageQuery.java:152-156)") {
    val out = run(
      s"""{
        "queryType": "movingAverage", $base,
        "averagers": [
          {"type": "doubleMean", "name": "avg3", "fieldName": "total", "buckets": 3}],
        "having": {"type": "and", "havingSpecs": [
          {"type": "greaterThan", "aggregation": "avg3", "value": 2},
          {"type": "not", "havingSpec":
            {"type": "dimSelector", "dimension": "g", "value": "b"}}]}
      }""").collect().map(r => (r.getAs[String]("g"), r.getAs[Double]("avg3")))
    // only g=a rows clear avg3 > 2 AND g != b; both a-rows survive (10, 20)
    assert(out.toSeq == Seq(("a", 10.0), ("a", 20.0)))
  }

  test("multi-interval: every interval gets the lookback extension " +
      "(MovingAverageQueryRunner.java:96-104 maps start-(buckets-1) periods " +
      "over EACH interval), buckets index sequentially ACROSS intervals " +
      "(RowBucketIterable.java:105-110 — no averager reset at the seam), " +
      "and output trims to the union of reporting intervals") {
    Seq(
      (ts("2020-01-01 00:00:00"), "a", 10L),
      (ts("2020-01-02 00:00:00"), "a", 20L),
      (ts("2020-01-04 00:00:00"), "a", 40L)
    ).toDF("__time", "g", "v").createOrReplaceTempView("ma_multi")
    val out = run(
      """{
        "queryType": "movingAverage",
        "dataSource": "ma_multi",
        "granularity": {"type": "period", "period": "P1D"},
        "intervals": ["2020-01-02T00:00:00/2020-01-03T00:00:00",
                      "2020-01-04T00:00:00/2020-01-05T00:00:00"],
        "dimensions": [{"type": "default", "dimension": "g"}],
        "aggregations": [{"type": "longSum", "name": "total", "fieldName": "v"}],
        "averagers": [
          {"type": "longSum", "name": "sum2", "fieldName": "total", "buckets": 2},
          {"type": "doubleMean", "name": "avg2", "fieldName": "total", "buckets": 2}]
      }""").collect()
      .map(r => (day(r), r.getAs[String]("g"), r.getAs[Long]("sum2"), r.getAs[Double]("avg2")))
    // global bucket sequence: 01-01(ivl1 lookback), 01-02(ivl1), 01-03(ivl2
    // lookback — the GAP day, an empty bucket), 01-04(ivl2).
    // 01-02: window [10, 20] → sum 30, mean 15; trimmed rows 01-01/01-03 out.
    // 01-04: window [gap→0, 40] → sum 40, mean 20 — the lookback is ivl2's
    // OWN extension, not ivl1's last reported bucket.
    assert(out.toSeq == Seq(
      ("2020-01-02", "a", 30L, 15.0),
      ("2020-01-04", "a", 40L, 20.0)))
  }

  test("a NULL dimension value re-matches its aggregated rows (the spine " +
      "join is null-safe; a null dim is a normal groupBy output)") {
    Seq(
      (ts("2020-01-01 00:00:00"), Option.empty[String], 10L),
      (ts("2020-01-02 00:00:00"), Option.empty[String], 20L),
      (ts("2020-01-02 00:00:00"), Option("x"), 7L)
    ).toDF("__time", "g", "v").createOrReplaceTempView("ma_nulldim")
    val out = run(
      """{
        "queryType": "movingAverage",
        "dataSource": "ma_nulldim",
        "granularity": {"type": "period", "period": "P1D"},
        "intervals": ["2020-01-02T00:00:00/2020-01-03T00:00:00"],
        "dimensions": [{"type": "default", "dimension": "g"}],
        "aggregations": [{"type": "longSum", "name": "total", "fieldName": "v"}],
        "averagers": [
          {"type": "longSum", "name": "sum2", "fieldName": "total", "buckets": 2}]
      }""").collect()
      .map(r => (day(r), Option(r.getAs[String]("g")), r.getAs[Long]("sum2")))
    // null combo window [10, 20] → 30 (a non-null-safe join would read the
    // null combo's buckets as all-empty and return 0); "x" window [gap, 7]
    assert(out.toSet == Set(
      ("2020-01-02", None, 30L),
      ("2020-01-02", Some("x"), 7L)))
  }

  test("a mis-sized spine rejects with IllegalArgumentException (the " +
      "facade's 400-class validation error), not a 500") {
    val e = intercept[IllegalArgumentException] { run(
      """{
        "queryType": "movingAverage", "dataSource": "ma_src",
        "granularity": {"type": "period", "period": "PT1S"},
        "intervals": ["1970-01-01T00:00:00/2020-01-01T00:00:00"],
        "aggregations": [{"type": "count", "name": "cnt"}],
        "averagers": [{"type": "longMean", "name": "m", "fieldName": "cnt", "buckets": 2}]
      }""") }
    assert(e.getMessage.contains("spine exceeds"))
  }

  test("only period granularities (MovingAverageQueryRunner.java:96-104); " +
      "non-UTC zones unsupported (documented port restriction)") {
    intercept[IllegalArgumentException] { run(
      """{
        "queryType": "movingAverage", "dataSource": "ma_src",
        "granularity": {"type": "duration", "duration": 86400000},
        "intervals": ["2020-01-03T00:00:00/2020-01-05T00:00:00"],
        "aggregations": [{"type": "count", "name": "cnt"}],
        "averagers": [{"type": "longMean", "name": "m", "fieldName": "cnt", "buckets": 2}]
      }""") }
    intercept[UnsupportedOperationException] { run(
      """{
        "queryType": "movingAverage", "dataSource": "ma_src",
        "granularity": {"type": "period", "period": "P1D", "timeZone": "America/Los_Angeles"},
        "intervals": ["2020-01-03T00:00:00/2020-01-05T00:00:00"],
        "aggregations": [{"type": "count", "name": "cnt"}],
        "averagers": [{"type": "longMean", "name": "m", "fieldName": "cnt", "buckets": 2}]
      }""") }
  }
}
