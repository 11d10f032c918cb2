package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.operators.NativeQuery

/** Port of the reference's movingAverage query-test corpus
  * (extensions-contrib/moving-average-query/src/test/resources/queryTests/
  * *.yaml, driven by MovingAverageQueryTest.java): each yaml pins the query,
  * the inner groupBy/timeseries intermediates, and the expected output rows.
  * The fixtures here are raw rows CONSTRUCTED to aggregate to each yaml's
  * `intermediateResults` exactly, so the expected outputs carry over.
  *
  * Standing adaptation: the reference extension refuses SQL-compatible null
  * handling outright (moving-average-query.md "Limitations" — it is
  * replaceWithDefault-only), so a missing bucket's AGGREGATOR cells render
  * as 0 there and as SQL NULL here; the AVERAGER values are identical in
  * both modes (mean adds 0 for an empty bucket, max/min skip it) and are
  * asserted verbatim.
  */
class MovingAverageGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val d1 = ts("2017-01-01 00:00:00")
  private val d2 = ts("2017-01-02 00:00:00")

  private def run(json: String): Array[org.apache.spark.sql.Row] =
    NativeQuery.run(spark, json, name => spark.table(name)).collect()

  private def baseQuery(table: String, limitSpec: String = ""): String =
    s"""{
      "queryType": "movingAverage",
      "dataSource": "$table",
      "granularity": {"type": "period", "period": "P1D"},
      "intervals": ["2017-01-02T00:00:00/2017-01-03T00:00:00"],
      "dimensions": ["gender"],
      "averagers": [
        {"buckets": 2, "name": "trailing7DayAvgTimeSpent",
         "fieldName": "timeSpent", "type": "doubleMean"}],
      "aggregations": [
        {"name": "timespent_secs", "fieldName": "timespent", "type": "longSum"}],
      "postAggregations": [
        {"type": "arithmetic", "name": "timeSpent", "fn": "/", "fields": [
          {"type": "fieldAccess", "fieldName": "timespent_secs"},
          {"type": "constant", "name": "seconds_per_minute", "value": 60.0}]}]
      $limitSpec
    }"""

  test("basicGroupByMovingAverage.yaml — averager over a POST-AGGREGATION " +
      "field; only the requested interval emits") {
    // intermediates: [d1, m, 120, 2.0], [d2, m, 240, 4.0]
    Seq((d1, "m", 120L), (d2, "m", 240L)).toDF("__time", "gender", "timespent")
      .createOrReplaceTempView("ma_basic")
    val out = run(baseQuery("ma_basic"))
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("gender") == "m")
    assert(r.getAs[Long]("timespent_secs") == 240L)
    assert(r.getAs[Double]("timeSpent") == 4.0)
    assert(r.getAs[Double]("trailing7DayAvgTimeSpent") == 3.0) // (2+4)/2
  }

  test("basicTimeseriesMovingAverage.yaml — empty dimensions (the " +
      "timeseries form)") {
    Seq((d1, "m", 120L), (d2, "m", 240L)).toDF("__time", "gender", "timespent")
      .createOrReplaceTempView("ma_ts")
    val out = run(
      """{
        "queryType": "movingAverage",
        "dataSource": "ma_ts",
        "granularity": {"type": "period", "period": "P1D"},
        "intervals": ["2017-01-02T00:00:00/2017-01-03T00:00:00"],
        "dimensions": [],
        "averagers": [
          {"buckets": 2, "name": "trailing7DayAvgTimeSpent",
           "fieldName": "timeSpent", "type": "doubleMean"}],
        "aggregations": [
          {"name": "timespent_secs", "fieldName": "timespent", "type": "longSum"}],
        "postAggregations": [
          {"type": "arithmetic", "name": "timeSpent", "fn": "/", "fields": [
            {"type": "fieldAccess", "fieldName": "timespent_secs"},
            {"type": "constant", "name": "seconds_per_minute", "value": 60.0}]}]
      }""")
    assert(out.length == 1)
    assert(out.head.getAs[Long]("timespent_secs") == 240L)
    assert(out.head.getAs[Double]("trailing7DayAvgTimeSpent") == 3.0)
  }

  test("missingGroupByValues.yaml — a dim combo ABSENT from a bucket still " +
      "emits a row, and its averager sees the empty bucket as 0 " +
      "(MovingAverageIterable's fake rows; aggregator cells NULL here vs the " +
      "reference's replaceWithDefault 0 — documented adaptation)") {
    // intermediates: [d1,m,120,5.0,2.0], [d1,f,120,2.0,2.0], [d2,m,240,3.0,4.0]
    Seq((d1, "m", 120L, 5.0), (d1, "f", 120L, 2.0), (d2, "m", 240L, 3.0))
      .toDF("__time", "gender", "timespent", "someSum_field")
      .createOrReplaceTempView("ma_missing")
    val out = run(
      """{
        "queryType": "movingAverage",
        "dataSource": "ma_missing",
        "granularity": {"type": "period", "period": "P1D"},
        "intervals": ["2017-01-02T00:00:00/2017-01-03T00:00:00"],
        "dimensions": ["gender"],
        "averagers": [
          {"buckets": 2, "name": "trailing7DayAvgTimeSpent",
           "fieldName": "timeSpent", "type": "doubleMean"}],
        "aggregations": [
          {"name": "timespent_secs", "fieldName": "timespent", "type": "longSum"},
          {"name": "someSum", "fieldName": "someSum_field", "type": "doubleSum"}],
        "postAggregations": [
          {"type": "arithmetic", "name": "timeSpent", "fn": "/", "fields": [
            {"type": "fieldAccess", "fieldName": "timespent_secs"},
            {"type": "constant", "name": "seconds_per_minute", "value": 60.0}]}]
      }""").map(r => r.getAs[String]("gender") ->
        (r.getAs[Any]("timespent_secs"), r.getAs[Double]("trailing7DayAvgTimeSpent"))).toMap
    // m: window [2.0, 4.0] → 3.0; f: window [2.0, <empty>] → (2+0)/2 = 1.0
    assert(out("m") == ((240L, 3.0)))
    assert(out("f")._2 == 1.0)
    assert(out("f")._1 == null, "missing-bucket aggregator is NULL (sql-compatible)")
  }

  test("sortingAveragersAsc.yaml / sortingAveragersDesc.yaml — limitSpec " +
      "orders by the AVERAGER output") {
    Seq((d1, "m", 120L), (d1, "f", 240L), (d2, "m", 240L), (d2, "f", 480L))
      .toDF("__time", "gender", "timespent")
      .createOrReplaceTempView("ma_sort")
    val asc = run(baseQuery("ma_sort",
      """, "limitSpec": {"type": "default", "columns": [{"dimension": "trailing7DayAvgTimeSpent"}]}"""))
      .map(r => (r.getAs[String]("gender"), r.getAs[Double]("trailing7DayAvgTimeSpent")))
    assert(asc.toSeq == Seq(("m", 3.0), ("f", 6.0)))
    val desc = run(baseQuery("ma_sort",
      """, "limitSpec": {"type": "default", "columns": [
         {"dimension": "trailing7DayAvgTimeSpent", "direction": "DESC"}]}"""))
      .map(r => (r.getAs[String]("gender"), r.getAs[Double]("trailing7DayAvgTimeSpent")))
    assert(desc.toSeq == Seq(("f", 6.0), ("m", 3.0)))
  }

  test("sortingWithNonMovingAvgMetric.yaml — order by a NON-averager " +
      "metric; a 7-bucket window over 2 days of data divides by the full 7") {
    // intermediates: [d1,m,5.0,10.0,15.0], [d1,f,6.0,12.0,18.0], [d2,f,1.0,2.0,3.0]
    Seq((d1, "m", 5.0, 10.0), (d1, "f", 6.0, 12.0), (d2, "f", 1.0, 2.0))
      .toDF("__time", "gender", "apv", "pv")
      .createOrReplaceTempView("ma_nonmoving")
    val out = run(
      """{
        "queryType": "movingAverage",
        "dataSource": "ma_nonmoving",
        "granularity": {"type": "period", "period": "P1D"},
        "intervals": ["2017-01-02T00:00:00/2017-01-03T00:00:00"],
        "dimensions": ["gender"],
        "averagers": [
          {"buckets": 7, "name": "trailing7DayAvgTotalPageViews",
           "fieldName": "totalPageViews", "type": "doubleMean"}],
        "aggregations": [
          {"name": "addPageViews", "fieldName": "apv", "type": "doubleSum"},
          {"name": "pageViews", "fieldName": "pv", "type": "doubleSum"}],
        "postAggregations": [
          {"type": "arithmetic", "name": "totalPageViews", "fn": "+", "fields": [
            {"type": "fieldAccess", "fieldName": "addPageViews"},
            {"type": "fieldAccess", "fieldName": "pageViews"}]}],
        "limitSpec": {"type": "default", "columns": [
          {"dimension": "addPageViews", "direction": "DESC"}]}
      }""").map(r => (r.getAs[String]("gender"),
        r.getAs[Any]("addPageViews"), r.getAs[Double]("trailing7DayAvgTotalPageViews")))
    // f first (addPageViews 1.0 beats m's empty bucket), then m whose
    // 7-bucket mean is 15.0/7 (the yaml's 2.142857142857143)
    assert(out.toSeq == Seq(
      ("f", 1.0, 3.0),
      ("m", null, 2.142857142857143)))
  }
}
