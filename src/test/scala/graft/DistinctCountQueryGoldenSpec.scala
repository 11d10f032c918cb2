package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.operators.NativeQuery

/** The contrib distinctcount QUERY batteries (extensions-contrib/
  * distinctcount/src/test/java/org/apache/druid/query/aggregation/
  * distinctcount/, r16 widening): the exact `distinctCount` aggregator
  * through timeseries, groupBy, and topN shapes over the suites' shared
  * three-visitor fixture. This engine computes the GLOBALLY exact distinct
  * count (a documented superset of the reference's same-segment
  * requirement) — identical on these single-segment vectors.
  */
class DistinctCountQueryGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def fixture(base: String): DataFrame =
    Seq((base + " 00:00:00", "0", "iphone", 0L),
      (base + " 00:00:00", "1", "iphone", 1L),
      (base + " 00:00:00", "2", "android", 2L))
      .toDF("ts", "visitor_id", "client_type", "off")
      .selectExpr(
        "cast(cast(ts as timestamp) + make_interval(0,0,0,0,0,0,off) as timestamp_ntz) as __time",
        "visitor_id", "client_type")

  test("DistinctCountTimeseriesQueryTest.testTimeseriesWithDistinctCountAgg " +
      "(:50-113): UV 3, rows 3") {
    val r = NativeQuery.run(spark,
      """{
        "queryType": "timeseries", "dataSource": "testing",
        "granularity": "all",
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "distinctCount", "name": "UV", "fieldName": "visitor_id"}]
      }""", _ => fixture("2016-03-04")).head()
    assert(r.getAs[Long]("rows") == 3L && r.getAs[Long]("UV") == 3L)
  }

  test("DistinctCountGroupByQueryTest.testGroupByWithDistinctCountAgg " +
      "(:79-159): client_type desc limit 10 — iphone UV 2, android UV 1") {
    val out = NativeQuery.run(spark,
      """{
        "queryType": "groupBy", "dataSource": "testing",
        "granularity": "all",
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "dimensions": [{"type": "default", "dimension": "client_type"}],
        "limitSpec": {"type": "default", "limit": 10,
          "columns": [{"dimension": "client_type", "direction": "descending"}]},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "distinctCount", "name": "UV", "fieldName": "visitor_id"}]
      }""", _ => fixture("2010-01-01")).collect()
      .map(r => (r.getAs[String]("client_type"), r.getAs[Long]("UV"), r.getAs[Long]("rows")))
    assert(out.toSeq == Seq(("iphone", 2L, 2L), ("android", 1L, 1L)))
  }

  test("DistinctCountTopNQueryTest.testTopNWithDistinctCountAgg (:80-156): " +
      "topN by UV — iphone (2) before android (1)") {
    val out = NativeQuery.run(spark,
      """{
        "queryType": "topN", "dataSource": "testing",
        "granularity": "all", "dimension": "client_type",
        "metric": "UV", "threshold": 10,
        "intervals": ["1970-01-01T00:00:00.000Z/2020-01-01T00:00:00.000Z"],
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "distinctCount", "name": "UV", "fieldName": "visitor_id"}]
      }""", _ => fixture("2016-03-04")).collect()
      .map(r => (r.getAs[String]("client_type"), r.getAs[Long]("UV"), r.getAs[Long]("rows")))
    assert(out.toSeq == Seq(("iphone", 2L, 2L), ("android", 1L, 1L)))
  }
}
