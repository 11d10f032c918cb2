package graft

import org.apache.spark.sql.functions._
import graft.operators.NativeQuery

/** bySegment context flag (QueryContexts.java:70 BY_SEGMENT_KEY): the
  * reference returns PER-SEGMENT results wrapped in BySegmentResultValue
  * {results, segment id, interval} instead of the merged result
  * (e.g. TopNQueryRunnerTest.testTopNBySegmentResults). Superset envelope
  * here: the source parquet file — the segment analog — joins the grouping
  * as a leading "__segmentId" column, so partials return unmerged and each
  * row names its segment (flat, not nested). */
class BySegmentSpec extends SparkSpecBase {

  private lazy val segDir = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_by_segment_fixture"
    // three explicit "segments" (files), one per day
    spark.range(0, 90)
      .select(
        (lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00")).cast("timestamp_ntz")
          + make_dt_interval(col("id") % 3, lit(0), lit(0), lit(0))).as("__time"),
        concat(lit("k"), (col("id") % 5).cast("string")).as("dim"),
        (col("id") + 1).cast("long").as("v"))
      .repartitionByRange(3, (col("id") % 3).cast("int"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def run(json: String) =
    NativeQuery.run(spark, json, _ => spark.read.parquet(segDir))

  test("groupBy with bySegment returns per-file partials keyed by " +
      "__segmentId; without it, one merged row per dim") {
    val merged = run(
      """{"queryType": "groupBy", "dataSource": "t", "dimensions": ["dim"],
          "aggregations": [{"type": "longSum", "name": "s", "fieldName": "v"}]}""")
      .collect().map(r => r.getAs[String]("dim") -> r.getAs[Long]("s")).toMap
    assert(merged.keySet == Set("k0", "k1", "k2", "k3", "k4"))

    val by = run(
      """{"queryType": "groupBy", "dataSource": "t", "dimensions": ["dim"],
          "aggregations": [{"type": "longSum", "name": "s", "fieldName": "v"}],
          "context": {"bySegment": true}}""")
      .collect()
    val segs = by.map(_.getAs[String]("__segmentId")).distinct
    assert(segs.length == 3, s"3 files = 3 segments, got ${segs.toSeq}")
    assert(segs.forall(_.contains("graft_by_segment_fixture")))
    // per-segment partials re-merge to the global result
    val remerged = by.groupBy(_.getAs[String]("dim"))
      .view.mapValues(_.map(_.getAs[Long]("s")).sum).toMap
    assert(remerged == merged, "per-segment partials must sum to the merge")
    assert(by.length > merged.size, "unmerged superset has more rows")
  }

  test("timeseries with bySegment compiles through the groupBy path: one " +
      "row per (segment, bucket), partials summing to the merged series") {
    val merged = run(
      """{"queryType": "timeseries", "dataSource": "t", "granularity": "day",
          "intervals": ["2024-03-01/2024-03-04"],
          "aggregations": [{"type": "count", "name": "cnt"}]}""")
      .collect().map(r => r.get(0).toString -> r.getAs[Long]("cnt")).toMap
    val by = run(
      """{"queryType": "timeseries", "dataSource": "t", "granularity": "day",
          "intervals": ["2024-03-01/2024-03-04"],
          "aggregations": [{"type": "count", "name": "cnt"}],
          "context": {"bySegment": true}}""")
      .collect()
    assert(by.map(_.getAs[String]("__segmentId")).distinct.length == 3)
    // each file holds exactly one day here, so per-(segment, bucket) rows
    // reproduce the series exactly
    val remerged = by.groupBy(_.getAs[java.time.LocalDateTime]("__time").toString)
      .view.mapValues(_.map(_.getAs[Long]("cnt")).sum).toMap
    assert(remerged.values.sum == merged.values.sum)
    assert(remerged.size == 3)
  }

  test("scan with bySegment carries __segmentId alongside the selected " +
      "columns") {
    val rows = run(
      """{"queryType": "scan", "dataSource": "t", "columns": ["dim", "v"],
          "limit": 10, "context": {"bySegment": true}}""")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.head.schema.fieldNames.toSeq == Seq("__segmentId", "dim", "v"))
    assert(rows.forall(_.getAs[String]("__segmentId")
      .contains("graft_by_segment_fixture")))
  }
}
