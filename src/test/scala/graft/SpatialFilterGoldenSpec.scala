package graft

import org.apache.spark.sql.DataFrame
import graft.operators.NativeQuery

/** SpatialFilterTest.java goldens (processing/.../segment/filter): the
  * radius and rectangular bounds over the reference's 8 deterministic
  * points (plus far-away filler standing in for its random cloud, which by
  * construction never matches), including the '_mmx.unknown' unparseable
  * coordinates and a SECOND spatial dimension. testEqualsContract /
  * testEqualsContractForBoundDruidPredicateFactory are EqualsVerifier
  * internals with no analog; SpatialFilterBonusTest repeats the same
  * bounds over an alternate indexing path (one storage engine here).
  */
class SpatialFilterGoldenSpec extends SparkSpecBase {

  // dim.geo = "lat,long" joined — the reference's spatial-dimension
  // encoding; rows 6/7 carry unparseable coordinates, the last rows are
  // the far-away filler
  private val SpatialRows = """{"type": "inline",
    "columnNames": ["__time", "dim", "dim_geo", "dim2_geo", "val"],
    "columnTypes": ["STRING", "STRING", "STRING", "STRING", "LONG"],
    "rows": [
      ["2013-01-01T00:00:00Z", "foo", "0.0,0.0", null, 17],
      ["2013-01-02T00:00:00Z", "foo", "1.0,3.0", null, 29],
      ["2013-01-03T00:00:00Z", "foo", "4.0,2.0", null, 13],
      ["2013-01-04T00:00:00Z", "foo", "7.0,3.0", null, 91],
      ["2013-01-05T00:00:00Z", "foo", "8.0,6.0", null, 47],
      ["2013-01-05T00:00:00Z", "foo", "_mmx.unknown,_mmx.unknown", null, 101],
      ["2013-01-05T00:00:00Z", "foo", null, null, 501],
      ["2013-01-05T00:00:00Z", "foo", null, "0.0,0.0", 13],
      ["2013-01-01T00:00:00Z", "boo", "15.1,17.2", null, 8],
      ["2013-01-01T00:00:00Z", "boo", "12.7,19.9", null, 9],
      ["2013-01-01T00:00:00Z", "boo", "18.3,11.4", null, 10]]}"""

  private def run(json: String): DataFrame =
    NativeQuery.run(spark, json, _ => spark.emptyDataFrame)

  test("testSpatialQuery (SpatialFilterTest.java): a radius bound at " +
      "(0,0) r=5 keeps the three near points — rows 3, val 59") {
    val got = run(s"""{
        "queryType": "timeseries", "dataSource": $SpatialRows,
        "granularity": "all",
        "intervals": ["2013-01-01T00:00:00.000Z/2013-01-07T00:00:00.000Z"],
        "filter": {"type": "spatial", "dimension": "dim_geo",
          "bound": {"type": "radius", "coords": [0.0, 0.0], "radius": 5}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "val", "fieldName": "val"}]
      }""").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("rows") == 3L)
    assert(got.head.getAs[Long]("val") == 59L)
  }

  test("testSpatialQueryWithOtherSpatialDim (SpatialFilterTest.java): the " +
      "SECOND spatial dimension has exactly one in-radius point — " +
      "rows 1, val 13") {
    val got = run(s"""{
        "queryType": "timeseries", "dataSource": $SpatialRows,
        "granularity": "all",
        "intervals": ["2013-01-01T00:00:00.000Z/2013-01-07T00:00:00.000Z"],
        "filter": {"type": "spatial", "dimension": "dim2_geo",
          "bound": {"type": "radius", "coords": [0.0, 0.0], "radius": 5}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "val", "fieldName": "val"}]
      }""").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("rows") == 1L)
    assert(got.head.getAs[Long]("val") == 13L)
  }

  test("testSpatialQueryMorePoints (SpatialFilterTest.java): the [0,0]-" +
      "[9,9] rectangle under DAY granularity — one row per day, the " +
      "unknown-coordinate and far points excluded") {
    val got = run(s"""{
        "queryType": "timeseries", "dataSource": $SpatialRows,
        "granularity": "day",
        "intervals": ["2013-01-01T00:00:00.000Z/2013-01-07T00:00:00.000Z"],
        "context": {"skipEmptyBuckets": true},
        "filter": {"type": "spatial", "dimension": "dim_geo",
          "bound": {"type": "rectangular", "minCoords": [0.0, 0.0],
                    "maxCoords": [9.0, 9.0]}},
        "aggregations": [
          {"type": "count", "name": "rows"},
          {"type": "longSum", "name": "val", "fieldName": "val"}]
      }""").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("__time").toLocalDate.toString,
        r.getAs[Long]("rows"), r.getAs[Long]("val"))).sortBy(_._1).toSeq
    assert(got == Seq(
      ("2013-01-01", 1L, 17L), ("2013-01-02", 1L, 29L),
      ("2013-01-03", 1L, 13L), ("2013-01-04", 1L, 91L),
      ("2013-01-05", 1L, 47L)), got.mkString("\n"))
  }
}
