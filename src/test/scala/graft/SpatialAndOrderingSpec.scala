package graft

import org.apache.spark.sql.functions._
import graft.functions.{SpatialFunctions => SP, StringOrderings => SO}

class SpatialAndOrderingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 0.0, 0.0), (2L, 5.0, 5.0), (3L, 10.0, 0.0), (4L, 2.0, 1.0), (5L, -3.0, 4.0))
    .toDF("id", "x", "y")

  test("rectangular bound") {
    val in = points.filter(SP.withinRectangle($"x", $"y", -1, -1, 6, 6))
      .select("id").as[Long].collect().sorted
    assert(in.sameElements(Array(1L, 2L, 4L)))
  }

  test("radius bound: bbox prunes, circle exact") {
    // (5,5) is inside bbox of center (0,0) r=6 but outside the circle
    val in = points.filter(SP.withinRadius($"x", $"y", 0, 0, 6))
      .select("id").as[Long].collect().sorted
    assert(in.sameElements(Array(1L, 4L, 5L)))
  }

  test("polygon bound: triangle containment via ray casting") {
    // triangle (0,0) (8,0) (0,8): contains (2,1); excludes (5,5) boundary-out and (10,0)
    val in = points.filter(SP.withinPolygon($"x", $"y", Seq(0, 8, 0), Seq(0, 0, 8)))
      .select("id").as[Long].collect().sorted
    assert(in.contains(4L))
    assert(!in.contains(3L))
    assert(!in.contains(5L))
  }

  test("haversine distance sanity") {
    val d = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("la1", "lo1", "la2", "lo2")
      .select(SP.haversineKm($"la1", $"lo1", $"la2", $"lo2")).head().getDouble(0)
    assert(d > 330 && d < 360) // Paris–London ≈ 344 km
  }

  test("version/alphanumeric ordering: file9 < file10, 1.2.9 < 1.2.10") {
    val sorted = Seq("file10", "file9", "file1").toDF("s")
      .orderBy(SO.alphanumericKey($"s")).as[String].collect()
    assert(sorted.sameElements(Array("file1", "file9", "file10")))
    val v = Seq("1.2.10", "1.2.9", "1.10.0").toDF("s")
      .orderBy(SO.versionKey($"s")).as[String].collect()
    assert(v.sameElements(Array("1.2.9", "1.2.10", "1.10.0")))
    // digit runs beyond 10 chars (full long range) still compare numerically
    val big = Seq("10000000000", "9999999999", "2").toDF("s")
      .orderBy(SO.alphanumericKey($"s")).as[String].collect()
    assert(big.sameElements(Array("2", "9999999999", "10000000000")))
  }

  test("numeric ordering on numeric strings (BoundDimFilter ordering=numeric)") {
    val sorted = Seq("10", "9", "100", "x").toDF("s")
      .orderBy(SO.numericKey($"s").asc_nulls_first).as[String].collect()
    assert(sorted.sameElements(Array("x", "9", "10", "100")))
  }
}
