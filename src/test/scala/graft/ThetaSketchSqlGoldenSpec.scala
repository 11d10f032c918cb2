package graft

import java.sql.Timestamp
import java.util.Base64
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, expr}

/** ThetaSketchSqlAggregatorTest.java goldens (extensions-core/datasketches/
  * .../theta/sql): the Druid SQL theta surface over the Calcite foo fixture —
  * APPROX_COUNT_DISTINCT_DS_THETA (raw, filtered, stored-sketch input with
  * and without size), DS_THETA, THETA_SKETCH_ESTIMATE(+bounds), the variadic
  * set ops with optional leading size, post-sort estimates, empty results,
  * filtered-to-empty group defaults. SQL-compatible (sqlCompatible) expected
  * values. Empty-string updates are skipped by datasketches' own
  * Union.update(String) contract, so APPROX_COUNT_DISTINCT_DS_THETA(dim2)
  * pins 2 — {a, abc} — exactly like the reference.
  *
  * Set-op outputs are asserted BYTE-EXACTLY against the reference's own
  * base64 pins: compact ordered theta bytes are format- and
  * murmur-seed-stable across library versions, so the engine's
  * THETA_SKETCH_INTERSECT/UNION/NOT must reproduce them bit for bit.
  *
  * Dialect adjudications (the repo's established spellings):
  * Druid's substring returns null on empty input → NULLIF(SUBSTRING(..),'');
  * the DS_THETA columns of testEmptyTimeseriesResults are finalized to
  * "0.0" by the reference's JSON layer — here the binary column's estimate
  * is asserted instead (the shouldFinalize=false form).
  */
class ThetaSketchSqlGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    val foo = Seq(
      (ts("2000-01-01 00:00:00"), "",     Some("a"),   1.0f, 1L),
      (ts("2000-01-02 00:00:00"), "10.1", None,        2.0f, 1L),
      (ts("2000-01-03 00:00:00"), "2",    Some(""),    3.0f, 1L),
      (ts("2001-01-01 00:00:00"), "1",    Some("a"),   4.0f, 1L),
      (ts("2001-01-02 00:00:00"), "def",  Some("abc"), 5.0f, 1L),
      (ts("2001-01-03 00:00:00"), "abc",  None,        6.0f, 1L))
      .toDF("__time", "dim1", "dim2", "m1", "cnt")
    // the reference foo carries thetasketch_dim1: a per-row theta sketch of
    // dim1 built at ingest (SketchMergeAggregatorFactory in the fixture)
    foo.join(
      foo.groupBy("dim1").agg(expr("theta_sketch(dim1)").as("thetasketch_dim1")),
      "dim1").createOrReplaceTempView("thfoo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def b64(r: Row, i: Int): String =
    Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](i))

  test("testApproxCountDistinctThetaSketch (:148): raw, filtered, expression " +
      "and stored-sketch inputs — [6, 2, 2, 1, 1, 5, 5]") {
    val r = sql("""
      SELECT
        SUM(cnt),
        APPROX_COUNT_DISTINCT_DS_THETA(dim2),
        approx_count_distinct_ds_theta(dim2) FILTER(WHERE dim2 <> ''),
        APPROX_COUNT_DISTINCT(NULLIF(SUBSTRING(dim2, 1, 1), '')),
        COUNT(DISTINCT NULLIF(SUBSTRING(dim2, 1, 1), '') || 'x'),
        APPROX_COUNT_DISTINCT_DS_THETA(thetasketch_dim1, 32768),
        APPROX_COUNT_DISTINCT_DS_THETA(thetasketch_dim1)
      FROM thfoo""").head
    assert((0 until 7).map(r.getLong) == Seq(6L, 2L, 2L, 1L, 1L, 5L, 5L))
  }

  test("testAvgDailyCountDistinctThetaSketch (:268): AVG over daily ACD = 1 " +
      "(FLOOR(__time TO DAY) spelled TIME_FLOOR, the repo's dialect mapping)") {
    val r = sql("""
      SELECT AVG(u) FROM (
        SELECT TIME_FLOOR(__time, 'P1D'), APPROX_COUNT_DISTINCT_DS_THETA(cnt) AS u
        FROM thfoo GROUP BY 1)""").head
    assert(r.getDouble(0) == 1.0)
  }

  test("testThetaSketchPostAggs (:362): estimates, error bounds, and the " +
      "reference's own base64 pins for INTERSECT/UNION/NOT") {
    val r = sql("""
      SELECT
        SUM(cnt),
        THETA_SKETCH_ESTIMATE(DS_THETA(dim2)),
        theta_sketch_estimate(DS_THETA(CONCAT(dim2, 'hello'))),
        THETA_SKETCH_ESTIMATE_WITH_ERROR_BOUNDS(DS_THETA(dim2), 10),
        THETA_SKETCH_INTERSECT(DS_THETA(dim2), DS_THETA(dim1)),
        THETA_SKETCH_UNION(DS_THETA(dim2), DS_THETA(dim1)),
        THETA_SKETCH_NOT(DS_THETA(dim2), DS_THETA(dim1)),
        THETA_SKETCH_INTERSECT(32768, DS_THETA(dim2), DS_THETA(dim1)),
        THETA_SKETCH_ESTIMATE(
          THETA_SKETCH_INTERSECT(THETA_SKETCH_INTERSECT(DS_THETA(dim2), DS_THETA(dim1)), DS_THETA(dim2)))
      FROM thfoo""").head
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(1) == 2.0)
    assert(r.getDouble(2) == 3.0)
    // {"estimate":2.0,"highBound":2.0,"lowBound":2.0,"numStdDev":10}
    val bounds = r.getStruct(3)
    assert(bounds.getAs[Double]("estimate") == 2.0)
    assert(bounds.getAs[Double]("highBound") == 2.0)
    assert(bounds.getAs[Double]("lowBound") == 2.0)
    assert(bounds.getAs[Int]("numStdDev") == 10)
    // the reference's exact serialized set-op outputs
    assert(b64(r, 4) == "AQMDAAA6zJOQxkPsNomrZQ==", b64(r, 4))         // intersect {abc}
    assert(b64(r, 5) ==
      "AgMDAAAazJMGAAAAAACAP1XTBztMIcMJ+HOoBBne1zKQxkPsNomrZUeWbJt3n+VpF8EdUoUHAXvxsLkOSE0lfQ==",
      b64(r, 5))                                                        // union, 6 entries
    assert(b64(r, 6) == "AQMDAAA6zJMXwR1ShQcBew==", b64(r, 6))          // not {a}
    assert(b64(r, 7) == "AQMDAAA6zJOQxkPsNomrZQ==", b64(r, 7))          // sized intersect
    assert(r.getDouble(8) == 1.0)
  }

  test("testThetaSketchPostAggsPostSort (:532): estimate over the post-sorted " +
      "sketch subquery = 2.0") {
    val r = sql("""
      SELECT THETA_SKETCH_ESTIMATE(y) FROM (
        SELECT DS_THETA(dim2) AS y FROM thfoo
        ORDER BY THETA_SKETCH_ESTIMATE(DS_THETA(dim2)) DESC LIMIT 10)""").head
    assert(r.getDouble(0) == 2.0)
  }

  test("testEmptyTimeseriesResults (:582): no-match filter leaves zero " +
      "estimates, with and without explicit size") {
    val r = sql("""
      SELECT
        APPROX_COUNT_DISTINCT_DS_THETA(dim2),
        APPROX_COUNT_DISTINCT_DS_THETA(thetasketch_dim1),
        THETA_SKETCH_ESTIMATE(DS_THETA(dim2, 1024)),
        THETA_SKETCH_ESTIMATE(DS_THETA(thetasketch_dim1, 1024))
      FROM thfoo WHERE TRY_CAST(dim2 AS DOUBLE) = 0""").head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("testGroupByAggregatorDefaultValues (:641): filtered-to-empty " +
      "aggregators default to zero per group") {
    val r = sql("""
      SELECT
        dim2,
        APPROX_COUNT_DISTINCT_DS_THETA(dim2) FILTER(WHERE dim1 = 'nonexistent'),
        APPROX_COUNT_DISTINCT_DS_THETA(thetasketch_dim1) FILTER(WHERE dim1 = 'nonexistent'),
        THETA_SKETCH_ESTIMATE(DS_THETA(dim2, 1024) FILTER(WHERE dim1 = 'nonexistent')),
        THETA_SKETCH_ESTIMATE(DS_THETA(thetasketch_dim1, 1024) FILTER(WHERE dim1 = 'nonexistent'))
      FROM thfoo WHERE dim2 = 'a' GROUP BY dim2""").head
    assert(r.getString(0) == "a")
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
  }
}
