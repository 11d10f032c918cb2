package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row

/** FixedBucketsHistogramQuantileSqlAggregatorTest.java goldens
  * (extensions-core/histogram/.../sql): APPROX_QUANTILE_FIXED_BUCKETS —
  * equal buckets over [lower, upper), cumulative-fraction percentile with
  * in-bucket linear interpolation at float32 precision, outliers IGNOREd
  * by default, and the reference's empty-histogram 0.0 finalization. The
  * nine-quantile battery, the casted-dirty-string battery (SQL-compatible
  * branch), the inner-query case, and the empty/default rows all pin the
  * reference's exact values. */
class FixedBucketsQuantileSqlGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    Seq(
      (ts("2000-01-01 00:00:00"), "",     Some("a"),   1.0f, 1L),
      (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], 2.0f, 1L),
      (ts("2000-01-03 00:00:00"), "2",    Some(""),    3.0f, 1L),
      (ts("2001-01-01 00:00:00"), "1",    Some("a"),   4.0f, 1L),
      (ts("2001-01-02 00:00:00"), "def",  Some("abc"), 5.0f, 1L),
      (ts("2001-01-03 00:00:00"), "abc",  None,        6.0f, 1L))
      .toDF("__time", "dim1", "dim2", "m1", "cnt")
      .createOrReplaceTempView("fbfoo")
  }

  private def one(q: String): Row = { registered; spark.sql(q).collect().head }

  test("testQuantileOnFloatAndLongs (:128): the nine-quantile battery") {
    val r = one("""
      SELECT
        APPROX_QUANTILE_FIXED_BUCKETS(m1, 0.01, 20, 0.0, 10.0),
        APPROX_QUANTILE_FIXED_BUCKETS(m1, 0.5, 20, 0.0, 10.0),
        APPROX_QUANTILE_FIXED_BUCKETS(m1, 0.98, 20, 0.0, 10.0),
        APPROX_QUANTILE_FIXED_BUCKETS(m1, 0.99, 20, 0.0, 10.0),
        APPROX_QUANTILE_FIXED_BUCKETS(m1 * 2, 0.97, 40, 0.0, 20.0),
        APPROX_QUANTILE_FIXED_BUCKETS(m1, 0.99, 20, 0.0, 10.0) FILTER(WHERE dim1 = 'abc'),
        APPROX_QUANTILE_FIXED_BUCKETS(m1, 0.999, 20, 0.0, 10.0) FILTER(WHERE dim1 <> 'abc'),
        APPROX_QUANTILE_FIXED_BUCKETS(m1, 0.999, 20, 0.0, 10.0) FILTER(WHERE dim1 = 'abc'),
        APPROX_QUANTILE_FIXED_BUCKETS(cnt, 0.5, 20, 0.0, 10.0)
      FROM fbfoo""")
    val got = (0 until 9).map(r.getDouble)
    assert(got == Seq(1.0299999713897705, 3.5, 6.440000057220459,
      6.470000267028809, 12.40999984741211, 6.494999885559082,
      5.497499942779541, 6.499499797821045, 1.25), got.mkString(","))
  }

  test("testQuantileOnCastedString (:241): dirty strings parse leniently " +
      "(TRY_CAST spelling); all-null filtered inputs finalize to 0.0, not " +
      "null — SQL-compatible branch") {
    val r = one("""
      SELECT
        APPROX_QUANTILE_FIXED_BUCKETS(TRY_CAST(dim1 AS DOUBLE), 0.01, 20, 0.0, 10.0),
        APPROX_QUANTILE_FIXED_BUCKETS(TRY_CAST(dim1 AS DOUBLE), 0.5, 20, 0.0, 10.0),
        APPROX_QUANTILE_FIXED_BUCKETS(TRY_CAST(dim1 AS DOUBLE), 0.98, 20, 0.0, 10.0),
        APPROX_QUANTILE_FIXED_BUCKETS(TRY_CAST(dim1 AS DOUBLE), 0.99, 20, 0.0, 10.0),
        APPROX_QUANTILE_FIXED_BUCKETS(TRY_CAST(dim1 AS DOUBLE) * 2, 0.97, 40, 0.0, 20.0),
        APPROX_QUANTILE_FIXED_BUCKETS(TRY_CAST(dim1 AS DOUBLE), 0.99, 20, 0.0, 10.0) FILTER(WHERE dim1 = 'abc'),
        APPROX_QUANTILE_FIXED_BUCKETS(TRY_CAST(dim1 AS DOUBLE), 0.999, 20, 0.0, 10.0) FILTER(WHERE dim1 <> 'abc'),
        APPROX_QUANTILE_FIXED_BUCKETS(TRY_CAST(dim1 AS DOUBLE), 0.999, 20, 0.0, 10.0) FILTER(WHERE dim1 = 'abc')
      FROM fbfoo""")
    val got = (0 until 8).map(r.getDouble)
    assert(got == Seq(1.0099999904632568, 1.5, 2.4800000190734863,
      2.490000009536743, 4.470000267028809, 0.0, 2.499000072479248, 0.0),
      got.mkString(","))
  }

  test("testQuantileOnInnerQuery (:449): over per-dim2 sums — " +
      "{5.25 avg, 8.920000076293945} (SQL-compatible)") {
    val r = one("""
      SELECT AVG(x), APPROX_QUANTILE_FIXED_BUCKETS(x, 0.98, 100, 0.0, 100.0)
      FROM (SELECT dim2, SUM(m1) AS x FROM fbfoo GROUP BY dim2)""")
    assert(r.getDouble(0) == 5.25)
    assert(r.getDouble(1) == 8.920000076293945)
  }

  test("testEmptyTimeseriesResults (:516) + testGroupByAggregatorDefaultValues " +
      "(:567): empty histograms finalize to 0.0") {
    val r = one("""
      SELECT APPROX_QUANTILE_FIXED_BUCKETS(m1, 0.01, 20, 0.0, 10.0)
      FROM fbfoo WHERE TRY_CAST(dim2 AS DOUBLE) = 0""")
    assert(r.getDouble(0) == 0.0)
    val g = one("""
      SELECT dim2,
             APPROX_QUANTILE_FIXED_BUCKETS(m1, 0.01, 20, 0.0, 10.0) FILTER(WHERE dim1 = 'nonexistent')
      FROM fbfoo WHERE dim2 = 'a' GROUP BY dim2""")
    assert(g.getString(0) == "a" && g.getDouble(1) == 0.0)
  }
}
