package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row

/** QuantileSqlAggregatorTest.java goldens (extensions-core/histogram/
  * .../sql): APPROX_QUANTILE — the reference's ApproximateHistogram
  * quantile (float32 centroid positions + the Algorithm-4 interpolation),
  * value-exact in the within-resolution regime: the nine-quantile battery
  * over foo's m1 pins the reference's own float-precision outputs
  * (5.880000114440918 = 5.88f), including virtual-column inputs, FILTER
  * clauses, and the accuracy (resolution) argument. */
class QuantileSqlGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    Seq(
      (ts("2000-01-01 00:00:00"), "",     1.0f, 1L),
      (ts("2000-01-02 00:00:00"), "10.1", 2.0f, 1L),
      (ts("2000-01-03 00:00:00"), "2",    3.0f, 1L),
      (ts("2001-01-01 00:00:00"), "1",    4.0f, 1L),
      (ts("2001-01-02 00:00:00"), "def",  5.0f, 1L),
      (ts("2001-01-03 00:00:00"), "abc",  6.0f, 1L))
      .toDF("__time", "dim1", "m1", "cnt")
      .createOrReplaceTempView("qfoo")
  }

  private def one(q: String): Row = { registered; spark.sql(q).collect().head }

  test("testQuantileOnFloatAndLongs (:126): the nine-quantile battery — " +
      "the reference's exact float-precision interpolations") {
    val r = one("""
      SELECT
        APPROX_QUANTILE(m1, 0.01),
        APPROX_QUANTILE(m1, 0.5, 50),
        APPROX_QUANTILE(m1, 0.98, 200),
        APPROX_QUANTILE(m1, 0.99),
        APPROX_QUANTILE(m1 * 2, 0.97),
        APPROX_QUANTILE(m1, 0.99) FILTER(WHERE dim1 = 'abc'),
        APPROX_QUANTILE(m1, 0.999) FILTER(WHERE dim1 <> 'abc'),
        APPROX_QUANTILE(m1, 0.999) FILTER(WHERE dim1 = 'abc'),
        APPROX_QUANTILE(cnt, 0.5)
      FROM qfoo""")
    val got = (0 until 9).map(r.getDouble)
    assert(got == Seq(1.0, 3.0, 5.880000114440918, 5.940000057220459,
      11.640000343322754, 6.0, 4.994999885559082, 6.0, 1.0), got.mkString(","))
  }

  test("empty and filtered-to-empty inputs are NULL (SQL-compatible; the " +
      "reference's NaN renders through its finalizer — this engine's null " +
      "is the established no-input adjudication)") {
    val r = one("""
      SELECT APPROX_QUANTILE(m1, 0.5) FILTER(WHERE dim1 = 'nope'),
             APPROX_QUANTILE(m1, 0.5)
      FROM qfoo WHERE dim1 = 'nothing-matches'""")
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
