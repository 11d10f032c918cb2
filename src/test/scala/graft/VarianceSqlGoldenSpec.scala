package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row

/** VarianceSqlAggregatorTest.java goldens (extensions-core/stats/.../
  * variance/sql): VAR_POP/VAR_SAMP/VARIANCE/STDDEV_POP/STDDEV_SAMP/STDDEV
  * over numfoo's typed columns — collector-exact arithmetic
  * (VarianceAggregatorCollector's t²/(count·(count−1)) stream fold),
  * output width following the input type (float → FLOAT, long → LONG
  * incl. the truncated 23518394914), the count==1 → 0 / count==0 → null
  * edges ANSI VAR_SAMP lacks, virtual-column inputs, casted dirty strings
  * (lenient parse), FILTER-to-empty group defaults. Expected values are
  * the reference's own (computed by its collector over the fixture). */
class VarianceSqlGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    Seq(
      (ts("2000-01-01 00:00:00"), "",     "a",   Some(1.0), Some(1.0f), Some(7L), 1L),
      (ts("2000-01-02 00:00:00"), "10.1", null,  Some(1.7), Some(0.1f), Some(325323L), 1L),
      (ts("2000-01-03 00:00:00"), "2",    "",    Some(0.0), Some(0.0f), Some(0L), 1L),
      (ts("2001-01-01 00:00:00"), "1",    "a",   None: Option[Double], None: Option[Float], None: Option[Long], 1L),
      (ts("2001-01-02 00:00:00"), "def",  "abc", None, None, None, 1L),
      (ts("2001-01-03 00:00:00"), "abc",  null,  None, None, None, 1L))
      .toDF("__time", "dim1", "dim2", "d1", "f1", "l1", "cnt")
      .createOrReplaceTempView("var_numfoo")
  }

  private def one(q: String): Row = { registered; spark.sql(q).collect().head }

  test("testVarPop (:164): population variance per input width — " +
      "double/float/long(truncated)") {
    val r = one("SELECT VAR_POP(d1), VAR_POP(f1), VAR_POP(l1) FROM var_numfoo")
    assert(math.abs(r.getDouble(0) - 0.48666666666666664) < 1e-12)
    assert(r.getFloat(1) == 0.20222222805023193f)
    assert(r.getLong(2) == 23518394914L)
  }

  test("testVarSamp (:211): sample variance per input width") {
    val r = one("SELECT VAR_SAMP(d1), VAR_SAMP(f1), VAR_SAMP(l1) FROM var_numfoo")
    assert(math.abs(r.getDouble(0) - 0.73) < 1e-12)
    assert(r.getFloat(1) == 0.3033333420753479f)
    assert(r.getLong(2) == 35277592372L)
  }

  test("testStdDevPop (:258): sqrt finalized inside the aggregate, width kept") {
    val r = one("SELECT STDDEV_POP(d1), STDDEV_POP(f1), STDDEV_POP(l1) FROM var_numfoo")
    assert(math.abs(r.getDouble(0) - 0.697614984548545) < 1e-12)
    assert(r.getFloat(1) == math.sqrt(0.20222222805023193f.toDouble).toFloat)
    assert(r.getLong(2) == 153357L)
  }

  test("testStdDevSamp (:313)") {
    val r = one("SELECT STDDEV_SAMP(d1), STDDEV_SAMP(f1), STDDEV_SAMP(l1) FROM var_numfoo")
    assert(math.abs(r.getDouble(0) - 0.8544003745317531) < 1e-12)
    assert(r.getLong(2) == 187823L)
  }

  test("testStdDevWithVirtualColumns (:366): STDDEV (= sample) over " +
      "expression inputs — widths follow the expression types") {
    val r = one("SELECT STDDEV(d1*7), STDDEV(CAST(f1*7 AS FLOAT)), STDDEV(l1*7) FROM var_numfoo")
    assert(math.abs(r.getDouble(0) - 5.980802621722272) < 1e-9)
    assert(r.getFloat(1) == 3.855299472808838f)
    assert(r.getLong(2) == 1314763L)
  }

  test("testVarianceOrderBy (:425): single-value groups have variance 0 " +
      "(NOT null — the collector's count==1 rule); a no-value group is null " +
      "and sorts last under DESC") {
    registered
    val rows = spark.sql(
      "SELECT dim2, VARIANCE(f1) FROM var_numfoo GROUP BY 1 ORDER BY 2 DESC")
      .collect()
    assert(rows.length == 4)
    val zeros = rows.take(3)
    assert(zeros.forall(r => r.getFloat(1) == 0.0f))
    assert(zeros.map(r => Option(r.getString(0))).toSet ==
      Set(Some("a"), None, Some("")))
    assert(rows(3).getString(0) == "abc" && rows(3).isNullAt(1))
  }

  test("testVariancesOnCastedString (:470): lenient cast parses {10.1, 2, 1} " +
      "— '' and unparseable strings skip (TRY_CAST spelling)") {
    val r = one("""
      SELECT STDDEV_POP(TRY_CAST(dim1 AS DOUBLE)),
             STDDEV_SAMP(TRY_CAST(dim1 AS DOUBLE)),
             STDDEV(TRY_CAST(dim1 AS DOUBLE)),
             VARIANCE(TRY_CAST(dim1 AS DOUBLE))
      FROM var_numfoo""")
    assert(math.abs(r.getDouble(0) - 4.074582459862878) < 1e-12)
    assert(math.abs(r.getDouble(1) - 4.990323970779185) < 1e-12)
    assert(math.abs(r.getDouble(2) - 4.990323970779185) < 1e-12)
    assert(math.abs(r.getDouble(3) - 24.903333333333332) < 1e-12)
  }

  test("testEmptyTimeseriesResults (:510) + testGroupByAggregatorDefaultValues " +
      "(:560): no-input aggregates are NULL (SQL-compatible), with FILTER too") {
    val r = one("""
      SELECT STDDEV_POP(d1), VARIANCE(d1), STDDEV(l1), VAR_POP(l1)
      FROM var_numfoo WHERE TRY_CAST(dim2 AS DOUBLE) = 0""")
    (0 until 4).foreach(i => assert(r.isNullAt(i), s"col $i"))
    val g = one("""
      SELECT dim2,
             STDDEV_POP(d1) FILTER(WHERE dim1 = 'nonexistent'),
             VARIANCE(l1) FILTER(WHERE dim1 = 'nonexistent')
      FROM var_numfoo WHERE dim2 = 'a' GROUP BY dim2""")
    assert(g.getString(0) == "a" && g.isNullAt(1) && g.isNullAt(2))
  }
}
