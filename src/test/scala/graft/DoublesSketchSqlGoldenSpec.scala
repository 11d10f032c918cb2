package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, expr}

/** DoublesSketchSqlAggregatorTest.java goldens (extensions-core/
  * datasketches/.../quantiles/sql): APPROX_QUANTILE_DS over the Calcite foo
  * fixture — multiple accuracies, virtual-column inputs, FILTER clauses,
  * casted strings, stored COMPLEX sketch columns, inner-query and
  * inner-quantile re-aggregation, empty-result NaNs, and the small
  * max-stream-length success case (the stream-length budget is a reference
  * memory knob; this engine's sketch aggregation has no such budget, so
  * the query succeeds identically). The sketch is exact at these stream
  * lengths, so the reference's expected values pin exactly.
  * testSerde/testToString/testComparator/testEqualsAndHashCode/
  * testResultArraySignature across the DoublesSketch*PostAggregatorTest and
  * *FactoryTest files are Jackson/AST internals; their compute() semantics
  * are the DS_GET_QUANTILE/DS_CDF/DS_HISTOGRAM/DS_RANK golden family and
  * the sketch oracle queries.
  */
class DoublesSketchSqlGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val foo: DataFrame = {
    val rows = Seq(
      (ts("2000-01-01 00:00:00"), "",     Some("a"),  1.0f, 1L),
      (ts("2000-01-02 00:00:00"), "10.1", None,       2.0f, 1L),
      (ts("2000-01-03 00:00:00"), "2",    Some(""),   3.0f, 1L),
      (ts("2001-01-01 00:00:00"), "1",    Some("a"),  4.0f, 1L),
      (ts("2001-01-02 00:00:00"), "def",  Some("abc"), 5.0f, 1L),
      (ts("2001-01-03 00:00:00"), "abc",  None,       6.0f, 1L))
    rows.toDF("__time", "dim1", "dim2", "m1", "cnt")
  }

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("dsfoo")
    // the reference foo carries a stored COMPLEX qsketch_m1 column (one
    // 1-value sketch per row, built at ingest)
    foo.join(
      foo.groupBy("m1").agg(expr("ds_quantiles_sketch(m1, 128)").as("qsketch_m1")),
      "m1").createOrReplaceTempView("dsfoo_q")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }

  test("testQuantileOnFloatAndLongs (DoublesSketchSqlAggregatorTest.java): " +
      "the nine-quantile battery — accuracies, a virtual column, FILTER " +
      "clauses, and the count column") {
    val r = sql("""
      SELECT
        APPROX_QUANTILE_DS(m1, 0.01),
        APPROX_QUANTILE_DS(m1, 0.5, 64),
        APPROX_QUANTILE_DS(m1, 0.98, 256),
        APPROX_QUANTILE_DS(m1, 0.99),
        APPROX_QUANTILE_DS(m1 * 2, 0.97),
        APPROX_QUANTILE_DS(m1, 0.99) FILTER(WHERE dim1 = 'abc'),
        APPROX_QUANTILE_DS(m1, 0.999) FILTER(WHERE dim1 <> 'abc'),
        APPROX_QUANTILE_DS(m1, 0.999) FILTER(WHERE dim1 = 'abc'),
        APPROX_QUANTILE_DS(cnt, 0.5)
      FROM dsfoo""").head
    val got = (0 until 9).map(r.getDouble)
    assert(got == Seq(1.0, 4.0, 6.0, 6.0, 12.0, 6.0, 5.0, 6.0, 1.0), got.mkString(","))
  }

  test("testQuantileOnCastedString (DoublesSketchSqlAggregatorTest.java): " +
      "CAST(dim1 AS DOUBLE) feeds the sketch — unparseable strings and the " +
      "empty string become nulls (skipped), an all-null filtered sketch is " +
      "empty (NaN). The reference's CAST is lenient (unparseable -> null); " +
      "under this engine's ANSI session that is spelled TRY_CAST, the repo's " +
      "established mapping for Druid casts over dirty strings.") {
    val r = sql("""
      SELECT
        APPROX_QUANTILE_DS(TRY_CAST(dim1 AS DOUBLE), 0.01),
        APPROX_QUANTILE_DS(TRY_CAST(dim1 AS DOUBLE), 0.5, 64),
        APPROX_QUANTILE_DS(TRY_CAST(dim1 AS DOUBLE), 0.98, 256),
        APPROX_QUANTILE_DS(TRY_CAST(dim1 AS DOUBLE), 0.99),
        APPROX_QUANTILE_DS(TRY_CAST(dim1 AS DOUBLE) * 2, 0.97),
        APPROX_QUANTILE_DS(TRY_CAST(dim1 AS DOUBLE), 0.99) FILTER(WHERE dim2 = 'abc'),
        APPROX_QUANTILE_DS(TRY_CAST(dim1 AS DOUBLE), 0.999)
          FILTER(WHERE dim2 IS DISTINCT FROM 'abc'),
        APPROX_QUANTILE_DS(TRY_CAST(dim1 AS DOUBLE), 0.999) FILTER(WHERE dim2 = 'abc')
      FROM dsfoo""").head
    // the reference plans dim2 <> 'abc' as NotDimFilter(SelectorDimFilter)
    // (the test's own native expectation, line 345), which MATCHES null
    // dim2 rows — so the dim1='10.1' (dim2 null) row is in the a6 stream
    // and q(0.999) = 10.1. ANSI three-valued <> would drop it; the faithful
    // spelling is IS DISTINCT FROM.
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 2.0)
    assert(r.getDouble(2) == 10.1 && r.getDouble(3) == 10.1)
    assert(r.getDouble(4) == 20.2)
    assert(r.isNullAt(5) || r.getDouble(5).isNaN, r.get(5).toString)
    assert(r.getDouble(6) == 10.1)
    assert(r.isNullAt(7) || r.getDouble(7).isNaN, r.get(7).toString)
  }

  test("testQuantileOnComplexColumn (DoublesSketchSqlAggregatorTest.java): " +
      "APPROX_QUANTILE_DS over the STORED sketch column merges instead of " +
      "rebuilding") {
    val r = sql("""
      SELECT
        APPROX_QUANTILE_DS(qsketch_m1, 0.01),
        APPROX_QUANTILE_DS(qsketch_m1, 0.5, 64),
        APPROX_QUANTILE_DS(qsketch_m1, 0.98, 256),
        APPROX_QUANTILE_DS(qsketch_m1, 0.99)
      FROM dsfoo_q""").head
    val got = (0 until 4).map(r.getDouble)
    assert(got == Seq(1.0, 4.0, 6.0, 6.0), got.mkString(","))
  }

  test("testQuantileOnInnerQuery (DoublesSketchSqlAggregatorTest.java): the " +
      "sketch over an inner GROUP BY's sums — SQL-compatible null grouping") {
    val r = sql("""
      SELECT AVG(x), APPROX_QUANTILE_DS(x, 0.98)
      FROM (SELECT dim2, SUM(m1) AS x FROM dsfoo GROUP BY dim2)""").head
    assert(r.getDouble(0) == 5.25, r.getDouble(0).toString)
    assert(r.getDouble(1) == 8.0, r.getDouble(1).toString)
  }

  test("testQuantileOnInnerQuantileQuery (DoublesSketchSqlAggregatorTest" +
      ".java): a quantile OF per-(dim1,dim2) quantiles, re-grouped by dim1") {
    val got = sql("""
      SELECT dim1, APPROX_QUANTILE_DS(x, 0.5)
      FROM (SELECT dim1, dim2, APPROX_QUANTILE_DS(m1, 0.5) AS x
            FROM dsfoo GROUP BY dim1, dim2)
      GROUP BY dim1""").map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got == Seq(("", 1.0), ("1", 4.0), ("10.1", 2.0), ("2", 3.0),
      ("abc", 6.0), ("def", 5.0)), got.mkString(","))
  }

  test("testEmptyTimeseriesResults (DoublesSketchSqlAggregatorTest.java): a " +
      "no-match WHERE leaves empty sketches — NaN/null quantiles, never an " +
      "error") {
    val r = sql("""
      SELECT
        APPROX_QUANTILE_DS(m1, 0.01),
        APPROX_QUANTILE_DS(qsketch_m1, 0.01)
      FROM dsfoo_q WHERE dim1 = 'nope'""").head
    assert(r.isNullAt(0) || r.getDouble(0).isNaN, r.get(0).toString)
    assert(r.isNullAt(1) || r.getDouble(1).isNaN, r.get(1).toString)
  }

  test("testSuccessWithSmallMaxStreamLength (DoublesSketchSqlAggregatorTest" +
      ".java): the reference succeeds under a small maxStreamLength budget; " +
      "this engine has no stream-length budget and returns the same values") {
    val r = sql("""
      SELECT APPROX_QUANTILE_DS(m1, 0.01), APPROX_QUANTILE_DS(cnt, 0.5)
      FROM dsfoo""").head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0)
  }
}
