package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** Round-6 CalciteQueryTest golden tranche #4: GROUPING SETS shapes, the
  * GROUPING aggregator, and count-distinct-over-subquery histograms. Same
  * fixture and porting rules as the sibling tranches (sql-compatible null
  * mode; FLOOR(__time TO unit) spelled date_trunc; Druid's multi-arg
  * GROUPING(a, b) bitmask spelled grouping(a)*2 + grouping(b)). */
class CalciteGroupingSetsGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val foo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     "a",   "a", 1.0f, 1L),
    (ts("2000-01-02 00:00:00"), "10.1", null,  "a", 2.0f, 1L),
    (ts("2000-01-03 00:00:00"), "2",    "",    "a", 3.0f, 1L),
    (ts("2001-01-01 00:00:00"), "1",    "a",   "b", 4.0f, 1L),
    (ts("2001-01-02 00:00:00"), "def",  "abc", "b", 5.0f, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  null,  "b", 6.0f, 1L))
    .toDF("__time", "dim1", "dim2", "dim4", "m1", "cnt")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }

  private val subq =
    "(SELECT date_trunc('MONTH', __time) AS gran, COALESCE(dim2, '') dim2, cnt FROM foo) AS x"

  test("testGroupingSetsWithNumericDimension (CalciteQueryTest.java:7950s)") {
    val out = sql("SELECT cnt, COUNT(*) FROM foo GROUP BY GROUPING SETS ( (cnt), () )")
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1))).toSet
    assert(out == Set((Some(1L), 6L), (None, 6L)))
  }

  test("testGroupingSetsNoSuperset (:8000s)") {
    val out = sql(
      s"""SELECT dim2, gran, SUM(cnt) FROM $subq
         |GROUP BY GROUPING SETS ( (), (dim2), (gran) )""".stripMargin)
      .map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getTimestamp(1)), r.getLong(2))).toSet
    assert(out == Set(
      (Some(""), None, 3L), (Some("a"), None, 2L), (Some("abc"), None, 1L),
      (None, Some(ts("2000-01-01 00:00:00")), 3L),
      (None, Some(ts("2001-01-01 00:00:00")), 3L),
      (None, None, 6L)))
  }

  test("testGroupingSetsWithDummyDimension (:8050s) — a literal in the set collapses away") {
    val out = sql(
      s"""SELECT dim2, gran, SUM(cnt) FROM $subq
         |GROUP BY GROUPING SETS ( (dim2, 'dummy', gran), (dim2), (gran), ('dummy') )""".stripMargin)
      .map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getTimestamp(1)), r.getLong(2))).toSet
    assert(out == Set(
      (Some(""), Some(ts("2000-01-01 00:00:00")), 2L),
      (Some(""), Some(ts("2001-01-01 00:00:00")), 1L),
      (Some("a"), Some(ts("2000-01-01 00:00:00")), 1L),
      (Some("a"), Some(ts("2001-01-01 00:00:00")), 1L),
      (Some("abc"), Some(ts("2001-01-01 00:00:00")), 1L),
      (Some(""), None, 3L), (Some("a"), None, 2L), (Some("abc"), None, 1L),
      (None, None, 6L),
      (None, Some(ts("2000-01-01 00:00:00")), 3L),
      (None, Some(ts("2001-01-01 00:00:00")), 3L)))
  }

  test("testGroupingSetsWithOrderByDimension (:8100s) — gran asc nulls first, dim2 desc nulls last") {
    val out = sql(
      s"""SELECT dim2, gran, SUM(cnt) FROM $subq
         |GROUP BY GROUPING SETS ( (), (dim2), (gran) )
         |ORDER BY gran, dim2 DESC""".stripMargin)
      .map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getTimestamp(1)), r.getLong(2))).toSeq
    assert(out == Seq(
      (Some("abc"), None, 1L), (Some("a"), None, 2L), (Some(""), None, 3L),
      (None, None, 6L),
      (None, Some(ts("2000-01-01 00:00:00")), 3L),
      (None, Some(ts("2001-01-01 00:00:00")), 3L)))
  }

  test("testGroupingSetsWithOrderByAggregator (+WithLimit) (:8150s)") {
    val out = sql(
      s"""SELECT dim2, gran, SUM(cnt) FROM $subq
         |GROUP BY GROUPING SETS ( (), (dim2), (gran) )
         |ORDER BY SUM(cnt)""".stripMargin).map(_.getLong(2)).toSeq
    assert(out == Seq(1L, 2L, 3L, 3L, 3L, 6L)) // the aggregate ordering itself
    val limited = sql(
      s"""SELECT dim2, gran, SUM(cnt) FROM $subq
         |GROUP BY GROUPING SETS ( (), (dim2), (gran) )
         |ORDER BY SUM(cnt) LIMIT 1""".stripMargin)
    assert(limited.length == 1)
    assert((limited.head.getString(0), limited.head.getLong(2)) == (("abc", 1L)))
  }

  test("testGroupingAggregatorDifferentOrder (:8200s) — GROUPING(gran, dim2) bitmask") {
    val out = sql(
      s"""SELECT dim2, gran, SUM(cnt), grouping(gran)*2 + grouping(dim2) FROM $subq
         |GROUP BY GROUPING SETS ( (dim2, gran), (dim2), (gran), () )""".stripMargin)
      .map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getTimestamp(1)), r.getLong(2), r.getInt(3))).toSet
    assert(out == Set(
      (Some(""), Some(ts("2000-01-01 00:00:00")), 2L, 0),
      (Some(""), Some(ts("2001-01-01 00:00:00")), 1L, 0),
      (Some("a"), Some(ts("2000-01-01 00:00:00")), 1L, 0),
      (Some("a"), Some(ts("2001-01-01 00:00:00")), 1L, 0),
      (Some("abc"), Some(ts("2001-01-01 00:00:00")), 1L, 0),
      (Some(""), None, 3L, 2), (Some("a"), None, 2L, 2), (Some("abc"), None, 1L, 2),
      (None, Some(ts("2000-01-01 00:00:00")), 3L, 1),
      (None, Some(ts("2001-01-01 00:00:00")), 3L, 1),
      (None, None, 6L, 3)))
  }

  test("testGroupingAggregatorWithPostAggregator (:8250s)") {
    val out = sql(
      """SELECT dim2, SUM(cnt), GROUPING(dim2),
        |CASE WHEN GROUPING(dim2) = 1 THEN 'ALL' ELSE dim2 END
        |FROM foo GROUP BY GROUPING SETS ( (dim2), () )""".stripMargin)
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getByte(2).toInt, Option(r.getString(3)))).toSet
    assert(out == Set(
      (None, 2L, 0, None), (Some(""), 1L, 0, Some("")), (Some("a"), 2L, 0, Some("a")),
      (Some("abc"), 1L, 0, Some("abc")), (None, 6L, 1, Some("ALL"))))
  }

  test("testAvgDailyCountDistinct (:7300s)") {
    val r = single(
      """SELECT AVG(u)
        |FROM (SELECT date_trunc('DAY', __time), APPROX_COUNT_DISTINCT(cnt) AS u
        |      FROM foo GROUP BY 1)""".stripMargin)
    // Druid's long-typed AVG renders 1; Spark widens to 1.0 — same value
    assert(r.getDouble(0) == 1.0)
  }

  test("testHistogramUsingSubquery (:7350s) — sql null mode keeps the null group; " +
      "Calcite's bare VARCHAR spelled STRING") {
    val out = sql(
      """SELECT CAST(thecnt AS STRING), COUNT(*)
        |FROM (SELECT dim2, SUM(cnt) AS thecnt FROM foo GROUP BY dim2)
        |GROUP BY CAST(thecnt AS STRING)""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("1", 2L), ("2", 2L)))
  }

  // ---- round-6 second tranche ----

  test("testGroupingSetsWithOrderByAggregatorWithLimit (:10843)") {
    val r = single(
      s"""SELECT dim2, gran, SUM(cnt) FROM $subq
         |GROUP BY GROUPING SETS ( (), (dim2), (gran) )
         |ORDER BY SUM(cnt) LIMIT 1""".stripMargin)
    assert((r.getString(0), r.isNullAt(1), r.getLong(2)) == (("abc", true, 1L)))
  }

  test("testGroupByRollupDifferentOrder / CUBE (:10466)") {
    val rollup = sql(
      s"""SELECT dim2, gran, SUM(cnt) FROM $subq GROUP BY ROLLUP (gran, dim2)""")
      .map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getTimestamp(1)), r.getLong(2))).toSet
    assert(rollup == Set(
      (Some(""), Some(ts("2000-01-01 00:00:00")), 2L),
      (Some("a"), Some(ts("2000-01-01 00:00:00")), 1L),
      (Some(""), Some(ts("2001-01-01 00:00:00")), 1L),
      (Some("a"), Some(ts("2001-01-01 00:00:00")), 1L),
      (Some("abc"), Some(ts("2001-01-01 00:00:00")), 1L),
      (None, Some(ts("2000-01-01 00:00:00")), 3L),
      (None, Some(ts("2001-01-01 00:00:00")), 3L),
      (None, None, 6L)))
    // CUBE adds the dim2-only subtotals to the rollup set
    val cube = sql(
      s"""SELECT dim2, gran, SUM(cnt) FROM $subq GROUP BY CUBE (dim2, gran)""")
      .map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getTimestamp(1)), r.getLong(2))).toSet
    assert(cube == rollup ++ Set(
      (Some(""), None, 3L), (Some("a"), None, 2L), (Some("abc"), None, 1L)))
  }

  test("testCountDistinct — plain and CASE-wrapped distinct counts (:6009, :6040s)") {
    val r = single("SELECT SUM(cnt), COUNT(distinct dim2) FROM foo")
    assert((r.getLong(0), r.getLong(1)) == ((6L, 3L)))
    val c = single(
      """SELECT COUNT(DISTINCT CASE WHEN m1 >= 4 THEN m1 END),
        |       COUNT(DISTINCT CASE WHEN m1 >= 4 THEN dim1 END) FROM foo""".stripMargin)
    assert((c.getLong(0), c.getLong(1)) == ((3L, 3L)))
  }

  test("testExactCountDistinctWithFilter (:2156)") {
    val r = single(
      "SELECT COUNT(DISTINCT foo.dim1) FILTER(WHERE foo.cnt = 1), SUM(foo.cnt) FROM foo")
    assert((r.getLong(0), r.getLong(1)) == ((6L, 6L)))
  }

  test("testExactCountDistinctUsingSubqueryOnUnionAllTables (:6654)") {
    val r = single(
      """SELECT SUM(cnt), COUNT(*) FROM (
        |  SELECT dim2, SUM(cnt) AS cnt
        |  FROM (SELECT * FROM foo UNION ALL SELECT * FROM foo)
        |  GROUP BY dim2)""".stripMargin)
    assert((r.getLong(0), r.getLong(1)) == ((12L, 4L)))
  }

  test("testGroupByWithLiteralInSubqueryGrouping (:12177)") {
    val out = sql(
      """SELECT t1, t2 FROM (
        |  SELECT 'dummy' as t1,
        |         CASE WHEN dim4 = 'b' THEN dim4 ELSE NULL END AS t2
        |  FROM foo GROUP BY dim4
        |) GROUP BY t1, t2 ORDER BY 2 ASC NULLS FIRST""".stripMargin)
      .map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(out == Seq(("dummy", None), ("dummy", Some("b"))))
  }
}
