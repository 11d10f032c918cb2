package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** Full port of the reference's CalciteSimpleQueryTest.java (sql/src/test/
  * java/org/apache/druid/sql/calcite/CalciteSimpleQueryTest.java, 11 test
  * methods) — the time-floor groupBy/ordering family over the standard
  * 6-row `foo` datasource. Expected rows are the reference's sql-compatible
  * branches (NullHandling.sqlCompatible).
  *
  * Standing porting adaptations (same rules as the sibling Calcite
  * tranches):
  *  - FLOOR(__time TO MONTH) is spelled TIME_FLOOR(__time, 'P1M') (the
  *    repo's Druid-SQL dialect mapping; both lower to timestamp_floor in
  *    the reference — CalciteSimpleQueryTest.java:59).
  *  - Druid's groupBy returns rows in dimension-ascending order when no
  *    ORDER BY is given, and its limitSpec sort is STABLE over that base
  *    order; both are made explicit as ORDER BY keys so row order is
  *    deterministic under Spark's unstable sort. Druid string ordering
  *    places null before '' ascending / after '' descending — Spark's
  *    default NULLS FIRST (ASC) / NULLS LAST (DESC), asserted verbatim.
  */
class CalciteSimpleQueryGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // the standard CalciteTests.DATASOURCE1 rows (foo): cnt=1 per row
  private lazy val foo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   1.0f, 1.0, 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], 2.0f, 2.0, 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    3.0f, 3.0, 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   4.0f, 4.0, 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), 5.0f, 5.0, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], 6.0f, 6.0, 1L)
  ).toDF("__time", "dim1", "dim2", "m1", "m2", "cnt")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }

  private def timeDim(q: String): Seq[(Timestamp, Option[String], Long)] =
    sql(q).map(r => (r.getTimestamp(0), Option(r.getString(1)), r.getLong(2))).toSeq
  private def dimTime(q: String): Seq[(Option[String], Timestamp, Long)] =
    sql(q).map(r => (Option(r.getString(0)), r.getTimestamp(1), r.getLong(2))).toSeq

  test("testGroupByTimeAndDim (CalciteSimpleQueryTest.java:44)") {
    val out = timeDim(
      """SELECT TIME_FLOOR(__time, 'P1M') AS t, dim2, SUM(cnt) AS s
        |FROM foo GROUP BY 1, 2
        |ORDER BY 1 ASC, 2 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq(
      (ts("2000-01-01 00:00:00"), None, 1L),
      (ts("2000-01-01 00:00:00"), Some(""), 1L),
      (ts("2000-01-01 00:00:00"), Some("a"), 1L),
      (ts("2001-01-01 00:00:00"), None, 1L),
      (ts("2001-01-01 00:00:00"), Some("a"), 1L),
      (ts("2001-01-01 00:00:00"), Some("abc"), 1L)))
  }

  test("testGroupByDimAndTime (:92)") {
    val out = dimTime(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M') AS t, SUM(cnt) AS s
        |FROM foo GROUP BY 1, 2
        |ORDER BY 1 ASC NULLS FIRST, 2 ASC""".stripMargin)
    assert(out == Seq(
      (None, ts("2000-01-01 00:00:00"), 1L),
      (None, ts("2001-01-01 00:00:00"), 1L),
      (Some(""), ts("2000-01-01 00:00:00"), 1L),
      (Some("a"), ts("2000-01-01 00:00:00"), 1L),
      (Some("a"), ts("2001-01-01 00:00:00"), 1L),
      (Some("abc"), ts("2001-01-01 00:00:00"), 1L)))
  }

  test("testGroupByDimAndTimeWhereOnTime — the time-floor equality prunes " +
      "to the month interval (:140)") {
    val out = dimTime(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M') AS t, SUM(cnt) AS s
        |FROM foo
        |WHERE TIME_FLOOR(__time, 'P1M') = TIMESTAMP '2001-01-01 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY 1 ASC NULLS FIRST, 2 ASC""".stripMargin)
    assert(out == Seq(
      (None, ts("2001-01-01 00:00:00"), 1L),
      (Some("a"), ts("2001-01-01 00:00:00"), 1L),
      (Some("abc"), ts("2001-01-01 00:00:00"), 1L)))
  }

  test("testGroupByDimAndTimeOnDim — LIKE filter (:184)") {
    val out = dimTime(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M') AS t, SUM(cnt) AS s
        |FROM foo WHERE dim2 LIKE 'a%'
        |GROUP BY 1, 2
        |ORDER BY 1 ASC, 2 ASC""".stripMargin)
    assert(out == Seq(
      (Some("a"), ts("2000-01-01 00:00:00"), 1L),
      (Some("a"), ts("2001-01-01 00:00:00"), 1L),
      (Some("abc"), ts("2001-01-01 00:00:00"), 1L)))
  }

  test("testGroupByTimeAndDimOrderByDim (:229)") {
    val out = timeDim(
      """SELECT TIME_FLOOR(__time, 'P1M') AS t, dim2, SUM(cnt) AS s
        |FROM foo GROUP BY 1, 2
        |ORDER BY dim2 ASC NULLS FIRST, 1 ASC""".stripMargin)
    assert(out == Seq(
      (ts("2000-01-01 00:00:00"), None, 1L),
      (ts("2001-01-01 00:00:00"), None, 1L),
      (ts("2000-01-01 00:00:00"), Some(""), 1L),
      (ts("2000-01-01 00:00:00"), Some("a"), 1L),
      (ts("2001-01-01 00:00:00"), Some("a"), 1L),
      (ts("2001-01-01 00:00:00"), Some("abc"), 1L)))
  }

  test("testGroupByTimeAndDimOrderByDimDesc — null sorts LAST descending (:284)") {
    val out = timeDim(
      """SELECT TIME_FLOOR(__time, 'P1M') AS t, dim2, SUM(cnt) AS s
        |FROM foo GROUP BY 1, 2
        |ORDER BY dim2 DESC NULLS LAST, 1 ASC""".stripMargin)
    assert(out == Seq(
      (ts("2001-01-01 00:00:00"), Some("abc"), 1L),
      (ts("2000-01-01 00:00:00"), Some("a"), 1L),
      (ts("2001-01-01 00:00:00"), Some("a"), 1L),
      (ts("2000-01-01 00:00:00"), Some(""), 1L),
      (ts("2000-01-01 00:00:00"), None, 1L),
      (ts("2001-01-01 00:00:00"), None, 1L)))
  }

  test("testGroupByDimAndTimeOrderByTime — NUMERIC comparator on the " +
      "time dimension (:339)") {
    val out = dimTime(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M') AS t, SUM(cnt) AS s
        |FROM foo GROUP BY 1, 2
        |ORDER BY TIME_FLOOR(__time, 'P1M') ASC, dim2 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq(
      (None, ts("2000-01-01 00:00:00"), 1L),
      (Some(""), ts("2000-01-01 00:00:00"), 1L),
      (Some("a"), ts("2000-01-01 00:00:00"), 1L),
      (None, ts("2001-01-01 00:00:00"), 1L),
      (Some("a"), ts("2001-01-01 00:00:00"), 1L),
      (Some("abc"), ts("2001-01-01 00:00:00"), 1L)))
  }

  test("testGroupByDimAndTimeOrderByTimeDesc (:396)") {
    val out = dimTime(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M') AS t, SUM(cnt) AS s
        |FROM foo GROUP BY 1, 2
        |ORDER BY TIME_FLOOR(__time, 'P1M') DESC, dim2 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq(
      (None, ts("2001-01-01 00:00:00"), 1L),
      (Some("a"), ts("2001-01-01 00:00:00"), 1L),
      (Some("abc"), ts("2001-01-01 00:00:00"), 1L),
      (None, ts("2000-01-01 00:00:00"), 1L),
      (Some(""), ts("2000-01-01 00:00:00"), 1L),
      (Some("a"), ts("2000-01-01 00:00:00"), 1L)))
  }

  test("testGroupByDimAndTimeOrderByTimeAndDim (:453)") {
    val out = dimTime(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M') AS t, SUM(cnt) AS s
        |FROM foo GROUP BY 1, 2
        |ORDER BY TIME_FLOOR(__time, 'P1M') ASC, dim2 DESC NULLS LAST""".stripMargin)
    assert(out == Seq(
      (Some("a"), ts("2000-01-01 00:00:00"), 1L),
      (Some(""), ts("2000-01-01 00:00:00"), 1L),
      (None, ts("2000-01-01 00:00:00"), 1L),
      (Some("abc"), ts("2001-01-01 00:00:00"), 1L),
      (Some("a"), ts("2001-01-01 00:00:00"), 1L),
      (None, ts("2001-01-01 00:00:00"), 1L)))
  }

  test("testGroupByDimAndTimeOrderByDimAndTime (:511)") {
    val out = dimTime(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M') AS t, SUM(cnt) AS s
        |FROM foo GROUP BY 1, 2
        |ORDER BY dim2 ASC NULLS FIRST, TIME_FLOOR(__time, 'P1M') DESC""".stripMargin)
    assert(out == Seq(
      (None, ts("2001-01-01 00:00:00"), 1L),
      (None, ts("2000-01-01 00:00:00"), 1L),
      (Some(""), ts("2000-01-01 00:00:00"), 1L),
      (Some("a"), ts("2001-01-01 00:00:00"), 1L),
      (Some("a"), ts("2000-01-01 00:00:00"), 1L),
      (Some("abc"), ts("2001-01-01 00:00:00"), 1L)))
  }

  test("testGroupByDimAndTimeAndDimOrderByDimAndTimeDim — three dims, " +
      "mixed directions (:569)") {
    val out = sql(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M') AS t, dim1, SUM(cnt) AS s
        |FROM foo GROUP BY 1, 2, 3
        |ORDER BY dim2 DESC NULLS LAST, TIME_FLOOR(__time, 'P1M') DESC, dim1 ASC""".stripMargin)
      .map(r => (Option(r.getString(0)), r.getTimestamp(1), r.getString(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (Some("abc"), ts("2001-01-01 00:00:00"), "def", 1L),
      (Some("a"), ts("2001-01-01 00:00:00"), "1", 1L),
      (Some("a"), ts("2000-01-01 00:00:00"), "", 1L),
      (Some(""), ts("2000-01-01 00:00:00"), "2", 1L),
      (None, ts("2001-01-01 00:00:00"), "abc", 1L),
      (None, ts("2000-01-01 00:00:00"), "10.1", 1L)))
  }
}
