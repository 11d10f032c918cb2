package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** Round-6 golden tranche: CalciteQueryTest.java groupBy ordering / limit /
  * projection clusters (:436-:600, :1826-:1881, :2399, :4688, :7777, :8379,
  * :10026-:10190, :11126).
  *
  * Adaptations: Druid's outer-limit context and groupBy→topN conversions
  * are spelled as explicit LIMIT + the implicit tiebreak (dimension
  * ascending); Druid SUBSTRING yields null, not '', past the string end
  * (spelled NULLIF); lenient numeric casts spell TRY_CAST under the ANSI
  * session. Expected rows are sql-compatible-mode values. */
class CalciteGroupByOrderingGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

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
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }
  private def os(r: Row, i: Int): Option[String] = Option(r.getString(i))

  test("testTopNLimitWrappingOrderByAgg — outer limit context (CalciteQueryTest.java:436)") {
    val out = sql(
      "SELECT dim1, COUNT(*) FROM foo GROUP BY 1 ORDER BY 2 DESC, 1 ASC LIMIT 2")
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("", 1L), ("1", 1L)))
  }

  test("testGroupByLimitWrapping (:457)") {
    val out = sql(
      "SELECT dim1, dim2, COUNT(*) FROM foo GROUP BY dim1, dim2 ORDER BY dim1 DESC LIMIT 2")
      .map(r => (r.getString(0), os(r, 1), r.getLong(2))).toSeq
    assert(out == Seq(("def", Some("abc"), 1L), ("abc", None, 1L)))
  }

  test("testGroupByLimitWrappingOrderByAgg (:531)") {
    val out = sql(
      """SELECT dim1, dim2, COUNT(*) FROM foo GROUP BY 1, 2
        |ORDER BY 3 DESC, 1 ASC, 2 ASC LIMIT 2""".stripMargin)
      .map(r => (r.getString(0), os(r, 1), r.getLong(2))).toSeq
    assert(out == Seq(("", Some("a"), 1L), ("1", Some("a"), 1L)))
  }

  test("testGroupBySingleColumnDescendingNoTopN (:564)") {
    val out = sql("SELECT dim1 FROM foo GROUP BY dim1 ORDER BY dim1 DESC")
      .map(_.getString(0)).toSeq
    assert(out == Seq("def", "abc", "2", "10.1", "1", ""))
  }

  test("testGroupByExpressionAliasedAsOriginalColumnName (:1826)") {
    val out = sql(
      """SELECT TIME_FLOOR(__time, 'P1M') AS __time, COUNT(*) FROM foo
        |GROUP BY TIME_FLOOR(__time, 'P1M') ORDER BY 1""".stripMargin)
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    assert(out == Seq(
      (ts("2000-01-01 00:00:00"), 3L), (ts("2001-01-01 00:00:00"), 3L)))
  }

  test("testGroupByAndOrderByOrdinalOfAlias (:1851)") {
    val r = single("SELECT cnt as theCnt, COUNT(*) FROM foo GROUP BY 1 ORDER BY 1 ASC")
    assert((r.getLong(0), r.getLong(1)) == ((1L, 6L)))
  }

  test("testGroupByWithSelectAndOrderByProjections — Druid SUBSTRING nulls past the end (:2399)") {
    val out = sql(
      """SELECT dim1, NULLIF(SUBSTRING(dim1, 2), '') AS s FROM foo
        |GROUP BY dim1 ORDER BY CHARACTER_LENGTH(dim1) DESC, dim1""".stripMargin)
      .map(r => (r.getString(0), os(r, 1))).toSeq
    assert(out == Seq(
      ("10.1", Some("0.1")), ("abc", Some("bc")), ("def", Some("ef")),
      ("1", None), ("2", None), ("", None)))
  }

  test("testGroupByWithSortOnPostAggregationDefault (:4688)") {
    val out = sql(
      "SELECT dim1, MIN(m1) + MAX(m1) AS x FROM foo GROUP BY dim1 ORDER BY x LIMIT 3")
      .map(r => (r.getString(0), r.getFloat(1))).toSeq
    assert(out == Seq(("", 2.0f), ("10.1", 4.0f), ("2", 6.0f)))
  }

  test("testGroupByLimitPushDownWithHavingOnLong (:7777)") {
    val out = sql(
      """SELECT dim1, dim2, SUM(cnt) AS thecnt FROM foo
        |GROUP BY dim1, dim2 HAVING SUM(cnt) = 1
        |ORDER BY dim2 ASC NULLS FIRST, dim1 ASC LIMIT 4""".stripMargin)
      .map(r => (r.getString(0), os(r, 1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("10.1", None, 1L), ("abc", None, 1L), ("2", Some(""), 1L), ("", Some("a"), 1L)))
  }

  test("testGroupByFloorWithOrderBy (:8379)") {
    val out = sql(
      """SELECT CAST(FLOOR(TRY_CAST(dim1 AS FLOAT)) AS FLOAT) AS fl, COUNT(*) FROM foo
        |GROUP BY 1 ORDER BY fl DESC NULLS LAST""".stripMargin)
      .map(r => (if (r.isNullAt(0)) None else Some(r.getFloat(0)), r.getLong(1))).toSeq
    assert(out == Seq(
      (Some(10.0f), 1L), (Some(2.0f), 1L), (Some(1.0f), 1L), (None, 3L)))
  }

  test("testGroupByTimeAndOtherDimension (:10026)") {
    val out = sql(
      """SELECT dim2, gran, SUM(cnt)
        |FROM (SELECT TIME_FLOOR(__time, 'P1M') AS gran, dim2, cnt FROM foo) AS x
        |GROUP BY dim2, gran ORDER BY dim2 ASC NULLS FIRST, gran""".stripMargin)
      .map(r => (os(r, 0), r.getTimestamp(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (None, ts("2000-01-01 00:00:00"), 1L),
      (None, ts("2001-01-01 00:00:00"), 1L),
      (Some(""), ts("2000-01-01 00:00:00"), 1L),
      (Some("a"), ts("2000-01-01 00:00:00"), 1L),
      (Some("a"), ts("2001-01-01 00:00:00"), 1L),
      (Some("abc"), ts("2001-01-01 00:00:00"), 1L)))
  }

  test("testGroupByTimeFloorAndDimOnGroupByTimeFloorAndDim (:10088)") {
    val out = sql(
      """SELECT dim2, TIME_FLOOR(gran, 'P1M') gran, SUM(s)
        |FROM (SELECT TIME_FLOOR(__time, 'P1D') AS gran, dim2, SUM(m1) as s FROM foo
        |      GROUP BY 1, 2 HAVING SUM(m1) > 1) AS x
        |GROUP BY 1, 2 ORDER BY dim2 ASC NULLS FIRST, gran DESC""".stripMargin)
      .map(r => (os(r, 0), r.getTimestamp(1), r.getDouble(2))).toSeq
    assert(out == Seq(
      (None, ts("2001-01-01 00:00:00"), 6.0),
      (None, ts("2000-01-01 00:00:00"), 2.0),
      (Some(""), ts("2000-01-01 00:00:00"), 3.0),
      (Some("a"), ts("2001-01-01 00:00:00"), 4.0),
      (Some("abc"), ts("2001-01-01 00:00:00"), 5.0)))
  }

  test("testOrderByAlongWithAliasOrderByTimeGroupByMulti / OneCol (:11126, :11152)") {
    val r = single(
      "SELECT __time as bug, dim2 FROM foo GROUP BY 1, 2 ORDER BY 1 LIMIT 1")
    assert(r.getTimestamp(0) == ts("2000-01-01 00:00:00") && r.getString(1) == "a")
    assert(single("SELECT __time as bug FROM foo GROUP BY 1 ORDER BY 1 LIMIT 1")
      .getTimestamp(0) == ts("2000-01-01 00:00:00"))
  }
}
