package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** Round-6 golden tranche completing CalciteSimpleQueryTest.java (all 11
  * cases now ported — testGroupByTimeAndDim and the OrderByDim pair live in
  * CalciteGoldenSpec). Druid's groupBy orderings spell their implicit
  * null positions explicitly: lexicographic asc puts null (smallest)
  * first, desc puts it last. */
class CalciteSimpleCompletionGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val foo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], 1L))
    .toDF("__time", "dim1", "dim2", "cnt")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def rows3(q: String): Seq[(Option[String], Timestamp, Long)] =
    sql(q).map(r => (Option(r.getString(0)), r.getTimestamp(1), r.getLong(2))).toSeq

  private val jan2000 = ts("2000-01-01 00:00:00")
  private val jan2001 = ts("2001-01-01 00:00:00")

  test("testGroupByDimAndTime (CalciteSimpleQueryTest.java:93)") {
    val out = rows3(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M'), SUM(cnt) FROM foo
        |GROUP BY 1, 2 ORDER BY 1 ASC NULLS FIRST, 2 ASC""".stripMargin)
    assert(out == Seq(
      (None, jan2000, 1L), (None, jan2001, 1L), (Some(""), jan2000, 1L),
      (Some("a"), jan2000, 1L), (Some("a"), jan2001, 1L), (Some("abc"), jan2001, 1L)))
  }

  test("testGroupByDimAndTimeWhereOnTime (:141)") {
    val out = rows3(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M'), SUM(cnt) FROM foo
        |WHERE TIME_FLOOR(__time, 'P1M') = TIMESTAMP '2001-01-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq(
      (None, jan2001, 1L), (Some("a"), jan2001, 1L), (Some("abc"), jan2001, 1L)))
  }

  test("testGroupByDimAndTimeOnDim (:185)") {
    val out = rows3(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M'), SUM(cnt) FROM foo
        |WHERE dim2 LIKE 'a%' GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    assert(out == Seq(
      (Some("a"), jan2000, 1L), (Some("a"), jan2001, 1L), (Some("abc"), jan2001, 1L)))
  }

  test("testGroupByDimAndTimeOrderByTime / TimeDesc (:340, :397)") {
    assert(rows3(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M'), SUM(cnt) FROM foo
        |GROUP BY 1, 2 ORDER BY TIME_FLOOR(__time, 'P1M'), 1 ASC NULLS FIRST""".stripMargin) == Seq(
      (None, jan2000, 1L), (Some(""), jan2000, 1L), (Some("a"), jan2000, 1L),
      (None, jan2001, 1L), (Some("a"), jan2001, 1L), (Some("abc"), jan2001, 1L)))
    assert(rows3(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M'), SUM(cnt) FROM foo
        |GROUP BY 1, 2 ORDER BY TIME_FLOOR(__time, 'P1M') DESC, 1 ASC NULLS FIRST""".stripMargin) == Seq(
      (None, jan2001, 1L), (Some("a"), jan2001, 1L), (Some("abc"), jan2001, 1L),
      (None, jan2000, 1L), (Some(""), jan2000, 1L), (Some("a"), jan2000, 1L)))
  }

  test("testGroupByDimAndTimeOrderByTimeAndDim (:454)") {
    val out = rows3(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M'), SUM(cnt) FROM foo
        |GROUP BY 1, 2 ORDER BY TIME_FLOOR(__time, 'P1M'), dim2 DESC NULLS LAST""".stripMargin)
    assert(out == Seq(
      (Some("a"), jan2000, 1L), (Some(""), jan2000, 1L), (None, jan2000, 1L),
      (Some("abc"), jan2001, 1L), (Some("a"), jan2001, 1L), (None, jan2001, 1L)))
  }

  test("testGroupByDimAndTimeOrderByDimAndTime (:512)") {
    val out = rows3(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M'), SUM(cnt) FROM foo
        |GROUP BY 1, 2 ORDER BY dim2 ASC NULLS FIRST, TIME_FLOOR(__time, 'P1M') DESC""".stripMargin)
    assert(out == Seq(
      (None, jan2001, 1L), (None, jan2000, 1L), (Some(""), jan2000, 1L),
      (Some("a"), jan2001, 1L), (Some("a"), jan2000, 1L), (Some("abc"), jan2001, 1L)))
  }

  test("testGroupByDimAndTimeAndDimOrderByDimAndTimeDim (:570)") {
    val out = sql(
      """SELECT dim2, TIME_FLOOR(__time, 'P1M'), dim1, SUM(cnt) FROM foo
        |GROUP BY 1, 2, 3
        |ORDER BY dim2 DESC NULLS LAST, TIME_FLOOR(__time, 'P1M') DESC, dim1""".stripMargin)
      .map(r => (Option(r.getString(0)), r.getTimestamp(1), r.getString(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (Some("abc"), jan2001, "def", 1L),
      (Some("a"), jan2001, "1", 1L),
      (Some("a"), jan2000, "", 1L),
      (Some(""), jan2000, "2", 1L),
      (None, jan2001, "abc", 1L),
      (None, jan2000, "10.1", 1L)))
  }
}
