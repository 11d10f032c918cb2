package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** Round-6 golden tranche: CalciteQueryTest.java remaining query shapes —
  * common table expressions (:4161), bound-filter simplification
  * (:5348, :5426), empty group keys (:4014), histogram-over-subquery with
  * sort (:7412), time-dimension self-joins (:12937), expression counts
  * (:12960s), and sort/project around nested groupBys (:11253, :11323). */
class CalciteCteAndShapesGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val foo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   1.0f, 1.0, 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], 2.0f, 2.0, 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    3.0f, 3.0, 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   4.0f, 4.0, 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), 5.0f, 5.0, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], 6.0f, 6.0, 1L))
    .toDF("__time", "dim1", "dim2", "m1", "m2", "cnt")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
    foo.createOrReplaceTempView("numfoo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }

  test("testCountStarOnCommonTableExpression (CalciteQueryTest.java:4161)") {
    assert(single(
      """WITH beep (dim1_firstchar) AS (SELECT SUBSTRING(dim1, 1, 1) FROM foo WHERE dim2 = 'a')
        |SELECT COUNT(*) FROM beep WHERE dim1_firstchar <> 'z'""".stripMargin).getLong(0) == 2L)
  }

  test("testCountStarWithBoundFilterSimplifyOr / SimplifyAnd (:5348, :5426)") {
    assert(single(
      "SELECT COUNT(*) FROM foo WHERE (dim1 >= 'a' and dim1 < 'b') OR dim1 = 'ab'")
      .getLong(0) == 1L)
    assert(single(
      "SELECT COUNT(*) FROM foo WHERE (dim1 >= 'a' and dim1 < 'b') and dim1 = 'abc'")
      .getLong(0) == 1L)
  }

  test("testGroupByWithGroupByEmpty — the no-key group is the global aggregate (:4014)") {
    // Calcite's GROUP BY () spelled as the bare global aggregate
    val r = single("SELECT COUNT(*), SUM(cnt), MIN(cnt) FROM foo")
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 6L, 1L)))
  }

  test("testHistogramUsingSubqueryWithSort (:7412)") {
    val out = sql(
      """SELECT CAST(thecnt AS STRING), COUNT(*)
        |FROM (SELECT dim2, SUM(cnt) AS thecnt FROM foo GROUP BY dim2)
        |GROUP BY CAST(thecnt AS STRING) ORDER BY CAST(thecnt AS STRING) LIMIT 2""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("1", 2L), ("2", 2L)))
  }

  test("testJoinWithTimeDimension (:12937)") {
    assert(single(
      "SELECT count(*) FROM foo t1 inner join foo t2 on t1.__time = t2.__time")
      .getLong(0) == 6L)
  }

  test("expression counts skip nulls — COUNT(reverse/left/strpos of dim2) (:12960s)") {
    val r = single(
      """SELECT COUNT(reverse(dim2)), COUNT(left(dim2, 5)), COUNT(STRPOS(dim2, 'a'))
        |FROM numfoo""".stripMargin)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 4L, 4L)))
  }

  test("testGroupByWithFilterMatchingNothingWithGroupByLiteral (:4036)") {
    assert(sql(
      "SELECT COUNT(*), MAX(cnt) FROM foo WHERE dim1 = 'foobar' GROUP BY 'dummy'").isEmpty)
  }

  test("COUNT over columns and CASE skips nulls (:4060s)") {
    assert(single("SELECT COUNT(cnt) FROM foo").getLong(0) == 6L)
    assert(single("SELECT COUNT(dim2) FROM foo").getLong(0) == 4L)
    assert(single(
      """SELECT COUNT(CASE WHEN dim2 = 'abc' THEN 'yes' WHEN dim2 = 'def' THEN 'yes' END)
        |FROM foo""".stripMargin).getLong(0) == 1L)
  }

  test("testGroupByWithPostAggregatorReferencingTimeFloorColumnOnTimeseries (:137)") {
    val out = sql(
      """SELECT TIME_FORMAT(`date`, 'yyyy-MM') AS m, SUM(x) FROM (
        |    SELECT TIME_FLOOR(__time, 'PT1H') as `date`, COUNT(*) as x
        |    FROM foo GROUP BY 1
        |) GROUP BY 1 ORDER BY 1""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("2000-01", 3L), ("2001-01", 3L)))
  }

  test("testProjectAfterSort3 / testSortProjectAfterNestedGroupBy (:11253, :11323)") {
    val nested =
      """SELECT cnt FROM (
        |  SELECT __time, dim1, COUNT(m2) AS cnt FROM (
        |    SELECT __time, m2, dim1 FROM foo GROUP BY __time, m2, dim1
        |  ) GROUP BY __time, dim1 ORDER BY cnt
        |)""".stripMargin
    assert(sql(nested).map(_.getLong(0)).toSeq == Seq.fill(6)(1L))
    // ProjectAfterSort3: grouping by the same dim twice projects each group once
    val out = sql(
      """SELECT dim1 FROM (SELECT dim1, dim1 AS d2 FROM foo GROUP BY dim1, dim1 ORDER BY dim1)""".stripMargin)
      .map(_.getString(0)).toSeq
    assert(out == Seq("", "1", "10.1", "2", "abc", "def"))
  }
}
