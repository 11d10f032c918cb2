package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** CalciteJoinQueryTest golden tranche (reference: sql/src/test/.../calcite/
  * CalciteJoinQueryTest.java, 5000+ LoC of (SQL, expected rows) join cases).
  * Same porting rules as CalciteGoldenSpec: verbatim SQL where it parses,
  * documented minimal adaptation otherwise. `lookup.lookyloo` (the
  * reference's test lookup, CalciteTests.java:269-274) is spelled as a
  * plain `lookyloo` view — Spark has no `lookup` schema — and is also
  * registered in LookupRegistry for the LOOKUP() function cases.
  * Expected rows are the sql-compatible-null-mode values.
  */
class CalciteJoinGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val foo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   Option(Seq("a", "b")), 1.0f, 1.0, 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], Option(Seq("b", "c")), 2.0f, 2.0, 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    Option(Seq("d")), 3.0f, 3.0, 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   Option(Seq("")),  4.0f, 4.0, 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), None: Option[Seq[String]], 5.0f, 5.0, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], None: Option[Seq[String]], 6.0f, 6.0, 1L)
  ).toDF("__time", "dim1", "dim2", "dim3", "m1", "m2", "cnt")

  private lazy val lookyloo: DataFrame = Seq(
    ("a", "xa"), ("abc", "xabc"), ("nosuchkey", "mysteryvalue"), ("6", "x6")
  ).toDF("k", "v")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
    lookyloo.createOrReplaceTempView("lookyloo")
    graft.sources.LookupRegistry.global.register("lookyloo", lookyloo)
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }
  private def os(r: Row, i: Int): Option[String] = Option(r.getString(i))

  // ---- lookup joins ----

  test("testSelectOnLookupUsingInnerJoinOperator (CalciteJoinQueryTest.java:929)") {
    val out = sql(
      """SELECT dim2, lookyloo.*
        |FROM foo INNER JOIN lookyloo ON foo.dim2 = lookyloo.k""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
    assert(out.toSeq == Seq(("a", "a", "xa"), ("a", "a", "xa"), ("abc", "abc", "xabc")))
  }

  test("testLeftJoinTwoLookupsUsingJoinOperator (:961)") {
    val out = sql(
      """SELECT dim1, dim2, l1.v AS v1, l2.v AS v2
        |FROM foo
        |LEFT JOIN lookyloo l1 ON foo.dim1 = l1.k
        |LEFT JOIN lookyloo l2 ON foo.dim2 = l2.k""".stripMargin)
      .map(r => (r.getString(0), os(r, 1), os(r, 2), os(r, 3))).toSet
    assert(out == Set(
      ("", Some("a"), None, Some("xa")),
      ("10.1", None, None, None),
      ("2", Some(""), None, None),
      ("1", Some("a"), None, Some("xa")),
      ("def", Some("abc"), None, Some("xabc")),
      ("abc", None, Some("xabc"), None)))
  }

  test("testSelectOnLookupUsingLeftJoinOperator (:2271)") {
    val out = sql(
      """SELECT dim1, lookyloo.*
        |FROM foo LEFT JOIN lookyloo ON foo.dim1 = lookyloo.k
        |WHERE lookyloo.v <> 'xxx' OR lookyloo.v IS NULL""".stripMargin)
      .map(r => (r.getString(0), os(r, 1), os(r, 2))).toSet
    assert(out == Set(
      ("", None, None), ("10.1", None, None), ("2", None, None),
      ("1", None, None), ("def", None, None), ("abc", Some("abc"), Some("xabc"))))
  }

  test("testSelectOnLookupUsingRightJoinOperator (:2308)") {
    val out = sql(
      """SELECT dim1, lookyloo.*
        |FROM foo RIGHT JOIN lookyloo ON foo.dim1 = lookyloo.k
        |WHERE lookyloo.v <> 'xxx' OR lookyloo.v IS NULL""".stripMargin)
      .map(r => (os(r, 0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(
      (Some("abc"), "abc", "xabc"),
      (None, "a", "xa"),
      (None, "nosuchkey", "mysteryvalue"),
      (None, "6", "x6")))
  }

  test("testSelectOnLookupUsingFullJoinOperator (:2343)") {
    val out = sql(
      """SELECT dim1, m1, cnt, lookyloo.*
        |FROM foo FULL JOIN lookyloo ON foo.dim1 = lookyloo.k
        |WHERE lookyloo.v <> 'xxx' OR lookyloo.v IS NULL""".stripMargin)
      .map(r => (os(r, 0), if (r.isNullAt(1)) None else Some(r.getFloat(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), os(r, 3), os(r, 4))).toSet
    assert(out == Set(
      (Some(""), Some(1f), Some(1L), None, None),
      (Some("10.1"), Some(2f), Some(1L), None, None),
      (Some("2"), Some(3f), Some(1L), None, None),
      (Some("1"), Some(4f), Some(1L), None, None),
      (Some("def"), Some(5f), Some(1L), None, None),
      (Some("abc"), Some(6f), Some(1L), Some("abc"), Some("xabc")),
      (None, None, None, Some("a"), Some("xa")),
      (None, None, None, Some("nosuchkey"), Some("mysteryvalue")),
      (None, None, None, Some("6"), Some("x6"))))
  }

  test("testCommaJoinLeftFunction (:1817)") {
    val out = sql(
      """SELECT foo.dim1, foo.dim2, l.k, l.v
        |FROM foo, lookyloo l
        |WHERE SUBSTRING(foo.dim2, 1, 1) = l.k""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(out == Set(
      ("", "a", "a", "xa"), ("1", "a", "a", "xa"), ("def", "abc", "a", "xa")))
  }

  test("testInnerJoinWithIsNullFilter (:2572)") {
    val out = sql(
      """SELECT dim1, l.v FROM foo f INNER JOIN lookyloo l ON f.dim1 = l.k
        |WHERE f.dim2 IS NULL""".stripMargin)
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("abc", "xabc")))
  }

  // ---- aggregate-subquery joins ----

  test("testInAggregationSubquery (:2383)") {
    val out = sql(
      "SELECT DISTINCT __time FROM foo WHERE __time IN (SELECT MAX(__time) FROM foo)")
      .map(_.getTimestamp(0))
    assert(out.toSeq == Seq(ts("2001-01-03 00:00:00")))
  }

  test("testNotInAggregationSubquery (:2431)") {
    val out = sql(
      "SELECT DISTINCT __time FROM foo WHERE __time NOT IN (SELECT MAX(__time) FROM foo) ORDER BY 1")
      .map(_.getTimestamp(0))
    assert(out.toSeq == Seq(
      ts("2000-01-01 00:00:00"), ts("2000-01-02 00:00:00"), ts("2000-01-03 00:00:00"),
      ts("2001-01-01 00:00:00"), ts("2001-01-02 00:00:00")))
  }

  test("testTwoSemiJoinsSimultaneously (:3562)") {
    val out = sql(
      """SELECT dim1, COUNT(*) FROM foo
        |WHERE dim1 IN ('abc', 'def')
        |AND __time IN (SELECT MAX(__time) FROM foo WHERE cnt = 1)
        |AND __time IN (SELECT MAX(__time) FROM foo WHERE cnt <> 2)
        |GROUP BY 1""".stripMargin).map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("abc", 1L)))
  }

  test("testSemiAndAntiJoinSimultaneouslyUsingWhereInSubquery (:3625)") {
    val out = sql(
      """SELECT dim1, COUNT(*) FROM foo
        |WHERE dim1 IN ('abc', 'def')
        |AND __time IN (SELECT MAX(__time) FROM foo)
        |AND __time NOT IN (SELECT MIN(__time) FROM foo)
        |GROUP BY 1""".stripMargin).map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("abc", 1L)))
  }

  test("testLeftJoinRightTableCanBeEmpty (:3192)") {
    val out = sql(
      """SELECT v1.dim2, count(1) AS cnt
        |FROM (SELECT * FROM foo WHERE m1 > 2) v1
        |LEFT OUTER JOIN (
        |  SELECT dim2 FROM (SELECT * FROM foo WHERE m2 IS NULL)
        |) sm ON v1.dim2 = sm.dim2
        |GROUP BY 1""".stripMargin)
      .map(r => (os(r, 0), r.getLong(1))).toSet
    assert(out == Set(
      (None, 1L), (Some(""), 1L), (Some("a"), 1L), (Some("abc"), 1L)))
  }

  test("testInnerJoinWithLimitAndAlias (:109)") {
    val out = sql(
      """SELECT t1.b1 FROM (SELECT __time AS b1 FROM foo GROUP BY 1 ORDER BY 1) t1
        |INNER JOIN (SELECT __time AS b2 FROM foo GROUP BY 1 ORDER BY 1) t2
        |ON t1.b1 = t2.b2 ORDER BY 1""".stripMargin).map(_.getTimestamp(0))
    assert(out.toSeq == Seq(
      ts("2000-01-01 00:00:00"), ts("2000-01-02 00:00:00"), ts("2000-01-03 00:00:00"),
      ts("2001-01-01 00:00:00"), ts("2001-01-02 00:00:00"), ts("2001-01-03 00:00:00")))
  }

  // ---- LOOKUP() function (CalciteQueryTest.java) ----

  test("testFilterAndGroupByLookup (CalciteQueryTest.java:8533; Druid <> keeps nulls, IS DISTINCT FROM)") {
    val out = sql(
      """SELECT LOOKUP(dim1, 'lookyloo') AS lk, COUNT(*) AS cnt FROM foo
        |WHERE LOOKUP(dim1, 'lookyloo') IS DISTINCT FROM 'xxx'
        |GROUP BY LOOKUP(dim1, 'lookyloo')""".stripMargin)
      .map(r => (os(r, 0), r.getLong(1))).toSet
    assert(out == Set((None, 5L), (Some("xabc"), 1L)))
  }

  test("testCountDistinctOfLookup (:8589)") {
    assert(single("SELECT COUNT(DISTINCT LOOKUP(dim1, 'lookyloo')) FROM foo").getLong(0) == 1L)
  }

  // ---- round-6 second tranche: filter+groupBy over lookup joins ----

  test("testFilterAndGroupByLookupUsingJoinOperator + ValueFilterPushdownMatchesNothing " +
      "(CalciteJoinQueryTest.java:804, :594)") {
    val out = sql(
      """SELECT lookyloo.k, COUNT(*) FROM foo
        |LEFT JOIN lookyloo ON foo.dim2 = lookyloo.k
        |WHERE lookyloo.v = 'xa' GROUP BY lookyloo.k""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 2L)))
    assert(sql(
      """SELECT lookyloo.k, COUNT(*) FROM foo
        |LEFT JOIN lookyloo ON foo.dim2 = lookyloo.k
        |WHERE lookyloo.v = '123' GROUP BY lookyloo.k""".stripMargin).isEmpty)
  }

  test("testFilterAndGroupByLookupUsingJoinOperatorAllowNulls / WithNotFilter / Backwards " +
      "(:631, :718, :670 — Druid's not-selector matches nulls, spelled null-safely)") {
    val expected = Set((None, 3L), (Some("xabc"), 1L))
    assert(sql(
      """SELECT lookyloo.v, COUNT(*) FROM foo
        |LEFT JOIN lookyloo ON foo.dim2 = lookyloo.k
        |WHERE lookyloo.v <> 'xa' OR lookyloo.v IS NULL GROUP BY lookyloo.v""".stripMargin)
      .map(r => (os(r, 0), r.getLong(1))).toSet == expected)
    assert(sql(
      """SELECT lookyloo.v, COUNT(*) FROM foo
        |LEFT JOIN lookyloo ON foo.dim2 = lookyloo.k
        |WHERE NOT lookyloo.v <=> 'xa' GROUP BY lookyloo.v""".stripMargin)
      .map(r => (os(r, 0), r.getLong(1))).toSet == expected)
    assert(sql(
      """SELECT lookyloo.v, COUNT(*) FROM lookyloo
        |RIGHT JOIN foo ON foo.dim2 = lookyloo.k
        |WHERE NOT lookyloo.v <=> 'xa' GROUP BY lookyloo.v""".stripMargin)
      .map(r => (os(r, 0), r.getLong(1))).toSet == expected)
  }

  test("testFilterAndGroupByLookupUsingPostAggregationJoinOperator (:842)") {
    val out = sql(
      """SELECT base.dim2, lookyloo.v, base.cnt FROM (
        |  SELECT dim2, COUNT(*) cnt FROM foo GROUP BY dim2
        |) base
        |LEFT JOIN lookyloo ON base.dim2 = lookyloo.k
        |WHERE lookyloo.v <> 'xa' OR lookyloo.v IS NULL
        |ORDER BY 1 ASC NULLS FIRST""".stripMargin)
      .map(r => (os(r, 0), os(r, 1), r.getLong(2))).toSeq
    assert(out == Seq(
      (None, None, 2L), (Some(""), None, 1L), (Some("abc"), Some("xabc"), 1L)))
  }

  test("testGroupByInnerJoinOnLookupUsingJoinOperator (:893)") {
    val out = sql(
      """SELECT lookyloo.v, COUNT(*) FROM foo
        |INNER JOIN lookyloo ON foo.dim1 = lookyloo.k GROUP BY lookyloo.v""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("xabc", 1L)))
  }

  // ---- joins on cast / function keys ----

  test("testInnerJoinCastLeft — no float string renders equal to a key (:1977)") {
    assert(sql(
      """SELECT foo.m1, l.k, l.v FROM foo
        |INNER JOIN lookyloo l ON CAST(foo.m1 AS VARCHAR(20)) = l.k""".stripMargin).isEmpty)
  }

  test("testInnerJoinCastRight / MismatchedTypes — key cast to float matches m1=6 (:2011, :2055)") {
    // Druid CASTs the lookup key leniently (non-numeric keys -> null);
    // TRY_CAST is the ANSI-session spelling of the same cast
    val expected = Seq((6.0f, "6", "x6"))
    assert(sql(
      """SELECT foo.m1, l.k, l.v FROM foo
        |INNER JOIN lookyloo l ON foo.m1 = TRY_CAST(l.k AS FLOAT)""".stripMargin)
      .map(r => (r.getFloat(0), r.getString(1), r.getString(2))).toSeq == expected)
    assert(sql(
      """SELECT foo.m1, l.k, l.v FROM foo
        |INNER JOIN lookyloo l ON foo.m1 = TRY_CAST(l.k AS DOUBLE)""".stripMargin)
      .map(r => (r.getFloat(0), r.getString(1), r.getString(2))).toSeq == expected)
  }

  test("testInnerJoinLeftFunction / RightFunction (:2099, :2135)") {
    assert(sql(
      """SELECT foo.dim1, foo.dim2, l.k, l.v FROM foo
        |INNER JOIN lookyloo l ON SUBSTRING(foo.dim2, 1, 1) = l.k ORDER BY 1""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSeq ==
      Seq(("", "a", "a", "xa"), ("1", "a", "a", "xa"), ("def", "abc", "a", "xa")))
    assert(sql(
      """SELECT foo.dim1, foo.dim2, l.k, l.v FROM foo
        |INNER JOIN lookyloo l ON foo.dim2 = SUBSTRING(l.k, 1, 2) ORDER BY 1""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSeq ==
      Seq(("", "a", "a", "xa"), ("1", "a", "a", "xa")))
  }

  // ---- join shapes over subqueries ----

  test("testJoinWithLimitBeforeJoining (:386)") {
    val out = sql(
      """SELECT t1.dim2, AVG(t1.m2) FROM (SELECT * FROM foo LIMIT 10) AS t1
        |INNER JOIN foo AS t2 ON t1.m1 = t2.m1
        |GROUP BY t1.dim2 ORDER BY 1 ASC NULLS FIRST""".stripMargin)
      .map(r => (os(r, 0), r.getDouble(1))).toSeq
    assert(out == Seq(
      (None, 4.0), (Some(""), 3.0), (Some("a"), 2.5), (Some("abc"), 5.0)))
  }

  test("testJoinOnTimeseriesWithFloorOnTime — tuple IN over a floored timeseries (:472)") {
    val out = sql(
      """SELECT TIMESTAMP_TO_MILLIS(__time) AS t, m1, to_json(ANY_VALUE(dim3)) AS d3
        |FROM foo WHERE (TIME_FLOOR(__time, 'PT1H'), m1) IN (
        |  SELECT TIME_FLOOR(__time, 'PT1H') AS t1, MIN(m1) AS t2 FROM foo
        |  WHERE array_contains(dim3, 'b')
        |    AND __time BETWEEN '1994-04-29 00:00:00' AND '2020-01-11 00:00:00' GROUP BY 1)
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin)
      .map(r => (r.getLong(0), r.getFloat(1), r.getString(2))).toSeq
    assert(out == Seq(
      (946684800000L, 1.0f, """["a","b"]"""),
      (946771200000L, 2.0f, """["b","c"]""")))
  }
}
