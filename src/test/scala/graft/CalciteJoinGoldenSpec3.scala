package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** CalciteJoinQueryTest golden tranche 3: lookup-on-lookup chains, unions
  * of joins, mismatched-type comma joins, and MV-filter join keys.
  * Conventions as the earlier join tranches: `lookup.` prefix dropped,
  * Druid's two-valued `<>` spelled `NOT (x <=> v)`, lenient numeric key
  * coercion spelled TRY_CAST. Expected rows are sql-compatible values.
  */
class CalciteJoinGoldenSpec3 extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val foo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   Option(Seq("a", "b")), 1.0f, 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], Option(Seq("b", "c")), 2.0f, 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    Option(Seq("d")), 3.0f, 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   Option(Seq("")),  4.0f, 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), None: Option[Seq[String]], 5.0f, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], None: Option[Seq[String]], 6.0f, 1L)
  ).toDF("__time", "dim1", "dim2", "dim3", "m1", "cnt")

  private lazy val lookyloo: DataFrame = Seq(
    ("a", "xa"), ("abc", "xabc"), ("nosuchkey", "mysteryvalue"), ("6", "x6")
  ).toDF("k", "v")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
    foo.createOrReplaceTempView("numfoo")
    lookyloo.createOrReplaceTempView("lookyloo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }
  private def os(r: Row, i: Int): Option[String] = Option(r.getString(i))

  // ---- subqueries of lookups ----

  test("testInnerJoinQueryOfLookup (CalciteJoinQueryTest.java) — grouped lookup subquery") {
    // the reference's LATEST over a lookup (no time column) takes the last
    // row per group; MAX picks the same values on this fixture and is the
    // deterministic spelling
    val out = sql(
      """SELECT dim1, dim2, t1.v, t1.v
        |FROM foo
        |INNER JOIN
        |  (SELECT SUBSTRING(k, 1, 1) k, MAX(v) v FROM lookyloo GROUP BY 1) t1
        |  ON foo.dim2 = t1.k ORDER BY 1""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(out == Seq(("", "a", "xabc", "xabc"), ("1", "a", "xabc", "xabc")))
  }

  test("testInnerJoinQueryOfLookupRemovable — projected lookup subquery") {
    val out = sql(
      """SELECT dim1, dim2, t1.sk
        |FROM foo
        |INNER JOIN (SELECT k, SUBSTRING(v, 1, 3) sk FROM lookyloo) t1
        |  ON foo.dim2 = t1.k ORDER BY 1""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(out == Seq(("", "a", "xa"), ("1", "a", "xa"), ("def", "abc", "xab")))
  }

  // ---- lookup-on-lookup chains ----

  test("testLeftJoinLookupOntoLookupUsingJoinOperator") {
    val out = sql(
      """SELECT dim2, l1.v, l2.v
        |FROM foo
        |LEFT JOIN lookyloo l1 ON foo.dim2 = l1.k
        |LEFT JOIN lookyloo l2 ON l1.k = l2.k""".stripMargin)
      .map(r => (os(r, 0), os(r, 1), os(r, 2))).sortBy(_.toString).toSeq
    assert(out == Seq(
      (None, None, None), (None, None, None), (Some(""), None, None),
      (Some("a"), Some("xa"), Some("xa")), (Some("a"), Some("xa"), Some("xa")),
      (Some("abc"), Some("xabc"), Some("xabc"))))
  }

  test("testLeftJoinThreeLookupsUsingJoinOperator") {
    val out = sql(
      """SELECT dim1, dim2, l1.v, l2.v, l3.v
        |FROM foo
        |LEFT JOIN lookyloo l1 ON foo.dim1 = l1.k
        |LEFT JOIN lookyloo l2 ON foo.dim2 = l2.k
        |LEFT JOIN lookyloo l3 ON l2.k = l3.k
        |ORDER BY __time""".stripMargin)
      .map(r => (r.getString(0), os(r, 1), os(r, 2), os(r, 3), os(r, 4))).toSeq
    assert(out == Seq(
      ("", Some("a"), None, Some("xa"), Some("xa")),
      ("10.1", None, None, None, None),
      ("2", Some(""), None, None, None),
      ("1", Some("a"), None, Some("xa"), Some("xa")),
      ("def", Some("abc"), None, Some("xabc"), Some("xabc")),
      ("abc", None, Some("xabc"), None, None)))
  }

  test("testManyManyInnerJoinOnManyManyLookup — ten chained lookups") {
    val joins = (1 to 10).map(i => s"INNER JOIN lookyloo l$i ON foo.dim2 = l$i.k").mkString("\n")
    val out = sql(s"SELECT dim1 FROM foo\n$joins").map(_.getString(0)).toSet
    assert(out == Set("", "1", "def"))
  }

  // ---- unions of joins ----

  test("testUnionAllTwoQueriesBothQueriesAreJoin / LeftQueryIsJoin / RightQueryIsJoin") {
    val out = sql(
      """SELECT COUNT(*) FROM foo LEFT JOIN lookyloo ON foo.dim1 = lookyloo.k
        |UNION ALL
        |SELECT COUNT(*) FROM foo INNER JOIN lookyloo ON foo.dim1 = lookyloo.k""".stripMargin)
      .map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 6L))
    val mixed = sql(
      """SELECT COUNT(*) FROM foo INNER JOIN lookyloo ON foo.dim1 = lookyloo.k
        |UNION ALL SELECT SUM(cnt) FROM foo""".stripMargin)
      .map(_.getLong(0)).sorted.toSeq
    assert(mixed == Seq(1L, 6L))
  }

  test("testJoinUnionTablesOnLookup — two-valued <> keeps unmatched rows") {
    val out = sql(
      """SELECT lookyloo.v, COUNT(*)
        |FROM (SELECT dim2 FROM foo UNION ALL SELECT dim2 FROM numfoo) u
        |  LEFT JOIN lookyloo ON u.dim2 = lookyloo.k
        |WHERE NOT (lookyloo.v <=> 'xa')
        |GROUP BY lookyloo.v ORDER BY lookyloo.v NULLS FIRST""".stripMargin)
      .map(r => (os(r, 0), r.getLong(1))).toSeq
    assert(out == Seq((None, 6L), (Some("xabc"), 2L)))
  }

  // ---- mismatched types ----

  test("testCommaJoinTableLookupTableMismatchedTypes / WithoutComma — no numeric key equals cnt") {
    for (q <- Seq(
      """SELECT COUNT(*) FROM foo, lookyloo l, numfoo
        |WHERE foo.cnt = TRY_CAST(l.k AS BIGINT) AND TRY_CAST(l.k AS BIGINT) = numfoo.cnt""".stripMargin,
      """SELECT COUNT(*) FROM foo
        |INNER JOIN lookyloo l ON foo.cnt = TRY_CAST(l.k AS BIGINT)
        |INNER JOIN numfoo ON TRY_CAST(l.k AS BIGINT) = numfoo.cnt""".stripMargin)) {
      assert(single(q).getLong(0) == 0L)
    }
  }

  test("testJoinOnConstantShouldFail — SUPERSET: constant-false join plans to empty here") {
    // the reference rejects ("unsupported operand types"); Catalyst folds
    // the constant and returns the empty result
    assert(sql("SELECT foo.dim1 FROM foo INNER JOIN lookyloo l ON 1 = 2").isEmpty)
  }

  test("testInnerJoinTableLookupLookupWithFilterWithOuterLimit / WithoutLimit / WithAllColumns") {
    for (limit <- Seq("LIMIT 100", "")) {
      val out = sql(
        s"""SELECT dim1
           |FROM foo
           |INNER JOIN lookyloo l ON foo.dim2 = l.k
           |INNER JOIN lookyloo l2 ON foo.dim2 = l2.k
           |WHERE l.v = 'xa'
           |ORDER BY 1 $limit""".stripMargin).map(_.getString(0)).toSeq
      assert(out == Seq("", "1"))
    }
    val all = sql(
      """SELECT __time, dim1, dim2, m1
        |FROM foo
        |INNER JOIN lookyloo l ON foo.dim2 = l.k
        |INNER JOIN lookyloo l2 ON foo.dim2 = l2.k
        |WHERE l.v = 'xa' ORDER BY 1""".stripMargin)
      .map(r => (r.getString(1), r.getString(2), r.getFloat(3))).toSeq
    assert(all == Seq(("", "a", 1.0f), ("1", "a", 4.0f)))
  }

  test("testCountDistinctOfLookupUsingJoinOperator — unmatched rows add no distinct value") {
    assert(single(
      "SELECT COUNT(DISTINCT lookyloo.v) FROM foo LEFT JOIN lookyloo ON foo.dim1 = lookyloo.k")
      .getLong(0) == 1L)
  }

  test("testUsingSubqueryWithExtractionFns") {
    val out = sql(
      """SELECT dim2, COUNT(*) FROM foo
        |WHERE substring(dim2, 1, 1) IN (SELECT substring(dim1, 1, 1) FROM foo WHERE dim1 <> '')
        |GROUP BY dim2 ORDER BY 1""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 2L), ("abc", 1L)))
  }

  test("testJoinOnGroupByInsteadOfTimeseriesWithFloorOnTime — tuple IN over hour floor") {
    // CAST(timestamp AS BIGINT) is seconds in Spark, millis in Druid —
    // TIMESTAMP_TO_MILLIS is the parity spelling on both sides of the IN
    val out = sql(
      """SELECT TIMESTAMP_TO_MILLIS(__time), m1, dim3 FROM foo
        |WHERE (TIMESTAMP_TO_MILLIS(TIME_FLOOR(__time, 'PT1H')), m1) IN
        |   (
        |     SELECT TIMESTAMP_TO_MILLIS(TIME_FLOOR(__time, 'PT1H')) + 0 AS t1, MIN(m1) AS t2 FROM foo
        |     WHERE array_contains(dim3, 'b')
        |         AND __time BETWEEN '1994-04-29 00:00:00' AND '2020-01-11 00:00:00' GROUP BY 1
        |    ) ORDER BY 1""".stripMargin)
      .map(r => (r.getLong(0), r.getFloat(1), r.getSeq[String](2).toList)).toSeq
    assert(out == Seq(
      (946684800000L, 1.0f, List("a", "b")),
      (946771200000L, 2.0f, List("b", "c"))))
  }

  // ---- MV-filter join keys ----

  test("testVirtualColumnOnMVFilterJoinExpression / MultiJoinExpression") {
    val out = sql(
      """SELECT foo1.dim3, foo2.dim3 FROM numfoo foo1 INNER JOIN numfoo foo2
        |ON MV_FILTER_ONLY(foo1.dim3, ARRAY('a')) = MV_FILTER_ONLY(foo2.dim3, ARRAY('a'))""".stripMargin)
    assert(out.length == 1 &&
      out.head.getSeq[String](0) == Seq("a", "b") && out.head.getSeq[String](1) == Seq("a", "b"))
    val nested = sql(
      """SELECT foo1.dim3, foo2.dim3 FROM numfoo foo1 INNER JOIN
        |(SELECT foo3.dim3 FROM numfoo foo3 INNER JOIN numfoo foo4
        |   ON MV_FILTER_ONLY(foo3.dim3, ARRAY('a')) = MV_FILTER_ONLY(foo4.dim3, ARRAY('a'))) foo2
        |ON MV_FILTER_ONLY(foo1.dim3, ARRAY('a')) = MV_FILTER_ONLY(foo2.dim3, ARRAY('a'))""".stripMargin)
    assert(nested.length == 1 && nested.head.getSeq[String](0) == Seq("a", "b"))
  }
}
