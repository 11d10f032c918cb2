package graft

import java.sql.Timestamp
import org.apache.spark.sql.{AnalysisException, DataFrame, Row}

/** CalciteJoinQueryTest golden tranche 4 — the remaining cases: lookup
  * filter pushdowns (matches-nothing / NOT / backwards RIGHT JOIN),
  * lookup-lookup double joins with all-column projections, mismatched-type
  * keys on both sides, function keys on the right, union-of-join branches,
  * topN over a broadcast dim table, inline-CTE self joins with outer
  * wheres and time filters, tuple-IN filter batteries, the IN-as-join
  * threshold plan, the MV-join analysis error, and the unoptimized-IN
  * native join (reference: sql/src/test/java/org/apache/druid/sql/calcite/
  * CalciteJoinQueryTest.java, cited per test).
  *
  * Conventions as the earlier join tranches: `lookup.`/`druid.` prefixes
  * dropped, Druid's two-valued `<>` spelled `NOT (x <=> v)`, lenient
  * numeric key coercion spelled TRY_CAST, Druid's partial-date timestamp
  * literal '1999' spelled as a full TIMESTAMP literal. Expected rows are
  * the reference's sql-compatible-mode values. The reference's
  * `unique_dim1` HLL column is outside this fixture, so the all-column
  * projections enumerate the fixture columns.
  */
class CalciteJoinGoldenSpec4 extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** CalciteTests.RAW_ROWS1 (util/CalciteTests.java:417): six rows, MV
    * dim3, float m1, double m2, cnt=1. */
  private lazy val foo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   Option(Seq("a", "b")), 1.0f, 1.0d, 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], Option(Seq("b", "c")), 2.0f, 2.0d, 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    Option(Seq("d")), 3.0f, 3.0d, 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   Option(Seq("")),  4.0f, 4.0d, 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), Option(Seq.empty[String]), 5.0f, 5.0d, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], None: Option[Seq[String]], 6.0f, 6.0d, 1L)
  ).toDF("__time", "dim1", "dim2", "dim3", "m1", "m2", "cnt")

  /** DATASOURCE3 adds dim4 (a,a,a,b,b,b) and the sparse long l1
    * (util/CalciteTests.java:366 LongDimensionSchema + RAW_ROWS1_WITH_NUMERIC_DIMS). */
  private lazy val numfoo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   "a", Option(7L),      1.0f, 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], "a", Option(325323L), 2.0f, 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    "a", Option(0L),      3.0f, 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   "b", None: Option[Long], 4.0f, 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), "b", None: Option[Long], 5.0f, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], "b", None: Option[Long], 6.0f, 1L)
  ).toDF("__time", "dim1", "dim2", "dim4", "l1", "m1", "cnt")

  private lazy val lookyloo: DataFrame = Seq(
    ("a", "xa"), ("abc", "xabc"), ("nosuchkey", "mysteryvalue"), ("6", "x6")
  ).toDF("k", "v")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
    numfoo.createOrReplaceTempView("numfoo")
    // the broadcast datasource replays numfoo (BROADCAST_DATASOURCE)
    numfoo.createOrReplaceTempView("broadcast")
    lookyloo.createOrReplaceTempView("lookyloo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def os(r: Row, i: Int): Option[String] = Option(r.getString(i))

  // ---- lookup filter pushdowns ----

  test("testFilterAndGroupByLookupUsingJoinOperatorWithValueFilterPushdownMatchesNothig (CalciteJoinQueryTest.java:594)") {
    val out = sql(
      """SELECT lookyloo.k, COUNT(*) c
        |FROM foo LEFT JOIN lookyloo ON foo.dim2 = lookyloo.k
        |WHERE lookyloo.v = '123'
        |GROUP BY lookyloo.k""".stripMargin)
    assert(out.isEmpty)
  }

  test("testFilterAndGroupByLookupUsingJoinOperatorBackwards (CalciteJoinQueryTest.java:670) — lookup RIGHT JOIN table") {
    val out = sql(
      """SELECT lookyloo.v, COUNT(*) c
        |FROM lookyloo RIGHT JOIN foo ON foo.dim2 = lookyloo.k
        |WHERE NOT (lookyloo.v <=> 'xa')
        |GROUP BY lookyloo.v""".stripMargin)
      .map(r => (os(r, 0), r.getLong(1))).sortBy(_.toString).toSeq
    assert(out == Seq((None, 3L), (Some("xabc"), 1L)))
  }

  test("testFilterAndGroupByLookupUsingJoinOperatorWithNotFilter (CalciteJoinQueryTest.java:718) — two-valued <>") {
    val out = sql(
      """SELECT lookyloo.v, COUNT(*) c
        |FROM foo LEFT JOIN lookyloo ON foo.dim2 = lookyloo.k
        |WHERE NOT (lookyloo.v <=> 'xa')
        |GROUP BY lookyloo.v""".stripMargin)
      .map(r => (os(r, 0), r.getLong(1))).sortBy(_.toString).toSeq
    assert(out == Seq((None, 3L), (Some("xabc"), 1L)))
  }

  // ---- double lookup joins ----

  test("testInnerJoinTableLookupLookupWithFilterWithoutLimit (CalciteJoinQueryTest.java:1049)") {
    val out = sql(
      """SELECT dim1
        |FROM foo
        |INNER JOIN lookyloo l ON foo.dim2 = l.k
        |INNER JOIN lookyloo l2 ON foo.dim2 = l2.k
        |WHERE l.v = 'xa' ORDER BY 1""".stripMargin).map(_.getString(0)).toSeq
    assert(out == Seq("", "1"))
  }

  test("testInnerJoinTableLookupLookupWithFilterWithoutLimitWithAllColumns (CalciteJoinQueryTest.java:1134) " +
    "+ testInnerJoinTableLookupLookupWithFilterWithOuterLimitWithAllColumns") {
    def check(rows: Array[Row]): Unit = {
      val out = rows.map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getSeq[String](4), r.getFloat(5), r.getDouble(6))).sortBy(_._3).toSeq
      assert(out == Seq(
        (ts("2000-01-01 00:00:00"), 1L, "", "a", Seq("a", "b"), 1.0f, 1.0d),
        (ts("2001-01-01 00:00:00"), 1L, "1", "a", Seq(""), 4.0f, 4.0d)))
    }
    val base =
      """SELECT __time, cnt, dim1, dim2, dim3, m1, m2
        |FROM foo
        |INNER JOIN lookyloo l ON foo.dim2 = l.k
        |INNER JOIN lookyloo l2 ON foo.dim2 = l2.k
        |WHERE l.v = 'xa'""".stripMargin
    check(sql(base))
    check(sql(base + "\nLIMIT 100"))
  }

  // ---- mismatched-type and function join keys ----

  test("testInnerJoinMismatchedTypes (CalciteJoinQueryTest.java:2055) — FLOAT key vs STRING key") {
    val out = sql(
      """SELECT foo.m1, l.k, l.v
        |FROM foo
        |INNER JOIN lookyloo l ON foo.m1 = TRY_CAST(l.k AS FLOAT)""".stripMargin)
      .map(r => (r.getFloat(0), r.getString(1), r.getString(2))).toSeq
    assert(out == Seq((6.0f, "6", "x6")))
  }

  test("testInnerJoinRightFunction (CalciteJoinQueryTest.java:2135) — SUBSTRING on the right key") {
    val out = sql(
      """SELECT foo.dim1, foo.dim2, l.k, l.v
        |FROM foo
        |INNER JOIN lookyloo l ON foo.dim2 = SUBSTRING(l.k, 1, 2)
        |ORDER BY 1""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(out == Seq(("", "a", "a", "xa"), ("1", "a", "a", "xa")))
  }

  test("testJoinTableLookupTableMismatchedTypesWithoutComma (CalciteJoinQueryTest.java:1910)") {
    val out = sql(
      """SELECT COUNT(*) c
        |FROM foo
        |INNER JOIN lookyloo l ON foo.cnt = TRY_CAST(l.k AS BIGINT)
        |INNER JOIN numfoo ON TRY_CAST(l.k AS BIGINT) = numfoo.cnt""".stripMargin)
    assert(out.map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("testInnerJoinLookupTableTableChained (CalciteJoinQueryTest.java:1695)") {
    val out = sql(
      """SELECT l.k, l.v, CAST(SUM(f.m1) AS DOUBLE) s1, CAST(SUM(nf.m1) AS DOUBLE) s2
        |FROM lookyloo l
        |INNER JOIN foo f ON f.dim1 = l.k
        |INNER JOIN numfoo nf ON nf.dim1 = f.dim1
        |GROUP BY 1, 2 ORDER BY 2""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(out == Seq(("abc", "xabc", 6.0d, 6.0d)))
  }

  // ---- join on an MV column is an analysis error ----

  test("testJoinOnMultiValuedColumnShouldThrowException (CalciteJoinQueryTest.java:3874)") {
    registered
    // array<string> key against a string key — the reference throws at plan
    // time (no results are planned for this query); Spark rejects the
    // mismatched equality in analysis
    intercept[AnalysisException] {
      spark.sql("SELECT dim3, l.v FROM foo f INNER JOIN lookyloo l ON f.dim3 = l.k").collect()
    }
  }

  // ---- self-join subquery aggregate ----

  test("testJoinOuterGroupByAndSubqueryNoLimit (CalciteJoinQueryTest.java:303)") {
    // the reference's join datasource prefixes right columns with j0., so
    // the outer dim2/m2 of its SELECT * resolve to the LEFT side; spelled
    // explicitly here since Spark keeps both sides' names
    val out = sql(
      """SELECT dim2, AVG(m2) a
        |FROM (SELECT t1.dim2, t1.m2 FROM foo t1 INNER JOIN foo t2 ON t1.m1 = t2.m1) t3
        |GROUP BY dim2""".stripMargin)
      .map(r => (os(r, 0), r.getDouble(1))).sortBy(_.toString).toSeq
    assert(out == Seq((None, 4.0d), (Some(""), 3.0d), (Some("a"), 2.5d), (Some("abc"), 5.0d)))
  }

  // ---- union branches that are joins ----

  test("testUnionAllTwoQueriesLeftQueryIsJoin (CalciteJoinQueryTest.java:3888) + testUnionAllTwoQueriesRightQueryIsJoin") {
    val left = sql(
      """(SELECT COUNT(*) c FROM foo INNER JOIN lookyloo ON foo.dim1 = lookyloo.k)
        |UNION ALL SELECT SUM(cnt) c FROM foo""".stripMargin)
      .map(_.getLong(0)).sorted.toSeq
    assert(left == Seq(1L, 6L))
    val right = sql(
      """SELECT SUM(cnt) c FROM foo
        |UNION ALL SELECT COUNT(*) c FROM foo INNER JOIN lookyloo ON foo.dim1 = lookyloo.k""".stripMargin)
      .map(_.getLong(0)).sorted.toSeq
    assert(right == Seq(1L, 6L))
  }

  // ---- topN over the broadcast datasource ----

  test("testTopNOnStringWithNonSortedOrUniqueDictionary (CalciteJoinQueryTest.java:4606)") {
    val out = sql(
      """SELECT broadcast.dim4 d, COUNT(*) c
        |FROM numfoo
        |INNER JOIN broadcast ON numfoo.dim4 = broadcast.dim4
        |GROUP BY 1 ORDER BY 2, 1 LIMIT 4""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 9L), ("b", 9L)))
  }

  test("testTopNOnStringWithNonSortedOrUniqueDictionaryOrderByDim (CalciteJoinQueryTest.java:4646)") {
    val out = sql(
      """SELECT broadcast.dim4 d, COUNT(*) c
        |FROM numfoo
        |INNER JOIN broadcast ON numfoo.dim4 = broadcast.dim4
        |GROUP BY 1 ORDER BY 1 DESC LIMIT 4""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("b", 9L), ("a", 9L)))
  }

  // ---- inline-CTE self joins (the *_withLeftDirectAccess variants run the
  // same SQL under a different planning context — same expected row) ----

  test("testInnerJoinOnTwoInlineDataSourcesWithOuterWhere (CalciteJoinQueryTest.java:2977) " +
    "+ testInnerJoinOnTwoInlineDataSourcesWithOuterWhere_withLeftDirectAccess + testInnerJoinOnTwoInlineDataSources_withLeftDirectAccess") {
    val out = sql(
      """WITH abc AS (SELECT dim1, __time, m1 FROM foo WHERE dim1 = '10.1')
        |SELECT t1.dim1, t1.__time
        |FROM abc t1 INNER JOIN abc t2 ON t1.dim1 = t2.dim1
        |WHERE t1.dim1 = '10.1'""".stripMargin)
      .map(r => (r.getString(0), r.getTimestamp(1))).toSeq
    assert(out == Seq(("10.1", ts("2000-01-02 00:00:00"))))
  }

  test("testLeftJoinOnTwoInlineDataSourcesWithOuterWhere (CalciteJoinQueryTest.java) " +
    "+ testLeftJoinOnTwoInlineDataSourcesWithOuterWhere_withLeftDirectAccess + testLeftJoinOnTwoInlineDataSources_withLeftDirectAccess") {
    val out = sql(
      """WITH abc AS (SELECT dim1, __time, m1 FROM foo WHERE dim1 = '10.1')
        |SELECT t1.dim1, t1.__time
        |FROM abc t1 LEFT JOIN abc t2 ON t1.dim1 = t2.dim1
        |WHERE t1.dim1 = '10.1'""".stripMargin)
      .map(r => (r.getString(0), r.getTimestamp(1))).toSeq
    assert(out == Seq(("10.1", ts("2000-01-02 00:00:00"))))
  }

  test("testLeftJoinOnTwoInlineDataSourcesWithTimeFilter (CalciteJoinQueryTest.java:2645) " +
    "+ testLeftJoinOnTwoInlineDataSourcesWithTimeFilter_withLeftDirectAccess — Druid's '1999' partial date as a full literal") {
    val out = sql(
      """WITH abc AS (SELECT dim1, __time, m1 FROM foo
        |             WHERE dim1 = '10.1' AND __time >= TIMESTAMP '1999-01-01 00:00:00')
        |SELECT t1.dim1, t1.__time
        |FROM abc t1 LEFT JOIN abc t2 ON t1.dim1 = t2.dim1
        |WHERE t1.dim1 = '10.1'""".stripMargin)
      .map(r => (r.getString(0), r.getTimestamp(1))).toSeq
    assert(out == Seq(("10.1", ts("2000-01-02 00:00:00"))))
  }

  // ---- tuple-IN filter batteries over a self join ----

  test("testInnerJoinWithFilterPushdownAndManyFiltersEmptyResults (CalciteJoinQueryTest.java:4807)") {
    val out = sql(
      """SELECT f1.m1, f2.m1
        |FROM foo f1
        |INNER JOIN foo f2 ON f1.m1 = f2.m1
        |WHERE (f1.dim1, f1.dim2) IN (('A','B'),('C','D'),('A','C'),('C','E'),('D','H'),('A','D'),('B','C'),
        |('H','E'),('I','J'),('I','K'),('J','I'),('Q','R'),('Q','S'),('S','Q'),('X','Y'),('Z','U'),('U','Z'),('P','Q'),('X','A'))""".stripMargin)
    assert(out.isEmpty)
  }

  test("testInnerJoinWithFilterPushdownAndManyFiltersNonEmptyResults (CalciteJoinQueryTest.java:4926)") {
    val out = sql(
      """SELECT f1.m1, f2.m1
        |FROM foo f1
        |INNER JOIN foo f2 ON f1.m1 = f2.m1
        |WHERE (f1.dim1, f1.dim2) IN (('1','a'),('C','D'),('A','C'),('C','E'),('D','H'),('A','D'),('B','C'),
        |('H','E'),('I','J'),('I','K'),('J','I'),('Q','R'),('Q','S'),('S','Q'),('X','Y'),('Z','U'),('U','Z'),('P','Q'),('X','A'))""".stripMargin)
      .map(r => (r.getFloat(0), r.getFloat(1))).toSeq
    assert(out == Seq((4.0f, 4.0f)))
  }

  test("testPlanWithInFilterMoreThanInSubQueryThreshold (CalciteJoinQueryTest.java:5051) — IN planned as a join") {
    // above the inSubQueryThreshold the reference rewrites the IN list to an
    // inline-datasource join; values and result set are identical either way
    val out = sql("SELECT l1 FROM numfoo WHERE l1 IN (4842, 4844, 4845, 14905, 4853, 29064)")
    assert(out.isEmpty)
    val present = sql("SELECT l1 FROM numfoo WHERE l1 IN (4842, 7, 325323, 14905)")
      .map(_.getLong(0)).sorted.toSeq
    assert(present == Seq(7L, 325323L))
  }

  // ---- unoptimized IN filter through the native join path ----

  test("testGroupByJoinAsNativeQueryWithUnoptimizedFilter (CalciteJoinQueryTest.java:4490)") {
    registered
    // the single-element IN arrives unoptimized (the SQL layer would have
    // collapsed it to a selector); the native path must apply it to the
    // join just the same
    val json =
      """{
        |  "queryType": "groupBy",
        |  "dataSource": {
        |    "type": "join",
        |    "left": {"type": "query", "query": {
        |      "queryType": "scan", "dataSource": "foo",
        |      "intervals": ["2001-01-02T00:00:00/9999-01-01T00:00:00"],
        |      "columns": ["dim1"]}},
        |    "right": {"type": "query", "query": {
        |      "queryType": "scan", "dataSource": "foo",
        |      "intervals": ["2001-01-02T00:00:00/9999-01-01T00:00:00"],
        |      "columns": ["dim1", "m2"]}},
        |    "rightPrefix": "j0.",
        |    "condition": "dim1 == dim1",
        |    "joinType": "INNER"
        |  },
        |  "granularity": "all",
        |  "filter": {"type": "in", "dimension": "dim1", "values": ["def"]},
        |  "virtualColumns": [{"type": "expression", "name": "v0", "expression": "'def'", "outputType": "STRING"}],
        |  "dimensions": [{"type": "default", "dimension": "v0", "outputName": "d0"}],
        |  "aggregations": []
        |}""".stripMargin
    val out = graft.operators.NativeQuery.run(spark, json, {
      case "foo" => foo
      case other => sys.error(s"unexpected table $other")
    })
    val rows = out.select("d0").collect().map(_.getString(0)).toSeq
    assert(rows == Seq("def"))
  }

  test("testInnerJoinOnMultiValueColumn (:2605) — DEVIATION: explicit unnest semantics") {
    registered
    // the reference's own MV-column join is documented as surprising
    // (docs/querying/datasource.md warns against joining on an MV column);
    // this engine makes the per-value semantics EXPLICIT with an unnest —
    // each dim3 element matches the lookup key independently. Of the foo
    // MV values (a,b | b,c | d | "") only 'a' has a lookyloo entry.
    val out = sql(
      """SELECT u.g, l.v, count(*) AS cnt
        |FROM (SELECT to_json(f.dim3) AS g, dim3v
        |      FROM foo f LATERAL VIEW explode(f.dim3) t AS dim3v) u
        |INNER JOIN lookyloo l ON u.dim3v = l.k
        |GROUP BY 1, 2""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("""["a","b"]""", "xa", 1L)))
  }

  test("testVirtualColumnOnMVFilterMultiJoinExpression (:4735) — MV_FILTER_ONLY join keys") {
    registered
    // three-way self join on MV_FILTER_ONLY(dim3, ['a']): only the row whose
    // filtered MV is non-empty (["a","b"] → ["a"]) joins; empty filter
    // results are null (testMultiValueListFilterComposed) and null keys
    // never match
    val out = sql(
      """SELECT to_json(foo1.dim3) AS a, to_json(foo2.dim3) AS b FROM foo AS foo1 INNER JOIN
        |(SELECT foo3.dim3 FROM foo AS foo3 INNER JOIN foo AS foo4
        |   ON MV_FILTER_ONLY(foo3.dim3, ARRAY('a')) = MV_FILTER_ONLY(foo4.dim3, ARRAY('a'))) AS foo2
        |ON MV_FILTER_ONLY(foo1.dim3, ARRAY('a')) = MV_FILTER_ONLY(foo2.dim3, ARRAY('a'))""".stripMargin)
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("""["a","b"]""", """["a","b"]""")))
  }
}
