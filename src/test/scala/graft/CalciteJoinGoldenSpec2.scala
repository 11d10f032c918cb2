package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** CalciteJoinQueryTest golden tranche 2 (reference: sql/src/test/.../calcite/
  * CalciteJoinQueryTest.java): lookup↔table chains, inline-datasource (CTE)
  * joins, subquery-filter joins, removable joins, and topN-over-join shapes.
  * Porting rules follow CalciteJoinGoldenSpec: verbatim SQL where Spark
  * parses it; `lookup.lookyloo`/`druid.foo` schema prefixes dropped;
  * `"__time"` double quotes become backticks; Druid's lenient key cast is
  * spelled TRY_CAST in this ANSI session. Expected rows are the reference's
  * sql-compatible-null-mode values.
  */
class CalciteJoinGoldenSpec2 extends SparkSpecBase {
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

  // RAW_ROWS1_WITH_NUMERIC_DIMS (CalciteTests.java:530-611) — the columns
  // this tranche touches (dim4/dim5/dim6 plus the shared core)
  private lazy val numfoo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   "a", "aa", "1", 1.0f, 1.0, 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], "a", "ab", "2", 2.0f, 2.0, 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    "a", "ba", "3", 3.0f, 3.0, 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   "b", "ad", "4", 4.0f, 4.0, 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), "b", "aa", "5", 5.0f, 5.0, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], "b", "ab", "6", 6.0f, 6.0, 1L)
  ).toDF("__time", "dim1", "dim2", "dim4", "dim5", "dim6", "m1", "m2", "cnt")

  private lazy val lookyloo: DataFrame = Seq(
    ("a", "xa"), ("abc", "xabc"), ("nosuchkey", "mysteryvalue"), ("6", "x6")
  ).toDF("k", "v")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
    numfoo.createOrReplaceTempView("numfoo")
    lookyloo.createOrReplaceTempView("lookyloo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }
  private def os(r: Row, i: Int): Option[String] = Option(r.getString(i))

  // ---- lookup ↔ table chains ----

  test("testInnerJoinTwoLookupsToTableUsingNumericColumn (CalciteJoinQueryTest.java:1495)") {
    // Druid CASTs the lookup key to DOUBLE leniently; TRY_CAST is the
    // ANSI-session spelling (only k='6' parses and matches m1=6.0)
    assert(single(
      """SELECT COUNT(*) FROM foo
        |INNER JOIN lookyloo l1 ON TRY_CAST(l1.k AS DOUBLE) = foo.m1
        |INNER JOIN lookyloo l2 ON l2.k = l1.k""".stripMargin).getLong(0) == 1L)
  }

  test("testInnerJoinTwoLookupsToTableUsingNumericColumnInReverse (:1556)") {
    assert(single(
      """SELECT COUNT(*) FROM lookyloo l1
        |INNER JOIN lookyloo l2 ON l1.k = l2.k
        |INNER JOIN foo ON TRY_CAST(l2.k AS DOUBLE) = foo.m1""".stripMargin).getLong(0) == 1L)
  }

  test("testInnerJoinLookupTableTable / Chained (:1613, :1695)") {
    val r = single(
      """SELECT l.k, l.v, SUM(f.m1), SUM(nf.m1)
        |FROM lookyloo l
        |INNER JOIN foo f ON f.dim1 = l.k
        |INNER JOIN numfoo nf ON nf.dim1 = l.k
        |GROUP BY 1, 2 ORDER BY 2""".stripMargin)
    assert((r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)) ==
      (("abc", "xabc", 6.0, 6.0)))
    val c = single(
      """SELECT l.k, l.v, SUM(f.m1), SUM(nf.m1)
        |FROM lookyloo l
        |INNER JOIN foo f ON f.dim1 = l.k
        |INNER JOIN numfoo nf ON nf.dim1 = f.dim1
        |GROUP BY 1, 2 ORDER BY 2""".stripMargin)
    assert((c.getString(0), c.getString(1), c.getDouble(2), c.getDouble(3)) ==
      (("abc", "xabc", 6.0, 6.0)))
  }

  test("testWhereInSelectNullFromLookup — IN (NULL) matches nothing (:1775)") {
    assert(sql("SELECT * FROM foo WHERE dim1 IN (SELECT NULL FROM lookyloo)").isEmpty)
  }

  // ---- inline-datasource (CTE self-join) family ----

  test("testLeftJoinOnTwoInlineDataSources + WithOuterWhere + _withLeftDirectAccess (:2876, :2925, :2931)") {
    for (outerWhere <- Seq("", "WHERE t1.dim1 = '10.1'")) {
      val r = single(
        s"""WITH abc AS (
           |  SELECT dim1, `__time`, m1 FROM foo WHERE dim1 = '10.1'
           |)
           |SELECT t1.dim1, t1.`__time` FROM abc t1 LEFT JOIN abc t2 ON t1.dim1 = t2.dim1 $outerWhere""".stripMargin)
      assert((r.getString(0), r.getTimestamp(1)) == (("10.1", ts("2000-01-02 00:00:00"))))
    }
  }

  test("testInnerJoinOnTwoInlineDataSources + WithOuterWhere + _withLeftDirectAccess (:2977, :3031, :3080, :3133)") {
    for (outerWhere <- Seq("", "WHERE t1.dim1 = '10.1'")) {
      val r = single(
        s"""WITH abc AS (
           |  SELECT dim1, `__time`, m1 FROM foo WHERE dim1 = '10.1'
           |)
           |SELECT t1.dim1, t1.`__time` FROM abc t1 INNER JOIN abc t2 ON t1.dim1 = t2.dim1 $outerWhere""".stripMargin)
      assert((r.getString(0), r.getTimestamp(1)) == (("10.1", ts("2000-01-02 00:00:00"))))
    }
  }

  // ---- subquery-filter joins ----

  test("testLeftJoinSubqueryWithNullKeyFilter (:3280)") {
    val r = single(
      """SELECT dim1, l1.k
        |FROM foo
        |LEFT JOIN (SELECT k || '' AS k FROM lookyloo GROUP BY 1) l1 ON foo.dim1 = l1.k
        |WHERE l1.k IS NOT NULL""".stripMargin)
    assert((r.getString(0), r.getString(1)) == (("abc", "abc")))
  }

  test("testLeftJoinSubqueryWithSelectorFilter (:3363)") {
    val r = single(
      """SELECT dim1, l1.k
        |FROM foo
        |LEFT JOIN (SELECT k || '' AS k FROM lookyloo GROUP BY 1) l1 ON foo.dim1 = l1.k
        |WHERE l1.k = 'abc'""".stripMargin)
    assert((r.getString(0), r.getString(1)) == (("abc", "abc")))
  }

  test("testInnerJoinSubqueryWithSelectorFilter (:3462)") {
    val r = single(
      """SELECT dim1, l1.k
        |FROM foo INNER JOIN (SELECT k || '' AS k FROM lookyloo GROUP BY 1) l1
        |ON foo.dim1 = l1.k AND l1.k = 'abc'""".stripMargin)
    assert((r.getString(0), r.getString(1)) == (("abc", "abc")))
  }

  test("testLeftJoinWithNotNullFilter — self equi-join keeps all six (:3416)") {
    val out = sql(
      """SELECT s.dim1, t.dim1
        |FROM foo s
        |LEFT JOIN foo t ON s.dim1 = t.dim1 AND s.dim1 IS NOT NULL
        |ORDER BY 1""".stripMargin)
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("", ""), ("1", "1"), ("10.1", "10.1"), ("2", "2"),
      ("abc", "abc"), ("def", "def")))
  }

  // ---- semi/anti shapes ----

  test("testSemiJoinWithOuterTimeExtractScan (:3516)") {
    val r = single(
      """SELECT dim1, EXTRACT(MONTH FROM __time) FROM foo
        | WHERE dim2 IN (
        |   SELECT dim2 FROM foo WHERE dim1 = 'def'
        | ) AND dim1 <> ''""".stripMargin)
    // Spark EXTRACT yields INT where Druid yields BIGINT; value parity holds
    assert((r.getString(0), r.getInt(1)) == (("def", 1)))
  }

  test("testSemiJoinWithOuterTimeExtractAggregateWithOrderBy (:3792)") {
    val r = single(
      """SELECT COUNT(DISTINCT dim1), EXTRACT(MONTH FROM __time) FROM foo
        | WHERE dim2 IN (
        |   SELECT dim2 FROM foo WHERE dim1 = 'def'
        | ) AND dim1 <> ''
        |GROUP BY EXTRACT(MONTH FROM __time)
        |ORDER BY EXTRACT(MONTH FROM __time)""".stripMargin)
    assert((r.getLong(0), r.getInt(1)) == ((1L, 1)))
  }

  test("testSemiAndAntiJoinSimultaneouslyUsingExplicitJoins (:3729)") {
    val r = single(
      """SELECT dim1, COUNT(*) FROM foo
        |INNER JOIN (SELECT MAX(__time) t FROM foo) t0 ON t0.t = foo.__time
        |LEFT JOIN (SELECT MIN(__time) t FROM foo) t1 ON t1.t = foo.__time
        |WHERE dim1 IN ('abc', 'def') AND t1.t IS NULL
        |GROUP BY 1""".stripMargin)
    assert((r.getString(0), r.getLong(1)) == (("abc", 1L)))
  }

  test("testCountOnSemiJoinSingleColumn (:4565)") {
    assert(single(
      "SELECT dim1 FROM foo WHERE dim1 IN (SELECT dim1 FROM foo WHERE dim1 = '10.1')")
      .getString(0) == "10.1")
  }

  test("testUsingSubqueryAsPartOfAndFilter (:4260)") {
    val r = single(
      """SELECT dim1, dim2, COUNT(*) FROM foo
        |WHERE dim2 IN (SELECT dim1 FROM foo WHERE dim1 <> '')
        |AND dim1 <> 'xxx'
        |GROUP BY dim1, dim2 ORDER BY dim2""".stripMargin)
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("def", "abc", 1L)))
  }

  test("testUsingSubqueryAsPartOfOrFilter (:4323)") {
    val r = single(
      """SELECT dim1, dim2, COUNT(*) FROM foo
        |WHERE dim1 = 'xxx' OR dim2 IN (SELECT dim1 FROM foo WHERE dim1 LIKE '%bc')
        |GROUP BY dim1, dim2 ORDER BY dim2""".stripMargin)
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("def", "abc", 1L)))
  }

  // ---- topN / groupBy over join results ----

  test("testTopNFilterJoin — dim2 top-2 by summed cnt gates dim1 groups (:4016)") {
    val out = sql(
      """SELECT t1.dim1, SUM(t1.cnt)
        |FROM foo t1
        |  INNER JOIN (
        |  SELECT SUM(cnt) AS sum_cnt, dim2 FROM foo GROUP BY dim2
        |  ORDER BY 1 DESC LIMIT 2
        |) t2 ON (t1.dim2 = t2.dim2)
        |GROUP BY t1.dim1
        |ORDER BY 1""".stripMargin).map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("", 1L), ("1", 1L)))
  }

  test("testTopNFilterJoinWithProjection — DEVIATION: SUBSTRING('') is '' here, null in Druid (:4085)") {
    // Druid's substring over the empty string yields null; Spark keeps ''.
    // Both engines agree on the gating (rows with dim2='a') and counts.
    val out = sql(
      """SELECT SUBSTRING(t1.dim1, 1, 10), SUM(t1.cnt)
        |FROM foo t1
        |  INNER JOIN (
        |  SELECT SUM(cnt) AS sum_cnt, dim2 FROM foo GROUP BY dim2
        |  ORDER BY 1 DESC LIMIT 2
        |) t2 ON (t1.dim2 = t2.dim2)
        |GROUP BY SUBSTRING(t1.dim1, 1, 10)
        |ORDER BY 1""".stripMargin).map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("", 1L), ("1", 1L)))
  }

  test("testRemovableLeftJoin — unused right side drops out (:4164)") {
    val out = sql(
      """SELECT t1.dim1, SUM(t1.cnt)
        |FROM foo t1
        |  LEFT JOIN (
        |  SELECT SUM(cnt) AS sum_cnt, dim2 FROM foo GROUP BY dim2
        |  ORDER BY 1 DESC LIMIT 2
        |) t2 ON (t1.dim2 = t2.dim2)
        |GROUP BY t1.dim1
        |ORDER BY 1""".stripMargin).map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("", 1L), ("1", 1L), ("10.1", 1L), ("2", 1L), ("abc", 1L), ("def", 1L)))
  }

  test("testExactTopNOnInnerJoinWithLimit (:166)") {
    val r = single(
      """SELECT f1.dim4, SUM(m1) FROM numfoo f1 INNER JOIN (
        |  SELECT dim4 FROM numfoo WHERE dim4 <> 'a' GROUP BY 1
        |) f2 ON f1.dim4 = f2.dim4 GROUP BY 1 LIMIT 1""".stripMargin)
    assert((r.getString(0), r.getDouble(1)) == (("b", 15.0)))
  }

  test("testJoinOuterGroupByAndSubqueryHasLimit / NoLimit (:216, :303)") {
    // the reference's `SELECT *` self-join leaves two dim2/m2 copies and
    // Calcite resolves the bare outer references to the LEFT copy; Spark
    // rejects the ambiguity, so the left columns are projected explicitly
    for (limit <- Seq("LIMIT 10", "")) {
      val out = sql(
        s"""SELECT dim2, AVG(m2) FROM
           |(SELECT t1.dim2, t1.m2 FROM foo t1 INNER JOIN foo t2 ON t1.m1 = t2.m1 $limit) t3
           |GROUP BY dim2 ORDER BY dim2 NULLS FIRST""".stripMargin)
        .map(r => (os(r, 0), r.getDouble(1))).toSeq
      assert(out == Seq((None, 4.0), (Some(""), 3.0), (Some("a"), 2.5), (Some("abc"), 5.0)))
    }
  }

  test("testNestedGroupByOnInlineDataSourceWithFilter (:4413)") {
    assert(single(
      """WITH abc AS (
        |  SELECT dim1, m2 FROM foo WHERE `__time` >= '2001-01-02'
        |), def AS (
        |  SELECT t1.dim1, SUM(t2.m2) AS metricSum
        |  FROM abc t1 INNER JOIN abc t2 ON t1.dim1 = t2.dim1
        |  WHERE t1.dim1 = 'def'
        |  GROUP BY 1
        |)
        |SELECT COUNT(*) FROM def""".stripMargin).getLong(0) == 1L)
  }
}
