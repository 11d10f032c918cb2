package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** Round-6 CalciteQueryTest golden tranche #3: groupBy shapes (ordinals,
  * aliases, numeric dims, empty matches, filtered-aggregator defaults),
  * count-distinct arithmetic and subquery pushdown, string-as-number
  * coercion, and time filters. Same fixture and porting rules as
  * CalciteNullsAndHavingGoldenSpec (sql-compatible null mode; Druid's
  * null-on-malformed numeric coercion spelled TRY_CAST, its null-matching
  * not-selector spelled null-safe inequality, integer division spelled
  * DIV, FLOOR(__time TO unit) spelled date_trunc). */
class CalciteFiltersAndGroupingGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val numfoo: DataFrame = {
    val rows = Seq(
      (ts("2000-01-01 00:00:00"), "",     "a",  "a", 1.0f, 1.0,
        Some(1.0), None: Option[Double], Some(1.0f), None: Option[Float], Some(7L), None: Option[Long], 1L),
      (ts("2000-01-02 00:00:00"), "10.1", null, "a", 2.0f, 2.0,
        Some(1.7), Some(1.7), Some(0.1f), Some(0.1f), Some(325323L), Some(325323L), 1L),
      (ts("2000-01-03 00:00:00"), "2",    "",   "a", 3.0f, 3.0,
        Some(0.0), Some(0.0), Some(0.0f), Some(0.0f), Some(0L), Some(0L), 1L),
      (ts("2001-01-01 00:00:00"), "1",    "a",  "b", 4.0f, 4.0,
        None, None, None, None, None, None, 1L),
      (ts("2001-01-02 00:00:00"), "def",  "abc", "b", 5.0f, 5.0,
        None, None, None, None, None, None, 1L),
      (ts("2001-01-03 00:00:00"), "abc",  null, "b", 6.0f, 6.0,
        None, None, None, None, None, None, 1L))
    rows.toDF("__time", "dim1", "dim2", "dim4", "m1", "m2",
      "d1", "d2", "f1", "f2", "l1", "l2", "cnt")
  }

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    numfoo.createOrReplaceTempView("numfoo")
    numfoo.createOrReplaceTempView("foo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }

  // ---- groupBy shapes ----

  test("testGroupByWithSelectProjections (CalciteQueryTest.java:2367; Druid substring is " +
      "null-on-empty → NULLIF)") {
    val out = sql("SELECT dim1, NULLIF(SUBSTRING(dim1, 2), '') FROM foo GROUP BY dim1")
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(out == Set(("", None), ("1", None), ("10.1", Some("0.1")),
      ("2", None), ("abc", Some("bc")), ("def", Some("ef"))))
  }

  test("testGroupByAndOrderByAlias / testGroupByOrdinal (:2400s, :7000s)") {
    val r1 = single("SELECT cnt AS theCnt, COUNT(*) FROM foo GROUP BY theCnt ORDER BY theCnt ASC")
    assert((r1.getLong(0), r1.getLong(1)) == ((1L, 6L)))
    val r2 = single("SELECT cnt, COUNT(*) FROM foo GROUP BY 1")
    assert((r2.getLong(0), r2.getLong(1)) == ((1L, 6L)))
  }

  test("testGroupByLimitWrapping — descending dim order trims under the limit") {
    val out = sql("SELECT dim1, dim2, COUNT(*) FROM foo GROUP BY dim1, dim2 ORDER BY dim1 DESC LIMIT 2")
      .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2))).toSeq
    assert(out == Seq(("def", Some("abc"), 1L), ("abc", None, 1L)))
  }

  test("testGroupByDouble / testGroupByFloat / testGroupByLong") {
    val d = sql("SELECT m2, COUNT(*) FROM foo GROUP BY m2").map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(d == (1 to 6).map(i => (i.toDouble, 1L)).toSet)
    val f = sql("SELECT m1, COUNT(*) FROM foo GROUP BY m1").map(r => (r.getFloat(0), r.getLong(1))).toSet
    assert(f == (1 to 6).map(i => (i.toFloat, 1L)).toSet)
    val l = single("SELECT cnt, COUNT(*) FROM foo GROUP BY cnt")
    assert((l.getLong(0), l.getLong(1)) == ((1L, 6L)))
  }

  test("testGroupByWithFilterMatchingNothing — empty global agg yields 0 count, null max") {
    val r = single("SELECT COUNT(*), MAX(cnt) FROM foo WHERE dim1 = 'foobar'")
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("testGroupByAggregatorDefaultValues — filtered aggs over an empty slice, sql null mode") {
    val r = single(
      """SELECT dim2,
        | count(*) FILTER(WHERE dim1 = 'nonexistent'),
        | COUNT(DISTINCT dim1) FILTER(WHERE dim1 = 'nonexistent'),
        | sum(d1) FILTER(WHERE dim1 = 'nonexistent'),
        | max(d1) FILTER(WHERE dim1 = 'nonexistent'),
        | min(d1) FILTER(WHERE dim1 = 'nonexistent'),
        | sum(l1) FILTER(WHERE dim1 = 'nonexistent'),
        | max(l1) FILTER(WHERE dim1 = 'nonexistent'),
        | avg(l1) FILTER(WHERE dim1 = 'nonexistent'),
        | avg(d1) FILTER(WHERE dim1 = 'nonexistent')
        |FROM numfoo WHERE dim2 = 'a' GROUP BY dim2""".stripMargin)
    assert(r.getString(0) == "a")
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
    (3 to 9).foreach(i => assert(r.isNullAt(i), s"col $i"))
  }

  // ---- count distinct ----

  test("testCountDistinctArithmetic (:7440s; Druid long/long → DIV)") {
    val r = single(
      """SELECT SUM(cnt), COUNT(DISTINCT dim2), CAST(COUNT(DISTINCT dim2) AS FLOAT),
        |  SUM(cnt) DIV COUNT(DISTINCT dim2),
        |  SUM(cnt) DIV COUNT(DISTINCT dim2) + 3,
        |  CAST(SUM(cnt) AS FLOAT) / CAST(COUNT(DISTINCT dim2) AS FLOAT) + 3
        |FROM foo""".stripMargin)
    assert((r.getLong(0), r.getLong(1), r.getFloat(2)) == ((6L, 3L, 3.0f)))
    // Spark's float/float division widens to double; the value is the same
    assert((r.getLong(3), r.getLong(4), r.getDouble(5)) == ((2L, 5L, 5.0d)))
  }

  test("testExactCountDistinctUsingSubqueryWithWherePushDown (:6700s) — the planned " +
      "not-selector matches null groups (null-safe spelling), IS NOT NULL does not") {
    val r1 = single(
      """SELECT SUM(cnt), COUNT(*)
        |FROM (SELECT dim2, SUM(cnt) AS cnt FROM foo GROUP BY dim2)
        |WHERE NOT dim2 <=> ''""".stripMargin)
    assert((r1.getLong(0), r1.getLong(1)) == ((5L, 3L)))
    val r2 = single(
      """SELECT SUM(cnt), COUNT(*)
        |FROM (SELECT dim2, SUM(cnt) AS cnt FROM foo GROUP BY dim2)
        |WHERE dim2 IS NOT NULL""".stripMargin)
    assert((r2.getLong(0), r2.getLong(1)) == ((4L, 3L)))
  }

  // ---- string-as-number coercion ----

  test("testSumOfString (:5902; Druid's string→number is truncating null-on-malformed " +
      "→ CAST(TRY_CAST AS ...))") {
    assert(single("SELECT SUM(CAST(TRY_CAST(dim1 AS DOUBLE) AS INTEGER)) FROM foo").getLong(0) == 13L)
  }

  test("testFilterOnStringAsNumber (:4480)") {
    val out = sql(
      """SELECT distinct dim1 FROM foo WHERE TRY_CAST(dim1 AS FLOAT) = 10 OR
        |(floor(TRY_CAST(dim1 AS FLOAT)) = 10.00 AND TRY_CAST(dim1 AS FLOAT) > 9
        | AND TRY_CAST(dim1 AS FLOAT) <= 10.5)""".stripMargin).map(_.getString(0))
    assert(out.toSeq == Seq("10.1"))
  }

  test("testInFilterWith23Elements (:4700s)") {
    val elements = (0 until 21).map(i => s"'dummy$i'") ++ Seq("'abc'", "'def'")
    val out = sql(s"SELECT dim1, COUNT(*) FROM foo WHERE dim1 IN (${elements.mkString(", ")}) GROUP BY dim1")
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("abc", 1L), ("def", 1L)))
  }

  test("testDoublePredicateFilterNulls / Float / Long (:3500s) — null rows never match") {
    assert(single("SELECT COUNT(*) FROM numfoo WHERE d1 > 0").getLong(0) == 2L)
    assert(single("SELECT COUNT(*) FROM numfoo WHERE f1 > 0").getLong(0) == 2L)
    assert(single("SELECT COUNT(*) FROM numfoo WHERE l1 > 3").getLong(0) == 2L)
  }

  // ---- time filters ----

  test("testCountStarWithTimeFilterUsingStringLiterals (:5544)") {
    assert(single(
      """SELECT COUNT(*) FROM foo
        |WHERE __time >= '2000-01-01 00:00:00' AND __time < '2001-01-01T00:00:00'
        |OR __time >= '2001-02-01' AND __time < '2001-02-02'
        |OR __time BETWEEN '2001-03-01' AND '2001-03-02'""".stripMargin).getLong(0) == 3L)
  }

  test("testFilterOnTimeFloorComparison (:4900s; FLOOR(__time TO MONTH) spelled date_trunc)") {
    assert(single(
      """SELECT COUNT(*) FROM foo
        |WHERE date_trunc('MONTH', __time) < TIMESTAMP '2000-02-01 00:00:00'""".stripMargin)
      .getLong(0) == 3L)
  }

  test("testFilteredTimeAggregators (:5600s)") {
    val r = single(
      """SELECT
        |  SUM(cnt) FILTER(WHERE __time >= TIMESTAMP '2000-01-01 00:00:00'
        |                    AND __time <  TIMESTAMP '2000-02-01 00:00:00'),
        |  SUM(cnt) FILTER(WHERE __time >= TIMESTAMP '2000-01-01 00:00:01'
        |                    AND __time <  TIMESTAMP '2000-02-01 00:00:00'),
        |  SUM(cnt) FILTER(WHERE __time >= TIMESTAMP '2001-01-01 00:00:00'
        |                    AND __time <  TIMESTAMP '2001-02-01 00:00:00')
        |FROM foo
        |WHERE __time >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND __time < TIMESTAMP '2001-02-01 00:00:00'""".stripMargin)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 3L)))
  }
}
