package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** CalciteQueryTest golden tranche: filter simplification, time filters on
  * long columns, numeric-dimension predicates, and lookup null handling.
  * Conventions: Druid's two-valued NOT-selector (null never matches, NOT
  * always inverts) is spelled with null-safe `<=>` equality; Druid's
  * lenient numeric coercion of string dims is TRY_CAST; the reference's
  * frozen test clock (2000-01-01T00Z) replaces CURRENT_TIMESTAMP inline.
  * Expected rows are sql-compatible-null-mode values.
  */
class CalciteFilterTimeGoldenSpec extends SparkSpecBase {
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

  private lazy val numfoo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     "1", Some(1.0), Some(1.0f), Some(7L)),
    (ts("2000-01-02 00:00:00"), "10.1", "2", Some(1.7), Some(0.1f), Some(325323L)),
    (ts("2000-01-03 00:00:00"), "2",    "3", Some(0.0), Some(0.0f), Some(0L)),
    (ts("2001-01-01 00:00:00"), "1",    "4", None: Option[Double], None: Option[Float], None: Option[Long]),
    (ts("2001-01-02 00:00:00"), "def",  "5", None: Option[Double], None: Option[Float], None: Option[Long]),
    (ts("2001-01-03 00:00:00"), "abc",  "6", None: Option[Double], None: Option[Float], None: Option[Long])
  ).toDF("__time", "dim1", "dim6", "d1", "f1", "l1")

  private lazy val lookyloo: DataFrame = Seq(
    ("a", "xa"), ("abc", "xabc"), ("nosuchkey", "mysteryvalue"), ("6", "x6")
  ).toDF("k", "v")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
    numfoo.createOrReplaceTempView("numfoo")
    lookyloo.createOrReplaceTempView("lookyloo")
    graft.sources.LookupRegistry.global.register("lookyloo", lookyloo)
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def count(q: String): Long = { val r = sql(q); assert(r.length == 1); r.head.getLong(0) }

  // ---- filter simplification ----

  test("testCountStarWithBoundFilterSimplifyAnd (CalciteQueryTest.java)") {
    assert(count(
      "SELECT COUNT(*) FROM foo WHERE (dim1 >= 'a' AND dim1 < 'b') AND dim1 = 'abc'") == 1L)
  }

  test("testCountStarWithLongColumnFiltersOnTwoPoints") {
    assert(count("SELECT COUNT(*) FROM foo WHERE cnt = 1 OR cnt = 2") == 6L)
  }

  test("testSelectDistinctWithStrlenFilter-like float coercion — dim1 = 10 OR floor bound") {
    // Druid coerces the string dim leniently; TRY_CAST is the ANSI spelling
    val out = sql(
      """SELECT DISTINCT dim1 FROM foo WHERE
        |TRY_CAST(dim1 AS FLOAT) = 10 OR
        |(floor(TRY_CAST(dim1 AS FLOAT)) = 10.00 AND TRY_CAST(dim1 AS FLOAT) > 9 AND TRY_CAST(dim1 AS FLOAT) <= 10.5)""".stripMargin)
    assert(out.map(_.getString(0)).toSeq == Seq("10.1"))
  }

  test("testCountStarWithNotOfComplexDisjointTimeFilter — two-valued NOT via <=>") {
    assert(count(
      """SELECT COUNT(*) FROM foo
        |WHERE NOT ((dim2 <=> 'a') AND (
        |    (__time >= TIMESTAMP '2000-01-01 00:00:00' AND __time < TIMESTAMP '2001-01-01 00:00:00')
        |    OR (
        |      (__time >= TIMESTAMP '2002-01-01 00:00:00' AND __time < TIMESTAMP '2004-01-01 00:00:00')
        |      AND (__time >= TIMESTAMP '2002-05-01 00:00:00' AND __time < TIMESTAMP '2003-05-01 00:00:00')
        |      AND dim1 = 'abc')))""".stripMargin) == 5L)
  }

  test("testCountStarWithTimeOrDimFilter — two-valued <> via <=>") {
    assert(count(
      """SELECT COUNT(*) FROM foo
        |WHERE NOT (dim2 <=> 'a')
        |OR __time BETWEEN TIMESTAMP '2000-01-01 00:00:00' AND TIMESTAMP '2000-12-31 23:59:59.999'""".stripMargin) == 5L)
  }

  // ---- time filters on long columns ----

  test("testCountStarWithTimeFilterOnLongColumnUsingExtractEpochFromDate — UNIX_SECONDS spelling") {
    // Spark has no EXTRACT(EPOCH ...); UNIX_SECONDS over the cast date is
    // the same millis arithmetic
    assert(count(
      """SELECT COUNT(*) FROM foo WHERE
        |cnt >= UNIX_SECONDS(CAST(DATE '1970-01-01' AS TIMESTAMP)) * 1000
        |AND cnt < UNIX_SECONDS(CAST(DATE '1970-01-02' AS TIMESTAMP)) * 1000""".stripMargin) == 6L)
  }

  test("testCountStarWithTimeFilterOnLongColumnUsingTimestampToMillis") {
    assert(count(
      """SELECT COUNT(*) FROM foo WHERE
        |cnt >= TIMESTAMP_TO_MILLIS(TIMESTAMP '1970-01-01 00:00:00')
        |AND cnt < TIMESTAMP_TO_MILLIS(TIMESTAMP '1970-01-02 00:00:00')""".stripMargin) == 6L)
  }

  test("testFilterOnCurrentTimestampWithIntervalArithmetic — frozen clock 2000-01-01") {
    assert(count(
      """SELECT COUNT(*) FROM foo
        |WHERE
        |  __time >= TIMESTAMP '2000-01-01 00:00:00' + INTERVAL '01:02' HOUR TO MINUTE
        |  AND __time < TIMESTAMP '2003-02-02 01:00:00' - INTERVAL '1 1' DAY TO HOUR - INTERVAL '1-1' YEAR TO MONTH""".stripMargin) == 5L)
  }

  test("testGroupByWithImpossibleTimeFilter — non-midnight day floor matches nothing") {
    assert(sql(
      """SELECT dim1, COUNT(*) FROM foo
        |WHERE DATE_TRUNC('DAY', __time) = TIMESTAMP '2000-01-02 01:00:00'
        |OR DATE_TRUNC('DAY', __time) = TIMESTAMP '2000-01-02 02:00:00'
        |GROUP BY 1""".stripMargin).isEmpty)
    assert(sql("SELECT COUNT(*), MAX(cnt) FROM foo WHERE 1 = 0 GROUP BY dim1").isEmpty)
  }

  // ---- numeric-dimension predicates ----

  test("testFilterDoubleDimension / testFilterLongDimension") {
    assert(sql("SELECT dim1 FROM numfoo WHERE d1 = 1.7 LIMIT 1").head.getString(0) == "10.1")
    assert(sql("SELECT dim1 FROM numfoo WHERE l1 = 7 LIMIT 1").head.getString(0) == "")
  }

  test("testFloatPredicateFilterNulls — nulls never match > 0") {
    assert(count("SELECT COUNT(*) FROM numfoo WHERE f1 > 0") == 2L)
  }

  test("testHighestMaxNumericInFilter / testQueryWithMoreThanMaxNumericInFilter — numeric IN over string dim") {
    // result parity for the uncapped query; the cap itself
    // (PlannerChecks.requireMaxNumericInFilters) is exercised through the
    // facade in CalcitePlannerConfigGoldenSpec
    assert(count("SELECT COUNT(*) FROM numfoo WHERE dim6 IN (1, 2, 3)") == 3L)
  }

  // ---- lookups ----

  test("testLookupWithNull — null keys map to null") {
    val out = sql("SELECT dim2, LOOKUP(dim2, 'lookyloo') FROM foo WHERE dim2 IS NULL")
    assert(out.length == 2 && out.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("testGroupByExpressionFromLookup") {
    val out = sql("SELECT SUBSTRING(v, 1, 1), COUNT(*) FROM lookyloo GROUP BY 1 ORDER BY 1")
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("m", 1L), ("x", 3L)))
  }
}
