package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** Round-6 golden tranche: CalciteQueryTest.java time+dimension filter
  * clusters (:5633-:5790, :8070-:8160, :11907-:11970) — complex disjoint
  * time intervals and their negations, time-AND/OR-dimension mixes with
  * Druid's null-matching not-selector (spelled null-safely), extract-based
  * day filters, misaligned floor comparisons, and exact numeric dimension
  * filters (a float literal comparison spells CAST AS FLOAT — Spark
  * promotes float columns to double against decimal literals, Druid
  * compares in the column's type). */
class CalciteTimeDimFilterGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val numfoo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   1.0f, 1.0,
      Option(1.0), Option(1.0f), Option(7L), 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], 2.0f, 2.0,
      Option(1.7), Option(0.1f), Option(325323L), 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    3.0f, 3.0,
      Option(0.0), Option(0.0f), Option(0L), 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   4.0f, 4.0,
      None: Option[Double], None: Option[Float], None: Option[Long], 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), 5.0f, 5.0,
      None, None, None, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], 6.0f, 6.0,
      None, None, None, 1L))
    .toDF("__time", "dim1", "dim2", "m1", "m2", "d1", "f1", "l1", "cnt")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    numfoo.createOrReplaceTempView("numfoo")
    numfoo.createOrReplaceTempView("foo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }

  test("testCountStarWithComplexDisjointTimeFilter / NotOf (CalciteQueryTest.java:5633, :5673)") {
    assert(single(
      """SELECT COUNT(*) FROM foo WHERE dim2 = 'a' and (
        |  (__time >= TIMESTAMP '2000-01-01 00:00:00' AND __time < TIMESTAMP '2001-01-01 00:00:00')
        |  OR (
        |    (__time >= TIMESTAMP '2002-01-01 00:00:00' AND __time < TIMESTAMP '2003-05-01 00:00:00')
        |    and (__time >= TIMESTAMP '2002-05-01 00:00:00' AND __time < TIMESTAMP '2004-01-01 00:00:00')
        |    and dim1 = 'abc'))""".stripMargin).getLong(0) == 1L)
    assert(single(
      """SELECT COUNT(*) FROM foo WHERE not (dim2 <=> 'a' and (
        |    (__time >= TIMESTAMP '2000-01-01 00:00:00' AND __time < TIMESTAMP '2001-01-01 00:00:00')
        |    OR (
        |      (__time >= TIMESTAMP '2002-01-01 00:00:00' AND __time < TIMESTAMP '2004-01-01 00:00:00')
        |      and (__time >= TIMESTAMP '2002-05-01 00:00:00' AND __time < TIMESTAMP '2003-05-01 00:00:00')
        |      and dim1 = 'abc')))""".stripMargin).getLong(0) == 5L)
  }

  test("testCountStarWithNotTimeFilter (:5714)") {
    assert(single(
      """SELECT COUNT(*) FROM foo WHERE dim1 <> 'xxx' and not (
        |    (__time >= TIMESTAMP '2000-01-01 00:00:00' AND __time < TIMESTAMP '2001-01-01 00:00:00')
        |    OR (__time >= TIMESTAMP '2003-01-01 00:00:00' AND __time < TIMESTAMP '2004-01-01 00:00:00'))""".stripMargin)
      .getLong(0) == 3L)
  }

  test("testCountStarWithTimeAndDimFilter / TimeOrDimFilter — not-selector matches nulls " +
      "(:5744, :5767)") {
    assert(single(
      """SELECT COUNT(*) FROM foo WHERE NOT dim2 <=> 'a'
        |and __time BETWEEN TIMESTAMP '2000-01-01 00:00:00' AND TIMESTAMP '2000-12-31 23:59:59.999'""".stripMargin)
      .getLong(0) == 2L)
    assert(single(
      """SELECT COUNT(*) FROM foo WHERE NOT dim2 <=> 'a'
        |or __time BETWEEN TIMESTAMP '2000-01-01 00:00:00' AND TIMESTAMP '2000-12-31 23:59:59.999'""".stripMargin)
      .getLong(0) == 5L)
  }

  test("testFilterOnTimeExtractWithMultipleDays (:8127)") {
    assert(single(
      """SELECT COUNT(*) FROM foo
        |WHERE TIME_EXTRACT(__time, 'YEAR') = 2000
        |AND TIME_EXTRACT(__time, 'DAY') IN (2, 3, 5)""".stripMargin).getLong(0) == 2L)
  }

  test("testFilterOnTimeFloorComparisonMisaligned — misaligned bound still prunes (:8070)") {
    assert(single(
      """SELECT COUNT(*) FROM foo
        |WHERE TIME_FLOOR(__time, 'P1M') < TIMESTAMP '2000-02-01 00:00:01'""".stripMargin)
      .getLong(0) == 3L)
  }

  test("testFilterOnFloat / testFilterOnDouble (:1936, :1957)") {
    assert(single("SELECT COUNT(*) FROM foo WHERE m1 = 1.0").getLong(0) == 1L)
    assert(single("SELECT COUNT(*) FROM foo WHERE m2 = 1.0").getLong(0) == 1L)
  }

  test("testFilterFloatDimension / DoubleDimension / LongDimension (:11907, :11929, :11951)") {
    assert(single("SELECT dim1 FROM numfoo WHERE f1 = CAST(0.1 AS FLOAT) LIMIT 1")
      .getString(0) == "10.1")
    assert(single("SELECT dim1 FROM numfoo WHERE d1 = 1.7 LIMIT 1").getString(0) == "10.1")
    assert(single("SELECT dim1 FROM numfoo WHERE l1 = 7 LIMIT 1").getString(0) == "")
  }
}
