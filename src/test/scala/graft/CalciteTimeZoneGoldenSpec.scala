package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** Round-6 golden tranche: CalciteQueryTest.java timezone and time-filter
  * clusters — TIME_FLOOR/TIME_PARSE/TIME_EXTRACT with IANA zones and NULL
  * placeholders, the full TimestampExtractExprMacro unit surface
  * (MICROSECOND is epoch/1000, DECADE/CENTURY/MILLENNIUM are PostgreSQL
  * year arithmetic), and time filters over long (millis) columns.
  *
  * Spelling adaptations: FLOOR(__time TO unit) → TIME_FLOOR (Druid's
  * planner emits the same timestamp_floor), EXTRACT(unit FROM x) →
  * TIME_EXTRACT (Druid plans EXTRACT into timestamp_extract; Spark's
  * EXTRACT lacks EPOCH/DECADE/CENTURY/MILLENNIUM fields).
  *
  * Fixtures: foo = RAW_ROWS1 (CalciteTests.java:417); foo4 =
  * RAW_ROWS1_WITH_FULL_TIMESTAMP (CalciteTests.java:640 — two rows with
  * sub-second timestamps). */
class CalciteTimeZoneGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val foo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     "a",   1L),
    (ts("2000-01-02 00:00:00"), "10.1", null,  1L),
    (ts("2000-01-03 00:00:00"), "2",    "",    1L),
    (ts("2001-01-01 00:00:00"), "1",    "a",   1L),
    (ts("2001-01-02 00:00:00"), "def",  "abc", 1L),
    (ts("2001-01-03 00:00:00"), "abc",  null,  1L))
    .toDF("__time", "dim1", "dim2", "cnt")

  private lazy val foo4: DataFrame = Seq(
    (ts("2000-01-01 10:51:45.695"), "",     1L),
    (ts("2000-01-18 10:51:45.695"), "10.1", 1L))
    .toDF("__time", "dim1", "cnt")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
    foo4.createOrReplaceTempView("foo4")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }

  test("testGroupAndFilterOnTimeFloorWithTimeZone — NULL origin + zone in floor AND parse " +
      "(CalciteQueryTest.java:7895)") {
    val r = single(
      """SELECT TIME_FLOOR(__time, 'P1M', NULL, 'America/Los_Angeles') AS g, COUNT(*)
        |FROM foo
        |WHERE TIME_FLOOR(__time, 'P1M', NULL, 'America/Los_Angeles') =
        |        TIME_PARSE('2000-01-01 00:00:00', NULL, 'America/Los_Angeles')
        |   OR TIME_FLOOR(__time, 'P1M', NULL, 'America/Los_Angeles') =
        |        TIME_PARSE('2000-02-01 00:00:00', NULL, 'America/Los_Angeles')
        |GROUP BY 1""".stripMargin)
    // LA midnight 2000-01-01 rendered as its UTC instant (08:00), matching
    // rows 2 and 3 (row 1 is 1999-12-31 on the LA wall clock)
    assert(r.getTimestamp(0) == ts("2000-01-01 08:00:00"))
    assert(r.getLong(1) == 2L)
  }

  test("testFilterOnTimeExtractWithVariousTimeUnits (:8170)") {
    assert(single(
      """SELECT COUNT(*) FROM foo4
        |WHERE TIME_EXTRACT(__time, 'YEAR') = 2000
        |AND TIME_EXTRACT(__time, 'MICROSECOND') = 946723
        |AND TIME_EXTRACT(__time, 'MILLISECOND') = 695
        |AND TIME_EXTRACT(__time, 'ISODOW') = 6
        |AND TIME_EXTRACT(__time, 'ISOYEAR') = 2000
        |AND TIME_EXTRACT(__time, 'DECADE') = 200
        |AND TIME_EXTRACT(__time, 'CENTURY') = 20
        |AND TIME_EXTRACT(__time, 'MILLENNIUM') = 2""".stripMargin).getLong(0) == 1L)
  }

  test("testFilterOnTimeFloorMisaligned — misaligned floor literal matches nothing (:8232)") {
    assert(single(
      """SELECT COUNT(*) FROM foo
        |WHERE TIME_FLOOR(__time, 'P1M') = TIMESTAMP '2000-01-01 00:00:01'""".stripMargin)
      .getLong(0) == 0L)
  }

  test("testGroupByExtractFloorTime (:9830)") {
    val out = sql(
      """SELECT TIME_EXTRACT(TIME_FLOOR(__time, 'P1Y'), 'YEAR') AS year, SUM(cnt)
        |FROM foo GROUP BY 1 ORDER BY 1""".stripMargin)
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(out == Seq((2000, 3L), (2001, 3L)))
  }

  test("testGroupByExtractFloorTimeLosAngeles (:9865)") {
    val out = sql(
      """SELECT TIME_EXTRACT(TIME_FLOOR(__time, 'P1Y', NULL, 'America/Los_Angeles'),
        |                    'YEAR', 'America/Los_Angeles') AS year, SUM(cnt)
        |FROM foo GROUP BY 1 ORDER BY 1""".stripMargin)
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    // 2000-01-01T00Z and 2001-01-01T00Z are still the PRIOR year on the LA
    // wall clock — the reference's canonical DST-boundary regrouping
    assert(out == Seq((1999, 1L), (2000, 3L), (2001, 2L)))
  }

  test("testCountStarWithTimeFilterOnLongColumnUsingExtractEpoch / FromDate (:5803, :5836)") {
    assert(single(
      """SELECT COUNT(*) FROM foo WHERE
        |cnt >= TIME_EXTRACT(TIMESTAMP '1970-01-01 00:00:00', 'EPOCH') * 1000
        |AND cnt < TIME_EXTRACT(TIMESTAMP '1970-01-02 00:00:00', 'EPOCH') * 1000""".stripMargin)
      .getLong(0) == 6L)
    assert(single(
      """SELECT COUNT(*) FROM foo WHERE
        |cnt >= TIME_EXTRACT(DATE '1970-01-01', 'EPOCH') * 1000
        |AND cnt < TIME_EXTRACT(DATE '1970-01-02', 'EPOCH') * 1000""".stripMargin)
      .getLong(0) == 6L)
  }

  test("testTimeseriesWithTimeFilterOnLongColumnUsingMillisToTimestamp (:5965)") {
    val r = single(
      """SELECT TIME_FLOOR(MILLIS_TO_TIMESTAMP(cnt), 'P1Y') AS g, COUNT(*)
        |FROM foo
        |WHERE MILLIS_TO_TIMESTAMP(cnt) >= TIMESTAMP '1970-01-01 00:00:00'
        |  AND MILLIS_TO_TIMESTAMP(cnt) < TIMESTAMP '1970-01-02 00:00:00'
        |GROUP BY 1""".stripMargin)
    assert(r.getTimestamp(0) == ts("1970-01-01 00:00:00") && r.getLong(1) == 6L)
  }
}
