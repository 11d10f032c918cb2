package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** CalciteCorrelatedQueryTest golden tranche (sql/src/test/.../calcite/
  * CalciteCorrelatedQueryTest.java) — correlated scalar subqueries over the
  * `visits` fixture (CalciteTests.java:705-731 USER_VISIT_ROWS). Porting
  * adaptations, documented per test: FLOOR(__time TO DAY) is spelled
  * TIME_FLOOR, Calcite's quoted "users" alias is unquoted (not reserved in
  * Spark), and Druid types AVG-of-long as LONG where Spark yields DOUBLE
  * (CAST added). Expected rows are the reference's values.
  */
class CalciteCorrelatedGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val visits: DataFrame = Seq(
    (ts("2021-01-01 01:00:00"), "alice", "canada", "A"),
    (ts("2021-01-01 02:00:00"), "alice", "canada", "B"),
    (ts("2021-01-01 03:00:00"), "bob",   "canada", "A"),
    (ts("2021-01-01 04:00:00"), "alice", "India",  "Y"),
    (ts("2021-01-02 01:00:00"), "alice", "canada", "A"),
    (ts("2021-01-02 02:00:00"), "bob",   "canada", "A"),
    (ts("2021-01-02 03:00:00"), "foo",   "canada", "B"),
    (ts("2021-01-02 04:00:00"), "bar",   "canada", "B"),
    (ts("2021-01-02 05:00:00"), "alice", "India",  "X"),
    (ts("2021-01-02 06:00:00"), "bob",   "India",  "X"),
    (ts("2021-01-02 07:00:00"), "foo",   "India",  "X"),
    (ts("2021-01-03 01:00:00"), "foo",   "USA",    "M")
  ).toDF("__time", "user", "country", "city")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    visits.createOrReplaceTempView("visits")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }

  test("testCorrelatedSubquery (CalciteCorrelatedQueryTest.java:61; avg-of-long CAST)") {
    val out = sql(
      """select country, CAST(ANY_VALUE(
        |        (select avg(users) from (
        |            select TIME_FLOOR(__time, 'P1D'), count(distinct user) users
        |            from visits f where f.country = visits.country group by 1
        |        ))
        |     ) AS BIGINT) as DAU
        |from visits
        |group by 1 order by 1""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("India", 2L), ("USA", 1L), ("canada", 3L)))
  }

  test("testCorrelatedSubqueryWithLeftFilter (:178)") {
    val out = sql(
      """select country, ANY_VALUE(
        |        (select max(users) from (
        |            select TIME_FLOOR(__time, 'P1D'), count(*) users
        |            from visits f where f.country = visits.country group by 1
        |        ))
        |     ) as dailyVisits
        |from visits
        | where city = 'B' and __time between '2021-01-01 01:00:00' AND '2021-01-02 23:59:59'
        | group by 1""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("canada", 4L)))
  }

  test("testCorrelatedSubqueryWithCorrelatedQueryFilter (:358)") {
    val out = sql(
      """select country, ANY_VALUE(
        |        (select max(users) from (
        |            select TIME_FLOOR(__time, 'P1D'), count(user) users
        |            from visits f where f.country = visits.country and f.city = 'A' group by 1
        |        ))
        |     ) as dailyVisits
        |from visits
        | where city = 'B'
        | group by 1""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("canada", 2L)))
  }

  test("testCorrelatedSubqueryWithLeftFilter_leftDirectAccessDisabled (:267)") {
    // the reference's enableLeftScanDirect planner flag only changes the
    // PLAN (scan-direct vs query datasource on the join's left); Catalyst
    // owns that choice here, so the variant collapses to the same results
    // as its ported base case (:178) — re-asserted against the reference's
    // expected rows for the flagged variant
    val leftFilter = sql(
      """select country, ANY_VALUE(
        |        (select max(users) from (
        |            select TIME_FLOOR(__time, 'P1D'), count(*) users
        |            from visits f where f.country = visits.country group by 1
        |        ))
        |     ) as dailyVisits
        |from visits
        | where city = 'B' and __time between '2021-01-01 01:00:00' AND '2021-01-02 23:59:59'
        | group by 1""".stripMargin).map(r => (r.getString(0), r.getLong(1)))
    assert(leftFilter.toSeq == Seq(("canada", 4L)))
  }

  test("testCorrelatedSubqueryWithCorrelatedQueryFilter_Scan (CalciteCorrelatedQueryTest.java:452)") {
    // the withLeftDirectAccessEnabled variant of :358: the flag selects the
    // reference's scan-direct left input, a physical-plan choice Catalyst
    // makes on its own here — the query text and expected rows are the
    // reference's (one row: canada, 2 daily city-A visits)
    val out = sql(
      """select country, ANY_VALUE(
        |        (select max(users) from (
        |            select TIME_FLOOR(__time, 'P1D'), count(user) users
        |            from visits f where f.country = visits.country and f.city = 'A' group by 1
        |        ))
        |     ) as dailyVisits
        |from visits
        | where city = 'B'
        | group by 1""".stripMargin).map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("canada", 2L)))
  }
}
