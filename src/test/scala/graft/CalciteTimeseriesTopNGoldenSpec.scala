package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.{DataFrame, Row}

/** Round-6 CalciteQueryTest golden tranche #5: the timeseries and topN SQL
  * shapes (month buckets, descending, limits, TIME_FLOOR origin/shift/
  * TIMESTAMPADD variants, CAST AS DATE, post-aggregations, projection
  * ordering, empty-result defaults). Same fixture and porting rules as the
  * sibling tranches (FLOOR(__time TO unit) spelled date_trunc; Druid's
  * null-on-malformed coercion spelled TRY_CAST; Druid substring null-on-
  * empty spelled NULLIF). */
class CalciteTimeseriesTopNGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val numfoo: DataFrame = {
    val rows = Seq(
      (ts("2000-01-01 00:00:00"), "",     "a",  1.0f, 1.0,
        Some(1.0), Some(7L), 1L),
      (ts("2000-01-02 00:00:00"), "10.1", null, 2.0f, 2.0,
        Some(1.7), Some(325323L), 1L),
      (ts("2000-01-03 00:00:00"), "2",    "",   3.0f, 3.0,
        Some(0.0), Some(0L), 1L),
      (ts("2001-01-01 00:00:00"), "1",    "a",  4.0f, 4.0,
        None, None, 1L),
      (ts("2001-01-02 00:00:00"), "def",  "abc", 5.0f, 5.0,
        None, None, 1L),
      (ts("2001-01-03 00:00:00"), "abc",  null, 6.0f, 6.0,
        None, None, 1L))
    rows.toDF("__time", "dim1", "dim2", "m1", "m2", "d1", "l1", "cnt")
  }

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    numfoo.createOrReplaceTempView("numfoo")
    numfoo.createOrReplaceTempView("foo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }

  test("testTimeseries (CalciteQueryTest.java:6100s) / testTimeseriesDescending") {
    val asc = sql(
      """SELECT SUM(cnt), gran FROM (
        |  SELECT date_trunc('MONTH', __time) AS gran, cnt FROM foo
        |) AS x GROUP BY gran ORDER BY gran""".stripMargin)
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    assert(asc == Seq((3L, ts("2000-01-01 00:00:00")), (3L, ts("2001-01-01 00:00:00"))))
    val desc = sql(
      """SELECT gran, SUM(cnt) FROM (
        |  SELECT date_trunc('MONTH', __time) AS gran, cnt FROM foo
        |) AS x GROUP BY gran ORDER BY gran DESC""".stripMargin)
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    assert(desc == Seq((ts("2001-01-01 00:00:00"), 3L), (ts("2000-01-01 00:00:00"), 3L)))
  }

  test("testTimeseriesWithLimit / testTimeseriesWithOrderByAndLimit (:6200s)") {
    // bare LIMIT trims an unordered result; the row count is the contract
    val bare = sql(
      """SELECT gran, SUM(cnt) FROM (
        |  SELECT date_trunc('MONTH', __time) AS gran, cnt FROM foo
        |) AS x GROUP BY gran LIMIT 1""".stripMargin)
    assert(bare.length == 1 && bare.head.getLong(1) == 3L)
    val ordered = sql(
      """SELECT gran, SUM(cnt) FROM (
        |  SELECT date_trunc('MONTH', __time) AS gran, cnt FROM foo
        |) AS x GROUP BY gran ORDER BY gran LIMIT 1""".stripMargin)
    assert(ordered.length == 1)
    assert((ordered.head.getTimestamp(0), ordered.head.getLong(1)) ==
      ((ts("2000-01-01 00:00:00"), 3L)))
  }

  test("testTimeseriesUsingTimeFloorWithOrigin (:6250s)") {
    val out = sql(
      """SELECT SUM(cnt), gran FROM (
        |  SELECT TIME_FLOOR(__time, 'P1M', TIMESTAMP '1970-01-01 01:02:03') AS gran,
        |  cnt FROM foo
        |) AS x GROUP BY gran ORDER BY gran""".stripMargin)
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    assert(out == Seq(
      (1L, ts("1999-12-01 01:02:03")), (2L, ts("2000-01-01 01:02:03")),
      (1L, ts("2000-12-01 01:02:03")), (2L, ts("2001-01-01 01:02:03"))))
  }

  test("testTimeseriesUsingTimeFloorWithTimeShift / WithTimestampAdd (:6300s)") {
    Seq(
      "TIME_FLOOR(TIME_SHIFT(__time, 'P1D', -1), 'P1M')",
      "TIME_FLOOR(TIMESTAMPADD(DAY, -1, __time), 'P1M')"
    ).foreach { gran =>
      val out = sql(
        s"""SELECT SUM(cnt), gran FROM (
           |  SELECT $gran AS gran, cnt FROM foo
           |) AS x GROUP BY gran ORDER BY gran""".stripMargin)
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
      assert(out == Seq(
        (1L, ts("1999-12-01 00:00:00")), (2L, ts("2000-01-01 00:00:00")),
        (1L, ts("2000-12-01 00:00:00")), (2L, ts("2001-01-01 00:00:00"))), gran)
    }
  }

  test("testTimeseriesLosAngelesUsingTimeFloorConnectionUtc (:6280s) — " +
      "month buckets on the Los Angeles wall clock, rendered in UTC") {
    val out = sql(
      """SELECT SUM(cnt), gran FROM (
        |  SELECT TIME_FLOOR(__time, 'P1M', CAST(NULL AS TIMESTAMP), 'America/Los_Angeles') AS gran,
        |  cnt FROM foo
        |) AS x GROUP BY gran ORDER BY gran""".stripMargin)
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    assert(out == Seq(
      (1L, ts("1999-12-01 08:00:00")), (2L, ts("2000-01-01 08:00:00")),
      (1L, ts("2000-12-01 08:00:00")), (2L, ts("2001-01-01 08:00:00"))))
  }

  test("TIME_EXTRACT / TIME_FORMAT with a timezone argument (TimeExtractOperatorConversion)") {
    // 2000-01-01 00:00 UTC = 1999-12-31 16:00 in Los Angeles
    val r = single(
      """SELECT TIME_EXTRACT(TIMESTAMP '2000-01-01 00:00:00', 'DAY', 'America/Los_Angeles'),
        |       TIME_EXTRACT(TIMESTAMP '2000-01-01 00:00:00', 'HOUR', 'America/Los_Angeles'),
        |       TIME_FORMAT(TIMESTAMP '2000-01-01 00:00:00', 'yyyy-MM-dd HH:mm', 'America/Los_Angeles')""".stripMargin)
    assert((r.getInt(0), r.getInt(1), r.getString(2)) == ((31, 16, "1999-12-31 16:00")))
  }

  test("testTimeseriesUsingCastAsDate (:6350s)") {
    val out = sql(
      """SELECT SUM(cnt), dt FROM (
        |  SELECT CAST(__time AS DATE) AS dt, cnt FROM foo
        |) AS x GROUP BY dt ORDER BY dt""".stripMargin)
      .map(r => (r.getLong(0), r.getDate(1).toString)).toSeq
    assert(out == Seq(
      (1L, "2000-01-01"), (1L, "2000-01-02"), (1L, "2000-01-03"),
      (1L, "2001-01-01"), (1L, "2001-01-02"), (1L, "2001-01-03")))
  }

  test("testPostAggWithTimeseries (:8300s)") {
    val out = sql(
      """SELECT date_trunc('YEAR', __time), SUM(m1), SUM(m1) + SUM(m2)
        |FROM foo WHERE dim2 = 'a'
        |GROUP BY date_trunc('YEAR', __time)
        |ORDER BY date_trunc('YEAR', __time) DESC""".stripMargin)
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(out == Seq(
      (ts("2001-01-01 00:00:00"), 4.0, 8.0),
      (ts("2000-01-01 00:00:00"), 1.0, 2.0)))
  }

  test("testPostAggWithTopN (:8350s)") {
    val out = sql(
      """SELECT AVG(m2), SUM(m1) + SUM(m2)
        |FROM foo WHERE dim2 = 'a'
        |GROUP BY m1 ORDER BY m1 LIMIT 5""".stripMargin)
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(out == Seq((1.0, 2.0), (4.0, 8.0)))
  }

  test("testTopNWithSelectProjections / AndOrderByProjections (:2430s)") {
    val plain = sql(
      "SELECT dim1, NULLIF(SUBSTRING(dim1, 2), '') FROM foo GROUP BY dim1 LIMIT 10")
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(plain == Set(("", None), ("1", None), ("10.1", Some("0.1")),
      ("2", None), ("abc", Some("bc")), ("def", Some("ef"))))
    // Druid topN breaks metric ties on the dimension — made explicit here
    val ordered = sql(
      """SELECT dim1, NULLIF(SUBSTRING(dim1, 2), '') FROM foo GROUP BY dim1
        |ORDER BY CHARACTER_LENGTH(dim1) DESC, dim1 LIMIT 10""".stripMargin)
      .map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(ordered == Seq(("10.1", Some("0.1")), ("abc", Some("bc")),
      ("def", Some("ef")), ("1", None), ("2", None), ("", None)))
  }

  test("testTopNLimitWrapping (:2500s) — sql null mode") {
    val out = sql("SELECT dim1, COUNT(*) FROM foo GROUP BY dim1 ORDER BY dim1 DESC LIMIT 2")
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("def", 1L), ("abc", 1L)))
  }

  test("testTimeseriesEmptyResultsAggregatorDefaultValues (:6050s) — empty slice, sql nulls") {
    val r = single(
      """SELECT count(*), COUNT(DISTINCT dim1), APPROX_COUNT_DISTINCT(dim1),
        | sum(d1), max(d1), min(d1), sum(l1), max(l1), min(l1), avg(l1), avg(d1)
        |FROM numfoo WHERE TRY_CAST(dim2 AS INTEGER) = 0""".stripMargin)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((0L, 0L, 0L)))
    (3 to 10).foreach(i => assert(r.isNullAt(i), s"col $i"))
  }
}
