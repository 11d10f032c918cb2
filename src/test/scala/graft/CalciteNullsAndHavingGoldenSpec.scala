package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** Round-6 CalciteQueryTest golden tranche: HAVING edge cases, nested
  * groupBy, EARLIEST/LATEST on numerics, and null-valued numeric columns.
  * Same porting rules as CalciteGoldenSpec (sql-compatible null mode;
  * documented adaptations where Druid-Calcite syntax has no Spark
  * spelling: FLOOR(__time TO unit) → date_trunc, implicit-__time
  * EARLIEST(x) → EARLIEST(x, __time), Druid's descending null-first
  * numeric ordering → explicit NULLS FIRST). Fixture = CalciteTests
  * RAW_ROWS1_WITH_NUMERIC_DIMS, as in CalciteGoldenSpec. */
class CalciteNullsAndHavingGoldenSpec extends SparkSpecBase {
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

  // ---- HAVING family ----

  test("testHavingOnGrandTotal (CalciteQueryTest.java:1978)") {
    val r = single("SELECT SUM(m1) AS m1_sum FROM foo HAVING SUM(m1) = 21")
    assert(r.getDouble(0) == 21d)
  }

  test("testHavingOnDoubleSum (:1999)") {
    val out = sql("SELECT dim1, SUM(m1) AS m1_sum FROM foo GROUP BY dim1 HAVING SUM(m1) > 1")
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out == Set(("1", 4.0d), ("10.1", 2.0d), ("2", 3.0d), ("abc", 6.0d), ("def", 5.0d)))
  }

  test("testHavingOnApproximateCountDistinct / testHavingOnExactCountDistinct (:2038, :2090)") {
    // this engine computes the exact form; both reference cases expect the
    // same rows in sql-compatible null mode
    val out = sql("SELECT dim2, COUNT(DISTINCT m1) FROM foo GROUP BY dim2 HAVING COUNT(DISTINCT m1) > 1")
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(out == Set((None, 2L), (Some("a"), 2L)))
  }

  test("testHavingOnFloatSum (:2257)") {
    val out = sql(
      "SELECT dim1, CAST(SUM(m1) AS FLOAT) AS m1_sum FROM foo GROUP BY dim1 HAVING CAST(SUM(m1) AS FLOAT) > 1")
      .map(r => (r.getString(0), r.getFloat(1))).toSet
    assert(out == Set(("1", 4.0f), ("10.1", 2.0f), ("2", 3.0f), ("abc", 6.0f), ("def", 5.0f)))
  }

  test("testHavingOnRatio (:2326; Druid long/long is integer division → DIV, and the " +
      "planned not-selector filter matches nulls → null-safe inequality)") {
    val out = sql(
      """SELECT dim1, COUNT(*) FILTER(WHERE NOT dim2 <=> 'a') DIV COUNT(*) as ratio
        |FROM foo GROUP BY dim1
        |HAVING COUNT(*) FILTER(WHERE NOT dim2 <=> 'a') DIV COUNT(*) = 1""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("10.1", 1L), ("2", 1L), ("abc", 1L), ("def", 1L)))
  }

  test("testColumnComparison (:2290) — Druid's null-on-malformed string→double is TRY_CAST") {
    val out = sql(
      "SELECT dim1, m1, COUNT(*) FROM foo WHERE m1 - 1 = TRY_CAST(dim1 AS DOUBLE) GROUP BY dim1, m1")
      .map(r => (r.getString(0), r.getFloat(1), r.getLong(2))).toSet
    assert(out == Set(("2", 3.0f, 1L)))
  }

  // ---- nested groupBy family ----

  test("testNestedGroupBy (:6438; FLOOR(__time TO HOUR) spelled date_trunc)") {
    val out = sql(
      """SELECT date_trunc('HOUR', __time) AS __time, dim1, COUNT(m2)
        |FROM (
        |  SELECT MAX(__time) AS __time, m2, dim1
        |  FROM foo WHERE 1=1 AND m1 = '5.0' GROUP BY m2, dim1
        |)
        |GROUP BY date_trunc('HOUR', __time), dim1""".stripMargin)
    assert(out.length == 1)
    assert(out.head.getTimestamp(0) == ts("2001-01-02 00:00:00")) // 978393600000 ms UTC
    assert(out.head.getString(1) == "def" && out.head.getLong(2) == 1L)
  }

  test("testDoubleNestedGroupBy (:6506) — sql null mode counts the null dim2 group") {
    val r = single(
      """SELECT SUM(cnt), COUNT(*) FROM (
        |  SELECT dim2, SUM(t1.cnt) cnt FROM (
        |    SELECT dim1, dim2, COUNT(*) cnt FROM foo GROUP BY dim1, dim2
        |  ) t1 GROUP BY dim2
        |) t2""".stripMargin)
    assert((r.getLong(0), r.getLong(1)) == ((6L, 4L)))
  }

  test("testDoubleNestedGroupBy2 (:6561)") {
    val r = single(
      """SELECT MAX(cnt) FROM (
        |  SELECT dim2, MAX(t1.cnt) cnt FROM (
        |    SELECT dim1, dim2, COUNT(*) cnt FROM foo GROUP BY dim1, dim2
        |  ) t1 GROUP BY dim2
        |) t2""".stripMargin)
    assert(r.getLong(0) == 1L)
  }

  // ---- null numeric columns ----

  test("testNullLongFilter / testNullDoubleFilter / testNullFloatFilter (:3258, :3296, :3335)") {
    assert(single("SELECT COUNT(*) FROM numfoo WHERE l1 IS NULL").getLong(0) == 3L)
    assert(single("SELECT COUNT(*) FROM numfoo WHERE d1 IS NULL").getLong(0) == 3L)
    assert(single("SELECT COUNT(*) FROM numfoo WHERE f1 IS NULL").getLong(0) == 3L)
  }

  test("testNullDoubleTopN (:3373; Druid's descending null-first → NULLS FIRST)") {
    val out = sql("SELECT d1, COUNT(*) FROM numfoo GROUP BY d1 ORDER BY d1 DESC NULLS FIRST LIMIT 10")
      .map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0)), r.getLong(1))).toSeq
    assert(out == Seq((None, 3L), (Some(1.7), 1L), (Some(1.0), 1L), (Some(0.0), 1L)))
  }

  test("testNullFloatTopN (:3413)") {
    val out = sql("SELECT f1, COUNT(*) FROM numfoo GROUP BY f1 ORDER BY f1 DESC NULLS FIRST LIMIT 10")
      .map(r => (if (r.isNullAt(0)) None else Some(r.getFloat(0)), r.getLong(1))).toSeq
    assert(out == Seq((None, 3L), (Some(1.0f), 1L), (Some(0.1f), 1L), (Some(0.0f), 1L)))
  }

  test("testNullLongTopN (:3453)") {
    val out = sql("SELECT l1, COUNT(*) FROM numfoo GROUP BY l1 ORDER BY l1 DESC NULLS FIRST LIMIT 10")
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1))).toSeq
    assert(out == Seq((None, 3L), (Some(325323L), 1L), (Some(7L), 1L), (Some(0L), 1L)))
  }

  test("testCoalesceColumns (:3667) — sql null mode keeps the empty string") {
    val out = sql("SELECT COALESCE(dim2, dim1), COUNT(*) FROM foo GROUP BY COALESCE(dim2, dim1)")
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("", 1L), ("10.1", 1L), ("a", 2L), ("abc", 2L)))
  }

  test("testNullEmptyStringEquality-adjacent: dim2 IS NULL (:3221)") {
    assert(single("SELECT COUNT(*) FROM foo WHERE dim2 IS NULL").getLong(0) == 2L)
  }

  // ---- EARLIEST / LATEST on numerics ----

  test("testEarliestAggregatorsNumericNulls (:1148; implicit __time made explicit)") {
    val r = single("SELECT EARLIEST(l1, __time), EARLIEST(d1, __time), EARLIEST(f1, __time) FROM numfoo")
    assert((r.getLong(0), r.getDouble(1), r.getFloat(2)) == ((7L, 1.0d, 1.0f)))
  }

  test("testLatestAggregatorsNumericNull (:1177) — the latest row's null is returned, not skipped") {
    val r = single("SELECT LATEST(l1, __time), LATEST(d1, __time), LATEST(f1, __time) FROM numfoo")
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("testFirstLatestAggregatorsSkipNulls (:1210) — under not-null filters") {
    val r = single(
      """SELECT EARLIEST(dim1, __time), LATEST(l1, __time), LATEST(d1, __time), LATEST(f1, __time)
        |FROM numfoo
        |WHERE dim1 IS NOT NULL AND l1 IS NOT NULL AND d1 IS NOT NULL AND f1 IS NOT NULL""".stripMargin)
    assert(r.getString(0) == "" && r.getLong(1) == 0L)
    assert(r.getDouble(2) == 0.0d && r.getFloat(3) == 0.0f)
  }

  test("testEarliestAggregators / testLatestAggregators (:603, :651) — EARLIEST_BY/LATEST_BY numeric time") {
    val r = single(
      """SELECT
        |  EARLIEST_BY(cnt, MILLIS_TO_TIMESTAMP(l1)), EARLIEST_BY(m1, MILLIS_TO_TIMESTAMP(l1)),
        |  EARLIEST_BY(dim1, MILLIS_TO_TIMESTAMP(l1)),
        |  LATEST_BY(cnt, MILLIS_TO_TIMESTAMP(l1)), LATEST_BY(m1, MILLIS_TO_TIMESTAMP(l1)),
        |  LATEST_BY(dim1, MILLIS_TO_TIMESTAMP(l1))
        |FROM numfoo""".stripMargin)
    assert((r.getLong(0), r.getFloat(1), r.getString(2)) == ((1L, 3.0f, "2")))
    assert((r.getLong(3), r.getFloat(4), r.getString(5)) == ((1L, 2.0f, "10.1")))
  }
}
