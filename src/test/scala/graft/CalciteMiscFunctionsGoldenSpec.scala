package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** Round-6 golden tranche: CalciteQueryTest.java misc function clusters —
  * TIMESTAMPADD zero/positive periods (:12432-:12560), bitwise aggregates
  * grouped (:13108), the HUMAN_READABLE_* format family (:13667-:13778),
  * and APPROX_COUNT_DISTINCT variants (:6165, :6327). */
class CalciteMiscFunctionsGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val numfoo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   1.0f, Option(7L), 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], 2.0f, Option(325323L), 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    3.0f, Option(0L), 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   4.0f, None: Option[Long], 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), 5.0f, None: Option[Long], 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], 6.0f, None: Option[Long], 1L))
    .toDF("__time", "dim1", "dim2", "m1", "l1", "cnt")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    numfoo.createOrReplaceTempView("numfoo")
    numfoo.createOrReplaceTempView("foo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }

  test("testTimeStampAddZeroDayPeriod / ZeroMonth / ZeroYear — identity shifts " +
      "(CalciteQueryTest.java:12432, :12460, :12490)") {
    for (unit <- Seq("DAY", "MONTH", "YEAR")) {
      val out = sql(s"SELECT TIMESTAMPADD($unit, 0, __time) FROM foo")
        .map(_.getTimestamp(0)).toSeq
      assert(out == numfoo.collect().map(_.getTimestamp(0)).toSeq, s"unit $unit")
    }
  }

  test("testTimeStampAddConversion (:12521)") {
    val out = sql("SELECT TIMESTAMPADD(MONTH, 1, __time) FROM foo")
      .map(_.getTimestamp(0)).toSeq
    assert(out == Seq(
      ts("2000-02-01 00:00:00"), ts("2000-02-02 00:00:00"), ts("2000-02-03 00:00:00"),
      ts("2001-02-01 00:00:00"), ts("2001-02-02 00:00:00"), ts("2001-02-03 00:00:00")))
  }

  test("testBitwiseAggregatorsGroupBy — DEVIATION: no zero seed on BIT_AND (:13108)") {
    // the reference's BIT_AND lambda folds from a 0 accumulator, so every
    // non-empty group ANDs to 0; this engine folds pairwise (Spark bit_and),
    // giving the mathematical AND — OR/XOR and all-null groups agree
    val out = sql(
      """SELECT dim2, BIT_AND(l1), BIT_OR(l1), BIT_XOR(l1) FROM numfoo
        |GROUP BY 1 ORDER BY 4 ASC NULLS FIRST""".stripMargin)
      .map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(out == Seq(
      (Some("abc"), None, None, None),
      (Some(""), Some(0L), Some(0L), Some(0L)),
      (Some("a"), Some(7L), Some(7L), Some(7L)),
      (None, Some(325323L), Some(325323L), Some(325323L))))
  }

  test("testHumanReadableFormatFunction (:13667)") {
    val r = single(
      """SELECT m1,
        |HUMAN_READABLE_BINARY_BYTE_FORMAT(45678),
        |HUMAN_READABLE_BINARY_BYTE_FORMAT(m1*12345),
        |HUMAN_READABLE_BINARY_BYTE_FORMAT(m1*12345, 0),
        |HUMAN_READABLE_DECIMAL_BYTE_FORMAT(m1*12345),
        |HUMAN_READABLE_DECIMAL_FORMAT(m1*12345),
        |HUMAN_READABLE_BINARY_BYTE_FORMAT(l1),
        |HUMAN_READABLE_DECIMAL_BYTE_FORMAT(l1),
        |HUMAN_READABLE_DECIMAL_FORMAT(l1)
        |FROM numfoo WHERE dim1 = '1' LIMIT 1""".stripMargin)
    assert(r.getFloat(0) == 4.0f)
    assert(r.getString(1) == "44.61 KiB")
    assert(r.getString(2) == "48.22 KiB")
    assert(r.getString(3) == "48 KiB")
    assert(r.getString(4) == "49.38 KB")
    assert(r.getString(5) == "49.38 K")
    assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(8))
  }

  test("testHumanReadableFormatFunctionWithWrongPrecisionType rejects (:13747)") {
    intercept[Exception](sql("SELECT HUMAN_READABLE_BINARY_BYTE_FORMAT(45678, '2')"))
  }

  test("testApproxCountDistinctBuiltin / testApproxCountDistinct (:6165, :6327)") {
    assert(single("SELECT APPROX_COUNT_DISTINCT(dim2) FROM foo").getLong(0) == 3L)
    val r = single(
      """SELECT SUM(cnt),
        |  APPROX_COUNT_DISTINCT(dim2),
        |  approx_count_distinct(dim2) FILTER(WHERE dim2 <> ''),
        |  APPROX_COUNT_DISTINCT(NULLIF(SUBSTRING(dim2, 1, 1), '')),
        |  APPROX_COUNT_DISTINCT(NULLIF(SUBSTRING(dim2, 1, 1), '') || 'x')
        |FROM foo""".stripMargin)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((6L, 3L, 2L, 1L, 1L)))
  }
}
