package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** Round-6 golden tranche: CalciteQueryTest.java EARLIEST/LATEST/ANY_VALUE
  * batteries (:603-:726, :1148-:1320) — time-ordered and custom-timestamp
  * (EARLIEST_BY/LATEST_BY) variants over expressions, null-keeping
  * semantics (LATEST takes the last row's value even when null; ANY takes
  * the first including nulls; a null ordering timestamp is skipped).
  *
  * Adaptations: EARLIEST/LATEST spell __time explicitly, maxStringBytes
  * args are dropped (no byte-capped accumulator here), and VARCHAR casts
  * spell STRING (Spark requires a length on VARCHAR). */
class CalciteFirstLastAnyGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val numfoo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     "a",   1.0f,
      Some(1.0), None: Option[Double], Some(1.0f), None: Option[Float], Some(7L), None: Option[Long], 1L),
    (ts("2000-01-02 00:00:00"), "10.1", null,  2.0f,
      Some(1.7), Some(1.7), Some(0.1f), Some(0.1f), Some(325323L), Some(325323L), 1L),
    (ts("2000-01-03 00:00:00"), "2",    "",    3.0f,
      Some(0.0), Some(0.0), Some(0.0f), Some(0.0f), Some(0L), Some(0L), 1L),
    (ts("2001-01-01 00:00:00"), "1",    "a",   4.0f,
      None, None, None, None, None, None, 1L),
    (ts("2001-01-02 00:00:00"), "def",  "abc", 5.0f,
      None, None, None, None, None, None, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  null,  6.0f,
      None, None, None, None, None, None, 1L))
    .toDF("__time", "dim1", "dim2", "m1", "d1", "d2", "f1", "f2", "l1", "l2", "cnt")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    numfoo.createOrReplaceTempView("numfoo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }

  test("testEarliestAggregators — time-ordered and EARLIEST_BY variants (CalciteQueryTest.java:603)") {
    val r = single(
      """SELECT
        |EARLIEST(cnt, __time), EARLIEST(m1, __time), EARLIEST(dim1, __time),
        |EARLIEST(cnt + 1, __time), EARLIEST(m1 + 1, __time),
        |EARLIEST(dim1 || CAST(cnt AS STRING), __time),
        |EARLIEST_BY(cnt, MILLIS_TO_TIMESTAMP(l1)), EARLIEST_BY(m1, MILLIS_TO_TIMESTAMP(l1)),
        |EARLIEST_BY(dim1, MILLIS_TO_TIMESTAMP(l1)),
        |EARLIEST_BY(cnt + 1, MILLIS_TO_TIMESTAMP(l1)), EARLIEST_BY(m1 + 1, MILLIS_TO_TIMESTAMP(l1)),
        |EARLIEST_BY(dim1 || CAST(cnt AS STRING), MILLIS_TO_TIMESTAMP(l1))
        |FROM numfoo""".stripMargin)
    assert((r.getLong(0), r.getFloat(1), r.getString(2)) == ((1L, 1.0f, "")))
    assert((r.getLong(3), r.getDouble(4), r.getString(5)) == ((2L, 2.0, "1")))
    // EARLIEST_BY orders on l1-as-millis: the minimum non-null l1 (0) is row 3
    assert((r.getLong(6), r.getFloat(7), r.getString(8)) == ((1L, 3.0f, "2")))
    assert((r.getLong(9), r.getDouble(10), r.getString(11)) == ((2L, 4.0, "21")))
  }

  test("testLatestAggregators (:651)") {
    val r = single(
      """SELECT
        |LATEST(cnt, __time), LATEST(m1, __time), LATEST(dim1, __time),
        |LATEST(cnt + 1, __time), LATEST(m1 + 1, __time),
        |LATEST(dim1 || CAST(cnt AS STRING), __time),
        |LATEST_BY(cnt, MILLIS_TO_TIMESTAMP(l1)), LATEST_BY(m1, MILLIS_TO_TIMESTAMP(l1)),
        |LATEST_BY(dim1, MILLIS_TO_TIMESTAMP(l1)),
        |LATEST_BY(cnt + 1, MILLIS_TO_TIMESTAMP(l1)), LATEST_BY(m1 + 1, MILLIS_TO_TIMESTAMP(l1)),
        |LATEST_BY(dim1 || CAST(cnt AS STRING), MILLIS_TO_TIMESTAMP(l1))
        |FROM numfoo""".stripMargin)
    assert((r.getLong(0), r.getFloat(1), r.getString(2)) == ((1L, 6.0f, "abc")))
    assert((r.getLong(3), r.getDouble(4), r.getString(5)) == ((2L, 7.0, "abc1")))
    // LATEST_BY orders on l1-as-millis: the maximum non-null l1 (325323) is
    // row 2 — rows with a null ordering timestamp are skipped
    assert((r.getLong(6), r.getFloat(7), r.getString(8)) == ((1L, 2.0f, "10.1")))
    assert((r.getLong(9), r.getDouble(10), r.getString(11)) == ((2L, 3.0, "10.11")))
  }

  test("testEarliestAggregatorsNumericNulls / testLatestAggregatorsNumericNull — LATEST " +
      "keeps the last row's null (:1148, :1177)") {
    val e = single("SELECT EARLIEST(l1, __time), EARLIEST(d1, __time), EARLIEST(f1, __time) FROM numfoo")
    assert((e.getLong(0), e.getDouble(1), e.getFloat(2)) == ((7L, 1.0, 1.0f)))
    val l = single("SELECT LATEST(l1, __time), LATEST(d1, __time), LATEST(f1, __time) FROM numfoo")
    assert(l.isNullAt(0) && l.isNullAt(1) && l.isNullAt(2))
  }

  test("testFirstLatestAggregatorsSkipNulls — filters restore non-null lasts (:1210)") {
    val r = single(
      """SELECT EARLIEST(dim1, __time), LATEST(l1, __time), LATEST(d1, __time), LATEST(f1, __time)
        |FROM numfoo
        |WHERE dim1 IS NOT NULL AND l1 IS NOT NULL AND d1 IS NOT NULL AND f1 IS NOT NULL""".stripMargin)
    assert((r.getString(0), r.getLong(1), r.getDouble(2), r.getFloat(3)) == (("", 0L, 0.0, 0.0f)))
  }

  test("testAnyAggregatorsDoesNotSkipNulls (:1255)") {
    val r = single("SELECT ANY_VALUE(dim1), ANY_VALUE(l2), ANY_VALUE(d2), ANY_VALUE(f2) FROM numfoo")
    assert(r.getString(0) == "")
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("testEarliestByInvalidTimestamp / testLatestByInvalidTimestamp — SUPERSET: numeric " +
      "ordering columns work (:699, :712)") {
    // the reference's validator rejects a non-timestamp ordering arg
    // ("Cannot apply 'EARLIEST_BY' to ... (<FLOAT>, <BIGINT>)"); min_by/
    // max_by order by any comparable type here, so the BIGINT form executes
    assert(single("SELECT EARLIEST_BY(m1, l1) FROM numfoo").getFloat(0) == 3.0f) // min l1 = 0 is row 3
    assert(single("SELECT LATEST_BY(m1, l1) FROM numfoo").getFloat(0) == 2.0f)   // max l1 is row 2
  }

  test("testAnyAggregatorsSkipNullsWithFilter (:1283)") {
    val r = single(
      """SELECT ANY_VALUE(dim1), ANY_VALUE(l2), ANY_VALUE(d2), ANY_VALUE(f2) FROM numfoo
        |WHERE dim1 IS NOT NULL AND l2 IS NOT NULL AND d2 IS NOT NULL AND f2 IS NOT NULL""".stripMargin)
    assert((r.getString(0), r.getLong(1), r.getDouble(2), r.getFloat(3)) ==
      (("10.1", 325323L, 1.7, 0.1f)))
  }
}
