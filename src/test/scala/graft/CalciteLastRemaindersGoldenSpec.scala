package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** The final unported CalciteSelectQueryTest / CalciteMultiValueStringQueryTest
  * methods — with this tranche every test-method name in the reference's
  * calcite SQL suites has a ported (or documented-deviation) counterpart.
  *
  * Porting rules as in CalciteGoldenSpec / CalciteMultiValueGoldenSpec:
  * sql-compatible-null-mode expectations; Druid's MV GROUP BY unnesting
  * spelled `LATERAL VIEW explode`; Druid scan ordering (segment time order)
  * made explicit with ORDER BY __time where Spark would otherwise be
  * nondeterministic.
  */
class CalciteLastRemaindersGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // CalciteTests.java:417-528 RAW_ROWS1 (minus the hyperUnique column)
  private lazy val foo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), 1L, "",     Option("a"),   Seq("a", "b"),   1.0f, 1.0),
    (ts("2000-01-02 00:00:00"), 1L, "10.1", None,          Seq("b", "c"),   2.0f, 2.0),
    (ts("2000-01-03 00:00:00"), 1L, "2",    Option(""),    Seq("d"),        3.0f, 3.0),
    (ts("2001-01-01 00:00:00"), 1L, "1",    Option("a"),   Seq(""),         4.0f, 4.0),
    (ts("2001-01-02 00:00:00"), 1L, "def",  Option("abc"), null: Seq[String], 5.0f, 5.0),
    (ts("2001-01-03 00:00:00"), 1L, "abc",  None,          null: Seq[String], 6.0f, 6.0)
  ).toDF("__time", "cnt", "dim1", "dim2", "dim3", "m1", "m2")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
    foo.createOrReplaceTempView("numfoo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }

  // ---- CalciteSelectQueryTest remainders ----

  test("testSelectConstantExpressionEquivalentToInfinity (CalciteSelectQueryTest.java:320) " +
      "— DEVIATION: reference rejects the -Infinity literal, Spark's LOG10 nulls it") {
    // Druid-Calcite errors: "'log10(0)' evaluates to '-Infinity' that is
    // not supported in SQL"; Spark's math convention returns NULL for a
    // non-positive log argument, so the query plans and yields null
    val r = sql("SELECT LOG10(0), dim1 FROM foo ORDER BY __time LIMIT 1").head
    assert(r.isNullAt(0) && r.getString(1) == "")
  }

  test("testSelectStarWithLimitAndOffset (:1296)") {
    // scan in segment (time) order, rows 2-3; ORDER BY __time makes the
    // reference's implicit segment order explicit
    val out = sql("SELECT * FROM foo ORDER BY __time LIMIT 2 OFFSET 1")
      .map(r => (r.getTimestamp(0).toString, r.getString(2), Option(r.getString(3)),
        Option(r.getSeq[String](4)), r.getFloat(5))).toSeq
    assert(out == Seq(
      ("2000-01-02 00:00:00.0", "10.1", None, Some(Seq("b", "c")), 2.0f),
      ("2000-01-03 00:00:00.0", "2", Some(""), Some(Seq("d")), 3.0f)))
  }

  test("testSelectStarWithLimitTimeDescending (:1371)") {
    val out = sql("SELECT * FROM foo ORDER BY __time DESC LIMIT 2")
      .map(r => (r.getTimestamp(0).toString, r.getString(2), Option(r.getString(3)),
        r.getFloat(5), r.getDouble(6))).toSeq
    assert(out == Seq(
      ("2001-01-03 00:00:00.0", "abc", None, 6.0f, 6.0),
      ("2001-01-02 00:00:00.0", "def", Some("abc"), 5.0f, 5.0)))
  }

  test("testSelectStarWithoutLimitTimeAscending (:1397)") {
    val out = sql("SELECT * FROM foo ORDER BY __time")
      .map(r => (r.getString(2), Option(r.getString(3)), r.getDouble(6))).toSeq
    assert(out == Seq(
      ("", Some("a"), 1.0), ("10.1", None, 2.0), ("2", Some(""), 3.0),
      ("1", Some("a"), 4.0), ("def", Some("abc"), 5.0), ("abc", None, 6.0)))
  }

  test("testSelectLimitWrappingOnTopOfOffsetAndLowLimit (:1548)") {
    assert(sql("SELECT dim1 FROM foo ORDER BY __time DESC LIMIT 1 OFFSET 1")
      .map(_.getString(0)).toSeq == Seq("def"))
  }

  // ---- CalciteMultiValueStringQueryTest remainders ----

  test("testFilterOnMultiValueListFilterMatchLike (CalciteMultiValueStringQueryTest.java:1338)") {
    // LIKE over the ListFilteredVirtualColumn: a Druid MV filter matches if
    // ANY surviving element matches — spelled exists(mv_filter_only(...));
    // the GROUP BY then unnests the ORIGINAL dim3 of matching rows
    val out = sql(
      """SELECT v, SUM(cnt) FROM numfoo
        |LATERAL VIEW explode(dim3) t AS v
        |WHERE exists(mv_filter_only(dim3, 'b'), x -> x LIKE 'b%')
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC""".stripMargin)
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("b", 2L), ("a", 1L), ("c", 1L)))
  }

  test("testMultiValueToArrayGroupAsArrayWithSingleValueDimIsNotConvertedToTopN (:1491)") {
    // grouping on MV_TO_ARRAY(single-value dim) keeps an array-typed key
    // (the reference's check that this does NOT get a topN plan; here the
    // analog is simply that array keys group correctly)
    val out = sql(
      """SELECT MV_TO_ARRAY(dim1) AS arr, SUM(cnt) FROM numfoo
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC LIMIT 10""".stripMargin)
      .map(r => (r.getSeq[String](0), r.getLong(1))).toSeq
    assert(out == Seq(
      (Seq(""), 1L), (Seq("1"), 1L), (Seq("10.1"), 1L),
      (Seq("2"), 1L), (Seq("abc"), 1L), (Seq("def"), 1L)))
  }

  test("testMultiValueToArrayNoArgs (:1559) — arity error parity") {
    registered
    val e = intercept[Exception](spark.sql("SELECT MV_TO_ARRAY() FROM numfoo").collect())
    assert(e.getMessage.contains("Invalid number of arguments"))
  }

  test("testMultiValueToArrayArgsWithConstant (:1589) — SUPERSET: non-column args accepted") {
    // the reference only accepts direct column references (throws for
    // concat(dim1,'c')); MvToArray here is scalar-wrap on ANY string expr
    assert(sql("SELECT MV_TO_ARRAY(concat(dim1, 'c')) FROM numfoo ORDER BY __time LIMIT 1")
      .head.getSeq[String](0) == Seq("c"))
  }

  test("testMultiValueToArrayArgsWithArray (:1598) — SUPERSET: identity on a real array") {
    assert(sql("SELECT MV_TO_ARRAY(ARRAY(1, 2)) FROM numfoo LIMIT 1")
      .head.getSeq[Int](0) == Seq(1, 2))
  }
}
