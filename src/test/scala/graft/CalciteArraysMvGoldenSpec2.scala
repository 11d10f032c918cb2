package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** CalciteArraysQueryTest + CalciteMultiValueStringQueryTest golden
  * tranche 2: grouping by constructed arrays, ARRAY_TO_STRING round trips,
  * non-literal ARRAY_CONTAINS/OVERLAP filters, and MV_FILTER_ONLY /
  * MV_ORDINAL shapes. Conventions from the earlier tranches: MV group-by
  * explodes via LATERAL VIEW, Druid's scalar-vs-MV equality is spelled as
  * an any-element predicate, and expected rows are sql-compatible-mode
  * values.
  */
class CalciteArraysMvGoldenSpec2 extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val numfoo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   Option(Seq("a", "b")),
      Some(1.0), Some(1.0f), Some(7L), 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], Option(Seq("b", "c")),
      Some(1.7), Some(0.1f), Some(325323L), 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    Option(Seq("d")),
      Some(0.0), Some(0.0f), Some(0L), 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   Option(Seq("")),
      None: Option[Double], None: Option[Float], None: Option[Long], 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), None: Option[Seq[String]],
      None, None, None, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], None: Option[Seq[String]],
      None, None, None, 1L)
  ).toDF("__time", "dim1", "dim2", "dim3", "d1", "f1", "l1", "cnt")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    numfoo.createOrReplaceTempView("numfoo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }

  private def arrGroups(q: String): Set[(Seq[Any], Long)] =
    sql(q).map(r => (r.getSeq[Any](0).toList: Seq[Any], r.getLong(1))).toSet

  // ---- grouping by constructed arrays ----

  test("testArrayGroupAsLongArray (CalciteArraysQueryTest.java:939)") {
    assert(arrGroups("SELECT ARRAY(l1), SUM(cnt) FROM numfoo GROUP BY 1 ORDER BY 2 DESC") ==
      Set((Seq(null), 3L), (Seq(0L), 1L), (Seq(7L), 1L), (Seq(325323L), 1L)))
  }

  test("testArrayGroupAsDoubleArray (:988)") {
    assert(arrGroups("SELECT ARRAY(d1), SUM(cnt) FROM numfoo GROUP BY 1 ORDER BY 2 DESC") ==
      Set((Seq(null), 3L), (Seq(0.0), 1L), (Seq(1.0), 1L), (Seq(1.7), 1L)))
  }

  test("testArrayGroupAsFloatArray (:1037)") {
    assert(arrGroups("SELECT ARRAY(f1), SUM(cnt) FROM numfoo GROUP BY 1 ORDER BY 2 DESC") ==
      Set((Seq(null), 3L), (Seq(0.0f), 1L), (Seq(0.1f), 1L), (Seq(1.0f), 1L)))
  }

  test("testArrayGroupAsArrayWithFunction (:1086)") {
    assert(arrGroups(
      "SELECT ARRAY(ARRAY_ORDINAL(dim3, 2)), SUM(cnt) FROM numfoo GROUP BY 1 ORDER BY 2 DESC") ==
      Set((Seq(null), 4L), (Seq("b"), 1L), (Seq("c"), 1L)))
  }

  // ---- ARRAY_TO_STRING round trips ----

  test("testArrayToString (:1272)") {
    val out = sql(
      """SELECT ARRAY_TO_STRING(dim3, ','), SUM(cnt) FROM numfoo
        |GROUP BY 1 ORDER BY 2 DESC, 1 NULLS FIRST""".stripMargin)
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSeq
    assert(out == Seq((None, 2L), (Some(""), 1L), (Some("a,b"), 1L),
      (Some("b,c"), 1L), (Some("d"), 1L)))
  }

  test("testArrayToStringToMultiValueString (:1328)") {
    val out = sql(
      """SELECT STRING_TO_ARRAY(CONCAT(ARRAY_TO_STRING(dim3, ','), ',d'), ','), SUM(cnt)
        |FROM numfoo WHERE ARRAY_LENGTH(dim3) > 0 GROUP BY 1 ORDER BY 2 DESC""".stripMargin)
      .map(r => (r.getSeq[String](0).toList, r.getLong(1))).toSet
    assert(out == Set(
      (List("", "d"), 1L), (List("a", "b", "d"), 1L),
      (List("b", "c", "d"), 1L), (List("d", "d"), 1L)))
  }

  // ---- non-literal array filters ----

  test("testArrayContainsArrayOfOneElement / OfNonLiteral, testArrayOverlapFilterNonLiteral (:549, :571, :500)") {
    for (cond <- Seq(
      "ARRAY_CONTAINS(dim3, ARRAY('a'))",
      "ARRAY_CONTAINS(dim3, ARRAY(dim2))",
      "ARRAY_OVERLAP(dim3, ARRAY(dim2))")) {
      val out = sql(s"SELECT dim3 FROM numfoo WHERE $cond LIMIT 5")
      assert(out.length == 1 && out.head.getSeq[String](0) == Seq("a", "b"), cond)
    }
  }

  // ---- ARRAY_AGG with maxBytes ----

  test("testArrayAggMaxBytes (:1973) — values parity (maxBytes is a Druid heap cap, dropped here)") {
    // Druid's ARRAY_AGG keeps nulls in row order and sorts the DISTINCT set
    // null-first; the established Spark spellings are the struct-wrapped
    // forms (Spark's bare array_agg skips nulls and merges partials in a
    // nondeterministic partition order)
    val r = sql(
      """SELECT
        |  transform(sort_array(ARRAY_AGG(struct(__time, l1))), s -> s.l1),
        |  transform(array_sort(collect_set(struct(l1))), s -> s.l1)
        |FROM numfoo""".stripMargin).head
    assert(r.getSeq[Any](0).toList == List(7L, 325323L, 0L, null, null, null))
    assert(r.getSeq[Any](1).toList == List(null, 0L, 7L, 325323L))
  }

  // ---- MV_FILTER_ONLY / MV_ORDINAL ----

  test("testFilterOnMultiValueListFilterMatch / MatchLike (CalciteMultiValueStringQueryTest.java:1291, :1338)") {
    // Druid's scalar comparison over the filtered MV matches any element;
    // grouping on the MV dim explodes per element (LATERAL VIEW convention)
    for (pred <- Seq(
      "array_contains(MV_FILTER_ONLY(dim3, ARRAY('b')), 'b')",
      "size(filter(MV_FILTER_ONLY(dim3, ARRAY('b')), x -> x LIKE 'b%')) > 0")) {
      val out = sql(
        s"""SELECT d3, SUM(cnt) FROM numfoo
           |LATERAL VIEW explode(dim3) t AS d3
           |WHERE $pred
           |GROUP BY d3 ORDER BY 2 DESC, 1""".stripMargin)
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(out == Seq(("b", 2L), ("a", 1L), ("c", 1L)), pred)
    }
  }

  test("testMultiValueStringOrdinal (:787)") {
    val out = sql(
      """SELECT MV_ORDINAL(dim3, 2), SUM(cnt) FROM numfoo
        |GROUP BY 1 ORDER BY 2 DESC, 1""".stripMargin)
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSeq
    assert(out == Seq((None, 4L), (Some("b"), 1L), (Some("c"), 1L)))
  }

  test("testMultiValueStringOrdinalOf (:875)") {
    val out = sql(
      """SELECT MV_ORDINAL_OF(dim3, 'b'), SUM(cnt) FROM numfoo
        |GROUP BY 1 ORDER BY 2 DESC, 1""".stripMargin)
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1))).toSeq
    assert(out == Seq((None, 4L), (Some(1L), 1L), (Some(2L), 1L)))
  }
}
