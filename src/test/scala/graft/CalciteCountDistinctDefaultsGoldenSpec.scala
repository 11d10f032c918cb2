package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** CalciteQueryTest golden tranche: exact/approx COUNT DISTINCT, aggregator
  * default values over empty filtered groups (NonVectorized variants),
  * STRING_AGG maxBytes, context outer limits, and subquery caps.
  * Adaptations noted inline; the known Spark 4.1 distinct-listagg-with-
  * FILTER crash (documented in CalciteStringAggUnionGoldenSpec) is avoided
  * by spelling the filter as a subquery. Expected rows are
  * sql-compatible-mode values.
  */
class CalciteCountDistinctDefaultsGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val numfoo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   Option(Seq("a", "b")), Some(7L), 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], Option(Seq("b", "c")), Some(325323L), 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    Option(Seq("d")), Some(0L), 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   Option(Seq("")),  None: Option[Long], 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), None: Option[Seq[String]], None, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], None: Option[Seq[String]], None, 1L)
  ).toDF("__time", "dim1", "dim2", "dim3", "l1", "cnt")

  private lazy val foo2: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "דרואיד", "he", 1.0f),
    (ts("2000-01-01 00:00:00"), "druid",  "en", 1.0f),
    (ts("2000-01-01 00:00:00"), "друид",  "ru", 1.0f)
  ).toDF("__time", "dim1", "dim2", "m1")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    numfoo.createOrReplaceTempView("numfoo")
    numfoo.createOrReplaceTempView("foo")
    foo2.createOrReplaceTempView("foo2")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }

  // ---- count distinct ----

  test("testExactCountDistinct (CalciteQueryTest.java) — nulls not counted") {
    assert(single("SELECT COUNT(DISTINCT dim2) FROM foo").getLong(0) == 3L)
  }

  test("testApproxCountDistinctWhenHllDisabled / OnVectorizableSingleStringExpression") {
    assert(single("SELECT APPROX_COUNT_DISTINCT(dim2) FROM foo").getLong(0) == 3L)
    assert(single("SELECT APPROX_COUNT_DISTINCT(dim1 || 'hello') FROM foo").getLong(0) == 6L)
  }

  // ---- aggregator defaults over empty input ----

  test("testGroupByAggregatorDefaultValuesNonVectorized — filtered-out aggs are null") {
    val r = single(
      """SELECT
        | dim2,
        | ANY_VALUE(dim1) FILTER(WHERE dim1 = 'nonexistent'),
        | ANY_VALUE(l1) FILTER(WHERE dim1 = 'nonexistent'),
        | BIT_AND(l1) FILTER(WHERE dim1 = 'nonexistent'),
        | BIT_OR(l1) FILTER(WHERE dim1 = 'nonexistent'),
        | BIT_XOR(l1) FILTER(WHERE dim1 = 'nonexistent')
        |FROM numfoo WHERE dim2 = 'a' GROUP BY dim2""".stripMargin)
    assert(r.getString(0) == "a")
    assert((1 to 5).forall(r.isNullAt))
    // Spark's min_by/max_by (EARLIEST/LATEST) reject FILTER, and DISTINCT
    // listagg with FILTER hits the documented Spark 4.1 crash — both spell
    // the filter as a subquery, the same empty-group semantics
    val r2 = single(
      """SELECT EARLIEST(dim1, __time), EARLIEST(l1, __time),
        |       LATEST(dim1, __time), LATEST(l1, __time)
        |FROM numfoo WHERE dim2 = 'a' AND dim1 = 'nonexistent'""".stripMargin)
    assert((0 until 4).forall(r2.isNullAt))
    // Spark's collect_set yields [] over empty input where Druid yields
    // null — the empty-is-null contract spells as a CASE guard
    val r3 = single(
      """SELECT
        |  CASE WHEN COUNT(d3) = 0 THEN NULL ELSE ARRAY_AGG(DISTINCT d3) END,
        |  STRING_AGG(DISTINCT d3, '|')
        |FROM (SELECT explode(dim3) AS d3 FROM numfoo
        |      WHERE dim2 = 'a' AND dim1 = 'nonexistent')""".stripMargin)
    assert(r3.isNullAt(0) && r3.isNullAt(1))
  }

  test("testTimeseriesEmptyResultsAggregatorDefaultValuesNonVectorized — empty input, all null") {
    val r = single(
      """SELECT
        | ANY_VALUE(dim1), ANY_VALUE(l1),
        | EARLIEST(dim1, __time), EARLIEST(l1, __time),
        | LATEST(dim1, __time), LATEST(l1, __time),
        | BIT_AND(l1), BIT_OR(l1), BIT_XOR(l1)
        |FROM numfoo WHERE dim2 = 'nosuchvalue'""".stripMargin)
    assert((0 until 9).forall(r.isNullAt))
  }

  // ---- STRING_AGG maxBytes ----

  test("testStringAggMaxBytes — values parity (maxBytes is a Druid heap cap, dropped here)") {
    // deterministic row order via the sorted struct spelling; DISTINCT
    // sorts ascending like the reference's expected output
    val r = single(
      """SELECT
        |  array_join(transform(sort_array(ARRAY_AGG(struct(__time, l1)))
        |    , s -> s.l1), ','),
        |  array_join(filter(transform(array_sort(collect_set(struct(l1)))
        |    , s -> s.l1), x -> x IS NOT NULL), ',')
        |FROM numfoo""".stripMargin)
    assert(r.getString(0) == "7,325323,0")
    assert(r.getString(1) == "0,7,325323")
  }

  // ---- limits and subqueries ----

  test("testQueryContextOuterLimit — outer limit 4 over a DESC sort") {
    // the reference applies sqlOuterLimit=4 via query context; spelled LIMIT
    val out = sql("SELECT dim1 FROM foo GROUP BY dim1 ORDER BY dim1 DESC LIMIT 4")
      .map(_.getString(0)).toSeq
    assert(out == Seq("def", "abc", "2", "10.1"))
  }

  test("testMaxSubqueryRows — result parity for the capped subquery") {
    // the reference tests a maxSubqueryRows context error; this engine has
    // no materialized-subquery cap (Catalyst plans the semi-join), so the
    // uncapped result is asserted
    assert(single(
      """SELECT COUNT(*) FROM foo
        |WHERE SUBSTRING(dim2, 1, 1) IN (
        |  SELECT SUBSTRING(dim1, 1, 1) FROM foo WHERE dim1 <> ''
        |)""".stripMargin).getLong(0) == 3L)
  }

  test("testUsingSubqueryWithoutLimit") {
    assert(single("SELECT COUNT(*) AS cnt FROM (SELECT * FROM foo) tmpA").getLong(0) == 6L)
  }

  test("unicode dim filter over foo2 (testUnicodeFilterAndGroupBy region)") {
    val out = sql(
      """SELECT dim1, dim2, COUNT(*) FROM foo2
        |WHERE dim1 LIKE 'דר%' OR dim1 = 'друид'
        |GROUP BY dim1, dim2 ORDER BY dim2""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("דרואיד", "he", 1L), ("друид", "ru", 1L)))
  }

  test("testCommonVirtualExpressionWithDifferentValueType / testGroupByWithForceLimitPushDown") {
    assert(sql(
      """SELECT dim1, SUM(CAST(0 AS BIGINT)) s1, SUM(CAST(0 AS DOUBLE)) s2
        |FROM foo WHERE dim1 = 'none' GROUP BY dim1 LIMIT 1""".stripMargin).isEmpty)
    // the reference's limit pushdown surfaces the first (dim1, dim2) group;
    // the dimension order is spelled as an explicit sort here
    val r = single(
      "SELECT dim1, dim2, COUNT(*) FROM foo GROUP BY dim1, dim2 ORDER BY 1, 2 LIMIT 1")
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("", "a", 1L)))
  }
}
