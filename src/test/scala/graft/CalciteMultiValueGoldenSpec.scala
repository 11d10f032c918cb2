package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** Round-6 golden tranche: CalciteMultiValueStringQueryTest.java (1,605 LoC
  * of MV_* semantics over the numfoo multi-value dim3 column).
  *
  * Porting rules (same sql-compatible-null-mode expectations as
  * CalciteGoldenSpec, with documented adaptations):
  *   - Druid GROUP BY on an MV value UNNESTS one group per element
  *     (GroupByQueryEngineV2.java:603); Spark SQL spells that explicitly:
  *     `LATERAL VIEW OUTER explode(...)`.
  *   - A Druid selector filter on an MV virtual column matches ANY element;
  *     spelled `array_contains(transform(...))` / `exists(...)`.
  *   - Druid maps scalar fns (concat) element-wise over MV cells; spelled
  *     `transform(dim3, x -> ...)`.
  *   - Scan results stringify MV cells; spelled `to_json(...)`. Druid
  *     renders a null cell as "[null]" where this engine yields SQL NULL
  *     (scalar-null vs boxed-null rendering only — same null semantics).
  *   - Druid's single-orderby ties resolve by dimension ascending with
  *     nulls first; made explicit in ORDER BY so row order is deterministic.
  *
  * Fixture = CalciteTests.java:417-464 RAW_ROWS1 (dim3 per row: ["a","b"],
  * ["b","c"], ["d"], [""], [] -> null in the segment, absent -> null).
  */
class CalciteMultiValueGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val numfoo: DataFrame = {
    val rows = Seq(
      (ts("2000-01-01 00:00:00"), "",     "a",   Seq("a", "b"), 1L),
      (ts("2000-01-02 00:00:00"), "10.1", null,  Seq("b", "c"), 1L),
      (ts("2000-01-03 00:00:00"), "2",    "",    Seq("d"),      1L),
      (ts("2001-01-01 00:00:00"), "1",    "a",   Seq(""),       1L),
      (ts("2001-01-02 00:00:00"), "def",  "abc", null,          1L),
      (ts("2001-01-03 00:00:00"), "abc",  null,  null,          1L))
    rows.toDF("__time", "dim1", "dim2", "dim3", "cnt")
  }

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    numfoo.createOrReplaceTempView("numfoo")
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }

  private def pairs(q: String): Seq[(Option[String], Long)] =
    sql(q).map(r => (Option(r.getString(0)), r.getLong(1))).toSeq

  // ---- MV columns used like strings (element-wise scalar fns) ----

  test("testMultiValueStringWorksLikeStringGroupBy (CalciteMultiValueStringQueryTest.java:56)") {
    val out = pairs(
      """SELECT concat(v, 'foo') AS c, SUM(cnt) FROM numfoo
        |LATERAL VIEW OUTER explode(dim3) t AS v
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq(
      (None, 2L), (Some("bfoo"), 2L), (Some("afoo"), 1L),
      (Some("cfoo"), 1L), (Some("dfoo"), 1L), (Some("foo"), 1L)))
  }

  test("testMultiValueStringWorksLikeStringGroupByWithFilter (:137)") {
    val out = pairs(
      """SELECT concat(v, 'foo') AS c, SUM(cnt) FROM numfoo
        |LATERAL VIEW OUTER explode(dim3) t AS v
        |WHERE array_contains(transform(dim3, x -> concat(x, 'foo')), 'bfoo')
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq((Some("bfoo"), 2L), (Some("afoo"), 1L), (Some("cfoo"), 1L)))
  }

  test("testMultiValueStringWorksLikeStringScan (:177)") {
    val out = sql("SELECT to_json(transform(dim3, x -> concat(x, 'foo'))) FROM numfoo")
      .map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(
      Some("""["afoo","bfoo"]"""), Some("""["bfoo","cfoo"]"""), Some("""["dfoo"]"""),
      Some("""["foo"]"""), None, None))
  }

  test("testMultiValueStringWorksLikeStringSelfConcatScan (:205)") {
    val out = sql("SELECT to_json(transform(dim3, x -> concat(x, '-lol-', x))) FROM numfoo")
      .map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(
      Some("""["a-lol-a","b-lol-b"]"""), Some("""["b-lol-b","c-lol-c"]"""),
      Some("""["d-lol-d"]"""), Some("""["-lol-"]"""), None, None))
  }

  test("testMultiValueStringWorksLikeStringScanWithFilter (:233)") {
    val out = sql(
      """SELECT to_json(transform(dim3, x -> concat(x, 'foo'))) FROM numfoo
        |WHERE array_contains(transform(dim3, x -> concat(x, 'foo')), 'bfoo')""".stripMargin)
      .map(_.getString(0)).toSeq
    assert(out == Seq("""["afoo","bfoo"]""", """["bfoo","cfoo"]"""))
  }

  // ---- MV_OVERLAP / MV_CONTAINS filters ----

  test("testMultiValueStringOverlapFilter (:258)") {
    val out = sql("SELECT to_json(dim3) FROM numfoo WHERE MV_OVERLAP(dim3, ARRAY('a','b')) LIMIT 5")
      .map(_.getString(0)).toSeq
    assert(out == Seq("""["a","b"]""", """["b","c"]"""))
  }

  test("testMultiValueStringOverlapFilterNonLiteral (:281)") {
    val out = sql("SELECT to_json(dim3) FROM numfoo WHERE MV_OVERLAP(dim3, ARRAY(dim2)) LIMIT 5")
      .map(_.getString(0)).toSeq
    assert(out == Seq("""["a","b"]"""))
  }

  test("testMultiValueStringContainsFilter — ARRAY arg means contains-ALL (:301)") {
    val out = sql("SELECT to_json(dim3) FROM numfoo WHERE MV_CONTAINS(dim3, ARRAY('a','b')) LIMIT 5")
      .map(_.getString(0)).toSeq
    assert(out == Seq("""["a","b"]"""))
  }

  test("testMultiValueStringContainsArrayOfOneElement / OfNonLiteral (:328, :350)") {
    assert(sql("SELECT to_json(dim3) FROM numfoo WHERE MV_CONTAINS(dim3, ARRAY('a')) LIMIT 5")
      .map(_.getString(0)).toSeq == Seq("""["a","b"]"""))
    assert(sql("SELECT to_json(dim3) FROM numfoo WHERE MV_CONTAINS(dim3, ARRAY(dim2)) LIMIT 5")
      .map(_.getString(0)).toSeq == Seq("""["a","b"]"""))
  }

  // ---- element access / slicing ----

  test("testMultiValueStringSlice (:372)") {
    val out = sql("SELECT to_json(MV_SLICE(dim3, 1)) FROM numfoo")
      .map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(
      Some("""["b"]"""), Some("""["c"]"""), Some("[]"), Some("[]"), None, None))
  }

  test("testMultiValueStringLength (:399)") {
    val out = sql(
      """SELECT dim1, MV_LENGTH(dim3) AS l, SUM(cnt) FROM numfoo
        |GROUP BY 1, 2 ORDER BY 2 DESC NULLS LAST, 1 ASC""".stripMargin)
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getInt(1)), r.getLong(2))).toSeq
    assert(out == Seq(
      ("", Some(2), 1L), ("10.1", Some(2), 1L), ("1", Some(1), 1L),
      ("2", Some(1), 1L), ("abc", None, 1L), ("def", None, 1L)))
  }

  test("testMultiValueStringOffset / Ordinal as group keys (:748, :787)") {
    val expected = Seq((None, 4L), (Some("b"), 1L), (Some("c"), 1L))
    assert(pairs(
      """SELECT MV_OFFSET(dim3, 1) AS v, SUM(cnt) FROM numfoo
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin) == expected)
    assert(pairs(
      """SELECT MV_ORDINAL(dim3, 2) AS v, SUM(cnt) FROM numfoo
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin) == expected)
  }

  test("testMultiValueStringOffsetOf / OrdinalOf (:826, :875)") {
    def longPairs(q: String): Seq[(Option[Long], Long)] =
      sql(q).map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1))).toSeq
    assert(longPairs(
      """SELECT MV_OFFSET_OF(dim3, 'b') AS v, SUM(cnt) FROM numfoo
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin) ==
      Seq((None, 4L), (Some(0L), 1L), (Some(1L), 1L)))
    assert(longPairs(
      """SELECT MV_ORDINAL_OF(dim3, 'b') AS v, SUM(cnt) FROM numfoo
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin) ==
      Seq((None, 4L), (Some(1L), 1L), (Some(2L), 1L)))
  }

  // ---- append / prepend / concat (unnested groupBy over the result) ----

  test("testMultiValueStringAppend (:442)") {
    val out = pairs(
      """SELECT v, SUM(cnt) FROM numfoo
        |LATERAL VIEW OUTER explode(MV_APPEND(dim3, 'foo')) t AS v
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq(
      (Some("foo"), 4L), (None, 2L), (Some("b"), 2L), (Some(""), 1L),
      (Some("a"), 1L), (Some("c"), 1L), (Some("d"), 1L)))
  }

  test("testMultiValueStringPrepend (:502)") {
    val out = pairs(
      """SELECT v, SUM(cnt) FROM numfoo
        |LATERAL VIEW OUTER explode(MV_PREPEND('foo', dim3)) t AS v
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq(
      (Some("foo"), 4L), (None, 2L), (Some("b"), 2L), (Some(""), 1L),
      (Some("a"), 1L), (Some("c"), 1L), (Some("d"), 1L)))
  }

  test("testMultiValueStringPrependAppend (:562)") {
    val out = sql(
      """SELECT MV_TO_STRING(MV_PREPEND('foo', dim3), ',') AS p,
        |       MV_TO_STRING(MV_APPEND(dim3, 'foo'), ',') AS a, SUM(cnt)
        |FROM numfoo GROUP BY 1, 2 ORDER BY 3 DESC, 1 ASC NULLS FIRST""".stripMargin)
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2))).toSeq
    assert(out == Seq(
      (None, None, 2L),
      (Some("foo,"), Some(",foo"), 1L),
      (Some("foo,a,b"), Some("a,b,foo"), 1L),
      (Some("foo,b,c"), Some("b,c,foo"), 1L),
      (Some("foo,d"), Some("d,foo"), 1L)))
  }

  test("testMultiValueStringConcat (:626)") {
    val out = pairs(
      """SELECT v, SUM(cnt) FROM numfoo
        |LATERAL VIEW OUTER explode(MV_CONCAT(dim3, dim3)) t AS v
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq(
      (Some("b"), 4L), (None, 2L), (Some(""), 2L), (Some("a"), 2L),
      (Some("c"), 2L), (Some("d"), 2L)))
  }

  // ---- to-string round trips ----

  test("testMultiValueStringToString (:925)") {
    val out = pairs(
      """SELECT MV_TO_STRING(dim3, ',') AS s, SUM(cnt) FROM numfoo
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq(
      (None, 2L), (Some(""), 1L), (Some("a,b"), 1L), (Some("b,c"), 1L), (Some("d"), 1L)))
  }

  test("testMultiValueStringToStringToMultiValueString (:981)") {
    val out = pairs(
      """SELECT v, SUM(cnt) FROM numfoo
        |LATERAL VIEW OUTER explode(STRING_TO_MV(CONCAT(MV_TO_STRING(dim3, ','), ',d'), ',')) t AS v
        |WHERE MV_LENGTH(dim3) > 0
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq(
      (Some("d"), 5L), (Some("b"), 2L), (Some(""), 1L), (Some("a"), 1L), (Some("c"), 1L)))
  }

  // ---- MV_FILTER_ONLY / MV_FILTER_NONE (ListFilteredVirtualColumn) ----

  test("testMultiValueListFilter (:1042)") {
    val out = pairs(
      """SELECT v, SUM(cnt) FROM numfoo
        |LATERAL VIEW OUTER explode(MV_FILTER_ONLY(dim3, ARRAY('b'))) t AS v
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq((None, 4L), (Some("b"), 2L)))
  }

  test("testMultiValueListFilterDeny (:1087)") {
    val out = pairs(
      """SELECT v, SUM(cnt) FROM numfoo
        |LATERAL VIEW OUTER explode(MV_FILTER_NONE(dim3, ARRAY('b'))) t AS v
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq(
      (None, 2L), (Some(""), 1L), (Some("a"), 1L), (Some("c"), 1L), (Some("d"), 1L)))
  }

  test("testMultiValueListFilterComposed — empty filter result is null, not [] (:1142)") {
    val out = sql(
      """SELECT MV_LENGTH(MV_FILTER_ONLY(dim3, ARRAY('b'))) AS l, SUM(cnt) FROM numfoo
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin)
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getLong(1))).toSeq
    // the reference's own comment (:1188): the native list-filtered virtual
    // column treats a 0-length result as null — hence 4 nulls, not 2 zeros
    assert(out == Seq((None, 4L), (Some(1), 2L)))
  }

  test("testMultiValueListFilterComposedDeny (:1199)") {
    val out = sql(
      """SELECT MV_LENGTH(MV_FILTER_NONE(dim3, ARRAY('b'))) AS l, SUM(cnt) FROM numfoo
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin)
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getLong(1))).toSeq
    assert(out == Seq((Some(1), 4L), (None, 2L)))
  }

  test("testFilterOnMultiValueListFilterNoMatch / Match / MatchLike (:1248, :1291, :1338)") {
    assert(sql(
      """SELECT v, SUM(cnt) FROM numfoo LATERAL VIEW OUTER explode(dim3) t AS v
        |WHERE array_contains(MV_FILTER_ONLY(dim3, ARRAY('b')), 'a')
        |GROUP BY 1""".stripMargin).isEmpty)
    val expected = Seq((Some("b"), 2L), (Some("a"), 1L), (Some("c"), 1L))
    assert(pairs(
      """SELECT v, SUM(cnt) FROM numfoo LATERAL VIEW OUTER explode(dim3) t AS v
        |WHERE array_contains(MV_FILTER_ONLY(dim3, ARRAY('b')), 'b')
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin) == expected)
    assert(pairs(
      """SELECT v, SUM(cnt) FROM numfoo LATERAL VIEW OUTER explode(dim3) t AS v
        |WHERE exists(MV_FILTER_ONLY(dim3, ARRAY('b')), x -> x LIKE 'b%')
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin) == expected)
  }

  // ---- MV_TO_ARRAY: grouping by true arrays ----

  test("testMultiValueToArrayGroupAsArrayWithMultiValueDimension (:1385)") {
    val out = pairs(
      """SELECT to_json(MV_TO_ARRAY(dim3)) AS g, SUM(cnt) FROM numfoo
        |GROUP BY MV_TO_ARRAY(dim3) ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin)
    assert(out == Seq(
      (None, 2L), (Some("""[""]"""), 1L), (Some("""["a","b"]"""), 1L),
      (Some("""["b","c"]"""), 1L), (Some("""["d"]"""), 1L)))
  }

  test("testMultiValueToArrayGroupAsArrayWithSingleValueDim + limit variant (:1437, :1491)") {
    val expected = Seq(
      (Some("""[""]"""), 1L), (Some("""["1"]"""), 1L), (Some("""["10.1"]"""), 1L),
      (Some("""["2"]"""), 1L), (Some("""["abc"]"""), 1L), (Some("""["def"]"""), 1L))
    assert(pairs(
      """SELECT to_json(MV_TO_ARRAY(dim1)) AS g, SUM(cnt) FROM numfoo
        |GROUP BY MV_TO_ARRAY(dim1) ORDER BY 2 DESC, 1 ASC NULLS FIRST""".stripMargin) == expected)
    assert(pairs(
      """SELECT to_json(MV_TO_ARRAY(dim1)) AS g, SUM(cnt) FROM numfoo
        |GROUP BY MV_TO_ARRAY(dim1) ORDER BY 2 DESC, 1 ASC NULLS FIRST LIMIT 10""".stripMargin)
      == expected)
  }

  test("testMultiValueToArrayMoreArgs / NoArgs reject bad arity (:1547, :1559)") {
    val e1 = intercept[Exception](sql("SELECT MV_TO_ARRAY(dim3, dim3) FROM numfoo"))
    assert(e1.getMessage.contains("Invalid number of arguments"))
    val e2 = intercept[Exception](sql("SELECT MV_TO_ARRAY() FROM numfoo"))
    assert(e2.getMessage.contains("Invalid number of arguments"))
  }

  // ---- completion cases. Non-goal: testMultiValueStringConcatBackwards-
  // Compat0dot22andOlder (:684) exercises the pre-0.23 homogenize-null-MV
  // legacy flag (ExpressionProcessing.initializeForHomogenizeNullMultiValue-
  // Strings); this engine implements only the modern semantics, tested by
  // testMultiValueStringConcat (:626) above. ----

  test("testMultiValueToArrayArgsWithMultiValueDimFunc (:1571) — MV-expression arg rejects") {
    // concat(array, string) fails type checking on both engines
    intercept[Exception](sql("SELECT MV_TO_ARRAY(concat(dim3,'c')) FROM numfoo"))
  }

  test("testMultiValueToArrayArgsWithSingleDimFunc / WithConstant / WithArray (:1580, :1589, :1598) — SUPERSET") {
    // the reference restricts MV_TO_ARRAY to direct column references and
    // throws on these; here MV and ARRAY are one type family, so string
    // expressions wrap and arrays pass through — a deliberate superset
    val fn = sql("SELECT to_json(MV_TO_ARRAY(concat(dim1,'c'))) FROM numfoo LIMIT 1")
    assert(fn.head.getString(0) == """["c"]""")
    val arr = sql("SELECT MV_TO_ARRAY(Array(1,2)) FROM numfoo LIMIT 1")
    assert(arr.head.getSeq[Int](0) == Seq(1, 2))
  }

  test("testMultiValueStringGroupByDoesNotWork (:113) — unnesting disabled raises") {
    registered
    // groupByEnableMultiValueUnnesting=false (GroupByQueryConfig) — the
    // facade maps the context key to PlannerChecks.requireNoMultiValueUnnesting
    val df = spark.sql(
      """SELECT concat(v, 'foo') AS c, SUM(cnt) FROM numfoo
        |LATERAL VIEW OUTER explode(dim3) t AS v GROUP BY 1""".stripMargin)
    val e = intercept[IllegalStateException] {
      graft.plans.PlannerChecks.requireNoMultiValueUnnesting(df)
    }
    assert(e.getMessage ==
      "Encountered multi-value dimension [v] that cannot be processed with " +
        "'groupByEnableMultiValueUnnesting' set to false. Consider setting " +
        "'groupByEnableMultiValueUnnesting' to true in your query context.")
    // a plain (non-unnesting) groupBy stays legal under the flag
    graft.plans.PlannerChecks.requireNoMultiValueUnnesting(
      spark.sql("SELECT dim2, SUM(cnt) FROM numfoo GROUP BY 1"))
  }
}
