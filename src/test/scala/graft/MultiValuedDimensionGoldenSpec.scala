package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.operators.NativeQuery

/** Ported vectors from the reference's MultiValuedDimensionTest.java —
  * groupBy/topN behavior over multi-value string dimensions, including the
  * automatic application of scalar expressions over MV identifiers
  * (`concat(tags, 'foo')` maps per element; `concat(tags, othertags)` takes
  * the cartesian product — Parser.applyUnappliedBindings) and the
  * scalar/array conflict rejection.
  *
  * Fixture (MultiValuedDimensionTest.java:163-168): four rows with MV
  * `tags`/`othertags`, queried as TWO identical segments (the reference
  * runs each query over the incremental index and its persisted copy), so
  * every per-row count appears doubled. The nullish sampler
  * (:194-203) adds empty/missing/[""] variants. Expectations are the
  * sql-compatible-mode branches. */
class MultiValuedDimensionGoldenSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("__time", TimestampNTZType),
    StructField("product", StringType),
    StructField("tags", ArrayType(StringType)),
    StructField("othertags", ArrayType(StringType))))

  private def ts(s: String) = java.time.LocalDateTime.parse(s)

  private def df(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)

  // MultiValuedDimensionTest.java:163-168 ("" parses as the one-element
  // [""] — the expected rows pin the "" group)
  private lazy val base = df(Seq(
    Row(ts("2011-01-12T00:00:00"), "product_1", Seq("t1", "t2", "t3"), Seq("u1", "u2")),
    Row(ts("2011-01-13T00:00:00"), "product_2", Seq("t3", "t4", "t5"), Seq("u3", "u4")),
    Row(ts("2011-01-14T00:00:00"), "product_3", Seq("t5", "t6", "t7"), Seq("u1", "u5")),
    Row(ts("2011-01-14T00:00:00"), "product_4", Seq(""), Seq("u2"))))

  // :194-203 — [], missing, and [""] variants
  private lazy val nullSampler = df(Seq(
    Row(ts("2011-01-13T00:00:00"), "product_1", Seq(), Seq("u1", "u2")),
    Row(ts("2011-01-12T00:00:00"), "product_2", null, Seq("u3", "u4")),
    Row(ts("2011-01-14T00:00:00"), "product_3", Seq(""), Seq("u1", "u5")),
    Row(ts("2011-01-15T00:00:00"), "product_4", Seq("t1", "t2", ""), Seq("u6", "u7")),
    Row(ts("2011-01-16T00:00:00"), "product_5", Seq(), Seq()),
    Row(ts("2011-01-16T00:00:00"), "product_6", null, null),
    Row(ts("2011-01-16T00:00:00"), "product_7", null, Seq()),
    Row(ts("2011-01-16T00:00:00"), "product_8", Seq(""), Seq())))

  /** two identical segments, like runQueryOnSegmentsObjs(sid1, sid2) */
  private def resolver: NativeQuery.Resolver = {
    case "xx" => base.unionAll(base)
    case "xxnull" => nullSampler.unionAll(nullSampler)
    case "xx1seg" => base
    case n => fail(s"unknown datasource $n")
  }

  private def run(json: String): DataFrame = NativeQuery.run(spark, json, resolver)

  /** rows → (dim, count) map; null dim keys map from getString(null). */
  private def counts(d: DataFrame): Map[Any, Long] =
    d.collect().map(r => (r.get(0), r.getLong(1))).toMap

  private def groupByTags(ds: String, extra: String = ""): String =
    s"""{"queryType": "groupBy", "dataSource": "$ds",
        "dimensions": ["tags"], $extra
        "aggregations": [{"type": "count", "name": "count"}]}"""

  test("testGroupByNoFilter (MultiValuedDimensionTest.java:222)") {
    assert(counts(run(groupByTags("xx"))) == Map(
      "" -> 2L, "t1" -> 2L, "t2" -> 2L, "t3" -> 4L, "t4" -> 2L,
      "t5" -> 4L, "t6" -> 2L, "t7" -> 2L))
  }

  test("testGroupByWithDimFilter (:263) — selector over MV matches any element") {
    val got = counts(run(groupByTags("xx",
      """"filter": {"type": "selector", "dimension": "tags", "value": "t3"},""")))
    assert(got == Map("t1" -> 2L, "t2" -> 2L, "t3" -> 4L, "t4" -> 2L, "t5" -> 2L))
  }

  test("testGroupByWithDimFilterEmptyResults (:296) — [] groups as null") {
    val got = counts(run(groupByTags("xxnull",
      """"filter": {"type": "in", "dimension": "product", "values": ["product_5"]},""")))
    assert(got == Map((null: Any) -> 2L))
  }

  test("testGroupByWithDimFilterNullishResults (:325) — [] and missing are null, [\"\"] is \"\"") {
    val got = counts(run(groupByTags("xxnull",
      """"filter": {"type": "in", "dimension": "product",
          "values": ["product_5", "product_6", "product_8"]},""")))
    assert(got == Map((null: Any) -> 4L, "" -> 2L))
  }

  test("testGroupByWithDimFilterAndWithFilteredDimSpec (:369)") {
    val got = counts(run(
      """{"queryType": "groupBy", "dataSource": "xx",
          "dimensions": [{"type": "regexFiltered",
            "delegate": {"type": "default", "dimension": "tags", "outputName": "tags"},
            "dimension": "tags", "outputName": "tags", "pattern": "t3"}],
          "filter": {"type": "selector", "dimension": "tags", "value": "t3"},
          "aggregations": [{"type": "count", "name": "count"}]}"""))
    assert(got == Map("t3" -> 4L))
  }

  private def exprGroupBy(ds: String, expr: String, out: String = "texpr",
      extra: String = "", outputType: String = "STRING"): String =
    s"""{"queryType": "groupBy", "dataSource": "$ds",
        "virtualColumns": [{"type": "expression", "name": "$out",
          "expression": "${expr.replace("\"", "\\\"")}", "outputType": "$outputType"}],
        "dimensions": ["$out"], $extra
        "aggregations": [{"type": "count", "name": "count"}]}"""

  test("testGroupByExpression (:398) — map over MV, [\"\"] element maps too") {
    val got = counts(run(exprGroupBy("xx", "map(x -> concat(x, 'foo'), tags)")))
    assert(got == Map(
      "foo" -> 2L, "t1foo" -> 2L, "t2foo" -> 2L, "t3foo" -> 4L,
      "t4foo" -> 2L, "t5foo" -> 4L, "t6foo" -> 2L, "t7foo" -> 2L))
  }

  test("testGroupByExpressionMultiMulti (:452) — cartesian_map, limit keeps the dim-sorted head") {
    val got = run(exprGroupBy("xx", "cartesian_map((x,y) -> concat(x, y), tags, othertags)",
      extra = """"limitSpec": {"type": "default", "limit": 5},"""))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq("t1u1" -> 2L, "t1u2" -> 2L, "t2u1" -> 2L, "t2u2" -> 2L, "t3u1" -> 2L))
  }

  test("testGroupByExpressionMultiMultiAuto (:558) — unapplied id inside a map lambda lifts to cartesian") {
    val got = run(exprGroupBy("xx", "map((x) -> concat(x, othertags), tags)",
      extra = """"limitSpec": {"type": "default", "limit": 5},"""))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq("t1u1" -> 2L, "t1u2" -> 2L, "t2u1" -> 2L, "t2u2" -> 2L, "t3u1" -> 2L))
  }

  test("testGroupByExpressionMultiMultiAutoAuto (:603) — two scalar-used MV ids lift to cartesian") {
    val got = run(exprGroupBy("xx", "concat(tags, othertags)",
      extra = """"limitSpec": {"type": "default", "limit": 5},"""))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq("t1u1" -> 2L, "t1u2" -> 2L, "t2u1" -> 2L, "t2u2" -> 2L, "t3u1" -> 2L))
  }

  test("testGroupByExpressionMultiMultiAutoAutoDupeIdentifier (:648) — same id maps elementwise, no product") {
    val got = run(exprGroupBy("xx", "concat(tags, tags)",
      extra = """"limitSpec": {"type": "default", "limit": 5,
        "columns": [{"dimension": "count", "direction": "descending"}]},"""))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // count-descending with the reference's STABLE dim-order tie-break
    assert(got == Seq("t3t3" -> 4L, "t5t5" -> 4L, "" -> 2L, "t1t1" -> 2L, "t2t2" -> 2L))
  }

  test("testGroupByExpressionMultiMultiAutoAutoWithFilter (:696) — selector on the lifted VC") {
    val got = run(exprGroupBy("xx", "concat(tags, othertags)",
      extra = """"filter": {"type": "selector", "dimension": "texpr", "value": "t1u1"},
        "limitSpec": {"type": "default", "limit": 5},"""))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq("t1u1" -> 2L, "t1u2" -> 2L, "t2u1" -> 2L, "t2u2" -> 2L, "t3u1" -> 2L))
  }

  test("testGroupByExpressionAuto (:742) — concat(tags, 'foo') auto-maps per element") {
    val got = counts(run(exprGroupBy("xx", "concat(tags, 'foo')", out = "tt")))
    assert(got == Map(
      "foo" -> 2L, "t1foo" -> 2L, "t2foo" -> 2L, "t3foo" -> 4L,
      "t4foo" -> 2L, "t5foo" -> 4L, "t6foo" -> 2L, "t7foo" -> 2L))
  }

  test("testGroupByExpressionArrayExpressionFilter (:787) — array_offset_of LONG virtual column") {
    // the reference declares BOTH the virtual column and the dimension
    // ColumnType.LONG (a bare dim would be STRING-typed)
    val got = counts(run(
      """{"queryType": "groupBy", "dataSource": "xx",
          "virtualColumns": [{"type": "expression", "name": "tt",
            "expression": "array_offset_of(tags, 't2')", "outputType": "LONG"}],
          "dimensions": [{"type": "default", "dimension": "tt",
            "outputName": "tt", "outputType": "LONG"}],
          "aggregations": [{"type": "count", "name": "count"}]}"""))
    assert(got == Map((null: Any) -> 6L, 1L -> 2L))
  }

  test("testGroupByExpressionArrayFnArg (:837) — lambda identifier shadows the column") {
    val got = counts(run(exprGroupBy("xx",
      "array_to_string(map(tags -> concat('foo', tags), tags), ', ')", out = "tt")))
    assert(got == Map(
      "foo" -> 2L, "foot1, foot2, foot3" -> 2L,
      "foot3, foot4, foot5" -> 2L, "foot5, foot6, foot7" -> 2L))
  }

  test("testGroupByExpressionAutoArrayFnArg (:880) — lift lands on the ARRAY-SLOT argument") {
    val got = counts(run(exprGroupBy("xx",
      "array_to_string(concat('foo', tags), ', ')", out = "tt")))
    assert(got == Map(
      "foo" -> 2L, "foot1, foot2, foot3" -> 2L,
      "foot3, foot4, foot5" -> 2L, "foot5, foot6, foot7" -> 2L))
  }

  test("testGroupByExpressionFoldArrayToString (:923)") {
    val got = counts(run(exprGroupBy("xx",
      "fold((tag, acc) -> concat(acc, tag), tags, '')", out = "tt")))
    assert(got == Map(
      "" -> 2L, "t1t2t3" -> 2L, "t3t4t5" -> 2L, "t5t6t7" -> 2L))
  }

  test("testGroupByExpressionFoldArrayToStringWithConcats (:974) — case_searched inside the fold") {
    val got = counts(run(exprGroupBy("xx",
      "fold((tag, acc) -> concat(concat(acc, case_searched(acc == '', '', ', '), concat('foo', tag))), tags, '')",
      out = "tt")))
    assert(got == Map(
      "foo" -> 2L, "foot1, foot2, foot3" -> 2L,
      "foot3, foot4, foot5" -> 2L, "foot5, foot6, foot7" -> 2L))
  }

  test("testGroupByExpressionMultiConflicting (:1018) — id used as both scalar and array rejected") {
    val e = intercept[Exception](
      run(exprGroupBy("xx", "concat(map((x) -> concat(x, othertags), tags), tags)")).collect())
    assert(e.getMessage.contains("used as both scalar and array variables"), e.getMessage)
  }

  test("testGroupByExpressionMultiConflictingAlso (:1053)") {
    val e = intercept[Exception](
      run(exprGroupBy("xx", "array_concat(tags, array_append(othertags, tags))")).collect())
    assert(e.getMessage.contains("used as both scalar and array variables"), e.getMessage)
  }

  test("expression filter auto-applies over an MV column: ANY truthy element matches (ExpressionFilter.java matches())") {
    val got = counts(run(groupByTags("xx",
      """"filter": {"type": "expression", "expression": "tags == 't3'"},""")))
    assert(got == Map("t1" -> 2L, "t2" -> 2L, "t3" -> 4L, "t4" -> 2L, "t5" -> 2L))
    // null / empty MV rows never match a lifted expression filter
    val none = counts(run(groupByTags("xxnull",
      """"filter": {"type": "expression", "expression": "tags == 't9'"},""")))
    assert(none.isEmpty)
  }

  test("testTopNWithDimFilterAndWithFilteredDimSpec (:1088) — single segment") {
    val got = run(
      """{"queryType": "topN", "dataSource": "xx1seg",
          "dimension": {"type": "listFiltered",
            "delegate": {"type": "default", "dimension": "tags", "outputName": "tags"},
            "dimension": "tags", "outputName": "tags", "values": ["t3"]},
          "metric": "count", "threshold": 5,
          "filter": {"type": "selector", "dimension": "tags", "value": "t3"},
          "aggregations": [{"type": "count", "name": "count"}]}""")
      .collect().map(r => (r.getAs[String]("tags"), r.getAs[Long]("count"))).toSeq
    assert(got == Seq("t3" -> 2L))
  }

  test("testTopNExpression (:1135) — expression VC topN, ties break lexicographically") {
    val got = run(
      """{"queryType": "topN", "dataSource": "xx1seg",
          "virtualColumns": [{"type": "expression", "name": "texpr",
            "expression": "map(x -> concat(x, 'foo'), tags)", "outputType": "STRING"}],
          "dimension": "texpr", "metric": "count", "threshold": 15,
          "aggregations": [{"type": "count", "name": "count"}]}""")
      .collect().map(r => (r.getAs[String]("texpr"), r.getAs[Long]("count"))).toSeq
    assert(got == Seq(
      "t3foo" -> 2L, "t5foo" -> 2L, "foo" -> 1L, "t1foo" -> 1L,
      "t2foo" -> 1L, "t4foo" -> 1L, "t6foo" -> 1L, "t7foo" -> 1L))
  }

  test("testTopNExpressionAutoTransform (:1200) — auto-mapped concat in a topN VC") {
    val got = run(
      """{"queryType": "topN", "dataSource": "xx1seg",
          "virtualColumns": [{"type": "expression", "name": "texpr",
            "expression": "concat(tags, 'foo')", "outputType": "STRING"}],
          "dimension": "texpr", "metric": "count", "threshold": 15,
          "aggregations": [{"type": "count", "name": "count"}]}""")
      .collect().map(r => (r.getAs[String]("texpr"), r.getAs[Long]("count"))).toSeq
    assert(got == Seq(
      "t3foo" -> 2L, "t5foo" -> 2L, "foo" -> 1L, "t1foo" -> 1L,
      "t2foo" -> 1L, "t4foo" -> 1L, "t6foo" -> 1L, "t7foo" -> 1L))
  }
}
