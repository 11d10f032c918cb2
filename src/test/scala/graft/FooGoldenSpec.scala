package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.{TimeFunctions => TF}

/** Golden parity suite over the reference's SQL-test fixture `foo`
  * (reference: sql/src/test/java/org/apache/druid/sql/calcite/util/
  * CalciteTests.java:417-528 RAW_ROWS1; test pattern from
  * BaseCalciteQueryTest.testQuery — SQL → exact expected rows).
  * Semantics target: sql-compatible null mode (SURVEY §1.3).
  */
class FooGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private lazy val foo: DataFrame = {
    val rows = Seq(
      (ts("2000-01-01"), "",     Seq("a"),   Seq("a", "b"),  1.0f, 1.0, 1L),
      (ts("2000-01-02"), "10.1", Seq(),      Seq("b", "c"),  2.0f, 2.0, 1L),
      (ts("2000-01-03"), "2",    Seq(""),    Seq("d"),       3.0f, 3.0, 1L),
      (ts("2001-01-01"), "1",    Seq("a"),   Seq(""),        4.0f, 4.0, 1L),
      (ts("2001-01-02"), "def",  Seq("abc"), null,           5.0f, 5.0, 1L),
      (ts("2001-01-03"), "abc",  null,       null,           6.0f, 6.0, 1L))
    rows.toDF("__time", "dim1", "dim2", "dim3", "m1", "m2", "cnt")
  }

  test("count star and basic aggregates (CalciteQueryTest basics)") {
    val r = foo.agg(count(lit(1)), sum($"m1"), min($"m1"), max($"m2")).head()
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(1) == 21.0)
    assert(r.getFloat(2) == 1.0f)
    assert(r.getDouble(3) == 6.0)
  }

  test("year floor timeseries (FLOOR(__time TO YEAR))") {
    val out = TimeseriesQuery(granularity = PeriodGranularity("P1Y"),
      aggregations = Seq(Agg("cnt", count(lit(1)))))
      .run(foo).as[(Timestamp, Long)].collect().toSeq
    assert(out == Seq((ts("2000-01-01"), 3L), (ts("2001-01-01"), 3L)))
  }

  test("MV dim3 groupBy explodes per element, null for missing (MultiValueString semantics)") {
    val out = GroupByQuery(
      dimensions = Seq(MvDim($"dim3", "d3")),
      aggregations = Seq(Agg("cnt", count(lit(1)))),
      limitSpec = LimitSpec(orderBy = Seq($"d3".asc_nulls_first))
    ).run(foo).as[(Option[String], Long)].collect().toSeq
    assert(out == Seq(
      (None, 2L), (Some(""), 1L), (Some("a"), 1L), (Some("b"), 2L),
      (Some("c"), 1L), (Some("d"), 1L)))
  }

  test("MV filter matches if any element matches") {
    assert(foo.filter(array_contains($"dim3", "b")).count() == 2)
    assert(foo.filter(array_contains($"dim2", "a")).count() == 2)
    // null array never matches (sql-compatible)
    assert(foo.filter(array_contains($"dim3", "zzz")).count() == 0)
  }

  test("EARLIEST / LATEST time-ordered aggregates") {
    val r = foo.agg(
      min_by($"m1", $"__time").as("earliest"),
      max_by($"m1", $"__time").as("latest"),
      min_by($"dim1", $"__time").as("earliest_s")).head()
    assert(r.getFloat(0) == 1.0f)
    assert(r.getFloat(1) == 6.0f)
    assert(r.getString(2) == "")
  }

  test("grouping sets with rollup total") {
    val out = GroupByQuery(
      dimensions = Seq(ExprDim(year($"__time"), "y")),
      aggregations = Seq(Agg("s", sum($"m2"))),
      subtotalsSpec = Seq(Seq("y"), Seq()),
      limitSpec = LimitSpec(orderBy = Seq($"y".asc_nulls_last))
    ).run(foo).as[(Option[Int], Double)].collect().toSeq
    assert(out == Seq((Some(2000), 6.0), (Some(2001), 15.0), (None, 21.0)))
  }

  test("approx count distinct exact at tiny cardinality (hyperUnique parity)") {
    val r = foo.agg(approx_count_distinct($"dim1")).head().getLong(0)
    assert(r == 6L)
  }

  test("LOOKUP function on dim1 (QueryLookupOperatorConversion)") {
    val reg = new graft.sources.LookupRegistry
    reg.registerMap(spark, "lookyloo", Map("abc" -> "xabc", "def" -> "xdef"))
    val out = reg(foo, "dim1", "lookyloo", "looked")
      .select($"dim1", $"looked").as[(String, Option[String])].collect().toMap
    assert(out("abc").contains("xabc"))
    assert(out("def").contains("xdef"))
    assert(out("2").isEmpty) // missing key → null (sql-compatible)
  }

  test("numeric string casts: TRY_CAST semantics match Druid null-on-bad-cast") {
    val out = foo.select($"dim1", expr("TRY_CAST(dim1 AS DOUBLE)").as("d"))
      .as[(String, Option[Double])].collect().toMap
    assert(out("10.1").contains(10.1))
    assert(out("2").contains(2.0))
    assert(out("def").isEmpty)
    assert(out("").isEmpty)
  }

  test("null handling: filters exclude nulls, coalesce fills (sql-compatible mode)") {
    assert(foo.filter($"dim3".isNull).count() == 2)
    val filled = foo.select(coalesce($"dim2", array(lit("fallback"))).as("d2"))
      .filter(array_contains($"d2", "fallback")).count()
    assert(filled == 1)
  }

  test("time_extract and time_shift on fixture timestamps") {
    val out = foo.select(TF.timeExtract($"__time", "YEAR").as("y")).distinct()
      .as[Int].collect().sorted
    assert(out.sameElements(Array(2000, 2001)))
    val shifted = foo.select(TF.timeShift($"__time", "P1M", 1).cast("timestamp").as("t"))
      .as[Timestamp].collect().min
    assert(shifted == ts("2000-02-01"))
  }

  test("topN on dim1 by m2 descending (TopNQueryRunnerTest shape)") {
    val out = TopNQuery(Dim("dim1"), "s", 3,
      aggregations = Seq(Agg("s", sum($"m2"))))
      .run(foo).as[(String, Double)].collect().toSeq
    assert(out == Seq(("abc", 6.0), ("def", 5.0), ("1", 4.0)))
  }

  private def runFoo(json: String) =
    graft.operators.NativeQuery.run(spark, json, _ => foo)

  test("timeseries zero-fills the gap between sparse days (reference default)") {
    val out = TimeseriesQuery(granularity = PeriodGranularity("P1D"),
      aggregations = Seq(Agg("cnt", count(lit(1))), Agg("s", sum($"m1"))))
      .run(foo).as[(Timestamp, Long, Option[Double])].collect().toSeq
    // 2000-01-01 .. 2001-01-03 inclusive: 366 (leap 2000) + 3 days
    assert(out.length == 369)
    assert(out.count(_._2 > 0) == 6)
    // a filled bucket: count 0, sum null (sql-compatible aggregator empties)
    val gap = out.find(_._1 == ts("2000-06-15")).get
    assert(gap._2 == 0L && gap._3.isEmpty)
    // skipEmptyBuckets restores the sparse behavior
    val sparse = TimeseriesQuery(granularity = PeriodGranularity("P1D"),
      aggregations = Seq(Agg("cnt", count(lit(1)))), skipEmptyBuckets = true)
      .run(foo).collect()
    assert(sparse.length == 6)
  }

  test("dimension topN metric spec: lexicographic vs alphanumeric (DimensionTopNMetricSpec)") {
    def top3(ordering: String) = runFoo(
      s"""{
        "queryType": "topN", "dataSource": "foo",
        "dimension": "dim1",
        "metric": {"type": "dimension", "ordering": "$ordering"},
        "threshold": 3,
        "aggregations": [{"type": "count", "name": "cnt"}]
      }""").collect().map(_.getString(0)).toSeq
    assert(top3("lexicographic") == Seq("", "1", "10.1"))
    // alphanumeric compares digit runs numerically: 2 < 10.1
    assert(top3("alphanumeric") == Seq("", "1", "2"))
  }

  test("JSON selector on an MV dimension matches any element (foo dim3)") {
    val out = runFoo(
      """{
        "queryType": "timeseries", "dataSource": "foo",
        "granularity": "all",
        "filter": {"type": "selector", "dimension": "dim3", "value": "b"},
        "aggregations": [{"type": "count", "name": "cnt"}]
      }""").head().getLong(0)
    assert(out == 2L)
  }

  test("math-expr virtual column with case_searched and nvl over foo") {
    val out = runFoo(
      """{
        "queryType": "groupBy", "dataSource": "foo",
        "virtualColumns": [{"type": "expression", "name": "bucket",
          "expression": "case_searched(\"m2\" < 3.0, 'low', nvl(\"dim1\", 'x') == 'def', 'd', 'high')"}],
        "dimensions": ["bucket"],
        "aggregations": [{"type": "count", "name": "cnt"}],
        "limitSpec": {"type": "default", "columns": ["bucket"]}
      }""").as[(String, Long)].collect().toSeq
    assert(out == Seq(("d", 1L), ("high", 3L), ("low", 2L)))
  }
}
