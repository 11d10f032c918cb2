package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Sources

class QueryDslSpec extends SparkSpecBase {
  import spark.implicits._

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs at sf0.001 and returns a DataFrame") {
    // events-based queries need the nanos session config, set in the base
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf()).count()
      withClue(s"query $name:") { assert(n >= 0) }
    }
  }

  test("oracleSql keys are a subset of queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
  }

  test("timeseries grandTotal appends exactly one all-time row") {
    val q = TimeseriesQuery(
      timeColumn = "l_shipdate",
      granularity = PeriodGranularity("P1Y"),
      aggregations = Seq(Agg("cnt", count(lit(1)))),
      grandTotal = true)
    val rows = q.run(Sources.table(spark, sf(), "lineitem")).collect()
    val totals = rows.filter(_.isNullAt(0))
    assert(totals.length == 1)
    assert(totals.head.getLong(1) == rows.filter(!_.isNullAt(0)).map(_.getLong(1)).sum)
    assert(rows.last.isNullAt(0)) // grand total sorts last
  }

  test("timeseries grandTotal emits the totals row even for EMPTY input (r17)") {
    // the reference appends the grand-total row unconditionally
    // (TimeseriesQueryQueryToolChest.mergeResults): aggregator nils —
    // count 0, sum null — under a null timestamp
    val q = TimeseriesQuery(
      timeColumn = "l_shipdate",
      granularity = PeriodGranularity("P1Y"),
      filter = col("l_quantity") < -1, // matches nothing
      aggregations = Seq(Agg("cnt", count(lit(1))),
        Agg("sq", sum(col("l_quantity")))),
      grandTotal = true)
    val rows = q.run(Sources.table(spark, sf(), "lineitem")).collect()
    assert(rows.length == 1)
    assert(rows.head.isNullAt(0))      // null bucket timestamp
    assert(rows.head.getLong(1) == 0L) // count nil = 0
    assert(rows.head.isNullAt(2))      // sum nil = null
  }

  test("timeseries grandTotal gap-fill matches the spine zero-fill (r17)") {
    // sparse input with a 3-year hole: the per-gap window fill must emit
    // the identical bucket spine (count 0 for missing years) the spine
    // join produced, plus the total row
    val df = Seq("1994-02-01", "1994-07-15", "1998-03-03")
      .map(d => java.sql.Timestamp.valueOf(d + " 00:00:00")).toDF("t")
    val q = TimeseriesQuery(
      timeColumn = "t",
      granularity = PeriodGranularity("P1Y"),
      aggregations = Seq(Agg("cnt", count(lit(1)))),
      grandTotal = true)
    val rows = q.run(df).collect()
    val buckets = rows.filter(!_.isNullAt(0)).map(r =>
      (r.get(0).toString.take(4), r.getLong(1)))
    assert(buckets.toSeq == Seq(("1994", 2L), ("1995", 0L), ("1996", 0L),
      ("1997", 0L), ("1998", 1L)))
    val totals = rows.filter(_.isNullAt(0))
    assert(totals.length == 1 && totals.head.getLong(1) == 3L)
    assert(rows.last.isNullAt(0))
  }

  test("topN exact matches groupBy+orderBy+limit") {
    val df = Sources.table(spark, sf(), "lineitem")
    val topn = TopNQuery(Dim("l_suppkey"), "s", 3,
      aggregations = Seq(Agg("s", sum(col("l_quantity"))))).run(df).collect()
    val manual = df.groupBy("l_suppkey").agg(sum("l_quantity").as("s"))
      .orderBy(col("s").desc, col("l_suppkey").asc).limit(3).collect()
    assert(topn.map(_.toString).sameElements(manual.map(_.toString)))
  }

  test("multi-value dim explodes one group per element, null for empty") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("a")), (3L, Seq.empty[String]))
      .toDF("id", "mv")
    val out = GroupByQuery(
      dimensions = Seq(MvDim(col("mv"), "v")),
      aggregations = Seq(Agg("cnt", count(lit(1)))),
      limitSpec = LimitSpec(orderBy = Seq(col("v").asc_nulls_first))
    ).run(df).as[(Option[String], Long)].collect()
    assert(out.toSeq == Seq((None, 1L), (Some("a"), 2L), (Some("b"), 1L)))
  }

  test("scan applies offset before limit") {
    val df = Sources.table(spark, sf(), "orders")
    val all = ScanQuery(columns = Seq("o_orderkey", "o_orderdate"),
      timeColumn = "o_orderdate", order = Some(true), limit = Some(20)).run(df)
      .collect().map(_.getLong(0))
    val off = ScanQuery(columns = Seq("o_orderkey", "o_orderdate"),
      timeColumn = "o_orderdate", order = Some(true), limit = Some(10), offset = 10).run(df)
      .collect().map(_.getLong(0))
    assert(off.sameElements(all.drop(10)))
  }

  test("search query finds values across dimensions") {
    val out = SearchQuery(Seq("o_orderpriority", "o_orderstatus"), _.contains("URGENT"))
      .run(Sources.table(spark, sf(), "orders")).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(1).contains("URGENT")))
  }

  test("lookup registry enriches via broadcast join") {
    val reg = new graft.sources.LookupRegistry
    reg.registerMap(spark, "status", Map("F" -> "finished", "O" -> "open", "P" -> "pending"))
    val out = reg(Sources.table(spark, sf(), "orders"), "o_orderstatus", "status", "status_name")
    assert(out.filter(col("status_name").isNull).count() == 0)
    assert(out.count() == Sources.table(spark, sf(), "orders").count())
  }
}
