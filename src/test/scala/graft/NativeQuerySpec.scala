package graft

import org.apache.spark.sql.DataFrame
import graft.operators.NativeQuery

class NativeQuerySpec extends SparkSpecBase {
  import spark.implicits._

  private def resolver: NativeQuery.Resolver =
    name => spark.read.parquet(s"${sf()}/$name.parquet")

  private def run(json: String): DataFrame = NativeQuery.run(spark, json, resolver)

  test("nested query datasource + subtotals grouping sets") {
    val df = run(
      """{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": {
          "queryType": "scan", "dataSource": "lineitem",
          "timeColumn": "l_shipdate",
          "columns": ["l_returnflag", "l_linestatus", "l_quantity"]
        }},
        "timeColumn": "l_shipdate",
        "dimensions": ["l_returnflag", "l_linestatus"],
        "aggregations": [{"type": "count", "name": "cnt"}],
        "subtotalsSpec": [["l_returnflag", "l_linestatus"], ["l_returnflag"], []]
      }""")
    val rows = df.collect()
    // 6 (full) + 3 (by flag) + 1 (total)
    assert(rows.length == 10)
    assert(rows.count(r => r.isNullAt(0) && r.isNullAt(1)) == 1)
  }

  test("union datasource and interval filter") {
    val df = run(
      """{
        "queryType": "timeseries",
        "dataSource": {"type": "union", "dataSources": ["orders", "orders"]},
        "timeColumn": "o_orderdate",
        "granularity": "year",
        "intervals": ["1996-01-01T00:00:00/1998-01-01T00:00:00"],
        "aggregations": [{"type": "count", "name": "cnt"}]
      }""")
    val rows = df.collect()
    assert(rows.length == 2) // 1996, 1997
    val direct = spark.read.parquet(s"${sf()}/orders.parquet")
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1998-01-01").count()
    assert(rows.map(_.getLong(1)).sum == direct * 2)
  }

  test("timeBoundary and cascade extraction filter") {
    val tb = run(
      """{"queryType": "timeBoundary", "dataSource": "lineitem", "timeColumn": "l_shipdate"}""")
      .head()
    assert(!tb.isNullAt(0) && !tb.isNullAt(1))
    val f = run(
      """{
        "queryType": "groupBy",
        "dataSource": "part",
        "dimensions": [{"type": "extraction", "dimension": "p_name", "outputName": "u",
          "extractionFn": {"type": "cascade", "extractionFns": [
            {"type": "substring", "index": 0, "length": 3},
            {"type": "upper"}]}}],
        "aggregations": [{"type": "count", "name": "cnt"}]
      }""")
    assert(f.collect().forall(r => r.getString(0) == r.getString(0).toUpperCase))
  }

  test("having and/or and inverted topN metric") {
    val hv = run(
      """{
        "queryType": "groupBy", "dataSource": "orders",
        "dimensions": ["o_orderpriority"],
        "aggregations": [{"type": "count", "name": "cnt"}],
        "having": {"type": "and", "havingSpecs": [
          {"type": "greaterThan", "aggregation": "cnt", "value": 1},
          {"type": "not", "havingSpec": {"type": "lessThan", "aggregation": "cnt", "value": 2}}]}
      }""")
    assert(hv.collect().forall(_.getLong(1) >= 2))
    val bottom = run(
      """{
        "queryType": "topN", "dataSource": "orders",
        "dimension": "o_orderpriority",
        "metric": {"type": "inverted", "metric": "cnt"},
        "threshold": 2,
        "aggregations": [{"type": "count", "name": "cnt"}]
      }""").collect()
    assert(bottom.length == 2)
    assert(bottom(0).getLong(1) <= bottom(1).getLong(1))
  }

  test("first/last aggregators default timeColumn to the query-level time column") {
    // standard Druid JSON: no per-aggregator timeColumn
    // (LongFirstAggregatorFactory.java:94 defaults to __time)
    val df = run(
      """{
        "queryType": "groupBy",
        "dataSource": "orders",
        "timeColumn": "o_orderdate",
        "dimensions": ["o_orderpriority"],
        "aggregations": [
          {"type": "doubleFirst", "name": "first_price", "fieldName": "o_totalprice"},
          {"type": "doubleLast", "name": "last_price", "fieldName": "o_totalprice"}
        ],
        "limitSpec": {"type": "default", "columns": ["o_orderpriority"]}
      }""")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("unsupported query type raises a clear error") {
    assertThrows[IllegalArgumentException](run("""{"queryType": "nope", "dataSource": "orders"}"""))
  }
}
