package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.NativeQuery
import graft.sources.Sources

/** JSON native-query API coverage: the same queries a reference user POSTs
  * to /druid/v2, submitted verbatim as JSON and compiled to DataFrames.
  * Each is oracle-checked, so the gate verifies the parser + translation,
  * not just the underlying DSL.
  */
object NativeQueries {

  private def res(s: SparkSession, dir: String): NativeQuery.Resolver =
    name => Sources.table(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "native_timeseries" -> ((s, dir) => {
      NativeQuery.run(s,
        """{
          "queryType": "timeseries",
          "dataSource": "lineitem",
          "timeColumn": "l_shipdate",
          "granularity": "quarter",
          "intervals": ["1996-01-01T00:00:00/1999-01-01T00:00:00"],
          "filter": {"type": "and", "fields": [
            {"type": "in", "dimension": "l_returnflag", "values": ["A", "R"]},
            {"type": "bound", "dimension": "l_quantity", "lower": 5, "ordering": "numeric"}
          ]},
          "aggregations": [
            {"type": "count", "name": "cnt"},
            {"type": "doubleSum", "name": "sum_qty", "fieldName": "l_quantity"},
            {"type": "filtered", "name": "qty_a",
             "filter": {"type": "selector", "dimension": "l_returnflag", "value": "A"},
             "aggregator": {"type": "doubleSum", "name": "qty_a", "fieldName": "l_quantity"}}
          ],
          "postAggregations": [
            {"type": "arithmetic", "name": "avg_qty", "fn": "/", "fields": [
              {"type": "fieldAccess", "fieldName": "sum_qty"},
              {"type": "fieldAccess", "fieldName": "cnt"}]}
          ]
        }""", res(s, dir))
    }),

    "native_topn" -> ((s, dir) => {
      NativeQuery.run(s,
        """{
          "queryType": "topN",
          "dataSource": "orders",
          "timeColumn": "o_orderdate",
          "dimension": {"type": "extraction", "dimension": "o_orderpriority",
                        "outputName": "prio_prefix",
                        "extractionFn": {"type": "substring", "index": 0, "length": 1}},
          "metric": "total",
          "threshold": 3,
          "aggregations": [
            {"type": "longSum", "name": "total", "fieldName": "o_orderkey"},
            {"type": "count", "name": "cnt"}
          ]
        }""", res(s, dir))
    }),

    "native_groupby" -> ((s, dir) => {
      NativeQuery.run(s,
        """{
          "queryType": "groupBy",
          "dataSource": {"type": "join", "left": "lineitem", "right": "part",
                         "rightPrefix": "r.", "condition": "l_partkey == p_partkey",
                         "joinType": "INNER"},
          "timeColumn": "l_shipdate",
          "dimensions": [{"type": "default", "dimension": "r.p_brand", "outputName": "brand"}],
          "virtualColumns": [{"type": "expression", "name": "qty2",
                              "expression": "l_quantity * 2"}],
          "aggregations": [
            {"type": "count", "name": "cnt"},
            {"type": "doubleSum", "name": "sum_qty2", "fieldName": "qty2"},
            {"type": "doubleMax", "name": "max_qty", "fieldName": "l_quantity"}
          ],
          "having": {"type": "greaterThan", "aggregation": "cnt", "value": 100},
          "limitSpec": {"type": "default", "limit": 10,
            "columns": [{"dimension": "cnt", "direction": "descending"},
                        {"dimension": "brand", "direction": "ascending"}]}
        }""", res(s, dir))
    }),

    "native_scan_search" -> ((s, dir) => {
      // "order": "ascending" on the (unique) key column makes the limit
      // boundary deterministic for the oracle compare
      NativeQuery.run(s,
        """{
          "queryType": "scan",
          "dataSource": "part",
          "timeColumn": "p_partkey",
          "columns": ["p_partkey", "p_name", "p_brand"],
          "filter": {"type": "search", "dimension": "p_name",
                     "query": {"type": "insensitive_contains", "value": "WIDGET"}},
          "order": "ascending",
          "limit": 40
        }""", res(s, dir))
    })
  )

  def oracle: Map[String, String] = Map(
    "native_timeseries" ->
      """SELECT CAST(date_trunc('quarter', l_shipdate) AS TIMESTAMP) AS l_shipdate,
        |       count(*) AS cnt, sum(l_quantity) AS sum_qty,
        |       sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS qty_a,
        |       sum(l_quantity) / count(*) AS avg_qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |  AND l_returnflag IN ('A', 'R') AND l_quantity >= 5
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "native_topn" ->
      """SELECT substr(o_orderpriority, 1, 1) AS prio_prefix,
        |       CAST(sum(o_orderkey) AS BIGINT) AS total, count(*) AS cnt
        |FROM orders GROUP BY 1
        |ORDER BY total DESC, prio_prefix ASC LIMIT 3""".stripMargin,

    "native_groupby" ->
      """SELECT p_brand AS brand, count(*) AS cnt,
        |       sum(l_quantity * 2) AS sum_qty2, max(l_quantity) AS max_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 HAVING count(*) > 100
        |ORDER BY cnt DESC, brand ASC LIMIT 10""".stripMargin,

    "native_scan_search" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE contains(lower(p_name), 'widget')
        |ORDER BY p_partkey LIMIT 40""".stripMargin
  )
}
