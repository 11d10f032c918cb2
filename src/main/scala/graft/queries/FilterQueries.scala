package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Sources

/** Filter/predicate coverage (SURVEY §2.4 — processing/.../query/filter/
  * DimFilter.java:35-51): selector (null-safe eq), in, bound, like, regex,
  * search (contains / insensitive), interval, columnComparison, expression,
  * not/and/or. Each query pushes its predicate into the parquet scan —
  * at 100 TB these filters prune row groups via parquet min/max stats, the
  * Spark analog of Druid's bitmap-index path.
  */
object FilterQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // selector (<=>), in, bound, and/not — on lineitem
    "filter_selector_in_bound" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_linestatus")),
        filter = (col("l_returnflag") <=> "A") &&
          col("l_suppkey").isin(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L) &&
          col("l_quantity").between(5.0, 45.0) &&
          !(col("l_linenumber") === 7),
        aggregations = Seq(
          Agg("cnt", count(lit(1))),
          Agg("sum_qty", sum(col("l_quantity")))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_linestatus").asc))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // like + regex + search(contains/insensitive_contains) — on part
    "filter_like_regex_search" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("p_brand")),
        filter = (col("p_name").like("%small%") ||
          col("p_name").rlike("^(red|blue)")) &&
          lower(col("p_type")).contains("o"),
        aggregations = Seq(Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("p_brand").asc))
      ).run(Sources.table(s, dir, "part"))
    }),

    // interval filter: OR of two time ranges on the time column
    "filter_interval" -> ((s, dir) => {
      val intervals =
        (col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
         col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz")) ||
        (col("o_orderdate") >= lit("1999-06-01").cast("timestamp_ntz") &&
         col("o_orderdate") < lit("2000-03-01").cast("timestamp_ntz"))
      GroupByQuery(
        dimensions = Seq(Dim("o_orderstatus")),
        filter = intervals,
        aggregations = Seq(Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("o_orderstatus").asc))
      ).run(Sources.table(s, dir, "orders"))
    }),

    // columnComparison + expression filter
    "filter_colcmp_expression" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag")),
        filter = (col("l_partkey") % 100 === col("l_suppkey") % 100) &&
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) > 500.0),
        aggregations = Seq(
          Agg("cnt", count(lit(1))),
          Agg("sum_qty", sum(col("l_quantity")))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_returnflag").asc))
      ).run(Sources.table(s, dir, "lineitem"))
    })
  )

  def oracle: Map[String, String] = Map(
    "filter_selector_in_bound" ->
      """SELECT l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_returnflag IS NOT DISTINCT FROM 'A'
        |  AND l_suppkey IN (1,2,3,5,8,13,21,34)
        |  AND l_quantity BETWEEN 5.0 AND 45.0
        |  AND NOT (l_linenumber = 7)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "filter_like_regex_search" ->
      """SELECT p_brand, count(*) AS cnt FROM part
        |WHERE (p_name LIKE '%small%' OR regexp_matches(p_name, '^(red|blue)'))
        |  AND contains(lower(p_type), 'o')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "filter_interval" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |WHERE (o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        |   OR (o_orderdate >= TIMESTAMP '1999-06-01' AND o_orderdate < TIMESTAMP '2000-03-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "filter_colcmp_expression" ->
      """SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey % 100 = l_suppkey % 100
        |  AND l_extendedprice * (1.0 - l_discount) > 500.0
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
