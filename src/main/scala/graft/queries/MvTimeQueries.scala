package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.{TimeFunctions => TF, DruidFunctions => DF}
import graft.sources.Sources

/** Multi-value string dimension semantics (SURVEY §1.4) and the
  * time-granularity function family (SURVEY §2.8 time macros).
  *
  * The test tables have no native array columns, so MV dims are derived by
  * tokenizing p_name — semantically identical to Druid's MV string cells
  * (an array per row), exercising explode-grouping, any-match filtering and
  * the MV_* function surface.
  */
object MvTimeQueries {

  private def mvParts(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "part").withColumn("name_tokens", split(col("p_name"), " "))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MV groupBy: row contributes one group per element
    // (GroupByQueryEngineV2.java:603 exploded-grouping semantics)
    "mv_groupby_explode" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(MvDim(col("name_tokens"), "token")),
        aggregations = Seq(
          Agg("cnt", count(lit(1))),
          // single double division of exact inputs → cross-engine determinism
          Agg("avg_retail", round(
            sum(col("p_retailprice").cast("decimal(18,2)")).cast("double") / count(lit(1)), 4))),
        limitSpec = LimitSpec(orderBy = Seq(col("token").asc))
      ).run(mvParts(s, dir))
    }),

    // MV filter: matches if ANY element matches (Filter.java:93)
    "mv_filter_any" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("p_brand")),
        filter = DF.mvContains(col("name_tokens"), "small") ||
          DF.mvAnyMatch(col("name_tokens"), _.startsWith("g")),
        aggregations = Seq(Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("p_brand").asc))
      ).run(mvParts(s, dir))
    }),

    // listFiltered dimension spec: allowlist filters array values pre-explode
    "mv_list_filtered" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(ListFilteredDim(col("name_tokens"),
          Seq("small", "red", "blue", "hot"), "token")),
        aggregations = Seq(Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("token").asc_nulls_first))
      ).run(mvParts(s, dir))
    }),

    // MV_* scalar surface: length / to_string / offset / contains / overlap
    "mv_functions_scan" -> ((s, dir) => {
      mvParts(s, dir)
        .select(
          col("p_partkey"),
          DF.mvLength(col("name_tokens")).cast("long").as("n_tokens"),
          DF.mvToString(col("name_tokens"), "|").as("joined"),
          element_at(col("name_tokens"), 1).as("first_token"),
          DF.mvContains(col("name_tokens"), "widget").cast("int").as("has_widget"),
          DF.mvOverlap(col("name_tokens"), array(lit("ring"), lit("bolt"))).cast("int").as("ring_or_bolt"))
        .orderBy(col("p_partkey"))
        .limit(100)
    }),

    // PT15M fixed-period granularity with epoch origin on real timestamps.
    // skipEmptyBuckets: the events stream is sparse at 15-minute resolution,
    // and this query checks the floor arithmetic, not the fill (which
    // timeseries_zerofill covers).
    "time_floor_15m" -> ((s, dir) => {
      TimeseriesQuery(
        timeColumn = "ts",
        granularity = PeriodGranularity("PT15M"),
        aggregations = Seq(
          Agg("cnt", count(lit(1))),
          Agg("sum_value", sum(DF.roundTo(col("value") * 100, 0).cast("long")))),
        limit = Some(200),
        skipEmptyBuckets = true
      ).run(Sources.events(s, dir))
    }),

    // IANA-timezone granularity (PeriodGranularity.java `timeZone`): daily
    // buckets on the Los Angeles WALL CLOCK, DST-aware — each bucket's
    // instant renders in UTC (08:00Z in winter, 07:00Z in summer)
    "time_floor_tz" -> ((s, dir) => {
      TimeseriesQuery(
        timeColumn = "ts",
        granularity = PeriodGranularity("P1D", timeZone = "America/Los_Angeles"),
        aggregations = Seq(Agg("cnt", count(lit(1)))),
        limit = Some(400),
        skipEmptyBuckets = true
      ).run(Sources.events(s, dir))
    }),

    // arbitrary origin: 6-hour buckets anchored at 03:00
    "time_floor_origin" -> ((s, dir) => {
      TimeseriesQuery(
        timeColumn = "ts",
        granularity = PeriodGranularity("PT6H", origin = "2024-01-01 03:00:00"),
        aggregations = Seq(Agg("cnt", count(lit(1)))),
        limit = Some(200),
        skipEmptyBuckets = true
      ).run(Sources.events(s, dir))
    }),

    // default (reference) behavior: empty buckets zero-filled — daily series
    // over a rare filter, most days empty: count filled 0, sum null
    // (TimeseriesQueryEngine.java:131,210 zero-fill default)
    "timeseries_zerofill" -> ((s, dir) => {
      TimeseriesQuery(
        timeColumn = "o_orderdate",
        granularity = PeriodGranularity("P1D"),
        filter = col("o_totalprice") > 400000.0,
        aggregations = Seq(
          Agg("cnt", count(lit(1))),
          Agg("total", sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")))
      ).run(Sources.table(s, dir, "orders"))
    }),

    // extract family: YEAR/QUARTER/MONTH/ISODOW
    "time_extract" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(
          ExprDim(TF.timeExtract(col("l_shipdate"), "YEAR"), "y"),
          ExprDim(TF.timeExtract(col("l_shipdate"), "QUARTER"), "q"),
          ExprDim(TF.timeExtract(col("l_shipdate"), "ISODOW"), "dow")),
        aggregations = Seq(Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("y").asc, col("q").asc, col("dow").asc))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // descending timeseries with limit (TimeseriesQuery descending flag +
    // limit, SqlBenchmark time-floor shapes)
    "timeseries_desc_limit" -> ((s, dir) => {
      TimeseriesQuery(
        timeColumn = "l_shipdate",
        granularity = PeriodGranularity("P1M"),
        aggregations = Seq(
          Agg("cnt", count(lit(1))),
          Agg("sum_qty", sum(col("l_quantity")))),
        descending = true,
        limit = Some(12)
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // big UNION ALL chain over filtered aggregates (SqlBenchmark union shape)
    "union_all_chain" -> ((s, dir) => {
      val li = Sources.table(s, dir, "lineitem")
      val branches = Seq("A", "N", "R").map { f =>
        li.filter(col("l_returnflag") === f)
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
          .withColumn("branch", lit(f))
      }
      Sources.union(branches)
        .select("branch", "l_linestatus", "cnt", "sum_qty")
        .orderBy(col("branch"), col("l_linestatus"))
    }),

    // shift + ceil + format
    "time_shift_format" -> ((s, dir) => {
      Sources.table(s, dir, "orders")
        .select(
          col("o_orderkey"),
          TF.timeShift(col("o_orderdate"), "P1M", 1).cast("timestamp_ntz").as("next_month"),
          TF.timeCeil(col("o_orderdate"), "P1D").cast("timestamp_ntz").as("day_ceil"),
          TF.timeFormat(col("o_orderdate"), "yyyy-MM-dd").as("formatted"))
        .orderBy(col("o_orderkey"))
        .limit(100)
    })
  )

  def oracle: Map[String, String] = Map(
    "mv_groupby_explode" ->
      """SELECT token, count(*) AS cnt,
        |       round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_retail
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS token, p_retailprice FROM part)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "mv_filter_any" ->
      """SELECT p_brand, count(*) AS cnt FROM part
        |WHERE list_contains(string_split(p_name, ' '), 'small')
        |   OR len(list_filter(string_split(p_name, ' '), t -> t LIKE 'g%')) > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "mv_list_filtered" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(CASE WHEN len(f) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE f END) AS token
        |  FROM (SELECT list_filter(string_split(p_name, ' '),
        |        t -> t IN ('small','red','blue','hot')) AS f FROM part))
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,

    "mv_functions_scan" ->
      """SELECT p_partkey, len(string_split(p_name, ' ')) AS n_tokens,
        |       array_to_string(string_split(p_name, ' '), '|') AS joined,
        |       string_split(p_name, ' ')[1] AS first_token,
        |       CAST(list_contains(string_split(p_name, ' '), 'widget') AS INT) AS has_widget,
        |       CAST(list_has_any(string_split(p_name, ' '), ['ring','bolt']) AS INT) AS ring_or_bolt
        |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin,

    "time_floor_15m" ->
      """SELECT make_timestamp((epoch_ms(CAST(ts AS TIMESTAMP)) // 900000) * 900000 * 1000) AS ts,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1 LIMIT 200""".stripMargin,

    // naive UTC ts → LA wall clock → day floor → back to the UTC instant
    // (DuckDB session tz is UTC in the driver container, so the TIMESTAMPTZ
    // cast interprets the naive value as UTC)
    "time_floor_tz" ->
      """SELECT CAST(timezone('America/Los_Angeles',
        |         date_trunc('day', timezone('America/Los_Angeles',
        |                                    CAST(ts AS TIMESTAMP)::TIMESTAMPTZ))) AS TIMESTAMP) AS ts,
        |       count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1 LIMIT 400""".stripMargin,

    "time_floor_origin" ->
      """SELECT make_timestamp((CAST(floor(
        |         (epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(TIMESTAMP '2024-01-01 03:00:00'))
        |         / 21600000.0) AS BIGINT) * 21600000
        |         + epoch_ms(TIMESTAMP '2024-01-01 03:00:00')) * 1000) AS ts,
        |       count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1 LIMIT 200""".stripMargin,

    "timeseries_zerofill" ->
      """WITH agg AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d, count(*) AS cnt,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_totalprice > 400000.0 GROUP BY 1),
        |spine AS (
        |  SELECT unnest(generate_series((SELECT min(d) FROM agg),
        |                                (SELECT max(d) FROM agg),
        |                                INTERVAL 1 DAY)) AS d)
        |SELECT spine.d AS o_orderdate, coalesce(agg.cnt, 0) AS cnt, agg.total AS total
        |FROM spine LEFT JOIN agg ON spine.d = agg.d ORDER BY 1""".stripMargin,

    "time_extract" ->
      """SELECT CAST(extract(year FROM l_shipdate) AS INT) AS y,
        |       CAST(extract(quarter FROM l_shipdate) AS INT) AS q,
        |       CAST(extract(isodow FROM l_shipdate) AS INT) AS dow,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "timeseries_desc_limit" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS l_shipdate,
        |       count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1 DESC LIMIT 12""".stripMargin,

    "union_all_chain" ->
      """SELECT branch, l_linestatus, cnt, sum_qty FROM (
        |  SELECT 'A' AS branch, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty
        |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 2
        |  UNION ALL
        |  SELECT 'N', l_linestatus, count(*), sum(l_quantity)
        |  FROM lineitem WHERE l_returnflag = 'N' GROUP BY 2
        |  UNION ALL
        |  SELECT 'R', l_linestatus, count(*), sum(l_quantity)
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 2
        |) ORDER BY branch, l_linestatus""".stripMargin,

    "time_shift_format" ->
      """SELECT o_orderkey,
        |       o_orderdate + INTERVAL 1 MONTH AS next_month,
        |       CAST(CASE WHEN date_trunc('day', o_orderdate) = o_orderdate THEN o_orderdate
        |            ELSE date_trunc('day', o_orderdate) + INTERVAL 1 DAY END AS TIMESTAMP) AS day_ceil,
        |       strftime(o_orderdate, '%Y-%m-%d') AS formatted
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin
  )
}
