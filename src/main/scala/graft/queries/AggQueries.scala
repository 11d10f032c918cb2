package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators._
import graft.sources.Sources

/** Aggregator coverage (SURVEY §2.6 — AggregatorsModule.java:94-125 and the
  * SQL aggregators in sql/.../aggregation/builtin/).
  *
  * Execution note: every aggregate below rides Spark's partial→final hash
  * aggregation (map-side combine before the shuffle), which is the
  * distributed generalization of Druid's per-segment aggregate + broker
  * merge lifecycle (AggregatorFactory partial/final split).
  */
object AggQueries {
  private val D = DecimalType(18, 2)
  // money sums: exact decimal accumulation, but OUTPUT as double — the
  // driver's value compare renders cells to strings, and a decimal's
  // trailing zeros ("123.40") vs DuckDB's float ("123.4") hash-mismatch

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // longSum/doubleSum/min/max/count/doubleMean over typed columns
    "agg_minmax_sum_mean" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag")),
        aggregations = Seq(
          Agg("sum_qty", sum(col("l_quantity"))),
          Agg("min_qty", min(col("l_quantity"))),
          Agg("max_qty", max(col("l_quantity"))),
          Agg("sum_key", sum(col("l_suppkey"))),
          Agg("min_date", min(col("l_shipdate"))),
          Agg("max_date", max(col("l_shipdate"))),
          Agg("avg_qty", avg(col("l_quantity"))),
          Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_returnflag").asc))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // longFirst/Last ≈ EARLIEST/LATEST: time-ordered first/last with unique
    // tiebreak (reference: query/aggregation/first & last — state is a
    // (timestamp, value) pair; FirstLastFoldAgg folds it incrementally and
    // plans as ObjectHashAggregate, not the min_by SortAggregate spelling)
    "agg_first_last" -> ((s, dir) => {
      import graft.functions.FirstLastAgg
      GroupByQuery(
        dimensions = Seq(Dim("o_orderpriority")),
        aggregations = Seq(
          Agg("earliest_price", FirstLastAgg.earliest(col("o_totalprice"),
            struct(col("o_orderdate"), col("o_orderkey")))),
          Agg("latest_price", FirstLastAgg.latest(col("o_totalprice"),
            struct(col("o_orderdate"), col("o_orderkey")))),
          Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("o_orderpriority").asc))
      ).run(Sources.table(s, dir, "orders"))
    }),

    // stringAny/longAny — deterministic here because the value is
    // functionally dependent on the group key
    "agg_any_value" -> ((s, dir) => {
      val n = Sources.globalTable(Sources.table(s, dir, "nation"))
      val c = Sources.table(s, dir, "customer")
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_nationkey"))
        .agg(graft.functions.FirstLastAgg.anyValue(col("n_name")).as("nation_name"),
             count(lit(1)).as("cnt"))
        .orderBy(col("c_nationkey"))
    }),

    // filtered aggregator (FilteredAggregatorFactory.java)
    "agg_filtered" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_linestatus")),
        aggregations = Seq(
          Agg.filteredSum("qty_flag_a", col("l_quantity"), col("l_returnflag") === "A"),
          Agg.filteredCount("cnt_high_qty", col("l_quantity") > 40.0),
          Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_linestatus").asc))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // exact COUNT DISTINCT (useApproximateCountDistinct=false path)
    "agg_count_distinct" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag")),
        aggregations = Seq(
          Agg("nd_part", count_distinct(col("l_partkey"))),
          Agg("nd_supp", count_distinct(col("l_suppkey"))),
          Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_returnflag").asc))
        // r16 note: a projected rebalance (Sources.parallelized) was
        // measured neutral here (0.74 -> 0.76 s) — the one-task shuffle
        // write costs what the parallel Expand+hash saves; left as-is
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // hyperUnique/cardinality aggregator → approximate distinct via a
    // DataSketches sketch, oracle-checked against the exact count. Theta
    // (not HLL) is the exactness-tunable choice: a theta sketch retains
    // full 64-bit hashes and stays EXACT until retained entries exceed the
    // nominal 2^lgK (collision odds ~n²/2^65), while HLL's coupon phase
    // hashes into a 26-bit coupon space whose birthday collisions undercount
    // by ~n²/2^27 already at 11k distinct (observed: off by 1 at sf0.01).
    // lgK=18 → exact through 262144 distinct, past every gate scale's
    // per-group cardinality (sf0.1 worst case ~110k l_orderkey per flag).
    "agg_approx_distinct" -> ((s, dir) => {
      import graft.plans.SketchFunctions.{thetaSketch, thetaEstimate}
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag")),
        aggregations = Seq(
          Agg("approx_nd_part", round(thetaEstimate(thetaSketch(col("l_partkey"), 18))).cast("long")),
          Agg("approx_nd_order", round(thetaEstimate(thetaSketch(col("l_orderkey"), 18))).cast("long"))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_returnflag").asc))
        // r16 note: a projected rebalance (Sources.parallelized) was
        // measured neutral here (0.65 -> 0.69 s); left as-is
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // variance/stddev (extensions-core/stats) — rounded to dodge
    // cross-engine floating-point ulp differences
    "agg_variance" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag")),
        aggregations = Seq(
          Agg("var_pop_q", round(var_pop(col("l_quantity")), 4)),
          Agg("var_samp_q", round(var_samp(col("l_quantity")), 4)),
          Agg("stddev_pop_q", round(stddev_pop(col("l_quantity")), 4)),
          Agg("stddev_samp_q", round(stddev_samp(col("l_quantity")), 4))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_returnflag").asc))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // ARRAY_AGG / ARRAY_CONCAT_AGG / STRING_AGG (ArraySqlAggregator,
    // ArrayConcatSqlAggregator, StringSqlAggregator) — sorted for
    // determinism; output string-joined (the driver's compare cannot sort
    // raw array cells)
    "agg_array_string" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("n_regionkey")),
        aggregations = Seq(
          Agg("nations_csv", array_join(array_sort(collect_set(col("n_name"))), ",")),
          Agg("concat_csv",
            array_join(array_sort(flatten(collect_list(array(col("n_name"))))), ",")),
          Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("n_regionkey").asc))
      ).run(Sources.table(s, dir, "nation"))
    }),

    // equal-width histogram (HistogramAggregatorFactory) via bucket expr
    "agg_histogram" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(ExprDim(
          graft.functions.DruidFunctions.bucket(col("l_quantity"), 10.0).cast("long"),
          "bucket")),
        aggregations = Seq(Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("bucket").asc))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // approxHistogram (extensions-core/histogram ApproximateHistogram —
    // Ben-Haim/Tom-Tov centroids ≡ Spark's histogram_numeric; exact here
    // because distinct values ≤ k, so the oracle can reproduce it)
    "agg_approx_histogram" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag")),
        aggregations = Seq(
          Agg("hist", array_join(transform(
            graft.functions.DruidFunctions.approxHistogram(col("l_linenumber"), 32),
            b => concat(round(b.getField("x")).cast("long").cast("string"), lit(":"),
                        round(b.getField("y")).cast("long").cast("string"))), ",")),
          Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_returnflag").asc))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // fixedBucketsHistogram (FixedBucketsHistogramAggregatorFactory):
    // 5 buckets over [0, 50), clip mode — numBuckets codegen'd sum(when)
    // aggregates, partial-agg combinable
    "agg_fixed_histogram" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag")),
        aggregations = Seq(
          Agg("fixed_hist", array_join(transform(
            graft.functions.DruidFunctions.fixedBucketsHistogram(
              col("l_quantity"), 0.0, 50.0, 5, "clip"),
            x => x.cast("string")), ",")),
          Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_returnflag").asc))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // first/last over ROLLED-UP data (LongFirstAggregatorFactory pair
    // state + re-fold): stage 1 builds a daily rollup storing (t, v) pair
    // metrics, stage 2 answers EARLIEST/LATEST from the rollup alone —
    // the raw table is scanned once, at ingest
    "agg_first_last_rollup" -> ((s, dir) => {
      import graft.operators.FirstLast._
      // r16: the two-level pair fold is per-row-heavy (struct allocation +
      // ordered fold per row); rebalance the single-row-group local scan so
      // the first-level ObjectHashAggregate runs cluster-wide — projected
      // FIRST so the conditional shuffle carries 3 columns, not 16 (guide
      // §2.3 project before the exchange; §2.5 unsplittable-input skew)
      val li = Sources.parallelized(Sources.table(s, dir, "lineitem")
        .select("l_shipdate", "l_returnflag", "l_extendedprice"))
      val rollup = li.groupBy(
          graft.functions.TimeFunctions.timeFloor(col("l_shipdate"), "P1D").as("day"),
          col("l_returnflag"))
        .agg(firstPair(col("l_extendedprice"), col("l_shipdate")).as("first_pair"),
             lastPair(col("l_extendedprice"), col("l_shipdate")).as("last_pair"),
             count(lit(1)).as("rollup_cnt"))
      rollup.groupBy(col("l_returnflag"))
        .agg(firstValue(col("first_pair")).as("earliest_price"),
             lastValue(col("last_pair")).as("latest_price"),
             sum(col("rollup_cnt")).as("cnt"))
        .orderBy(col("l_returnflag"))
    }),

    // BIT_AND / BIT_OR / BIT_XOR (BitwiseSqlAggregator)
    "agg_bitwise" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag")),
        aggregations = Seq(
          Agg("band", expr("bit_and(l_linenumber)")),
          Agg("bor", expr("bit_or(l_linenumber)")),
          Agg("bxor", expr("bit_xor(l_linenumber)"))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_returnflag").asc))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // GROUPING aggregator with grouping sets (GroupingAggregatorFactory)
    "agg_grouping_id" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag"), Dim("l_linestatus")),
        aggregations = Seq(
          Agg("cnt", count(lit(1))),
          Agg("gid", grouping_id())),
        subtotalsSpec = Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_linestatus"), Seq()),
        limitSpec = LimitSpec(orderBy = Seq(
          col("gid").asc, col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))
      ).run(Sources.table(s, dir, "lineitem"))
    }),

    // expression lambda aggregator (ExpressionLambdaAggregatorFactory):
    // the BOUNDED incremental lifecycle — fold each row into a scalar
    // accumulator, merge partials via combine (never collect_list: the
    // accumulator alone crosses the shuffle)
    "agg_expression_fold" -> ((s, dir) => {
      val t = Sources.table(s, dir, "lineitem")
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag")),
        aggregations = Seq(
          Agg("folded_linenumbers", graft.functions.ExpressionLambda.fold(
            s, t.schema, Seq("l_linenumber"), "__acc", "0",
            "__acc + l_linenumber", Some("__acc + folded_linenumbers"), None,
            "folded_linenumbers")),
          Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_returnflag").asc))
      ).run(t)
    }),

    // post-aggregators: arithmetic / fieldAccess / constant / greatest-least
    "post_aggregators" -> ((s, dir) => {
      GroupByQuery(
        dimensions = Seq(Dim("l_returnflag")),
        aggregations = Seq(
          Agg("sum_qty", sum(col("l_quantity"))),
          Agg("sum_price", sum(col("l_extendedprice").cast(D)).cast("double")),
          Agg("cnt", count(lit(1)))),
        postAggregations = Seq(
          PostAgg("avg_price", (col("sum_price").cast("double") / col("cnt"))),
          PostAgg("qty_ratio", col("sum_qty") / col("cnt")),
          PostAgg("max_of", greatest(col("sum_qty"), col("cnt").cast("double"))),
          PostAgg("constant_pi", lit(3.141592653589793))),
        limitSpec = LimitSpec(orderBy = Seq(col("l_returnflag").asc))
      ).run(Sources.table(s, dir, "lineitem"))
    })
  )

  def oracle: Map[String, String] = Map(
    "agg_minmax_sum_mean" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, min(l_quantity) AS min_qty,
        |       max(l_quantity) AS max_qty, CAST(sum(l_suppkey) AS BIGINT) AS sum_key,
        |       min(l_shipdate) AS min_date, max(l_shipdate) AS max_date,
        |       avg(l_quantity) AS avg_qty, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_first_last" ->
      """WITH e AS (
        |  SELECT o_orderpriority, o_totalprice AS earliest_price FROM orders
        |  QUALIFY row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_orderdate ASC, o_orderkey ASC) = 1),
        |l AS (
        |  SELECT o_orderpriority, o_totalprice AS latest_price FROM orders
        |  QUALIFY row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_orderdate DESC, o_orderkey DESC) = 1),
        |c AS (SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY 1)
        |SELECT c.o_orderpriority, e.earliest_price, l.latest_price, c.cnt
        |FROM c JOIN e USING (o_orderpriority) JOIN l USING (o_orderpriority)
        |ORDER BY 1""".stripMargin,

    "agg_any_value" ->
      """SELECT c_nationkey, any_value(n_name) AS nation_name, count(*) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_filtered" ->
      """SELECT l_linestatus,
        |       sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS qty_flag_a,
        |       CAST(sum(CASE WHEN l_quantity > 40.0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_high_qty,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
        |       count(DISTINCT l_suppkey) AS nd_supp, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS approx_nd_part,
        |       count(DISTINCT l_orderkey) AS approx_nd_order
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_variance" ->
      """SELECT l_returnflag, round(var_pop(l_quantity), 4) AS var_pop_q,
        |       round(var_samp(l_quantity), 4) AS var_samp_q,
        |       round(stddev_pop(l_quantity), 4) AS stddev_pop_q,
        |       round(stddev_samp(l_quantity), 4) AS stddev_samp_q
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_array_string" ->
      """SELECT n_regionkey,
        |       array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations_csv,
        |       array_to_string(list_sort(flatten(list([n_name]))), ',') AS concat_csv,
        |       count(*) AS cnt
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(floor(l_quantity / 10.0) * 10 AS BIGINT) AS bucket, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_approx_histogram" ->
      """SELECT l_returnflag,
        |       string_agg(CAST(ln AS VARCHAR) || ':' || CAST(cnt AS VARCHAR), ','
        |                  ORDER BY ln) AS hist,
        |       CAST(sum(cnt) AS BIGINT) AS cnt
        |FROM (SELECT l_returnflag, l_linenumber AS ln, count(*) AS cnt
        |      FROM lineitem GROUP BY 1, 2)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_fixed_histogram" ->
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS VARCHAR)
        |       || ',' || CAST(sum(CASE WHEN l_quantity >= 10 AND l_quantity < 20 THEN 1 ELSE 0 END) AS VARCHAR)
        |       || ',' || CAST(sum(CASE WHEN l_quantity >= 20 AND l_quantity < 30 THEN 1 ELSE 0 END) AS VARCHAR)
        |       || ',' || CAST(sum(CASE WHEN l_quantity >= 30 AND l_quantity < 40 THEN 1 ELSE 0 END) AS VARCHAR)
        |       || ',' || CAST(sum(CASE WHEN l_quantity >= 40 THEN 1 ELSE 0 END) AS VARCHAR) AS fixed_hist,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_first_last_rollup" ->
      """WITH e AS (
        |  SELECT l_returnflag, l_extendedprice AS earliest_price FROM lineitem
        |  QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |          ORDER BY l_shipdate ASC, l_extendedprice ASC) = 1),
        |l AS (
        |  SELECT l_returnflag, l_extendedprice AS latest_price FROM lineitem
        |  QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |          ORDER BY l_shipdate DESC, l_extendedprice DESC) = 1),
        |c AS (SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY 1)
        |SELECT c.l_returnflag, e.earliest_price, l.latest_price, c.cnt
        |FROM c JOIN e USING (l_returnflag) JOIN l USING (l_returnflag)
        |ORDER BY 1""".stripMargin,

    "agg_bitwise" ->
      """SELECT l_returnflag, bit_and(l_linenumber) AS band,
        |       bit_or(l_linenumber) AS bor, bit_xor(l_linenumber) AS bxor
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_grouping_id" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY gid ASC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "agg_expression_fold" ->
      """SELECT l_returnflag, CAST(sum(l_linenumber) AS BIGINT) AS folded_linenumbers,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "post_aggregators" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |       sum(l_quantity) / count(*) AS qty_ratio,
        |       greatest(sum(l_quantity), CAST(count(*) AS DOUBLE)) AS max_of,
        |       CAST(3.141592653589793 AS DOUBLE) AS constant_pi
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
