package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Sources

/** Capabilities beyond the reference's surface that Spark provides natively
  * (SURVEY §2.10: the reference has UNION ALL only and no window functions —
  * these are the documented supersets a migrating user gains), plus the
  * remaining dimension-spec variants.
  */
object SupersetQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // INTERSECT / EXCEPT (reference: union only — superset)
    "setop_intersect_except" -> ((s, dir) => {
      val li = Sources.table(s, dir, "lineitem")
      val a = li.filter(col("l_returnflag") === "A").select(col("l_suppkey"))
      val r = li.filter(col("l_returnflag") === "R").select(col("l_suppkey"))
      val inter = a.intersect(r).agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
      val ex = a.except(r).agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
      inter.unionByName(ex).select("op", "n").orderBy("op")
    }),

    // IN-subquery (broker-inlined QueryDataSource in the reference)
    "subquery_in" -> ((s, dir) => {
      val orders = Sources.table(s, dir, "orders")
      val bld = Sources.table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      orders.join(bld, orders("o_custkey") === bld("c_custkey"), "left_semi")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus"))
    }),

    // window functions (absent from the reference — superset).
    // SCALE shape: rank-limit FIRST in its own single-function window so
    // Catalyst's InferWindowGroupLimit inserts a partial WindowGroupLimit
    // BEFORE the shuffle (each mapper forwards <= 3 rows per key instead of
    // its whole split), THEN lag over the <= 3-per-key survivors — lag(1)
    // within the contiguous top-3 equals lag(1) over the full partition for
    // those rows. Ranking and lagging in ONE window blocks the rewrite
    // (mixed rank+lag disables InferWindowGroupLimit) and full-sorts the
    // fact in one task per key — the classic full-partition window blowup
    // at 100x (5 priorities x ~30M rows each).
    "window_rank_lag" -> ((s, dir) => {
      val o = Sources.table(s, dir, "orders")
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(col("o_orderpriority"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("rn"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"))
        .orderBy(col("o_orderpriority"), col("rn"))
    }),

    // movingAverage query type (extensions-contrib/moving-average-query —
    // r15): trailing 3-month window averagers over monthly per-status
    // order counts. The 1995 interval crosses TPC-H's order-status
    // transition (F -> P -> O), so statuses have genuinely MISSING months
    // and the empty-bucket policies differ observably: longMean counts the
    // gap as 0 in a constant denominator, longMax skips it. The lookback
    // window extends the scan back to 1994-11 (buckets-1 periods) while
    // output rows trim to 1995 — both pinned by the oracle.
    "moving_average" -> ((s, dir) => {
      NativeQuery.run(s,
        """{
          "queryType": "movingAverage",
          "dataSource": "orders",
          "timeColumn": "o_orderdate",
          "granularity": {"type": "period", "period": "P1M"},
          "intervals": ["1995-01-01T00:00:00/1996-01-01T00:00:00"],
          "dimensions": [{"type": "default", "dimension": "o_orderstatus"}],
          "aggregations": [{"type": "count", "name": "cnt"}],
          "averagers": [
            {"type": "longMean", "name": "avg3_cnt", "fieldName": "cnt", "buckets": 3},
            {"type": "longMax", "name": "max3_cnt", "fieldName": "cnt", "buckets": 3}
          ]
        }""", name => Sources.table(s, dir, name))
    }),

    // movingAverage MULTI-INTERVAL (r16): the reference maps the lookback
    // extension over EVERY interval (MovingAverageQueryRunner.java:96-104)
    // and the bucket sequence runs ACROSS intervals without resetting
    // averager state (RowBucketIterable). Two disjoint 1995 quarters, each
    // with its own 2-month lookback; output trims to the two reporting
    // windows. The oracle reproduces the concatenated spine with a single
    // ROWS window over the month sequence (months are unique and ordered,
    // so ROWS BETWEEN over the unioned spine IS the global bucket index).
    "moving_average_multi" -> ((s, dir) => {
      NativeQuery.run(s,
        """{
          "queryType": "movingAverage",
          "dataSource": "orders",
          "timeColumn": "o_orderdate",
          "granularity": {"type": "period", "period": "P1M"},
          "intervals": ["1995-01-01T00:00:00/1995-04-01T00:00:00",
                        "1995-07-01T00:00:00/1995-10-01T00:00:00"],
          "dimensions": [{"type": "default", "dimension": "o_orderstatus"}],
          "aggregations": [{"type": "count", "name": "cnt"}],
          "averagers": [
            {"type": "longMean", "name": "avg3_cnt", "fieldName": "cnt", "buckets": 3},
            {"type": "longMax", "name": "max3_cnt", "fieldName": "cnt", "buckets": 3}
          ]
        }""", name => Sources.table(s, dir, name))
    }),

    // contrib aggregators (r15): timeMin/timeMax (time-min-max extension —
    // epoch-millis fold finalized to the timestamp, fieldName defaulting to
    // the time column) and distinctCount (exact distinct; globally exact
    // here vs the reference's same-segment requirement)
    "agg_time_minmax_distinct" -> ((s, dir) => {
      NativeQuery.run(s,
        """{
          "queryType": "groupBy",
          "dataSource": "orders",
          "timeColumn": "o_orderdate",
          "dimensions": [{"type": "default", "dimension": "o_orderstatus"}],
          "aggregations": [
            {"type": "timeMin", "name": "first_order"},
            {"type": "timeMax", "name": "last_order"},
            {"type": "distinctCount", "name": "nd_cust", "fieldName": "o_custkey"}
          ],
          "limitSpec": {"type": "default", "columns": [{"dimension": "o_orderstatus"}]}
        }""", name => Sources.table(s, dir, name))
    }),

    // regexFiltered dimension spec (DimensionSpec.java `regexFiltered`):
    // MV values filtered by regex before explode-grouping
    "mv_regex_filtered" -> ((s, dir) => {
      val tokens = split(col("p_name"), " ")
      GroupByQuery(
        dimensions = Seq(MvDim(filter(tokens, t => t.rlike("^[bg]")), "token")),
        aggregations = Seq(Agg("cnt", count(lit(1)))),
        limitSpec = LimitSpec(orderBy = Seq(col("token").asc_nulls_first))
      ).run(Sources.table(s, dir, "part"))
    }),

    // Druid BloomKFilter binary round trip as a pre-join semi filter
    // (extensions-core/druid-bloom-filter BloomDimFilter.java): build the
    // reference-format filter on the dim side, prune the fact scan with it,
    // exact-recheck behind it (no false negatives → the result is exact and
    // oracle-checkable; the bloom only PRUNES, the reference's own pattern)
    "druid_bloom_semijoin" -> ((s, dir) => {
      val bf = Sources.table(s, dir, "supplier").filter(col("s_suppkey") < 10)
        .agg(graft.plans.BloomFunctions.druidBloomAgg(col("s_suppkey"), 1500L).as("bf"))
        .head().getAs[Array[Byte]]("bf") // one filter blob — the reference POSTs exactly this
      Sources.table(s, dir, "lineitem")
        .filter(graft.plans.BloomFunctions.druidBloomTest(lit(bf), col("l_suppkey")) &&
          col("l_suppkey") < 10)
        .agg(count(lit(1)).as("cnt"), count_distinct(col("l_suppkey")).as("nd_supp"))
    }),

    // sys.supervisors (SystemSchema.java:190): deterministic registry row
    "sys_supervisors" -> ((s, dir) => {
      graft.server.SystemSchema.registerSupervisor(graft.server.SystemSchema.SupervisorEntry(
        id = "events_sup", supervisorType = "kafka", source = "events",
        spec = """{"type":"kafka","topic":"events"}"""))
      graft.server.SystemSchema.registerServers(s)
      s.sql("""SELECT supervisor_id, state, healthy, type, source, suspended
              |FROM sys.supervisors WHERE supervisor_id = 'events_sup'""".stripMargin)
    })
  )

  def oracle: Map[String, String] = Map(
    "setop_intersect_except" ->
      """SELECT op, n FROM (
        |  SELECT 'intersect' AS op, count(*) AS n FROM (
        |    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
        |    INTERSECT
        |    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        |  UNION ALL
        |  SELECT 'except', count(*) FROM (
        |    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
        |    EXCEPT
        |    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        |) ORDER BY op""".stripMargin,

    "subquery_in" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "window_rank_lag" ->
      """SELECT o_orderpriority, o_orderkey,
        |       CAST(row_number() OVER w AS INT) AS rn,
        |       lag(o_orderkey, 1) OVER w AS prev_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey)
        |QUALIFY rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "moving_average" ->
      """WITH buckets AS (
        |  SELECT o_orderstatus, date_trunc('month', o_orderdate) AS m,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders
        |  WHERE o_orderdate >= DATE '1994-11-01' AND o_orderdate < DATE '1996-01-01'
        |  GROUP BY 1, 2
        |), spine AS (
        |  SELECT s.o_orderstatus, sp.m
        |  FROM (SELECT DISTINCT o_orderstatus FROM buckets) s
        |  CROSS JOIN (SELECT unnest(generate_series(
        |    TIMESTAMP '1994-11-01', TIMESTAMP '1995-12-01', INTERVAL 1 MONTH)) AS m) sp
        |), filled AS (
        |  SELECT sp.o_orderstatus, sp.m, b.cnt
        |  FROM spine sp LEFT JOIN buckets b
        |    ON b.o_orderstatus = sp.o_orderstatus AND b.m = sp.m
        |), win AS (
        |  SELECT o_orderstatus, m, cnt,
        |    sum(coalesce(cnt, 0)) OVER w / 3.0 AS avg3_cnt,
        |    CAST(max(cnt) OVER w AS BIGINT) AS max3_cnt
        |  FROM filled
        |  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY m
        |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |)
        |SELECT CAST(m AS TIMESTAMP) AS o_orderdate, o_orderstatus, cnt,
        |       avg3_cnt, max3_cnt
        |FROM win WHERE m >= TIMESTAMP '1995-01-01'
        |ORDER BY 1, 2""".stripMargin,

    "moving_average_multi" ->
      """WITH buckets AS (
        |  SELECT o_orderstatus, date_trunc('month', o_orderdate) AS m,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders
        |  WHERE (o_orderdate >= DATE '1994-11-01' AND o_orderdate < DATE '1995-04-01')
        |     OR (o_orderdate >= DATE '1995-05-01' AND o_orderdate < DATE '1995-10-01')
        |  GROUP BY 1, 2
        |), months AS (
        |  SELECT unnest(generate_series(
        |    TIMESTAMP '1994-11-01', TIMESTAMP '1995-03-01', INTERVAL 1 MONTH)) AS m
        |  UNION ALL
        |  SELECT unnest(generate_series(
        |    TIMESTAMP '1995-05-01', TIMESTAMP '1995-09-01', INTERVAL 1 MONTH)) AS m
        |), spine AS (
        |  SELECT s.o_orderstatus, sp.m
        |  FROM (SELECT DISTINCT o_orderstatus FROM buckets) s
        |  CROSS JOIN months sp
        |), filled AS (
        |  SELECT sp.o_orderstatus, sp.m, b.cnt
        |  FROM spine sp LEFT JOIN buckets b
        |    ON b.o_orderstatus = sp.o_orderstatus AND b.m = sp.m
        |), win AS (
        |  SELECT o_orderstatus, m, cnt,
        |    sum(coalesce(cnt, 0)) OVER w / 3.0 AS avg3_cnt,
        |    CAST(max(cnt) OVER w AS BIGINT) AS max3_cnt
        |  FROM filled
        |  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY m
        |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |)
        |SELECT CAST(m AS TIMESTAMP) AS o_orderdate, o_orderstatus, cnt,
        |       avg3_cnt, max3_cnt
        |FROM win
        |WHERE (m >= TIMESTAMP '1995-01-01' AND m < TIMESTAMP '1995-04-01')
        |   OR (m >= TIMESTAMP '1995-07-01' AND m < TIMESTAMP '1995-10-01')
        |ORDER BY 1, 2""".stripMargin,

    "agg_time_minmax_distinct" ->
      """SELECT o_orderstatus,
        |       CAST(min(o_orderdate) AS TIMESTAMP) AS first_order,
        |       CAST(max(o_orderdate) AS TIMESTAMP) AS last_order,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_cust
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "mv_regex_filtered" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(CASE WHEN len(f) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE f END) AS token
        |  FROM (SELECT list_filter(string_split(p_name, ' '),
        |        t -> regexp_matches(t, '^[bg]')) AS f FROM part))
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,

    "druid_bloom_semijoin" ->
      """SELECT count(*) AS cnt, count(DISTINCT l_suppkey) AS nd_supp
        |FROM lineitem WHERE l_suppkey < 10""".stripMargin,

    "sys_supervisors" ->
      """SELECT 'events_sup' AS supervisor_id, 'RUNNING' AS state,
        |       CAST(1 AS BIGINT) AS healthy, 'kafka' AS type,
        |       'events' AS source, CAST(0 AS BIGINT) AS suspended""".stripMargin
  )
}
