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
