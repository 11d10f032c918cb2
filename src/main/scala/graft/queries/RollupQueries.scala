package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{FirstLast, PeriodGranularity}
import graft.plans.RollupRewrite
import graft.plans.RollupRewrite.{Catalog, RollupDef}

/** Oracle-gated end-to-end exercise of the rollup-aware optimizer rewrite
  * (plans.RollupRewrite, SURVEY §4.1): materialize a P1D rollup of
  * `orders`, register it, and run a MONTH query over the BASE table — the
  * rule redirects the aggregate to the rollup (granularity coarsening +
  * count/min/max derivation + EARLIEST pair refold), and the DuckDB oracle
  * checks the VALUES against the raw table, so a rewrite that changed any
  * result would go red in the driver's correctness gate.
  *
  * Every aggregate here is EXACT under re-association (count/min/max and
  * the deterministic (date, price)-keyed earliest) — no double sums, per
  * the engine's cross-engine hash-compare discipline.
  */
object RollupQueries {

  // one registration per (JVM, sf dir); the rule stays attached for the
  // session (it no-ops for non-matching scans, and every other gate query
  // keeps passing its own oracle — the 126-query run IS the blast-radius
  // check for misfires)
  private val catalogs = scala.collection.mutable.Map[String, Catalog]()

  private def rollupPathFor(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_rollup_gate_${Integer.toHexString(dir.hashCode)}"

  private def ensureRollup(s: SparkSession, dir: String): Unit = catalogs.synchronized {
    val catalog = catalogs.getOrElseUpdate(dir, {
      val basePath = s"$dir/orders.parquet"
      val g = PeriodGranularity("P1D")
      val rollupPath = rollupPathFor(dir)
      import graft.plans.SketchFunctions.{thetaSketch, kllSketch, tupleSketch}
      // Shuffle by the GROUP KEY before aggregating: the k=8192 KLL buffer
      // preallocates ~64 KB per group, and a map-side partial would hold
      // one buffer for EVERY group present in the input partition (all of
      // them, on randomly-ordered input) — ~460 MB per task at 100×. After
      // the repartition each partition holds only its own groups, the
      // aggregate recognizes the partitioning and adds no second shuffle,
      // and per-task sketch memory is bounded by groups/partitions.
      s.read.parquet(basePath)
        .repartition(g.bucket(col("o_orderdate")), col("o_orderstatus"))
        .groupBy(g.bucket(col("o_orderdate")).as("o_orderdate"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          FirstLast.firstPair(col("o_totalprice"), col("o_orderdate")).as("first_pair"),
          // COMPLEX metric columns: serialized sketches, re-aggregated by
          // the rewrite's union refolds (the reference stores and re-merges
          // these as a matter of course — getCombiningFactory)
          thetaSketch(col("o_custkey")).as("theta_cust"),
          kllSketch(col("o_totalprice"), k = 8192).as("kll_price"),
          tupleSketch(col("o_custkey"), Seq(lit(1.0))).as("tuple_cust"))
        .write.mode("overwrite").parquet(rollupPath)
      val c = new Catalog
      c.register(RollupDef(
        basePath = basePath,
        rollup = s.read.parquet(rollupPath),
        dimensions = Set("o_orderstatus"),
        metricMap = Map(
          "o_totalprice" -> Seq("first" -> "first_pair", "kll" -> "kll_price"),
          "o_custkey" -> Seq("theta" -> "theta_cust", "tuple:1.0" -> "tuple_cust")),
        countColumn = "cnt",
        timeColumn = Some("o_orderdate"),
        granularity = Some(g)))
      c
    })
    // always (re-)attach: a test may have cleared extraOptimizations; a
    // no-op when a RewriteRule is already present
    RollupRewrite.enable(s, catalog)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // month-over-P1D coarsening + count derivation + EARLIEST pair refold,
    // answered from the rollup scan (RollupRewriteSpec asserts the plan;
    // this entry asserts the VALUES against DuckDB over the raw table)
    "rollup_rewrite_coarse" -> ((s, dir) => {
      ensureRollup(s, dir)
      val base = s.read.parquet(s"$dir/orders.parquet")
      base
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          graft.functions.FirstLastAgg.earliest(col("o_totalprice"),
            struct(col("o_orderdate"), col("o_totalprice"))).as("first_price"))
        .select(col("m").cast("timestamp_ntz").as("m"), col("o_orderstatus"),
          col("cnt"), col("first_price"))
        .orderBy(col("m"), col("o_orderstatus"))
    }),

    // the SAME aggregation as rollup_rewrite_coarse pinned to the BASE scan
    // (a predicate on a metric column disqualifies the rewrite BY DESIGN —
    // rollup rows cannot answer it; o_totalprice is never null or negative
    // so the values are identical). The scale gate runs both at sf10 and
    // prints them side by side, so the rewrite's win is measured, not
    // assumed.
    "rollup_rewrite_base" -> ((s, dir) => {
      ensureRollup(s, dir)
      val base = s.read.parquet(s"$dir/orders.parquet")
      base
        .filter(col("o_totalprice") >= 0)
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          graft.functions.FirstLastAgg.earliest(col("o_totalprice"),
            struct(col("o_orderdate"), col("o_totalprice"))).as("first_price"))
        .select(col("m").cast("timestamp_ntz").as("m"), col("o_orderstatus"),
          col("cnt"), col("first_price"))
        .orderBy(col("m"), col("o_orderstatus"))
    }),

    // theta/kll/tuple sketch aggregates over the BASE table answered by
    // UNION-refolding the rollup's stored sketch columns (plan-asserted in
    // RollupRewriteSpec); every output is EXACT at the gate's scale (theta
    // and tuple below nominal entries, KLL below k), so the DuckDB oracle
    // over the raw table pins the values
    "rollup_rewrite_sketch" -> ((s, dir) => {
      ensureRollup(s, dir)
      import graft.plans.SketchFunctions._
      val base = s.read.parquet(s"$dir/orders.parquet")
      base.groupBy(col("o_orderstatus"))
        .agg(
          round(thetaEstimate(thetaSketch(col("o_custkey")))).cast("long").as("nd_theta"),
          kllQuantile(kllSketch(col("o_totalprice"), k = 8192), 0.5).as("q50_price"),
          graft.functions.TextFunctions.round4(
            kllRank(kllSketch(col("o_totalprice"), k = 8192), 150000.0)).as("rank_150k"),
          tupleNumEntries(tupleSketch(col("o_custkey"), Seq(lit(1.0)))).as("nd_tuple"))
        .orderBy(col("o_orderstatus"))
    }),

    // verifiably bucket-aligned time range + dimension filter over the
    // rollup (misaligned bounds would fall back to the base scan — either
    // way the oracle values must hold)
    "rollup_rewrite_filtered" -> ((s, dir) => {
      ensureRollup(s, dir)
      val base = s.read.parquet(s"$dir/orders.parquet")
      base
        .filter(col("o_orderdate") >= lit("1994-01-01 00:00:00").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
          col("o_orderstatus") =!= "P")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus"))
    }),

    // THE 100 TB distinct-count path, measured directly (not via the
    // optimizer rewrite): union-merge the rollup's STORED theta columns —
    // work proportional to rollup rows (~7.2k), flat as the base grows.
    // Exact below the sketch nominal, so the raw-table oracle pins values.
    "sketch_merge_stored" -> ((s, dir) => {
      ensureRollup(s, dir)
      import graft.plans.SketchFunctions._
      s.read.parquet(rollupPathFor(dir))
        .groupBy(col("o_orderstatus"))
        .agg(round(thetaEstimate(thetaUnionAgg(col("theta_cust")))).cast("long").as("nd_cust"))
        .orderBy(col("o_orderstatus"))
    }),

    // the same distinct count BUILT from the raw table — the scale gate
    // prints both so the stored-merge win is measured, like the rollup
    // rewrite's (SCALE.md §9). The predicate on the METRIC column pins the
    // query to the base scan (a filter on a non-dimension column
    // disqualifies the rollup rewrite BY DESIGN — same trick as
    // rollup_rewrite_base; o_custkey is never null or negative, so values
    // are identical)
    "sketch_merge_rawbuild" -> ((s, dir) => {
      import graft.plans.SketchFunctions._
      s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_custkey") >= 0)
        .groupBy(col("o_orderstatus"))
        .agg(round(thetaEstimate(thetaSketch(col("o_custkey")))).cast("long").as("nd_cust"))
        .orderBy(col("o_orderstatus"))
    })
  )

  def oracle: Map[String, String] = Map(
    "sketch_merge_stored" ->
      """SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_cust
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "sketch_merge_rawbuild" ->
      """SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_cust
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "rollup_rewrite_coarse" ->
      """WITH first_rows AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
        |         o_orderstatus, o_totalprice AS first_price
        |  FROM orders
        |  QUALIFY row_number() OVER (PARTITION BY date_trunc('month', o_orderdate), o_orderstatus
        |                             ORDER BY o_orderdate ASC, o_totalprice ASC) = 1)
        |SELECT g.m, g.o_orderstatus, g.cnt, f.first_price
        |FROM (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
        |             o_orderstatus, CAST(count(*) AS BIGINT) AS cnt
        |      FROM orders GROUP BY 1, 2) g
        |JOIN first_rows f ON g.m = f.m AND g.o_orderstatus = f.o_orderstatus
        |ORDER BY 1, 2""".stripMargin,

    "rollup_rewrite_base" ->
      """WITH first_rows AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
        |         o_orderstatus, o_totalprice AS first_price
        |  FROM orders WHERE o_totalprice >= 0
        |  QUALIFY row_number() OVER (PARTITION BY date_trunc('month', o_orderdate), o_orderstatus
        |                             ORDER BY o_orderdate ASC, o_totalprice ASC) = 1)
        |SELECT g.m, g.o_orderstatus, g.cnt, f.first_price
        |FROM (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
        |             o_orderstatus, CAST(count(*) AS BIGINT) AS cnt
        |      FROM orders WHERE o_totalprice >= 0 GROUP BY 1, 2) g
        |JOIN first_rows f ON g.m = f.m AND g.o_orderstatus = f.o_orderstatus
        |ORDER BY 1, 2""".stripMargin,

    // q50/rank pin the reference's datasketches-3.1.0 rules: strictly-
    // greater getQuantile (smallest value whose per-group cumulative row
    // rank > 0.5*n), strictly-less getRank
    "rollup_rewrite_sketch" ->
      """WITH ranked AS (
        |  SELECT o_orderstatus, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderstatus
        |                            ORDER BY o_totalprice) AS rk,
        |         count(*) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM orders),
        |q AS (
        |  SELECT o_orderstatus, min(o_totalprice) AS q50_price
        |  FROM ranked WHERE rk > 0.5 * n GROUP BY 1)
        |SELECT o.o_orderstatus,
        |  CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS nd_theta,
        |  any_value(q.q50_price) AS q50_price,
        |  floor(CAST(sum(CASE WHEN o.o_totalprice < 150000.0 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*) * 10000.0 + 0.5) / 10000.0 AS rank_150k,
        |  CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS nd_tuple
        |FROM orders o JOIN q ON o.o_orderstatus = q.o_orderstatus
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "rollup_rewrite_filtered" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1994-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |  AND o_orderstatus <> 'P'
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
