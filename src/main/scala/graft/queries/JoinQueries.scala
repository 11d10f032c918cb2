package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.{Sources, LookupRegistry}

/** Join / datasource coverage (SURVEY §2.2, §2.5, §2.11).
  *
  * The reference only supports broadcast hash joins with an in-memory right
  * side (segment/join/HashJoinEngine.java, DruidJoinRule.java:224-311).
  * Spark gives the superset: broadcast for dims that fit (we hint them
  * explicitly, matching Druid's globalTable/lookup), shuffle/sort-merge for
  * fact-to-fact, semi/anti for IN/NOT-EXISTS rewrites. At 100 TB the dim
  * broadcasts below avoid shuffling the fact table entirely.
  */
object JoinQueries {
  private val D = DecimalType(18, 2)
  // money sums: exact decimal accumulation, but OUTPUT as double — the
  // driver's value compare renders cells to strings, and a decimal's
  // trailing zeros ("123.40") vs DuckDB's float ("123.4") hash-mismatch

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // broadcast dim join (lookup/globalTable datasource pattern)
    "join_broadcast_dim" -> ((s, dir) => {
      val li = Sources.table(s, dir, "lineitem")
      val part = Sources.globalTable(Sources.table(s, dir, "part"))
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
             count(lit(1)).as("cnt"))
        .orderBy(col("p_brand"))
    }),

    // multi-table star join: lineitem→orders→customer→nation→region
    "join_star_region_revenue" -> ((s, dir) => {
      // r16: the fact side probes four broadcast joins + a decimal aggregate
      // in whatever parallelism the scan yields — rebalance the single-row-
      // group local scan, projected first so the conditional shuffle carries
      // the 2 used columns, not 16 (guide §2.3/§2.5); no-op at scale
      val li = Sources.parallelized(Sources.table(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice"))
      val o = Sources.table(s, dir, "orders")
      val c = Sources.table(s, dir, "customer")
      val n = Sources.globalTable(Sources.table(s, dir, "nation"))
      val r = Sources.globalTable(Sources.table(s, dir, "region"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sum(col("l_extendedprice").cast(D)).cast("double").as("revenue"),
             count(lit(1)).as("cnt"))
        .orderBy(col("r_name"))
    }),

    // left outer join: customers keep rows with no orders
    "join_left_outer" -> ((s, dir) => {
      val c = Sources.table(s, dir, "customer")
      val o = Sources.table(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_orders"),
             count(lit(1)).as("n_rows"))
        .orderBy(col("c_mktsegment"))
    }),

    // semi join (SQL EXISTS / IN rewrite — CalciteJoinQueryTest semantics)
    "join_semi" -> ((s, dir) => {
      val o = Sources.table(s, dir, "orders")
      val li = Sources.table(s, dir, "lineitem").filter(col("l_quantity") >= 49.0)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderpriority"))
    }),

    // anti join (NOT EXISTS)
    "join_anti" -> ((s, dir) => {
      val c = Sources.table(s, dir, "customer")
      val o = Sources.table(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers_no_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    // full outer join of two aggregates (JoinType.java:24-66 FULL)
    "join_full_outer" -> ((s, dir) => {
      val sup = Sources.table(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("k")).agg(count(lit(1)).as("n_supp"))
      val cust = Sources.table(s, dir, "customer")
        .groupBy(col("c_nationkey").as("k2")).agg(count(lit(1)).as("n_cust"))
      sup.join(cust, sup("k") === cust("k2"), "full")
        .select(coalesce(sup("k"), cust("k2")).as("nationkey"),
                col("n_supp"), col("n_cust"))
        .orderBy(col("nationkey"))
    }),

    // lookup datasource: broadcast KV enrichment (LookupReferencesManager)
    "lookup_enrich" -> ((s, dir) => {
      val lookups = new LookupRegistry
      lookups.register("nation_name",
        Sources.table(s, dir, "nation").select(col("n_nationkey"), col("n_name")))
      val sup = Sources.table(s, dir, "supplier")
      lookups(sup, "s_nationkey", "nation_name", "nation")
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n_suppliers"))
        .orderBy(col("nation"))
    }),

    // union datasource (UnionDataSource.java:34) over two filtered branches
    "union_datasource" -> ((s, dir) => {
      val li = Sources.table(s, dir, "lineitem")
      val a = li.filter(col("l_returnflag") === "A").select(col("l_returnflag"), col("l_quantity"))
      val r = li.filter(col("l_returnflag") === "R").select(col("l_returnflag"), col("l_quantity"))
      Sources.union(Seq(a, r))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // inline datasource (InlineDataSource.java:48) joined to a table
    "inline_datasource" -> ((s, dir) => {
      val codes = Sources.inline(s, Seq("AMERICA" -> 1L, "ASIA" -> 2L, "EUROPE" -> 3L))
        .withColumnRenamed("k", "r_name_key").withColumnRenamed("v", "code")
      val r = Sources.table(s, dir, "region")
      r.join(codes, r("r_name") === codes("r_name_key"), "left")
        .select(col("r_regionkey"), col("r_name"), col("code"))
        .orderBy(col("r_regionkey"))
    })
  )

  def oracle: Map[String, String] = Map(
    "join_broadcast_dim" ->
      """SELECT p_brand, sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_star_region_revenue" ->
      """SELECT r_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_left_outer" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_semi" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers_no_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_full_outer" ->
      """SELECT coalesce(s.k, c.k2) AS nationkey, s.n_supp, c.n_cust FROM
        |(SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |FULL JOIN
        |(SELECT c_nationkey AS k2, count(*) AS n_cust FROM customer GROUP BY 1) c
        |ON s.k = c.k2 ORDER BY nationkey""".stripMargin,

    "lookup_enrich" ->
      """SELECT n_name AS nation, count(*) AS n_suppliers
        |FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "union_datasource" ->
      """SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS sum_qty FROM (
        |  SELECT l_returnflag, l_quantity FROM lineitem WHERE l_returnflag = 'A'
        |  UNION ALL
        |  SELECT l_returnflag, l_quantity FROM lineitem WHERE l_returnflag = 'R'
        |) GROUP BY 1 ORDER BY 1""".stripMargin,

    "inline_datasource" ->
      """SELECT r_regionkey, r_name, c.code FROM region
        |LEFT JOIN (
        |  SELECT r_name_key, CAST(code AS BIGINT) AS code
        |  FROM (VALUES ('AMERICA', 1), ('ASIA', 2), ('EUROPE', 3)) AS v(r_name_key, code)
        |) c ON r_name = c.r_name_key
        |ORDER BY r_regionkey""".stripMargin
  )
}
