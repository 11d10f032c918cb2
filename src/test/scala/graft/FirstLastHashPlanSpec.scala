package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.FirstLastAgg
import graft.sources.Sources

/** Plan + semantics gate for the hash-plannable first/last/any family
  * (FirstLastFoldAgg / AnyFoldAgg): the min_by/max_by/first() spellings
  * planned as SortAggregate (immutable declarative buffers); the fold
  * aggregates must plan as ObjectHashAggregate with no Sort on either
  * shuffle side, matching the reference's incremental first/last lifecycle
  * (query/aggregation/first/LongFirstAggregator.java:40-56). */
class FirstLastHashPlanSpec extends SparkSpecBase {

  private def executed(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def assertHashPlanned(df: DataFrame, label: String): Unit = {
    val plan = executed(df)
    assert(!plan.contains("SortAggregate"),
      s"$label plans SortAggregate:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"$label lacks ObjectHashAggregate:\n$plan")
  }

  test("EARLIEST/LATEST pair fold plans as ObjectHashAggregate and matches min_by") {
    val orders = Sources.table(spark, sf(), "orders")
    val folded = orders.groupBy(col("o_orderpriority"))
      .agg(
        FirstLastAgg.earliest(col("o_totalprice"),
          struct(col("o_orderdate"), col("o_orderkey"))).as("earliest_price"),
        FirstLastAgg.latest(col("o_totalprice"),
          struct(col("o_orderdate"), col("o_orderkey"))).as("latest_price"))
    assertHashPlanned(folded, "earliest/latest")
    val legacy = orders.groupBy(col("o_orderpriority"))
      .agg(
        min_by(col("o_totalprice"), struct(col("o_orderdate"), col("o_orderkey"))).as("earliest_price"),
        max_by(col("o_totalprice"), struct(col("o_orderdate"), col("o_orderkey"))).as("latest_price"))
    val a = folded.orderBy("o_orderpriority").collect().toSeq
    val b = legacy.orderBy("o_orderpriority").collect().toSeq
    assert(a == b, s"fold vs min_by mismatch:\n$a\n$b")
  }

  test("rollup pair refold (firstPair/lastPair) hash-plans and round-trips") {
    val orders = Sources.table(spark, sf(), "orders")
    // build rollup pairs per (priority, day), then refold to priority level
    val rollup = orders.groupBy(col("o_orderpriority"), col("o_orderdate"))
      .agg(FirstLast.firstPair(col("o_totalprice"), col("o_orderdate")).as("fp"),
           FirstLast.lastPair(col("o_totalprice"), col("o_orderdate")).as("lp"))
    assertHashPlanned(rollup, "firstPair/lastPair build")
    val refolded = rollup.groupBy(col("o_orderpriority"))
      .agg(FirstLast.firstValue(col("fp")).as("first_price"),
           FirstLast.lastValue(col("lp")).as("last_price"))
    assertHashPlanned(refolded, "refold")
    // refolded first == direct first over raw rows (same (t, v) ordering)
    val direct = orders.groupBy(col("o_orderpriority"))
      .agg(FirstLastAgg.earliest(col("o_totalprice"),
             struct(col("o_orderdate"), col("o_totalprice"))).as("first_price"),
           FirstLastAgg.latest(col("o_totalprice"),
             struct(col("o_orderdate"), col("o_totalprice"))).as("last_price"))
    assert(refolded.orderBy("o_orderpriority").collect().toSeq ==
      direct.orderBy("o_orderpriority").collect().toSeq)
  }

  test("ANY_VALUE fold hash-plans; group-constant value is exact") {
    val n = Sources.table(spark, sf(), "nation")
    val c = Sources.table(spark, sf(), "customer")
    val q = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_nationkey"))
      .agg(FirstLastAgg.anyValue(col("n_name")).as("nation_name"))
    assertHashPlanned(q, "any_value")
    val expected = n.select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getString(1)).toMap
    q.collect().foreach { r =>
      assert(expected(r.getAs[Number](0).longValue()) == r.getString(1))
    }
  }

  test("any_value SQL name resolves to the hash fold; ignoreNulls honored") {
    graft.functions.GraftSqlFunctions.register(spark)
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      org.apache.spark.sql.Row("a", null),
      org.apache.spark.sql.Row("a", 2L),
      org.apache.spark.sql.Row("b", 7L)).asJava
    val df = spark.createDataFrame(rows,
      new org.apache.spark.sql.types.StructType()
        .add("k", "string").add("v", "long"))
    df.createOrReplaceTempView("anyv_t")
    val q = spark.sql("SELECT k, any_value(v, true) AS v FROM anyv_t GROUP BY k")
    assertHashPlanned(q, "any_value SQL")
    val got = q.collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(got("a") == 2L, s"ignoreNulls should skip the null: $got")
    assert(got("b") == 7L)
  }

  test("native JSON longFirst/stringLast/longAny hash-plan") {
    val json = """
      {"queryType": "groupBy", "dataSource": "orders",
       "timeColumn": "o_orderdate",
       "dimensions": ["o_orderpriority"],
       "granularity": "all",
       "aggregations": [
         {"type": "doubleFirst", "name": "first_price", "fieldName": "o_totalprice"},
         {"type": "stringLast", "name": "last_status", "fieldName": "o_orderstatus"},
         {"type": "longAny", "name": "any_cust", "fieldName": "o_custkey"}
       ]}"""
    val df = NativeQuery.run(spark, json,
      name => Sources.table(spark, sf(), name))
    val plan = executed(df)
    assert(!plan.contains("SortAggregate"), s"native first/last/any plans SortAggregate:\n$plan")
    assert(df.count() > 0)
  }
}
