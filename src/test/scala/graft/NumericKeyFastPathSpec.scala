package graft

import org.apache.spark.sql.functions._
import graft.operators.NativeQuery
import graft.sources.Sources

/** The numeric StringComparator's fast path: a bound filter / dimension
  * metric spec over a column that is ALREADY numeric must not regex every
  * row through the BigDecimal parseability grammar (the key is
  * struct(2, cast double, null) by construction — StringComparators.java
  * NumericComparator semantics are unchanged because every numeric value is
  * parseable). */
class NumericKeyFastPathSpec extends SparkSpecBase {

  private def resolve(name: String) = Sources.table(spark, sf("sf0.01"), name)

  test("numeric bound filter on a double column plans without RLIKE") {
    val json = """
      {"queryType": "timeseries", "dataSource": "lineitem",
       "timeColumn": "l_shipdate", "granularity": "month",
       "filter": {"type": "bound", "dimension": "l_quantity",
                  "lower": "5", "upper": "45", "ordering": "numeric"},
       "aggregations": [{"type": "count", "name": "cnt"}]}"""
    val df = NativeQuery.run(spark, json, resolve)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toUpperCase.contains("RLIKE"),
      s"numeric bound over a double column still regexes:\n$plan")
    assert(df.count() > 0)
  }

  test("numeric bound fast path matches the string-key slow path") {
    val li = resolve("lineitem")
    import graft.functions.StringOrderings
    val fast = li.filter(
      StringOrderings.key("numeric", col("l_quantity"),
        Some(org.apache.spark.sql.types.DoubleType)) >=
        StringOrderings.numericKeyLiteral("17"))
      .agg(count(lit(1))).head.getLong(0)
    val slow = li.filter(
      StringOrderings.key("numeric", col("l_quantity")) >=
        StringOrderings.key("numeric", lit("17")))
      .agg(count(lit(1))).head.getLong(0)
    assert(fast == slow && fast > 0)
  }

  test("numeric dimension topN spec over a long column plans without RLIKE") {
    val json = """
      {"queryType": "topN", "dataSource": "lineitem",
       "timeColumn": "l_shipdate", "granularity": "all",
       "dimension": {"type": "default", "dimension": "l_suppkey",
                     "outputName": "l_suppkey", "outputType": "LONG"},
       "threshold": 5,
       "metric": {"type": "dimension", "ordering": "numeric",
                  "previousStop": "3"},
       "aggregations": [{"type": "count", "name": "cnt"}]}"""
    val df = NativeQuery.run(spark, json, resolve)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toUpperCase.contains("RLIKE"),
      s"numeric dimension spec over a long column still regexes:\n$plan")
    val dims = df.collect().map(_.getAs[Number]("l_suppkey").longValue()).toSeq
    assert(dims == dims.sorted, s"not numeric-ordered: $dims")
    assert(dims.forall(_ > 3), s"previousStop=3 not applied: $dims")
  }

  test("null numeric values key identically on both paths (cls=1, nulls before strings before numbers)") {
    import graft.functions.StringOrderings
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](java.util.List.of(
        org.apache.spark.sql.Row(java.lang.Double.valueOf(3.5)),
        org.apache.spark.sql.Row(null.asInstanceOf[java.lang.Double]))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))))
    def keys(fast: Boolean) = df.select(
      StringOrderings.key("numeric", col("v"),
        if (fast) Some(org.apache.spark.sql.types.DoubleType) else None).as("k"))
      .collect().map(_.getStruct(0)).map(s => (s.get(0), s.get(1), s.get(2))).toSeq
    assert(keys(fast = true) == keys(fast = false),
      "fast-path key diverges from the slow path (null handling)")
    // a null value sorts BELOW an upper bound's key only through cls=1 —
    // the pre-fast-path behavior an upper-only bound filter relies on
    val nullIncluded = df.filter(
      StringOrderings.key("numeric", col("v"), Some(org.apache.spark.sql.types.DoubleType)) <=
        StringOrderings.numericKeyLiteral("10")).count()
    val nullIncludedSlow = df.filter(
      StringOrderings.key("numeric", col("v").cast("string")) <=
        StringOrderings.numericKeyLiteral("10")).count()
    assert(nullIncluded == nullIncludedSlow)
  }

  test("unparseable literal still classes below numbers (slow-path semantics kept)") {
    import graft.functions.StringOrderings
    val li = resolve("lineitem").limit(10)
    // every numeric value outranks the unparseable literal "abc"
    val n = li.filter(
      StringOrderings.key("numeric", col("l_quantity"),
        Some(org.apache.spark.sql.types.DoubleType)) >
        StringOrderings.numericKeyLiteral("abc"))
      .count()
    assert(n == 10)
  }
}
