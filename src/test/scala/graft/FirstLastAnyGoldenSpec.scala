package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.FirstLastAgg
import graft.operators.FirstLast

/** Ported reference vectors for the first/last/any aggregator family over
  * the hash-plannable folds (FirstLastFoldAgg / AnyFoldAgg).
  *
  * Sources (reference: processing/src/test/java/org/apache/druid/query/
  * aggregation/):
  *  - first/StringFirstAggregationTest.java:54-56,88-114,135-157,159-175
  *  - first/LongFirstAggregationTest.java:51-53,96-112
  *  - last/LongLastAggregationTest.java:51-53,79-102
  *  - any/StringAnyAggregationTest.java:45-99 (null-first yields null —
  *    nulls are NOT skipped by ANY)
  */
class FirstLastAnyGoldenSpec extends SparkSpecBase {

  private def df(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema).coalesce(1)

  private val tv = new StructType()
    .add("t", LongType).add("v", StringType)

  test("StringFirstAggregationTest.testStringFirstAggregator:88-101 — " +
      "min __time wins; a null value row participates") {
    // strings {"1111","2222","3333",null}, times {8224,6879,2436,3546}
    val d = df(Seq(Row(8224L, "1111"), Row(6879L, "2222"),
      Row(2436L, "3333"), Row(3546L, null)), tv)
    val r = d.agg(FirstLastAgg.earliest(col("v"), col("t")).as("billy")).head()
    assert(r.getString(0) == "3333")
  }

  test("StringFirstAggregationTest.testStringFirstAggregatorWithTimeColumn:103-114 — " +
      "customTime {2,1,3,4} reorders the winner") {
    val d = df(Seq(Row(2L, "1111"), Row(1L, "2222"),
      Row(3L, "3333"), Row(4L, null)), tv)
    val r = d.agg(FirstLastAgg.earliest(col("v"), col("t")).as("billy")).head()
    assert(r.getString(0) == "2222")
  }

  test("StringFirstAggregationTest.testCombineLeftRightSame:153-157 — " +
      "a timestamp TIE keeps the left (first-seen) operand") {
    val d = df(Seq(Row(1467225000L, "AAAA"), Row(1467225000L, "BBBB")), tv)
    val r = d.agg(FirstLastAgg.earliest(col("v"), col("t"))).head()
    assert(r.getString(0) == "AAAA")
  }

  test("StringFirstAggregationTest.testStringFirstCombiningAggregator:159-175 — " +
      "refolding stored (time, value) pairs picks the min-time pair incl. its time") {
    // pairs {(52782,AAAA),(65492,BBBB),(69134,CCCC),(11111,DDDD)}
    val pairType = new StructType().add(
      "p", new StructType().add("t", LongType).add("v", StringType))
    val d = df(Seq(Row(Row(52782L, "AAAA")), Row(Row(65492L, "BBBB")),
      Row(Row(69134L, "CCCC")), Row(Row(11111L, "DDDD"))), pairType)
    val r = d.agg(FirstLast.refoldFirst(col("p")).as("folded")).head()
    val folded = r.getStruct(0)
    assert(folded.getLong(0) == 11111L && folded.getString(1) == "DDDD")
  }

  test("LongFirstAggregationTest:51-53,96-112 — long values incl. " +
      "Long.MinValue; custom time column") {
    val lv = new StructType().add("t", LongType).add("ct", LongType).add("v", LongType)
    // longValues {185,-216,-128751132,MIN}, times {1123126751,1784247991,
    // 1854329816,1000000000}, customTimes {2,1,3,4}
    val d = df(Seq(
      Row(1123126751L, 2L, 185L), Row(1784247991L, 1L, -216L),
      Row(1854329816L, 3L, -128751132L), Row(1000000000L, 4L, Long.MinValue)), lv)
    val byTime = d.agg(FirstLastAgg.earliest(col("v"), col("t"))).head()
    assert(byTime.getLong(0) == Long.MinValue) // min __time = 1000000000 → row 3
    val byCustom = d.agg(FirstLastAgg.earliest(col("v"), col("ct"))).head()
    assert(byCustom.getLong(0) == -216L) // min customTime = 1 → row 1
  }

  test("LongLastAggregationTest:51-53,79-102 — max time wins incl. " +
      "Long.MaxValue values; custom time column") {
    val lv = new StructType().add("t", LongType).add("ct", LongType).add("v", LongType)
    // longValues {23216,8635,1547123,MAX}, times {1467935723,1467225653,
    // 1601848932,72515}, customTimes {1,4,3,2}
    val d = df(Seq(
      Row(1467935723L, 1L, 23216L), Row(1467225653L, 4L, 8635L),
      Row(1601848932L, 3L, 1547123L), Row(72515L, 2L, Long.MaxValue)), lv)
    val byTime = d.agg(FirstLastAgg.latest(col("v"), col("t"))).head()
    assert(byTime.getLong(0) == 1547123L) // max __time = 1601848932 → row 2
    val byCustom = d.agg(FirstLastAgg.latest(col("v"), col("ct"))).head()
    assert(byCustom.getLong(0) == 8635L) // max customTime = 4 → row 1
  }

  test("StringAnyAggregationTest:45-99 — ANY takes the first value offered; " +
      "a LEADING NULL is a legitimate answer (nulls not skipped)") {
    val vOnly = new StructType().add("v", StringType)
    val plain = df(Seq(Row("1111"), Row("2222"), Row("3333"), Row(null)), vOnly)
      .agg(FirstLastAgg.anyValue(col("v"))).head()
    assert(plain.getString(0) == "1111")
    val nullFirst = df(Seq(Row(null), Row("1111"), Row("2222"), Row("3333")), vOnly)
      .agg(FirstLastAgg.anyValue(col("v"))).head()
    assert(nullFirst.isNullAt(0), "testStringAnyAggregatorWithNullFirst expects null")
  }

  test("native stringFirst maxStringBytes truncates the STORED value " +
      "(StringFirstAggregatorFactory.java default 1024)") {
    val d = df(Seq(Row(1L, "abcdefghij"), Row(2L, "zz")), tv)
    d.createOrReplaceTempView("fl_trunc_t")
    val out = graft.operators.NativeQuery.run(spark,
      """{"queryType": "timeseries", "dataSource": "fl_trunc_t",
          "timeColumn": "t", "granularity": "all",
          "aggregations": [
            {"type": "stringFirst", "name": "f", "fieldName": "v",
             "maxStringBytes": 4}]}""",
      _ => spark.table("fl_trunc_t"))
    assert(out.head().getString(0) == "abcd")
  }
}
