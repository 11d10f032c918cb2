package graft

import org.apache.spark.sql.Row
import graft.operators.NativeQuery

/** StringColumnAggregationTest.java goldens (processing/.../query/
  * aggregation): numeric aggregators over STRING dimension columns parse
  * each value (Rows.objectToNumber — "1.0" longSums as 1), and over
  * MULTI-VALUE string dimensions they fold EVERY element with nulls
  * skipped: the fixture's multiValue cell is [v, null, v], so each row
  * contributes 2v to the sums and v to min/max. The reference runs the
  * query over the same segment twice (incremental + persisted), so all
  * sums double and the row count is 2n; reproduced by unioning the rows
  * twice. n = 10, values "1.0".."10.0":
  * count = 20, singleSum = n(n+1) = 110, multiSum = 2n(n+1) = 220,
  * max = 10, min = 1 in every width (double/float/long).
  */
class StringColumnAggregationGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val rows = {
    val one = (1 to 10).map { i =>
      val v = s"${i * 1.0}"
      ("2024-01-01 00:00:00", v, Seq[String](v, null, v), 1L)
    }
    (one ++ one).toDF("t", "singleValue", "multiValue", "count")
      .selectExpr("cast(t as timestamp_ntz) as __time", "singleValue", "multiValue", "`count`")
  }

  private val aggsJson = """[
    {"type": "doubleSum", "name": "singleDoubleSum", "fieldName": "singleValue"},
    {"type": "doubleSum", "name": "multiDoubleSum", "fieldName": "multiValue"},
    {"type": "doubleMax", "name": "singleDoubleMax", "fieldName": "singleValue"},
    {"type": "doubleMax", "name": "multiDoubleMax", "fieldName": "multiValue"},
    {"type": "doubleMin", "name": "singleDoubleMin", "fieldName": "singleValue"},
    {"type": "doubleMin", "name": "multiDoubleMin", "fieldName": "multiValue"},
    {"type": "floatSum", "name": "singleFloatSum", "fieldName": "singleValue"},
    {"type": "floatSum", "name": "multiFloatSum", "fieldName": "multiValue"},
    {"type": "floatMax", "name": "singleFloatMax", "fieldName": "singleValue"},
    {"type": "floatMax", "name": "multiFloatMax", "fieldName": "multiValue"},
    {"type": "floatMin", "name": "singleFloatMin", "fieldName": "singleValue"},
    {"type": "floatMin", "name": "multiFloatMin", "fieldName": "multiValue"},
    {"type": "longSum", "name": "singleLongSum", "fieldName": "singleValue"},
    {"type": "longSum", "name": "multiLongSum", "fieldName": "multiValue"},
    {"type": "longMax", "name": "singleLongMax", "fieldName": "singleValue"},
    {"type": "longMax", "name": "multiLongMax", "fieldName": "multiValue"},
    {"type": "longMin", "name": "singleLongMin", "fieldName": "singleValue"},
    {"type": "longMin", "name": "multiLongMin", "fieldName": "multiValue"},
    {"type": "longSum", "name": "count", "fieldName": "count"}
  ]"""

  private def check(r: Row): Unit = {
    assert(r.getAs[Long]("count") == 20L)
    assert(r.getAs[Double]("singleDoubleSum") == 110.0)
    assert(r.getAs[Double]("multiDoubleSum") == 220.0)
    assert(r.getAs[Double]("singleDoubleMax") == 10.0)
    assert(r.getAs[Double]("multiDoubleMax") == 10.0)
    assert(r.getAs[Double]("singleDoubleMin") == 1.0)
    assert(r.getAs[Double]("multiDoubleMin") == 1.0)
    assert(r.getAs[Float]("singleFloatSum") == 110.0f)
    assert(r.getAs[Float]("multiFloatSum") == 220.0f)
    assert(r.getAs[Float]("singleFloatMax") == 10.0f)
    assert(r.getAs[Float]("multiFloatMax") == 10.0f)
    assert(r.getAs[Float]("singleFloatMin") == 1.0f)
    assert(r.getAs[Float]("multiFloatMin") == 1.0f)
    assert(r.getAs[Long]("singleLongSum") == 110L)
    assert(r.getAs[Long]("multiLongSum") == 220L)
    assert(r.getAs[Long]("singleLongMax") == 10L)
    assert(r.getAs[Long]("multiLongMax") == 10L)
    assert(r.getAs[Long]("singleLongMin") == 1L)
    assert(r.getAs[Long]("multiLongMin") == 1L)
  }

  test("testGroupBy (StringColumnAggregationTest.java:142): all 18 " +
      "aggregators over string + multi-value string columns") {
    val df = NativeQuery.run(spark, s"""{
        "queryType": "groupBy",
        "dataSource": "agg_str",
        "intervals": ["1970-01-01/2050-01-01"],
        "granularity": "all",
        "aggregations": $aggsJson
      }""", name => { assert(name == "agg_str"); rows })
    val out = df.collect()
    assert(out.length == 1)
    check(out.head)
  }

  test("testTimeseries (StringColumnAggregationTest.java:203): the same " +
      "battery through the timeseries engine") {
    val df = NativeQuery.run(spark, s"""{
        "queryType": "timeseries",
        "dataSource": "agg_str",
        "intervals": ["1970-01-01/2050-01-01"],
        "granularity": "all",
        "aggregations": $aggsJson
      }""", name => { assert(name == "agg_str"); rows })
    val out = df.collect()
    assert(out.length == 1)
    check(out.head)
  }
}
