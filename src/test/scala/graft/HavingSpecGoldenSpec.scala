package graft

import graft.operators.NativeQuery

/** HavingSpec parity, porting the reference's vectors
  * (processing/src/test/java/org/apache/druid/query/groupby/having/
  * HavingSpecTest.java). Each `spec.eval(getTestRow(v))` battery becomes a
  * groupBy over an inline datasource — one group per candidate value, the
  * having spec applied to the aggregated "metric" column — and the asserts
  * check exactly which groups survive. The Long.MAX_VALUE vectors pin the
  * exact long comparison path (an all-doubles threshold would collapse
  * adjacent longs).
  */
class HavingSpecGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private val MaxL = Long.MaxValue

  /** ids of rows surviving the having clause; metric = longMax(m) per id. */
  private def surviving(havingJson: String, rows: Seq[(Int, Any)]): Set[Int] = {
    val rowsJson = rows.map { case (id, v) => s"[$id, ${vJson(v)}]" }.mkString(",")
    val (typ, agg) = rows.head._2 match {
      case _: Long => ("LONG", "longMax")
      case _ => ("DOUBLE", "doubleMax")
    }
    NativeQuery.run(spark,
      s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "inline", "columnNames": ["id", "m"],
                       "columnTypes": ["LONG", "$typ"], "rows": [$rowsJson]},
        "dimensions": [{"type": "default", "dimension": "id",
                        "outputName": "id", "outputType": "LONG"}],
        "aggregations": [{"type": "$agg", "name": "metric", "fieldName": "m"}],
        "having": $havingJson
      }""", name => spark.read.parquet(s"${sf()}/$name.parquet"))
      .select("id").as[Long].collect().map(_.toInt).toSet
  }

  private def vJson(v: Any): String = v.toString

  // testGreaterThanHavingSpec (HavingSpecTest.java:102)
  test("greaterThan: exact long comparison at Long.MAX_VALUE (HavingSpecTest.java:102)") {
    assert(
      surviving(s"""{"type": "greaterThan", "aggregation": "metric", "value": ${MaxL - 10}}""",
        Seq(1 -> (MaxL - 10), 2 -> (MaxL - 15), 3 -> (MaxL - 5))) == Set(3))
    assert(
      surviving("""{"type": "greaterThan", "aggregation": "metric", "value": 100.56}""",
        Seq(1 -> 100.56d, 2 -> 90.53d, 3 -> 101.34d, 4 -> MaxL.toDouble)) == Set(3, 4))
  }

  // testLessThanHavingSpec (HavingSpecTest.java:120)
  test("lessThan: exact long comparison at Long.MAX_VALUE (HavingSpecTest.java:120)") {
    assert(
      surviving(s"""{"type": "lessThan", "aggregation": "metric", "value": ${MaxL - 10}}""",
        Seq(1 -> (MaxL - 10), 2 -> (MaxL - 15), 3 -> (MaxL - 5))) == Set(2))
    assert(
      surviving("""{"type": "lessThan", "aggregation": "metric", "value": 100.56}""",
        Seq(1 -> 100.56d, 2 -> 90.53d, 3 -> 101.34d, 4 -> 100.05d)) == Set(2, 4))
  }

  // testEqualHavingSpec (HavingSpecTest.java:143)
  test("equalTo: exact longs and numeric cross-type equality (HavingSpecTest.java:143)") {
    assert(
      surviving(s"""{"type": "equalTo", "aggregation": "metric", "value": ${MaxL - 10}}""",
        Seq(1 -> (MaxL - 10), 2 -> (MaxL - 5))) == Set(1))
    // a whole-number threshold matches long and double renderings of 100
    assert(
      surviving("""{"type": "equalTo", "aggregation": "metric", "value": 100.0}""",
        Seq(1 -> 100L, 2 -> (MaxL - 5))) == Set(1))
    assert(
      surviving("""{"type": "equalTo", "aggregation": "metric", "value": 100.56}""",
        Seq(1 -> 100.0d, 2 -> 100.56d, 3 -> 90.53d)) == Set(2))
    assert(
      surviving("""{"type": "equalTo", "aggregation": "metric", "value": 100}""",
        Seq(1 -> 100.0d, 2 -> 100.56d)) == Set(1))
  }

  // testAndHavingSpec / testOrHavingSpec / testNotHavingSepc
  // (HavingSpecTest.java:263,307,335)
  test("and/or/not composition (HavingSpecTest.java:263-343)") {
    val rows = Seq(1 -> 10L, 2 -> 20L, 3 -> 30L)
    assert(
      surviving("""{"type": "and", "havingSpecs": [
          {"type": "greaterThan", "aggregation": "metric", "value": 10},
          {"type": "lessThan", "aggregation": "metric", "value": 30}]}""", rows) == Set(2))
    assert(
      surviving("""{"type": "or", "havingSpecs": [
          {"type": "equalTo", "aggregation": "metric", "value": 10},
          {"type": "equalTo", "aggregation": "metric", "value": 30}]}""", rows) == Set(1, 3))
    assert(
      surviving("""{"type": "not", "havingSpec":
          {"type": "equalTo", "aggregation": "metric", "value": 20}}""", rows) == Set(1, 3))
  }

  // AlwaysHavingSpec / NeverHavingSpec (HavingSpecUtil vocabulary)
  test("always and never having specs") {
    val rows = Seq(1 -> 10L, 2 -> 20L)
    assert(surviving("""{"type": "always"}""", rows) == Set(1, 2))
    assert(surviving("""{"type": "never"}""", rows) == Set.empty[Int])
  }

  // DimensionSelectorHavingSpecTest — dimension-value having with an
  // extraction fn applied before the compare
  test("dimSelector having with extraction fn (DimensionSelectorHavingSpecTest)") {
    val df = NativeQuery.run(spark,
      """{
        "queryType": "groupBy",
        "dataSource": {"type": "inline", "columnNames": ["d", "m"],
          "columnTypes": ["STRING", "LONG"],
          "rows": [["apple", 1], ["banana", 2], ["avocado", 3]]},
        "dimensions": ["d"],
        "aggregations": [{"type": "longSum", "name": "s", "fieldName": "m"}],
        "having": {"type": "dimSelector", "dimension": "d", "value": "a",
                   "extractionFn": {"type": "substring", "index": 0, "length": 1}}
      }""", name => spark.read.parquet(s"${sf()}/$name.parquet"))
    assert(df.select("d").as[String].collect().toSet == Set("apple", "avocado"))
  }

  // testTypeTypo (HavingSpecTest.java:89) — unknown type is an error
  test("unknown having type rejected (HavingSpecTest.java:89)") {
    intercept[IllegalArgumentException] {
      surviving("""{"type": "equalsTo", "aggregation": "metric", "value": 1}""", Seq(1 -> 1L))
    }
  }
}
