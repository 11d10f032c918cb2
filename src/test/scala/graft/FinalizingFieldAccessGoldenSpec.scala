package graft

import graft.operators.NativeQuery

/** FinalizingFieldAccessPostAggregator goldens (processing/.../query/
  * aggregation/post/FinalizingFieldAccessPostAggregatorTest.java):
  * fieldAccess reads an aggregate's RAW value, finalizingFieldAccess
  * applies the aggregator's finalizeComputation — so arithmetic over
  * finalized sketch aggregates computes on numbers, not sketch bytes.
  * testIngestAndQueryWithArithmeticPostAggregator does this with two
  * hyperUnique aggregates (uniq_add = 3 + 9 = 12 over the sample data);
  * here the same shape runs over hyperUnique (eval-time finalized — both
  * access types read the estimate) AND the raw-state families (theta,
  * quantilesDoublesSketch) where the distinction is load-bearing.
  */
class FinalizingFieldAccessGoldenSpec extends SparkSpecBase {

  // market: 3 distinct; quality: 9 distinct — the reference sample's shape
  private val ds = {
    val markets = Seq("spot", "total_market", "upfront")
    val qualities = (1 to 9).map(i => s"quality_$i")
    val rows = (0 until 36).map { i =>
      s"""["2011-01-1${i % 3 + 2}T00:00:00", "${markets(i % 3)}", "${qualities(i % 9)}", ${i + 1}]"""
    }.mkString(",\n      ")
    s"""{"type": "inline",
      "columnNames": ["__time", "market", "quality", "index"],
      "columnTypes": ["STRING", "STRING", "STRING", "LONG"],
      "rows": [$rows]}"""
  }

  private def run(aggsAndPostAggs: String) =
    NativeQuery.run(spark, s"""{
        "queryType": "groupBy",
        "dataSource": $ds,
        "intervals": ["1970-01-01/2050-01-01"],
        "granularity": "all",
        $aggsAndPostAggs
      }""", _ => spark.emptyDataFrame).collect()

  test("testIngestAndQueryWithArithmeticPostAggregator (:201): uniq_add = " +
      "finalized(hll_market) + finalized(hll_quality) = 3 + 9 = 12") {
    val r = run("""
        "aggregations": [
          {"type": "hyperUnique", "name": "hll_market", "fieldName": "market"},
          {"type": "hyperUnique", "name": "hll_quality", "fieldName": "quality"}
        ],
        "postAggregations": [
          {"type": "arithmetic", "name": "uniq_add", "fn": "+", "fields": [
            {"type": "finalizingFieldAccess", "name": "uniq_market", "fieldName": "hll_market"},
            {"type": "finalizingFieldAccess", "name": "uniq_quality", "fieldName": "hll_quality"}]}
        ]""")
    assert(r.length == 1)
    assert(math.abs(r.head.getAs[Double]("hll_market") - 3.0) < 0.1)
    assert(math.abs(r.head.getAs[Double]("hll_quality") - 9.0) < 0.1)
    assert(math.abs(r.head.getAs[Double]("uniq_add") - 12.0) < 0.1)
  }

  test("raw-state families: finalizingFieldAccess applies the theta " +
      "estimate / DoublesSketch getN finalizers where plain fieldAccess " +
      "would hand arithmetic the sketch BYTES") {
    val r = run("""
        "aggregations": [
          {"type": "thetaSketch", "name": "theta_market", "fieldName": "market"},
          {"type": "thetaSketch", "name": "theta_quality", "fieldName": "quality"},
          {"type": "quantilesDoublesSketch", "name": "qs_index", "fieldName": "index"}
        ],
        "postAggregations": [
          {"type": "arithmetic", "name": "theta_add", "fn": "+", "fields": [
            {"type": "finalizingFieldAccess", "name": "f_market", "fieldName": "theta_market"},
            {"type": "finalizingFieldAccess", "name": "f_quality", "fieldName": "theta_quality"}]},
          {"type": "arithmetic", "name": "n_plus_uniq", "fn": "+", "fields": [
            {"type": "finalizingFieldAccess", "name": "f_n", "fieldName": "qs_index"},
            {"type": "finalizingFieldAccess", "name": "f_m2", "fieldName": "theta_market"}]}
        ]""")
    assert(r.length == 1)
    val row = r.head
    // finalized outputs: theta → estimate, quantiles sketch → stream length n
    assert(row.getAs[Double]("theta_market") == 3.0)
    assert(row.getAs[Double]("theta_quality") == 9.0)
    assert(row.getAs[Long]("qs_index") == 36L)
    assert(row.getAs[Double]("theta_add") == 12.0)
    assert(row.getAs[Double]("n_plus_uniq") == 39.0)
  }
}
