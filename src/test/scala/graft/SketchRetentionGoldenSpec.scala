package graft

import org.apache.spark.sql.functions._
import graft.operators.NativeQuery
import graft.sources.BatchIngest
import graft.sources.BatchIngest.IngestSpec

/** Ported END-TO-END reference case: the theta-sketch RETENTION analysis —
  * TSV ingest through the reference's own parse spec, then the VERBATIM
  * reference query JSON (filtered thetaSketch aggregators whose filters mix
  * a selector with per-day `__time` interval filters, granularity "ALL",
  * INTERSECT set-op post-aggs) with the reference's exact expected values.
  *
  * Source (reference: extensions-core/datasketches/src/test/):
  *  - java/.../theta/SketchAggregationTest.java:431-467
  *    testRetentionDataIngestAndGpByQuery — expected row: day_1 20.0,
  *    day_2 20.0, day_3 10.0, estimate post-agg 20.0, intersections
  *    10.0 / 5.0, non_existing_col_validation 0.0
  *  - resources/retention_test_data_group_by_query.json (query, verbatim)
  *  - resources/retention_test_data.tsv (50 rows, embedded below)
  *  - resources/simple_test_data_record_parser.json (tsv columns
  *    timestamp/product/pty_country, timestampSpec format yyyyMMddHH)
  */
class SketchRetentionGoldenSpec extends SparkSpecBase {

  // retention_test_data.tsv: day 1 countries 1-20; day 2 countries 1-10 +
  // 50-59; day 3 countries 1-5 + 60-64 (retention: 10 of day-1 return on
  // day 2, 5 on day 3)
  private val RetentionTsv: String = {
    def rows(ts: String, ids: Seq[Int]) =
      ids.map(i => s"$ts\tproduct_1\tpty_country_$i")
    (rows("2014102001", 1 to 20) ++
      rows("2014102101", (1 to 10) ++ (50 to 59)) ++
      rows("2014102201", (1 to 5) ++ (60 to 64))).mkString("\n")
  }

  // retention_test_data_group_by_query.json, verbatim
  private val RetentionQueryJson =
    """{
      "queryType": "groupBy",
      "dataSource": "test_datasource",
      "granularity":"ALL",
      "dimensions": ["product"],
      "filter": {
        "type": "selector",
        "dimension": "product",
        "value": "product_1"
      },
      "aggregations": [
        {
          "type" : "filtered",
          "filter" : {
            "type" : "and",
            "fields" : [
              {"type" : "selector", "dimension" : "product", "value" : "product_1"},
              {"type" : "interval", "dimension" : "__time",
               "intervals" : ["2014-10-20T00:00:00.000Z/2014-10-21T00:00:00.000Z"]}
            ]
          },
          "aggregator" : {"type": "thetaSketch", "name": "p1_unique_country_day_1", "fieldName": "pty_country"}
        },
        {
          "type" : "filtered",
          "filter" : {
            "type" : "and",
            "fields" : [
              {"type" : "selector", "dimension" : "product", "value" : "product_1"},
              {"type" : "interval", "dimension" : "__time",
               "intervals" : ["2014-10-21T00:00:00.000Z/2014-10-22T00:00:00.000Z"]}
            ]
          },
          "aggregator" : {"type": "thetaSketch", "name": "p1_unique_country_day_2", "fieldName": "pty_country"}
        },
        {
          "type" : "filtered",
          "filter" : {
            "type" : "and",
            "fields" : [
              {"type" : "selector", "dimension" : "product", "value" : "product_1"},
              {"type" : "interval", "dimension" : "__time",
               "intervals" :  ["2014-10-22T00:00:00.000Z/2014-10-23T00:00:00.000Z"]}
            ]
          },
          "aggregator" : {"type": "thetaSketch", "name": "p1_unique_country_day_3", "fieldName": "pty_country"}
        },
        {
          "type": "thetaSketch",
          "name": "non_existing_col_validation",
          "fieldName": "non_existing_col",
          "size": 16384
        }
      ],
      "postAggregations": [
        {
          "type": "thetaSketchEstimate",
          "name": "sketchEstimatePostAgg",
          "field": {"type": "fieldAccess", "fieldName": "p1_unique_country_day_1"}
        },
        {
          "type": "thetaSketchEstimate",
          "name": "sketchIntersectionPostAggEstimate1",
          "field": {
            "type": "thetaSketchSetOp",
            "name": "sketchIntersectionPostAgg",
            "func": "INTERSECT",
            "size": 16384,
            "fields": [
              {"type": "fieldAccess", "fieldName": "p1_unique_country_day_1"},
              {"type": "fieldAccess", "fieldName": "p1_unique_country_day_2"}
            ]
          }
        },
        {
          "type": "thetaSketchEstimate",
          "name": "sketchIntersectionPostAggEstimate2",
          "field": {
            "type": "thetaSketchSetOp",
            "name": "sketchIntersectionPostAgg2",
            "func": "INTERSECT",
            "size": 16384,
            "fields": [
              {"type": "fieldAccess", "fieldName": "p1_unique_country_day_1"},
              {"type": "fieldAccess", "fieldName": "p1_unique_country_day_3"}
            ]
          }
        }
      ],
      "intervals": ["2014-10-19T00:00:00.000Z/2014-10-23T00:00:00.000Z"]
    }"""

  test("testRetentionDataIngestAndGpByQuery (SketchAggregationTest.java:431-467) — " +
      "verbatim query JSON over the reference TSV, exact expected values") {
    // ingest per simple_test_data_record_parser.json: headerless TSV,
    // columns timestamp/product/pty_country, timestampSpec yyyyMMddHH
    val spec = IngestSpec(
      inputPath = "",
      inputFormat = "csv",
      formatOptions = Map("sep" -> "\t", "columns" -> "timestamp,product,pty_country"),
      timeColumn = "__time",
      timeParseExpr = BatchIngest.timestampSpec("timestamp", "yyyyMMddHH"),
      inlineData = Some(RetentionTsv))
    val ds = BatchIngest.prepare(BatchIngest.read(spark, spec), spec)
    assert(ds.count() == 50)

    val out = NativeQuery.run(spark, RetentionQueryJson,
      name => { assert(name == "test_datasource"); ds }).collect()
    assert(out.length == 1, s"expected the single product_1 row, got ${out.length}")
    val row = out.head
    def d(name: String): Double = row.getAs[Number](name).doubleValue()
    assert(row.getAs[String]("product") == "product_1")
    assert(d("p1_unique_country_day_1") == 20.0)
    assert(d("p1_unique_country_day_2") == 20.0)
    assert(d("p1_unique_country_day_3") == 10.0)
    assert(d("sketchEstimatePostAgg") == 20.0)
    assert(d("sketchIntersectionPostAggEstimate1") == 10.0)
    assert(d("sketchIntersectionPostAggEstimate2") == 5.0)
    assert(d("non_existing_col_validation") == 0.0)
  }
}
