package graft

import graft.operators.NativeQuery
import graft.sources.BatchIngest
import graft.sources.BatchIngest.IngestSpec

/** Ported end-to-end reference case: ArrayOfDoubles (tuple) sketches built
  * at QUERY time, with estimate / set-op (the documented `operation`
  * property) / quantiles-sketch post-aggregators.
  *
  * Source (reference: extensions-core/datasketches/src/test/):
  *  - java/.../tuple/ArrayOfDoublesSketchAggregationTest.java:696-781
  *    buildingSketchesAtQueryTime — 40 distinct keys each carrying value
  *    1.0: sketch 40.0, estimate 40.0, UNION(self) 40.0, INTERSECT(self)
  *    40.0, NOT(self) 0.0; the derived quantiles sketch has n=40,
  *    min=max=1.0
  *  - tuple/array_of_doubles_build_data.tsv's shape (40 rows, key1..key40,
  *    value 1.0) re-generated deterministically; query JSON verbatim.
  */
class TupleSketchGoldenSpec extends SparkSpecBase {

  test("buildingSketchesAtQueryTime (ArrayOfDoublesSketchAggregationTest.java:696-781)") {
    val tsv = (1 to 40).map { i =>
      s"2015010101\tproduct_${(i % 9) + 1}\tkey$i\t$i\t1.0"
    }.mkString("\n")
    val spec = IngestSpec(
      inputPath = "",
      inputFormat = "csv",
      formatOptions = Map("sep" -> "\t",
        "columns" -> "timestamp,product,key,key_num,value"),
      timeColumn = "__time",
      timeParseExpr = BatchIngest.timestampSpec("timestamp", "yyyyMMddHH"),
      inlineData = Some(tsv))
    val ds = BatchIngest.prepare(BatchIngest.read(spark, spec), spec)
      .selectExpr("__time", "product", "key", "cast(key_num as long) as key_num",
        "cast(value as double) as value")
    assert(ds.count() == 40)

    val out = NativeQuery.run(spark,
      """{
        "queryType": "groupBy",
        "dataSource": "test_datasource",
        "granularity": "ALL",
        "dimensions": [],
        "aggregations": [
          {"type": "arrayOfDoublesSketch", "name": "sketch", "fieldName": "key", "metricColumns": ["value"], "nominalEntries": 1024},
          {"type": "count", "name":"cnt"}
        ],
        "postAggregations": [
          {"type": "arrayOfDoublesSketchToEstimate", "name": "estimate", "field": {"type": "fieldAccess", "fieldName": "sketch"}},
          {"type": "arrayOfDoublesSketchToQuantilesSketch", "name": "quantiles_sketch", "field": {"type": "fieldAccess", "fieldName": "sketch"}},
          {"type": "arrayOfDoublesSketchToEstimate", "name": "union", "field": {
            "type": "arrayOfDoublesSketchSetOp",
            "name": "union",
            "operation": "UNION",
            "nominalEntries": 1024,
            "fields": [{"type": "fieldAccess", "fieldName": "sketch"}, {"type": "fieldAccess", "fieldName": "sketch"}]
          }},
          {"type": "arrayOfDoublesSketchToEstimate", "name": "intersection", "field": {
            "type": "arrayOfDoublesSketchSetOp",
            "name": "intersection",
            "operation": "INTERSECT",
            "nominalEntries": 1024,
            "fields": [{"type": "fieldAccess", "fieldName": "sketch"}, {"type": "fieldAccess", "fieldName": "sketch"}]
          }},
          {"type": "arrayOfDoublesSketchToEstimate", "name": "anotb", "field": {
            "type": "arrayOfDoublesSketchSetOp",
            "name": "anotb",
            "operation": "NOT",
            "nominalEntries": 1024,
            "fields": [{"type": "fieldAccess", "fieldName": "sketch"}, {"type": "fieldAccess", "fieldName": "sketch"}]
          }}
        ],
        "intervals": ["2015-01-01T00:00:00.000Z/2015-01-31T00:00:00.000Z"]
      }""",
      name => { assert(name == "test_datasource"); ds }).collect()

    assert(out.length == 1)
    val row = out.head
    def dv(name: String): Double = row.getAs[Number](name).doubleValue()
    assert(row.getAs[Number]("cnt").longValue() == 40L)
    assert(dv("sketch") == 40.0)
    assert(dv("estimate") == 40.0)
    assert(dv("union") == 40.0)
    assert(dv("intersection") == 40.0)
    assert(dv("anotb") == 0.0)
    // quantiles sketch over metric column 1 (all values 1.0): n=40, min=max=1
    val qsIdx = row.fieldIndex("quantiles_sketch")
    val qs = row.get(qsIdx)
    // our ToQuantilesSketch yields the KLL binary; probe via the Column API
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.plans.SketchFunctions
    val probe = Seq(Tuple1(qs.asInstanceOf[Array[Byte]])).toDF("sk")
      .select(SketchFunctions.kllN(col("sk")).as("n"),
        SketchFunctions.kllQuantile(col("sk"), 0.0).as("mn"),
        SketchFunctions.kllQuantile(col("sk"), 1.0).as("mx"))
      .head()
    assert(probe.getAs[Number]("n").longValue() == 40L)
    assert(probe.getAs[Number]("mn").doubleValue() == 1.0)
    assert(probe.getAs[Number]("mx").doubleValue() == 1.0)
  }
}
