package graft

import graft.operators.NativeQuery
import graft.sources.BatchIngest
import graft.sources.BatchIngest.IngestSpec

/** Ported end-to-end reference case: quantiles sketches built at QUERY time
  * over TSV-ingested rows, with the quantile / quantiles / histogram
  * post-aggregator families and a null-carrying value column.
  *
  * Source (reference: extensions-core/datasketches/src/test/):
  *  - java/.../quantiles/DoublesSketchAggregatorTest.java:306-405
  *    buildingSketchesAtQueryTime — expected: n=400; nulls column n=377;
  *    quantiles ≈ [0, 0.5, 1] (±0.05); 4 uniform histogram bins of ~100
  *    (±20%); withNulls median ≈7.5 (±0.1), min 5.0, max 10.0 (±0.05)
  *  - the query JSON is verbatim from the test body; the reference's
  *    RANDOM uniform input (GenerateTestData.java) is replaced by a
  *    DETERMINISTIC uniform grid with the same row counts (400 values in
  *    (0,1); 377 in (5,10) + 23 nulls), which satisfies the same
  *    assertion bounds without a seed dependency.
  */
class QuantilesSketchGoldenSpec extends SparkSpecBase {

  test("buildingSketchesAtQueryTime (DoublesSketchAggregatorTest.java:306-405) — " +
      "verbatim query JSON; n / quantile / quantiles / histogram post-aggs incl. nulls") {
    // 23 null rows exactly (i = 0, 17, …, 374), 377 non-null
    val rows = (0 until 400).map { i =>
      val ts = s"20160101${"%02d".format(1 + i / 40)}"
      val v = f"${(i + 0.5) / 400.0}%.8f"
      val isNull = i % 17 == 0 && i <= 17 * 22 // 23 null rows: 0, 17, …, 374
      (ts, i, v, isNull)
    }
    val nonNull = rows.count(!_._4)
    assert(rows.count(_._4) == 23 && nonNull == 377)
    var j = -1
    val tsv = rows.map { case (ts, i, v, isNull) =>
      val vn = if (isNull) ""
               else { j += 1; f"${5.0 + 5.0 * (j + 0.5) / 377.0}%.8f" }
      s"$ts\t$i\tproduct_${i % 10}\t$v\t$vn"
    }.mkString("\n")

    val spec = IngestSpec(
      inputPath = "",
      inputFormat = "csv",
      formatOptions = Map("sep" -> "\t",
        "columns" -> "timestamp,sequenceNumber,product,value,valueWithNulls"),
      timeColumn = "__time",
      timeParseExpr = BatchIngest.timestampSpec("timestamp", "yyyyMMddHH"),
      inlineData = Some(tsv))
    val ds = BatchIngest.prepare(BatchIngest.read(spark, spec), spec)
      .selectExpr("__time", "sequenceNumber", "product",
        "cast(value as double) as value",
        "cast(valueWithNulls as double) as valueWithNulls")
    assert(ds.count() == 400)

    val out = NativeQuery.run(spark,
      """{
        "queryType": "groupBy",
        "dataSource": "test_datasource",
        "granularity": "ALL",
        "dimensions": [],
        "aggregations": [
          {"type": "quantilesDoublesSketch", "name": "sketch", "fieldName": "value", "k": 128},
          {"type": "quantilesDoublesSketch", "name": "sketchWithNulls", "fieldName": "valueWithNulls", "k": 128}
        ],
        "postAggregations": [
          {"type": "quantilesDoublesSketchToQuantile", "name": "quantile", "fraction": 0.5, "field": {"type": "fieldAccess", "fieldName": "sketch"}},
          {"type": "quantilesDoublesSketchToQuantiles", "name": "quantiles", "fractions": [0, 0.5, 1], "field": {"type": "fieldAccess", "fieldName": "sketch"}},
          {"type": "quantilesDoublesSketchToHistogram", "name": "histogram", "splitPoints": [0.25, 0.5, 0.75], "field": {"type": "fieldAccess", "fieldName": "sketch"}},
          {"type": "quantilesDoublesSketchToQuantile", "name": "quantileWithNulls", "fraction": 0.5, "field": {"type": "fieldAccess", "fieldName": "sketchWithNulls"}},
          {"type": "quantilesDoublesSketchToQuantiles", "name": "quantilesWithNulls", "fractions": [0, 0.5, 1], "field": {"type": "fieldAccess", "fieldName": "sketchWithNulls"}},
          {"type": "quantilesDoublesSketchToHistogram", "name": "histogramWithNulls", "splitPoints": [6.25, 7.5, 8.75], "field": {"type": "fieldAccess", "fieldName": "sketchWithNulls"}}
        ],
        "intervals": ["2016-01-01T00:00:00.000Z/2016-01-31T00:00:00.000Z"]
      }""",
      name => { assert(name == "test_datasource"); ds }).collect()

    assert(out.length == 1)
    val row = out.head
    def dv(name: String): Double = row.getAs[Number](name).doubleValue()
    def arr(name: String): Seq[Double] =
      row.getAs[scala.collection.Seq[Double]](name).toSeq

    assert(row.getAs[Number]("sketch").longValue() == 400L)
    assert(row.getAs[Number]("sketchWithNulls").longValue() == 377L,
      "null values must not enter the sketch (SQL-compatible mode: 377)")

    assert(math.abs(dv("quantile") - 0.5) <= 0.05)
    val qs = arr("quantiles")
    assert(math.abs(qs(0) - 0.0) <= 0.05)
    assert(math.abs(qs(1) - 0.5) <= 0.05)
    assert(math.abs(qs(2) - 1.0) <= 0.05)
    val hist = arr("histogram")
    assert(hist.size == 4)
    hist.foreach(b => assert(math.abs(b - 100.0) <= 100 * 0.2, s"bin $b"))

    assert(math.abs(dv("quantileWithNulls") - 7.5) <= 0.1)
    val qsn = arr("quantilesWithNulls")
    assert(math.abs(qsn(0) - 5.0) <= 0.05)
    assert(math.abs(qsn(1) - 7.5) <= 0.1)
    assert(math.abs(qsn(2) - 10.0) <= 0.05)
    val histN = arr("histogramWithNulls")
    assert(histN.size == 4 && math.abs(histN.sum - 377.0) < 0.001)
  }
}
