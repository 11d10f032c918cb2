package graft

import org.apache.spark.sql.functions._
import graft.operators.NativeQuery
import graft.sources.BatchIngest
import graft.sources.BatchIngest.IngestSpec

/** Ported end-to-end reference cases: HLLSketchBuild at query time over
  * TSV-ingested rows — scalar column, MULTI-VALUE column (per-element
  * updates), and the `round` flag.
  *
  * Source (reference: extensions-core/datasketches/src/test/):
  *  - java/.../hll/HllSketchAggregatorTest.java:126-144
  *    buildSketchesAtQueryTime — 200 distinct ids → 200.0 ± 0.1
  *  - :176-194 buildSketchesAtQueryTimeMultiValue — the comma-delimited
  *    multiDim column (listDelimiter "," in buildParserJson:313-336)
  *    counts DISTINCT ELEMENTS across cells: sliding 5-windows over
  *    1..10 cover 1..14 → 14.0 ± 0.1
  *  - :196-215 roundBuildSketch — round=true → exactly 200 (long)
  *  - hll/hll_raw.tsv's shape (dim cycling 1..10, multiDim = the
  *    "d,d+1,d+2,d+3,d+4" window, unique id per row) re-generated
  *    deterministically; the query JSON mirrors buildGroupByQueryJson:379.
  */
class HllSketchGoldenSpec extends SparkSpecBase {

  private def ingest() = {
    val tsv = (0 until 200).map { i =>
      val d = (i % 10) + 1
      val multi = (d until d + 5).mkString(",")
      s"20170101\t$d\t$multi\t$i"
    }.mkString("\n")
    val spec = IngestSpec(
      inputPath = "",
      inputFormat = "csv",
      formatOptions = Map("sep" -> "\t", "columns" -> "timestamp,dim,multiDim,id"),
      timeColumn = "__time",
      timeParseExpr = BatchIngest.timestampSpec("timestamp", "yyyyMMdd"),
      // parseSpec listDelimiter "," — the MV cell splits into elements
      transforms = Seq(("multiDim", split(col("multiDim"), ","))),
      inlineData = Some(tsv))
    BatchIngest.prepare(BatchIngest.read(spark, spec), spec)
  }

  private def query(field: String, round: Boolean) =
    s"""{
      "queryType": "groupBy",
      "dataSource": "test_dataSource",
      "granularity": "ALL",
      "dimensions": [],
      "aggregations": [
        {"type": "HLLSketchBuild", "name": "sketch", "fieldName": "$field", "round": $round}
      ],
      "intervals": ["2017-01-01T00:00:00.000Z/2017-01-31T00:00:00.000Z"]
    }"""

  test("buildSketchesAtQueryTime (HllSketchAggregatorTest.java:126-144): 200 ids") {
    val ds = ingest()
    val out = NativeQuery.run(spark, query("id", round = false), _ => ds).collect()
    assert(out.length == 1)
    assert(math.abs(out.head.getAs[Number]("sketch").doubleValue() - 200.0) <= 0.1)
  }

  test("buildSketchesAtQueryTimeMultiValue (:176-194): distinct ELEMENTS of the MV cell = 14") {
    val ds = ingest()
    val out = NativeQuery.run(spark, query("multiDim", round = false), _ => ds).collect()
    assert(out.length == 1)
    assert(math.abs(out.head.getAs[Number]("sketch").doubleValue() - 14.0) <= 0.1)
  }

  test("roundBuildSketch (:196-215): round=true yields the exact long") {
    val ds = ingest()
    val out = NativeQuery.run(spark, query("id", round = true), _ => ds).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Number]("sketch").longValue() == 200L)
  }
}
