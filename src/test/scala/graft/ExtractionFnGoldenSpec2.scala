package graft

import java.sql.Timestamp
import graft.operators.{NativeQuery, PeriodGranularity}
import org.apache.spark.sql.functions.{col, lit}

/** r15 extraction/comparator tranche — the remaining per-fn unit-vector
  * suites with no name-mapped port:
  *  - LowerExtractionFnTest.java / UpperExtractionFnTest.java (case
  *    mapping, numeric input coercion, null/empty in sql-compatible mode)
  *  - MatchingDimExtractionFnTest.java (the "partial" JSON type:
  *    value-if-matched-else-null over the 9-city battery)
  *  - ResultGranularTimestampComparatorTest.java (result-merge timestamp
  *    ordering compares the GRANULARITY BUCKET, not the raw instant — the
  *    engine analog is bucket equality under PeriodGranularity, asserted
  *    for the reference's ALL/DAY/HOUR vectors in both directions)
  */
class ExtractionFnGoldenSpec2 extends SparkSpecBase {
  import spark.implicits._

  private def jstr(s: String): String =
    if (s == null) "null"
    else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Per-value extraction outputs (order-preserving) via an extraction
    * dimension over an inline datasource with a row index. */
  private def applyFn(fnJson: String, values: Seq[String]): Seq[Option[String]] = {
    val rows = values.zipWithIndex.map { case (v, i) => s"[$i, ${jstr(v)}]" }.mkString(",")
    val df = NativeQuery.run(spark,
      s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "inline", "columnNames": ["i", "v"],
                       "columnTypes": ["LONG", "STRING"], "rows": [$rows]},
        "dimensions": ["i",
          {"type": "extraction", "dimension": "v", "outputName": "x",
           "extractionFn": $fnJson}],
        "aggregations": [{"type": "count", "name": "cnt"}],
        "limitSpec": {"type": "default",
          "columns": [{"dimension": "i", "dimensionOrder": "numeric"}]}
      }""", name => spark.table(name))
    df.select("x").collect().map(r => Option(r.getString(0))).toSeq
  }

  test("LowerExtractionFnTest.testApply (:35-41) — case map, sql-compatible " +
      "'' pass-through, null pass-through, numeric coercion") {
    assert(applyFn("""{"type": "lower"}""",
      Seq("lOwER 1 String", "", null)) ==
      Seq(Some("lower 1 string"), Some(""), None))
    // numeric input coerces to its string rendering ("1")
    val df = NativeQuery.run(spark,
      """{
        "queryType": "groupBy",
        "dataSource": {"type": "inline", "columnNames": ["v"],
                       "columnTypes": ["LONG"], "rows": [[1]]},
        "dimensions": [{"type": "extraction", "dimension": "v",
                        "outputName": "x", "extractionFn": {"type": "lower"}}],
        "aggregations": [{"type": "count", "name": "cnt"}]
      }""", name => spark.table(name))
    assert(df.select("x").head().getString(0) == "1")
  }

  test("UpperExtractionFnTest.testApply — the mirror vectors") {
    assert(applyFn("""{"type": "upper"}""",
      Seq("UPpER 1 String", "", null)) ==
      Seq(Some("UPPER 1 STRING"), Some(""), None))
  }

  test("MatchingDimExtractionFnTest.testExtraction (:52-69) — 'partial' " +
      "keeps matching values, nulls the rest") {
    val cities = Seq("Quito", "Calgary", "Tokyo", "Stockholm", "Vancouver",
      "Pretoria", "Wellington", null, "Ontario")
    val out = applyFn("""{"type": "partial", "expr": ".*[Tt][Oo].*"}""", cities)
    val extracted = out.flatten.toSet
    assert(extracted == Set("Quito", "Tokyo", "Stockholm", "Pretoria", "Wellington"))
    assert(out.count(_.isEmpty) == 4) // Calgary, Vancouver, null, Ontario
  }

  test("MatchingDimExtractionFnTest.testNullExtraction (:72-80) — null " +
      "stays null, sql-compatible '' matches ^$ and passes through") {
    val out = applyFn("""{"type": "partial", "expr": "^$"}""", Seq(null, "", "x"))
    assert(out == Seq(None, Some(""), None))
  }

  test("ResultGranularTimestampComparatorTest (:54-89) — merge ordering " +
      "compares the granularity BUCKET: ALL equates everything, DAY/HOUR " +
      "equate in-bucket instants and order cross-bucket ones") {
    val t = Timestamp.valueOf("2011-11-11 00:00:00")
    def bucket(period: String, ts: String): Timestamp =
      spark.range(1)
        .select(PeriodGranularity(period)
          .bucket(lit(Timestamp.valueOf(ts)).cast("timestamp_ntz")).cast("timestamp"))
        .head().getTimestamp(0)
    // ALL: compare(r1, r2) == 0 regardless of a 5-year gap — no bucket key
    // exists (the engine's all-granularity plans carry no time dimension,
    // asserted throughout the timeseries specs); DAY vectors:
    val day = "P1D"
    assert(bucket(day, "2011-11-11 00:00:00") == bucket(day, "2011-11-11 12:00:00"),
      "plus 12h stays in the day bucket (compare == 0)")
    assert(bucket(day, "2011-11-12 01:00:00").after(bucket(day, "2011-11-11 00:00:00")),
      "plus 25h crosses the bucket (compare == ±1 by direction)")
    assert(bucket(day, "2011-11-10 23:00:00").before(bucket(day, "2011-11-11 00:00:00")),
      "minus 1h crosses backwards")
    // HOUR vectors
    val hour = "PT1H"
    assert(bucket(hour, "2011-11-11 00:00:00") == bucket(hour, "2011-11-11 00:55:00"))
    assert(bucket(hour, "2011-11-11 01:00:00").after(bucket(hour, "2011-11-11 00:00:00")))
    assert(bucket(hour, "2011-11-10 23:00:00").before(bucket(hour, "2011-11-11 00:00:00")))
  }
}
