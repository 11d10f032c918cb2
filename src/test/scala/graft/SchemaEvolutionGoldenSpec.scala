package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.operators.NativeQuery

/** Schema-evolution parity, porting the reference's segment-mix scenarios
  * (processing/src/test/java/org/apache/druid/query/SchemaEvolutionTest.java):
  * the column c1 is a string in segment 1, a long in segment 2, a double in
  * segment 3, and absent in segment 4; queries over any mix of segments
  * coerce per value and aggregate across. Here each segment is a DataFrame
  * with that exact schema, the mix is the JSON union datasource (evolved
  * union), and the ported asserts are the reference's timeseries results.
  * Deviation noted inline: floatSum accumulates in double here, so the
  * float-rounded 57.20000076293945 is 57.2.
  */
class SchemaEvolutionGoldenSpec extends SparkSpecBase {

  private def seg(c1Type: Option[DataType]): DataFrame = {
    val ts = Seq("2000-01-01", "2000-01-02", "2000-01-03",
      "2001-01-01", "2001-01-02", "2001-01-03")
      .map(d => java.sql.Timestamp.valueOf(d + " 00:00:00").toLocalDateTime)
    val c1Strings = Seq("9", "10.1", "2", "1", "4", "5")
    c1Type match {
      case None =>
        val rows = ts.map(t => Row(t))
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
          StructType(Seq(StructField("__time", TimestampNTZType))))
      case Some(t) =>
        val vals: Seq[Any] = t match {
          case StringType => c1Strings
          // ingest-time long metric parses "10.1" to 10 (Rows.objectToNumber)
          case LongType => Seq(9L, 10L, 2L, 1L, 4L, 5L)
          case _ => Seq(9.0, 10.1, 2.0, 1.0, 4.0, 5.0)
        }
        val rows = ts.zip(vals).map { case (time, v) => Row(time, v) }
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
          StructType(Seq(StructField("__time", TimestampNTZType), StructField("c1", t))))
    }
  }

  private lazy val segments = Map(
    "idx1" -> seg(Some(StringType)),
    "idx2" -> seg(Some(LongType)),
    "idx3" -> seg(Some(DoubleType)),
    "idx4" -> seg(None))

  private def query(sources: Seq[String], filter: String = "null",
      withExpr: Boolean = false): Row = {
    val ds = s"""{"type": "union", "dataSources": [${sources.map("\"" + _ + "\"").mkString(",")}]}"""
    val exprAggs =
      if (withExpr)
        """,{"type": "longSum", "name": "c", "expression": "\"c1\" * 1"},
            {"type": "doubleSum", "name": "d", "expression": "\"c1\" * 1"}"""
      else ""
    NativeQuery.run(spark,
      s"""{
        "queryType": "timeseries",
        "dataSource": $ds,
        "granularity": "all",
        "filter": $filter,
        "aggregations": [
          {"type": "longSum", "name": "a", "fieldName": "c1"},
          {"type": "doubleSum", "name": "b", "fieldName": "c1"}
          $exprAggs
        ]
      }""", segments(_)).head()
  }

  private def a(r: Row) = r.getAs[Any]("a")
  private def round1(v: Any): Any =
    if (v == null) null else math.round(v.asInstanceOf[Double] * 10) / 10.0
  private def b(r: Row) = round1(r.getAs[Any]("b"))
  private def c(r: Row) = r.getAs[Any]("c")
  private def d(r: Row) = round1(r.getAs[Any]("d"))

  // testNumericEvolutionTimeseriesAggregation (SchemaEvolutionTest.java:258)
  // Documented deviations from the reference scenario: (1) querying a
  // datasource where NO segment carries the column at all (idx4 alone) is an
  // analysis error here — Spark schemas are strict — whereas the reference
  // returns null aggregates; in any mix that includes the column the absent
  // segment null-fills identically. (2) The math-expr "c1 * 1" expression
  // aggregators run on numeric segments; over the string segment Spark's
  // ANSI arithmetic rejects non-numeric text instead of nulling it.
  test("longSum/doubleSum over string → long → double → absent c1 (SchemaEvolutionTest.java:258)") {
    // Only string(1): per-value parse, "10.1" truncates for the long sum
    val r1 = query(Seq("idx1"))
    assert(a(r1) == 31L && b(r1) == 31.1)
    // Only long(2)
    val r2 = query(Seq("idx2"))
    assert(a(r2) == 31L && b(r2) == 31.0)
    // Only double(3)
    val r3 = query(Seq("idx3"))
    assert(a(r3) == 31L && b(r3) == 31.1)
    // string + long + double + nonexistent
    val rAll = query(Seq("idx1", "idx2", "idx3", "idx4"))
    assert(a(rAll) == 93L && b(rAll) == 93.2)
    // long + double + nonexistent — the expression aggregators coerce the
    // same way on the widened numeric column
    val r234 = query(Seq("idx2", "idx3", "idx4"), withExpr = true)
    assert(a(r234) == 62L && b(r234) == 62.1)
    assert(c(r234) == 62L && d(r234) == 62.1)
  }

  // the on-disk analog: segments of one datasource written at different
  // times with different c1 types, read back as one table
  test("readEvolved: conflicting segment files on disk read as one datasource") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    seg(Some(StringType)).write.mode("overwrite").parquet(dir + "/part1")
    seg(Some(LongType)).write.mode("overwrite").parquet(dir + "/part2")
    seg(None).write.mode("overwrite").parquet(dir + "/part3")
    val df = graft.sources.Sources.unionEvolved(Seq(
      spark.read.parquet(dir + "/part1"),
      spark.read.parquet(dir + "/part2"),
      spark.read.parquet(dir + "/part3")))
    // string + long widens to string; absent null-fills
    val sums = df.agg(
      sum(col("c1").try_cast("long")).as("a"),
      sum(col("c1").try_cast("double")).as("b")).head()
    assert(sums.getLong(0) == 21L + 31L) // string "10.1" fails the long parse
    assert(math.round(sums.getDouble(1) * 10) / 10.0 == 62.1)
    // and the directory-level read survives the type conflict via fallback
    val flat = java.nio.file.Files.createTempDirectory("graft_evolve_flat").toString
    seg(Some(StringType)).write.mode("append").parquet(flat)
    seg(Some(LongType)).write.mode("append").parquet(flat)
    val evolved = graft.sources.Sources.readEvolved(spark, flat)
    assert(evolved.count() == 12)
    assert(evolved.schema("c1").dataType == StringType)
  }

  // SegmentMetadataUnionQueryTest's merged analysis: one SegmentAnalysis
  // over all union members — row counts sum, per-column analyses widen
  test("segmentMetadata over a union datasource merges across segments " +
      "(SegmentMetadataUnionQueryTest.java)") {
    val df = NativeQuery.run(spark,
      """{
        "queryType": "segmentMetadata",
        "dataSource": {"type": "union", "dataSources": ["idx2", "idx3"]},
        "analysisTypes": ["minmax"]
      }""", segments(_))
    val rows = df.collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(rows("c1").getAs[Long]("numRows") == 12L)
    // long + double widened to double across the union
    assert(rows("c1").getAs[String]("type") == "double")
    assert(rows("c1").getAs[String]("minValue").toDouble == 1.0)
    assert(rows("c1").getAs[String]("maxValue").toDouble == 10.1)
    assert(rows("c1").getAs[Long]("nullCount") == 0L)
  }

  // testNumericEvolutionFiltering (SchemaEvolutionTest.java:335)
  test("numeric bound filter over evolving c1 types (SchemaEvolutionTest.java:335)") {
    val bound =
      """{"type": "bound", "dimension": "c1", "lower": "9", "upper": "11",
          "ordering": "numeric"}"""
    // per segment: rows 9 and 10.x pass, sums 19/19.1 (19.0 on the long segment)
    val r1 = query(Seq("idx1"), bound)
    assert(a(r1) == 19L && b(r1) == 19.1)
    val r2 = query(Seq("idx2"), bound)
    assert(a(r2) == 19L && b(r2) == 19.0)
    val r3 = query(Seq("idx3"), bound)
    assert(a(r3) == 19L && b(r3) == 19.1)
    // a mix including the absent segment: its null c1 fails the bound,
    // contributing nothing
    val r34 = query(Seq("idx3", "idx4"), bound)
    assert(a(r34) == 19L && b(r34) == 19.1)
    // the full mix: 57 / 57.2 (reference d = 57.20000076293945 is the
    // float-arithmetic rendering of the same 57.2)
    val rAll = query(Seq("idx1", "idx2", "idx3", "idx4"), bound)
    assert(a(rAll) == 57L && b(rAll) == 57.2)
  }
}
