package graft

import org.apache.spark.sql.functions._
import graft.operators.{Agg, PeriodGranularity}
import graft.sources.BatchIngest
import graft.sources.BatchIngest._
import graft.multimodal.Multimodal

class IngestAndMultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("batch ingest: transform + rollup + hashed partitions + time chunking") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val spec = IngestSpec(
      inputPath = sf() + "/orders.parquet",
      timeColumn = "o_orderdate",
      transforms = Seq("is_urgent" -> (col("o_orderpriority") === "1-URGENT").cast("int")),
      filter = col("o_orderstatus") =!= "P",
      segmentGranularity = "P1M",
      partitionsSpec = HashedPartitions(4, Seq("o_orderpriority")),
      rollup = Some(RollupSpec(PeriodGranularity("P1D"), Seq("o_orderpriority"),
        Seq(Agg("cnt", count(lit(1))), Agg("urgent", sum(col("is_urgent")))))),
      dataSource = Some("rollup_orders"))
    val back = BatchIngest.run(spark, spec, s"$dir/out")
    // rollup key is unique per (day, priority)
    val dup = back.groupBy("o_orderdate", "o_orderpriority").count().filter($"count" > 1).count()
    assert(dup == 0)
    // counts survive the rollup
    val expected = spark.read.parquet(sf() + "/orders.parquet")
      .filter($"o_orderstatus" =!= "P").count()
    assert(back.agg(sum($"cnt")).head().getLong(0) == expected)
    // time-chunked directory layout (month partitions)
    assert(new java.io.File(s"$dir/out").listFiles().exists(_.getName.startsWith("__chunk=")))

    // spec-describing segmentMetadata analyses (AGGREGATORS / ROLLUP /
    // QUERYGRANULARITY / TIMESTAMPSPEC, SegmentMetadataQuery.java:50) are
    // served from the ingest catalog registered by BatchIngest.run
    val meta = graft.operators.SegmentMetadataQuery(exact = true,
      analysisTypes = Set("cardinality", "nulls", "aggregators", "rollup",
        "queryGranularity", "timestampSpec"),
      ingestSpec = BatchIngest.specOf(s"$dir/out")).run(back)
    val m = meta.head()
    assert(m.getAs[Boolean]("rollup"))
    assert(m.getAs[String]("queryGranularity") == "P1D")
    assert(m.getAs[String]("timestampSpec") == "o_orderdate")
    val aggs = m.getAs[String]("aggregators")
    assert(aggs.contains("cnt=") && aggs.contains("urgent="))

    // the JSON path resolves the spec by LOGICAL datasource name (the key a
    // query actually uses), not the physical output path — BatchIngest.run
    // registers both
    val viaJson = graft.operators.NativeQuery.run(spark,
      """{"queryType": "segmentMetadata", "dataSource": "rollup_orders",
          "timeColumn": "o_orderdate",
          "analysisTypes": ["aggregators", "rollup", "queryGranularity", "timestampSpec"]}""",
      _ => back)
    val jm = viaJson.head()
    assert(jm.getAs[Boolean]("rollup"))
    assert(jm.getAs[String]("timestampSpec") == "o_orderdate")
    assert(jm.getAs[String]("aggregators").contains("cnt="))
  }

  test("batch ingest reads csv with schema inference") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Seq((1L, "2024-01-01 10:00:00", "a"), (2L, "2024-01-02 11:00:00", "b"))
      .toDF("id", "ts", "tag").write.option("header", "true").csv(s"$dir/in")
    val spec = IngestSpec(inputPath = s"$dir/in", inputFormat = "csv",
      formatOptions = Map("inferSchema" -> "true"),
      timeColumn = "__time", timeParseExpr = to_timestamp(col("ts")))
    val out = BatchIngest.run(spark, spec, s"$dir/out")
    assert(out.count() == 2)
    assert(out.schema("__time").dataType.typeName.startsWith("timestamp"))
  }

  test("batch ingest reads headerless csv with explicit columns (CsvInputFormat `columns`)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_cols").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "data.csv"),
      java.util.Arrays.asList("1,2024-01-01 10:00:00,a", "2,2024-01-02 11:00:00,b"))
    val spec = IngestSpec(inputPath = s"$dir/data.csv", inputFormat = "csv",
      formatOptions = Map("columns" -> "id,ts,tag"),
      timeColumn = "__time", timeParseExpr = to_timestamp(col("ts")))
    val out = BatchIngest.run(spark, spec, s"$dir/out")
    assert(out.count() == 2)
    assert(Set("id", "ts", "tag").subsetOf(out.columns.toSet))
    assert(out.select("tag").as[String].collect().toSet == Set("a", "b"))
  }

  test("timestampSpec named formats (TimestampParser.java:43-110)") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 10:00:00")
    val millis = base.getTime
    val df = Seq((millis.toString, "2024-01-01T10:00:00", millis / 1000,
        millis, millis * 1000, millis * 1000000, "01/01/2024 10:00:00"))
      .toDF("autoMillis", "iso", "posix", "ms", "us", "ns", "custom")
    def parsed(c: org.apache.spark.sql.Column) =
      df.select(c.cast("timestamp").as("t")).head().getTimestamp(0)
    // auto: all-digits → epoch millis; otherwise ISO
    assert(parsed(BatchIngest.timestampSpec("autoMillis")) == base)
    assert(parsed(BatchIngest.timestampSpec("iso", "auto")) == base)
    assert(parsed(BatchIngest.timestampSpec("iso", "iso")) == base)
    assert(parsed(BatchIngest.timestampSpec("posix", "posix")) == base)
    assert(parsed(BatchIngest.timestampSpec("ms", "millis")) == base)
    assert(parsed(BatchIngest.timestampSpec("us", "micro")) == base)
    assert(parsed(BatchIngest.timestampSpec("ns", "nano")) == base)
    assert(parsed(BatchIngest.timestampSpec("custom", "MM/dd/yyyy HH:mm:ss")) == base)
    // nano stays exact at full epoch-nano magnitude: ~1.7e18 exceeds
    // double's 53-bit mantissa, so Column `/` (double division) would drift
    // by ~1µs — the integral-div path must not (ADVICE r8)
    val bigNanos = 1700000000123456789L // 2023-11-14T22:13:20.123456789Z UTC
    val one = Seq(bigNanos).toDF("ns")
    val got = one.select(BatchIngest.timestampSpec("ns", "nano").as("t")).head()
      .getTimestamp(0)
    assert(got.getTime == bigNanos / 1000000L)
    assert(got.getNanos == ((bigNanos / 1000L) % 1000000L).toInt * 1000)
  }

  test("DimensionsSpec include/exclude and timestampSpec missingValue " +
      "(DimensionsSpec.java, TimestampSpec.java:52-72)") {
    val spec0 = IngestSpec(inputPath = "", inputFormat = "json",
      timeColumn = "__time",
      timeParseExpr = BatchIngest.timestampSpec("ts", "iso"),
      inlineData = Some(
        """{"ts": "2024-01-01T10:00:00", "a": 1, "b": "x", "c": "keep"}""" + "\n" +
        """{"ts": null, "a": 2, "b": "y", "c": "keep2"}"""))
    // missingValue backstops the null timestamp
    val withMissing = BatchIngest.prepare(BatchIngest.read(spark, spec0),
      spec0.copy(timeMissingValue = Some("1970-01-01 00:00:00")))
    assert(withMissing.filter($"__time".isNull).count() == 0)
    assert(withMissing.filter($"__time" === "1970-01-01 00:00:00").count() == 1)
    // explicit inclusion keeps time + the listed dims only
    val included = BatchIngest.prepare(BatchIngest.read(spark, spec0),
      spec0.copy(includeDimensions = Seq("a", "c")))
    assert(included.columns.toSet == Set("__time", "a", "c"))
    // exclusion drops named discovered columns
    val excluded = BatchIngest.prepare(BatchIngest.read(spark, spec0),
      spec0.copy(excludeDimensions = Seq("b")))
    assert(!excluded.columns.contains("b") && excluded.columns.contains("c"))
  }

  test("inline and combining input sources (InlineInputSource.java:36-51, " +
      "CombiningInputSource.java:46-56)") {
    // inline CSV: data carried in the spec, parsed by the csv InputFormat
    val csvSpec = IngestSpec(inputPath = "",
      inputFormat = "csv",
      formatOptions = Map("columns" -> "id,tag"),
      inlineData = Some("1,a\n2,b\n3,c"))
    val csv = BatchIngest.read(spark, csvSpec)
    assert(csv.count() == 3)
    assert(csv.select("tag").as[String].collect().toSet == Set("a", "b", "c"))
    // inline JSON
    val jsonSpec = IngestSpec(inputPath = "", inputFormat = "json",
      inlineData = Some("""{"id": 1, "tag": "x"}""" + "\n" + """{"id": 2, "tag": "y"}"""))
    assert(BatchIngest.read(spark, jsonSpec).count() == 2)
    // combining: delegates concatenate, schemas align by name
    // (schema-light: the json delegate carries an extra column)
    val extra = IngestSpec(inputPath = "", inputFormat = "json",
      inlineData = Some("""{"id": 9, "tag": "z", "note": "n"}"""))
    val combined = BatchIngest.read(spark,
      IngestSpec(inputPath = "", delegates = Seq(csvSpec, extra)))
    assert(combined.count() == 4)
    assert(combined.columns.toSet == Set("id", "tag", "note"))
    assert(combined.filter($"note".isNotNull).count() == 1)
  }

  test("json flattenSpec: field discovery skips nested objects, root + " +
      "JsonPath extractions, absent fields null, jq rejected " +
      "(JsonLineReaderTest.testParseRow, JSONPathSpec.java)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_flatten").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "rows.json"),
      java.util.Arrays.asList(
        """{"timestamp":"2019-01-01","bar":null,"foo":"x","baz":4,"o":{"mg":1}}"""))
    val spec = IngestSpec(inputPath = s"$dir/rows.json", inputFormat = "json",
      formatOptions = Map("flattenSpec" ->
        """{"useFieldDiscovery": true, "fields": [
          {"type": "root", "name": "root_baz", "expr": "baz"},
          {"type": "root", "name": "root_baz2", "expr": "baz2"},
          {"type": "path", "name": "path_omg", "expr": "$.o.mg"},
          {"type": "path", "name": "path_omg2", "expr": "$.o.mg2"}
        ]}"""),
      timeColumn = "timestamp")
    val df = BatchIngest.read(spark, spec)
    // discovery finds the root primitives but NOT the nested object `o`
    // (JSONFlattenerMaker.discoverRootFields); explicit fields append
    assert(df.columns.toSet == Set("timestamp", "bar", "foo", "baz",
      "root_baz", "root_baz2", "path_omg", "path_omg2"))
    val row = df.head()
    assert(row.getAs[String]("foo") == "x")
    assert(String.valueOf(row.getAs[Any]("baz")) == "4")
    assert(String.valueOf(row.getAs[Any]("root_baz")) == "4")
    assert(row.getAs[String]("path_omg") == "1")
    assert(row.getAs[Any]("root_baz2") == null)
    assert(row.getAs[Any]("path_omg2") == null)
    // a jq field fails loudly (no jackson-jq in this environment)
    val e = intercept[IllegalArgumentException] {
      BatchIngest.read(spark, spec.copy(formatOptions = Map("flattenSpec" ->
        """{"fields": [{"type": "jq", "name": "jq_omg", "expr": ".o.mg"}]}""")))
    }
    assert(e.getMessage.contains("jq"))
  }

  test("batch ingest reads regex-parsed lines (RegexInputFormat.java round-trip)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_regex").toString
    // an access-log-ish line format: ts level tag|tag message
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "app.log"),
      java.util.Arrays.asList(
        "2024-01-01T10:00:00 INFO web|api started ok",
        "2024-01-02T11:30:00 WARN db slow query",
        "this line does not match and is dropped"))
    val spec = IngestSpec(
      inputPath = s"$dir/app.log", inputFormat = "regex",
      formatOptions = Map(
        "pattern" -> "(\\d{4}-\\d{2}-\\d{2}T\\S+) (\\w+) (\\S+) (.*)",
        "columns" -> "ts,level,tags,message",
        "listDelimiter" -> "|",
        "multiValueColumns" -> "tags"),
      timeColumn = "__time", timeParseExpr = to_timestamp(col("ts")))
    val out = BatchIngest.run(spark, spec, s"$dir/out").orderBy("__time")
    assert(out.count() == 2) // the unparseable line is rejected
    val first = out.head()
    assert(first.getAs[String]("level") == "INFO")
    assert(first.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("web", "api"))
    assert(first.getAs[String]("message") == "started ok")
    assert(out.schema("__time").dataType.typeName.startsWith("timestamp"))

    // columns omitted → column_1..column_n (ParserUtils.getDefaultColumnName)
    val defaults = BatchIngest.read(spark, IngestSpec(
      inputPath = s"$dir/app.log", inputFormat = "regex",
      formatOptions = Map("pattern" -> "(\\d{4}-\\S+) (\\w+) .*")))
    assert(defaults.columns.toSeq == Seq("column_1", "column_2"))
    assert(defaults.count() == 2)
  }

  test("multimodal: stub decode features are deterministic and match formula") {
    val media = Multimodal.mediaFromDocuments(spark, sf())
    val feats = Multimodal.extractFeatures(media)
    val one = feats.filter($"media_id" === 0L).head()
    val doc = spark.read.parquet(sf() + "/documents.parquet")
      .filter($"doc_id" === 0L).head()
    val text = doc.getAs[String]("text")
    assert(one.byte_len == text.getBytes("UTF-8").length.toLong)
    assert(one.brightness > 0 && one.brightness <= 1.0)
    // rerun → identical (no RNG state)
    assert(Multimodal.extractFeatures(media).filter($"media_id" === 0L).head() == one)
  }

  test("multimodal: resize clamps dims, preserves payload; frame sampling") {
    val media = Multimodal.mediaFromDocuments(spark, sf())
    val resized = Multimodal.resize(media, 64)
    assert(resized.collect().forall(r => r.meta.width <= 64 && r.meta.height <= 64))
    assert(resized.count() == media.count())
    val frames = Multimodal.sampleFrames(media, every = 4)
    val byId = media.collect().map(r => r.media_id -> r.meta.nFrames).toMap
    val got = frames.groupByKey(_.media_id).count().collect().toMap
    byId.foreach { case (id, n) =>
      assert(got(id) == ((n + 3) / 4).toLong, s"media $id frames")
    }
  }
}
