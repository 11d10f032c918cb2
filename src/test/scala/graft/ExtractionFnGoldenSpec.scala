package graft

import java.time.Instant

import org.apache.spark.sql.DataFrame
import graft.operators.NativeQuery

/** Extraction-fn parity, porting the reference's per-fn unit vectors
  * (processing/src/test/java/org/apache/druid/query/extraction/
  * {Regex,Substring,StringFormat,Bucket,TimeFormat,Strlen,Cascade}*Test.java)
  * through the native JSON surface: each vector list becomes an inline
  * datasource, the fn under test an extraction dimension, and the distinct
  * outputs are compared as sets exactly like the reference's LinkedHashSet
  * asserts. SQL-compatible null mode expectations throughout (the
  * NullHandling.replaceWithDefault()=false branches).
  */
class ExtractionFnGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private val Paths = Seq(
    "/druid/prod/historical", "/druid/prod/broker", "/druid/prod/coordinator",
    "/druid/demo/historical", "/druid/demo/broker", "/druid/demo/coordinator",
    "/dash/aloe", "/dash/baloo")

  private val TestStrings = Seq("apple", "awesome", "asylum", "business", "be", "cool")

  private def jstr(s: String): String =
    if (s == null) "null"
    else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Distinct extraction outputs over the values, via a groupBy on an
    * extraction dimension against an inline datasource. */
  private def extract(fnJson: String, values: Seq[String], colType: String = "STRING"): Set[String] = {
    val rows = values.map(v => s"[${jstr(v)}]").mkString(",")
    val df = NativeQuery.run(spark,
      s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "inline", "columnNames": ["v"],
                       "columnTypes": ["$colType"], "rows": [$rows]},
        "dimensions": [{"type": "extraction", "dimension": "v",
                        "outputName": "x", "extractionFn": $fnJson}],
        "aggregations": [{"type": "count", "name": "cnt"}]
      }""", name => spark.read.parquet(s"${sf()}/$name.parquet"))
    df.select("x").as[String].collect().toSet
  }

  private def extractMillis(fnJson: String, millis: Seq[Long]): Set[String] = {
    val rows = millis.map(m => s"[$m]").mkString(",")
    val df = NativeQuery.run(spark,
      s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "inline", "columnNames": ["v"],
                       "columnTypes": ["LONG"], "rows": [$rows]},
        "dimensions": [{"type": "extraction", "dimension": "v",
                        "outputName": "x", "extractionFn": $fnJson}],
        "aggregations": [{"type": "count", "name": "cnt"}]
      }""", name => spark.read.parquet(s"${sf()}/$name.parquet"))
    df.select("x").as[String].collect().toSet
  }

  // ---- RegexDimExtractionFnTest ----

  test("regex: path extraction (RegexDimExtractionFnTest.java:57)") {
    assert(extract("""{"type": "regex", "expr": "/([^/]+)/"}""", Paths) == Set("druid", "dash"))
  }

  test("regex: deeper path extraction (RegexDimExtractionFnTest.java:72)") {
    assert(extract("""{"type": "regex", "expr": "^/([^/]+/[^/]+)(/|$)"}""", Paths) ==
      Set("druid/prod", "druid/demo", "dash/aloe", "dash/baloo"))
  }

  test("regex: group index 0 and 2 (RegexDimExtractionFnTest.java:92,109)") {
    assert(extract("""{"type": "regex", "expr": "/([^/]{4})/", "index": 0}""", Paths) ==
      Set("/prod/", "/demo/", "/dash/"))
    assert(extract("""{"type": "regex", "expr": "^/([^/]+)/([^/]+)", "index": 2}""", Paths) ==
      Set("prod", "demo", "aloe", "baloo"))
  }

  test("regex: first-char extraction (RegexDimExtractionFnTest.java:129)") {
    assert(extract("""{"type": "regex", "expr": "(.)"}""", TestStrings) == Set("a", "b", "c"))
  }

  test("regex: null and empty (RegexDimExtractionFnTest.java:144)") {
    // no match keeps the original value; null stays null; empty group stays ""
    assert(extract("""{"type": "regex", "expr": "(.*)/.*/.*"}""", Seq("", null, "/a/b")) ==
      Set("", null))
  }

  test("regex: missing-value replacement (RegexDimExtractionFnTest.java:157-188)") {
    assert(
      extract("""{"type": "regex", "expr": "(bob)",
                  "replaceMissingValue": true,
                  "replaceMissingValueWith": "NO MATCH"}""",
        Seq("", null, "abc", "bob")) == Set("NO MATCH", "bob"))
    // pattern matching the empty string: "" extracts "", null is replaced
    assert(
      extract("""{"type": "regex", "expr": "^()$",
                  "replaceMissingValue": true,
                  "replaceMissingValueWith": "NO MATCH"}""",
        Seq("", null, "abc")) == Set("", "NO MATCH"))
    // replacement captures with the fn applied over the full vector list
    assert(
      extract("""{"type": "regex", "expr": "(a\\w*)",
                  "replaceMissingValue": true,
                  "replaceMissingValueWith": "foobar"}""",
        TestStrings) == Set("apple", "awesome", "asylum", "foobar"))
  }

  // ---- SubstringDimExtractionFnTest ----

  test("substring: basic and too-short (SubstringDimExtractionFnTest.java:34)") {
    assert(extract("""{"type": "substring", "index": 1, "length": 3}""",
      Seq("apple", "be", "cool", "a")) == Set("ppl", "e", "ool", null))
  }

  test("substring: no length takes the remainder (SubstringDimExtractionFnTest.java:52)") {
    assert(extract("""{"type": "substring", "index": 1}""", Seq("/abcdef", "/")) ==
      Set("abcdef", null))
  }

  test("substring: null and empty (SubstringDimExtractionFnTest.java:89)") {
    assert(extract("""{"type": "substring", "index": 2, "length": 4}""",
      Seq("", null, "/a")) == Set(null))
  }

  test("substring: zero length rejected (SubstringDimExtractionFnTest.java:44)") {
    intercept[IllegalArgumentException] {
      extract("""{"type": "substring", "index": 1, "length": 0}""", Seq("x"))
    }
  }

  // ---- StringFormatExtractionFnTest ----

  test("stringFormat: null handling modes (StringFormatExtractionFnTest.java:37-62)") {
    assert(extract("""{"type": "stringFormat", "format": "[%s]"}""", Seq("1000")) == Set("[1000]"))
    assert(extract("""{"type": "stringFormat", "format": "[%s]", "nullHandling": "nullString"}""",
      Seq(null.asInstanceOf[String])) == Set("[null]"))
    assert(extract("""{"type": "stringFormat", "format": "[%s]", "nullHandling": "emptyString"}""",
      Seq(null.asInstanceOf[String])) == Set("[]"))
    assert(extract("""{"type": "stringFormat", "format": "[%s]", "nullHandling": "returnNull"}""",
      Seq(null.asInstanceOf[String])) == Set(null))
    assert(extract("""{"type": "stringFormat", "format": "%s", "nullHandling": "nullString"}""",
      Seq(null.asInstanceOf[String])) == Set("null"))
  }

  test("stringFormat: invalid options rejected (StringFormatExtractionFnTest.java:65,80)") {
    intercept[IllegalArgumentException] {
      extract("""{"type": "stringFormat", "format": ""}""", Seq("x"))
    }
    intercept[IllegalArgumentException] {
      extract("""{"type": "stringFormat", "format": "[%s]", "nullHandling": "invalid"}""", Seq("x"))
    }
  }

  // ---- BucketExtractionFnTest ----

  test("bucket: string buckets with long rendering (BucketExtractionFnTest.java:32)") {
    assert(extract("""{"type": "bucket", "size": 100.0, "offset": 0.5}""",
      Seq("1234.99", "1", "100", "501", "-325", "2.42e3", "1.2e-1", "should be null", "")) ==
      Set("1200.5", "0.5", "500.5", "-399.5", "2400.5", "-99.5", null))
    assert(extract("""{"type": "bucket", "size": 3.0, "offset": 2.0}""",
      Seq("2", "3", "4.22", "-8", "7.1e1")) == Set("2", "-10", "71"))
  }

  // ---- TimeFormatExtractionFnTest ----

  private val Timestamps = Seq(
    "2015-01-01T23:00:00Z", "2015-01-02T23:00:00Z", "2015-03-03T23:00:00Z",
    "2015-03-04T23:00:00Z", "2015-05-02T23:00:00Z", "2015-12-21T23:00:00Z")
    .map(Instant.parse(_).toEpochMilli)

  test("timeFormat: day-of-week (TimeFormatExtractionFnTest.java:46)") {
    assert(extractMillis("""{"type": "timeFormat", "format": "EEEE", "asMillis": true}""",
      Timestamps) == Set("Thursday", "Friday", "Tuesday", "Wednesday", "Saturday", "Monday"))
  }

  test("timeFormat: localized day-of-week (TimeFormatExtractionFnTest.java:61)") {
    assert(extractMillis(
      """{"type": "timeFormat", "format": "EEEE", "locale": "is", "asMillis": true}""",
      Timestamps) ==
      Set("fimmtudagur", "föstudagur", "þriðjudagur", "miðvikudagur", "laugardagur", "mánudagur"))
  }

  test("timeFormat: granularity with null pattern renders ISO (TimeFormatExtractionFnTest.java:76)") {
    // asMillis=false + null pattern → ISO (a LONG input still reads as epoch
    // millis — the selector contract, TimeFormatExtractionFn.apply)
    assert(extractMillis("""{"type": "timeFormat", "granularity": "day"}""",
      Timestamps) ==
      Set("2015-01-01T00:00:00.000Z", "2015-01-02T00:00:00.000Z", "2015-03-03T00:00:00.000Z",
        "2015-03-04T00:00:00.000Z", "2015-05-02T00:00:00.000Z", "2015-12-21T00:00:00.000Z"))
  }

  test("timeFormat: asMillis with null pattern renders the truncated MILLIS " +
      "string (TimeFormatExtractionFn.java:62 — the formatter is null only " +
      "under asMillis, apply(long) returns String.valueOf)") {
    assert(extractMillis("""{"type": "timeFormat", "granularity": "day", "asMillis": true}""",
      Timestamps) ==
      Set("1420070400000", "1420156800000", "1425340800000", "1425427200000",
        "1430524800000", "1450656000000"))
  }

  test("timeFormat: explicit timezone and locale (TimeFormatExtractionFnTest.java:91)") {
    assert(extractMillis(
      """{"type": "timeFormat", "format": "'In Berlin ist es schon 'EEEE",
          "timeZone": "Europe/Berlin", "locale": "de", "asMillis": true}""",
      Timestamps) ==
      Set("In Berlin ist es schon Freitag", "In Berlin ist es schon Samstag",
        "In Berlin ist es schon Mittwoch", "In Berlin ist es schon Donnerstag",
        "In Berlin ist es schon Sonntag", "In Berlin ist es schon Dienstag"))
  }

  // ---- StrlenExtractionFnTest ----

  test("strlen: value lengths (StrlenExtractionFnTest.java:32)") {
    // sql-compatible: null stays null; lengths are code points ("föo" = 3);
    // documented deviation: Java counts UTF-16 units, so a surrogate-pair
    // emoji is "2" there and "1" here
    assert(extract("""{"type": "strlen"}""", Seq(null, "", "x", "foo", "föo")) ==
      Set(null, "0", "1", "3"))
    assert(extractMillis("""{"type": "strlen"}""", Seq(1L, -1L)) == Set("1", "2"))
  }

  // ---- TimeDimExtractionFnTest ----

  test("time: reformat and pass-through of unparseable values (TimeDimExtractionFnTest.java:46,62)") {
    // unparseable values survive unchanged; null stays null
    assert(extract("""{"type": "time", "timeFormat": "MM/dd/yyyy", "resultFormat": "MM/yyyy"}""",
      Seq(null, "foo")) == Set(null, "foo"))
    assert(extract("""{"type": "time", "timeFormat": "MM/dd/yyyy", "resultFormat": "MM/yyyy"}""",
      Seq("01/01/2012", "01/02/2012", "03/03/2012", "03/04/2012", "05/05/2012", "12/21/2012")) ==
      Set("01/2012", "03/2012", "05/2012", "12/2012"))
  }

  // ---- CascadeExtractionFnTest ----

  test("cascade: regex then format then substring (CascadeExtractionFnTest.java:66, adapted)") {
    // the reference chains regex → javascript("the ".concat) → substring;
    // javascript is a non-goal, so the concat step is the equivalent
    // stringFormat — same composition semantics under test
    assert(extract(
      """{"type": "cascade", "extractionFns": [
           {"type": "regex", "expr": "/([^/]+)/"},
           {"type": "stringFormat", "format": "the %s"},
           {"type": "substring", "index": 0, "length": 7}]}""",
      Paths) == Set("the dru", "the das"))
  }
}
