package graft

import org.apache.spark.sql.Row
import graft.functions.{GraftSqlFunctions, MathExpr}

/** Ported vectors from the reference's macro-table tests — ExprMacroTest
  * .java (like, regexp_extract, the timestamp and trim families, ipv4
  * round trips over the canonical binding row, :40-53),
  * TimestampShiftMacroTest.java (step
  * and zone vectors over 2020-11-05T04:05:06Z), and RegexpLikeExprMacroTest
  * .java (false-not-null null handling, literal-pattern contract). Every
  * expression evaluates through the math-expr dialect (MathExpr.expr), the
  * exact surface JSON virtualColumns/filters use. Expectations are the
  * sql-compatible branches. */
class ExprMacroGoldenSpec extends SparkSpecBase {

  // ExprMacroTest BINDINGS (:40-53)
  private lazy val bound: Unit = {
    GraftSqlFunctions.register(spark)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("t", LongType), StructField("t1", LongType),
      StructField("tstr", StringType), StructField("tstr_sql", StringType),
      StructField("x", StringType), StructField("y", LongType),
      StructField("z", DoubleType), StructField("CityOfAngels", StringType),
      StructField("spacey", StringType),
      StructField("ipv4_string", StringType), StructField("ipv4_long", LongType),
      StructField("tshift", LongType), StructField("step", LongType)))
    val t = java.time.Instant.parse("2000-02-03T04:05:06Z").toEpochMilli
    val t1 = java.time.Instant.parse("2000-02-03T00:00:00Z").toEpochMilli
    val tshift = java.time.Instant.parse("2020-11-05T04:05:06Z").toEpochMilli
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.List.of(Row(
        java.lang.Long.valueOf(t), java.lang.Long.valueOf(t1),
        "2000-02-03T04:05:06", "2000-02-03 04:05:06", "foo",
        java.lang.Long.valueOf(2L), java.lang.Double.valueOf(3.1),
        "America/Los_Angeles", "  hey there  ",
        "192.168.0.1", java.lang.Long.valueOf(3232235521L),
        java.lang.Long.valueOf(tshift), java.lang.Long.valueOf(3L)))),
      schema).createOrReplaceTempView("macrobindings")
  }

  /** Evaluate a math-expr over the binding row. Timestamps compare as epoch
    * millis like the reference's ExprEval.asLong. */
  private def one(mathExpr: String): Any = {
    bound
    val c = MathExpr.expr(mathExpr)
    val r = spark.table("macrobindings")
      .select(c.as("v"), c.cast("string").as("s")).head()
    r.get(0) match {
      case ts: java.time.LocalDateTime =>
        ts.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case ts: java.sql.Timestamp => ts.getTime
      case other => other
    }
  }

  private def ms(iso: String): Long = java.time.Instant.parse(iso).toEpochMilli

  test("testLike (ExprMacroTest.java:66)") {
    assert(one("like(x, 'f%')") == true)
    assert(one("like(x, 'f__')") == true)
    assert(one("like(x, '%o%')") == true)
    assert(one("like(x, 'b%')") == false)
    assert(one("like(x, 'b__')") == false)
    assert(one("like(x, '%x%')") == false)
    assert(one("like(x, '')") == false)
  }

  test("testRegexpExtract (ExprMacroTest.java:78) — group 0 default, Druid null-on-no-match") {
    assert(one("regexp_extract(x, 'f(.)')") == "fo")
    assert(one("regexp_extract(x, 'f(.)', 0)") == "fo")
    assert(one("regexp_extract(x, 'f(.)', 1)") == "o")
  }

  test("regexp_like contract (RegexpLikeExprMacroTest.java) — false-not-null, literal pattern") {
    assert(one("regexp_like(x, 'f.o')") == true)
    assert(one("regexp_like(x, 'f.x')") == false)
    assert(one("regexp_like(x, '')") == true)
    // sql-compatible: a NULL input evaluates FALSE, never null
    assert(one("regexp_like(null, '')") == false)
    // non-literal pattern is a plan-time error
    val e = intercept[Exception](one("regexp_like(x, x)"))
    assert(e.getMessage.contains("pattern must be a string literal"))
  }

  test("testTimestampCeil (ExprMacroTest.java:86) — boundary stays put, origins and zones") {
    assert(one("timestamp_ceil(null, 'P1M')") == null)
    assert(one("timestamp_ceil(t, 'P1M')") == ms("2000-03-01T00:00:00Z"))
    assert(one("timestamp_ceil(t, 'P1D',null,'America/Los_Angeles')") == ms("2000-02-03T08:00:00Z"))
    // DYNAMIC timezone: CityOfAngels is a COLUMN (the macro's per-row
    // PeriodGranularity path)
    assert(one("timestamp_ceil(t, 'P1D',null,CityOfAngels)") == ms("2000-02-03T08:00:00Z"))
    assert(one("timestamp_ceil(t, 'P1D','1970-01-01T01','Etc/UTC')") == ms("2000-02-04T01:00:00Z"))
    // an exact boundary ceils to ITSELF
    assert(one("timestamp_ceil(t1, 'P1D')") == ms("2000-02-03T00:00:00Z"))
  }

  test("testTimestampFloor (ExprMacroTest.java:97)") {
    assert(one("timestamp_floor(null, 'P1M')") == null)
    assert(one("timestamp_floor(t, 'P1M')") == ms("2000-02-01T00:00:00Z"))
    assert(one("timestamp_floor(t, 'P1D',null,'America/Los_Angeles')") == ms("2000-02-02T08:00:00Z"))
    assert(one("timestamp_floor(t, 'P1D',null,CityOfAngels)") == ms("2000-02-02T08:00:00Z"))
    assert(one("timestamp_floor(t, 'P1D','1970-01-01T01','Etc/UTC')") == ms("2000-02-03T01:00:00Z"))
  }

  test("testTimestampShift (ExprMacroTest.java:107) — zones leave a fixed-day shift alone") {
    assert(one("timestamp_shift(t, 'P1D', 2)") == ms("2000-02-05T04:05:06Z"))
    assert(one("timestamp_shift(t, 'P1D', 2, 'America/Los_Angeles')") == ms("2000-02-05T04:05:06Z"))
    assert(one("timestamp_shift(t, 'P1D', 2, CityOfAngels)") == ms("2000-02-05T04:05:06Z"))
    assert(one("timestamp_shift(t, 'P1D', 2, '-08:00')") == ms("2000-02-05T04:05:06Z"))
  }

  test("TimestampShiftMacroTest vectors (:95-176) — steps, zones, null, dynamic step") {
    assert(one("timestamp_shift(tshift, 'P1M', 0)") == ms("2020-11-05T04:05:06Z"))
    assert(one("timestamp_shift(tshift, 'P1M', 5)") == ms("2021-04-05T04:05:06Z"))
    assert(one("timestamp_shift(tshift, 'P1M', -3)") == ms("2020-08-05T04:05:06Z"))
    assert(one("timestamp_shift(tshift, 'PT1M', 1)") == ms("2020-11-05T04:06:06Z"))
    assert(one("timestamp_shift(tshift, 'P1D', 1)") == ms("2020-11-06T04:05:06Z"))
    // LA wall clock 2020-11-04T20:05:06 PST (UTC-8, after the Nov 1
    // fall-back); +1Y lands BEFORE 2021's Nov 7 fall-back, i.e. in PDT
    // (UTC-7) — the instant moves by 365d MINUS 1h, exactly joda's
    // withPeriodAdded under the zone
    assert(one("timestamp_shift(tshift, 'P1Y', 1, 'America/Los_Angeles')") ==
      ms("2021-11-05T03:05:06Z"))
    // step from a COLUMN (testDynamicExpression); +3Y likewise lands in PDT
    assert(one("timestamp_shift(tshift, 'P1Y', step, 'America/Los_Angeles')") ==
      ms("2023-11-05T03:05:06Z"))
    assert(one("timestamp_shift(null, 'P1M', 1)") == null)
  }

  test("testTimestampExtract (ExprMacroTest.java:117)") {
    assert(one("timestamp_extract(t, 'DAY')") == 3L)
    assert(one("timestamp_extract(t, 'HOUR')") == 4L)
    assert(one("timestamp_extract(t, 'DAY', 'America/Los_Angeles')") == 2L)
    assert(one("timestamp_extract(t, 'HOUR', 'America/Los_Angeles')") == 20L)
    // dynamic zone column
    assert(one("timestamp_extract(t, 'DAY', CityOfAngels)") == 2L)
    assert(one("timestamp_extract(t, 'HOUR', CityOfAngels)") == 20L)
    // TimestampExtractExprMacroTest: string timestamps parse, PostgreSQL
    // decade/century/millennium arithmetic (:53-101)
    assert(one("timestamp_extract('2001-02-16', 'DECADE')") == 200L)
    assert(one("timestamp_extract('2000-12-16', 'CENTURY')") == 20L)
    assert(one("timestamp_extract('2001-02-16', 'CENTURY')") == 21L)
    assert(one("timestamp_extract('2000-12-16', 'MILLENNIUM')") == 2L)
    assert(one("timestamp_extract('2001-02-16', 'MILLENNIUM')") == 3L)
  }

  test("testTimestampParse (ExprMacroTest.java:126) — auto formats, patterns, null on garbage") {
    assert(one("timestamp_parse(tstr)") == ms("2000-02-03T04:05:06Z"))
    assert(one("timestamp_parse(tstr_sql)") == ms("2000-02-03T04:05:06Z"))
    assert(one("timestamp_parse('2000-02-03')") == ms("2000-02-03T00:00:00Z"))
    assert(one("timestamp_parse('2000-02')") == ms("2000-02-01T00:00:00Z"))
    assert(one("timestamp_parse(null)") == null)
    assert(one("timestamp_parse('z2000')") == null)
    assert(one("timestamp_parse(tstr_sql,'yyyy-MM-dd HH:mm:ss')") == ms("2000-02-03T04:05:06Z"))
    assert(one("timestamp_parse('02/03/2000','MM/dd/yyyy')") == ms("2000-02-03T00:00:00Z"))
  }

  test("testTimestampFormat (ExprMacroTest.java:147)") {
    assert(one("timestamp_format(t)") == "2000-02-03T04:05:06.000Z")
    assert(one("timestamp_format(t,'yyyy-MM-dd HH:mm:ss')") == "2000-02-03 04:05:06")
    assert(one("timestamp_format(t,'yyyy-MM-dd HH:mm:ss','America/Los_Angeles')") ==
      "2000-02-02 20:05:06")
  }

  test("null-format timestamp_format renders the zone OFFSET like " +
      "ISODateTimeFormat.dateTime().withZone (TimestampFormatExprMacro)") {
    // literal zone: offset prints (-08:00 in Feb PST), and an EXPLICIT
    // 'UTC' zone still prints 'Z' — the literal and dynamic paths agree
    assert(one("timestamp_format(t,null,'America/Los_Angeles')") ==
      "2000-02-02T20:05:06.000-08:00")
    assert(one("timestamp_format(t,null,'UTC')") == "2000-02-03T04:05:06.000Z")
    // dynamic zone column (CityOfAngels) takes the same formatter
    assert(one("timestamp_format(t,null,CityOfAngels)") ==
      "2000-02-02T20:05:06.000-08:00")
  }

  test("dynamic-zone pure-millis floors are O(1) fixed-width arithmetic, " +
      "not an iterated walk (PeriodGranularity.truncateMillisPeriod)") {
    // origin 0 + PT1M over a 2000 instant: the old Walker would memoize
    // ~15.8M boundaries per zone; the fixed-width path is instant
    assert(one("timestamp_floor(t, 'PT1M', 0, CityOfAngels)") ==
      ms("2000-02-03T04:05:00Z"))
    assert(one("timestamp_ceil(t, 'PT1M', 0, CityOfAngels)") ==
      ms("2000-02-03T04:06:00Z"))
    // sub-second grid with a nonzero origin: boundary = origin + k·width
    assert(one("timestamp_floor(t, 'PT1S', 1, CityOfAngels)") ==
      ms("2000-02-03T04:05:06Z") - 999L)
    // an exact boundary ceils to itself on the fixed-width path too
    assert(one("timestamp_ceil(t, 'PT1M', null, CityOfAngels)") ==
      ms("2000-02-03T04:05:06Z") + 54000L)
  }

  test("offset-less string origins resolve in the PER-ROW zone's chronology " +
      "(ExprUtils.toPeriodGranularity: new DateTime(value, ISOChronology.getInstance(tz)))") {
    // '1970-01-01T01' read as 01:00 LA wall time → daily boundaries at
    // 01:00 local; t = 2000-02-02T20:05:06 LA floors to 02-02T01:00 PST
    assert(one("timestamp_floor(t, 'P1D', '1970-01-01T01', CityOfAngels)") ==
      ms("2000-02-02T09:00:00Z"))
    // an EXPLICIT offset pins the instant instead: origin 01:00Z is
    // 1969-12-31T17:00 LA wall, so daily boundaries sit at 17:00 PST
    assert(one("timestamp_floor(t, 'P1D', '1970-01-01T01:00:00Z', CityOfAngels)") ==
      ms("2000-02-03T01:00:00Z"))
  }

  test("dynamic EPOCH truncates toward zero like getMillis()/1000 " +
      "(TimestampExtractExprMacro.java:113)") {
    assert(one("timestamp_extract(-500, 'EPOCH', CityOfAngels)") == 0L)
    assert(one("timestamp_extract(-1500, 'EPOCH', CityOfAngels)") == -1L)
    assert(one("timestamp_extract(1500, 'EPOCH', CityOfAngels)") == 1L)
    // literal path agrees
    assert(one("timestamp_extract(-500, 'EPOCH')") == 0L)
    assert(one("timestamp_extract(-1500, 'EPOCH')") == -1L)
  }

  test("testTrim / testLTrim / testRTrim (ExprMacroTest.java:155-190) — dynamic char sets") {
    assert(one("trim('')") == "")
    assert(one("trim(concat(' ',x,' '))") == "foo")
    assert(one("trim(spacey)") == "hey there")
    assert(one("trim(spacey, '')") == "  hey there  ")
    assert(one("trim(spacey, 'he ')") == "y ther")
    assert(one("trim(spacey, spacey)") == "")
    assert(one("trim(spacey, substring(spacey, 0, 4))") == "y ther")
    assert(one("ltrim('')") == "")
    assert(one("ltrim(concat(' ',x,' '))") == "foo ")
    assert(one("ltrim(spacey)") == "hey there  ")
    assert(one("ltrim(spacey, '')") == "  hey there  ")
    assert(one("ltrim(spacey, 'he ')") == "y there  ")
    assert(one("ltrim(spacey, spacey)") == "")
    assert(one("ltrim(spacey, substring(spacey, 0, 4))") == "y there  ")
    assert(one("rtrim('')") == "")
    assert(one("rtrim(concat(' ',x,' '))") == " foo")
    assert(one("rtrim(spacey)") == "  hey there")
    assert(one("rtrim(spacey, '')") == "  hey there  ")
    assert(one("rtrim(spacey, 'he ')") == "  hey ther")
    assert(one("rtrim(spacey, spacey)") == "")
    assert(one("rtrim(spacey, substring(spacey, 0, 4))") == "  hey ther")
  }

  test("testIPv4AddressParse / Stringify round trips (ExprMacroTest.java:192-210)") {
    assert(one("ipv4_parse(x)") == null)
    assert(one("ipv4_parse(ipv4_string)") == 3232235521L)
    assert(one("ipv4_parse(ipv4_long)") == 3232235521L)
    assert(one("ipv4_parse(ipv4_stringify(ipv4_long))") == 3232235521L)
    assert(one("ipv4_stringify(x)") == null)
    assert(one("ipv4_stringify(ipv4_long)") == "192.168.0.1")
    assert(one("ipv4_stringify(ipv4_string)") == "192.168.0.1")
    assert(one("ipv4_stringify(ipv4_parse(ipv4_string))") == "192.168.0.1")
  }
}
