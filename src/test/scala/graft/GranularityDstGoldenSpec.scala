package graft

import java.time.OffsetDateTime

import org.apache.spark.sql.functions._
import graft.functions.TimeFunctions

/** PeriodGranularity bucketStart parity, porting the reference's
  * timezone/DST vectors (processing/src/test/java/org/apache/druid/
  * granularity/QueryGranularityTest.java) against TimeFunctions.timeFloor.
  * The fall-back hourly vector is the sharp edge: the repeated 01:xx local
  * hour must produce TWO distinct buckets, one per UTC offset.
  */
class GranularityDstGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def millis(iso: String): Long = OffsetDateTime.parse(iso).toInstant.toEpochMilli

  /** timeFloor applied through the engine; in/out epoch millis. */
  private def floorAll(in: Seq[Long], period: String, tz: String,
      origin: Option[String] = None): Seq[Long] =
    in.toDF("m")
      .select(unix_millis(TimeFunctions.timeFloor(
        timestamp_millis(col("m")), period,
        origin.map(o => timestamp_millis(lit(millis(o)))).orNull, tz).cast("timestamp")))
      .as[Long].collect().toSeq

  // testPeriodDaylightSaving (QueryGranularityTest.java:316) — the hourly
  // battery across the 2012-11-04 America/Los_Angeles fall-back
  test("hourly buckets across a DST fall-back (QueryGranularityTest.java:342-358)") {
    val in = Seq(
      "2012-11-04T00:30:00-07:00", "2012-11-04T01:30:00-07:00",
      "2012-11-04T01:30:00-08:00", "2012-11-04T02:30:00-08:00",
      "2012-11-04T03:30:00-08:00").map(millis)
    val expected = Seq(
      "2012-11-04T00:00:00-07:00", "2012-11-04T01:00:00-07:00",
      "2012-11-04T01:00:00-08:00", "2012-11-04T02:00:00-08:00",
      "2012-11-04T03:00:00-08:00").map(millis)
    assert(floorAll(in, "PT1H", "America/Los_Angeles") == expected)
  }

  // testPeriodDaylightSaving daily iterable starts (QueryGranularityTest.java:320-328)
  test("daily buckets across a DST fall-back (QueryGranularityTest.java:320)") {
    val in = Seq(
      "2012-11-04T12:00:00-08:00", "2012-11-05T12:00:00-08:00", "2012-11-06T12:00:00-08:00")
      .map(millis)
    val expected = Seq(
      "2012-11-04T00:00:00-07:00", "2012-11-05T00:00:00-08:00", "2012-11-06T00:00:00-08:00")
      .map(millis)
    assert(floorAll(in, "P1D", "America/Los_Angeles") == expected)
  }

  // testPeriodTruncateDays (QueryGranularityTest.java:406)
  test("P2D truncation with and without origin (QueryGranularityTest.java:406)") {
    val in = Seq(
      "2012-01-01T05:00:04.123-08:00", "2012-01-02T07:00:04.123-08:00",
      "2012-01-04T07:20:04.123-08:00").map(millis)
    assert(
      floorAll(in, "P2D", "America/Los_Angeles", Some("2012-01-02T05:00:00.000-08:00")) ==
        Seq("2011-12-31T05:00:00.000-08:00", "2012-01-02T05:00:00.000-08:00",
          "2012-01-04T05:00:00.000-08:00").map(millis))
    assert(
      floorAll(in, "P2D", "America/Los_Angeles") ==
        Seq("2012-01-01T00:00:00.000-08:00", "2012-01-01T00:00:00.000-08:00",
          "2012-01-03T00:00:00.000-08:00").map(millis))
  }

  // testPeriodTruncateMinutes (QueryGranularityTest.java:450)
  test("PT15M truncation with and without origin (QueryGranularityTest.java:450)") {
    val in = Seq(
      "2012-01-01T05:00:04.123Z", "2012-01-02T07:08:04.123Z", "2012-01-04T00:20:04.123Z")
      .map(millis)
    assert(
      floorAll(in, "PT15M", null, Some("2012-01-02T00:05:00.000Z")) ==
        Seq("2012-01-01T04:50:00.000Z", "2012-01-02T07:05:00.000Z",
          "2012-01-04T00:20:00.000Z").map(millis))
    assert(
      floorAll(in, "PT15M", null) ==
        Seq("2012-01-01T05:00:00.000Z", "2012-01-02T07:00:00.000Z",
          "2012-01-04T00:15:00.000Z").map(millis))
  }

  // testTruncateKathmandu (QueryGranularityTest.java:882) — +05:45 zone
  test("year/hour/2-hour truncation in Asia/Kathmandu (QueryGranularityTest.java:882)") {
    val in = Seq(millis("2011-03-15T21:42:23.898+05:45"))
    assert(floorAll(in, "P1Y", "Asia/Kathmandu") == Seq(millis("2011-01-01T00:00:00.000+05:45")))
    assert(floorAll(in, "PT1H", "Asia/Kathmandu") == Seq(millis("2011-03-15T21:00:00.000+05:45")))
    assert(floorAll(in, "PT2H", "Asia/Kathmandu") == Seq(millis("2011-03-15T20:00:00.000+05:45")))
  }

  // testTruncateDhaka (QueryGranularityTest.java:910)
  test("year/hour/2-hour truncation in Asia/Dhaka (QueryGranularityTest.java:910)") {
    val in = Seq(millis("2011-03-15T21:42:23.898+06:00"))
    assert(floorAll(in, "P1Y", "Asia/Dhaka") == Seq(millis("2011-01-01T00:00:00.000+06:00")))
    assert(floorAll(in, "PT1H", "Asia/Dhaka") == Seq(millis("2011-03-15T21:00:00.000+06:00")))
    assert(floorAll(in, "PT2H", "Asia/Dhaka") == Seq(millis("2011-03-15T20:00:00.000+06:00")))
  }

  // testIterableMinuteSimple / testIterable15MinuteSimple /
  // testIterableHourSimple / testIterableDaySimple bucket starts
  // (QueryGranularityTest.java:70-190, no-tz arithmetic)
  test("simple UTC bucket starts (QueryGranularityTest.java:70-190)") {
    val base = millis("2011-01-01T09:38:02.992Z")
    def exp(s: String) = millis(s)
    assert(floorAll(Seq(base), "PT1M", null) == Seq(exp("2011-01-01T09:38:00.000Z")))
    assert(floorAll(Seq(base), "PT15M", null) == Seq(exp("2011-01-01T09:30:00.000Z")))
    assert(floorAll(Seq(base), "PT1H", null) == Seq(exp("2011-01-01T09:00:00.000Z")))
    assert(floorAll(Seq(base), "P1D", null) == Seq(exp("2011-01-01T00:00:00.000Z")))
  }

  test("testDurationBucketStart (QueryGranularityTest.java:585-627) — fixed-" +
      "millis buckets with a non-aligned origin, exact reference arithmetic") {
    import graft.operators.DurationGranularity
    // PT12H5M = 43,500,000 ms; origin 2012-01-02T05:00:00-08:00
    val g = DurationGranularity(43500000L, millis("2012-01-02T05:00:00.000-08:00"))
    val vectors = Seq(
      "2012-01-01T05:00:04.123-08:00" -> "2012-01-01T04:50:00.000-08:00",
      "2012-01-02T07:00:04.123-08:00" -> "2012-01-02T05:00:00.000-08:00",
      "2012-01-03T00:20:04.123-08:00" -> "2012-01-02T17:05:00.000-08:00",
      "2012-02-03T22:25:00.000-08:00" -> "2012-02-03T22:25:00.000-08:00")
    val got = vectors.map(_._1).map(millis).toDF("m")
      .select(unix_millis(g.bucket(timestamp_millis(col("m"))).cast("timestamp")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == vectors.map(v => millis(v._2)))
    // negative origin mod (pre-1970 origin) keeps Java % semantics
    val g2 = DurationGranularity(3600000L, -1L)
    val got2 = Seq(millis("2012-01-01T05:30:00.000Z")).toDF("m")
      .select(unix_millis(g2.bucket(timestamp_millis(col("m"))).cast("timestamp")))
      .head().getLong(0)
    // reference: origin = -1 % 3600000 = -1; bucketStart lands on :59:59.999
    assert(got2 == millis("2012-01-01T04:59:59.999Z"))
  }

  test("testCompoundPeriodTruncate (QueryGranularityTest.java:485-530) — " +
      "P1M2D calendar buckets from an origin, LA zone, origin-less default") {
    // boundary(k) = origin +k months +2k days in the zone (Joda
    // multiplied-period addition)
    val withOrigin = floorAll(
      Seq("2012-01-01T05:00:04.123-08:00", "2012-01-02T07:00:04.123-08:00",
          "2012-03-01T07:20:04.123-08:00", "2012-02-04T05:00:00.000-08:00").map(millis),
      "P1M2D", "America/Los_Angeles", Some("2012-01-02T05:00:00.000-08:00"))
    assert(withOrigin == Seq(
      millis("2011-11-30T05:00:00.000-08:00"),
      millis("2012-01-02T05:00:00.000-08:00"),
      millis("2012-02-04T05:00:00.000-08:00"),
      millis("2012-02-04T05:00:00.000-08:00")))
    // no origin: epoch LOCAL wall time in the zone anchors the grid
    val noOrigin = floorAll(
      Seq("1970-01-01T05:02:04.123-08:00", "2012-01-01T05:02:04.123-08:00",
          "2012-01-15T07:01:04.123-08:00", "2012-02-16T00:00:00.000-08:00").map(millis),
      "P1M2D", "America/Los_Angeles", None)
    assert(noOrigin == Seq(
      millis("1970-01-01T00:00:00.000-08:00"),
      millis("2011-12-12T00:00:00.000-08:00"),
      millis("2012-01-14T00:00:00.000-08:00"),
      millis("2012-02-16T00:00:00.000-08:00")))
  }

  test("compound-period ceil and shift (TimestampCeilExprMacro / " +
      "TimestampShiftExprMacro over P1M2D)") {
    import graft.functions.TimeFunctions
    val in = Seq(millis("2012-01-05T00:00:00.000Z")).toDF("m")
    // floor lands 2012-01-03 (epoch-anchored iterated grid: ...; boundary
    // just below Jan 5), ceil = next boundary; on-boundary ceil = identity
    val flo = in.select(unix_millis(TimeFunctions.timeFloor(
      timestamp_millis(col("m")), "P1M2D").cast("timestamp"))).head().getLong(0)
    val ceil = in.select(unix_millis(TimeFunctions.timeCeil(
      timestamp_millis(col("m")), "P1M2D").cast("timestamp"))).head().getLong(0)
    assert(flo < millis("2012-01-05T00:00:00.000Z") && ceil > flo)
    val onB = Seq(flo).toDF("m").select(unix_millis(TimeFunctions.timeCeil(
      timestamp_millis(col("m")), "P1M2D").cast("timestamp"))).head().getLong(0)
    assert(onB == flo)
    // shift multiplies the period fields once: +2 steps = +2 months +4 days
    val shifted = Seq(millis("2012-01-31T12:00:00.000Z")).toDF("m")
      .select(unix_millis(TimeFunctions.timeShift(
        timestamp_millis(col("m")), "P1M2D", 2).cast("timestamp"))).head().getLong(0)
    // 2012-01-31 +2 months = 2012-03-31, +4 days = 2012-04-04 (12:00 kept)
    assert(shifted == millis("2012-04-04T12:00:00.000Z"))
  }

  test("testIterableMonth (QueryGranularityTest.java:362-376) — the zero-fill " +
      "spine follows the zone's DST-shifted month boundaries; a UTC-stepped " +
      "spine would DROP the post-transition buckets on the fill join") {
    import graft.operators.{Agg, PeriodGranularity, TimeseriesQuery}
    // one row per month Oct 2012..Jan 2013 (spans the Nov 4 LA fall-back)
    val df = Seq("2012-10-15 12:00:00", "2012-11-15 12:00:00",
      "2012-12-15 12:00:00", "2013-01-15 12:00:00")
      .toDF("s").select(col("s").cast("timestamp_ntz").as("__time"), lit(1L).as("v"))
    val out = TimeseriesQuery(
      granularity = PeriodGranularity("P1M", null, "America/Los_Angeles"),
      aggregations = Seq(Agg("cnt", count(lit(1))))
    ).run(df).collect()
    // boundaries: -07:00 before the transition, -08:00 after
    // (testIterableMonth's 2012-11-01T00:00-07:00 / 2012-12-01T00:00-08:00)
    assert(out.map(_.get(0).toString).toSeq == Seq(
      "2012-10-01T07:00", "2012-11-01T07:00", "2012-12-01T08:00", "2013-01-01T08:00"))
    // no bucket lost its rows to a spine mismatch
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 1L, 1L, 1L))
    // and an EMPTY bucket inside the span zero-fills on the shifted boundary
    val sparse = Seq("2012-10-15 12:00:00", "2013-01-15 12:00:00")
      .toDF("s").select(col("s").cast("timestamp_ntz").as("__time"), lit(1L).as("v"))
    val filled = TimeseriesQuery(
      granularity = PeriodGranularity("P1M", null, "America/Los_Angeles"),
      aggregations = Seq(Agg("cnt", count(lit(1))))
    ).run(sparse).collect()
    assert(filled.length == 4)
    assert(filled.map(_.getLong(1)).toSeq == Seq(1L, 0L, 0L, 1L))
    assert(filled.map(_.get(0).toString).toSeq.contains("2012-12-01T08:00"))
  }

  test("hourly zero-fill keeps BOTH fall-back buckets (the repeated 01:xx " +
      "local hour is two distinct buckets, UTC-stepped spine) and daily " +
      "zero-fill crosses the 25h day (zone-stepped spine)") {
    import graft.operators.{Agg, PeriodGranularity, TimeseriesQuery}
    // rows at 00:30-07:00, 01:30-07:00, 01:30-08:00, 02:30-08:00 around the
    // 2012-11-04 LA fall-back; hourly LA buckets = 4 distinct
    val hrs = Seq("2012-11-04T00:30:00-07:00", "2012-11-04T01:30:00-07:00",
      "2012-11-04T01:30:00-08:00", "2012-11-04T02:30:00-08:00")
    val df = hrs.map(h => java.time.OffsetDateTime.parse(h).toInstant.toEpochMilli)
      .toDF("m").select(timestamp_millis(col("m")).cast("timestamp_ntz").as("__time"),
        lit(1L).as("v"))
    val out = TimeseriesQuery(
      granularity = PeriodGranularity("PT1H", null, "America/Los_Angeles"),
      aggregations = Seq(Agg("cnt", count(lit(1))))
    ).run(df).collect()
    assert(out.length == 4, s"expected 4 hourly buckets, got ${out.toSeq}")
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 1L, 1L, 1L))
    // daily buckets across the same transition: Nov 3 + Nov 4 (25h) + Nov 5,
    // with the middle day EMPTY — the spine lands on local midnights
    val days = Seq("2012-11-03T12:00:00-07:00", "2012-11-05T12:00:00-08:00")
    val df2 = days.map(h => java.time.OffsetDateTime.parse(h).toInstant.toEpochMilli)
      .toDF("m").select(timestamp_millis(col("m")).cast("timestamp_ntz").as("__time"),
        lit(1L).as("v"))
    val out2 = TimeseriesQuery(
      granularity = PeriodGranularity("P1D", null, "America/Los_Angeles"),
      aggregations = Seq(Agg("cnt", count(lit(1))))
    ).run(df2).collect()
    assert(out2.length == 3)
    assert(out2.map(_.getLong(1)).toSeq == Seq(1L, 0L, 1L))
    // Nov 5 local midnight is 08:00Z (PST) — a fixed 24h UTC step from Nov 4
    // midnight (07:00Z, PDT) would have produced 07:00Z and dropped the row
    assert(out2.map(_.get(0).toString).toSeq == Seq(
      "2012-11-03T07:00", "2012-11-04T07:00", "2012-11-05T08:00"))
  }
}
