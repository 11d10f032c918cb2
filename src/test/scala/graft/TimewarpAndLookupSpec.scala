package graft

import org.apache.spark.sql.functions._
import graft.operators.{Agg, PeriodGranularity, Timewarp, TimeseriesQuery}
import graft.sources.{LookupRegistry, Sources}

class TimewarpAndLookupSpec extends SparkSpecBase {
  import spark.implicits._

  test("timewarp shifts a timeseries forward by one year") {
    val li = Sources.table(spark, sf(), "lineitem")
    def yearly(df: org.apache.spark.sql.DataFrame) =
      TimeseriesQuery(timeColumn = "l_shipdate",
        granularity = PeriodGranularity("P1Y"),
        aggregations = Seq(Agg("cnt", count(lit(1))))).run(df)
    val warped = Timewarp(li, "l_shipdate", "P1Y", 1)(yearly)
      .as[(java.time.LocalDateTime, Long)].collect().toMap
    val normal = yearly(li).as[(java.time.LocalDateTime, Long)].collect().toMap
    normal.foreach { case (t, n) =>
      assert(warped(t.plusYears(1)) == n) // same counts, shifted labels
    }
  }

  test("computeOffset periodic alignment vectors (TimewarpOperatorTest.java:52-77)") {
    import java.time.{Instant, ZoneId, ZoneOffset}
    // the reference's test operator: dataInterval 2014-01-01/2014-01-15,
    // P1W, origin 2014-01-06 (a Monday)
    val end = Instant.parse("2014-01-15T00:00:00Z").toEpochMilli
    val week = 7L * 86400000L
    val origin = Instant.parse("2014-01-06T00:00:00Z").toEpochMilli
    def warped(tIso: String, tz: ZoneId): Instant = {
      val t = Instant.parse(tIso).toEpochMilli
      Instant.ofEpochMilli(t + Timewarp.computeOffset(t, end, week, origin, tz))
    }
    assert(warped("2014-01-23T00:00:00Z", ZoneOffset.UTC) ==
      Instant.parse("2014-01-09T00:00:00Z"))
    assert(warped("2014-08-02T00:00:00Z", ZoneOffset.UTC) ==
      Instant.parse("2014-01-11T00:00:00Z"))
    // DST correction: -07 summer wall time maps to the -08 winter wall time
    assert(warped("2014-08-02T00:00:00-07:00", ZoneId.of("America/Los_Angeles")) ==
      Instant.parse("2014-01-11T00:00:00-08:00"))
  }

  test("overlay replays the aligned past week in the present frame") {
    import java.time.Instant
    val end = Instant.parse("2014-01-15T00:00:00Z").toEpochMilli
    val week = 7L * 86400000L
    val origin = Instant.parse("2014-01-06T00:00:00Z").toEpochMilli
    val now = Instant.parse("2014-08-02T00:00:00Z").toEpochMilli // warps to 01-11
    val data = Seq("2014-01-09 00:00:00", "2014-01-11 00:00:00")
      .map(java.sql.Timestamp.valueOf).toDF("t")
    val out = Timewarp.overlay(data, "t", end, week, origin, now)(df => df)
      .as[java.sql.Timestamp].collect().map(_.toString).sorted
    // 01-09 (Thu of the data week) surfaces as 07-31 (Thu of the now week)
    assert(out.toSeq == Seq("2014-07-31 00:00:00.0", "2014-08-02 00:00:00.0"))
  }

  test("file-backed lookup refresh replaces the mapping") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lookup").toString
    Seq(("F", "closed"), ("O", "open")).toDF("k", "v")
      .write.option("header", "true").mode("overwrite").csv(s"$dir/l")
    val reg = new LookupRegistry
    reg.registerFromFile(spark, "status", s"$dir/l")
    val orders = Sources.table(spark, sf(), "orders")
    val v1 = reg(orders, "o_orderstatus", "status", "s")
      .filter($"s" === "closed").count()
    assert(v1 > 0)
    // refresh with a new mapping
    Seq(("F", "finished"), ("O", "open")).toDF("k", "v")
      .write.option("header", "true").mode("overwrite").csv(s"$dir/l")
    reg.registerFromFile(spark, "status", s"$dir/l")
    val v2 = reg(orders, "o_orderstatus", "status", "s")
      .filter($"s" === "finished").count()
    assert(v2 == v1)
  }

  test("jdbc lookup namespace loads and refreshes from a JDBC table") {
    // Derby embedded (ships with Spark) stands in for the reference's
    // JdbcExtractionNamespace source database
    val url = "jdbc:derby:memory:graftlookup;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE kv (k VARCHAR(32) PRIMARY KEY, v VARCHAR(32))")
      st.execute("INSERT INTO kv VALUES ('0', 'zero'), ('1', 'one')")
      val reg = new LookupRegistry
      reg.registerFromJdbc(spark, "jkv", url, "kv", "K", "V")
      assert(reg.asMap("jkv") == Map("0" -> "zero", "1" -> "one"))
      // refresh picks up source-table changes (reference: pollPeriod)
      st.execute("UPDATE kv SET v = 'ONE' WHERE k = '1'")
      reg.registerFromJdbc(spark, "jkv", url, "kv", "K", "V")
      assert(reg.asMap("jkv")("1") == "ONE")
    } finally conn.close()
  }

  test("LOOKUP() scalar guard rejects oversized lookups") {
    val reg = new LookupRegistry
    reg.register("big", (1 to 50).map(i => (i.toString, "v")).toDF("k", "v"))
    assertThrows[IllegalArgumentException](reg.asMap("big", maxEntries = 10))
  }
}
