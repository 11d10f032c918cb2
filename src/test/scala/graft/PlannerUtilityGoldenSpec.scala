package graft

import java.sql.Timestamp

/** r15: the remaining small sql/calcite planner suites.
  *
  *  - OffsetLimitTest.java (sql/src/test/java/org/apache/druid/sql/calcite/
  *    planner/OffsetLimitTest.java): the reference fuses nested
  *    offset/limit pairs with OffsetLimit.andThen and asserts the fused
  *    window equals stream skip(innerOffset).limit(innerLimit)
  *    .skip(outerOffset).limit(outerLimit) over an 8-element list for the
  *    full {0..4} x {-1..4} x {0..4} x {-1..4} matrix. Here the ENGINE is
  *    the unit under test: the same nesting drives Catalyst's
  *    Offset/Limit operators (CollectLimit/GlobalLimit fusion) and must
  *    produce the same window.
  *  - TimeFormatOperatorConversionTest.java (.../expression/): TIME_FORMAT
  *    over an epoch-millis __time — UTC explicit, UTC default, explicit
  *    America/Los_Angeles, and the unknown-timezone rejection.
  */
class PlannerUtilityGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  test("testAndThen (OffsetLimitTest.java:33) — nested offset/limit " +
      "composes as stream skip/limit across the full 900-combination matrix") {
    val things = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    val t = things.toDF("v")
    var checked = 0
    for (innerOffset <- 0 until 5; innerLimit <- -1 until 5;
         outerOffset <- 0 until 5; outerLimit <- -1 until 5) {
      val expected = {
        var s = things.drop(innerOffset)
        if (innerLimit >= 0) s = s.take(innerLimit)
        s = s.drop(outerOffset)
        if (outerLimit >= 0) s = s.take(outerLimit)
        s
      }
      var inner = t.orderBy("v").offset(innerOffset)
      if (innerLimit >= 0) inner = inner.limit(innerLimit)
      var outer = inner.orderBy("v").offset(outerOffset)
      if (outerLimit >= 0) outer = outer.limit(outerLimit)
      val got = outer.collect().map(_.getString(0)).toSeq
      assert(got == expected,
        s"innerOffset[$innerOffset], innerLimit[$innerLimit], " +
          s"outerOffset[$outerOffset], outerLimit[$outerLimit]")
      checked += 1
    }
    assert(checked == 900)
  }

  private lazy val timeRow: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    Seq(Tuple1(Timestamp.valueOf("2000-02-03 04:05:06")))
      .toDF("__time").createOrReplaceTempView("tf_row")
  }

  private def timeFormat(args: String): String = {
    timeRow
    spark.sql(s"SELECT TIME_FORMAT(__time, $args) FROM tf_row").head().getString(0)
  }

  test("testConversionToUTC (TimeFormatOperatorConversionTest.java:60)") {
    assert(timeFormat("'yyyy-MM-dd HH:mm:ss', 'UTC'") == "2000-02-03 04:05:06")
  }

  test("testConversionWithDefaultShouldUseUTC (:71)") {
    assert(timeFormat("'yyyy-MM-dd HH:mm:ss'") == "2000-02-03 04:05:06")
  }

  test("testConversionToTimezone (:82)") {
    assert(timeFormat("'yyyy-MM-dd HH:mm:ss', 'America/Los_Angeles'")
      == "2000-02-02 20:05:06")
  }

  test("testConversionToUnknownTimezoneShouldThrowException (:93)") {
    val e = intercept[Exception] {
      timeFormat("'yyyy-MM-dd HH:mm:ss', 'America/NO_TZ'")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      String.valueOf(c.getMessage).contains("NO_TZ")))
  }
}
