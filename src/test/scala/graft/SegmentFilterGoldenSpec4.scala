package graft

import FilterFixtures.matches

/** Segment-filter behavioral goldens, tranche D — LongFilteringTest.java
  * (exact-decimal selector coercion over LONG columns, numeric vs
  * lexicographic bounds with unparseable limits), FloatAndDouble
  * FilteringTest.java (float/double columns under integer-form and
  * decimal-form values), TimeFilteringTest.java's interval filters
  * (epoch-millis parsing of LONG and STRING dimensions), and the
  * AndFilterTest / OrFilterTest combination grids. Each test cites its
  * reference method.
  *
  * Adjudicated not-portable: NotFilterTest (equals/hashCode/required-column
  * AST internals — NOT behavior is exercised throughout the other suites
  * and testNotAnd here), JavaScriptFilterTest (javascript is a documented
  * non-goal), FilterPartitionTest / FilterCnfConversionTest / FiltersTest /
  * VectorMatchTest / VectorValueMatcherColumnProcessorFactoryTest /
  * PredicateValueMatcherFactoryTest / NotFilterEvaluateTest (bitmap-index
  * partitioning, CNF conversion and vector-matcher internals of the
  * reference's cursor engine — Catalyst owns predicate planning here),
  * DimensionPredicateFilterTest / SelectorPredicateFactoryTest /
  * SelectorDimFilterTest / OrDimFilterTest / TrueDimFilterTest /
  * FalseDimFilterTest / RegexDimFilterTest / SearchQueryDimFilterTest /
  * LikeDimFilterTest / InDimFilterTest / IntervalDimFilterTest /
  * GetDimensionRangeSetTest / ExtractionDimFilterTest (SerDe, cache-key and
  * equals contracts of the filter POJOs — the match semantics are the
  * golden lists in tranches A-D), InvalidFilteringTest (filters over a
  * COMPLEX metric column see null — golden-gated by
  * testGroupByComplexColumn's oracle behavior), and
  * ExpressionFilterStrictBooleansTest (a legacy non-strict-boolean mode
  * flag; this engine implements the strict mode the reference defaults to).
  * TimeFilteringTest's selector/bound/in/extraction legs over __time are
  * covered by the epoch-millis __time filter goldens in tranches 15/17/19
  * (testGroupByWithTimeColumn, testTopNWithTimeColumn,
  * testTimeseriesWithTimestampResultFieldContextForMapResponse).
  */
class SegmentFilterGoldenSpec4 extends SparkSpecBase {

  private val LongRowsJson: String = """{"type": "inline",
    "columnNames": ["dim0", "lng", "dim1"],
    "columnTypes": ["STRING", "LONG", "STRING"],
    "rows": [
      ["1", 1, ""], ["2", 2, "10"], ["3", 3, "2"], ["4", 4, "1"],
      ["5", 5, "def"], ["6", 6, "abc"], ["7", 100000000, "xyz"],
      ["8", 100000001, "xyz"], ["9", -25, "ghi"], ["10", -100000001, "qqq"]]}"""

  private val FloatRowsJson: String = """{"type": "inline",
    "columnNames": ["dim0", "flt", "dbl"],
    "columnTypes": ["STRING", "FLOAT", "DOUBLE"],
    "rows": [
      ["1", 1.0, 1.0], ["2", 2.0, 2.0], ["3", 3.0, 3.0],
      ["4", 4.0, 4.0], ["5", 5.0, 5.0], ["6", 6.0, 6.0]]}"""

  private val AndOrRowsJson: String = """{"type": "inline",
    "columnNames": ["dim0", "dim1"],
    "columnTypes": ["STRING", "STRING"],
    "rows": [["0", "0"], ["1", "0"], ["2", "0"], ["3", "0"], ["4", "0"], ["5", "0"]]}"""

  private def mLng(f: String): Seq[String] =
    matches(spark, LongRowsJson, f, withVcs = false)
      .sortBy(s => (s.length, s)) // numeric-ish order of the string keys
  private def mFlt(f: String): Seq[String] =
    matches(spark, FloatRowsJson, f, withVcs = false)
  private def mAo(f: String): Seq[String] =
    matches(spark, AndOrRowsJson, f, withVcs = false)

  private def sel(dim: String, v: String): String = {
    val vv = if (v == null) "null" else s""""$v""""
    s"""{"type": "selector", "dimension": "$dim", "value": $vv}"""
  }
  private def bound(dim: String, lower: String, upper: String,
      lowerStrict: Boolean = false, upperStrict: Boolean = false,
      ordering: String = "numeric"): String = {
    val lo = if (lower == null) "" else s""""lower": "$lower","""
    val up = if (upper == null) "" else s""""upper": "$upper","""
    s"""{"type": "bound", "dimension": "$dim", $lo $up
        "lowerStrict": $lowerStrict, "upperStrict": $upperStrict,
        "ordering": "$ordering"}"""
  }

  test("testLongColumnFiltering (LongFilteringTest.java): EXACT-decimal " +
      "selector coercion on a LONG column — '3.0' selects 3, " +
      "'3.00000000000000000000001' selects nothing, overflow selects " +
      "nothing; numeric bounds in integer and decimal forms") {
    assert(mLng(sel("lng", "0")) == Seq())
    assert(mLng(sel("lng", "3")) == Seq("3"))
    assert(mLng(sel("lng", "3.0")) == Seq("3"))
    assert(mLng(sel("lng", "3.00000000000000000000001")) == Seq())
    assert(mLng(sel("lng", "100000001.0")) == Seq("8"))
    assert(mLng(sel("lng", "-100000001.0")) == Seq("10"))
    assert(mLng(sel("lng", "111119223372036854775807.674398674398")) == Seq())
    assert(mLng(bound("lng", "2", "5")) == Seq("2", "3", "4", "5"))
    assert(mLng(bound("lng", "1", "4", lowerStrict = true, upperStrict = true))
      == Seq("2", "3"))
    assert(mLng(bound("lng", "2.0", "5.0")) == Seq("2", "3", "4", "5"))
    assert(mLng(bound("lng", "2.0", "5.0", lowerStrict = true, upperStrict = true))
      == Seq("3", "4"))
    assert(mLng(bound("lng", "1.9", "5.9", lowerStrict = true, upperStrict = true))
      == Seq("2", "3", "4", "5"))
    assert(mLng(bound("lng", "2.1", "5.9")) == Seq("3", "4", "5"))
  }

  test("testLongColumnFilteringWithNonNumbers (LongFilteringTest.java): " +
      "unparseable values select nothing; the numeric comparator places " +
      "every number ABOVE unparseable bounds while lexicographic compares " +
      "the rendered strings") {
    assert(mLng(sel("lng", "")) == Seq())
    assert(mLng(sel("lng", null)) == Seq())
    assert(mLng(sel("lng", "abc")) == Seq())
    assert(mLng(bound("lng", "a", "b")) == Seq())
    assert(mLng(bound("lng", " ", "4")) == Seq("1", "2", "3", "4", "9", "10"))
    assert(mLng(bound("lng", " ", "4", ordering = "lexicographic"))
      == Seq("1", "2", "3", "4", "7", "8", "9", "10"))
    assert(mLng(bound("lng", " ", "A")) == Seq())
    assert(mLng(bound("lng", " ", "A", ordering = "lexicographic"))
      == Seq("1", "2", "3", "4", "5", "6", "7", "8", "9", "10"))
  }

  test("testLongFilterWithExtractionFn (LongFilteringTest.java): a lookup " +
      "over the long values' string forms") {
    val fn = """{"type": "lookup", "lookup": {"type": "map", "map":
      {"1": "Monday", "2": "Tuesday", "3": "Wednesday"}},
      "retainMissingValue": true}"""
    assert(mLng(s"""{"type": "selector", "dimension": "lng",
        "value": "Monday", "extractionFn": $fn}""") == Seq("1"))
    assert(mLng(s"""{"type": "selector", "dimension": "lng",
        "value": "Tuesday", "extractionFn": $fn}""") == Seq("2"))
  }

  test("testFloatColumnFiltering / testDoubleColumnFiltering (FloatAnd" +
      "DoubleFilteringTest.java): integer-form and decimal-form values " +
      "select the float/double rows; numeric bounds in both forms") {
    for (c <- Seq("flt", "dbl")) {
      assert(mFlt(sel(c, "3")) == Seq("3"), c)
      assert(mFlt(sel(c, "3.0")) == Seq("3"), c)
      assert(mFlt(bound(c, "2", "5")) == Seq("2", "3", "4", "5"), c)
      assert(mFlt(bound(c, "2.0", "5.0")) == Seq("2", "3", "4", "5"), c)
      assert(mFlt(bound(c, "1", "4", lowerStrict = true, upperStrict = true))
        == Seq("2", "3"), c)
      assert(mFlt(bound(c, "1.0", "4.0", lowerStrict = true, upperStrict = true))
        == Seq("2", "3"), c)
      assert(mFlt(s"""{"type": "in", "dimension": "$c",
          "values": ["2", "4"]}""") == Seq("2", "4"), c)
      assert(mFlt(s"""{"type": "in", "dimension": "$c",
          "values": ["2.0", "4.0"]}""") == Seq("2", "4"), c)
    }
  }

  test("testFloatColumnFilteringWithNonNumbers / testDoubleColumn... " +
      "(FloatAndDoubleFilteringTest.java): unparseable selector values " +
      "select nothing on numeric columns") {
    for (c <- Seq("flt", "dbl")) {
      assert(mFlt(sel(c, "")) == Seq(), c)
      assert(mFlt(sel(c, null)) == Seq(), c)
      assert(mFlt(sel(c, "abc")) == Seq(), c)
    }
  }

  test("testIntervalFilter / testIntervalFilterOnStringDimension (Time" +
      "FilteringTest.java): interval filters parse LONG and STRING " +
      "dimension values as epoch millis") {
    val lngMillis = """{"type": "inline",
      "columnNames": ["dim0", "lng"],
      "columnTypes": ["STRING", "LONG"],
      "rows": [["0", 0], ["1", 1], ["2", 2], ["3", 3], ["4", 4], ["5", 5]]}"""
    def mI(ds: String, dim: String, intervals: String): Seq[String] =
      matches(spark, ds, s"""{"type": "interval", "dimension": "$dim",
        "intervals": $intervals}""", withVcs = false)
    assert(mI(lngMillis, "lng",
      """["1970-01-01T00:00:00.001Z/1970-01-01T00:00:00.005Z"]""")
      == Seq("1", "2", "3", "4"))
    assert(mI(lngMillis, "lng",
      """["1970-01-01T00:00:00.000Z/1970-01-01T00:00:00.003Z",
          "1970-01-01T00:00:00.004Z/1970-01-01T00:00:00.006Z"]""")
      == Seq("0", "1", "2", "4", "5"))
    // the same intervals against the STRING dim0 "0".."5": values parse as
    // millis longs
    assert(mI(lngMillis, "dim0",
      """["1970-01-01T00:00:00.001Z/1970-01-01T00:00:00.005Z"]""")
      == Seq("1", "2", "3", "4"))
    assert(mI(lngMillis, "dim0",
      """["1970-01-01T00:00:00.000Z/1970-01-01T00:00:00.003Z",
          "1970-01-01T00:00:00.004Z/1970-01-01T00:00:00.006Z"]""")
      == Seq("0", "1", "2", "4", "5"))
  }

  test("testAnd / testNotAnd (AndFilterTest.java): conjunction grids and " +
      "the NOT of a conjunction") {
    val all = Seq("0", "1", "2", "3", "4", "5")
    assert(mAo(s"""{"type": "and", "fields": [${sel("dim0", "0")}, ${sel("dim1", "0")}]}""")
      == Seq("0"))
    assert(mAo(s"""{"type": "and", "fields": [${sel("dim0", "0")}, ${sel("dim1", "1")}]}""")
      == Seq())
    assert(mAo(s"""{"type": "and", "fields": [${sel("dim1", "0")}, ${sel("dim1", "0")}]}""")
      == all)
    assert(mAo(s"""{"type": "not", "field":
        {"type": "and", "fields": [${sel("dim0", "0")}, ${sel("dim1", "0")}]}}""")
      == Seq("1", "2", "3", "4", "5"))
    assert(mAo(s"""{"type": "not", "field":
        {"type": "and", "fields": [${sel("dim1", "1")}, ${sel("dim1", "2")}]}}""")
      == all)
  }

  test("testOneFilterMatchSome / MatchAll / MatchNone and the TwoFilter / " +
      "ThreeFilter grids (OrFilterTest.java): disjunction combinations " +
      "including literal TRUE legs") {
    val all = Seq("0", "1", "2", "3", "4", "5")
    assert(mAo(s"""{"type": "or", "fields": [${sel("dim0", "1")}]}""") == Seq("1"))
    assert(mAo(s"""{"type": "or", "fields": [${sel("dim1", "0")}]}""") == all)
    assert(mAo(s"""{"type": "or", "fields": [${sel("dim0", "x")}]}""") == Seq())
    assert(mAo(s"""{"type": "or", "fields": [${sel("dim1", "0")}, ${sel("dim0", "x")}]}""") == all)
    assert(mAo(s"""{"type": "or", "fields": [${sel("dim0", "x")}, ${sel("dim1", "0")}]}""") == all)
    assert(mAo(s"""{"type": "or", "fields": [${sel("dim0", "x")}, {"type": "true"}]}""") == all)
    assert(mAo(s"""{"type": "or", "fields": [{"type": "true"}, ${sel("dim1", "0")}]}""") == all)
    assert(mAo(s"""{"type": "or", "fields": [${sel("dim1", "0")}, ${sel("dim1", "0")}]}""") == all)
    assert(mAo(s"""{"type": "or", "fields": [${sel("dim0", "1")}, ${sel("dim0", "x")}]}""") == Seq("1"))
    assert(mAo(s"""{"type": "or", "fields": [${sel("dim0", "x")}, ${sel("dim0", "1")}]}""") == Seq("1"))
    assert(mAo(s"""{"type": "or", "fields": [${sel("dim0", "x")}, ${sel("dim0", "y")}]}""") == Seq())
    assert(mAo(s"""{"type": "or", "fields": [${sel("dim0", "1")},
        {"type": "true"}, ${sel("dim0", "x")}]}""") == all)
  }
}
