package graft

import FilterFixtures.{VirtualColumnsJson, matches}

/** Segment-filter behavioral goldens, tranche B — BoundFilterTest.java over
  * the BaseFilterTest rows plus its two extra rows ("6" with dim1=-1000,
  * "7" with dim1=-10.012 and null d0/l0): the lexicographic / alphanumeric
  * / numeric bound families across strictness combinations, missing
  * columns, multi-value cells, virtual columns (constant expression and the
  * allow/deny mv-filtered pairs), extraction fns (the reference's
  * javascript 'super-'+str and make-null fns as stringFormat /
  * never-matching-regex equivalents), and the nullable-numerics rows.
  * SQL-compatible null handling: a NULL value matches a bound exactly when
  * it has NO lower limit. testRequiredColumnRewrite and the test_equals
  * pair are planner/AST internals with no analog (the rewrite's BEHAVIOR is
  * the match lists themselves).
  */
class SegmentFilterGoldenSpec2 extends SparkSpecBase {

  /** BoundFilterTest.ROWS = DEFAULT_ROWS + rows 6 and 7. */
  private val BoundRowsJson: String = """{"type": "inline",
    "columnNames": ["dim0", "dim1", "dim2", "timeDim", "d0", "f0", "l0"],
    "columnTypes": ["STRING", "STRING", "ARRAY<STRING>", "STRING",
                    "DOUBLE", "FLOAT", "LONG"],
    "rows": [
      ["0", "",      ["a", "b"], "2017-07-25", 0.0,      0.0,    0],
      ["1", "10",    [],         "2017-07-25", 10.1,     10.1,   100],
      ["2", "2",     [""],       "2017-05-25", null,     5.5,    40],
      ["3", "1",     ["a"],      "2020-01-25", 120.0245, 110.0,  null],
      ["4", "abdef", ["c"],      null,         60.0,     null,   9001],
      ["5", "abc",   null,       "2020-01-25", 765.432,  123.45, 12345],
      ["6", "-1000", ["a"],      null,         6.6,      null,   10],
      ["7", "-10.012", ["d"],    null,         null,     3.0,    null]]}"""

  private def m(filterJson: String): Seq[String] =
    matches(spark, BoundRowsJson, filterJson)

  private def bound(dim: String, lower: String, upper: String,
      lowerStrict: Boolean = false, upperStrict: Boolean = false,
      ordering: String = "lexicographic", extractionFn: String = null): String = {
    val lo = if (lower == null) "" else s""""lower": "$lower","""
    val up = if (upper == null) "" else s""""upper": "$upper","""
    val fn = if (extractionFn == null) "" else s""""extractionFn": $extractionFn,"""
    s"""{"type": "bound", "dimension": "$dim", $lo $up $fn
        "lowerStrict": $lowerStrict, "upperStrict": $upperStrict,
        "ordering": "$ordering"}"""
  }

  private val All = Seq("0", "1", "2", "3", "4", "5", "6", "7")

  test("testLexicographicMatchEverything (BoundFilterTest.java): [null, z] " +
      "covers every value INCLUDING nulls (no lower limit) across raw, " +
      "virtual, MV and missing columns") {
    for (d <- Seq("dim0", "vdim0", "dim1", "vdim1", "dim2", "dim3")) {
      assert(m(bound(d, null, "z")) == All, d)
    }
  }

  test("testLexicographicMatchWithEmptyString (BoundFilterTest.java): " +
      "lower '' excludes nulls but keeps '' and everything above") {
    assert(m(bound("dim0", "", "z")) == All)
    assert(m(bound("dim1", "", "z")) == All)
    assert(m(bound("dim2", "", "z")) == Seq("0", "2", "3", "4", "6", "7"))
    assert(m(bound("dim3", "", "z")) == Seq())
  }

  test("testLexicographicMatchNull (BoundFilterTest.java): ['', ''] matches " +
      "exactly the empty-string values — nulls and empty MV cells excluded") {
    assert(m(bound("dim0", "", "")) == Seq())
    assert(m(bound("dim1", "", "")) == Seq("0"))
    assert(m(bound("dim2", "", "")) == Seq("2"))
  }

  test("testLexicographicMatchMissingColumn (BoundFilterTest.java): the " +
      "null rows of an absent column match exactly when the bound has no " +
      "lower limit") {
    assert(m(bound("dim3", "", "")) == Seq())
    assert(m(bound("dim3", "", null, upperStrict = true)) == Seq())
    assert(m(bound("dim3", null, "", upperStrict = true)) == All)
    assert(m(bound("dim3", "", "", lowerStrict = true)) == Seq())
    assert(m(bound("dim3", "", "", upperStrict = true)) == Seq())
    assert(m(bound("dim3", null, "")) == All)
  }

  test("testLexicographicMatchTooStrict / ExactlySingleValue / Surrounding" +
      "SingleValue / NoUpperLimit / NoLowerLimit / MatchNumbers (BoundFilter" +
      "Test.java): the strictness and limit grid over dim1") {
    assert(m(bound("dim1", "abc", "abc", lowerStrict = true)) == Seq())
    assert(m(bound("dim1", "abc", "abc", lowerStrict = true, upperStrict = true)) == Seq())
    assert(m(bound("dim1", "abc", "abc", upperStrict = true)) == Seq())
    assert(m(bound("dim1", "abc", "abc")) == Seq("5"))
    assert(m(bound("dim1", "ab", "abd", lowerStrict = true, upperStrict = true)) == Seq("5"))
    assert(m(bound("dim1", "ab", null, lowerStrict = true, upperStrict = true)) == Seq("4", "5"))
    assert(m(bound("dim1", null, "abd", lowerStrict = true, upperStrict = true))
      == Seq("0", "1", "2", "3", "5", "6", "7"))
    assert(m(bound("dim1", "1", "3")) == Seq("1", "2", "3"))
    assert(m(bound("dim1", "1", "3", lowerStrict = true, upperStrict = true)) == Seq("1", "2"))
    assert(m(bound("dim1", "-1", "3", lowerStrict = true, upperStrict = true))
      == Seq("1", "2", "3", "6", "7"))
  }

  test("testAlphaNumericMatchNull / TooStrict / ExactlySingleValue / " +
      "SurroundingSingleValue / NoUpperLimit / NoLowerLimit / WithNegatives " +
      "(BoundFilterTest.java): the alphanumeric comparator grid") {
    assert(m(bound("dim0", "", "", ordering = "alphanumeric")) == Seq())
    assert(m(bound("dim1", "", "", ordering = "alphanumeric")) == Seq("0"))
    assert(m(bound("dim2", "", "", ordering = "alphanumeric")) == Seq("2"))
    assert(m(bound("dim3", "", "", ordering = "alphanumeric")) == Seq())
    assert(m(bound("dim1", "2", "2", lowerStrict = true, ordering = "alphanumeric")) == Seq())
    assert(m(bound("dim1", "2", "2", lowerStrict = true, upperStrict = true,
      ordering = "alphanumeric")) == Seq())
    assert(m(bound("dim1", "2", "2", upperStrict = true, ordering = "alphanumeric")) == Seq())
    assert(m(bound("dim1", "2", "2", ordering = "alphanumeric")) == Seq("2"))
    assert(m(bound("dim1", "1", "3", lowerStrict = true, upperStrict = true,
      ordering = "alphanumeric")) == Seq("2"))
    assert(m(bound("dim1", "1", null, lowerStrict = true, upperStrict = true,
      ordering = "alphanumeric")) == Seq("1", "2", "4", "5", "6", "7"))
    assert(m(bound("dim1", "-1", null, lowerStrict = true, upperStrict = true,
      ordering = "alphanumeric")) == Seq("4", "5", "6", "7"))
    assert(m(bound("dim1", null, "2", lowerStrict = true, upperStrict = true,
      ordering = "alphanumeric")) == Seq("0", "3"))
    assert(m(bound("dim1", null, "ZZZZZ", lowerStrict = true, upperStrict = true,
      ordering = "alphanumeric")) == All)
    assert(m(bound("dim1", "-2000", "3", lowerStrict = true, upperStrict = true,
      ordering = "alphanumeric")) == Seq())
    assert(m(bound("dim1", "3", "-2000", lowerStrict = true, upperStrict = true,
      ordering = "alphanumeric")) == Seq("1", "6", "7"))
  }

  test("testNumericMatchNull / TooStrict / ExactlySingleValue / Surrounding" +
      "SingleValue / NoUpperLimit / NoLowerLimit / WithNegatives (Bound" +
      "FilterTest.java): the numeric comparator grid incl. decimals and " +
      "negatives") {
    assert(m(bound("dim0", "", "", ordering = "numeric")) == Seq())
    assert(m(bound("dim1", "", "", ordering = "numeric")) == Seq("0"))
    assert(m(bound("dim2", "", "", ordering = "numeric")) == Seq("2"))
    assert(m(bound("dim3", "", "", ordering = "numeric")) == Seq())
    assert(m(bound("dim1", "2", "2", lowerStrict = true, ordering = "numeric")) == Seq())
    assert(m(bound("dim1", "2", "2", upperStrict = true, ordering = "numeric")) == Seq())
    assert(m(bound("dim1", "2", "2", ordering = "numeric")) == Seq("2"))
    assert(m(bound("dim1", "-10.012", "-10.012", ordering = "numeric")) == Seq("7"))
    assert(m(bound("dim1", "1", "3", lowerStrict = true, upperStrict = true,
      ordering = "numeric")) == Seq("2"))
    assert(m(bound("dim1", "-11", "-10", ordering = "numeric")) == Seq("7"))
    assert(m(bound("dim1", "1", null, lowerStrict = true, upperStrict = true,
      ordering = "numeric")) == Seq("1", "2"))
    assert(m(bound("dim1", null, "2", lowerStrict = true, upperStrict = true,
      ordering = "numeric")) == Seq("0", "3", "4", "5", "6", "7"))
    assert(m(bound("dim1", "-2000", "3", lowerStrict = true, upperStrict = true,
      ordering = "numeric")) == Seq("2", "3", "6", "7"))
  }

  test("testNumericMatchVirtualColumn (BoundFilterTest.java): the constant " +
      "FLOAT expression sits inside [1,2] and outside [2,3]") {
    assert(m(bound("expr", "1", "2", ordering = "numeric")) == All)
    assert(m(bound("expr", "2", "3", ordering = "numeric")) == Seq())
  }

  test("testListFilteredVirtualColumn (BoundFilterTest.java): bounds over " +
      "the allow/deny mv-filtered virtual columns") {
    assert(m(bound("allow-dim0", "0", "2")) == Seq())
    assert(m(bound("allow-dim0", "0", "6")) == Seq("3", "4"))
    assert(m(bound("deny-dim0", "0", "6")) == Seq("0", "1", "2", "5", "6"))
    assert(m(bound("deny-dim0", "3", "4")) == Seq())
    assert(m(bound("allow-dim2", "a", "c")) == Seq("0", "3", "6"))
    assert(m(bound("allow-dim2", "c", "z")) == Seq())
    assert(m(bound("deny-dim2", "a", "b", upperStrict = true)) == Seq())
    assert(m(bound("deny-dim2", "c", "z")) == Seq("4", "7"))
  }

  test("testMatchWithExtractionFn (BoundFilterTest.java): the 'super-' " +
      "prefix fn (null renders 'super-null') and a null-producing fn — " +
      "stringFormat / never-matching-regex adaptations of the javascript " +
      "originals") {
    val superFn = """{"type": "stringFormat", "format": "super-%s"}"""
    val nullFn = """{"type": "regex", "expr": "^(xyzzy)$",
      "replaceMissingValue": true}"""
    assert(m(bound("dim0", "", "", extractionFn = nullFn)) == Seq())
    assert(m(bound("dim1", "super-ab", "super-abd", lowerStrict = true,
      upperStrict = true, extractionFn = superFn)) == Seq("5"))
    assert(m(bound("dim1", "super-0", "super-10", ordering = "alphanumeric",
      extractionFn = superFn)) == Seq("1", "2", "3"))
    assert(m(bound("dim2", "super-", "super-zzzzzz", extractionFn = superFn)) == All)
    assert(m(bound("dim2", "super-null", "super-null", extractionFn = superFn))
      == Seq("1", "5"))
    assert(m(bound("dim2", "super-", "super-", ordering = "numeric",
      extractionFn = superFn)) == Seq("2"))
    assert(m(bound("dim3", "super-null", "super-null", extractionFn = superFn)) == All)
    assert(m(bound("dim4", "super-null", "super-null", ordering = "numeric",
      extractionFn = superFn)) == All)
  }

  test("testNumericNullsAndZeros / testVirtualNumericNullsAndZeros (Bound" +
      "FilterTest.java): [0, 1] over the nullable numerics keeps only the " +
      "true zeros in SQL-compatible mode, raw and virtual") {
    for ((d0, f0, l0) <- Seq(("d0", "f0", "l0"), ("vd0", "vf0", "vl0"))) {
      assert(m(bound(d0, "0.0", "1.0", ordering = "numeric")) == Seq("0"), d0)
      assert(m(bound(f0, "0.0", "1.0", ordering = "numeric")) == Seq("0"), f0)
      assert(m(bound(l0, "0.0", "1.0", ordering = "numeric")) == Seq("0"), l0)
    }
  }

  test("testNumericNulls (BoundFilterTest.java): lower bounds over the " +
      "nullable numerics skip the null rows — float32 values compare " +
      "through their rendered forms") {
    assert(m(bound("f0", "1.0", null, ordering = "numeric"))
      == Seq("1", "2", "3", "5", "7"))
    assert(m(bound("d0", "1", null, ordering = "numeric"))
      == Seq("1", "3", "4", "5", "6"))
    assert(m(bound("l0", "1", null, ordering = "numeric"))
      == Seq("1", "2", "4", "5", "6"))
  }
}
