package graft

import FilterFixtures.{DefaultRowsJson, InRowsJson, matches}

/** Segment-filter behavioral goldens, tranche A (reference:
  * processing/.../segment/filter/SelectorFilterTest.java and
  * InFilterTest.java over the [[FilterFixtures]] rows): selector and IN
  * matching across empty strings vs nulls, multi-value per-element
  * matching with empty-cell-as-null, missing columns, virtual columns
  * (expression identities and the allow/deny mv-filtered pairs), lookup
  * extraction fns with replace-missing, and nullable numeric columns.
  * SQL-compatible null handling (the reference's non-replaceWithDefault
  * branches). The reference's `optimize()` object-identity assertions and
  * `test_equals` EqualsVerifier checks are Java-AST internals with no
  * analog; the BEHAVIOR the optimized forms must preserve is asserted by
  * the match lists themselves.
  */
class SegmentFilterGoldenSpec extends SparkSpecBase {

  private def m(filterJson: String): Seq[String] =
    matches(spark, DefaultRowsJson, filterJson)

  private def mIn(filterJson: String): Seq[String] =
    matches(spark, InRowsJson, filterJson, withVcs = false)

  private def sel(dim: String, v: String): String = {
    val vv = if (v == null) "null" else s""""$v""""
    s"""{"type": "selector", "dimension": "$dim", "value": $vv}"""
  }

  private def in(dim: String, vs: Any*): String = {
    val lst = vs.map { case null => "null"; case s => s""""$s"""" }.mkString(", ")
    s"""{"type": "in", "dimension": "$dim", "values": [$lst]}"""
  }

  // ------------------------------------------------ SelectorFilterTest

  test("testSingleValueStringColumnWithoutNulls (SelectorFilterTest.java): " +
      "null and '' match nothing on a dense string column") {
    assert(m(sel("dim0", null)) == Seq())
    assert(m(sel("dim0", "")) == Seq())
    assert(m(sel("dim0", "0")) == Seq("0"))
    assert(m(sel("dim0", "1")) == Seq("1"))
  }

  test("testSingleValueVirtualStringColumnWithoutNulls (SelectorFilterTest" +
      ".java): the identity virtual column matches like the raw column") {
    assert(m(sel("vdim0", null)) == Seq())
    assert(m(sel("vdim0", "")) == Seq())
    assert(m(sel("vdim0", "0")) == Seq("0"))
    assert(m(sel("vdim0", "1")) == Seq("1"))
  }

  test("testListFilteredVirtualColumn (SelectorFilterTest.java): selectors " +
      "over the allow/deny mv-filtered virtual columns — scalar and MV " +
      "delegates") {
    assert(m(sel("allow-dim0", "1")) == Seq())
    assert(m(sel("allow-dim0", "4")) == Seq("4"))
    assert(m(sel("deny-dim0", "0")) == Seq("0"))
    assert(m(sel("deny-dim0", "4")) == Seq())
    assert(m(sel("allow-dim2", "b")) == Seq())
    assert(m(sel("allow-dim2", "a")) == Seq("0", "3"))
    assert(m(sel("deny-dim2", "b")) == Seq("0"))
    assert(m(sel("deny-dim2", "a")) == Seq())
  }

  test("testSingleValueStringColumnWithNulls (SelectorFilterTest.java): '' " +
      "is a real value distinct from null in SQL-compatible mode") {
    assert(m(sel("dim1", null)) == Seq())
    assert(m(sel("dim1", "")) == Seq("0"))
    assert(m(sel("dim1", "10")) == Seq("1"))
    assert(m(sel("dim1", "2")) == Seq("2"))
    assert(m(sel("dim1", "1")) == Seq("3"))
    assert(m(sel("dim1", "abdef")) == Seq("4"))
    assert(m(sel("dim1", "abc")) == Seq("5"))
    assert(m(sel("dim1", "ab")) == Seq())
  }

  test("testSingleValueVirtualStringColumnWithNulls (SelectorFilterTest" +
      ".java): same through the vdim1 identity virtual column") {
    assert(m(sel("vdim1", null)) == Seq())
    assert(m(sel("vdim1", "")) == Seq("0"))
    assert(m(sel("vdim1", "10")) == Seq("1"))
    assert(m(sel("vdim1", "abc")) == Seq("5"))
    assert(m(sel("vdim1", "ab")) == Seq())
  }

  test("testMultiValueStringColumn (SelectorFilterTest.java): per-element " +
      "matching; the EMPTY cell and the null cell match null, the ['']" +
      "cell matches ''") {
    assert(m(sel("dim2", null)) == Seq("1", "5"))
    assert(m(sel("dim2", "")) == Seq("2"))
    assert(m(sel("dim2", "a")) == Seq("0", "3"))
    assert(m(sel("dim2", "b")) == Seq("0"))
    assert(m(sel("dim2", "c")) == Seq("4"))
    assert(m(sel("dim2", "d")) == Seq())
  }

  test("testMissingColumnSpecifiedInDimensionList / testMissingColumnNot" +
      "SpecifiedInDimensionList (SelectorFilterTest.java): a nonexistent " +
      "column matches null on every row and nothing else") {
    for (d <- Seq("dim3", "dim4")) {
      assert(m(sel(d, null)) == Seq("0", "1", "2", "3", "4", "5"))
      assert(m(sel(d, "")) == Seq())
      assert(m(sel(d, "a")) == Seq())
      assert(m(sel(d, "b")) == Seq())
      assert(m(sel(d, "c")) == Seq())
    }
  }

  test("testExpressionVirtualColumn (SelectorFilterTest.java): a constant " +
      "FLOAT expression matches its own rendering on every row") {
    assert(m(sel("expr", "1.1")) == Seq("0", "1", "2", "3", "4", "5"))
    assert(m(sel("expr", "1.2")) == Seq())
  }

  test("testSelectorWithLookupExtractionFn (SelectorFilterTest.java): a " +
      "replace-missing lookup under the selector — including the MV " +
      "column's per-element extraction and the empty cell extracting " +
      "from null") {
    val fn = """{"type": "lookup", "lookup": {"type": "map", "map":
      {"1": "HELLO", "a": "HELLO", "abdef": "HELLO", "abc": "UNKNOWN"}},
      "retainMissingValue": false, "replaceMissingValueWith": "UNKNOWN",
      "optimize": true}"""
    def selFn(dim: String, v: String): String =
      s"""{"type": "selector", "dimension": "$dim", "value": "$v",
           "extractionFn": $fn}"""
    assert(m(selFn("dim0", "HELLO")) == Seq("1"))
    assert(m(selFn("dim0", "UNKNOWN")) == Seq("0", "2", "3", "4", "5"))
    assert(m(selFn("dim1", "HELLO")) == Seq("3", "4"))
    assert(m(selFn("dim1", "UNKNOWN")) == Seq("0", "1", "2", "5"))
    assert(m(selFn("dim2", "HELLO")) == Seq("0", "3"))
    assert(m(selFn("dim2", "UNKNOWN")) == Seq("0", "1", "2", "4", "5"))
    assert(m(selFn("dim3", "HELLO")) == Seq())
    assert(m(selFn("dim3", "UNKNOWN")) == Seq("0", "1", "2", "3", "4", "5"))
    assert(m(selFn("dim4", "HELLO")) == Seq())
    assert(m(selFn("dim4", "UNKNOWN")) == Seq("0", "1", "2", "3", "4", "5"))
  }

  test("testNumericColumnNullsAndDefaults / testVirtualNumericColumnNulls" +
      "AndDefaults (SelectorFilterTest.java): nullable numerics match " +
      "their null rows in SQL-compatible mode, raw and virtual") {
    for ((f0, d0, l0) <- Seq(("f0", "d0", "l0"), ("vf0", "vd0", "vl0"))) {
      assert(m(sel(f0, "0")) == Seq("0"), f0)
      assert(m(sel(d0, "0")) == Seq("0"), d0)
      assert(m(sel(l0, "0")) == Seq("0"), l0)
      assert(m(sel(f0, null)) == Seq("4"), f0)
      assert(m(sel(d0, null)) == Seq("2"), d0)
      assert(m(sel(l0, null)) == Seq("3"), l0)
    }
  }

  test("testWithTimeExtractionFnNull (SelectorFilterTest.java): a time " +
      "extraction over the partially-null timeDim — null matches the " +
      "null-date row, a month value matches its days") {
    val fn = """{"type": "time", "timeFormat": "yyyy-MM-dd",
                 "resultFormat": "yyyy-MM"}"""
    def selFn(v: String): String = {
      val vv = if (v == null) "null" else s""""$v""""
      s"""{"type": "selector", "dimension": "timeDim", "value": $vv,
           "extractionFn": $fn}"""
    }
    assert(m(selFn(null)) == Seq("4"))
    assert(m(selFn("2017-07")) == Seq("0", "1"))
    assert(m(selFn("2017-05")) == Seq("2"))
    assert(m(selFn("2020-01")) == Seq("3", "5"))
  }

  // ------------------------------------------------ InFilterTest

  test("testSingleValueStringColumnWithoutNulls (InFilterTest.java): empty " +
      "lists, null-only lists and ''-only lists over the dense column") {
    assert(mIn(in("dim0")) == Seq())
    assert(mIn(in("dim0", null)) == Seq())
    assert(mIn(in("dim0", "", "")) == Seq())
    assert(mIn(in("dim0", "a", "c")) == Seq("a", "c"))
    assert(mIn(in("dim0", "e", "x")) == Seq("e"))
  }

  test("testSingleValueStringColumnWithNulls (InFilterTest.java): IN " +
      "treats null and '' as distinct members in SQL-compatible mode") {
    assert(mIn(in("dim1", null, "")) == Seq("a"))
    assert(mIn(in("dim1", "")) == Seq("a"))
    assert(mIn(in("dim1", null, "10", "abc")) == Seq("b", "f"))
    assert(mIn(in("dim1", "-1", "ab", "de")) == Seq())
  }

  test("testMultiValueStringColumn (InFilterTest.java): IN over the MV " +
      "column — the EMPTY cell and the null cell are null members, the " +
      "[''] cell is an '' member") {
    assert(mIn(in("dim2", null)) == Seq("b", "f"))
    assert(mIn(in("dim2", null, "a")) == Seq("a", "b", "d", "f"))
    assert(mIn(in("dim2", null, "b")) == Seq("a", "b", "f"))
    assert(mIn(in("dim2", "")) == Seq("c"))
    assert(mIn(in("dim2", "", null)) == Seq("b", "c", "f"))
    assert(mIn(in("dim2", "c")) == Seq("e"))
    assert(mIn(in("dim2", "d")) == Seq())
  }

  test("testMissingColumn (InFilterTest.java): IN on a nonexistent column " +
      "matches every row iff the list contains null") {
    assert(mIn(in("dim3", null, null)) == Seq("a", "b", "c", "d", "e", "f"))
    assert(mIn(in("dim3", "")) == Seq())
    assert(mIn(in("dim3", null, "a")) == Seq("a", "b", "c", "d", "e", "f"))
    assert(mIn(in("dim3", "a")) == Seq())
    assert(mIn(in("dim3", "b")) == Seq())
    assert(mIn(in("dim3", "c")) == Seq())
  }

  test("testMatchWithExtractionFn (InFilterTest.java): IN under lookup and " +
      "substring extractions, including null-producing legs") {
    val lookupFn = """{"type": "lookup", "lookup": {"type": "map", "map":
      {"a": "HELLO", "10": "HELLO", "def": "HELLO"}},
      "retainMissingValue": false, "replaceMissingValueWith": "UNKNOWN",
      "optimize": false}"""
    assert(mIn(s"""{"type": "in", "dimension": "dim0",
        "values": ["HELLO"], "extractionFn": $lookupFn}""") == Seq("a"))
    assert(mIn(s"""{"type": "in", "dimension": "dim0",
        "values": ["UNKNOWN"], "extractionFn": $lookupFn}""")
      == Seq("b", "c", "d", "e", "f"))
    val substr = """{"type": "substring", "index": 0, "length": 1}"""
    assert(mIn(s"""{"type": "in", "dimension": "dim1",
        "values": ["1", "2"], "extractionFn": $substr}""")
      == Seq("b", "c", "d"))
  }
}
