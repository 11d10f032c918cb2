package graft

import FilterFixtures.{DefaultRowsJson, matches}

/** Segment-filter behavioral goldens, tranche C — LikeFilterTest.java (its
  * own 7-row fixture: exact/prefix/wildcard/underscore matching, custom
  * escape characters incl. an escape escaping itself, newlines inside
  * values, extraction fns), RegexFilterTest.java and
  * SearchQueryFilterTest.java over the default rows (null vs '' matching
  * under '.*' and contains(''), MV per-element matching, missing columns,
  * null-rewriting extraction fns), and ColumnComparisonFilterTest.java
  * (its own 10-row fixture: value-SET overlap across scalar/MV/missing
  * dimensions with string-form numeric coercion and null==null).
  * test_equals / testEqualsContract / testRequiredColumnRewrite are Java
  * AST internals with no analog. The reference's javascript
  * null→NOT_NULL_ANYMORE fn is adapted as a NULLSTRING stringFormat
  * (null renders 'null') with the regex/search matching that rendering.
  */
class SegmentFilterGoldenSpec3 extends SparkSpecBase {

  private val LikeRowsJson: String = """{"type": "inline",
    "columnNames": ["dim0", "dim1"],
    "columnTypes": ["STRING", "STRING"],
    "rows": [
      ["0", ""], ["1", "foo"], ["2", "foobar"], ["3", "bar"],
      ["4", "foobarbaz"], ["5", "foo%bar"], ["6", "new\nline"]]}"""

  private val CcRowsJson: String = """{"type": "inline",
    "columnNames": ["dim0", "dim1", "dim2"],
    "columnTypes": ["STRING", "STRING", "ARRAY<STRING>"],
    "rows": [
      ["0", "",      ["1", "2"]],
      ["1", "10",    []],
      ["2", "2",     [""]],
      ["3", "1",     ["3"]],
      ["4", "1",     ["4", "5"]],
      ["5", "5",     ["4", "5"]],
      ["6", "1",     null],
      ["7", "a",     null],
      ["8", "8",     null],
      ["9", "1.234", ["1.234"]]]}"""

  private def mLike(filterJson: String): Seq[String] =
    matches(spark, LikeRowsJson, filterJson, withVcs = false)
  private def mDef(filterJson: String): Seq[String] =
    matches(spark, DefaultRowsJson, filterJson)
  private def mCc(filterJson: String): Seq[String] =
    matches(spark, CcRowsJson, filterJson, withVcs = false)

  private def like(pattern: String, escape: String = null,
      extractionFn: String = null): String = {
    val esc = if (escape == null) "" else s""""escape": "$escape","""
    val fn = if (extractionFn == null) "" else s""""extractionFn": $extractionFn,"""
    s"""{"type": "like", "dimension": "dim1", $esc $fn
        "pattern": ${org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(org.json4s.JString(pattern)))}}"""
  }

  // ------------------------------------------------ LikeFilterTest

  test("testExactMatch / WithEscape / WithExtractionFn (LikeFilterTest" +
      ".java): no-wildcard patterns are equality, escapes neutralize " +
      "nothing, extractions apply first") {
    assert(mLike(like("bar")) == Seq("3"))
    assert(mLike(like("@bar", escape = "@")) == Seq("3"))
    assert(mLike(like("bar",
      extractionFn = """{"type": "substring", "index": 3, "length": 3}"""))
      == Seq("2", "4"))
  }

  test("testPrefixMatch / WithEscape / WithExtractionFn (LikeFilterTest" +
      ".java): % suffix wildcards, an ESCAPED % is a literal percent") {
    assert(mLike(like("foo%")) == Seq("1", "2", "4", "5"))
    assert(mLike(like("foo@%%", escape = "@")) == Seq("5"))
    assert(mLike(like("a%",
      extractionFn = """{"type": "substring", "index": 1}""")) == Seq("3"))
  }

  test("testWildcardMatch / WithEscape / MatchEverything / PrefixAndSuffix" +
      "Match / UnderscoreMatch (LikeFilterTest.java): the % and _ grids") {
    assert(mLike(like("%oba%")) == Seq("2", "4"))
    assert(mLike(like("%@%ba%", escape = "@")) == Seq("5"))
    assert(mLike(like("%", escape = "@")) == Seq("0", "1", "2", "3", "4", "5", "6"))
    assert(mLike(like("f%r")) == Seq("2", "5"))
    assert(mLike(like("f_o")) == Seq("1"))
  }

  test("testMatchEmptyString / WithExtractionFn (LikeFilterTest.java): '' " +
      "pattern matches only the empty value; an out-of-range substring " +
      "extraction turns everything null — nothing matches in " +
      "SQL-compatible mode") {
    assert(mLike(like("")) == Seq("0"))
    assert(mLike(like("",
      extractionFn = """{"type": "substring", "index": 100, "length": 1}"""))
      == Seq())
  }

  test("testEscapeEscapingItself (LikeFilterTest.java): escape 'o' doubles " +
      "to the literal o — 'foooo' with escape o means 'foo'") {
    assert(mLike(like("foooo", escape = "o")) == Seq("1"))
  }

  test("testNewlineMatch / WithExtractionFn (LikeFilterTest.java): % and _ " +
      "cross newline characters inside values") {
    assert(mLike(like("ne%")) == Seq("6"))
    assert(mLike(like("%ine")) == Seq("6"))
    assert(mLike(like("new_line")) == Seq("6"))
    val sub = """{"type": "substring", "index": 1, "length": 100}"""
    assert(mLike(like("e%", extractionFn = sub)) == Seq("6"))
    assert(mLike(like("%ine", extractionFn = sub)) == Seq("6"))
    assert(mLike(like("ew_line", extractionFn = sub)) == Seq("6"))
  }

  // ------------------------------------------------ RegexFilterTest

  private def regex(dim: String, pattern: String, extractionFn: String = null): String = {
    val fn = if (extractionFn == null) "" else s""""extractionFn": $extractionFn,"""
    s"""{"type": "regex", "dimension": "$dim", $fn "pattern": "$pattern"}"""
  }

  test("testSingleValueStringColumnWithoutNulls / WithNulls (RegexFilter" +
      "Test.java): '.*' matches '' but never null; find() semantics over " +
      "substrings") {
    assert(mDef(regex("dim0", ".*")) == Seq("0", "1", "2", "3", "4", "5"))
    assert(mDef(regex("dim0", "0")) == Seq("0"))
    assert(mDef(regex("dim0", "5")) == Seq("5"))
    assert(mDef(regex("dim1", ".*")) == Seq("0", "1", "2", "3", "4", "5"))
    assert(mDef(regex("dim1", "10")) == Seq("1"))
    assert(mDef(regex("dim1", "2")) == Seq("2"))
    assert(mDef(regex("dim1", "1")) == Seq("1", "3"))
    assert(mDef(regex("dim1", ".*def")) == Seq("4"))
    assert(mDef(regex("dim1", "abc")) == Seq("5"))
    assert(mDef(regex("dim1", "ab.*")) == Seq("4", "5"))
  }

  test("testMultiValueStringColumn / MissingColumns (RegexFilterTest.java): " +
      "per-element regex over MV cells; null and empty cells never match, " +
      "missing columns never match") {
    assert(mDef(regex("dim2", ".*")) == Seq("0", "2", "3", "4"))
    assert(mDef(regex("dim2", "a")) == Seq("0", "3"))
    assert(mDef(regex("dim2", "b")) == Seq("0"))
    assert(mDef(regex("dim2", "c")) == Seq("4"))
    assert(mDef(regex("dim2", "d")) == Seq())
    for (d <- Seq("dim3", "dim4"); p <- Seq("", "a", "b", "c")) {
      assert(mDef(regex(d, p)) == Seq(), s"$d/$p")
    }
  }

  test("testRegexWithExtractionFn (RegexFilterTest.java): a null-rewriting " +
      "extraction makes null rows matchable (the javascript " +
      "NOT_NULL_ANYMORE fn as the NULLSTRING stringFormat rendering)") {
    val fn = """{"type": "stringFormat", "format": "%s"}"""
    assert(mDef(regex("dim1", "^null$", fn)) == Seq())
    assert(mDef(regex("dim2", "^null$", fn)) == Seq("1", "5"))
  }

  // ------------------------------------------------ SearchQueryFilterTest

  private def search(dim: String, value: String, extractionFn: String = null): String = {
    val fn = if (extractionFn == null) "" else s""""extractionFn": $extractionFn,"""
    s"""{"type": "search", "dimension": "$dim", $fn
        "query": {"type": "contains", "value": "$value", "caseSensitive": true}}"""
  }

  test("testSingleValueStringColumnWithoutNulls / WithNulls (SearchQuery" +
      "FilterTest.java): contains('') matches every non-null value " +
      "including ''") {
    assert(mDef(search("dim0", "")) == Seq("0", "1", "2", "3", "4", "5"))
    assert(mDef(search("dim0", "0")) == Seq("0"))
    assert(mDef(search("dim0", "5")) == Seq("5"))
    assert(mDef(search("dim1", "")) == Seq("0", "1", "2", "3", "4", "5"))
    assert(mDef(search("dim1", "10")) == Seq("1"))
    assert(mDef(search("dim1", "2")) == Seq("2"))
    assert(mDef(search("dim1", "1")) == Seq("1", "3"))
    assert(mDef(search("dim1", "def")) == Seq("4"))
    assert(mDef(search("dim1", "abc")) == Seq("5"))
    assert(mDef(search("dim1", "ab")) == Seq("4", "5"))
  }

  test("testMultiValueStringColumn / MissingColumns (SearchQueryFilterTest" +
      ".java): per-element contains; null and empty cells never match") {
    assert(mDef(search("dim2", "")) == Seq("0", "2", "3", "4"))
    assert(mDef(search("dim2", "a")) == Seq("0", "3"))
    assert(mDef(search("dim2", "b")) == Seq("0"))
    assert(mDef(search("dim2", "c")) == Seq("4"))
    assert(mDef(search("dim2", "d")) == Seq())
    for (d <- Seq("dim3", "dim4"); v <- Seq("", "a", "b", "c")) {
      assert(mDef(search(d, v)) == Seq(), s"$d/$v")
    }
  }

  test("testSearchQueryWithExtractionFn (SearchQueryFilterTest.java): the " +
      "null-rewriting extraction again, through the contains spec") {
    val fn = """{"type": "stringFormat", "format": "%s"}"""
    assert(mDef(search("dim1", "null", fn)) == Seq())
    assert(mDef(search("dim2", "null", fn)) == Seq("1", "5"))
  }

  // ------------------------------------------------ ColumnComparisonFilterTest

  private def cc(dims: String*): String =
    s"""{"type": "columnComparison", "dimensions": [${
      dims.map(d => s""""$d"""").mkString(", ")}]}"""

  test("testColumnsWithoutNulls (ColumnComparisonFilterTest.java): value-" +
      "SET overlap across scalar and MV dims, numeric values through " +
      "their string forms") {
    assert(mCc(cc("dim0", "dim1")) == Seq("2", "5", "8"))
    assert(mCc(cc("dim0", "dim2")) == Seq("3", "4", "5"))
    assert(mCc(cc("dim1", "dim2")) == Seq("5", "9"))
    assert(mCc(cc("dim0", "dim1", "dim2")) == Seq("5"))
  }

  test("testMissingColumnNotSpecifiedInDimensionList (ColumnComparison" +
      "FilterTest.java): two missing columns match everywhere (null == " +
      "null); a missing column matches the MV column's null/empty cells") {
    assert(mCc(cc("dim6", "dim7"))
      == Seq("0", "1", "2", "3", "4", "5", "6", "7", "8", "9"))
    assert(mCc(cc("dim1", "dim6")) == Seq())
    assert(mCc(cc("dim2", "dim6")) == Seq("1", "6", "7", "8"))
  }

  test("testSelectorWithLookupExtractionFn (ColumnComparisonFilterTest" +
      ".java): a retain-missing lookup ('a' -> '7') applied to both sides " +
      "before the overlap") {
    val fn = """{"type": "lookup", "lookup": {"type": "map", "map": {"a": "7"}},
                 "retainMissingValue": true}"""
    val f = s"""{"type": "columnComparison", "dimensions": [
      {"type": "extraction", "dimension": "dim0", "outputName": "dim0",
       "extractionFn": $fn},
      {"type": "extraction", "dimension": "dim1", "outputName": "dim1",
       "extractionFn": $fn}]}"""
    assert(mCc(f) == Seq("2", "5", "7", "8"))
  }
}
