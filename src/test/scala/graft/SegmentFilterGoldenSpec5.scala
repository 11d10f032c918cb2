package graft

import FilterFixtures.matches

/** Segment-filter behavioral goldens, tranche E — ExpressionFilterTest.java:
  * math-expr expressions AS filters (truthiness of the evaluated value),
  * with Druid's string↔number comparison coercion, per-element auto-apply
  * over multi-value identifiers, cross-column comparisons, constants, and
  * missing identifiers. testGetRequiredColumn / testEqualsContract /
  * testRequiredColumnRewrite are AST internals with no analog.
  */
class SegmentFilterGoldenSpec5 extends SparkSpecBase {

  private val RowsJson: String = """{"type": "inline",
    "columnNames": ["dim0", "dim1", "dim2", "dim3", "dim4"],
    "columnTypes": ["STRING", "LONG", "FLOAT", "STRING", "ARRAY<STRING>"],
    "rows": [
      ["0", 0, 0.0, "",      ["1", "2"]],
      ["1", 1, 1.0, "10",    []],
      ["2", 2, 2.0, "2",     [""]],
      ["3", 3, 3.0, "1",     ["3"]],
      ["4", 4, 4.0, "1",     ["4", "5"]],
      ["5", 5, 5.0, "5",     ["4", "5"]],
      ["6", 6, 6.0, "1",     null],
      ["7", 7, 7.0, "a",     null],
      ["8", 8, 8.0, "8",     null],
      ["9", 9, 9.0, "1.234", ["1.234"]]]}"""

  private def m(expr: String): Seq[String] =
    matches(spark, RowsJson,
      s"""{"type": "expression", "expression": ${
        org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(org.json4s.JString(expr)))}}""",
      withVcs = false)

  test("testOneSingleValuedStringColumn (ExpressionFilterTest.java): string " +
      "equality, numeric coercion of string values, string and numeric " +
      "ordering, like()") {
    assert(m("dim3 == ''") == Seq("0"))
    assert(m("dim3 == '1'") == Seq("3", "4", "6"))
    assert(m("dim3 == 'a'") == Seq("7"))
    assert(m("dim3 == 1") == Seq("3", "4", "6"))
    assert(m("dim3 == 1.0") == Seq("3", "4", "6"))
    assert(m("dim3 == 1.234") == Seq("9"))
    assert(m("dim3 < '2'") == Seq("0", "1", "3", "4", "6", "9"))
    assert(m("dim3 < 2") == Seq("3", "4", "6", "9"))
    assert(m("dim3 < 2.0") == Seq("3", "4", "6", "9"))
    assert(m("like(dim3, '1%')") == Seq("1", "3", "4", "6", "9"))
  }

  test("testOneMultiValuedStringColumn (ExpressionFilterTest.java): " +
      "per-element auto-apply of scalar predicates over the MV column, " +
      "plus whole-array functions") {
    assert(m("dim4 == ''") == Seq("2"))
    assert(m("dim4 == null") == Seq())
    assert(m("dim4 == '1'") == Seq("0"))
    assert(m("dim4 == '3'") == Seq("3"))
    assert(m("dim4 == '4'") == Seq("4", "5"))
    assert(m("concat(dim4, dim4) == '33'") == Seq("3"))
    assert(m("like(dim4, '4%')") == Seq("4", "5"))
    assert(m("array_contains(dim4, '5')") == Seq("4", "5"))
    assert(m("array_to_string(dim4, ':') == '4:5'") == Seq("4", "5"))
  }

  test("testSingleAndMultiValuedStringColumn (ExpressionFilterTest.java): " +
      "array_contains with a COLUMN needle") {
    assert(m("array_contains(dim4, dim3)") == Seq("5", "9"))
  }

  test("testOneLongColumn / testOneFloatColumn (ExpressionFilterTest.java): " +
      "numeric columns against string and numeric literals") {
    for (c <- Seq("dim1", "dim2")) {
      assert(m(s"$c == ''") == Seq(), c)
      assert(m(s"$c == '1'") == Seq("1"), c)
      assert(m(s"$c == 2") == Seq("2"), c)
      assert(m(s"$c < '2'") == Seq("0", "1"), c)
      assert(m(s"$c < 2") == Seq("0", "1"), c)
      assert(m(s"$c < 2.0") == Seq("0", "1"), c)
      assert(m(s"like($c, '1%')") == Seq("1"), c)
    }
  }

  test("testConstantExpression (ExpressionFilterTest.java): constants are " +
      "truthy filters — 2 and 'true' match everything, 0 and 'false' " +
      "nothing") {
    val all = Seq("0", "1", "2", "3", "4", "5", "6", "7", "8", "9")
    assert(m("1 + 1") == all)
    assert(m("'true'") == all)
    assert(m("0 + 0") == Seq())
    assert(m("'false'") == Seq())
  }

  test("testCompareColumns (ExpressionFilterTest.java): cross-column " +
      "equality with numeric coercion, and a scalar-vs-MV comparison") {
    assert(m("dim0 == dim3") == Seq("2", "5", "8"))
    assert(m("dim1 == dim3") == Seq("2", "5", "8"))
    assert(m("dim2 == dim3") == Seq("2", "5", "8"))
    assert(m("dim0 == dim4") == Seq("3", "4", "5"))
  }

  test("testMissingColumn (ExpressionFilterTest.java): unknown identifiers " +
      "evaluate as null — nothing matches in SQL-compatible mode") {
    assert(m("missing == ''") == Seq())
    assert(m("missing == otherMissing") == Seq())
    assert(m("missing < '2'") == Seq())
    assert(m("missing < 2") == Seq())
    assert(m("missing < 2.0") == Seq())
  }
}
