package graft

import org.apache.spark.sql.DataFrame
import graft.operators.NativeQuery

/** The segment-filter behavioral fixtures (reference:
  * processing/.../segment/filter/BaseFilterTest.java:140-176): six rows
  * with an empty-string dim1, an MV dim2 carrying an empty cell / an
  * empty-STRING element / a null cell, a partially-null string timeDim,
  * and nullable d0/f0/l0 numerics — plus the shared virtual-column set
  * (expression identities, constants, and the allow/deny mv-filtered
  * pairs). The per-suite specs (SelectorFilterTest, InFilterTest,
  * BoundFilterTest, ...) all assert which `dim0` keys a filter matches. */
object FilterFixtures {

  /** BaseFilterTest.DEFAULT_ROWS as an inline JSON datasource. */
  val DefaultRowsJson: String = """{"type": "inline",
    "columnNames": ["dim0", "dim1", "dim2", "timeDim", "d0", "f0", "l0"],
    "columnTypes": ["STRING", "STRING", "ARRAY<STRING>", "STRING",
                    "DOUBLE", "FLOAT", "LONG"],
    "rows": [
      ["0", "",      ["a", "b"], "2017-07-25", 0.0,      0.0,    0],
      ["1", "10",    [],         "2017-07-25", 10.1,     10.1,   100],
      ["2", "2",     [""],       "2017-05-25", null,     5.5,    40],
      ["3", "1",     ["a"],      "2020-01-25", 120.0245, 110.0,  null],
      ["4", "abdef", ["c"],      null,         60.0,     null,   9001],
      ["5", "abc",   null,       "2020-01-25", 765.432,  123.45, 12345]]}"""

  /** BaseFilterTest.VIRTUAL_COLUMNS verbatim. */
  val VirtualColumnsJson: String = """[
    {"type": "expression", "name": "expr", "expression": "1.0 + 0.1", "outputType": "FLOAT"},
    {"type": "expression", "name": "exprDouble", "expression": "1.0 + 1.1", "outputType": "DOUBLE"},
    {"type": "expression", "name": "exprLong", "expression": "1 + 2", "outputType": "LONG"},
    {"type": "expression", "name": "vdim0", "expression": "dim0", "outputType": "STRING"},
    {"type": "expression", "name": "vdim1", "expression": "dim1", "outputType": "STRING"},
    {"type": "expression", "name": "vd0", "expression": "d0", "outputType": "DOUBLE"},
    {"type": "expression", "name": "vf0", "expression": "f0", "outputType": "FLOAT"},
    {"type": "expression", "name": "vl0", "expression": "l0", "outputType": "LONG"},
    {"type": "mv-filtered", "name": "allow-dim0", "delegate": "dim0",
     "values": ["3", "4"], "isAllowList": true},
    {"type": "mv-filtered", "name": "deny-dim0", "delegate": "dim0",
     "values": ["3", "4"], "isAllowList": false},
    {"type": "mv-filtered", "name": "allow-dim2", "delegate": "dim2",
     "values": ["a"], "isAllowList": true},
    {"type": "mv-filtered", "name": "deny-dim2", "delegate": "dim2",
     "values": ["a"], "isAllowList": false}]"""

  /** InFilterTest.ROWS (letter-keyed variant of the default fixture). */
  val InRowsJson: String = """{"type": "inline",
    "columnNames": ["dim0", "dim1", "dim2"],
    "columnTypes": ["STRING", "STRING", "ARRAY<STRING>"],
    "rows": [
      ["a", "",    ["a", "b"]],
      ["b", "10",  []],
      ["c", "2",   [""]],
      ["d", "1",   ["a"]],
      ["e", "def", ["c"]],
      ["f", "abc", null]]}"""

  /** Which dim0 keys does `filterJson` match over `ds`? */
  def matches(spark: org.apache.spark.sql.SparkSession, ds: String,
      filterJson: String, withVcs: Boolean = true): Seq[String] = {
    val vcs = if (withVcs) s""""virtualColumns": $VirtualColumnsJson,""" else ""
    NativeQuery.run(spark, s"""{
        "queryType": "scan",
        "dataSource": $ds,
        "timeColumn": "dim0",
        $vcs
        "filter": $filterJson,
        "columns": ["dim0"]
      }""", _ => spark.emptyDataFrame)
      .collect().map(_.getString(0)).sorted.toSeq
  }
}
