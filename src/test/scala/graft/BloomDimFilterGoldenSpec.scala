package graft

import java.io.ByteArrayOutputStream
import java.util.Base64
import org.apache.hive.common.util.BloomKFilter

/** BloomDimFilterTest.java goldens (extensions-core/druid-bloom-filter/
  * .../query/filter): the native `bloom` filter over the test's own rows —
  * null-in-filter matching, empty string as a value, multi-value
  * per-element tests with empty-cell-as-null, missing columns (in and out
  * of the dimension list), expression virtual columns with typed
  * (float/double/long) filter entries, time-format and lookup extraction
  * fns, and the Hive serialization-compat family (the filter bytes POSTed
  * in the JSON are produced by Hive's own BloomKFilter.serialize — Druid's
  * wire format IS the Hive layout, BloomFilterSerializersModule). Filters
  * are built with org.apache.hive.common.util.BloomKFilter directly, the
  * reference test's own construction path. SQL-compatible expected lists.
  */
class BloomDimFilterGoldenSpec extends SparkSpecBase {

  /** BloomDimFilterTest.ROWS: dim6 is only present on rows 0-2. */
  private val BloomRowsJson = """{"type": "inline",
    "columnNames": ["dim0", "dim1", "dim2", "dim6"],
    "columnTypes": ["STRING", "STRING", "ARRAY<STRING>", "STRING"],
    "rows": [
      ["0", "",    ["a", "b"], "2017-07-25"],
      ["1", "10",  [],         "2017-07-25"],
      ["2", "2",   [""],       "2017-05-25"],
      ["3", "1",   ["a"],      null],
      ["4", "def", ["c"],      null],
      ["5", "abc", null,       null]]}"""

  /** The reference test's bloomKFilter(expectedEntries, values...) helper:
    * null entries hash the NULL_HASHCODE via addBytes(null). */
  private def filterB64(values: Any*): String = {
    val f = new BloomKFilter(1000)
    values.foreach {
      case null => f.addBytes(null, 0, 0)
      case s: String => f.addString(s)
      case l: Long => f.addLong(l)
      case fl: Float => f.addFloat(fl)
      case d: Double => f.addDouble(d)
      case other => f.addString(other.toString)
    }
    val bos = new ByteArrayOutputStream()
    BloomKFilter.serialize(bos, f)
    Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  private def bloom(dim: String, extractionFn: String, values: Any*): String = {
    val ext = if (extractionFn == null) "" else s""", "extractionFn": $extractionFn"""
    s"""{"type": "bloom", "dimension": "$dim",
       |  "bloomKFilter": "${filterB64(values: _*)}"$ext}""".stripMargin
  }

  private def m(filterJson: String): Seq[String] =
    FilterFixtures.matches(spark, BloomRowsJson, filterJson, withVcs = false)

  /** BaseFilterTest's expr/exprDouble/exprLong virtual columns (the shared
    * VirtualColumnsJson also references d0/f0/l0, absent from this
    * fixture's rows). */
  private def mVc(filterJson: String): Seq[String] =
    graft.operators.NativeQuery.run(spark, s"""{
        "queryType": "scan",
        "dataSource": $BloomRowsJson,
        "timeColumn": "dim0",
        "virtualColumns": [
          {"type": "expression", "name": "expr", "expression": "1.0 + 0.1", "outputType": "FLOAT"},
          {"type": "expression", "name": "exprDouble", "expression": "1.0 + 1.1", "outputType": "DOUBLE"},
          {"type": "expression", "name": "exprLong", "expression": "1 + 2", "outputType": "LONG"}],
        "filter": $filterJson,
        "columns": ["dim0"]
      }""", _ => spark.emptyDataFrame)
      .collect().map(_.getString(0)).sorted.toSeq

  test("testSingleValueStringColumnWithoutNulls (:173): null and '' in the " +
      "filter match nothing on a dense column") {
    assert(m(bloom("dim0", null, null)) == Seq())
    assert(m(bloom("dim0", null, "")) == Seq())
    assert(m(bloom("dim0", null, "0")) == Seq("0"))
    assert(m(bloom("dim0", null, "1")) == Seq("1"))
  }

  test("testSingleValueStringColumnWithNulls (:182): '' is a value distinct " +
      "from null (SQL-compatible branch)") {
    assert(m(bloom("dim1", null, null)) == Seq())
    assert(m(bloom("dim1", null, "")) == Seq("0"))
    assert(m(bloom("dim1", null, "10")) == Seq("1"))
    assert(m(bloom("dim1", null, "2")) == Seq("2"))
    assert(m(bloom("dim1", null, "1")) == Seq("3"))
    assert(m(bloom("dim1", null, "def")) == Seq("4"))
    assert(m(bloom("dim1", null, "abc")) == Seq("5"))
    assert(m(bloom("dim1", null, "ab")) == Seq())
  }

  test("testMultiValueStringColumn (:199): per-element tests; the empty MV " +
      "cell and the null row read as null") {
    assert(m(bloom("dim2", null, null)) == Seq("1", "5"))
    assert(m(bloom("dim2", null, "")) == Seq("2"))
    assert(m(bloom("dim2", null, "a")) == Seq("0", "3"))
    assert(m(bloom("dim2", null, "b")) == Seq("0"))
    assert(m(bloom("dim2", null, "c")) == Seq("4"))
    assert(m(bloom("dim2", null, "d")) == Seq())
  }

  test("testMissingColumn (:220, :233): a missing column is null everywhere " +
      "— a null-containing filter matches every row") {
    for (dim <- Seq("dim3", "dim4")) {
      assert(m(bloom(dim, null, null)) == Seq("0", "1", "2", "3", "4", "5"))
      assert(m(bloom(dim, null, "")) == Seq())
      assert(m(bloom(dim, null, "a")) == Seq())
      assert(m(bloom(dim, null, "b")) == Seq())
      assert(m(bloom(dim, null, "c")) == Seq())
    }
  }

  test("testExpressionVirtualColumn (:246): typed filter entries against the " +
      "expr/exprDouble/exprLong virtual columns") {
    assert(mVc(bloom("expr", null, 1.1f)) == Seq("0", "1", "2", "3", "4", "5"))
    assert(mVc(bloom("expr", null, 1.2f)) == Seq())
    assert(mVc(bloom("exprDouble", null, 2.1d)) == Seq("0", "1", "2", "3", "4", "5"))
    assert(mVc(bloom("exprDouble", null, 2.2d)) == Seq())
    assert(mVc(bloom("exprLong", null, 3L)) == Seq("0", "1", "2", "3", "4", "5"))
    assert(mVc(bloom("exprLong", null, 4L)) == Seq())
  }

  test("testWithTimeExtractionFnNull (:148): time-format extraction feeds " +
      "the filter; missing dim6 rows extract to null") {
    val timeFn =
      """{"type": "time", "timeFormat": "yyyy-MM-dd", "resultFormat": "yyyy-MM", "joda": true}"""
    assert(m(bloom("dim0", timeFn, null, "")) == Seq())
    assert(m(bloom("dim6", timeFn, null, "")) == Seq("3", "4", "5"))
    assert(m(bloom("dim6", timeFn, "2017-07")) == Seq("0", "1"))
    assert(m(bloom("dim6", timeFn, "2017-05")) == Seq("2"))
  }

  test("testSelectorWithLookupExtractionFn (:269): lookup with " +
      "replaceMissingValueWith feeds the filter, per MV element") {
    val lookupFn =
      """{"type": "lookup",
        |  "lookup": {"type": "map",
        |    "map": {"1": "HELLO", "a": "HELLO", "def": "HELLO", "abc": "UNKNOWN"}},
        |  "retainMissingValue": false, "replaceMissingValueWith": "UNKNOWN",
        |  "injective": false, "optimize": true}""".stripMargin
    assert(m(bloom("dim0", lookupFn, "HELLO")) == Seq("1"))
    assert(m(bloom("dim0", lookupFn, "UNKNOWN")) == Seq("0", "2", "3", "4", "5"))
    assert(m(bloom("dim1", lookupFn, "HELLO")) == Seq("3", "4"))
    assert(m(bloom("dim1", lookupFn, "UNKNOWN")) == Seq("0", "1", "2", "5"))
    assert(m(bloom("dim2", lookupFn, "HELLO")) == Seq("0", "3"))
    assert(m(bloom("dim2", lookupFn, "UNKNOWN")) == Seq("0", "1", "2", "4", "5"))
    assert(m(bloom("dim3", lookupFn, "HELLO")) == Seq())
    assert(m(bloom("dim3", lookupFn, "UNKNOWN")) == Seq("0", "1", "2", "3", "4", "5"))
  }

  test("testStringHiveCompat / testLongHiveCompat / testDoubleHiveCompat " +
      "(:366, :402, :420): Hive-serialized filter bytes test natively " +
      "(Druid's wire format IS the Hive layout)") {
    // string: the spec-level behavioral analog runs the filter end to end
    assert(m(bloom("dim1", null, "abc")) == Seq("5"))
    // typed adds round-trip through serialize → base64 → native test
    val f = new BloomKFilter(1500)
    f.addLong(32L); f.addLong(664L)
    val bos = new ByteArrayOutputStream(); BloomKFilter.serialize(bos, f)
    val deser = graft.plans.DruidBloomBytes.deserialize(bos.toByteArray)
    assert(graft.plans.DruidBloomBytes.test(deser, 32L))
    assert(graft.plans.DruidBloomBytes.test(deser, 664L))
    assert(!graft.plans.DruidBloomBytes.test(deser, 3L))
    val fd = new BloomKFilter(1500)
    fd.addDouble(32.0d); fd.addDouble(66.4d)
    val bos2 = new ByteArrayOutputStream(); BloomKFilter.serialize(bos2, fd)
    val deser2 = graft.plans.DruidBloomBytes.deserialize(bos2.toByteArray)
    assert(graft.plans.DruidBloomBytes.test(deser2, 32.0d))
    assert(graft.plans.DruidBloomBytes.test(deser2, 66.4d))
    assert(!graft.plans.DruidBloomBytes.test(deser2, 0.3d))
  }
}
