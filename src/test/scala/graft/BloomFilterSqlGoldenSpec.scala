package graft

import java.sql.Timestamp
import org.apache.hive.common.util.BloomKFilter
import org.apache.spark.sql.{DataFrame, Row}

/** BloomFilterSqlAggregatorTest.java goldens (extensions-core/
  * druid-bloom-filter/.../bloom/sql): the BLOOM_FILTER SQL aggregate over
  * the numfoo fixture, compared BYTE-EXACTLY against filters built directly
  * with the library — the same comparison the reference makes (its expected
  * value is a BloomKFilter constructed row by row with
  * addString/addLong/addFloat/addDouble, nulls included via the null
  * hashcode). Druid's BloomKFilter is the Hive BloomKFilter algorithm, so
  * org.apache.hive.common.util.BloomKFilter builds the expected bytes and
  * `plans.DruidBloomBytes.serialize` renders the reference's wire layout.
  *
  * Druid SQL's BLOOM_FILTER(col, maxNumEntries) is this engine's
  * DRUID_BLOOM_FILTER (the reference-format aggregate; the BLOOM_FILTER
  * name here is the Spark-native builder). SQL-compatible mode: the empty
  * string is a VALUE (addString("")), null rows hash the NULL_HASHCODE —
  * testBloomFilterAgg's NullHandling.emptyToNullIfNeeded is the identity.
  */
class BloomFilterSqlGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private val TestNumEntries = 1000
  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val numfoo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     "a",   Some(1.0), Some(1.0f), Some(7L), 1L),
    (ts("2000-01-02 00:00:00"), "10.1", null,  Some(1.7), Some(0.1f), Some(325323L), 1L),
    (ts("2000-01-03 00:00:00"), "2",    "",    Some(0.0), Some(0.0f), Some(0L), 1L),
    (ts("2001-01-01 00:00:00"), "1",    "a",   None: Option[Double], None: Option[Float], None: Option[Long], 1L),
    (ts("2001-01-02 00:00:00"), "def",  "abc", None, None, None, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  null,  None, None, None, 1L))
    .toDF("__time", "dim1", "dim2", "d1", "f1", "l1", "cnt")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    numfoo.createOrReplaceTempView("bf_numfoo")
  }

  private def sql(q: String): Row = { registered; spark.sql(q).collect().head }

  private def expectedBytes(add: BloomKFilter => Unit): Array[Byte] = {
    val f = new BloomKFilter(TestNumEntries)
    add(f)
    graft.plans.DruidBloomBytes.serialize(f)
  }
  private def addNullable[T](f: BloomKFilter, v: Option[T])(ins: T => Unit): Unit =
    v match { case Some(x) => ins(x); case None => graft.plans.DruidBloomBytes.add(f, null) }

  test("testBloomFilterAgg (:139): string dim — engine bytes == direct " +
      "library construction (empty string is a value, not null)") {
    val got = sql("SELECT DRUID_BLOOM_FILTER(dim1, 1000) FROM bf_numfoo").getAs[Array[Byte]](0)
    val want = expectedBytes { f =>
      Seq("", "10.1", "2", "1", "def", "abc").foreach(f.addString)
    }
    assert(java.util.Arrays.equals(got, want))
  }

  test("testBloomFilterTwoAggs (:181): two filters in one pass; dim2's nulls " +
      "hash the NULL_HASHCODE") {
    val r = sql("SELECT DRUID_BLOOM_FILTER(dim1, 1000), DRUID_BLOOM_FILTER(dim2, 1000) FROM bf_numfoo")
    val want1 = expectedBytes { f =>
      Seq("", "10.1", "2", "1", "def", "abc").foreach(f.addString)
    }
    val want2 = expectedBytes { f =>
      Seq(Some("a"), None, Some(""), Some("a"), Some("abc"), None)
        .foreach(v => addNullable(f, v)(f.addString))
    }
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]](0), want1))
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]](1), want2))
  }

  test("testBloomFilterAggExtractionFn (:244): SUBSTRING input (Druid's " +
      "substring-of-empty is null → NULLIF spelling)") {
    val got = sql(
      "SELECT DRUID_BLOOM_FILTER(NULLIF(SUBSTRING(dim1, 1, 1), ''), 1000) FROM bf_numfoo")
      .getAs[Array[Byte]](0)
    val want = expectedBytes { f =>
      Seq(None, Some("1"), Some("2"), Some("1"), Some("d"), Some("a"))
        .foreach(v => addNullable(f, v)(f.addString))
    }
    assert(java.util.Arrays.equals(got, want))
  }

  test("testBloomFilterAggLong (:292): LONG dim — addLong hashing, null rows " +
      "via NULL_HASHCODE") {
    val got = sql("SELECT DRUID_BLOOM_FILTER(l1, 1000) FROM bf_numfoo").getAs[Array[Byte]](0)
    val want = expectedBytes { f =>
      Seq(Some(7L), Some(325323L), Some(0L), None, None, None)
        .foreach(v => addNullable(f, v)(f.addLong))
    }
    assert(java.util.Arrays.equals(got, want))
  }

  test("testBloomFilterAggLongVirtualColumn (:338): l1 * 2 expression input") {
    val got = sql("SELECT DRUID_BLOOM_FILTER(l1 * 2, 1000) FROM bf_numfoo").getAs[Array[Byte]](0)
    val want = expectedBytes { f =>
      Seq(Some(14L), Some(650646L), Some(0L), None, None, None)
        .foreach(v => addNullable(f, v)(f.addLong))
    }
    assert(java.util.Arrays.equals(got, want))
  }

  test("testBloomFilterAggFloatVirtualColumn (:391): f1 * 2 expression input " +
      "— addFloat hashing") {
    val got = sql("SELECT DRUID_BLOOM_FILTER(CAST(f1 * 2 AS FLOAT), 1000) FROM bf_numfoo")
      .getAs[Array[Byte]](0)
    val want = expectedBytes { f =>
      Seq(Some(2.0f), Some(0.2f), Some(0.0f), None, None, None)
        .foreach(v => addNullable(f, v)(f.addFloat))
    }
    assert(java.util.Arrays.equals(got, want))
  }

  test("testBloomFilterAggDoubleVirtualColumn (:445): d1 * 2 expression input " +
      "— addDouble hashing") {
    val got = sql("SELECT DRUID_BLOOM_FILTER(d1 * 2, 1000) FROM bf_numfoo").getAs[Array[Byte]](0)
    val want = expectedBytes { f =>
      Seq(Some(2.0), Some(3.4), Some(0.0), None, None, None)
        .foreach(v => addNullable(f, v)(f.addDouble))
    }
    assert(java.util.Arrays.equals(got, want))
  }

  test("testEmptyTimeseriesResults (:499): a no-match filter yields EMPTY " +
      "bloom filters — byte-identical to fresh BloomKFilters") {
    val r = sql("""
      SELECT DRUID_BLOOM_FILTER(dim1, 1000), DRUID_BLOOM_FILTER(l1, 1000)
      FROM bf_numfoo WHERE TRY_CAST(dim2 AS DOUBLE) = 0""")
    val empty = expectedBytes { _ => () }
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]](0), empty))
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]](1), empty))
  }

  test("testGroupByAggregatorDefaultValues (:545): filtered-to-empty " +
      "aggregators per group default to the empty filter") {
    val r = sql("""
      SELECT dim2,
        DRUID_BLOOM_FILTER(dim1, 1000) FILTER(WHERE dim1 = 'nonexistent'),
        DRUID_BLOOM_FILTER(l1, 1000) FILTER(WHERE dim1 = 'nonexistent')
      FROM bf_numfoo WHERE dim2 = 'a' GROUP BY dim2""")
    val empty = expectedBytes { _ => () }
    assert(r.getString(0) == "a")
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]](1), empty))
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]](2), empty))
  }
}
