package graft

import java.io.ByteArrayOutputStream
import java.sql.Timestamp
import java.util.Base64
import org.apache.hive.common.util.BloomKFilter

/** BloomDimFilterSqlTest.java goldens (extensions-core/druid-bloom-filter/
  * .../sql): BLOOM_FILTER_TEST(expr, 'base64') over the Calcite foo
  * fixture — the filter bytes are built with Hive's own BloomKFilter and
  * serialized in the reference's wire layout, then carried in the SQL as a
  * base64 string (exactly how a Druid client, or a bound ? parameter,
  * ships them). Covers raw dims, expression inputs (string concat +
  * numeric virtual columns with float hashing), null-containing filters,
  * OR of two filter tests, and the big-filter parameter path (the 5M-entry
  * filter the reference @Ignores for speed runs here at 1500 entries —
  * the base64-through-SQL mechanics are identical).
  */
class BloomDimFilterSqlGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    Seq(
      (ts("2000-01-01 00:00:00"), "",     Some("a")),
      (ts("2000-01-02 00:00:00"), "10.1", None: Option[String]),
      (ts("2000-01-03 00:00:00"), "2",    Some("")),
      (ts("2001-01-01 00:00:00"), "1",    Some("a")),
      (ts("2001-01-02 00:00:00"), "def",  Some("abc")),
      (ts("2001-01-03 00:00:00"), "abc",  None))
      .toDF("__time", "dim1", "dim2")
      .createOrReplaceTempView("bloomfoo")
  }

  private def b64(add: BloomKFilter => Unit): String = {
    val f = new BloomKFilter(1500)
    add(f)
    val bos = new ByteArrayOutputStream()
    BloomKFilter.serialize(bos, f)
    Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  private def count(where: String): Long = {
    registered
    spark.sql(s"SELECT COUNT(*) FROM bloomfoo WHERE $where").head().getLong(0)
  }

  test("testBloomFilter (:91): filter containing 'def' matches one row") {
    val b = b64(_.addString("def"))
    assert(count(s"bloom_filter_test(dim1, '$b')") == 1L)
  }

  test("testBloomFilterExprFilter (:119): null-containing filter over a " +
      "concat expression — NULLIF(.., 1) IS NULL keeps matches AND nulls") {
    val b = b64 { f =>
      f.addString("a-foo"); f.addString("-foo"); f.addBytes(null, 0, 0)
    }
    // dim2 || '-foo': a-foo, null, -foo, a-foo, abc-foo, null →
    // matches {a-foo, -foo} plus the null rows via the filter's null bit = 5
    assert(count(
      s"nullif(bloom_filter_test(concat(dim2, '-foo'), '$b'), true) is null") == 5L)
  }

  test("testBloomFilterVirtualColumn (:160): concat expression input") {
    val b = b64(_.addString("def-foo"))
    assert(count(s"bloom_filter_test(concat(dim1, '-foo'), '$b')") == 1L)
  }

  test("testBloomFilterVirtualColumnNumber (:190): FLOAT-typed numeric " +
      "expression — the filter holds addFloat(20.2f), the lenient cast " +
      "parses only '10.1' and 2*10.1f hashes as float") {
    val b = b64(_.addFloat(20.2f))
    assert(count(
      s"bloom_filter_test(CAST(2 * TRY_CAST(dim1 AS FLOAT) AS FLOAT), '$b')") == 1L)
  }

  test("testBloomFilters (:221): OR of two filter tests over different dims " +
      "(the second filter is empty — the reference test's own fixture)") {
    val b1 = b64 { f => f.addString("def"); f.addString("abc") }
    val b2 = b64(_ => ())
    assert(count(
      s"bloom_filter_test(dim1, '$b1') OR bloom_filter_test(dim2, '$b2')") == 2L)
  }

  test("testBloomFilterBigParameter (:285) mechanics: the base64 string " +
      "bound through SQL matches like the inline literal") {
    val b = b64(_.addString("def"))
    // the reference binds via a VARCHAR ? parameter; after binding the
    // planner sees exactly this literal
    assert(count(s"bloom_filter_test(dim1, '$b')") == 1L)
  }

  test("testBloomFilterNullParameter (:313): a filter holding only the null " +
      "bit matches the null rows") {
    val b = b64(_.addBytes(null, 0, 0))
    assert(count(s"bloom_filter_test(dim2, '$b')") == 2L)
  }
}
