package graft

import org.apache.spark.sql.Row

/** BloomFilterExpressionsTest.java goldens (extensions-core/
  * druid-bloom-filter/.../expressions): the bloom expression-macro family —
  * bloom_filter(maxEntries) / bloom_filter_add(value, filter) /
  * bloom_filter_test(value, filter) — per-row filter construction with
  * typed adds (long/double/string), cross-type misses, nested add chains,
  * and filter-merge when the added value is itself a filter. These are the
  * macros expression virtual columns and expression-lambda aggregators
  * compose (the bloom analog of the hyper_unique() family). */
class BloomExpressionsGoldenSpec extends SparkSpecBase {

  private def one(exprSql: String): Row = {
    graft.functions.GraftSqlFunctions.register(spark)
    spark.sql(s"SELECT $exprSql AS r").head()
  }

  test("testCreate (:71) + testAddString (:82): a fresh filter accepts a " +
      "string add and tests positive") {
    assert(one("bloom_filter_test('foo', bloom_filter_add('foo', bloom_filter(100)))").getBoolean(0))
  }

  test("testAddLong (:100) / testAddDouble (:118): typed adds hash their " +
      "own width — cross-type probes miss") {
    assert(one("bloom_filter_test(1234, bloom_filter_add(1234, bloom_filter(100)))").getBoolean(0))
    assert(one("bloom_filter_test(1.234, bloom_filter_add(1.234, bloom_filter(100)))").getBoolean(0))
    assert(!one("bloom_filter_test(1234, bloom_filter_add('foo', bloom_filter(100)))").getBoolean(0))
    assert(!one("bloom_filter_test(1.23, bloom_filter_add('foo', bloom_filter(100)))").getBoolean(0))
    assert(!one("bloom_filter_test('bar', bloom_filter_add('foo', bloom_filter(100)))").getBoolean(0))
    assert(!one("bloom_filter_test(4321, bloom_filter_add(1234, bloom_filter(100)))").getBoolean(0))
  }

  test("testFilter (:136) tail: adding a FILTER to a filter merges them") {
    assert(one(
      """bloom_filter_test(4321, bloom_filter_add(
        |  bloom_filter_add(1234, bloom_filter(100)),
        |  bloom_filter_add(4321, bloom_filter(100))))""".stripMargin).getBoolean(0))
    assert(one(
      """bloom_filter_test(1234, bloom_filter_add(
        |  bloom_filter_add(1234, bloom_filter(100)),
        |  bloom_filter_add(4321, bloom_filter(100))))""".stripMargin).getBoolean(0))
  }

  test("the macro filter round-trips through the aggregate surface: a " +
      "column-built DRUID_BLOOM_FILTER tests through bloom_filter_test's " +
      "byte-layout dispatch") {
    graft.functions.GraftSqlFunctions.register(spark)
    import spark.implicits._
    Seq("a", "b", "c").toDF("v").createOrReplaceTempView("bloom_expr_src")
    val r = spark.sql("""
      SELECT bloom_filter_test('b', f), bloom_filter_test('z', f)
      FROM (SELECT DRUID_BLOOM_FILTER(v, 1000) AS f FROM bloom_expr_src)""").head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }
}
