package graft

import graft.functions.GraftSqlFunctions

class SqlSurfaceSpec extends SparkSpecBase {

  private def one[T](sql: String): T = {
    GraftSqlFunctions.register(spark)
    spark.sql(s"SELECT $sql AS v").head().getAs[T]("v")
  }

  test("time family via SQL") {
    assert(one[java.sql.Timestamp]("TIME_FLOOR(TIMESTAMP '2024-03-15 13:47:31', 'PT15M')")
      == java.sql.Timestamp.valueOf("2024-03-15 13:45:00"))
    assert(one[java.sql.Timestamp]("TIME_SHIFT(TIMESTAMP '2024-01-31 10:00:00', 'P1M', 1)")
      == java.sql.Timestamp.valueOf("2024-02-29 10:00:00"))
    assert(one[Int]("TIME_EXTRACT(TIMESTAMP '2024-03-15 00:00:00', 'QUARTER')") == 1)
    assert(one[Long]("TIMESTAMP_TO_MILLIS(MILLIS_TO_TIMESTAMP(1700000000000))") == 1700000000000L)
  }

  test("scalar misc via SQL") {
    assert(one[java.lang.Double]("SAFE_DIVIDE(CAST(10.0 AS DOUBLE), CAST(0.0 AS DOUBLE))") == null)
    assert(one[Double]("SAFE_DIVIDE(CAST(10.0 AS DOUBLE), CAST(4.0 AS DOUBLE))") == 2.5)
    // Druid SQL STRPOS is 1-based, 0 when absent (StrposOperatorConversion
    // wraps the native 0-based strpos in "+1")
    assert(one[Int]("STRPOS('hello', 'll')") == 3)
    assert(one[Int]("STRPOS('hello', 'zz')") == 0)
    assert(one[Long]("PARSE_LONG('ff', 16)") == 255L)
    assert(one[String]("HUMAN_READABLE_BINARY_BYTE_FORMAT(1536)") == "1.50 KiB")
    assert(one[Boolean]("ICONTAINS_STRING('HeLLo', 'hell')"))
  }

  test("ipv4 via SQL") {
    assert(one[Long]("IPV4_PARSE('192.168.1.1')") == 3232235777L)
    assert(one[String]("IPV4_STRINGIFY(3232235777)") == "192.168.1.1")
    assert(one[Boolean]("IPV4_MATCH('192.168.1.77', '192.168.1.0/24')"))
    assert(!one[Boolean]("IPV4_MATCH('192.168.2.77', '192.168.1.0/24')"))
    assert(one[Any]("IPV4_PARSE('999.1.1.1')") == null)
  }

  test("contains_string contract (ContainsExprMacroTest.java:37-143)") {
    assert(one[Boolean]("CONTAINS_STRING('foobar', 'oba')"))
    assert(!one[Boolean]("CONTAINS_STRING('foo', 'bar')"))
    // empty search matches everything non-null; a null haystack is false
    assert(one[Boolean]("CONTAINS_STRING('foo', '')"))
    assert(one[Boolean]("CONTAINS_STRING('', '')"))
    assert(!one[Boolean]("CONTAINS_STRING(CAST(NULL AS STRING), '')"))
    // a null substring is a build-time error in sql-compatible mode
    val e1 = intercept[Exception](one[Boolean]("CONTAINS_STRING('foo', NULL)"))
    assert(e1.getMessage.contains("substring must be a string literal"))
    // exactly two arguments
    val e2 = intercept[Exception](one[Boolean]("CONTAINS_STRING('a', 'b', 'c')"))
    assert(e2.getMessage.contains("must have 2 arguments"))
  }

  test("ipv4_match value-typed dispatch (IPv4AddressMatchExprMacroTest.java:84-178)") {
    // string dotted-quad matches; long value matches
    assert(one[Boolean]("IPV4_MATCH('192.168.0.1', '192.168.0.0/16')"))
    assert(one[Boolean]("IPV4_MATCH(3232235521, '192.168.0.0/16')"))
    // an unsigned-int STRING is not an address (testMatchingStringArgUnsignedInt)
    assert(!one[Boolean]("IPV4_MATCH('3232235521', '192.168.0.0/16')"))
    // IPv6 mapped/compatible forms and other text are false, never null
    assert(!one[Boolean]("IPV4_MATCH('::ffff:192.168.0.1', '192.168.0.0/16')"))
    assert(!one[Boolean]("IPV4_MATCH('::192.168.0.1', '192.168.0.0/16')"))
    assert(!one[Boolean]("IPV4_MATCH('druid.apache.org', '192.168.0.0/16')"))
    // null input evaluates false (testNullStringArg / testNullLongArg)
    assert(!one[Boolean]("IPV4_MATCH(CAST(NULL AS STRING), '192.168.0.0/16')"))
    assert(!one[Boolean]("IPV4_MATCH(CAST(NULL AS BIGINT), '192.168.0.0/16')"))
    // subnet boundaries inclusive: network and broadcast both match (testInclusive)
    assert(one[Boolean]("IPV4_MATCH('192.168.0.0', '192.168.0.0/16')"))
    assert(one[Boolean]("IPV4_MATCH('192.168.255.255', '192.168.0.0/16')"))
    // an invalid subnet literal is a construction-time error (testSubnetArgInvalid)
    intercept[Exception](one[Boolean]("IPV4_MATCH('1.2.3.4', 'druid.apache.org/16')"))
  }

  test("mv functions via SQL") {
    assert(one[Int]("MV_LENGTH(STRING_TO_MV('a,b,c', ','))") == 3)
    assert(one[String]("MV_TO_STRING(ARRAY('x','y'), '|')") == "x|y")
    assert(one[Boolean]("MV_CONTAINS(ARRAY('a','b'), 'b')"))
    assert(one[String]("MV_OFFSET(ARRAY('a','b','c'), 1)") == "b")   // 0-based
    assert(one[String]("MV_ORDINAL(ARRAY('a','b','c'), 1)") == "a")  // 1-based
  }

  test("sketches via SQL aggregate") {
    GraftSqlFunctions.register(spark)
    import spark.implicits._
    (1 to 100).map(i => i % 40).toDF("v").createOrReplaceTempView("sk_in")
    val est = spark.sql(
      "SELECT CAST(ROUND(THETA_SKETCH_ESTIMATE(THETA_SKETCH(v))) AS BIGINT) AS e FROM sk_in")
      .head().getLong(0)
    assert(est == 40L)
    val med = spark.sql(
      "SELECT DS_GET_QUANTILE(DS_QUANTILES_SKETCH(CAST(v AS DOUBLE), 256), 0.5) AS m FROM sk_in")
      .head().getDouble(0)
    // values 1..20 appear 3x, 0 and 21..39 appear 2x (n=100). The engine
    // pins the reference's strictly-greater (EXCLUSIVE) getQuantile rule
    // (DoublesSketchToQuantilePostAggregator.java:86): smallest value whose
    // cumulative rank > 0.5*100 = 50. Cumulative through 16 is 2+3*16 = 50
    // (not > 50), so the median is 17 — the inclusive rule would give 16.
    assert(med == 17.0)
  }

  test("math-expr dialect names, intervals and MV filters via SQL") {
    assert(one[java.sql.Timestamp]("TIMESTAMP_FLOOR(TIMESTAMP '2024-03-15 13:47:31', 'P1D')")
      == java.sql.Timestamp.valueOf("2024-03-15 00:00:00"))
    assert(one[String]("CASE_SEARCHED(1 > 2, 'a', 1 < 2, 'b', 'c')") == "b")
    assert(one[String]("CASE_SIMPLE('x', 'y', 'was-y', 'x', 'was-x', 'other')") == "was-x")
    assert(one[Boolean]("TIME_IN_INTERVAL(TIMESTAMP '2024-06-15 12:00:00', '2024-06-01T00:00:00/2024-07-01T00:00:00')"))
    assert(!one[Boolean]("TIME_IN_INTERVAL(TIMESTAMP '2024-07-01 00:00:00', '2024-06-01T00:00:00/2024-07-01T00:00:00')"))
    assert(one[scala.collection.Seq[String]]("MV_FILTER_ONLY(ARRAY('a','b','c'), 'a', 'c')").toSeq == Seq("a", "c"))
    assert(one[scala.collection.Seq[String]]("MV_FILTER_NONE(ARRAY('a','b','c'), 'b')").toSeq == Seq("a", "c"))
  }

  test("DS_CDF and DS_HISTOGRAM post-ops via SQL") {
    GraftSqlFunctions.register(spark)
    // 1..100 → mass ≤25 is 0.25, ≤75 is 0.75; bins [≤25, 25–75, >75]
    spark.range(1, 101).createOrReplaceTempView("graft_r")
    val row = spark.sql("""
      SELECT DS_CDF(sk, 25.5, 75.5) AS cdf, DS_HISTOGRAM(sk, 25.5, 75.5) AS hist
      FROM (SELECT DS_QUANTILES_SKETCH(CAST(id AS DOUBLE), 200) AS sk FROM graft_r)""").head()
    val cdf = row.getSeq[Double](0)
    val hist = row.getSeq[Double](1)
    assert(cdf.map(x => math.round(x * 100).toInt) == Seq(25, 75, 100))
    assert(hist.map(x => math.round(x * 100).toInt) == Seq(25, 50, 25))
  }

  test("EARLIEST/LATEST, APPROX_QUANTILE and BLOOM_FILTER via SQL") {
    GraftSqlFunctions.register(spark)
    spark.sql("""
      SELECT g, CAST(v AS DOUBLE) AS v, ts
      FROM VALUES (1, 10.0, TIMESTAMP '2024-01-01 00:00:00'),
                  (1, 20.0, TIMESTAMP '2024-01-02 00:00:00'),
                  (2, 30.0, TIMESTAMP '2024-01-01 00:00:00')
      AS t(g, v, ts)""").createOrReplaceTempView("graft_el")
    assert(spark.sql("SELECT SUM0(v) FROM graft_el WHERE g = 99").head().getDouble(0) == 0.0)
    val r = spark.sql("""
      SELECT g, EARLIEST(v, ts) AS e, LATEST(v, ts) AS l,
             APPROX_QUANTILE(v, 0.5) AS med
      FROM graft_el GROUP BY g ORDER BY g""").collect()
    assert(r(0).getDouble(1) == 10.0 && r(0).getDouble(2) == 20.0)
    assert(r(1).getDouble(1) == 30.0 && r(1).getDouble(2) == 30.0)
    assert(r(0).getDouble(3) == 10.0 || r(0).getDouble(3) == 20.0)
    spark.range(0, 100).createOrReplaceTempView("graft_bf")
    val hits = spark.sql("""
      SELECT count(*) FROM graft_bf
      WHERE BLOOM_FILTER_TEST(id,
        (SELECT BLOOM_FILTER(id, 1000) FROM graft_bf WHERE id < 10))""").head().getLong(0)
    assert(hits >= 10 && hits < 100) // no false negatives, mostly filtered
  }

  test("text pipeline functions via SQL") {
    assert(one[Int]("TOKEN_COUNT('  the quick   brown fox ')") == 4)
    assert(one[String]("LANG_ID('the cat of the house and the dog')") == "en")
    val q = one[Double]("QUALITY_SCORE('the quick brown fox jumps over the lazy dog')")
    assert(q > 0 && q <= 1.0)
  }

  test("ARRAY_CONCAT_AGG via SQL (ArrayConcatSqlAggregator.java — " +
      "cross-row array concatenation, null arrays skipped)") {
    graft.functions.GraftSqlFunctions.register(spark)
    spark.sql("""
      SELECT sort_array(array_concat_agg(a)) AS r FROM VALUES
        (array(1, 2)), (array(3)), (CAST(NULL AS ARRAY<INT>)), (array(2))
      AS t(a)""").collect() match {
      case Array(row) =>
        assert(row.getSeq[Int](0) == Seq(1, 2, 2, 3))
    }
  }
}
