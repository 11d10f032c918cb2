package graft

import org.apache.spark.sql.Row
import graft.functions.GraftSqlFunctions

/** Ported vectors from the reference's IPv4 operator-conversion tests
  * (sql/.../expression/IPv4AddressParseExpressionTest.java,
  * IPv4AddressStringifyExpressionTest.java,
  * IPv4AddressMatchExpressionTest.java) plus the regexp_like vectors from
  * ExpressionsTest.java:302. The macros dispatch on the ARGUMENT TYPE
  * (IPv4AddressParseExprMacro.java:81-88): STRING parses dotted-quad only,
  * LONG range-checks against unsigned 32 bits, and any other type —
  * including the tests' FLOAT binding f = 3.14 — is null (match: false),
  * never a truncated numeric. */
class Ipv4ExpressionGoldenSpec extends SparkSpecBase {

  // the ExpressionTestHelper binding rows: f FLOAT = 3.14 (the invalid-type
  // probe), s STRING = "foo", newliney = "beep\nboop" (ExpressionsTest
  // BINDINGS)
  private lazy val bound: Unit = {
    GraftSqlFunctions.register(spark)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("f", FloatType), StructField("s", StringType),
      StructField("newliney", StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.List.of(Row(3.14f, "foo", "beep\nboop"))),
      schema).createOrReplaceTempView("ipv4bindings")
  }

  private def one[T](sql: String): T = {
    bound
    spark.sql(s"SELECT $sql AS v FROM ipv4bindings").head().getAs[T]("v")
  }

  // --- IPV4_PARSE (IPv4AddressParseExpressionTest.java) ---

  test("parse: valid string arg (testValidStringArgIPv4)") {
    assert(one[Long]("IPV4_PARSE('192.168.0.1')") == 3232235521L)
  }

  test("parse: null arg (testNullArg)") {
    assert(one[java.lang.Long]("IPV4_PARSE(CAST(NULL AS STRING))") == null)
  }

  test("parse: non-string/long input type is null (testInvalidArgType)") {
    // f binds 3.14 FLOAT — the macro's switch has no DOUBLE branch, so the
    // result is null, NOT parse(3)
    assert(one[java.lang.Long]("IPV4_PARSE(f)") == null)
  }

  test("parse: text that is not an address (testInvalidStringArgNotIPAddress)") {
    assert(one[java.lang.Long]("IPV4_PARSE('druid.apache.org')") == null)
  }

  test("parse: IPv6 compatible/mapped forms are not IPv4 (testInvalidStringArgIPv6Compatible, testValidStringArgIPv6Mapped)") {
    assert(one[java.lang.Long]("IPV4_PARSE('::192.168.0.1')") == null)
    assert(one[java.lang.Long]("IPV4_PARSE('::ffff:192.168.0.1')") == null)
  }

  test("parse: an unsigned-int STRING is not an address (testValidStringArgUnsignedInt)") {
    assert(one[java.lang.Long]("IPV4_PARSE('3232235521')") == null)
  }

  test("parse: long range checks (testInvalidIntegerArgTooLow/Lowest/Valid/Highest/TooHigh)") {
    assert(one[java.lang.Long]("IPV4_PARSE(-1)") == null)
    assert(one[Long]("IPV4_PARSE(0)") == 0L)
    assert(one[Long]("IPV4_PARSE(3232235521)") == 3232235521L)
    assert(one[Long]("IPV4_PARSE(4294967295)") == 4294967295L)
    assert(one[java.lang.Long]("IPV4_PARSE(4294967296)") == null)
  }

  test("parse: arity errors (testTooFewArgs/testTooManyArgs)") {
    val e1 = intercept[Exception](one[Long]("IPV4_PARSE()"))
    assert(e1.getMessage.contains("must have 1 argument"))
    val e2 = intercept[Exception](one[Long]("IPV4_PARSE('1.2.3.4', '1.2.3.4')"))
    assert(e2.getMessage.contains("must have 1 argument"))
  }

  // --- IPV4_STRINGIFY (IPv4AddressStringifyExpressionTest.java) ---

  test("stringify: valid long arg (testValidIntegerArg)") {
    assert(one[String]("IPV4_STRINGIFY(3232235521)") == "192.168.0.1")
  }

  test("stringify: null arg (testNullArg)") {
    assert(one[String]("IPV4_STRINGIFY(CAST(NULL AS BIGINT))") == null)
  }

  test("stringify: non-string/long input type is null (testInvalidArgType)") {
    assert(one[String]("IPV4_STRINGIFY(f)") == null)
  }

  test("stringify: long range checks (testInvalidIntegerArgTooLow/Lowest/Highest/TooHigh)") {
    assert(one[String]("IPV4_STRINGIFY(-1)") == null)
    assert(one[String]("IPV4_STRINGIFY(0)") == "0.0.0.0")
    assert(one[String]("IPV4_STRINGIFY(4294967295)") == "255.255.255.255")
    assert(one[String]("IPV4_STRINGIFY(4294967296)") == null)
  }

  test("stringify: a valid dotted string stays itself (testValidStringArgIPv4)") {
    assert(one[String]("IPV4_STRINGIFY('192.168.0.1')") == "192.168.0.1")
  }

  test("stringify: invalid strings are null (testValidStringArgUnsignedInt, testInvalidStringArgNotIPAddress, IPv6 forms)") {
    assert(one[String]("IPV4_STRINGIFY('3232235521')") == null)
    assert(one[String]("IPV4_STRINGIFY('druid.apache.org')") == null)
    assert(one[String]("IPV4_STRINGIFY('::192.168.0.1')") == null)
    assert(one[String]("IPV4_STRINGIFY('::ffff:192.168.0.1')") == null)
  }

  test("stringify: arity errors (testTooFewArgs/testTooManyArgs)") {
    val e = intercept[Exception](one[String]("IPV4_STRINGIFY(1, 2)"))
    assert(e.getMessage.contains("must have 1 argument"))
  }

  // --- IPV4_MATCH (IPv4AddressMatchExpressionTest.java; the value-typed
  // vectors live in SqlSurfaceSpec — these are the conversion-layer ones) ---

  test("match: non-string/long input type never matches (testInvalidArgType analog over FLOAT)") {
    assert(!one[Boolean]("IPV4_MATCH(f, '0.0.0.0/0')"))
  }

  test("match: string binding that is not an address (testInvalidArgType)") {
    assert(!one[Boolean]("IPV4_MATCH(s, '192.168.0.0/16')"))
  }

  test("match: subnet must be a literal (testSubnetArgNotLiteral)") {
    val e = intercept[Exception](one[Boolean]("IPV4_MATCH('192.168.0.1', s)"))
    assert(e.getMessage.contains("subnet arg must be a literal"))
  }

  test("match: invalid subnet format (testSubnetArgInvalid)") {
    val e = intercept[Exception](one[Boolean]("IPV4_MATCH('192.168.0.1', '192.168.0.1/invalid')"))
    assert(e.getMessage.contains("subnet arg has an invalid format"))
  }

  test("match: arity errors (testTooFewArgs/testTooManyArgs)") {
    val e = intercept[Exception](
      one[Boolean]("IPV4_MATCH('192.168.0.1', '192.168.0.0/16', '192.168.0.1')"))
    assert(e.getMessage.contains("must have 2 arguments"))
  }

  // --- REGEXP_LIKE (ExpressionsTest.java:302 testRegexpLike) ---

  test("regexp_like partial-match semantics (ExpressionsTest.java:302)") {
    assert(one[Boolean]("REGEXP_LIKE(s, 'f.')"))
    // contains an 'o' not at the beginning; find() semantics DO match
    assert(one[Boolean]("REGEXP_LIKE(s, 'o')"))
    assert(!one[Boolean]("REGEXP_LIKE(s, 'x.')"))
    assert(one[Boolean]("REGEXP_LIKE(s, '')"))
    // '$' does not cross a newline without MULTILINE
    assert(!one[Boolean]("REGEXP_LIKE(newliney, '^beep$')"))
    assert(one[Boolean]("REGEXP_LIKE(newliney, '^beep\\nboop$')"))
    assert(one[Boolean]("REGEXP_LIKE(newliney, 'boop')"))
  }
}
