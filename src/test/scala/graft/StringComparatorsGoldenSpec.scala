package graft

import java.util.Arrays.{compareUnsigned => cmpBytes}

import org.apache.spark.sql.functions._
import graft.functions.{OrderingKeys, StringOrderings}

/** StringComparator parity, porting the reference's own vectors
  * (processing/src/test/java/org/apache/druid/query/ordering/
  * StringComparatorsTest.java). The comparators are re-expressed as
  * order-preserving sort keys (OrderingKeys/StringOrderings); each ported
  * assertion compares keys where the reference compares values, and the
  * list-sort vectors additionally run through the Catalyst expressions via
  * a real orderBy.
  */
class StringComparatorsGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def cmpAlpha(a: String, b: String): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else cmpBytes(OrderingKeys.alphanumKey(a), OrderingKeys.alphanumKey(b))

  private def cmpVersion(a: String, b: String): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else cmpBytes(OrderingKeys.versionKey(a), OrderingKeys.versionKey(b))

  /** The reference's commonTest(comparator) (StringComparatorsTest.java:36-50). */
  private def commonTest(cmp: (String, String) => Int): Unit = {
    assert(cmp(null, null) == 0)
    assert(cmp("", "") == 0)
    assert(cmp("123", "123") == 0)
    assert(cmp("abc123", "abc123") == 0)
    assert(cmp("", "abc") < 0)
    assert(cmp("abc", "") > 0)
    assert(cmp(null, "apple") < 0)
  }

  /** Sort a value list through the engine with the named comparator key. */
  private def engineSort(ordering: String, values: Seq[String]): Seq[String] =
    values.toDF("v")
      .orderBy(StringOrderings.key(ordering, col("v")), col("v"))
      .as[String].collect().toSeq

  // testAlphanumericComparator (StringComparatorsTest.java:61-107)
  test("alphanumeric comparator vectors (StringComparatorsTest.java:61)") {
    commonTest(cmpAlpha)
    // numbers < non numeric
    assert(cmpAlpha("123", "abc") < 0)
    assert(cmpAlpha("abc", "123") > 0)
    // numbers ordered numerically
    assert(cmpAlpha("2", "11") < 0)
    assert(cmpAlpha("a2", "a11") < 0)
    // leading zeros
    assert(cmpAlpha("02", "11") < 0)
    assert(cmpAlpha("02", "002") < 0)
    // decimal points ...
    assert(cmpAlpha("1.3", "1.5") < 0)
    // ... don't work too well
    assert(cmpAlpha("1.3", "1.15") < 0)
    // case-insensitive text chunks (the alphanum algorithm's
    // String.CASE_INSENSITIVE_ORDER chunk compare)
    assert(cmpAlpha("a2", "A11") < 0)
    assert(cmpAlpha("abc", "ABC") == 0)

    // range sorting, through the engine
    assert(
      engineSort("alphanumeric",
        Seq("1-5", "11-15", "16-20", "21-25", "26-30", "6-10", "Other")) ==
        Seq("1-5", "6-10", "11-15", "16-20", "21-25", "26-30", "Other"))
    assert(
      engineSort("alphanumeric",
        Seq("Other", "[0.00-0.05)", "[0.05-0.10)", "[0.10-0.50)", "[0.50-1.00)",
          "[1.00-5.00)", "[5.00-10.00)", "[10.00-20.00)")) ==
        Seq("[0.00-0.05)", "[0.05-0.10)", "[0.10-0.50)", "[0.50-1.00)",
          "[1.00-5.00)", "[5.00-10.00)", "[10.00-20.00)", "Other"))
  }

  // testNumericComparator (StringComparatorsTest.java:119-143)
  test("numeric comparator vectors (StringComparatorsTest.java:119)") {
    // pairwise via the engine key (null handling is the engine's nulls-first)
    def cmpNum(a: String, b: String): String =
      Seq((a, b)).toDF("a", "b")
        .select(
          when(StringOrderings.numericKey(col("a")) < StringOrderings.numericKey(col("b")), "lt")
            .when(StringOrderings.numericKey(col("a")) === StringOrderings.numericKey(col("b")), "eq")
            .otherwise("gt"))
        .as[String].head()

    assert(cmpNum("-1230.452487532", "6893") == "lt")
    assert(
      engineSort("numeric",
        Seq("-1", "-1.10", "-1.2", "-100", "-2", "0", "1", "1.10", "1.2", "2", "100")) ==
        Seq("-100", "-2", "-1.2", "-1.10", "-1", "0", "1", "1.10", "1.2", "2", "100"))
    // unparseable < parseable; unparseable amongst themselves lexicographic
    assert(cmpNum("-500000000.14124", "CAN'T TOUCH THIS") == "gt")
    assert(cmpNum("CAN'T PARSE THIS", "-500000000.14124") == "lt")
    assert(cmpNum("CAN'T PARSE THIS", "CAN'T TOUCH THIS") == "lt")
    // nulls sort first through the engine
    assert(engineSort("numeric", Seq("1001", null)) == Seq(null, "1001"))
  }

  // testVersionComparator (StringComparatorsTest.java:145-157)
  test("version comparator vectors (StringComparatorsTest.java:145)") {
    commonTest(cmpVersion)
    assert(cmpVersion("02", "002") == 0)
    assert(cmpVersion("1.0", "2.0") < 0)
    assert(cmpVersion("9.1", "10.0") < 0)
    assert(cmpVersion("1.1.1", "2.0") < 0)
    assert(cmpVersion("1.0-SNAPSHOT", "1.0") < 0)
    assert(cmpVersion("2.0.1-xyz-1", "2.0.1-1-xyz") < 0)
    assert(cmpVersion("1.0-SNAPSHOT", "1.0-Final") < 0)
    // qualifier ladder (maven ComparableVersion QUALIFIERS order)
    assert(
      engineSort("version",
        Seq("1.0", "1.0-alpha", "1.0-beta", "1.0-milestone", "1.0-rc", "1.0-SNAPSHOT",
          "1.0-sp", "1.0-xyz", "1.1")) ==
        Seq("1.0-alpha", "1.0-beta", "1.0-milestone", "1.0-rc", "1.0-SNAPSHOT",
          "1.0", "1.0-sp", "1.0-xyz", "1.1"))
    // aliases: ga/final/release ≡ release; cr ≡ rc; a1 ≡ alpha-1
    assert(cmpVersion("1.0-ga", "1.0") == 0)
    assert(cmpVersion("1.0-final", "1.0") == 0)
    assert(cmpVersion("1.0-cr", "1.0-rc") == 0)
    assert(cmpVersion("1.0a1", "1.0-alpha-1") == 0)
    assert(cmpVersion("1.0-rc1", "1.0-rc2") < 0)
  }

  // testStrlenComparator (StringComparatorsTest.java:109-117)
  test("strlen comparator vectors (StringComparatorsTest.java:109)") {
    assert(engineSort("strlen", Seq("apple", "a", "elppa")) == Seq("a", "apple", "elppa"))
    assert(engineSort("strlen", Seq(null, "apple", "")) == Seq(null, "", "apple"))
  }

  // testLexicographicComparator (StringComparatorsTest.java:52-59)
  test("lexicographic comparator vectors (StringComparatorsTest.java:52)") {
    assert(engineSort("lexicographic", Seq("banana", "apple", null, "")) ==
      Seq(null, "", "apple", "banana"))
  }

  // the *SerdeTest methods (StringComparatorsTest.java:159-219): both the
  // {"type": name} object form and the bare-string form name a comparator,
  // case-insensitively for "NuMeRiC" (:217)
  test("comparator serde forms resolve case-insensitively (StringComparatorsTest.java:159-219)") {
    for (name <- Seq("lexicographic", "alphanumeric", "strlen", "numeric", "version", "NuMeRiC")) {
      val key = StringOrderings.key(name.toLowerCase(java.util.Locale.ENGLISH), col("v"))
      assert(key != null)
    }
    intercept[IllegalArgumentException](StringOrderings.key("nope", col("v")))
  }
}
