package graft

import org.apache.spark.sql.functions._
import graft.functions.MathExpr

/** Port of the reference's ApplyFunctionTest
  * (core/src/test/java/org/apache/druid/math/expr/ApplyFunctionTest.java) —
  * the apply/lambda functions of the math-expr dialect
  * (core/.../math/expr/ApplyFunction.java:156-591): map, cartesian_map,
  * fold, cartesian_fold, filter, any, all, translated to Spark's
  * higher-order builtins (transform/aggregate/filter/exists/forall) with the
  * dialect's lambda-first argument order and (element, accumulator) fold
  * binding. Null handling asserts the sqlCompatible branches (SURVEY §1.3:
  * legacy replaceWithDefault is a non-goal). Documented deviation: the
  * dialect renders booleans as longs (1/0); `any`/`all` here produce Spark
  * booleans, asserted as such.
  */
class ApplyFunctionGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  // the test's bindings (ApplyFunctionTest.java:38-52)
  private lazy val binds = Seq(1).toDF("one")
    .withColumn("x", lit("foo"))
    .withColumn("y", lit(2L))
    .withColumn("z", lit(3.1))
    .withColumn("a", array(lit("foo"), lit("bar"), lit("baz"), lit("foobar")))
    .withColumn("b", array((1L to 5L).map(lit(_)): _*))
    .withColumn("c", array(lit(3.1), lit(4.2), lit(5.3)))
    .withColumn("d", array(lit(null).cast("string")))
    .withColumn("e", array(lit(null).cast("string"), lit("foo"), lit("bar")))
    .withColumn("f", array().cast("array<string>"))

  private def eval(expr: String): Any =
    binds.select(MathExpr.expr(expr).as("r")).head().get(0)

  private def evalSeq(expr: String): Seq[Any] = eval(expr) match {
    case null => null
    case s: scala.collection.Seq[_] => s.toSeq
  }

  test("testMap (ApplyFunctionTest.java:55-70)") {
    assert(evalSeq("map((x) -> concat(x, 'foo'), ['foo', 'bar', 'baz', 'foobar'])") ==
      Seq("foofoo", "barfoo", "bazfoo", "foobarfoo"))
    assert(evalSeq("map((x) -> concat(x, 'foo'), a)") ==
      Seq("foofoo", "barfoo", "bazfoo", "foobarfoo"))
    assert(evalSeq("map((x) -> x + 1, [1, 2, 3, 4, 5])").map(String.valueOf(_)) ==
      Seq("2", "3", "4", "5", "6"))
    assert(evalSeq("map((x) -> x + 1, b)").map(String.valueOf(_)) ==
      Seq("2", "3", "4", "5", "6"))
    assert(evalSeq("map((c) -> c + z, [3.1, 4.2, 5.3])").map {
      case v: Double => math.round(v * 10) / 10.0 } == Seq(6.2, 7.3, 8.4))
    assert(evalSeq("map((c) -> c + z, c)").map {
      case v: Double => math.round(v * 10) / 10.0 } == Seq(6.2, 7.3, 8.4))
    assert(evalSeq("map((x) -> x + 1, map((x) -> x + 1, [1, 2, 3, 4, 5]))")
      .map(String.valueOf(_)) == Seq("3", "4", "5", "6", "7"))
    assert(evalSeq("map((x) -> x + 1, map((x) -> x + 1, b))").map(String.valueOf(_)) ==
      Seq("3", "4", "5", "6", "7"))
    // zero-arg lambda gets ignored fresh parameter names
    assert(evalSeq("map(() -> 1, [1, 2, 3, 4, 5])").map(String.valueOf(_)) ==
      Seq("1", "1", "1", "1", "1"))
  }

  test("testCartesianMap (ApplyFunctionTest.java:73-88) — product order first " +
      "array slowest, sqlCompatible nulls") {
    assert(evalSeq(
      "cartesian_map((x, y) -> concat(x, y), ['foo', 'bar', 'baz', 'foobar'], ['bar', 'baz'])") ==
      Seq("foobar", "foobaz", "barbar", "barbaz", "bazbar", "bazbaz", "foobarbar", "foobarbaz"))
    assert(evalSeq(
      "cartesian_map((x, y, z) -> concat(concat(x, y), z), ['foo', 'bar', 'baz', 'foobar'], ['bar', 'baz'], ['omg'])") ==
      Seq("foobaromg", "foobazomg", "barbaromg", "barbazomg", "bazbaromg", "bazbazomg",
        "foobarbaromg", "foobarbazomg"))
    assert(evalSeq("cartesian_map(() -> 1, [1, 2], [1, 2, 3])").map(String.valueOf(_)) ==
      Seq("1", "1", "1", "1", "1", "1"))
    assert(evalSeq("cartesian_map((x, y) -> concat(x, y), d, d)") == Seq(null))
    assert(evalSeq("cartesian_map((x, y) -> concat(x, y), d, f)") == Seq())
    // sqlCompatible branch (ApplyFunctionTest.java:84-86)
    assert(evalSeq("cartesian_map((x, y) -> concat(x, y), d, e)") == Seq(null, null, null))
    assert(evalSeq("cartesian_map((x, y) -> concat(x, y), e, e)") ==
      Seq(null, null, null, null, "foofoo", "foobar", null, "barfoo", "barbar"))
  }

  test("testFilter (ApplyFunctionTest.java:91-98)") {
    assert(evalSeq("filter((x) -> strlen(x) > 3, ['foo', 'bar', 'baz', 'foobar'])") ==
      Seq("foobar"))
    assert(evalSeq("filter((x) -> strlen(x) > 3, a)") == Seq("foobar"))
    assert(evalSeq("filter((x) -> x > 2, [1, 2, 3, 4, 5])").map(String.valueOf(_)) ==
      Seq("3", "4", "5"))
    assert(evalSeq("filter((x) -> x > 2, b)").map(String.valueOf(_)) == Seq("3", "4", "5"))
  }

  test("testFold (ApplyFunctionTest.java:101-108) — lambda binds (element, acc)") {
    assert(String.valueOf(eval("fold((x, y) -> x + y, [1, 1, 1, 1, 1], 0)")) == "5")
    assert(String.valueOf(eval(
      "fold((b, acc) -> b * acc, map((b) -> b * 2, filter(b -> b > 3, b)), 1)")) == "80")
    assert(eval("fold((a, acc) -> concat(a, acc), a, '')") == "foobarbazbarfoo")
    assert(evalSeq("fold((a, acc) -> array_append(acc, a), a, [])") ==
      Seq("foo", "bar", "baz", "foobar"))
    assert(evalSeq("fold((a, acc) -> array_append(acc, a), b, <LONG>[])")
      .map(String.valueOf(_)) == Seq("1", "2", "3", "4", "5"))
  }

  test("testCartesianFold (ApplyFunctionTest.java:111-114)") {
    assert(String.valueOf(eval(
      "cartesian_fold((x, y, acc) -> x + y + acc, [1, 1, 1, 1, 1], [1, 1], 0)")) == "20")
  }

  test("testAnyMatch / testAllMatch (ApplyFunctionTest.java:117-135) — booleans, " +
      "bare-identifier lambdas") {
    assert(eval("any(x -> x > 3, [1, 2, 3, 4])") == true)
    assert(eval("any(x -> x > 3, [1, 2, 3])") == false)
    assert(eval("any(x -> x, map(x -> x > 3, [1, 2, 3, 4]))") == true)
    assert(eval("any(x -> x, map(x -> x > 3, [1, 2, 3]))") == false)
    assert(eval("all(x -> x > 0, [1, 2, 3, 4])") == true)
    assert(eval("all(x -> x > 1, [1, 2, 3, 4])") == false)
    assert(eval("all(x -> x, map(x -> x > 0, [1, 2, 3, 4]))") == true)
    assert(eval("all(x -> x, map(x -> x > 1, [1, 2, 3, 4]))") == false)
  }

  test("testScoping (ApplyFunctionTest.java:138-146) — lambda identifiers " +
      "shadow columns; sibling lambdas reuse names") {
    assert(evalSeq("map(b -> b + 1, b)").map(String.valueOf(_)) ==
      Seq("2", "3", "4", "5", "6"))
    assert(String.valueOf(eval("fold((b, acc) -> acc + b, map(b -> b + 1, b), 0)")) == "20")
    assert(String.valueOf(eval(
      "fold((b, acc) -> acc + b, map(b -> b + 1, b), fold((b, acc) -> acc + b, map(b -> b + 1, b), 0))")) == "40")
    assert(String.valueOf(eval(
      "fold((b, acc) -> acc + b, map(b -> b + 1, b), 0) + fold((b, acc) -> acc + b, map(b -> b + 1, b), 0)")) == "40")
    assert(String.valueOf(eval(
      "fold((b, acc) -> acc + b, map(b -> b + 1, b), fold((b, acc) -> acc + b, map(b -> b + 1, b), 0) + fold((b, acc) -> acc + b, map(b -> b + 1, b), 0))")) == "60")
  }

  test("testInvalidArgCount (ApplyFunctionTest.java:143-158)") {
    val e1 = intercept[IllegalArgumentException](eval("fold(() -> 1, [1, 1, 1, 1, 1], 0)"))
    assert(e1.getMessage.contains("lambda expression argument count does not match fold"))
    val e2 = intercept[IllegalArgumentException](
      eval("cartesian_fold(() -> 1, [1, 1, 1, 1, 1], [1, 1], 0)"))
    assert(e2.getMessage.contains("does not match cartesian_fold"))
    val e3 = intercept[IllegalArgumentException](eval("any(() -> 1, [1, 2, 3, 4])"))
    assert(e3.getMessage.contains("does not match any"))
    val e4 = intercept[IllegalArgumentException](eval("all(() -> 0, [1, 2, 3, 4])"))
    assert(e4.getMessage.contains("does not match all"))
  }

  test("Spark-spelled higher-order calls pass through untranslated") {
    // array-first spelling with a lambda second arg is NOT the dialect's
    // form — leave it for Spark to parse directly
    assert(evalSeq("filter(b, x -> x > 3)").map(String.valueOf(_)) == Seq("4", "5"))
    assert(eval("exists(b, x -> x > 4)") == true)
  }
}
