package graft

import org.apache.spark.sql.Row

/** r15: codegen-consistency sweep — the Spark analog of the reference's
  * SqlVectorizedExpressionSanityTest (sql/src/test/java/org/apache/druid/
  * sql/calcite/SqlVectorizedExpressionSanityTest.java), which runs every
  * query vectorized AND non-vectorized and asserts identical results.
  *
  * Here the two execution modes are whole-stage-codegen + compiled
  * expression evaluation (the default) vs interpreted evaluation
  * (`spark.sql.codegen.wholeStage=false` +
  * `spark.sql.codegen.factoryMode=NO_CODEGEN`). The swept slice is chosen
  * for exactly the code class this catches: the repo's
  * TypedImperativeAggregates (sketches, first/last pair-folds, variance,
  * approx histograms, lambda folds — all CodegenFallback objects whose
  * SERIALIZATION path differs between modes), RuntimeReplaceables, and the
  * HofUnroll / expression-macro outputs.
  *
  * Queries run at sf0.001 through the same SparkEntry entries the oracle
  * gate uses, so a divergence here is a divergence the gate would ship.
  */
class CodegenConsistencySweepSpec extends SparkSpecBase {

  // the TypedImperativeAggregate / RuntimeReplaceable / HOF-heavy slice
  private val swept = Seq(
    // first/last/any pair-folds + rollup refold
    "agg_first_last", "agg_first_last_rollup", "agg_any_value",
    // collector-exact numeric state
    "agg_variance", "agg_approx_histogram", "agg_fixed_histogram",
    "agg_histogram", "agg_bitwise", "agg_array_string", "agg_grouping_id",
    // expression-lambda folds (interpreted agg + r15 fused native agg)
    "agg_expression_fold", "native_lambda_fold", "native_lambda_hll",
    "native_subquery_hllc_refold",
    // HLLC / datasketches TypedImperativeAggregates
    "native_cardinality_modes", "agg_approx_distinct", "sketch_hllc_build",
    "sketch_theta_merge", "sketch_theta_setops",
    "sketch_quantiles_kll", "sketch_quantiles_classic",
    "sketch_tuple", "sketch_hll", "sql_sketch_acd",
    // math-expr dialect + apply/lambda fns + extraction fns (HofUnroll,
    // expression macros, RuntimeReplaceables)
    "native_math_expr", "native_apply_fns", "native_extraction_fns",
    "post_aggregators",
    // text/curation Catalyst expressions (pure-expression surface)
    "text_analysis", "text_fingerprint",
    // r15 additions: window averagers over spine-filled buckets, and the
    // contrib timeMin/timeMax/distinctCount aggregators
    "moving_average", "agg_time_minmax_distinct")

  /** Stable rendering: binary → hex, arrays/rows recursed, floats exact. */
  private def canon(v: Any): String = v match {
    case null => "∅"
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case a: scala.collection.Seq[_] => a.map(canon).mkString("[", ",", "]")
    case a: Array[_] => a.map(canon).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => canon(k) + "→" + canon(x) }.toSeq.sorted.mkString("{", ",", "}")
    case r: Row => r.toSeq.map(canon).mkString("(", ",", ")")
    case d: java.lang.Double => java.lang.Double.toString(d)
    case f: java.lang.Float => java.lang.Float.toString(f)
    case x => x.toString
  }

  private def runCanon(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf())
    df.collect().map(r => canon(r)).sorted.toSeq
  }

  test("interpreted (NO_CODEGEN, wholeStage off) results are identical to " +
      "codegen results across the TypedImperativeAggregate slice") {
    val conf = spark.conf
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    swept.foreach { name =>
      // default mode (wholeStage on, factory FALLBACK→codegen)
      conf.set("spark.sql.codegen.wholeStage", "true")
      conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      val compiled = runCanon(name)
      // interpreted mode
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted =
        try runCanon(name)
        finally {
          conf.set("spark.sql.codegen.wholeStage", "true")
          conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        }
      if (compiled != interpreted) {
        val diff = compiled.zipAll(interpreted, "<missing>", "<missing>")
          .filter { case (a, b) => a != b }.take(3)
        failures += s"$name: ${compiled.size} vs ${interpreted.size} rows; first diffs: $diff"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the interpreted mode actually engages (conf sanity — the sweep is " +
      "not comparing codegen against itself)") {
    val conf = spark.conf
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val plan = SparkEntry.queries("agg_variance")(spark, sf())
        .queryExecution.executedPlan.toString
      assert(!plan.contains("WholeStageCodegen"), plan)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", "true")
      conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
