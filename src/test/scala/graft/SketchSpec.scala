package graft

import org.apache.spark.sql.functions._
import graft.plans.SketchFunctions._

class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("theta sketch exact below capacity; survives partial/final merge") {
    val df = (1 to 1000).map(i => (i % 7, i % 500)).toDF("g", "v")
      .repartition(4) // force partial sketches + shuffle merge
    val global = df.agg(thetaEstimate(thetaSketch(col("v"))).as("e")).head().getDouble(0)
    assert(math.round(global) == 500)
    val perGroup = df.groupBy("g").agg(thetaEstimate(thetaSketch(col("v"))).as("e"))
      .collect().map(_.getDouble(1))
    assert(perGroup.length == 7 && perGroup.forall(_ > 0))
  }

  test("estimate-with-bounds and toString leaves: exact theta collapses, hll brackets") {
    val df = (1 to 400).map(i => i % 200).toDF("v").repartition(4)
    val r = df.agg(
      thetaEstimateBounds(thetaSketch(col("v")), 2).as("tb"),
      hllEstimateWithBounds(hllSketch(col("v")), 2).as("hb"),
      thetaSummary(thetaSketch(col("v"))).as("ts"),
      hllSummary(hllSketch(col("v"))).as("hs"),
      quantilesSummary(kllSketch(col("v").cast("double"))).as("qs")).head()
    val tb = r.getStruct(0) // exact below nominal → bounds collapse onto the estimate
    assert(tb.getDouble(0) == 200.0 && tb.getDouble(1) == 200.0 &&
      tb.getDouble(2) == 200.0 && tb.getInt(3) == 2)
    val hb = r.getSeq[Double](1)
    assert(hb(1) <= hb(0) && hb(0) <= hb(2) && math.abs(hb(0) - 200.0) < 10.0)
    Seq(2, 3, 4).foreach(i =>
      assert(r.getString(i).toUpperCase.contains("SUMMARY"), s"col $i -> ${r.getString(i)}"))
  }

  test("arrayOfDoublesSketchTTest: Welch p-values match 30-digit mpmath " +
      "reference to 1e-9 (exact-retention sketches, self-contained " +
      "t-distribution CDF — ArrayOfDoublesSketchTTestPostAggregator math)") {
    import graft.plans.StatInference
    // commons-math TTest.tTest semantics, pinned against mpmath betainc:
    // welch([1..5], [2,4,6,8,10]) and the classic NIST two-sample vectors
    assert(math.abs(StatInference.welchPValue(3.0, 2.5, 5, 6.0, 10.0, 5)
      - 0.10753119493062724) < 1e-9)
    val c = Seq(27.5, 21.0, 19.0, 23.6, 17.0, 17.9, 16.9, 20.1, 21.9, 22.6,
      23.1, 19.6, 19.0, 21.7, 21.4)
    val d = Seq(27.1, 22.0, 20.8, 23.4, 23.4, 23.5, 25.8, 22.0, 24.8, 20.2,
      21.9, 22.1, 22.9, 30.6, 20.5, 24.1, 13.8)
    def meanVar(xs: Seq[Double]): (Double, Double) = {
      val m = xs.sum / xs.size
      (m, xs.map(v => (v - m) * (v - m)).sum / (xs.size - 1))
    }
    val (mc, vc) = meanVar(c); val (md, vd) = meanVar(d)
    assert(math.abs(StatInference.welchPValue(mc, vc, c.size, md, vd, d.size)
      - 0.07480625382866155) < 1e-9)

    // end to end over sketches: distinct keys, one value column, below
    // nominal → retention is exact, so the sketch path reproduces the
    // closed-form p-value
    val s1 = (1 to 5).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    val s2 = (1 to 5).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    val p = s1.agg(tupleSketch(col("k"), Seq(col("v"))).as("sk")).crossJoin(
        s2.agg(tupleSketch(col("k"), Seq(col("v"))).as("sk2")))
      .select(element_at(tupleTTest(col("sk"), col("sk2")), 1).as("p"))
      .head().getDouble(0)
    assert(math.abs(p - 0.10753119493062724) < 1e-9, s"got $p")
  }

  test("theta set ops match exact set algebra") {
    val df = Seq.tabulate(300)(i => (if (i < 200) "a" else "z", i % 150)).toDF("side", "v")
    val sk = df.agg(
      thetaSketch(when($"side" === "a", $"v")).as("sa"),
      thetaSketch(when($"side" === "z", $"v")).as("sz"))
    val row = sk.select(
      round(thetaEstimate(thetaUnion($"sa", $"sz"))).as("u"),
      round(thetaEstimate(thetaIntersect($"sa", $"sz"))).as("i"),
      round(thetaEstimate(thetaNot($"sa", $"sz"))).as("d")).head()
    // side a: values 0..149 (i<200 → i%150 covers 0..149); side z: 200..299 → 50..149
    assert(row.getDouble(0) == 150.0) // union
    assert(row.getDouble(1) == 100.0) // intersect (50..149)
    assert(row.getDouble(2) == 50.0)  // a not z (0..49)
  }

  test("kll quantiles exact for small n; rank and cdf consistent") {
    val vals = (1 to 100).map(_.toDouble)
    val df = vals.toDF("v").repartition(3)
    val row = df.agg(kllSketch($"v", 256).as("sk"))
      .select(kllQuantile($"sk", 0.5).as("med"), kllRank($"sk", 25.0).as("r"),
        kllCdf($"sk", Seq(50.0)).as("cdf")).head()
    // reference (datasketches-3.1.0) rules: median = smallest value whose
    // rank > 0.5*100 = position 51; rank/cdf = mass STRICTLY LESS THAN the
    // query point: #(v < 25) = 24, #(v < 50) = 49
    assert(row.getDouble(0) == 51.0)
    assert(row.getDouble(1) == 0.24)
    assert(row.getSeq[Double](2).head == 0.49)
  }

  test("tuple sketch: distinct keys + per-key metric sums survive merge") {
    // 4 partitions force partial sketches + shuffle-merge of serialized form
    val df = (1 to 1000).map(i => (i % 50, 2.0, 3.0)).toDF("k", "v1", "v2")
      .repartition(4)
    val row = df.agg(tupleSketch($"k", Seq($"v1", $"v2"), lgK = 12).as("sk"))
      .select(
        round(tupleEstimate($"sk")).as("nd"),
        round(element_at(tupleMetricsSum($"sk"), 1)).as("s1"),
        round(element_at(tupleMetricsSum($"sk"), 2)).as("s2")).head()
    assert(row.getDouble(0) == 50.0)   // 50 distinct keys, exact below nominal
    assert(row.getDouble(1) == 2000.0) // 1000 rows × 2.0 summed across keys
    assert(row.getDouble(2) == 3000.0)
    // string keys work too
    val s = Seq(("a", 1.0), ("a", 1.0), ("b", 5.0)).toDF("k", "v")
      .agg(tupleSketch($"k", Seq($"v")).as("sk"))
      .select(round(tupleEstimate($"sk")).as("nd"),
        round(element_at(tupleMetricsSum($"sk"), 1)).as("s")).head()
    assert(s.getDouble(0) == 2.0 && s.getDouble(1) == 7.0)
  }

  test("hll sketch union estimates within tolerance") {
    val df = (1 to 10000).map(i => (i % 3, i)).toDF("g", "v")
    // hllEstimate (graft) rather than the "hll_sketch_estimate" name: the
    // Druid-parity SQL override (fractional DOUBLE) resolves by name, so
    // the name's result type depends on suite registration order
    val est = df.groupBy("g").agg(hllSketch($"v").as("h"))
      .agg(hllEstimate(hll_union_agg($"h"))).head().getLong(0)
    assert(math.abs(est - 10000) < 300) // ~2% HLL error bound at lgK=12
  }

  test("tuple post-op family: set ops, stats, bounds, quantile pipe") {
    val a = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "v")
      .agg(tupleSketch($"k", Seq($"v")).as("ska"))
    val b = Seq((2, 5.0), (3, 5.0), (4, 5.0)).toDF("k", "v")
      .agg(tupleSketch($"k", Seq($"v")).as("skb"))
    val r = a.crossJoin(b).select(
      round(tupleEstimate(tupleUnion($"ska", $"skb"))).as("u"),
      round(tupleEstimate(tupleIntersect($"ska", $"skb"))).as("i"),
      round(tupleEstimate(tupleNot($"ska", $"skb"))).as("n"),
      tupleNumEntries($"ska").as("entries"),
      element_at(tupleMeans($"ska"), 1).as("mean"),
      element_at(tupleVariances($"ska"), 1).as("variance"),
      element_at(tupleEstimateAndBounds($"ska", 2), 1).as("est"),
      kllQuantile(tupleToKll($"ska", 1, 200), 0.5).as("med")).head()
    assert(r.getDouble(0) == 4.0 && r.getDouble(1) == 2.0 && r.getDouble(2) == 1.0)
    assert(r.getLong(3) == 3L)
    assert(r.getDouble(4) == 20.0)      // mean of 10,20,30
    assert(r.getDouble(5) == 100.0)     // sample variance of 10,20,30
    assert(r.getDouble(6) == 3.0)       // exact estimate
    assert(r.getDouble(7) == 20.0)      // median of {10,20,30}: position
                                        // floor(1.5)+1 = 2 under the
                                        // strictly-greater rule (same as
                                        // inclusive here)
  }

  test("hyper_unique_add passes the collector through on null input (skip-null)") {
    // reference sql-compatible mode skips null values rather than nulling the
    // accumulator (HyperUniqueExpressions.java:168-191); one null row in a
    // fold must not destroy the group's estimate
    graft.functions.GraftSqlFunctions.register(spark)
    val nd = spark.sql(
      """SELECT round(hyper_unique_estimate(
        |  aggregate(array(1L, CAST(NULL AS BIGINT), 2L, NULL, 3L, 1L),
        |            hyper_unique(), (acc, x) -> hyper_unique_add(x, acc)))) AS nd
        |""".stripMargin).head().getDouble(0)
    assert(nd == 3.0)
    // null sketch still yields null
    val n = spark.sql("SELECT hyper_unique_add(1L, CAST(NULL AS BINARY))").head()
    assert(n.isNullAt(0))
  }

  test("hyper_unique_round_estimate returns the rounded LONG " +
      "(HyperUniqueExpressionsTest.java:189)") {
    graft.functions.GraftSqlFunctions.register(spark)
    val r = spark.sql(
      """SELECT hyper_unique_round_estimate(
        |         hyper_unique_add(1.234D, hyper_unique())) AS n,
        |       hyper_unique_estimate(
        |         hyper_unique_add(1.234D, hyper_unique())) AS d""".stripMargin).head()
    assert(r.getLong(0) == 1L)
    assert(math.abs(r.getDouble(1) - 1.0) < 0.01)
  }

  test("hll round=false finalization is the fractional DataSketches estimate") {
    // beyond the coupon-exact range the estimate is non-integral; Spark's
    // hll_sketch_estimate (BIGINT) cast to double would stay integral
    val df = (1 to 20000).toDF("v")
    val est = df.agg(hllSketch($"v", 12).as("h"))
      .select(hyperUniqueEstimate($"h")).head().getDouble(0)
    assert(est != math.floor(est), s"expected fractional estimate, got $est")
    assert(math.abs(est - 20000) < 600)
  }

  test("theta build over a multi-value dimension updates per element " +
      "(cardinality/CardinalityAggregator.java MV iteration)") {
    import graft.plans.SketchFunctions
    val src = Seq(Seq("a", "b"), Seq("b", "c"), Seq[String]())
      .toDF("tags")
    val est = src.agg(
      SketchFunctions.thetaEstimate(SketchFunctions.thetaSketch(col("tags"))).as("nd"))
      .head().getDouble(0)
    assert(est == 3.0) // a, b, c — exact at this cardinality
  }
}
