package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.NativeQuery

/** r15: canonical sketch-fold fusion (plans.FusedLambdaFold). The
  * expression-lambda aggregator with the exact hyper_unique()/
  * hyper_unique_add (or bloom_filter()/bloom_filter_add) monoid compiles to
  * the native collector TypedImperativeAggregate instead of the interpreted
  * per-row fold — byte-identical state, ~8x less per-row work (no
  * deserialize/reserialize of the collector per input row).
  *
  * Reference: the state compatibility contract is the POINT of
  * HyperUniqueExpressions.java (processing/.../query/expression/) — lambda-
  * built collectors must interoperate with the hyperUnique aggregator
  * (TopNQueryRunnerTest.testExpressionAggregatorComplex pins carExpr == car).
  */
class ExprLambdaFusionSpec extends SparkSpecBase {
  import spark.implicits._

  private def resolver: NativeQuery.Resolver =
    name => spark.read.parquet(s"${sf()}/$name.parquet")

  private def run(json: String): DataFrame = NativeQuery.run(spark, json, resolver)

  private val hllJson =
    """{
      "queryType": "groupBy",
      "dataSource": "customer",
      "dimensions": [{"type": "default", "dimension": "c_mktsegment"}],
      "aggregations": [
        {"type": "expression", "name": "nd_nation",
         "fields": ["c_nationkey"],
         "initialValue": "hyper_unique()",
         "fold": "hyper_unique_add(\"c_nationkey\", __acc)",
         "finalize": "round(hyper_unique_estimate(o))"}
      ],
      "limitSpec": {"type": "default", "columns": [{"dimension": "c_mktsegment"}]}
    }"""

  test("canonical hyper_unique fold compiles to the NATIVE aggregate — " +
      "plan assertion (r14 verdict ask #1)") {
    val physical = run(hllJson).queryExecution.executedPlan.toString
    assert(physical.contains("hllc_lambda_fold"),
      s"expected the fused native aggregate in:\n$physical")
    assert(!physical.contains("expression_lambda_fold"),
      s"interpreted lambda fold must be fused away:\n$physical")
    assert(!physical.contains("collect_list"))
  }

  test("fused estimate equals the exact distinct count (25 nations, " +
      "HLLC exact at this cardinality)") {
    val expect = spark.read.parquet(s"${sf()}/customer.parquet")
      .groupBy("c_mktsegment").agg(countDistinct("c_nationkey").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    run(hllJson).collect().foreach(r =>
      assert(r.getDouble(1) == expect(r.getString(0))))
  }

  test("fused HLLC state is BYTE-IDENTICAL to the interpreted fold's " +
      "(shared hash functions + V1 layout)") {
    val customer = spark.read.parquet(s"${sf()}/customer.parquet")
    val schema = customer.schema
    val fused = graft.functions.ExpressionLambda.fold(spark, schema,
      Seq("c_nationkey"), "__acc", "hyper_unique()",
      "hyper_unique_add(\"c_nationkey\", __acc)", None, None, "state")
    val interpreted = graft.functions.ExpressionLambda.foldCollected(
      Seq("c_nationkey"), "__acc", "hyper_unique()",
      "hyper_unique_add(\"c_nationkey\", __acc)", None)
    val rows = customer.groupBy("c_mktsegment")
      .agg(fused.as("fused"), interpreted.as("interp")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]]("fused"), r.getAs[Array[Byte]]("interp")),
        s"state bytes diverged for ${r.get(0)}")
    }
  }

  test("the subquery refold consumes fused inner state identically " +
      "(UNFINALIZED complex state across the hop)") {
    val innerJson =
      """{
        "queryType": "groupBy",
        "dataSource": "orders",
        "timeColumn": "o_orderdate",
        "dimensions": [{"type": "default", "dimension": "o_orderpriority",
                        "outputName": "prio"}],
        "aggregations": [
          {"type": "count", "name": "cnt"},
          {"type": "expression", "name": "status_state",
           "fields": ["o_orderstatus"], "accumulatorIdentifier": "acc",
           "initialValue": "hyper_unique()",
           "fold": "hyper_unique_add(o_orderstatus, acc)",
           "combine": "hyper_unique_add(status_state, acc)"}]
      }"""
    // the inner query (the one the subquery walker inlines, where the 3.37 s
    // went pre-fusion) plans the NATIVE aggregate — explicit combine form
    val innerPlan = run(innerJson).queryExecution.executedPlan.toString
    assert(innerPlan.contains("hllc_lambda_fold"), s"inner plan:\n$innerPlan")
    assert(!innerPlan.contains("expression_lambda_fold"))
    // and the OUTER hyperUnique refold over the fused state is exact
    val df = run(
      s"""{
        "queryType": "groupBy",
        "dataSource": {"type": "query", "query": $innerJson},
        "aggregations": [
          {"type": "longSum", "name": "cnt", "fieldName": "cnt"},
          {"type": "hyperUnique", "name": "nd_status",
           "fieldName": "status_state", "round": true}]
      }""")
    val r = df.head()
    val exact = spark.read.parquet(s"${sf()}/orders.parquet")
      .select(countDistinct("o_orderstatus")).head().getLong(0)
    assert(r.getAs[Long]("nd_status") == exact)
  }

  test("canonical bloom_filter fold fuses to the native aggregate with " +
      "byte-identical filter bytes") {
    val customer = spark.read.parquet(s"${sf()}/customer.parquet")
    val fused = graft.functions.ExpressionLambda.fold(spark, customer.schema,
      Seq("c_mktsegment"), "__acc", "bloom_filter(1000)",
      "bloom_filter_add(\"c_mktsegment\", __acc)", None, None, "blm")
    val interpreted = graft.functions.ExpressionLambda.foldCollected(
      Seq("c_mktsegment"), "__acc", "bloom_filter(1000)",
      "bloom_filter_add(\"c_mktsegment\", __acc)", None)
    val df = customer.groupBy("c_nationkey")
      .agg(fused.as("fused"), interpreted.as("interp"))
    assert(df.queryExecution.executedPlan.toString.contains("bloom_lambda_fold"))
    df.collect().foreach { r =>
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]]("fused"), r.getAs[Array[Byte]]("interp")))
    }
    // and the fused filter answers membership like the reference's test fn
    val global = customer.agg(fused.as("f")).head().getAs[Array[Byte]]("f")
    val f = graft.plans.DruidBloomBytes.deserialize(global)
    assert(graft.plans.DruidBloomBytes.test(f,
      org.apache.spark.unsafe.types.UTF8String.fromString("BUILDING")))
    assert(!graft.plans.DruidBloomBytes.test(f,
      org.apache.spark.unsafe.types.UTF8String.fromString("NO_SUCH_SEGMENT")))
  }

  test("null semantics survive fusion: shouldAggregateNullInputs=false + " +
      "isNullUnlessAggregated null a never-fed group " +
      "(ExpressionLambdaAggregator.java:45-79)") {
    val src = Seq(("a", Some("x")), ("a", None), ("b", None))
      .toDF("g", "v")
    src.createOrReplaceTempView("fusion_nulls_src")
    def agg(knobs: String): (String, Map[String, Any]) = {
      val df = NativeQuery.run(spark,
        s"""{
          "queryType": "groupBy",
          "dataSource": "fusion_nulls_src",
          "dimensions": ["g"],
          "aggregations": [
            {"type": "expression", "name": "state",
             "fields": ["v"],
             "initialValue": "hyper_unique()",
             "fold": "hyper_unique_add(v, __acc)",
             "finalize": "round(hyper_unique_estimate(o))"$knobs}
          ],
          "limitSpec": {"type": "default", "columns": [{"dimension": "g"}]}
        }""", name => spark.table(name))
      (df.queryExecution.executedPlan.toString,
        df.collect().map(r => r.getString(0) -> r.get(1)).toMap)
    }
    // default: a null value passes the collector through — group b still
    // aggregated (estimate 0.0)
    val (plan1, all) = agg("")
    assert(plan1.contains("hllc_lambda_fold"))
    assert(all("a") == 1.0 && all("b") == 0.0)
    // skip-null-rows mode: group b never aggregates → null result
    val (plan2, skip) = agg(""", "shouldAggregateNullInputs": false""")
    assert(plan2.contains("hllc_lambda_fold"))
    assert(skip("a") == 1.0)
    assert(skip("b") == null)
  }

  test("a TRANSFORMED fold value fuses under the default null knobs " +
      "(value computed per row, fold semantics unchanged)") {
    val df = run(
      """{
        "queryType": "groupBy",
        "dataSource": "customer",
        "dimensions": [{"type": "default", "dimension": "c_mktsegment"}],
        "aggregations": [
          {"type": "expression", "name": "state",
           "fields": ["c_nationkey"],
           "initialValue": "hyper_unique()",
           "fold": "hyper_unique_add(concat('n', \"c_nationkey\"), __acc)",
           "combine": "hyper_unique_add(state, __acc)",
           "finalize": "round(hyper_unique_estimate(o))"}
        ],
        "limitSpec": {"type": "default", "columns": [{"dimension": "c_mktsegment"}]}
      }""")
    assert(df.queryExecution.executedPlan.toString.contains("hllc_lambda_fold"))
    // concat('n', x) is injective over the nation keys → exact count
    val expect = spark.read.parquet(s"${sf()}/customer.parquet")
      .groupBy("c_mktsegment").agg(countDistinct("c_nationkey").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    df.collect().foreach(r => assert(r.getDouble(1) == expect(r.getString(0))))
  }

  test("NON-canonical folds stay on the interpreted aggregate (fusion is " +
      "a recognizer, not a rewrite of arbitrary lambdas)") {
    // the fold adds a TRANSFORMED value in skip-null-rows mode: "row has a
    // null input" and "value is null" no longer coincide, so fusion must
    // decline and the bounded interpreted path keeps the exact semantics
    val df = run(
      """{
        "queryType": "groupBy",
        "dataSource": "customer",
        "dimensions": [{"type": "default", "dimension": "c_mktsegment"}],
        "aggregations": [
          {"type": "expression", "name": "state",
           "fields": ["c_nationkey"],
           "initialValue": "hyper_unique()",
           "fold": "hyper_unique_add(concat('n', \"c_nationkey\"), __acc)",
           "combine": "hyper_unique_add(state, __acc)",
           "finalize": "round(hyper_unique_estimate(o))",
           "shouldAggregateNullInputs": false}
        ],
        "limitSpec": {"type": "default", "columns": [{"dimension": "c_mktsegment"}]}
      }""")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("expression_lambda_fold"),
      s"transformed-value fold in skip-null mode must not fuse:\n$physical")
    val expect = spark.read.parquet(s"${sf()}/customer.parquet")
      .groupBy("c_mktsegment").agg(countDistinct("c_nationkey").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    df.collect().foreach(r => assert(r.getDouble(1) == expect(r.getString(0))))
  }
}
