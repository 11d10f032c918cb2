package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.NativeQuery

/** The bounded expression-lambda aggregator (ExpressionLambdaAggregatorFactory
  * .java lifecycle): incremental fold + combine with a maxSizeBytes-capped
  * buffer, replacing the collect_list compilation whose partial state was the
  * whole group. */
class ExprLambdaBoundedSpec extends SparkSpecBase {
  import spark.implicits._

  private def resolver: NativeQuery.Resolver =
    name => spark.read.parquet(s"${sf()}/$name.parquet")

  private def run(json: String): DataFrame = NativeQuery.run(spark, json, resolver)

  test("lambda fold compiles to the bounded aggregate — no collect_list in the plan") {
    val df = run(
      """{
        "queryType": "groupBy",
        "dataSource": "lineitem",
        "dimensions": [{"type": "default", "dimension": "l_returnflag"}],
        "aggregations": [
          {"type": "expression", "name": "sumsq",
           "fields": ["l_quantity"],
           "initialValue": "0.0",
           "fold": "__acc + \"l_quantity\" * \"l_quantity\"",
           "combine": "__acc + sumsq"}
        ],
        "limitSpec": {"type": "default", "columns": [{"dimension": "l_returnflag"}]}
      }""")
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("collect_list"),
      s"lambda agg must not materialize the group:\n$physical")
    assert(physical.contains("expression_lambda_fold"))
    // values still match the raw sum of squares
    val expect = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum($"l_quantity" * $"l_quantity").as("sumsq"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    df.collect().foreach(r => assert(math.abs(r.getDouble(1) - expect(r.getString(0))) < 1e-6))
  }

  test("default combine (single field, no combine expr) merges partials — " +
      "ExpressionLambdaAggregatorFactory.java:135-145") {
    // 32 input partitions force real partial-aggregate merges through
    // serialize/deserialize/combine
    val many = spark.range(0, 100000).repartition(32)
      .select((col("id") % 7).cast("string").as("g"), col("id").cast("long").as("v"))
    many.createOrReplaceTempView("lambda_src")
    val df = NativeQuery.run(spark,
      """{
        "queryType": "groupBy",
        "dataSource": "lambda_src",
        "dimensions": ["g"],
        "aggregations": [
          {"type": "expression", "name": "total",
           "fields": ["v"],
           "initialValue": "0",
           "fold": "__acc + v"}
        ],
        "limitSpec": {"type": "default", "columns": [{"dimension": "g"}]}
      }""", name => spark.table(name))
    val expect = many.groupBy("g").agg(sum("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("hyper_unique accumulator folds and merges through the bounded path") {
    val df = run(
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
      }""")
    assert(!df.queryExecution.executedPlan.toString.contains("collect_list"))
    val expect = spark.read.parquet(s"${sf()}/customer.parquet")
      .groupBy("c_mktsegment").agg(countDistinct("c_nationkey").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    df.collect().foreach(r => assert(r.getDouble(1) == expect(r.getString(0))))
  }

  test("string accumulator copies out of reused row buffers (maxSizeBytes below)") {
    val src = Seq(("a", "x"), ("a", "y"), ("b", "z")).toDF("g", "s")
    src.createOrReplaceTempView("lambda_str_src")
    val df = NativeQuery.run(spark,
      """{
        "queryType": "groupBy",
        "dataSource": "lambda_str_src",
        "dimensions": ["g"],
        "aggregations": [
          {"type": "expression", "name": "joined",
           "fields": ["s"],
           "initialValue": "''",
           "fold": "concat(__acc, s)",
           "combine": "concat(__acc, joined)"}
        ],
        "limitSpec": {"type": "default", "columns": [{"dimension": "g"}]}
      }""", name => spark.table(name))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a").sorted == "xy" && got("b") == "z")
  }

  test("maxSizeBytes caps the accumulator like the reference's buffer " +
      "(ExpressionLambdaAggregatorFactory.java:68,193)") {
    val big = spark.range(0, 5000)
      .select(lit("g").as("g"), concat(lit("row"), col("id").cast("string")).as("s"))
    big.createOrReplaceTempView("lambda_big_src")
    val e = intercept[Exception] {
      NativeQuery.run(spark,
        """{
          "queryType": "groupBy",
          "dataSource": "lambda_big_src",
          "dimensions": ["g"],
          "aggregations": [
            {"type": "expression", "name": "joined",
             "fields": ["s"],
             "initialValue": "''",
             "fold": "concat(__acc, s)",
             "combine": "concat(__acc, joined)",
             "maxSizeBytes": 1024}
          ]
        }""", name => spark.table(name)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => String.valueOf(c.getMessage).contains("maxSizeBytes")))
  }

  test("large single group stays bounded (no group materialization)") {
    // one group, 500k rows: the collected compilation would move 500k rows
    // into one task's list; the bounded path moves one scalar per partition
    val big = spark.range(0, 500000).repartition(16)
      .select(lit("all").as("g"), col("id").cast("double").as("v"))
    big.createOrReplaceTempView("lambda_huge_src")
    val df = NativeQuery.run(spark,
      """{
        "queryType": "groupBy",
        "dataSource": "lambda_huge_src",
        "dimensions": ["g"],
        "aggregations": [
          {"type": "expression", "name": "total",
           "fields": ["v"],
           "initialValue": "0.0",
           "fold": "__acc + v",
           "combine": "__acc + total"}
        ]
      }""", name => spark.table(name))
    assert(!df.queryExecution.executedPlan.toString.contains("collect_list"))
    val r = df.head()
    assert(r.getDouble(1) == (499999.0 * 500000.0) / 2.0)
  }

  test("multi-field fold with no combine falls back to the collected " +
      "compilation (lenient superset; the reference rejects it)") {
    val src = Seq(("a", 1L, 2L), ("a", 3L, 4L)).toDF("g", "x", "y")
    src.createOrReplaceTempView("lambda_mf_src")
    val df = NativeQuery.run(spark,
      """{
        "queryType": "groupBy",
        "dataSource": "lambda_mf_src",
        "dimensions": ["g"],
        "aggregations": [
          {"type": "expression", "name": "total",
           "fields": ["x", "y"],
           "initialValue": "0",
           "fold": "__acc + x * y"}
        ]
      }""", name => spark.table(name))
    assert(df.head().getLong(1) == 1L * 2L + 3L * 4L)
  }

  test("type widening fixpoint: LONG init + DOUBLE field settles on DOUBLE") {
    val src = Seq(("a", 1.5), ("a", 2.5)).toDF("g", "v")
    src.createOrReplaceTempView("lambda_widen_src")
    val df = NativeQuery.run(spark,
      """{
        "queryType": "groupBy",
        "dataSource": "lambda_widen_src",
        "dimensions": ["g"],
        "aggregations": [
          {"type": "expression", "name": "total",
           "fields": ["v"],
           "initialValue": "0",
           "fold": "__acc + v",
           "combine": "__acc + total"}
        ]
      }""", name => spark.table(name))
    assert(!df.queryExecution.executedPlan.toString.contains("collect_list"))
    assert(df.head().getDouble(1) == 4.0)
  }

  test("null-handling knobs: shouldAggregateNullInputs skips null rows, " +
      "isNullUnlessAggregated nulls never-fed groups " +
      "(ExpressionLambdaAggregatorFactory.java:108-131, " +
      "ExpressionLambdaAggregator.java:45-79)") {
    val src = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)),
      ("b", None)).toDF("g", "v")
    src.createOrReplaceTempView("lambda_nulls_src")
    def agg(knobs: String): Map[String, Any] =
      NativeQuery.run(spark,
        s"""{
          "queryType": "groupBy",
          "dataSource": "lambda_nulls_src",
          "dimensions": ["g"],
          "aggregations": [
            {"type": "expression", "name": "total",
             "fields": ["v"],
             "initialValue": "0",
             "fold": "__acc + nvl(v, 100)",
             "combine": "__acc + total"$knobs}
          ],
          "limitSpec": {"type": "default", "columns": [{"dimension": "g"}]}
        }""", name => spark.table(name))
        .collect().map(r => r.getString(0) -> r.get(1)).toMap
    // default: null inputs aggregate (nvl sees them), every group has a value
    val all = agg("")
    assert(all("a") == 103L && all("b") == 100L)
    // shouldAggregateNullInputs=false: null rows skipped BEFORE the fold —
    // group b never aggregates and isNullUnlessAggregated nulls it
    val skip = agg(""", "shouldAggregateNullInputs": false""")
    assert(skip("a") == 3L)
    assert(skip("b") == null)
    // isNullUnlessAggregated=false: a never-fed group keeps the folded init
    val keep = agg(
      """, "shouldAggregateNullInputs": false, "isNullUnlessAggregated": false""")
    assert(keep("a") == 3L && keep("b") == 0L)
  }

  test("array accumulator: array_set_add builds a bounded distinct set") {
    val src = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", "z")).toDF("g", "s")
    src.createOrReplaceTempView("lambda_arr_src")
    val df = NativeQuery.run(spark,
      """{
        "queryType": "groupBy",
        "dataSource": "lambda_arr_src",
        "dimensions": ["g"],
        "aggregations": [
          {"type": "expression", "name": "vals",
           "fields": ["s"],
           "initialValue": "<STRING>[]",
           "fold": "array_set_add(__acc, s)",
           "combine": "array_set_add_all(__acc, vals)"}
        ],
        "limitSpec": {"type": "default", "columns": [{"dimension": "g"}]}
      }""", name => spark.table(name))
    assert(!df.queryExecution.executedPlan.toString.contains("collect_list"))
    val got = df.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).sorted.mkString(",")).toMap
    assert(got == Map("a" -> "x,y", "b" -> "z"))
  }
}
