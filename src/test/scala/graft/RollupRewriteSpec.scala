package graft

import org.apache.spark.sql.functions._
import graft.plans.RollupRewrite
import graft.plans.RollupRewrite.{Catalog, RollupDef}

class RollupRewriteSpec extends SparkSpecBase {
  import spark.implicits._

  test("aggregate over base table rewrites to rollup scan with equal results") {
    val basePath = sf() + "/lineitem.parquet"
    val rollupDir = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    // materialize the rollup (BatchIngest rollup-on-write shape)
    spark.read.parquet(basePath)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("cnt"), sum($"l_quantity").as("sum_qty"),
        min($"l_quantity").as("min_qty"), max($"l_quantity").as("max_qty"))
      .write.mode("overwrite").parquet(rollupDir)

    val catalog = new Catalog
    catalog.register(RollupDef(
      basePath = basePath,
      rollup = spark.read.parquet(rollupDir),
      dimensions = Set("l_returnflag", "l_linestatus"),
      metricMap = Map("l_quantity" -> ("sum", "sum_qty")),
      countColumn = "cnt"))
    RollupRewrite.enable(spark, catalog)
    try {
      val q = spark.read.parquet(basePath)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("s"))
      // plan scans the rollup, not the base
      val scanned = q.queryExecution.optimizedPlan.collectLeaves().mkString
      assert(scanned.contains("sum_qty") && scanned.contains("cnt"),
        s"plan still scans base: $scanned")
      // results identical to the unrewritten aggregate
      val expected = spark.read.parquet(basePath).groupBy($"l_returnflag")
        .agg(count(lit(1)).cast("long").as("n"), sum($"l_quantity").as("s"))
        .collect().map(_.toString).sorted
      assert(q.collect().map(_.toString).sorted.sameElements(expected))
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("global count(*) over an empty rollup yields 0, not NULL") {
    val basePath = sf() + "/lineitem.parquet"
    val rollupDir = java.nio.file.Files.createTempDirectory("graft_rollup_empty").toString
    spark.read.parquet(basePath).filter(lit(false))
      .groupBy($"l_returnflag").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(rollupDir)
    val catalog = new Catalog
    catalog.register(RollupDef(basePath, spark.read.parquet(rollupDir),
      Set("l_returnflag"), Map.empty, "cnt"))
    RollupRewrite.enable(spark, catalog)
    try {
      val row = spark.read.parquet(basePath).agg(count(lit(1)).as("n")).head()
      assert(!row.isNullAt(0) && row.getLong(0) == 0L)
    } finally { spark.experimental.extraOptimizations = Nil }
  }

  test("an unrelated table sharing the path suffix is not redirected") {
    val base = java.nio.file.Files.createTempDirectory("graft_base").toString
    val decoyDir = java.nio.file.Files.createTempDirectory("graft_decoy").toString
    Seq(("A", 1L), ("B", 2L)).toDF("k", "v").write.mode("overwrite")
      .parquet(base + "/t.parquet")
    // decoy: different table whose path ENDS WITH the registered suffix
    Seq(("A", 10L), ("A", 20L), ("C", 30L)).toDF("k", "v").write.mode("overwrite")
      .parquet(decoyDir + "/base/t.parquet")
    val rollupDir = java.nio.file.Files.createTempDirectory("graft_ru").toString
    spark.read.parquet(base + "/t.parquet").groupBy($"k")
      .agg(count(lit(1)).as("cnt")).write.mode("overwrite").parquet(rollupDir)
    val catalog = new Catalog
    catalog.register(RollupDef("t.parquet", spark.read.parquet(rollupDir),
      Set("k"), Map.empty, "cnt"))
    RollupRewrite.enable(spark, catalog)
    try {
      // suffix-registered path must not hijack either table (exact match only)
      val n = spark.read.parquet(decoyDir + "/base/t.parquet")
        .agg(count(lit(1))).head().getLong(0)
      assert(n == 3L)
    } finally { spark.experimental.extraOptimizations = Nil }
  }

  test("non-derivable aggregates are left untouched") {
    val basePath = sf() + "/lineitem.parquet"
    val catalog = new Catalog
    catalog.register(RollupDef(basePath,
      spark.read.parquet(basePath).limit(1), // bogus rollup; must never be hit
      Set("l_returnflag"), Map.empty, "cnt"))
    RollupRewrite.enable(spark, catalog)
    try {
      // avg is not derivable → no rewrite
      val q1 = spark.read.parquet(basePath).groupBy($"l_returnflag")
        .agg(avg($"l_quantity").as("a"))
      assert(!q1.queryExecution.optimizedPlan.toString.contains("limit"))
      // grouping by a non-dimension → no rewrite
      val q2 = spark.read.parquet(basePath).groupBy($"l_suppkey")
        .agg(sum($"l_quantity").as("s"))
      assert(q2.count() > 0)
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("a filter on rollup dimensions redirects to a filtered rollup scan — " +
      "the common rollup query shape (GroupByStrategyV2)") {
    val basePath = sf() + "/lineitem.parquet"
    val rollupDir = java.nio.file.Files.createTempDirectory("graft_rollup_f").toString
    spark.read.parquet(basePath)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("cnt"), sum($"l_quantity").as("sum_qty"))
      .write.mode("overwrite").parquet(rollupDir)
    val catalog = new Catalog
    catalog.register(RollupDef(basePath, spark.read.parquet(rollupDir),
      Set("l_returnflag", "l_linestatus"),
      Map("l_quantity" -> ("sum", "sum_qty")), "cnt"))
    RollupRewrite.enable(spark, catalog)
    try {
      // WHERE on a dimension: redirected, with the predicate applied to the
      // rollup scan
      val q = spark.read.parquet(basePath)
        .filter($"l_returnflag" === "A" && $"l_linestatus" =!= "X")
        .groupBy($"l_linestatus")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("s"))
      val scanned = q.queryExecution.optimizedPlan.collectLeaves().mkString
      assert(scanned.contains("sum_qty"), s"filtered agg still scans base: $scanned")
      val expected = spark.read.parquet(basePath)
        .filter($"l_returnflag" === "A")
        .groupBy($"l_linestatus")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("s"))
        .collect().map(_.toString).sorted
      assert(q.collect().map(_.toString).sorted.sameElements(expected))

      // IN-list predicate redirects too
      val q2 = spark.read.parquet(basePath)
        .filter($"l_returnflag".isin("A", "R"))
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      val scanned2 = q2.queryExecution.optimizedPlan.collectLeaves().mkString
      assert(scanned2.contains("sum_qty") || scanned2.contains("cnt"),
        s"IN-filtered agg still scans base: $scanned2")

      // a predicate on a NON-dimension column must NOT redirect (rollup
      // rows cannot answer it)
      val q3 = spark.read.parquet(basePath)
        .filter($"l_quantity" > 10)
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      val scanned3 = q3.queryExecution.optimizedPlan.collectLeaves().mkString
      assert(!scanned3.contains("sum_qty"),
        s"metric-filtered agg wrongly redirected: $scanned3")
      // and still answers correctly from the base
      val expect3 = spark.read.parquet(basePath).filter($"l_quantity" > 10)
        .groupBy($"l_returnflag").agg(count(lit(1))).collect().map(_.toString).sorted
      assert(q3.collect().map(_.toString).sorted.sameElements(expect3))
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }
}
