package graft

import org.apache.spark.sql.functions._
import graft.plans.BloomFunctions._

class BloomSpec extends SparkSpecBase {
  import spark.implicits._

  test("bloom filter: no false negatives; prunes a fact scan") {
    val supp = spark.read.parquet(sf() + "/supplier.parquet")
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
    // build a filter over a subset of supplier keys
    val subset = supp.filter($"s_suppkey" < 5)
    val bloomRow = subset.agg(bloomFilterAgg($"s_suppkey").as("bf")).head()
    val bf = bloomRow.getAs[Array[Byte]]("bf")
    // membership test as a pushed predicate over the fact table
    val pruned = li.filter(mightContain(lit(bf), $"l_suppkey"))
    val exact = li.filter($"l_suppkey" < 5)
    // bloom keeps every true member (no false negatives)
    assert(pruned.count() >= exact.count())
    // and with these sizes the FP rate is ~0 → exact after re-check
    assert(pruned.filter($"l_suppkey" < 5).count() == exact.count())
  }

  test("bloom as pre-join semi filter reduces rows like Druid's bloom DimFilter") {
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
    val keys = (0L to 2L)
    val bf = spark.createDataset(keys).toDF("k")
      .agg(bloomFilterAgg($"k").as("bf")).head().getAs[Array[Byte]]("bf")
    val kept = li.filter(mightContain(lit(bf), $"l_suppkey")).count()
    assert(kept < li.count())
    assert(kept >= li.filter($"l_suppkey".isin(keys: _*)).count())
  }
}
