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

  // ---- Druid BloomKFilter binary interop (BloomKFilter.java:135-148) ----

  /** Reference-format fixture bytes, laid out byte-by-byte per
    * BloomKFilter.java serialize(): 1 byte numHashFunctions, 1 big-endian
    * int long-count, big-endian longs. Values hashed with the hashing the
    * reference uses (org.apache.hive.common.util.Murmur3 — the reference
    * imports exactly this class, BloomKFilter.java:23). */
  private def druidFixture(values: Seq[Any], maxEntries: Long = 100): Array[Byte] = {
    val f = new org.apache.hive.common.util.BloomKFilter(maxEntries)
    values.foreach {
      case s: String => f.addString(s)
      case l: Long => f.addLong(l)
      case d: Double => f.addDouble(d)
      case null => graft.plans.DruidBloomBytes.add(f, null)
      case o => f.addString(o.toString)
    }
    val out = new java.io.ByteArrayOutputStream()
    org.apache.hive.common.util.BloomKFilter.serialize(out, f)
    val bytes = out.toByteArray
    // byte-layout assertions against the documented reference format:
    // [0] = k (≥1), [1..4] = BE long-count, remainder = count*8 bytes
    assert(bytes(0) >= 1)
    val longCount = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
    assert(bytes.length == 5 + longCount * 8,
      "START_OF_SERIALIZED_LONGS=5 + 8*longCount (BloomKFilter.java:68)")
    assert(longCount % 8 == 0, "block-aligned bitset (DEFAULT_BLOCK_SIZE=8)")
    bytes
  }

  test("DRUID_BLOOM_TEST reads reference-format filter bytes (BloomDimFilter.java)") {
    val bf = druidFixture(Seq("abc", "def", 42L, null))
    val df = Seq(("abc", 42L), ("zzz", 42L), ("def", 7L), (null: String, 99L))
      .toDF("s", "n")
    val hit = df.filter(druidBloomTest(lit(bf), $"s")).collect().map(r => Option(r.getString(0)))
    // no false negatives: abc, def, and the added null all match
    assert(hit.toSet.intersect(Set(Some("abc"), Some("def"), None)) ==
      Set(Some("abc"), Some("def"), None))
    val hitN = df.filter(druidBloomTest(lit(bf), $"n")).collect().map(_.getLong(1)).toSet
    assert(hitN.contains(42L) && !hitN.contains(7L) && !hitN.contains(99L))
    // SQL name surface (BloomFilterOperatorConversion BLOOM_FILTER_TEST)
    graft.functions.GraftSqlFunctions.register(spark)
    df.createOrReplaceTempView("bloom_probe")
    val viaSql = spark.sql(
      s"SELECT count(*) FROM bloom_probe WHERE DRUID_BLOOM_TEST(s, X'${bf.map("%02x".format(_)).mkString}')")
      .head().getLong(0)
    assert(viaSql >= 2)
  }

  test("DRUID_BLOOM_FILTER aggregates to reference-format bytes; partials OR-merge (BloomKFilter.java:187)") {
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
    val bytes = li.filter($"l_suppkey" < 4)
      .agg(druidBloomAgg($"l_suppkey", 1500L).as("bf")).head().getAs[Array[Byte]]("bf")
    // the aggregate's output IS the reference layout
    assert(bytes(0) >= 1)
    val longCount = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
    assert(bytes.length == 5 + longCount * 8 && longCount % 8 == 0)
    // distributed merge ≡ single-pass build: same members test true
    val single = new org.apache.hive.common.util.BloomKFilter(1500L)
    li.filter($"l_suppkey" < 4).select($"l_suppkey").distinct().collect()
      .foreach(r => single.addLong(r.getLong(0)))
    val merged = graft.plans.DruidBloomBytes.deserialize(bytes)
    (0L until 4L).foreach { k =>
      assert(merged.testLong(k) == single.testLong(k) || merged.testLong(k))
      assert(merged.testLong(k), s"member $k must test true (no false negatives)")
    }
    // round trip: our bytes ↔ the reference's deserialize→serialize
    val roundTrip = graft.plans.DruidBloomBytes.serialize(merged)
    assert(java.util.Arrays.equals(roundTrip, bytes))
  }

  test("DRUID_BLOOM_TEST over a bloom-bytes COLUMN (filter per row, e.g. " +
      "joined from a filter table) — per-row filters apply independently") {
    val bfA = druidFixture(Seq("alpha"))
    val bfB = druidFixture(Seq("beta"))
    // rows carry their own filter: the value matches row 1 and 4's filters
    val df = Seq(
      (bfA, "alpha"), (bfA, "beta"), (bfB, "alpha"), (bfB, "beta")
    ).toDF("bf", "v")
    val hits = df.filter(druidBloomTest($"bf", $"v"))
      .collect().map(_.getString(1)).toSeq
    assert(hits == Seq("alpha", "beta"))
  }

  test("druid bloom: cross-format build→test through SQL end to end") {
    graft.functions.GraftSqlFunctions.register(spark)
    spark.read.parquet(sf() + "/supplier.parquet").createOrReplaceTempView("supplier_bloom")
    val bf = spark.sql(
      "SELECT DRUID_BLOOM_FILTER(s_name, 100) AS bf FROM supplier_bloom WHERE s_suppkey < 3")
      .head().getAs[Array[Byte]]("bf")
    val names = spark.sql("SELECT s_name FROM supplier_bloom WHERE s_suppkey < 3")
      .collect().map(_.getString(0))
    val f = graft.plans.DruidBloomBytes.deserialize(bf)
    names.foreach(n => assert(f.testString(n)))
    assert(!f.testString("definitely-not-a-supplier-name"))
  }
}
