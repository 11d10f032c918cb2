package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for segment_metadata_approx (VERDICT r17 item 7):
  * times each analysis family in isolation over the same projected scan.
  * Usage: runMain graft.tools.SegMetaProfile [sfDir]
  */
object SegMetaProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val ds = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val fields = ds.schema.fields.toSeq
    def bench(name: String)(aggs: Seq[org.apache.spark.sql.Column]): Unit = {
      // warm
      ds.agg(aggs.head, aggs.tail: _*).write.format("noop").mode("overwrite").save()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        ds.agg(aggs.head, aggs.tail: _*).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[segmeta] $name%-22s min=${ts.min}%.3f  med=${ts.sorted.apply(2)}%.3f")
    }
    bench("count_only")(Seq(count(lit(1)).as("n")))
    bench("hll_rsd1pct")(fields.zipWithIndex.map { case (f, i) =>
      approx_count_distinct(col(f.name), 0.01).as(s"c$i") })
    bench("hll_rsd5pct")(fields.zipWithIndex.map { case (f, i) =>
      approx_count_distinct(col(f.name), 0.05).as(s"c$i") })
    bench("nulls")(fields.zipWithIndex.map { case (f, i) =>
      sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"n$i") })
    bench("minmax_str")(fields.zipWithIndex.flatMap { case (f, i) =>
      Seq(min(col(f.name)).cast("string").as(s"mn$i"),
        max(col(f.name)).cast("string").as(s"mx$i")) })
    bench("minmax_native")(fields.zipWithIndex.flatMap { case (f, i) =>
      Seq(min(col(f.name)).as(s"mn$i"), max(col(f.name)).as(s"mx$i")) })
    bench("size_len_cast")(fields.zipWithIndex.map { case (f, i) =>
      sum(length(col(f.name).cast("string")).cast("long")).as(s"s$i") })
    bench("all_together")(fields.zipWithIndex.flatMap { case (f, i) =>
      Seq(approx_count_distinct(col(f.name), 0.01).as(s"c$i"),
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"n$i"),
        min(col(f.name)).cast("string").as(s"mn$i"),
        max(col(f.name)).cast("string").as(s"mx$i"),
        sum(length(col(f.name).cast("string")).cast("long")).as(s"s$i"))
    } :+ count(lit(1)).as("numRows"))
    bench("hll_sketch_lgk14")(fields.zipWithIndex.map { case (f, i) =>
      hll_sketch_estimate(hll_sketch_agg(col(f.name).cast("string"), lit(14))).as(s"c$i") })
    bench("all_with_sketch")(fields.zipWithIndex.flatMap { case (f, i) =>
      Seq(hll_sketch_estimate(hll_sketch_agg(col(f.name).cast("string"), lit(14))).as(s"c$i"),
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"n$i"),
        min(col(f.name)).cast("string").as(s"mn$i"),
        max(col(f.name)).cast("string").as(s"mx$i"),
        sum(length(col(f.name).cast("string")).cast("long")).as(s"s$i"))
    } :+ count(lit(1)).as("numRows"))
    spark.stop()
  }
}
