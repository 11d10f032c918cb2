package graft
import org.apache.spark.sql.SparkSession
object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    for (n <- Seq("filter_like_regex_search", "timeseries_desc_limit",
        "join_star_region_revenue", "embed_lsh_buckets",
        "timeseries_grand_total", "native_timeseries",
        "filter_selector_in_bound", "lookup_enrich", "multimodal_frames")) {
      val fn = SparkEntry.queries(n)
      time(n + " run1") { fn(spark, dir).count() }
      time(n + " run2") { fn(spark, dir).count() }
    }
    println("[probe] plan for filter_like_regex_search:")
    SparkEntry.queries("filter_like_regex_search")(spark, dir).explain("formatted")
    spark.stop()
  }
}
