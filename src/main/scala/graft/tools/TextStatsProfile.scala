package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.sources.Sources

/** Per-signal cost breakdown of the corpus-wide text scoring pipeline
  * (text_stats_by_source / text_gopher_gate): times each analysis family in
  * isolation through the noop sink, min-of-5 — the §1 measurement that
  * decides whether the marker-regex family is worth a fused expression.
  * Usage: runMain graft.tools.TextStatsProfile [sfDir] [cpus]
  */
object TextStatsProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)
    val docs = Sources.parallelizedBy(Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"), col("lang")), col("doc_id"))
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[textprof] $name%-28s min ${ts.min}%.3f med ${ts.sorted.apply(2)}%.3f")
    }
    def agg1(c: org.apache.spark.sql.Column) =
      docs.groupBy(col("source")).agg(sum(c).as("x"))
    time("count only") { docs.groupBy(col("source")).agg(count(lit(1))) }
    time("tokenCount") { agg1(TF.tokenCount(col("text")).cast("long")) }
    time("qualityBp") { agg1(TF.qualityBp(col("text"))) }
    time("langId hits") { agg1(when(TF.langId(col("text")) === col("lang"), 1L).otherwise(0L)) }
    time("lower only") { agg1(length(lower(col("text"))).cast("long")) }
    time("markers en (4 words)") {
      agg1((TF.EnMarkers.map(w => regexp_count(lower(col("text")), lit(s"\\b$w\\b")))
        .reduce(_ + _)).cast("long"))
    }
    time("full text_stats") {
      graft.queries.PipelineQueries.queries("text_stats_by_source")(spark, dir)
    }
    time("gopher gate") {
      graft.queries.PipelineQueries.queries("text_gopher_gate")(spark, dir)
    }
    // ---- shingle-stage isolation (the dedup_minhash/ngram front end) ----
    val d2 = docs.select(col("doc_id"), col("text"))
    time("tokens only") {
      d2.select(col("doc_id"), TF.tokens(col("text")).as("t"))
        .select(col("doc_id"), size(col("t")).as("n"))
    }
    time("shingles size") {
      d2.select(col("doc_id"), TF.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), size(TF.wordShinglesOfTokens(col("__toks"), 5)).as("n"))
    }
    time("shingles explode+hash60") {
      d2.select(col("doc_id"), TF.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), explode(TF.wordShinglesOfTokens(col("__toks"), 5)).as("s"))
        .select(col("doc_id"), TF.hexLong60(col("s")).as("sh"))
    }
    time("ngram full") {
      graft.queries.PipelineQueries.queries("dedup_ngram_jaccard")(spark, dir)
    }
    spark.stop()
  }
}
