package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Sources

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query definitions live in graft.queries.* modules, one per SURVEY §2 area;
  * this object just merges them.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TimeseriesQuery(
      timeColumn = "l_shipdate",
      granularity = PeriodGranularity("P1M"),
      filter = col("l_returnflag") === "A",
      aggregations = Seq(
        Agg("revenue", sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))),
        Agg("cnt", count(lit(1))))
    ).run(Sources.table(spark, "/root/testdata/sf0.001", "lineitem"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
    graft.queries.FilterQueries.queries ++
    graft.queries.JoinQueries.queries ++
    graft.queries.AggQueries.queries ++
    graft.queries.MvTimeQueries.queries ++
    graft.queries.PipelineQueries.queries ++
    graft.queries.CurationQueries.queries ++
    graft.queries.EmbeddingQueries.queries ++
    graft.queries.MultimodalQueries.queries ++
    graft.queries.SketchQueries.queries ++
    graft.queries.NativeQueries.queries ++
    graft.queries.RollupQueries.queries ++
    graft.queries.SupersetQueries.queries

  /** Queries that run in Bench but not through the Verify/DuckDB oracle
    * gate: their results are approximate by construction (never
    * hash-matchable), so correctness is pinned by dedicated specs instead
    * (e.g. SegmentMetadataSinglePassSpec vs the exact mode). Keeping them
    * out of `queries` keeps the gate all-green-by-construction. */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.benchOnly

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
    graft.queries.FilterQueries.oracle ++
    graft.queries.JoinQueries.oracle ++
    graft.queries.AggQueries.oracle ++
    graft.queries.MvTimeQueries.oracle ++
    graft.queries.PipelineQueries.oracle ++
    graft.queries.CurationQueries.oracle ++
    graft.queries.EmbeddingQueries.oracle ++
    graft.queries.MultimodalQueries.oracle ++
    graft.queries.SketchQueries.oracle ++
    graft.queries.NativeQueries.oracle ++
    graft.queries.RollupQueries.oracle ++
    graft.queries.SupersetQueries.oracle
}
