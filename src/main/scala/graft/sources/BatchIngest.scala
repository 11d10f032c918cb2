package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Agg, PeriodGranularity}

/** Batch ingestion (SURVEY §2.3): InputFormats, TransformSpec,
  * PartitionsSpec, rollup-on-write, time-partitioned layout.
  *
  * Reference: core/.../data/input/impl (input sources/formats),
  * processing/.../segment/transform/TransformSpec.java (ingest transforms),
  * core/.../indexer/partitions/PartitionsSpec.java:33-37 (single_dim /
  * range / hashed / dynamic), segment granularity time chunking.
  *
  * Scale mapping: segment granularity → parquet `partitionBy` on the
  * truncated time column (readers prune whole directories on time
  * predicates); hashed partitioning → `repartition(n, dims)` (co-locates
  * later joins/groupBys on those dims); range partitioning →
  * `repartitionByRange` (clusters + enables min/max skipping on the sort
  * dim); dynamic → AQE-coalesced default.
  */
object BatchIngest {

  sealed trait PartitionsSpec
  case object DynamicPartitions extends PartitionsSpec
  final case class HashedPartitions(numShards: Int, dims: Seq[String]) extends PartitionsSpec
  final case class RangePartitions(numShards: Int, dims: Seq[String]) extends PartitionsSpec

  final case class RollupSpec(
      granularity: PeriodGranularity,
      dimensions: Seq[String],
      aggregations: Seq[Agg])

  final case class IngestSpec(
      inputPath: String,
      inputFormat: String = "parquet",          // csv | json | parquet | orc | avro
      formatOptions: Map[String, String] = Map.empty,
      timeColumn: String = "__time",
      timeParseExpr: Column = null,             // timestampSpec: expr producing the time col
      transforms: Seq[(String, Column)] = Nil,  // TransformSpec derived columns
      filter: Column = null,                    // TransformSpec filter
      segmentGranularity: String = "P1D",       // time-chunk directory layout
      partitionsSpec: PartitionsSpec = DynamicPartitions,
      rollup: Option[RollupSpec] = None)

  /** Read per inputFormat (InputSource × InputFormat). */
  def read(spark: SparkSession, spec: IngestSpec): DataFrame = {
    val r = spark.read.options(spec.formatOptions)
    spec.inputFormat match {
      case "csv"     => r.option("header", spec.formatOptions.getOrElse("header", "true")).csv(spec.inputPath)
      case "json"    => r.json(spec.inputPath)
      case "parquet" => r.parquet(spec.inputPath)
      case "orc"     => r.orc(spec.inputPath)
      case "avro"    => r.format("avro").load(spec.inputPath)
      case f         => throw new IllegalArgumentException(s"unknown inputFormat: $f")
    }
  }

  /** TransformSpec + rollup, producing the rows to publish. */
  def prepare(df: DataFrame, spec: IngestSpec): DataFrame = {
    val timed = if (spec.timeParseExpr == null) df
                else df.withColumn(spec.timeColumn, spec.timeParseExpr)
    val withCols = spec.transforms.foldLeft(timed) { case (d, (n, c)) => d.withColumn(n, c) }
    val filtered = if (spec.filter == null) withCols else withCols.filter(spec.filter)
    spec.rollup match {
      case None => filtered
      case Some(r) =>
        val aggCols = r.aggregations.map(_.aliased)
        filtered
          .groupBy(r.granularity.bucket(col(spec.timeColumn)).as(spec.timeColumn) +:
            r.dimensions.map(col): _*)
          .agg(aggCols.head, aggCols.tail: _*)
    }
  }

  /** Publish: time-chunked + partitioned parquet (the segment layout). */
  def write(df: DataFrame, spec: IngestSpec, outPath: String): Unit = {
    val chunked = df.withColumn("__chunk",
      date_format(PeriodGranularity(spec.segmentGranularity).bucket(col(spec.timeColumn)),
        "yyyy-MM-dd'T'HH"))
    val arranged = spec.partitionsSpec match {
      case DynamicPartitions          => chunked
      case HashedPartitions(n, dims)  => chunked.repartition(n, dims.map(col): _*)
      case RangePartitions(n, dims)   => chunked.repartitionByRange(n, dims.map(col): _*)
    }
    arranged.write.mode(SaveMode.Overwrite).partitionBy("__chunk").parquet(outPath)
  }

  def run(spark: SparkSession, spec: IngestSpec, outPath: String): DataFrame = {
    write(prepare(read(spark, spec), spec), spec, outPath)
    spark.read.parquet(outPath)
  }
}
