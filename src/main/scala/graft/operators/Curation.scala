package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Data-curation operators for training-data pipelines: deterministic
  * sampling and token-budget sequence packing.
  *
  * Scale design notes (100 TB):
  *  - Sampling is HASH-based, not rand()-based: `hash(id) % N < k` is
  *    reproducible across runs/retries (a failed task re-samples the same
  *    rows), needs no state, and composes with pushed-down filters — the
  *    standard way to cut a deterministic slice of a petabyte corpus.
  *    rand() sampling breaks exactly-once semantics under task retry.
  *  - Stratified sampling ranks by the same hash within each stratum: one
  *    window per stratum, no global sort, no collect.
  *  - Sequence packing shuffles once (by group), then streams each
  *    partition in order — the greedy first-fit state machine is O(1)
  *    memory per partition. The window-based chunker is the fully
  *    declarative variant (chunks may overflow by at most one document).
  */
object Curation {

  /** Deterministic hash sample: keep rows where md5-derived hash of the id
    * falls in `keep` of `buckets`. Reproducible across runs and engines
    * (the DuckDB oracle mirrors the hash bit-exactly). */
  def hashSample(df: DataFrame, idCol: String, buckets: Int, keep: Int): DataFrame =
    df.filter(TF.hexLong60(col(idCol).cast("string")) % buckets < keep)

  /** Deterministic stratified sample: `perStratum` rows per stratum, ranked
    * by the id hash (a reproducible shuffle within each stratum). */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(TF.hexLong60(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perStratum)
  }

  /** Token-budget chunking (declarative packing): documents in id order per
    * group are assigned chunk = floor(tokens-before-this-doc / budget).
    * One window + one aggregate, fully codegen'd; a chunk can overflow the
    * budget by at most one document (the standard streaming approximation).
    */
  def packChunks(df: DataFrame, groupCol: String, idCol: String,
      tokCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    df.select(col(groupCol), col(idCol), tokCol.cast("long").as("ntok"))
      .withColumn("cum", sum(col("ntok")).over(w))
      .withColumn("chunk_id",
        floor((col("cum") - col("ntok")).cast("double") / budget.toDouble).cast("long"))
      .groupBy(col(groupCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("chunk_tokens"))
  }

  /** Greedy first-fit sequence packing (capacity-respecting): documents in
    * id order per group fill a bin until the next doc would overflow
    * `budget`, then a new bin starts. A doc larger than the budget gets a
    * bin of its own. This is inherently a sequential scan with state — not
    * window-expressible — so it runs as a per-partition state machine after
    * one shuffle by group (mapPartitions, SURVEY §7.3 case (d): genuine
    * per-partition imperative logic). */
  def packGreedy(df: DataFrame, groupCol: String, idCol: String,
      tokCol: Column, budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(col(groupCol).cast("string").as("g"), col(idCol).cast("long").as("id"),
        tokCol.cast("long").as("ntok"))
      .repartition(col("g"))
      .sortWithinPartitions(col("g"), col("id"))
      .as[(String, Long, Long)]
    prepared.mapPartitions { it =>
      // groups are contiguous within the sorted partition; state resets at
      // each group boundary
      var curG: String = null
      var bin = 0L
      var fill = 0L
      it.map { case (g, id, ntok) =>
        if (g != curG) { curG = g; bin = 0L; fill = ntok }
        else if (fill + ntok <= budget) fill += ntok
        else { bin += 1L; fill = ntok }
        (g, id, ntok, bin)
      }
    }.toDF(groupCol, idCol, "ntok", "bin")
  }
}
