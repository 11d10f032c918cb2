package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}
import graft.functions.{TextFunctions => TF}
import graft.sources.Sources

/** Data-curation coverage: dedup clustering (pairs → connected components),
  * deterministic sampling, and token-budget sequence packing — the steps a
  * training-data pipeline runs AFTER similarity/dedup analysis to actually
  * build the training set.
  *
  * Oracles mirror each hash bit-exactly (shared fragments from
  * [[PipelineQueries]]); clustering and greedy packing — both inherently
  * iterative — are mirrored with DuckDB recursive CTEs, so the driver gate
  * verifies the fixpoint itself, not just row counts.
  */
object CurationQueries {
  import PipelineQueries.{NTokSql, SimhashCte, hex60}

  private val PackBudget = 1000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // near-dup pairs → duplicate clusters (hash-min connected components);
    // cluster_id = min doc_id in the component
    "dedup_clusters" -> ((s, dir) => {
      val pairs = Similarity.simhashPairs(Sources.parallelizedBy(Sources.table(s, dir, "documents")
        .select(col("doc_id"), col("text")), col("doc_id")), "doc_id", "text", maxHamming = 3)
      Similarity.connectedComponents(pairs).orderBy(col("id"))
    }),

    // deterministic 10% hash sample (reproducible under task retry, unlike
    // rand() sampling)
    "sample_hash" -> ((s, dir) => {
      Curation.hashSample(Sources.table(s, dir, "documents"), "doc_id",
          buckets = 20, keep = 2)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // 5 docs per source, ranked by the id hash (deterministic shuffle
    // within each stratum; one window, no global sort)
    "sample_stratified" -> ((s, dir) => {
      Curation.stratifiedSample(Sources.table(s, dir, "documents"),
          "source", "doc_id", perStratum = 5)
        .select(col("source"), col("doc_id"), col("rk"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // declarative token-budget chunking: chunk = floor(tokens-before / budget)
    "pack_chunks" -> ((s, dir) => {
      Curation.packChunks(Sources.table(s, dir, "documents"),
          "source", "doc_id", TF.tokenCount(col("text")), PackBudget)
        .orderBy(col("source"), col("chunk_id"))
    }),

    // capacity-respecting greedy first-fit packing (per-partition state
    // machine after one shuffle by source)
    "pack_greedy" -> ((s, dir) => {
      Curation.packGreedy(Sources.table(s, dir, "documents"),
          "source", "doc_id", TF.tokenCount(col("text")), PackBudget)
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("bin_tokens"))
        .orderBy(col("source"), col("bin"))
    })
  )

  def oracle: Map[String, String] = Map(
    // reachability fixpoint: with bidirectional edges every node in a
    // component reaches every other (and itself via any 2-cycle), so
    // min(reachable ∪ self) is the component min
    "dedup_clusters" ->
      s"""WITH RECURSIVE $SimhashCte,
         |prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |edges AS (SELECT id_a AS s, id_b AS d FROM prs
         |          UNION SELECT id_b, id_a FROM prs),
         |reach AS (SELECT s AS id, d AS r FROM edges
         |          UNION
         |          SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s)
         |SELECT id, least(id, min(r)) AS cluster_id
         |FROM reach GROUP BY id ORDER BY id""".stripMargin,

    "sample_hash" ->
      s"""SELECT doc_id, source FROM documents
         |WHERE ${hex60("CAST(doc_id AS VARCHAR)")} % 20 < 2
         |ORDER BY doc_id""".stripMargin,

    "sample_stratified" ->
      s"""WITH r AS (SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${hex60("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
         |  FROM documents)
         |SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
         |FROM r WHERE rk <= 5 ORDER BY source, doc_id""".stripMargin,

    "pack_chunks" ->
      s"""WITH d AS (SELECT source, doc_id, CAST($NTokSql AS BIGINT) AS ntok
         |  FROM documents),
         |c AS (SELECT source, doc_id, ntok,
         |    sum(ntok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
         |  FROM d)
         |SELECT source,
         |  CAST(floor(CAST(cum - ntok AS DOUBLE) / $PackBudget.0) AS BIGINT) AS chunk_id,
         |  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS chunk_tokens
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // greedy first-fit is a sequential scan with carried state — the oracle
    // steps doc-by-doc per source via a recursive CTE
    "pack_greedy" ->
      s"""WITH RECURSIVE d AS (SELECT source, doc_id, CAST($NTokSql AS BIGINT) AS ntok,
         |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         |  FROM documents),
         |g AS (
         |  SELECT source, doc_id, ntok, rn, CAST(0 AS BIGINT) AS bin, ntok AS fill
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.source, d.doc_id, d.ntok, d.rn,
         |    CASE WHEN g.fill + d.ntok <= $PackBudget THEN g.bin ELSE g.bin + 1 END,
         |    CASE WHEN g.fill + d.ntok <= $PackBudget THEN g.fill + d.ntok ELSE d.ntok END
         |  FROM g JOIN d ON d.source = g.source AND d.rn = g.rn + 1
         |)
         |SELECT source, bin, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS bin_tokens
         |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
