package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.{SimilarityFunctions => SF}
import graft.sources.Sources

/** Embedding similarity-search coverage over the embeddings table
  * (64-dim float vectors): brute-force cosine top-k (exact baseline),
  * LSH-bucketed ANN (scale path), and embedding-cosine near-dup pairs.
  */
object EmbeddingQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "embeddings")

  /** Seed centroids for k-means AND the IVF coarse quantizer: the
    * embeddings of vec_id 0..k-1 as doubles, collected once on the driver
    * (k tiny rows, like the LSH plane literals) — deterministic across
    * engines, no RNG. */
  private def kmeansSeeds(s: SparkSession, dir: String, k: Int): Seq[Seq[Double]] =
    emb(s, dir).filter(col("vec_id") < k)
      .orderBy(col("vec_id"))
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // IVF assignment histogram: every vector → nearest of the 8 seed
    // centroids, one projection over one scan (the ingest-time shape)
    "embed_ivf_lists" -> ((s, dir) => {
      Similarity.ivfAssign(emb(s, dir), "vec_id", "embedding", kmeansSeeds(s, dir, 8))
        .groupBy(col("list_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("list_id"))
    }),

    // IVF top-5 for the 3 fixed queries, probing the 2 nearest lists —
    // the inverted-file ANN scale path (corpus never shuffles; candidates
    // prune to probed lists before any pair math)
    "embed_ivf_knn" -> ((s, dir) => {
      Similarity.ivfKnn(emb(s, dir), emb(s, dir).filter(col("vec_id").isin(0L, 1L, 2L)),
          "vec_id", "embedding", kmeansSeeds(s, dir, 8), nprobe = 2, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Lloyd's k-means over the embeddings: 8 fixed seed centroids
    // (vec_id 0..7), 2 iterations (assign -> element-wise mean update ->
    // re-assign). The oracle unrolls the identical iteration in SQL, so
    // every assignment — including the rebalancing the update causes — is
    // verified end-to-end. Each iteration is one scan + one 64-column
    // partial-agg groupBy; the driver moves only 8x64 rounded doubles.
    "embed_kmeans" -> ((s, dir) => {
      val base = emb(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      Similarity.kmeansAssign(base, "vec_id", "v", kmeansSeeds(s, dir, 8), iters = 2)
        .select(col("vec_id"), col("cluster"))
        .orderBy(col("vec_id"))
    }),

    // SemDeDup-style semantic dedup (Abbas et al. 2023): k-means-cluster the
    // embeddings, then prune cosine near-duplicates WITHIN each cluster —
    // pair volume is cluster-bounded (~targetClusterSize x n), never corpus-
    // quadratic. k adapts as max(8, n/256) so clusters stay ~256 vectors
    // (the salt cap) at any scale — at the gate SFs it resolves to the
    // oracle's 8. Planted
    // near-dups (20 copies, one coordinate +0.01, cosine ~0.9997) make the
    // drop set deterministic: natural cosines top out ~0.5 << the 0.8
    // threshold. Output: dropped id, its keeper (min lower same-cluster id
    // over the threshold), dup count, max cosine.
    "dedup_semantic" -> ((s, dir) => {
      val n = emb(s, dir).count() // parquet footer count: no data scan
      val k = math.max(8, math.ceil(n / 256.0).toInt)
      val vd = transform(col("embedding"), x => x.cast("double"))
      val base = emb(s, dir).select(col("vec_id"), vd.as("v"))
      val copies = emb(s, dir).filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          concat(array(element_at(vd, 1) + lit(0.01)), slice(vd, 2, 63)).as("v"))
      val all = base.unionByName(copies)
      // materialize the assignment ONCE: saltedBucketPairs reads its input
      // three times (bucket counts + both join sides), and re-deriving the
      // k-way argmin per read is the dominant cost at adaptive k — same
      // localCheckpoint precedent as dedup_clusters. SemDeDup at 100 TB
      // does the same thing: persist the clustered corpus, then prune.
      // r16: checkpoint PRE-PARTITIONED on the cluster key — the assignment
      // projection inherits the scan's (locally single-file, 1-partition)
      // layout, so an unkeyed checkpoint serialized every downstream
      // consumer; the keyed repartition spreads the materialized blocks by
      // the key all three consumers (bucket counts + both join sides)
      // group/join on, with AQE sizing the width. (Exchange ELIMINATION via
      // checkpoint partitioning is not available under AQE — the
      // checkpoint's reported partitioning is unknown pre-execution — so
      // the win here is the balanced one-time materialization, measured
      // 2.30 -> ~2.0 s at sf0.1 and 25.6 -> 14.0 s at the sf10 gate.)
      // r17 skew guard: the repartition key carries an 8-way id-hash salt —
      // a single hot cluster otherwise lands ONE fat checkpoint partition
      // (AQE cannot split a checkpoint write; guide §2.5). Consumers
      // group/join on the cluster key through their own exchanges, so only
      // the materialization layout changes.
      val clustered = Similarity.kmeansAssign(all, "vec_id", "v",
          kmeansSeeds(s, dir, k), iters = 2)
        .withColumn("nrm", SF.l2Norm(col("v")))
        .repartition(col("cluster"), pmod(xxhash64(col("vec_id")), lit(8)))
        .localCheckpoint()
      Similarity.saltedBucketPairs(clustered, "vec_id", "v", "nrm", "cluster",
          minCosine = 0.8, saltCap = 256)
        .groupBy(col("id_b"))
        .agg(min(col("id_a")).as("keep_id"),
          count(lit(1)).as("n_dups"),
          max(col("cosine")).as("max_cosine"))
        .select(col("id_b").as("dropped_id"), col("keep_id"),
          col("n_dups"), col("max_cosine"))
        .orderBy(col("dropped_id"))
    }),

    // exact brute-force top-5 neighbors for 3 fixed query vectors
    "embed_knn_bruteforce" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.cosineKnn(e, e.filter(col("vec_id").isin(0L, 1L, 2L)),
          "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // vector norms + per-label stats (exercises dot/norm primitives)
    "embed_norm_stats" -> ((s, dir) => {
      emb(s, dir)
        .withColumn("norm", round(SF.l2Norm(col("embedding")), 4))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          round(sum(SF.l2Norm(col("embedding"))) / count(lit(1)), 4).as("avg_norm"))
        .orderBy(col("label"))
    }),

    // embedding-cosine near-duplicate pairs within label 0..4 (quadratic
    // within the filtered slice; the LSH query is the scale path). The
    // fixture's embeddings are near-random (max within-label cosine ~0.45 at
    // sf0.01), so the demo threshold is 0.40 — high enough to keep the
    // result small, low enough that the gate verifies real pairs (a real
    // corpus would use ~0.95+).
    "embed_cosine_neardup" -> ((s, dir) => {
      // norms once per vector (not per pair)
      val e = emb(s, dir).filter(col("label") < 5)
        .select(col("vec_id"), col("embedding"), col("label"), SF.l2Norm(col("embedding")).as("nrm"))
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"),
        col("label").as("label_a"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
        col("label").as("label_b"), col("nrm").as("nb"))
      a.join(b, col("id_a") < col("id_b") && col("label_a") === col("label_b"))
        .withColumn("cosine", round(SF.dotProduct(col("va"), col("vb")) / (col("na") * col("nb")), 6))
        .filter(col("cosine") >= 0.40)
        .select(col("id_a"), col("id_b"), col("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // LSH-bucketed ANN: 8 hyperplanes, exact cosine within bucket.
    // Oracle-checked end-to-end: the md5-derived weight matrix is computed
    // driver-side and inlined into the DuckDB SQL as literal arrays, so the
    // banding is reproduced bit-exactly (same pattern as the minhash
    // banding oracle). Recall vs brute force asserted in SimilaritySpec.
    "embed_ann_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshAnn(e, e.filter(col("vec_id").isin(0L, 1L, 2L)),
          "vec_id", "embedding", k = 5, planes = 8, dim = 64)
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH bucket histogram — shows bucketing is balanced enough for IVF-style
    // probing; deterministic md5-derived planes, oracle-checked.
    "embed_lsh_buckets" -> ((s, dir) => {
      emb(s, dir)
        .select(SF.hyperplaneBucket(col("embedding"), 8, 64).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // LSH-backed near-dup detection over PLANTED near-duplicates — this is
    // the scale path the gate verifies (the quadratic embed_cosine_neardup
    // stays as the exact demo): 20 copies with one coordinate perturbed by
    // +0.01 (cosine ≈ 0.9997 vs ≤~0.5 for natural pairs) are unioned into
    // the corpus, vectors are hyperplane-bucketed, and only same-bucket
    // pairs are scored. Candidate volume is O(sum of bucket²), which only
    // stays sub-quadratic if the bucket COUNT grows with the corpus: plane
    // count scales as log2(n / targetBucketSize) — with 8 planes fixed,
    // 200k vectors at sf10 measured 342 s (n²/256 pairs); adaptive planes
    // bring it back to ~bucketSize·n pairs at any scale. The sf0.01 oracle
    // re-derives the identical planted copies, buckets, and cosines (same
    // md5-derived planes, same sequential fold) — at gate scale the
    // adaptive count resolves to the oracle's 8 planes.
    "embed_lsh_neardup" -> ((s, dir) => {
      val vd = transform(col("embedding"), x => x.cast("double"))
      val n = emb(s, dir).count() // parquet footer count: no data scan
      val planes = math.max(8,
        math.ceil(math.log(n / 100.0) / math.log(2)).toInt)
      val base = emb(s, dir).select(col("vec_id"), vd.as("v"))
      val copies = emb(s, dir).filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          concat(array(element_at(vd, 1) + lit(0.01)), slice(vd, 2, 63)).as("v"))
      // r16: materialize the bucketed vectors ONCE, keyed on the bucket —
      // saltedBucketPairs reads its input three times (bucket counts + both
      // join sides), each of which previously re-derived the 8-plane bucket
      // projection from the parquet scan (8 parquet scans in the r16-
      // baseline plan; 0 after). The keyed repartition spreads the blocks
      // (the scan is single-file locally), AQE sizes the width; measured
      // 1.16 -> ~0.9 s at sf0.1, 14.3 s at the sf10 gate.
      // r17 skew guard: 8-way id-hash salt on the repartition key so a hot
      // bucket spreads across checkpoint partitions (consumers re-key on
      // the bucket anyway; see dedup_semantic above).
      val all = base.unionByName(copies).select(col("vec_id"), col("v"),
        SF.hyperplaneBucket(col("v"), planes, 64).as("bucket"),
        SF.l2Norm(col("v")).as("nrm"))
        .repartition(col("bucket"), pmod(xxhash64(col("vec_id")), lit(8)))
        .localCheckpoint()
      // hot buckets salt-split past 256 members (triangle join): residual
      // skew after adaptive planes (sf10 max 694 vs mean ~150) stays
      // bounded per task; output identical to the plain same-bucket join
      Similarity.saltedBucketPairs(all, "vec_id", "v", "nrm", "bucket",
          minCosine = 0.8, saltCap = 256)
        .select(col("id_a"), col("id_b"), col("bucket"), col("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // int8 symmetric quantization (the ANN memory lever: 4× smaller vectors,
    // integer dot products). Codes, scale and the integer self-dot-product
    // per vector; codes rendered as CSV (the gate's row hash can't take raw
    // arrays). Every value is integer-exact or explicitly rounded, so the
    // oracle reproduces all of it bit-for-bit.
    "embed_quantize_int8" -> ((s, dir) => {
      val e = emb(s, dir)
      val scale = SF.int8Scale(col("embedding"))
      val q = SF.int8Quantize(col("embedding"), col("scale"))
      e.select(col("vec_id"), scale.as("scale"), col("embedding"))
        .select(col("vec_id"), round(col("scale"), 8).as("scale8"), q.as("q"))
        .select(col("vec_id"), col("scale8"),
          SF.dotProduct(col("q"), col("q")).cast("long").as("qsq"),
          concat_ws(",", transform(col("q"), x => x.cast("int").cast("string"))).as("q_csv"))
        .orderBy(col("vec_id")).limit(200)
    }),

    // top-5 neighbors for the 3 fixed queries ranked by QUANTIZED cosine —
    // integer dot product over int8 codes, norms from the quantized codes
    // too, so the whole ranking is integer-derived and engine-exact.
    // QuantizeSpec asserts recall vs the exact ranking.
    "embed_knn_int8" -> ((s, dir) => {
      val e = emb(s, dir)
      val withQ = e
        .select(col("vec_id"), SF.int8Scale(col("embedding")).as("scale"), col("embedding"))
        .select(col("vec_id"), SF.int8Quantize(col("embedding"), col("scale")).as("q"))
        .select(col("vec_id"), col("q"), SF.dotProduct(col("q"), col("q")).as("qsq"))
      val qs = broadcast(withQ.filter(col("vec_id").isin(0L, 1L, 2L))
        .select(col("vec_id").as("query_id"), col("q").as("qq"), col("qsq").as("qqsq")))
      val scored = withQ.crossJoin(qs)
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("qdot", SF.dotProduct(col("q"), col("qq")).cast("long"))
        .withColumn("qcosine",
          round(col("qdot").cast("double") / sqrt(col("qsq") * col("qqsq")), 6))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(col("qcosine").desc, col("vec_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("cand_id"), col("qdot"),
          col("qcosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    })
  )

  /** The LSH bucket expression rendered as DuckDB SQL: the same md5-derived
    * weight matrix the Spark plan carries as array literals, inlined as
    * literal DOUBLE[] arrays — identical doubles, identical sequential
    * summation (list_dot_product ≡ the aggregate fold), so bucket ids match
    * bit-for-bit.
    */
  private def bucketSql(vecExpr: String, planes: Int, dim: Int): String = {
    val w = SF.hyperplaneWeights(planes, dim)
    (0 until planes).map { j =>
      val arr = w(j).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($vecExpr::DOUBLE[], $arr) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** The 2-iteration k-means unrolled as DuckDB CTEs. Expects a prior CTE
    * `corpus(vec_id, v DOUBLE[])`; seeds are the base table's first kExpr
    * embeddings; distances rank by (||c||^2 - 2 x.c, cid) exactly like
    * [[Similarity.kmeansAssign]]'s argmin struct; element-wise means round
    * to 6 like the Spark side, so iteration-2 centroids are the identical
    * doubles. Ends with `clustered(vec_id, v, cluster)`. */
  private def kmeansCtes(kExpr: String, dim: Int): String =
    s"""cents0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
       |           FROM embeddings WHERE vec_id < $kExpr),
       |assign1 AS (
       |  SELECT e.vec_id, e.v, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |           list_dot_product(c.cv, c.cv) - 2*list_dot_product(e.v, c.cv) ASC,
       |           c.cid ASC) AS rn
       |  FROM corpus e CROSS JOIN cents0 c),
       |a1 AS (SELECT vec_id, v, cid FROM assign1 WHERE rn = 1),
       |means AS (
       |  SELECT a.cid, t.i, round(avg(a.v[t.i]), 6) AS m
       |  FROM a1 a CROSS JOIN generate_series(1, $dim) AS t(i)
       |  GROUP BY a.cid, t.i),
       |cents1 AS (
       |  SELECT c0.cid, COALESCE(mm.cv1, c0.cv) AS cv
       |  FROM cents0 c0 LEFT JOIN (
       |    SELECT cid, list(m ORDER BY i) AS cv1 FROM means GROUP BY cid) mm USING (cid)),
       |assign2 AS (
       |  SELECT e.vec_id, e.v, c.cid,
       |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |           list_dot_product(c.cv, c.cv) - 2*list_dot_product(e.v, c.cv) ASC,
       |           c.cid ASC) AS rn
       |  FROM corpus e CROSS JOIN cents1 c),
       |clustered AS (SELECT vec_id, v, CAST(cid AS INT) AS cluster
       |              FROM assign2 WHERE rn = 1)""".stripMargin

  def oracle: Map[String, String] = {
    val dot = "list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
    val norm = (t: String) => s"sqrt(list_dot_product($t.embedding::DOUBLE[], $t.embedding::DOUBLE[]))"
    // the IVF assignment CTEs: centroids = vec_id 0..7's embeddings;
    // nearest-by-dot with ties to the smaller centroid id — identical
    // double math to the Spark side (floats cast to double, index-order
    // accumulation)
    val ivfAssign =
      """cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
        |assign AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                    c.cid ASC) AS arn
        |  FROM embeddings e CROSS JOIN cents c),
        |lists AS (SELECT vec_id, embedding, CAST(cid AS INT) AS list_id
        |          FROM assign WHERE arn = 1)""".stripMargin
    Map(
      "embed_ivf_lists" ->
        s"""WITH $ivfAssign
           |SELECT list_id, CAST(count(*) AS BIGINT) AS n
           |FROM lists GROUP BY 1 ORDER BY 1""".stripMargin,

      "embed_ivf_knn" ->
        s"""WITH $ivfAssign,
           |qprobe AS (
           |  SELECT q.vec_id AS query_id, q.embedding AS qvec, CAST(c.cid AS INT) AS list_id,
           |         row_number() OVER (PARTITION BY q.vec_id
           |           ORDER BY list_dot_product(q.embedding::DOUBLE[], c.cvec::DOUBLE[]) DESC,
           |                    c.cid ASC) AS prn
           |  FROM embeddings q CROSS JOIN cents c WHERE q.vec_id IN (0, 1, 2)),
           |probes AS (SELECT query_id, qvec, list_id FROM qprobe WHERE prn <= 2),
           |scored AS (
           |  SELECT p.query_id, l.vec_id AS cand_id,
           |         round(list_dot_product(p.qvec::DOUBLE[], l.embedding::DOUBLE[]) /
           |               (sqrt(list_dot_product(p.qvec::DOUBLE[], p.qvec::DOUBLE[])) *
           |                sqrt(list_dot_product(l.embedding::DOUBLE[], l.embedding::DOUBLE[]))), 6) AS cosine
           |  FROM probes p JOIN lists l ON l.list_id = p.list_id
           |  WHERE l.vec_id <> p.query_id),
           |ranked AS (
           |  SELECT query_id, cand_id, cosine,
           |         CAST(row_number() OVER (PARTITION BY query_id
           |              ORDER BY cosine DESC, cand_id ASC) AS INT) AS rank
           |  FROM scored)
           |SELECT query_id, cand_id, cosine, rank FROM ranked
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      "embed_kmeans" ->
        s"""WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |${kmeansCtes("8", 64)}
           |SELECT vec_id, cluster FROM clustered ORDER BY vec_id""".stripMargin,

      "dedup_semantic" -> {
        val kExpr = "(SELECT greatest(8, CAST(ceil(count(*) / 256.0) AS BIGINT)) FROM embeddings)"
        s"""WITH vd AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |cp AS (SELECT vec_id + 1000000 AS vec_id,
           |              list_concat([v[1] + 0.01], v[2:64]) AS v
           |       FROM vd WHERE vec_id < 20),
           |corpus AS (SELECT * FROM vd UNION ALL SELECT * FROM cp),
           |${kmeansCtes(kExpr, 64)},
           |pairs AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |         round(list_dot_product(a.v, b.v) /
           |               (sqrt(list_dot_product(a.v, a.v)) *
           |                sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
           |  FROM clustered a JOIN clustered b
           |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
           |SELECT id_b AS dropped_id, min(id_a) AS keep_id,
           |       CAST(count(*) AS BIGINT) AS n_dups, max(cosine) AS max_cosine
           |FROM pairs WHERE cosine >= 0.8
           |GROUP BY 1 ORDER BY 1""".stripMargin
      },

      "embed_knn_bruteforce" ->
        s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (0, 1, 2)),
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           |         round($dot / (${norm("q")} * ${norm("c")}), 6) AS cosine
           |  FROM embeddings c, q WHERE c.vec_id <> q.vec_id),
           |ranked AS (
           |  SELECT query_id, cand_id, cosine,
           |         CAST(row_number() OVER (PARTITION BY query_id
           |              ORDER BY cosine DESC, cand_id ASC) AS INT) AS rank
           |  FROM scored)
           |SELECT query_id, cand_id, cosine, rank FROM ranked
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      "embed_norm_stats" ->
        s"""SELECT label, count(*) AS n,
           |  round(sum(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) / count(*), 4) AS avg_norm
           |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,

      "embed_cosine_neardup" ->
        s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           |    / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
           |       * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cosine
           |FROM embeddings a JOIN embeddings b
           |  ON a.vec_id < b.vec_id AND a.label = b.label
           |WHERE a.label < 5 AND b.label < 5
           |  AND round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           |    / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
           |       * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.40
           |ORDER BY id_a, id_b""".stripMargin,

      "embed_ann_lsh" ->
        s"""WITH b AS (
           |  SELECT vec_id, embedding,
           |         CAST(${bucketSql("embedding", 8, 64)} AS BIGINT) AS bucket,
           |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
           |  FROM embeddings),
           |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket AS qbucket, nrm AS qnrm
           |      FROM b WHERE vec_id IN (0, 1, 2)),
           |scored AS (
           |  SELECT q.query_id, b.bucket, b.vec_id AS cand_id,
           |         round(list_dot_product(q.qe::DOUBLE[], b.embedding::DOUBLE[])
           |               / (q.qnrm * b.nrm), 6) AS cosine
           |  FROM b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.query_id),
           |ranked AS (
           |  SELECT query_id, bucket, cand_id, cosine,
           |         CAST(row_number() OVER (PARTITION BY query_id
           |              ORDER BY cosine DESC, cand_id ASC) AS INT) AS rank
           |  FROM scored)
           |SELECT query_id, bucket, cand_id, cosine, rank FROM ranked
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      "embed_lsh_buckets" ->
        s"""SELECT CAST(${bucketSql("embedding", 8, 64)} AS BIGINT) AS bucket,
           |       count(*) AS n
           |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,

      "embed_lsh_neardup" ->
        s"""WITH vd AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |cp AS (SELECT vec_id + 1000000 AS vec_id,
           |              list_concat([v[1] + 0.01], v[2:64]) AS v
           |       FROM vd WHERE vec_id < 20),
           |allv AS (SELECT * FROM vd UNION ALL SELECT * FROM cp),
           |bk AS (SELECT vec_id, v,
           |              CAST(${bucketSql("v", 8, 64)} AS BIGINT) AS bucket,
           |              sqrt(list_dot_product(v, v)) AS nrm
           |       FROM allv),
           |pairs AS (
           |  SELECT a.vec_id AS id_a, x.vec_id AS id_b, a.bucket,
           |         round(list_dot_product(a.v, x.v) / (a.nrm * x.nrm), 6) AS cosine
           |  FROM bk a JOIN bk x ON a.bucket = x.bucket AND a.vec_id < x.vec_id)
           |SELECT id_a, id_b, bucket, cosine FROM pairs
           |WHERE cosine >= 0.8 ORDER BY id_a, id_b""".stripMargin,

      // int8 quantization mirror: same floor(x/scale + 0.5) half-up rounding,
      // integer-valued doubles throughout, CSV codes via truncating INT cast
      "embed_quantize_int8" ->
        s"""WITH s AS (
           |  SELECT vec_id,
           |         greatest(list_max(list_transform(embedding::DOUBLE[], y -> abs(y))), 1e-12) / 127.0 AS scale,
           |         embedding::DOUBLE[] AS v
           |  FROM embeddings),
           |qv AS (SELECT vec_id, scale,
           |              list_transform(v, x -> floor(x / scale + 0.5)) AS q
           |       FROM s)
           |SELECT vec_id, round(scale, 8) AS scale8,
           |       CAST(list_dot_product(q, q) AS BIGINT) AS qsq,
           |       array_to_string(list_transform(q, x -> CAST(x AS INT)), ',') AS q_csv
           |FROM qv ORDER BY vec_id LIMIT 200""".stripMargin,

      "embed_knn_int8" ->
        s"""WITH s AS (
           |  SELECT vec_id,
           |         greatest(list_max(list_transform(embedding::DOUBLE[], y -> abs(y))), 1e-12) / 127.0 AS scale,
           |         embedding::DOUBLE[] AS v
           |  FROM embeddings),
           |qv AS (SELECT vec_id, list_transform(v, x -> floor(x / scale + 0.5)) AS q FROM s),
           |qd AS (SELECT vec_id, q, list_dot_product(q, q) AS qsq FROM qv),
           |qs AS (SELECT vec_id AS query_id, q AS qq, qsq AS qqsq FROM qd WHERE vec_id IN (0, 1, 2)),
           |scored AS (
           |  SELECT qs.query_id, c.vec_id AS cand_id,
           |         CAST(list_dot_product(c.q, qs.qq) AS BIGINT) AS qdot,
           |         round(list_dot_product(c.q, qs.qq) / sqrt(c.qsq * qs.qqsq), 6) AS qcosine
           |  FROM qd c, qs WHERE c.vec_id <> qs.query_id),
           |ranked AS (
           |  SELECT query_id, cand_id, qdot, qcosine,
           |         CAST(row_number() OVER (PARTITION BY query_id
           |              ORDER BY qcosine DESC, cand_id ASC) AS INT) AS rank
           |  FROM scored)
           |SELECT query_id, cand_id, qdot, qcosine, rank FROM ranked
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    )
  }
}
