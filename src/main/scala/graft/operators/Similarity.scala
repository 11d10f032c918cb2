package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{SimilarityFunctions => SF, TextFunctions => TF}

/** Dedup + similarity-search operators for training-data pipelines.
  *
  * Scale design notes (100 TB):
  *  - Exact dedup: one shuffle on the 60-bit content hash (not the full
  *    text) — hash first, shuffle the hash.
  *  - MinHash LSH: signatures are computed scan-side (no shuffle), the only
  *    shuffles are the band-key explode→groupBy and the candidate self-join,
  *    both on compact longs. Candidate volume is O(sum of bucket²), tuned by
  *    (bands, rowsPerBand); verification re-checks estimated Jaccard from
  *    signatures, never re-reading the corpus.
  *  - Brute-force KNN broadcasts the (small) query set; the corpus side
  *    streams partition-local, no shuffle of the big side. A window per
  *    query-id does the final top-k on queries×k rows only.
  */
object Similarity {

  /** Exact dedup: keep the first (min id) row per normalized-content hash.
    * Returns (survivor id, n_copies, fingerprint). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fp", TF.contentFingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash-LSH near-dup candidate pairs with signature-estimated Jaccard.
    *
    * @param sigLen      total minhash functions (bands * rowsPerBand)
    * @param bands       LSH bands; two docs collide if any band matches
    * @param minJaccard  keep pairs with estimated Jaccard >= this
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, sigLen: Int = 16, bands: Int = 4,
      minJaccard: Double = 0.5): DataFrame = {
    val rowsPerBand = sigLen / bands
    // Signature computation is row-based, not array-lambda-based: explode
    // shingles to rows, hash each once inside the codegen'd scan pipeline,
    // and compute the n permutation minima as n plain `min` aggregates in a
    // single HashAggregate (map-side combined). Higher-order array functions
    // are interpreted per element and (via CollapseProject inlining)
    // re-evaluate the hashing once per permutation — measured >10x slower.
    // tokens materialized BEFORE the shingle lambda — a lambda re-evaluates
    // non-attribute subtrees per element (O(tokens²) tokenization otherwise;
    // 6.5× measured at sf0.1)
    val exploded = df
      .select(col(idCol).as("id"), TF.tokens(col(textCol)).as("__toks"))
      .select(col("id"),
        explode(TF.wordShinglesOfTokens(col("__toks"), shingleSize)).as("shingle"))
      .withColumn("h", TF.hexLong32(col("shingle")))
    val minCols = (0 until sigLen).map { i =>
      val (a, b) = SF.minhashCoef(i)
      min((lit(a) * col("h") + lit(b)) % SF.MinHashP).as(s"s$i")
    }
    val sigs = exploded.groupBy(col("id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"), array((0 until sigLen).map(i => col(s"s$i")): _*).as("sig"))
    // The banded signatures feed BOTH sides of the candidate self-join;
    // eagerly materialized (lineage truncated) so the corpus is scanned and
    // hashed exactly once — localCheckpoint stores the partitions in the
    // block manager, the single-JVM analog of checkpointing signatures to
    // storage and bucket-joining them on a cluster.
    val banded = sigs.select(col("id"), col("sig"),
        explode(SF.lshBandKeys(col("sig"), bands, rowsPerBand)).as("band_key"))
      .localCheckpoint(true)
    val a = banded.select(col("band_key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_key"), col("id").as("id_b"), col("sig").as("sig_b"))
    // candidate dedup across bands: groupBy + the hash-plannable any-fold
    // (a dropDuplicates here compiles to first() = SortAggregate; the sig
    // columns are functionally determined by the ids, so any-value is exact)
    val candidates = a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(graft.functions.FirstLastAgg.anyValue(col("sig_a")).as("sig_a"),
        graft.functions.FirstLastAgg.anyValue(col("sig_b")).as("sig_b"))
    // signature agreement as ONE primitive loop per candidate pair
    // (SimilarityFunctions.VectorMatchCount — the interpreted zip_with
    // spelling allocated an array and two lambda evals per position)
    val bridge = org.apache.spark.sql.graftbridge.CatalystBridge
    val est = candidates.withColumn("est_jaccard",
      bridge.column(graft.functions.VectorMatchCount(
        bridge.expression(col("sig_a")), bridge.expression(col("sig_b"))))
        .cast("double") / sigLen)
    est.filter(col("est_jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** Exact n-gram Jaccard similarity join: explode distinct word shingles,
    * self-join on shingle equality, count intersections, compute
    * |A∩B| / (|A|+|B|-|A∩B|). Shuffles only (id, shingle-hash) pairs.
    *
    * `maxDf` caps shingle document frequency before the self-join: a
    * stopword-ish shingle shared by 1% of a 100 TB corpus is a quadratic
    * hot key (join fan-out = DF², unbounded without the cap). Pruned
    * shingles drop out of BOTH the intersection and the set sizes
    * ("filtered Jaccard" over the surviving shingles — the standard
    * construction; high-DF shingles carry no near-dup signal anyway).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, minJaccard: Double = 0.5,
      maxDf: Int = Int.MaxValue): DataFrame = {
    // cached: read by the DF histogram, the self-join twice, and the sizes
    // branch; tokens hoisted ahead of the shingle lambda (see minhashPairs)
    val sh0 = df
      .select(col(idCol).as("id"), TF.tokens(col(textCol)).as("__toks"))
      .select(col("id"),
        explode(TF.wordShinglesOfTokens(col("__toks"), shingleSize)).as("shingle"))
      .withColumn("sh", TF.hexLong60(col("shingle"))).drop("shingle")
      .cache()
    val sh =
      if (maxDf == Int.MaxValue) sh0
      else {
        // one extra groupBy on the already-cached hashes: DF per shingle,
        // broadcast-free semi-join discipline (the hot-key histogram is
        // tiny — only keys above the cap are dropped)
        val keep = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select("sh")
        sh0.join(keep, "sh")
      }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"), col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard")
  }

  /** Benchmark decontamination: flag corpus documents sharing ≥ `minOverlap`
    * DISTINCT word-shingles with any benchmark (eval-set) document — the
    * standard test-set-overlap removal step of a training-data pipeline.
    * Returns (id_a = corpus doc, bench_id, overlap) per contaminated pair.
    *
    * Scale shape: the benchmark side is small (eval sets are 10²–10⁵ docs)
    * and its distinct shingle hashes BROADCAST; the corpus side streams in
    * one scan through a broadcast hash join — no corpus shuffle until the
    * (doc, bench) partial-aggregated match counts, whose volume is bounded
    * by actual contamination, not corpus size. Shingles travel as compact
    * 60-bit hashes (same md5-derived hashing as the n-gram Jaccard path, so
    * the DuckDB oracle reproduces them bit-exactly). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 8, minOverlap: Int = 1): DataFrame = {
    def shingles(df: DataFrame, outId: String): DataFrame = df
      .select(col(idCol).as(outId), TF.tokens(col(textCol)).as("__toks"))
      .select(col(outId),
        explode(TF.wordShinglesOfTokens(col("__toks"), shingleSize)).as("shingle"))
      .select(col(outId), TF.hexLong60(col("shingle")).as("sh"))
    // bench side dedupes pre-broadcast (small); the CORPUS side dedupes
    // AFTER the broadcast join — only matching shingles (bounded by actual
    // contamination) ever shuffle, the corpus itself streams one pass
    val benchSh = broadcast(shingles(benchmark, "bench_id").distinct())
    shingles(corpus, "id_a").join(benchSh, "sh")
      .select("id_a", "bench_id", "sh").distinct() // DISTINCT shared shingles
      .groupBy("id_a", "bench_id")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** 64-bit simhash per document, row-based: explode tokens, hash each once
    * inside the codegen'd scan pipeline, then take the 64 bit-votes as 64
    * conditional-sum aggregates in a single HashAggregate (map-side
    * combined). The array-lambda formulation (aggregate/zip_with over the
    * token array) evaluates interpreted per element — measured 4× slower at
    * sf0.1. Same lesson as minhashPairs' row-based signatures. */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = df
      .select(col(idCol).as("id"), explode(TF.tokens(col(textCol))).as("__tok"))
      .select(col("id"), TF.hexLong32(col("__tok")).as("hlo"),
        TF.hexLong32Hi(col("__tok")).as("hhi"))
    // vote for bit b = sum over tokens of (bit set ? +1 : -1)
    val voteCols =
      (0 until 32).map(b =>
        sum(shiftright(col("hlo"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$b")) ++
      (0 until 32).map(b =>
        sum(shiftright(col("hhi"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"w$b"))
    val votes = ex.groupBy(col("id")).agg(voteCols.head, voteCols.tail: _*)
    val lo = (0 until 32).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    val hi62 = (0 until 31).map(b =>
      when(col(s"w$b") > 0, lit(1L << (b + 32))).otherwise(lit(0L))).reduce(_ + _)
    val sign = when(col("w31") > 0, lit(Long.MinValue)).otherwise(lit(0L))
    votes.select(col("id"), (lo + hi62 + sign).as("simhash"))
  }

  /** SimHash near-dup: 64-bit simhash per doc; pairs within `maxHamming`
    * found by a banded multi-probe equi-join — 4 disjoint 16-bit bands, so
    * by pigeonhole every pair at hamming ≤ 3 agrees exactly on ≥1 band.
    * The join key space is ~2⁶⁴/4 (vs 2¹⁶ for the old 16-bit simhash,
    * whose candidate volume grew ~n²/2¹⁶ — the key space itself was the
    * skew at corpus scale). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x16-bit banding guarantees completeness only for hamming <= 3")
    val sh = simhashTable(df, idCol, textCol)
      .cache() // consumed by both sides of the band join
    val banded = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(b => SF.simhashBandKey(col("simhash"), b)): _*)).as("band_key"))
    val a = banded.select(col("band_key"), col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band_key"), col("id").as("id_b"), col("simhash").as("sh_b"))
    // cross-band dedup via groupBy + min: hamming is functionally
    // determined by the pair, and min over ints keeps the aggregate in
    // HashAggregate (a dropDuplicates would compile to first() =
    // SortAggregate on both shuffle sides)
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), SF.hammingDistance(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Duplicate-cluster assignment: connected components over a candidate-pair
    * edge list (the step after any pair-finder — minhash/simhash/ngram —
    * in a real dedup pipeline: near-dup PAIRS must become CLUSTERS so one
    * survivor per cluster can be kept).
    *
    * Hash-min label propagation: every node starts labeled with its own id;
    * each round every node takes the min label among itself and its
    * neighbors; converges in O(max component diameter) rounds — near-dup
    * clusters are shallow (dup rings around a survivor), so typically 2-4
    * rounds even at corpus scale. Each round is one equi-join + one
    * groupBy-min on (id, label) longs only; `localCheckpoint` truncates the
    * growing lineage (the single-JVM analog of checkpointing iteration
    * state to storage on a cluster). The driver-side loop is iteration
    * control, not data movement — per round it moves exactly one boolean
    * (the convergence check).
    *
    * Returns (id, cluster_id) for every node that appears in a pair;
    * cluster_id = min id in the component. */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 20): DataFrame = {
    // materialize the pair-finder ONCE — the bidirectional union would
    // otherwise evaluate the (expensive) upstream plan per branch
    val pc = pairs.select(col(idA), col(idB)).localCheckpoint(true)
    val edges0 = pc.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pc.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .localCheckpoint(true)
    // Partition count scales with the edge count, not the session default:
    // iterative shuffles on a candidate-pair graph orders of magnitude
    // smaller than the corpus would otherwise pay a fixed per-task floor
    // every round (measured 10.8 s → 1.9 s at sf0.1 from this alone).
    val p = math.max(1L, math.min(edges0.sparkSession.sparkContext.defaultParallelism.toLong,
      edges0.count() / 500000L + 1L)).toInt
    // Pin the ITERATION's shuffle width to p as well: the session default
    // (sized for corpus-scale scans) would schedule that many near-empty
    // tasks per join/groupBy stage, per round — pure scheduling floor on a
    // graph this small. Restored in the finally; the loop is the only query
    // running on this thread's planning window.
    val spark0 = edges0.sparkSession
    val prevShuffle = spark0.conf.get("spark.sql.shuffle.partitions")
    spark0.conf.set("spark.sql.shuffle.partitions", p.toString)
    try {
    val edges = edges0.repartition(p, col("dst")).localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    // Convergence probe: labels only ever DECREASE (min of self, neighbors
    // and the jump target), so the exact sum of labels strictly decreases
    // until fixpoint — comparing one decimal aggregate per round replaces
    // the old-vs-new join + isEmpty scan (two fewer operators per round;
    // decimal(38) so a corpus-scale sum of 64-bit ids cannot overflow).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    // one min-propagation + pointer-jump iteration (label := label of
    // label — path compression keeps rounds at O(log diameter); labels
    // only decrease, and the label node's own label is always ≤ it)
    def step(in: DataFrame): DataFrame = {
      val viaNeighbor = edges
        .join(in.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("label"))
      val nbrMin = in.unionByName(viaNeighbor)
        .groupBy("id").agg(min("label").as("label"))
      nbrMin.as("c")
        .join(nbrMin.select(col("id").as("label"), col("label").as("label2")).as("p"),
          Seq("label"), "left")
        .select(col("id"), coalesce(col("label2"), col("label")).as("label"))
    }
    while (!converged && iter < maxIter) {
      // TWO iterations per checkpoint+probe cycle: the per-cycle fixed cost
      // (an eager materialization plus one driver-side aggregate) dominates
      // on the small post-banding graph, so halving the number of cycles
      // cuts the driver round-trips that made this the slowest gate query;
      // the un-checkpointed intermediate only doubles plan depth per cycle.
      // re-alias above the checkpoint: fresh expression ids per cycle, so
      // the next cycle's self-referencing union (labels ∪ f(labels)) never
      // carries duplicate attribute ids into Union constraint rewriting
      // (key-not-found analysis failure otherwise)
      val t0 = System.nanoTime()
      labels = step(step(labels)).localCheckpoint(true)
        .select(col("id").as("id"), col("label").as("label"))
      val t1 = System.nanoTime()
      val s = labelSum(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 2
      System.err.println(f"[graft-cc] rounds=$iter cycle=${(t1 - t0) / 1e9}%.2fs probe=${(System.nanoTime() - t1) / 1e9}%.2fs converged=$converged")
    }
    // labels is already checkpointed — the projection on top replans
    // nothing, so restoring the session conf here is safe
    labels.select(col("id"), col("label").as("cluster_id"))
    } finally spark0.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  /** Brute-force cosine top-k: exact baseline for ANN. Queries broadcast;
    * ranking key is (rounded cosine desc, candidate id) for determinism. */
  def cosineKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // norms precomputed per vector, not per pair (queries×corpus pairs would
    // otherwise recompute each side's norm |corpus| resp. |queries| times)
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      SF.l2Norm(col(vecCol)).as("qnorm")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"),
      SF.l2Norm(col(vecCol)).as("cnorm"))
    val scored = c.crossJoin(q)
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cosine",
        round(SF.dotProduct(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cosine", "rank")
  }

  /** Same-bucket cosine pairs with HOT-BUCKET SALTING — the scale guard for
    * skewed LSH buckets (SCALE.md watch item: sf10 max bucket 694 vs mean
    * ~150; the within-bucket term is quadratic in the HOTTEST bucket, so
    * residual skew concentrates the whole join's tail latency in one task).
    *
    * Members of a bucket with m > saltCap rows get a deterministic salt
    * s ∈ [0, g), g = ceil(m / saltCap), and the self-join enumerates salt
    * BLOCK pairs — `sa < sb`, plus the `sa == sb` diagonal ordered by id —
    * a triangle join whose largest single block is ~saltCap² comparisons
    * regardless of bucket size. The output is IDENTICAL to the plain
    * same-bucket self-join: each unordered pair appears exactly once
    * (same-salt blocks dedup by id order; cross-salt blocks by salt order,
    * re-normalized to id order in the result), verified pairwise in
    * SimilaritySpec with a forced 1-row cap.
    *
    * Input columns: idCol, vecCol (ARRAY<DOUBLE>), normCol (precomputed L2
    * norm), bucketCol. Output: (id_a < id_b, bucket, cosine >= minCosine).
    */
  def saltedBucketPairs(all: DataFrame, idCol: String, vecCol: String,
      normCol: String, bucketCol: String, minCosine: Double,
      saltCap: Int = 256): DataFrame = {
    // per-bucket group count; the join on bucketCol shares the partitioning
    // of the pair join below (counts are tiny: one row per bucket)
    val counts = all.groupBy(col(bucketCol)).agg(count(lit(1)).as("__m"))
    val salted = all.join(counts, Seq(bucketCol))
      .withColumn("__g",
        greatest(lit(1L), ceil(col("__m").cast("double") / saltCap)).cast("int"))
      .withColumn("__salt", pmod(xxhash64(col(idCol)), col("__g")).cast("int"))
    val a = salted.select(col(bucketCol).as("__bkt"), col("__salt").as("__sa"),
      col(idCol).as("__ida"), col(vecCol).as("__va"), col(normCol).as("__na"))
    val b = salted.select(col(bucketCol).as("__bkt_b"), col("__salt").as("__sb"),
      col(idCol).as("__idb"), col(vecCol).as("__vb"), col(normCol).as("__nb"))
    a.join(b, col("__bkt") === col("__bkt_b") &&
        (col("__sa") < col("__sb") ||
          (col("__sa") === col("__sb") && col("__ida") < col("__idb"))))
      .withColumn("cosine",
        round(SF.dotProduct(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6))
      .filter(col("cosine") >= minCosine)
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"),
        col("__bkt").as("bucket"), col("cosine"))
  }

  /** LSH-bucketed ANN (scale path): random-hyperplane bucket per vector,
    * then exact cosine only within the query's bucket. At 100 TB the corpus
    * is pre-bucketed and bucket-partitioned, so a query touches one
    * partition (IVF-style probe=1). */
  def lshAnn(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int, dim: Int): DataFrame = {
    val bucketed = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"),
      SF.l2Norm(col(vecCol)).as("cnorm"),
      SF.hyperplaneBucket(col(vecCol), planes, dim).as("bucket"))
    val qb = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      SF.l2Norm(col(vecCol)).as("qnorm"),
      SF.hyperplaneBucket(col(vecCol), planes, dim).as("qbucket")))
    val scored = bucketed.join(qb, col("bucket") === col("qbucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cosine",
        round(SF.dotProduct(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "bucket", "cand_id", "cosine", "rank")
  }
}
