package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.{TextFunctions => TF, SimilarityFunctions => SF}
import graft.sources.Sources

/** Training-data pipeline coverage: text analysis, exact/fuzzy dedup
  * (MinHash+LSH, SimHash, n-gram Jaccard) over the documents table.
  *
  * The oracles mirror every hash bit-exactly (md5-hex→int), including the
  * LSH banding — so the driver's DuckDB gate checks the *pipeline*, not just
  * row counts.
  */
object PipelineQueries {

  // ---- SQL fragments mirroring TextFunctions (DuckDB dialect) ----
  // private[queries]: CurationQueries reuses the token count, hash and
  // simhash mirrors for its sampling/packing/clustering oracles
  private[queries] val NormSql = """trim(regexp_replace(text, '\s+', ' ', 'g'))"""
  private[queries] val ToksSql = s"string_split($NormSql, ' ')"
  private[queries] val NTokSql = s"CASE WHEN len($NormSql) = 0 THEN 0 ELSE len($ToksSql) END"
  private def rc(expr: String, pat: String) = s"len(regexp_extract_all($expr, '$pat'))"
  private def markers(words: Seq[String]) =
    words.map(w => rc("lower(text)", s"\\b$w\\b")).mkString(" + ")
  private[queries] def hex60(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"
  private def hex32(e: String) = s"('0x' || substr(md5($e), 1, 8))::BIGINT"
  private def hex32hi(e: String) = s"('0x' || substr(md5($e), 9, 8))::BIGINT"

  // 64-bit simhash: bits 0-31 vote from the lo 32-bit hash, 32-62 from the
  // hi hash, and bit 63 is the sign term (added last; intermediate HUGEINT
  // arithmetic in DuckDB is exact, the final CAST AS BIGINT fits)
  private lazy val simhashTerms = ((0 until 32).map { b =>
    s"(CASE WHEN list_sum(list_transform(hlo, h -> ((h >> $b) & 1) * 2 - 1)) > 0 THEN ${1L << b} ELSE 0 END)"
  } ++ (0 until 31).map { b =>
    s"(CASE WHEN list_sum(list_transform(hhi, h -> ((h >> $b) & 1) * 2 - 1)) > 0 THEN ${1L << (b + 32)} ELSE 0 END)"
  }).mkString(" + ") +
    " + (CASE WHEN list_sum(list_transform(hhi, h -> ((h >> 31) & 1) * 2 - 1)) > 0 THEN (-9223372036854775807 - 1) ELSE 0 END)"

  /** CTE chain ending in `sh(doc_id, simhash)` — the bit-exact DuckDB mirror
    * of SimilarityFunctions.simhash64 over the documents table. */
  private[queries] lazy val SimhashCte =
    s"""base AS (SELECT doc_id, $ToksSql AS t FROM documents),
       |hsx AS (SELECT doc_id, list_transform(t, s -> ${hex32("s")}) AS hlo,
       |               list_transform(t, s -> ${hex32hi("s")}) AS hhi FROM base),
       |sh AS (SELECT doc_id, CAST($simhashTerms AS BIGINT) AS simhash FROM hsx)""".stripMargin

  /** quality in basis points (mirrors TF.qualityBp bit-exactly). */
  private val QualityBpSql = {
    val nchars = s"CAST(len($NormSql) AS DOUBLE)"
    val ntok = s"CAST($NTokSql AS DOUBLE)"
    val stop = markers(TF.EnMarkers ++ Seq("a", "in", "is"))
    s"""CAST(floor((least($nchars / 500.0, 1.0) * 0.3
       | + least(CAST($stop AS DOUBLE) / greatest($ntok, 1.0) * 5.0, 1.0) * 0.3
       | + (1.0 - least(CAST(${rc("text", "[.,!?;:]")} AS DOUBLE) / greatest($nchars, 1.0) * 10.0, 1.0)) * 0.2
       | + least(($nchars - ($ntok - 1.0)) / greatest($ntok, 1.0) / 8.0, 1.0) * 0.2) * 10000.0 + 0.5) AS BIGINT)""".stripMargin
  }
  private val QualitySql = s"($QualityBpSql / 10000.0)"

  private val LangSql = {
    val zh = rc("lower(text)", """[\x{4e00}-\x{9fff}]""")
    val en = markers(TF.EnMarkers); val de = markers(TF.DeMarkers)
    val fr = markers(TF.FrMarkers); val es = markers(TF.EsMarkers)
    s"""CASE WHEN $zh > 0 THEN 'zh'
       | WHEN ($en) >= ($de) AND ($en) >= ($fr) AND ($en) >= ($es) THEN 'en'
       | WHEN ($de) >= ($fr) AND ($de) >= ($es) THEN 'de'
       | WHEN ($fr) >= ($es) THEN 'fr' ELSE 'es' END""".stripMargin
  }

  /** word 5-gram distinct shingles (list) — mirrors TF.wordShingles(c, 5). */
  private val ShinglesSql =
    s"list_distinct(list_transform(range(1, len(t) - 3), i -> array_to_string(t[i:i+4], ' ')))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-document text analysis: tokens, bpe-ish tokens, lang id, quality
    "text_analysis" -> ((s, dir) => {
      // top-k FIRST, then the regex-heavy projection: the per-row analysis
      // is deterministic and doc_id-independent, so projecting after the
      // limit scores 200 docs instead of the whole corpus — at any scale,
      // TakeOrdered(k) on the sort key alone is the plan you want under a
      // LIMIT (corpus-wide scoring is benched by text_stats_by_source)
      Sources.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")).limit(200)
        .select(col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens"),
          TF.bpeishTokenCount(col("text")).cast("long").as("n_bpeish"),
          TF.langId(col("text")).as("lang_guess"),
          TF.qualityScore(col("text")).as("quality"))
    }),

    // corpus-level text stats per source
    "text_stats_by_source" -> ((s, dir) => {
      // corpus-wide regex scoring: rebalance an under-partitioned scan
      // r17: project to the used columns and spread by doc_id BEFORE the
      // rebalance exchange (guide §2.3) — the all-columns variant shuffled
      // and murmur-hashed the whole row (text included) per row
      Sources.parallelizedBy(Sources.table(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"), col("lang")), col("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.tokenCount(col("text")).cast("long")).as("total_tokens"),
          // exact long sum of basis points → deterministic average
          (floor(sum(TF.qualityBp(col("text"))).cast("double") / count(lit(1)) + 0.5) / 10000.0).as("avg_quality"),
          sum(when(TF.langId(col("text")) === col("lang"), 1L).otherwise(0L)).as("lang_id_hits"))
        .orderBy(col("source"))
    }),

    // content fingerprints: whitespace/case-robust hash + rolling minhash
    // (normalized text hoisted ahead of the char-gram lambda — 5× at sf0.1)
    // PII redaction (training-data scrub): the synthetic corpus carries no
    // PII, so both sides synthesize it deterministically from doc_id —
    // email + NANP phone + IPv4, plus a second email on every third doc —
    // then redact and count. RE2-compatible patterns so DuckDB's regex
    // engine matches Java's span-for-span.
    "text_pii_redact" -> ((s, dir) => {
      val aug = concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or call 555-123-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".77"),
        when(col("doc_id") % 3 === 0, lit(" cc second.contact@ex.org")).otherwise(lit("")))
      Sources.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")).limit(200)
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          TF.emailCount(col("aug")).cast("long").as("emails"),
          TF.phoneCount(col("aug")).cast("long").as("phones"),
          TF.ipv4Count(col("aug")).cast("long").as("ips"),
          TF.redactPii(col("aug")).as("redacted"))
    }),

    "text_fingerprint" -> ((s, dir) => {
      // same top-k-then-project shape as text_analysis: hash 200 docs, not
      // the corpus (corpus-wide fingerprinting is benched by dedup_exact /
      // dedup_minhash_sig, where it is the point of the query)
      Sources.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")).limit(200)
        .select(col("doc_id"), col("text"), TF.normalizeWs(col("text")).as("__norm"))
        .select(col("doc_id"),
          TF.contentFingerprint(col("text")).as("fp"),
          TF.rollingMinHashOfNormalized(col("__norm"), 8).as("rolling_fp"))
    }),

    // Gopher/C4-style per-document filter signals (public heuristics —
    // Rae et al. 2021 §A1.1, Raffel et al. 2020 §2.2), all integer basis
    // points → exact cross-engine compare. Top-200 then project (the
    // corpus-wide aggregate is text_gopher_gate below).
    "text_gopher_filters" -> ((s, dir) => {
      Sources.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")).limit(200)
        .select(col("doc_id"),
          size(TF.lines(col("text"))).cast("long").as("n_lines"),
          TF.dupLineBp(col("text")).as("dup_line_bp"),
          TF.bulletLineBp(col("text")).as("bullet_bp"),
          TF.ellipsisLineBp(col("text")).as("ellipsis_bp"),
          TF.symbolRatioBp(col("text")).as("symbol_bp"),
          TF.meanWordLenX100(col("text")).as("mwl_x100"))
    }),

    // within-document repetition: duplicate 3-gram fraction (the Gopher
    // repetition filters) — top-200 docs, exact basis points
    "text_repetition" -> ((s, dir) => {
      Sources.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")).limit(200)
        .select(col("doc_id"), TF.dupNgramBp(col("text"), 3).as("dup3_bp"))
    }),

    // corpus gate: documents passing the Gopher keep-thresholds, per source
    // (dup lines < 30%, bullets < 90%, ellipses < 30%, mean word length in
    // [3,10] — the published cutoffs)
    "text_gopher_gate" -> ((s, dir) => {
      Sources.parallelizedBy(Sources.table(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text")), col("doc_id"))
        .select(col("source"),
          (TF.dupLineBp(col("text")) < 3000 &&
           TF.bulletLineBp(col("text")) < 9000 &&
           TF.ellipsisLineBp(col("text")) < 3000 &&
           TF.meanWordLenX100(col("text")).between(300, 1000)).as("keep"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
        .orderBy(col("source"))
    }),

    // exact dedup via content hash, per source
    "dedup_exact" -> ((s, dir) => {
      val d = Sources.parallelizedBy(Sources.table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text")), col("doc_id"))
      d.withColumn("fp", TF.contentFingerprint(col("text")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("fp")).as("n_unique"),
          (count(lit(1)) - count_distinct(col("fp"))).as("n_dup_rows"))
        .orderBy(col("source"))
    }),

    // minhash signatures (first 8 of the 16 hash family)
    "dedup_minhash_sig" -> ((s, dir) => {
      // r17 row-side signature (MinhashSigExpr): one primitive loop per doc
      // on the scan — no shingle explode, no 8-min-column groupBy exchange
      // (see Similarity.minhashPairs; values identical, oracle-pinned)
      Sources.parallelizedBy(Sources.table(s, dir, "documents")
          .select(col("doc_id"), col("text")), col("doc_id"))
        .filter(TF.tokenCount(col("text")) >= 5)
        .select(col("doc_id"), TF.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), TF.wordShinglesOfTokens(col("__toks"), 5).as("__sh"))
        .select(col("doc_id"), SF.minhashSigRow(col("__sh"), 8).as("__sig"))
        .select(col("doc_id") +:
          (0 until 8).map(i => element_at(col("__sig"), i + 1).as(s"s$i")): _*)
        .orderBy(col("doc_id")).limit(200)
    }),

    // full MinHash-LSH near-dup pipeline: sig → bands → candidates →
    // signature-estimated jaccard (oracle reproduces the banding exactly)
    "dedup_minhash_pairs" -> ((s, dir) => {
      Similarity.minhashPairs(Sources.parallelizedBy(Sources.table(s, dir, "documents")
          .select(col("doc_id"), col("text")), col("doc_id")), "doc_id", "text", shingleSize = 5, sigLen = 16, bands = 4, minJaccard = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // 64-bit simhash per document (row-based: explode → hash once → 64
    // conditional sums in one HashAggregate; see Similarity.simhashTable)
    "dedup_simhash" -> ((s, dir) => {
      Similarity.simhashTable(Sources.parallelizedBy(Sources.table(s, dir, "documents")
          .select(col("doc_id"), col("text")), col("doc_id")), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id")).limit(200)
    }),

    // exact n-gram jaccard similarity join, with the document-frequency cap
    // that bounds self-join fan-out at corpus scale (hot shingles pruned
    // from both the intersection and the set sizes — mirrored exactly by
    // the oracle)
    "dedup_ngram_jaccard" -> ((s, dir) => {
      Similarity.ngramJaccardPairs(Sources.parallelizedBy(Sources.table(s, dir, "documents")
          .select(col("doc_id"), col("text")), col("doc_id")), "doc_id", "text", shingleSize = 5, minJaccard = 0.4, maxDf = 50)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // simhash hamming-distance pairs via 4x16-bit banded multi-probe
    // (complete for hamming<=3 by pigeonhole); the oracle mirrors the
    // 64-bit simhash bit-exactly and self-joins on bit_count(xor)<=3 —
    // banding completeness makes the two result sets identical
    "dedup_simhash_pairs" -> ((s, dir) => {
      Similarity.simhashPairs(Sources.parallelizedBy(Sources.table(s, dir, "documents")
          .select(col("doc_id"), col("text")), col("doc_id")), "doc_id", "text",
          maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // benchmark decontamination (test-set overlap removal): corpus docs
    // sharing >= 2 distinct 5-gram shingles with any "benchmark" doc (a
    // deterministic doc_id slice standing in for an eval set). Benchmark
    // shingles broadcast; the corpus streams one scan — only matching
    // shingles ever shuffle
    "dedup_decontaminate" -> ((s, dir) => {
      val docs = Sources.parallelizedBy(Sources.table(s, dir, "documents")
        .select(col("doc_id"), col("text")), col("doc_id"))
      Similarity.decontaminate(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", shingleSize = 5, minOverlap = 2)
        .orderBy(col("id_a"), col("bench_id"))
    })
  )

  def oracle: Map[String, String] = {
    val sigTerms8 = (0 until 8).map { i =>
      val (a, b) = SF.minhashCoef(i)
      s"list_min(list_transform(hs, h -> (${a} * h + ${b}) % ${SF.MinHashP})) AS s$i"
    }.mkString(",\n  ")

    val sigList16 = "[" + (0 until 16).map { i =>
      val (a, b) = SF.minhashCoef(i)
      s"list_min(list_transform(hs, h -> (${a} * h + ${b}) % ${SF.MinHashP}))"
    }.mkString(", ") + "]"

    val bandKeys = "[" + (0 until 4).map { bnd =>
      val parts = (s"'$bnd'" +: (0 until 4).map(r => s"CAST(sig[${bnd * 4 + r + 1}] AS VARCHAR)")).mkString(", ")
      hex60(s"concat_ws(',', $parts)")
    }.mkString(", ") + "]"

    Map(
      "text_analysis" ->
        s"""SELECT doc_id, $NTokSql AS n_tokens,
           |  ${rc("text", "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")} AS n_bpeish,
           |  $LangSql AS lang_guess,
           |  $QualitySql AS quality
           |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,

      "text_stats_by_source" ->
        s"""SELECT source, count(*) AS n_docs,
           |  CAST(sum(CAST($NTokSql AS BIGINT)) AS BIGINT) AS total_tokens,
           |  floor(CAST(sum($QualityBpSql) AS DOUBLE) / count(*) + 0.5) / 10000.0 AS avg_quality,
           |  CAST(sum(CASE WHEN ($LangSql) = lang THEN 1 ELSE 0 END) AS BIGINT) AS lang_id_hits
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      "text_pii_redact" -> {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phone = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
        val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        s"""WITH aug AS (
           |  SELECT doc_id,
           |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
           |    '@mail.example.com or call 555-123-' ||
           |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
           |    ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.77' ||
           |    CASE WHEN doc_id % 3 = 0 THEN ' cc second.contact@ex.org' ELSE '' END AS a
           |  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 200))
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(a, '$email')) AS BIGINT) AS emails,
           |  CAST(len(regexp_extract_all(a, '$phone')) AS BIGINT) AS phones,
           |  CAST(len(regexp_extract_all(a, '$ip')) AS BIGINT) AS ips,
           |  regexp_replace(regexp_replace(regexp_replace(a,
           |    '$email', '[EMAIL]', 'g'), '$ip', '[IP]', 'g'),
           |    '$phone', '[PHONE]', 'g') AS redacted
           |FROM aug ORDER BY doc_id""".stripMargin
      },

      "text_fingerprint" ->
        s"""SELECT doc_id, ${hex60(s"lower($NormSql)")} AS fp,
           |  CASE WHEN len($NormSql) >= 8 THEN
           |    list_min(list_transform(range(1, len($NormSql) - 6),
           |      i -> ${hex60(s"substr($NormSql, i, 8)")}))
           |  END AS rolling_fp
           |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,

      "text_gopher_filters" -> {
        val l = "string_split(text, chr(10))"
        val bp = (x: String) => s"CAST(floor(($x) * 10000.0 + 0.5) AS BIGINT)"
        val ntokD = s"greatest(CAST($NTokSql AS DOUBLE), 1.0)"
        s"""SELECT doc_id,
           |  CAST(len($l) AS BIGINT) AS n_lines,
           |  ${bp(s"1.0 - CAST(len(list_distinct($l)) AS DOUBLE) / len($l)")} AS dup_line_bp,
           |  ${bp(s"CAST(len(list_filter($l, x -> regexp_matches(trim(x), '^[-*•]'))) AS DOUBLE) / len($l)")} AS bullet_bp,
           |  ${bp(s"CAST(len(list_filter($l, x -> ends_with(x, '...'))) AS DOUBLE) / len($l)")} AS ellipsis_bp,
           |  ${bp(s"CAST(len(regexp_extract_all(text, '[#…]|\\.\\.\\.')) AS DOUBLE) / $ntokD")} AS symbol_bp,
           |  CAST(floor((CAST(len($NormSql) AS DOUBLE) - (CAST($NTokSql AS DOUBLE) - 1)) / $ntokD * 100.0 + 0.5) AS BIGINT) AS mwl_x100
           |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin
      },

      "text_repetition" ->
        s"""WITH base AS (SELECT doc_id, $ToksSql AS t FROM documents ORDER BY doc_id LIMIT 200),
           |s AS (SELECT doc_id, CASE WHEN len(t) >= 3
           |  THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
           |  ELSE [] END AS sgl FROM base)
           |SELECT doc_id, CASE WHEN len(sgl) > 0
           |  THEN CAST(floor(CAST(len(sgl) - len(list_distinct(sgl)) AS DOUBLE)
           |       / len(sgl) * 10000.0 + 0.5) AS BIGINT)
           |  ELSE 0 END AS dup3_bp
           |FROM s ORDER BY doc_id""".stripMargin,

      "text_gopher_gate" -> {
        val l = "string_split(text, chr(10))"
        val bp = (x: String) => s"CAST(floor(($x) * 10000.0 + 0.5) AS BIGINT)"
        val ntokD = s"greatest(CAST($NTokSql AS DOUBLE), 1.0)"
        val dup = bp(s"1.0 - CAST(len(list_distinct($l)) AS DOUBLE) / len($l)")
        val bullet = bp(s"CAST(len(list_filter($l, x -> regexp_matches(trim(x), '^[-*•]'))) AS DOUBLE) / len($l)")
        val ell = bp(s"CAST(len(list_filter($l, x -> ends_with(x, '...'))) AS DOUBLE) / len($l)")
        val mwl = s"CAST(floor((CAST(len($NormSql) AS DOUBLE) - (CAST($NTokSql AS DOUBLE) - 1)) / $ntokD * 100.0 + 0.5) AS BIGINT)"
        s"""SELECT source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN $dup < 3000 AND $bullet < 9000 AND $ell < 3000
           |                 AND $mwl BETWEEN 300 AND 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
      },

      "dedup_exact" ->
        s"""SELECT source, count(*) AS n_docs,
           |  count(DISTINCT ${hex60(s"lower($NormSql)")}) AS n_unique,
           |  count(*) - count(DISTINCT ${hex60(s"lower($NormSql)")}) AS n_dup_rows
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

      "dedup_minhash_sig" ->
        s"""WITH base AS (SELECT doc_id, $ToksSql AS t FROM documents),
           |sh AS (SELECT doc_id, $ShinglesSql AS sgl FROM base WHERE len(t) >= 5),
           |hsx AS (SELECT doc_id, list_transform(sgl, s -> ${hex32("s")}) AS hs FROM sh)
           |SELECT doc_id, $sigTerms8
           |FROM hsx ORDER BY doc_id LIMIT 200""".stripMargin,

      "dedup_minhash_pairs" ->
        s"""WITH base AS (SELECT doc_id, $ToksSql AS t FROM documents),
           |sh AS (SELECT doc_id, $ShinglesSql AS sgl FROM base WHERE len(t) >= 5),
           |hsx AS (SELECT doc_id, list_transform(sgl, s -> ${hex32("s")}) AS hs FROM sh),
           |sigs AS (SELECT doc_id, $sigList16 AS sig FROM hsx),
           |bands AS (SELECT doc_id, sig, unnest($bandKeys) AS band_key FROM sigs),
           |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           |                a.sig AS sig_a, b.sig AS sig_b
           |         FROM bands a JOIN bands b
           |           ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
           |SELECT id_a, id_b,
           |  round(CAST(list_sum(list_transform(range(1, 17),
           |    i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 16, 4) AS est_jaccard
           |FROM cand
           |WHERE CAST(list_sum(list_transform(range(1, 17),
           |    i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 16 >= 0.5
           |ORDER BY id_a, id_b""".stripMargin,

      "dedup_simhash" ->
        s"""WITH $SimhashCte
           |SELECT doc_id, simhash FROM sh ORDER BY doc_id LIMIT 200""".stripMargin,

      "dedup_simhash_pairs" ->
        s"""WITH $SimhashCte
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
           |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
           |ORDER BY id_a, id_b""".stripMargin,

      "dedup_decontaminate" ->
        s"""WITH base AS (SELECT doc_id, $ToksSql AS t FROM documents),
           |sh AS (SELECT doc_id, unnest($ShinglesSql) AS s FROM base WHERE len(t) >= 5),
           |shh AS (SELECT DISTINCT doc_id, ${hex60("s")} AS sh FROM sh),
           |bench AS (SELECT doc_id AS bench_id, sh FROM shh WHERE doc_id % 37 = 0),
           |corpus AS (SELECT doc_id AS id_a, sh FROM shh WHERE doc_id % 37 <> 0)
           |SELECT id_a, bench_id, count(*) AS overlap
           |FROM corpus JOIN bench USING (sh)
           |GROUP BY 1, 2 HAVING count(*) >= 2
           |ORDER BY id_a, bench_id""".stripMargin,

      "dedup_ngram_jaccard" ->
        s"""WITH base AS (SELECT doc_id, $ToksSql AS t FROM documents),
           |sh AS (SELECT doc_id, unnest($ShinglesSql) AS s FROM base WHERE len(t) >= 5),
           |shh0 AS (SELECT doc_id, ${hex60("s")} AS sh FROM sh),
           |dfc AS (SELECT sh, count(*) AS df FROM shh0 GROUP BY 1),
           |shh AS (SELECT shh0.doc_id, shh0.sh FROM shh0 JOIN dfc USING (sh) WHERE df <= 50),
           |sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY 1),
           |inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter
           |          FROM shh x JOIN shh y ON x.sh = y.sh AND x.doc_id < y.doc_id
           |          GROUP BY 1, 2)
           |SELECT id_a, id_b, inter, sa.n AS n_a, sb.n AS n_b,
           |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS jaccard
           |FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
           |           JOIN sizes sb ON inter.id_b = sb.doc_id
           |WHERE round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) >= 0.4
           |ORDER BY id_a, id_b""".stripMargin
    )
  }
}
