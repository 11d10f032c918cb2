package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity primitives for near-duplicate detection and embedding search:
  * MinHash signatures, SimHash, and cosine/dot-product over float vectors.
  *
  * All column expressions, no UDFs. Hash determinism: every hash bottoms out
  * in md5-hex→int (TextFunctions.hexLong32/60), which is bit-identical across
  * engines and runs — a requirement for both the DuckDB oracle and for
  * incremental dedup at scale (signatures computed in different jobs must
  * agree).
  */
object SimilarityFunctions {
  import TextFunctions.{hexLong32, hexLong60}

  /** Prime > 2^32 for modular minhash permutations; with 32-bit base hashes
    * and coefficients < 2^31, a*h+b stays within signed 64-bit. */
  val MinHashP = 4294967311L

  /** Deterministic permutation coefficients for hash i. */
  def minhashCoef(i: Int): (Long, Long) =
    ((1000003L * (i + 1)) % 2147483647L, (7919L * (i + 1)) % MinHashP)

  /** MinHash signature: array of `n` minima of permuted 32-bit shingle
    * hashes. Input: array<string> shingles (deduped). Null-safe: empty
    * shingle set → array of nulls.
    */
  def minhashSignature(shingles: Column, n: Int): Column = {
    val hs = transform(shingles, s => hexLong32(s))
    array((0 until n).map { i =>
      val (a, b) = minhashCoef(i)
      array_min(transform(hs, h => (lit(a) * h + lit(b)) % MinHashP))
    }: _*)
  }

  /** LSH band keys: hash each of `bands` contiguous slices of the signature
    * to a single long; docs sharing any band key are candidate pairs.
    * rowsPerBand = sigLen / bands.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      hexLong60(concat_ws(",",
        lit(b.toString) +: (0 until rowsPerBand).map(r =>
          element_at(sig, b * rowsPerBand + r + 1).cast("string")): _*))
    }: _*)

  /** 16-bit SimHash over an array<string> of tokens. Each bit is the sign of
    * the sum of ±1 votes from the tokens' 32-bit hashes.
    */
  def simhash16(toks: Column): Column = {
    val hs = transform(toks, t => hexLong32(t))
    (0 until 16).map { b =>
      val votes = aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(1) * 2 - 1))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash longs (popcount of xor). */
  def hammingDistance(a: Column, b: Column): Column = {
    val x = a.bitwiseXOR(b)
    (0 until 16).map(i => shiftright(x, i).bitwiseAND(1)).reduce(_ + _)
  }

  /** Dot product of two float-array columns, accumulated in double in array
    * order (deterministic). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity in double precision. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Signed random-hyperplane LSH bucket for a float vector: `planes`
    * pseudo-random hyperplanes with md5-derived weights; bit j = sign of
    * projection onto plane j. Weight formula (plane j, dim i):
    * (hexLong32("j_i") % 2001 - 1000) / 1000.0 — deterministic, no RNG state.
    */
  def hyperplaneBucket(vec: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { j =>
      val proj = (0 until dim).map { i =>
        val w = (TextFunctions.hexLong32(lit(s"${j}_$i")) % 2001L - 1000L).cast("double") / 1000.0
        element_at(vec, i + 1).cast("double") * w
      }.reduce(_ + _)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
