package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.{SimilarityFunctions => SF, TextFunctions => TF}

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different content about databases and distributed query engines"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"),   // exact dup of 0
    (4L, "short text"),
    (5L, "THE  Quick   Brown fox jumps over the lazy dog near the river bank today") // ws/case variant of 0
  ).toDF("doc_id", "text")

  test("exactDedup groups case/whitespace variants") {
    val out = Similarity.exactDedup(docs, "doc_id", "text").collect()
    val byKeep = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byKeep(0L) == 3L) // docs 0, 3, 5 share a fingerprint
    assert(out.length == 4)  // 0-group, 1, 2, 4
  }

  test("minhashPairs finds planted near-duplicates") {
    val pairs = Similarity.minhashPairs(docs, "doc_id", "text", minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // identical → all bands collide
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L))) // near-dup caught
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated doc clean
  }

  test("ngramJaccardPairs computes exact jaccard") {
    val out = Similarity.ngramJaccardPairs(docs, "doc_id", "text", minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(out((0L, 3L)) == 1.0) // identical shingle sets
    assert(out.contains((0L, 1L)) && out((0L, 1L)) > 0.7) // one word changed
    assert(!out.keys.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("simhashPairs: identical docs at hamming 0") {
    val out = Similarity.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 3L)) == 0L)
  }

  test("cosineKnn exact top-k and lshAnn recall") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val queries = emb.filter(col("vec_id") === 0L)
    val exact = Similarity.cosineKnn(emb, queries, "vec_id", "embedding", 5)
    val rows = exact.collect()
    assert(rows.length == 5)
    // ranks are 1..5, cosines non-increasing
    val cos = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    // self excluded
    assert(!rows.exists(_.getLong(1) == 0L))

    // LSH ANN returns a subset of the bucket, each with valid cosine
    val ann = Similarity.lshAnn(emb, queries, "vec_id", "embedding", 5, 8, 64).collect()
    assert(ann.forall(r => r.getDouble(3) <= 1.000001 && r.getDouble(3) >= -1.000001))
  }

  test("minhash signature determinism + hexLong32 range") {
    val sig1 = docs.select(SF.minhashSignature(TF.wordShingles(col("text"), 5), 16).as("s")).collect()
    val sig2 = docs.select(SF.minhashSignature(TF.wordShingles(col("text"), 5), 16).as("s")).collect()
    assert(sig1.map(_.toString).sameElements(sig2.map(_.toString)))
    val hs = docs.select(TF.hexLong32(col("text")).as("h")).as[Long].collect()
    assert(hs.forall(h => h >= 0 && h <= 0xFFFFFFFFL))
  }
}
