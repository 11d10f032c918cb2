package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Lloyd's k-means assignment + SemDeDup-style semantic dedup (cluster,
  * then prune cosine near-dups within the cluster — Abbas et al. 2023).
  * The cross-engine oracle for both lives in EmbeddingQueries
  * (embed_kmeans / dedup_semantic); these specs pin the operator semantics
  * on small controlled inputs.
  */
class KMeansSemDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("kmeansAssign separates two obvious blobs and is deterministic") {
    val pts = Seq(
      (0L, Seq(0.0, 0.1)), (1L, Seq(10.0, 9.9)),
      (2L, Seq(0.2, -0.1)), (3L, Seq(9.8, 10.2)),
      (4L, Seq(-0.3, 0.05)), (5L, Seq(10.1, 10.0))
    ).toDF("id", "v")
    val seeds = Seq(Seq(0.0, 0.1), Seq(10.0, 9.9))
    def run() = Similarity.kmeansAssign(pts, "id", "v", seeds, iters = 3)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    val out = run()
    assert(Seq(0L, 2L, 4L).forall(out(_) == 0))
    assert(Seq(1L, 3L, 5L).forall(out(_) == 1))
    assert(out == run()) // fixed seeds + fixed iterations => bit-stable
  }

  test("kmeansAssign: a cluster that captures no points keeps its centroid") {
    val pts = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(0.1, 0.1))).toDF("id", "v")
    val seeds = Seq(Seq(0.0, 0.0), Seq(100.0, 100.0))
    val out = Similarity.kmeansAssign(pts, "id", "v", seeds, iters = 3)
      .select("cluster").as[Int].collect()
    assert(out.forall(_ == 0)) // far-away seed survives empty, captures nothing
  }

  test("iters=1 assignment matches a naive driver-side L2 argmin (sf0.001)") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val seeds = e.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val base = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val got = Similarity.kmeansAssign(base, "vec_id", "v", seeds, iters = 1)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val want = e.select("vec_id", "embedding").collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val dists = seeds.map(c => c.zip(v).map { case (ci, xi) =>
        (xi - ci) * (xi - ci) }.sum)
      r.getLong(0) -> dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
    }.toMap
    assert(got == want)
  }

  test("two-level pruned assignment (k >= 64) is bit-identical to the flat argmin") {
    // k = 100 engages the r17 pruned scan (threshold 64); the reference
    // below re-implements the FLAT loop's exact arithmetic (csq - 2*dot,
    // index-order folds, first-strict-min-wins), so any pruning error —
    // including a wrongly skipped group on an exact tie — fails the spec.
    val rnd = new scala.util.Random(42)
    val dim = 16
    val k = 100
    val cents0 = Array.fill(k)(Array.fill(dim)(rnd.nextDouble() * 4 - 2))
    cents0(57) = cents0(13).clone() // exact duplicate centroid: index tiebreak
    val cents = cents0.map(_.toSeq).toSeq
    val vecs = Array.fill(400)(Array.fill(dim)(rnd.nextDouble() * 4 - 2)) ++
      Array(cents0(13).clone(), cents0(99).clone()) // exact-tie probes
    val csq = cents0.map(c => { var a = 0.0; var i = 0
      while (i < dim) { a += c(i) * c(i); i += 1 }; a })
    def flatRef(xs: Array[Double], useL2: Boolean): Int = {
      var best = Double.PositiveInfinity; var bi = 0; var c = 0
      while (c < k) {
        var dot = 0.0; var i = 0
        while (i < dim) { dot += xs(i) * cents0(c)(i); i += 1 }
        val score = if (useL2) csq(c) - 2.0 * dot else -dot
        if (score < best) { best = score; bi = c }
        c += 1
      }
      bi
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("id", "v")
    for (useL2 <- Seq(true, false)) {
      val got = df.select(col("id"),
          graft.functions.SimilarityFunctions.nearestCentroid(col("v"), cents, useL2).as("c"))
        .as[(Long, Int)].collect().toMap
      vecs.zipWithIndex.foreach { case (v, i) =>
        assert(got(i.toLong) == flatRef(v, useL2),
          s"row $i useL2=$useL2: pruned ${got(i.toLong)} != flat ${flatRef(v, useL2)}")
      }
    }
  }

  test("dedup_semantic drops exactly the planted near-dup copies (sf0.001)") {
    val out = SparkEntry.queries("dedup_semantic")(spark, sf()).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) + 1000000L) // dropped = its original + 1e6
      assert(r.getLong(2) == 1L)                      // one qualifying neighbor
      assert(r.getDouble(3) > 0.99)                   // the planted ~0.9997 cosine
    }
  }
}
