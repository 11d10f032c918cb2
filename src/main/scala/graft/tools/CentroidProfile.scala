package graft.tools

/** Scratch microbench for NearestCentroid flat vs two-level pruned scan
  * (r17): evals the expression directly over synthetic data shaped like
  * dedup_semantic at sf10 (k=782, d=64, near-random vectors).
  * Usage: runMain graft.tools.CentroidProfile [k] [n]
  */
object CentroidProfile {
  def main(args: Array[String]): Unit = {
    val k = if (args.length > 0) args(0).toInt else 782
    val n = if (args.length > 1) args(1).toInt else 200000
    val dim = 64
    val rnd = new scala.util.Random(7)
    val (cents, rows) = sys.env.get("GRAFT_CENTROID_DATA") match {
      case Some(dir) =>
        val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
          .config("spark.ui.enabled", "false").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        import org.apache.spark.sql.functions._
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
        val cs = e.filter(col("vec_id") < k).orderBy("vec_id").collect()
          .map(_.getSeq[Double](1).toArray)
        val rs = e.limit(n).collect().map(r =>
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
              r.getSeq[Double](1).toArray))): org.apache.spark.sql.catalyst.InternalRow)
        (cs, rs)
      case None =>
        (Array.fill(k)(Array.fill(dim)(rnd.nextDouble() * 2 - 1)),
          Array.fill(n)(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
              Array.fill(dim)(rnd.nextDouble() * 2 - 1)))): org.apache.spark.sql.catalyst.InternalRow))
    }
    val bridge = org.apache.spark.sql.graftbridge.CatalystBridge
    val child = org.apache.spark.sql.catalyst.expressions.BoundReference(0,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
      nullable = false)
    def run(label: String): Unit = {
      val expr = graft.functions.NearestCentroid(child, cents, useL2 = true)
      // warm
      var i = 0; var acc = 0L
      while (i < math.min(n, 20000)) { acc += expr.eval(rows(i)).asInstanceOf[Int]; i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { acc += expr.eval(rows(i)).asInstanceOf[Int]; i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[centroid] $label%-10s k=$k n=$n  ${dt}%.3f s  (${dt / n * 1e6}%.2f us/row)  acc=$acc")
    }
    run("first")
    run("second")
  }
}
