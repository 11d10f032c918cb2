package graft.tools

import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, GenericInternalRow, SortOrder}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** Micro-profile: interpreted vs generated ordering over the struct keys
  * FirstLastFoldAgg compares once per input row — in ONE JVM, alternating,
  * so box noise cancels (the query-level A/B swung −17%..+37% across
  * windows while the absolute query time itself swung ±30%).
  * Usage: runMain graft.tools.OrderingProfile
  */
object OrderingProfile {
  def main(args: Array[String]): Unit = {
    val dt = StructType(Seq(
      StructField("t", DateType), StructField("v", DoubleType)))
    val interp: Ordering[Any] = TypeUtils.getInterpretedOrdering(dt)
    val gen0 = org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
      .generate(Seq(SortOrder(BoundReference(0, dt, nullable = true), Ascending)))
    val ra = new GenericInternalRow(1); val rb = new GenericInternalRow(1)
    val gen: Ordering[Any] = new Ordering[Any] {
      override def compare(a: Any, b: Any): Int = {
        ra.update(0, a); rb.update(0, b); gen0.compare(ra, rb)
      }
    }
    val rnd = new scala.util.Random(1)
    val keys: Array[Any] = Array.fill(1024) {
      val r = new GenericInternalRow(2)
      r.update(0, rnd.nextInt(10000))
      r.update(1, rnd.nextDouble())
      r
    }
    def bench(name: String, ord: Ordering[Any]): Unit = {
      var sink = 0
      val n = 10000000
      // warm
      var i = 0
      while (i < n) { sink += ord.compare(keys(i & 1023), keys((i + 7) & 1023)); i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { sink += ord.compare(keys(i & 1023), keys((i + 7) & 1023)); i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ordprof] $name%-12s $n compares in $dt%.3f s (${dt / n * 1e9}%.1f ns/cmp, sink=$sink)")
    }
    // alternate to cancel JIT/thermal drift
    for (_ <- 1 to 3) { bench("interpreted", interp); bench("generated", gen) }
  }
}
