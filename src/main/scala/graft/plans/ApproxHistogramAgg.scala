package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's APPROX_QUANTILE — the (deprecated-in-favor-of-DS_*)
  * ApproximateHistogram surface (extensions-core/histogram/.../
  * ApproximateHistogram.java + sql/QuantileSqlAggregator): a Ben-Haim/
  * Tom-Tov centroid histogram over FLOAT32 positions (the reference's
  * positions are float[], so 5.88f prints as 5.880000114440918), finalized
  * by the reference's Algorithm-4 quantile interpolation
  * (ApproximateHistogram.getQuantiles:1527-1597): find the centroid pair
  * around s = p·count, solve a·z² + b·z + c = 0 with a = m_i − m_{i−1},
  * b = 2·m_{i−1}, c = −2·d, clamp to [min, max]. Exact whenever the
  * distinct-value count stays within the resolution (every centroid a
  * single value) — the regime QuantileSqlAggregatorTest pins. A bare
  * AggregateFunction so SQL FILTER clauses attach. */
case class ApproxHistQuantileAgg(
    child: Expression,
    prob: Double,
    resolution: Int = 50,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ApproxHistQuantileAgg.Hist] with UnaryLike[Expression] {
  import ApproxHistQuantileAgg.Hist

  override def createAggregationBuffer(): Hist = new Hist(resolution)

  override def update(buf: Hist, input: InternalRow): Hist = {
    child.eval(input) match {
      case null => ()
      case n: Number => buf.offer(n.floatValue())
      case s: UTF8String =>
        try buf.offer(java.lang.Float.parseFloat(s.toString))
        catch { case _: Exception => () }
      case _ => ()
    }
    buf
  }

  override def merge(buf: Hist, other: Hist): Hist = { buf.fold(other); buf }

  override def eval(buf: Hist): Any =
    if (buf.count == 0) null else buf.quantile(prob).toDouble

  override def serialize(buf: Hist): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Hist = Hist.fromBytes(bytes, resolution)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): ApproxHistQuantileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ApproxHistQuantileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ApproxHistQuantileAgg =
    copy(child = c)
  override def prettyName: String = "approx_quantile"
}

object ApproxHistQuantileAgg {

  /** Mutable BHTT centroid histogram: sorted float positions with long
    * counts, plus min/max. Compression merges the CLOSEST adjacent pair
    * into its weighted mean (ApproximateHistogram.mergeBins) whenever the
    * bin count exceeds the resolution. */
  final class Hist(val resolution: Int) {
    var positions: Array[Float] = new Array[Float](0)
    var bins: Array[Long] = new Array[Long](0)
    var min: Float = Float.PositiveInfinity
    var max: Float = Float.NegativeInfinity
    def count: Long = { var s = 0L; var i = 0; while (i < bins.length) { s += bins(i); i += 1 }; s }

    def offer(v: Float): Unit = {
      if (v < min) min = v
      if (v > max) max = v
      val idx = java.util.Arrays.binarySearch(positions, v)
      if (idx >= 0) bins(idx) += 1
      else {
        val ins = -idx - 1
        positions = insertF(positions, ins, v)
        bins = insertL(bins, ins, 1L)
        if (positions.length > resolution) compressOnce()
      }
    }

    def fold(other: Hist): Unit = {
      if (other.count == 0) return
      if (other.min < min) min = other.min
      if (other.max > max) max = other.max
      var i = 0
      while (i < other.positions.length) {
        val v = other.positions(i)
        val idx = java.util.Arrays.binarySearch(positions, v)
        if (idx >= 0) bins(idx) += other.bins(i)
        else {
          val ins = -idx - 1
          positions = insertF(positions, ins, v)
          bins = insertL(bins, ins, other.bins(i))
        }
        i += 1
      }
      while (positions.length > resolution) compressOnce()
    }

    private def compressOnce(): Unit = {
      var best = 0; var bestGap = Float.PositiveInfinity
      var i = 0
      while (i < positions.length - 1) {
        val gap = positions(i + 1) - positions(i)
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val m = bins(best) + bins(best + 1)
      val p = ((positions(best) * bins(best) + positions(best + 1) * bins(best + 1)) / m).toFloat
      positions(best) = p; bins(best) = m
      positions = removeF(positions, best + 1)
      bins = removeL(bins, best + 1)
    }

    /** ApproximateHistogram.getQuantiles' per-probability body (:1557-1594).
      * probabilities are float[] in the reference, so p carries float32
      * rounding into s. */
    def quantile(p: Double): Float = {
      val s = p.toFloat.toDouble * count
      var i = 0; var sum = 0L; var k = 1; var found = false
      while (k <= bins.length && !found) {
        val c = bins(k - 1)
        if (sum + c > s) { i = k - 1; found = true }
        else { sum += c; k += 1 }
      }
      if (i == 0) min
      else {
        val d = s - sum
        val c = -2 * d
        val a = bins(i) - bins(i - 1)
        val b = 2.0 * bins(i - 1)
        val z = if (a == 0) -c / b else (-b + math.sqrt(b * b - 4 * a * c)) / (2 * a)
        val uj = positions(i - 1) + (positions(i) - positions(i - 1)) * z
        if (uj.toFloat < max) uj.toFloat else max
      }
    }

    def toBytes: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 + positions.length * 12 + 8)
      bb.putInt(positions.length).putFloat(min).putFloat(max)
      positions.foreach(bb.putFloat)
      bins.foreach(bb.putLong)
      bb.array()
    }
  }

  object Hist {
    def fromBytes(bytes: Array[Byte], resolution: Int): Hist = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val h = new Hist(resolution)
      h.min = bb.getFloat; h.max = bb.getFloat
      h.positions = Array.fill(n)(bb.getFloat)
      h.bins = Array.fill(n)(bb.getLong)
      h
    }
  }

  private def insertF(a: Array[Float], i: Int, v: Float): Array[Float] = {
    val out = new Array[Float](a.length + 1)
    System.arraycopy(a, 0, out, 0, i); out(i) = v
    System.arraycopy(a, i, out, i + 1, a.length - i); out
  }
  private def insertL(a: Array[Long], i: Int, v: Long): Array[Long] = {
    val out = new Array[Long](a.length + 1)
    System.arraycopy(a, 0, out, 0, i); out(i) = v
    System.arraycopy(a, i, out, i + 1, a.length - i); out
  }
  private def removeF(a: Array[Float], i: Int): Array[Float] = {
    val out = new Array[Float](a.length - 1)
    System.arraycopy(a, 0, out, 0, i)
    System.arraycopy(a, i + 1, out, i, a.length - i - 1); out
  }
  private def removeL(a: Array[Long], i: Int): Array[Long] = {
    val out = new Array[Long](a.length - 1)
    System.arraycopy(a, 0, out, 0, i)
    System.arraycopy(a, i + 1, out, i, a.length - i - 1); out
  }
}
