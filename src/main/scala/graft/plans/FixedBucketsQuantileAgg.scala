package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** APPROX_QUANTILE_FIXED_BUCKETS — the reference's FixedBucketsHistogram
  * percentile (extensions-core/histogram/.../FixedBucketsHistogram.java):
  * `numBuckets` equal buckets over [lowerLimit, upperLimit); add() drops
  * (IGNORE) or clips (CLIP) outliers (:390-396, :1165-1277); the
  * percentile walks cumulative bucket fractions and linearly interpolates
  * WITHIN the crossing bucket, returned at float32 precision
  * (percentilesFloat:737-767 — 6.440000057220459 = 6.44f). A bare
  * AggregateFunction so SQL FILTER clauses attach
  * (FixedBucketsHistogramQuantileSqlAggregator). */
case class FixedBucketsQuantileAgg(
    child: Expression,
    prob: Double,
    numBuckets: Int,
    lowerLimit: Double,
    upperLimit: Double,
    outlierMode: String = "ignore",   // ignore | clip
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val bucketSize = (upperLimit - lowerLimit) / numBuckets
  private val clip = outlierMode.equalsIgnoreCase("clip")

  // buffer: numBuckets counts + trailing total count
  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBuckets + 1)

  private def add(buf: Array[Long], v: Double): Unit = {
    if (v < lowerLimit) {
      if (clip) { buf(0) += 1; buf(numBuckets) += 1 }
    } else if (v >= upperLimit) {
      if (clip) { buf(numBuckets - 1) += 1; buf(numBuckets) += 1 }
    } else {
      var b = ((v - lowerLimit) / bucketSize).toInt
      if (b >= numBuckets) b = numBuckets - 1
      buf(b) += 1; buf(numBuckets) += 1
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    child.eval(input) match {
      case null => ()
      case n: Number => add(buf, n.doubleValue())
      case s: UTF8String =>
        try add(buf, java.lang.Double.parseDouble(s.toString))
        catch { case _: Exception => () }
      case _ => ()
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  /** percentilesFloat's single-percentile body. An EMPTY histogram
    * finalizes to 0.0 — the reference's cumulative-fraction loop never
    * crosses a NaN percentage, so the result array keeps its 0.0f fill
    * (FixedBucketsHistogramQuantileSqlAggregatorTest
    * .testEmptyTimeseriesResults pins {0.0, 0.0}). */
  override def eval(buf: Array[Long]): Any = {
    val total = buf(numBuckets)
    if (total == 0) return 0.0
    // the SQL layer's probability is a FLOAT
    // (QuantilePostAggregator(probability float)), so pct carries float32
    // rounding: 0.99f*100 = 99.00000095..., which shifts the interpolated
    // value to the reference's exact 6.470000267028809-style outputs
    val pct = prob.toFloat.toDouble * 100.0
    var prev = 0L; var prevP = 0.0; var prevB = lowerLimit
    var i = 0
    while (i < numBuckets) {
      val next = prev + buf(i)
      val nextP = 100.0 * next / total
      val nextB = (i + 1) * bucketSize + lowerLimit
      if (nextP >= pct) {
        val f = (pct - prevP) / (nextP - prevP)
        return (f * (nextB - prevB) + prevB).toFloat.toDouble
      }
      prev = next; prevP = nextP; prevB = nextB
      i += 1
    }
    upperLimit.toFloat.toDouble
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numBuckets + 1)(bb.getLong)
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): FixedBucketsQuantileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FixedBucketsQuantileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FixedBucketsQuantileAgg =
    copy(child = c)
  override def prettyName: String = "approx_quantile_fixed_buckets"
}
