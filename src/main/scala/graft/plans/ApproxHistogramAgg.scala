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
    // the reference's APPROX_FLAG_BIT: a centroid produced by merging is
    // approximate; sum(b) treats exact centroids as point masses
    var exact: Array[Boolean] = new Array[Boolean](0)
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
        exact = insertB(exact, ins, true)
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
        if (idx >= 0) {
          bins(idx) += other.bins(i)
          exact(idx) = exact(idx) && other.exact(i)
        } else {
          val ins = -idx - 1
          positions = insertF(positions, ins, v)
          bins = insertL(bins, ins, other.bins(i))
          exact = insertB(exact, ins, other.exact(i))
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
      positions(best) = p; bins(best) = m; exact(best) = false
      positions = removeF(positions, best + 1)
      bins = removeL(bins, best + 1)
      exact = removeB(exact, best + 1)
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
      val bb = java.nio.ByteBuffer.allocate(4 + 8 + positions.length * 13 + 8)
      bb.putInt(positions.length).putFloat(min).putFloat(max)
      positions.foreach(bb.putFloat)
      bins.foreach(bb.putLong)
      exact.foreach(e => bb.put(if (e) 1.toByte else 0.toByte))
      bb.array()
    }

    /** ApproximateHistogram.sum(b) — Algorithm 3's cumulative count below b
      * (:1460-1514): trapezoid interpolation between the surrounding
      * centroids, with EXACT centroids contributing as point masses. */
    def sum(b: Float): Double = {
      if (count == 0 || b < min) return 0.0
      if (b >= max) return count.toDouble
      var index = java.util.Arrays.binarySearch(positions, b)
      val exactMatch = index >= 0
      if (!exactMatch) { index = -(index + 1); index -= 1 }
      val outerLeft = index < 0
      val outerRight = index >= positions.length - 1
      val m0 = if (outerLeft) 0L else bins(index)
      val m1 = if (outerRight) 0L else bins(index + 1)
      val p0 = if (outerLeft) min.toDouble else positions(index).toDouble
      val p1 = if (outerRight) max.toDouble else positions(index + 1).toDouble
      val exact0 = !outerLeft && exact(index)
      val exact1 = !outerRight && exact(index + 1)
      val l = if (p1 == p0) 0.0 else (b - p0) / (p1 - p0)
      val tm0 = if (exact0) 0L else m0
      val tm1 = if (exact1) 0L else m1
      val mb = tm0 + (tm1 - tm0) * l
      var s = 0.5 * (tm0 + mb) * l
      var i = 0
      while (i < index) { s += bins(i); i += 1 }
      if (exact0) s + m0 else s + 0.5 * m0
    }

    /** toHistogram(breaks) (:1607-1626): per-bin approximate masses as
      * first differences of sum(). */
    def histogramBreaks(breaks: Array[Float]): Array[Double] = {
      val out = new Array[Double](breaks.length - 1)
      var prev = sum(breaks(0))
      var i = 1
      while (i < breaks.length) {
        val s = sum(breaks(i))
        out(i - 1) = (s - prev).toFloat.toDouble // reference casts each bin to float
        prev = s
        i += 1
      }
      out
    }

    /** toHistogram(size) (:1628-1641): size+1 equally spaced breaks with
      * breaks[0] = min - delta and breaks[size] = max. */
    def equalBreaks(size: Int): Array[Float] = {
      val breaks = new Array[Float](size + 1)
      val delta = (max - min) / (size - 1)
      breaks(0) = min - delta
      var i = 1
      while (i < breaks.length - 1) { breaks(i) = breaks(i - 1) + delta; i += 1 }
      breaks(breaks.length - 1) = max
      breaks
    }

    /** toHistogram(bucketSize, offset) (:1650-1695): offset-aligned breaks,
      * empty-run trimming at cutoff 0.1 (lowerLimit/upperLimit are the
      * unset ±inf defaults — the limits are ingest-spec knobs). */
    def bucketBreaks(bucketSize: Float, offset: Float): Array[Float] = {
      val minFloor = (math.floor((min - offset) / bucketSize) * bucketSize + offset).toFloat
      val firstBreak = minFloor
      val maxCeil = (math.ceil((max - offset) / bucketSize) * bucketSize + offset).toFloat
      val lastBreak = maxCeil
      val cutoff = 0.1f
      val breaks = scala.collection.mutable.ArrayBuffer[Float]()
      val bottomBreak = minFloor - bucketSize
      if (bottomBreak != firstBreak && (sum(firstBreak) - sum(bottomBreak) > cutoff))
        breaks += bottomBreak
      var left = firstBreak
      var leftSet = false
      while (left + bucketSize <= lastBreak + (bucketSize / 10)) {
        val right = left + bucketSize
        if (sum(right) - sum(left) > cutoff) {
          if (!leftSet) breaks += left
          breaks += right
          leftSet = true
        } else leftSet = false
        left = right
      }
      if (breaks.last != maxCeil && (sum(maxCeil) - sum(breaks.last) > cutoff))
        breaks += maxCeil
      breaks.toArray
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
      h.exact =
        if (bb.remaining() >= n) Array.fill(n)(bb.get() != 0)
        else Array.fill(n)(false) // legacy buffers: conservatively approximate
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
  private def insertB(a: Array[Boolean], i: Int, v: Boolean): Array[Boolean] = {
    val out = new Array[Boolean](a.length + 1)
    System.arraycopy(a, 0, out, 0, i); out(i) = v
    System.arraycopy(a, i, out, i + 1, a.length - i); out
  }
  private def removeB(a: Array[Boolean], i: Int): Array[Boolean] = {
    val out = new Array[Boolean](a.length - 1)
    System.arraycopy(a, 0, out, 0, i)
    System.arraycopy(a, i + 1, out, i, a.length - i - 1); out
  }
}

/** approxHistogram / approxHistogramFold aggregator producing the raw
  * histogram STATE (ApproximateHistogramAggregatorFactory /
  * ApproximateHistogramFoldingAggregatorFactory): post-aggregators
  * (quantile/quantiles/min/max/buckets/customBuckets/equalBuckets) read
  * these bytes; output finalization renders the centroid summary. A
  * binary input FOLDS stored histogram state. */
case class ApproxHistAgg(
    child: Expression,
    resolution: Int = 50,
    foldInput: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ApproxHistQuantileAgg.Hist] with UnaryLike[Expression] {
  import ApproxHistQuantileAgg.Hist

  override def createAggregationBuffer(): Hist = new Hist(resolution)
  override def update(buf: Hist, input: InternalRow): Hist = {
    child.eval(input) match {
      case null => ()
      case b: Array[Byte] if foldInput => buf.fold(Hist.fromBytes(b, resolution))
      case n: Number => buf.offer(n.floatValue())
      case s: UTF8String =>
        try buf.offer(java.lang.Float.parseFloat(s.toString))
        catch { case _: Exception => () }
      case _ => ()
    }
    buf
  }
  override def merge(buf: Hist, other: Hist): Hist = { buf.fold(other); buf }
  override def eval(buf: Hist): Any = buf.toBytes
  override def serialize(buf: Hist): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Hist = Hist.fromBytes(bytes, resolution)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): ApproxHistAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ApproxHistAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ApproxHistAgg =
    copy(child = c)
  override def prettyName: String = "approx_histogram"
}

/** The histogram module's post-aggregators over ApproxHistAgg state bytes
  * (extensions-core/histogram): kind selects the computation —
  * "quantile"(prob) / "min" / "max" → float-precision double;
  * "quantiles"(probs) → struct{probabilities, quantiles, min, max}
  * (the Quantiles object); "customBuckets"(breaks) / "equalBuckets"(n) /
  * "buckets"(size, offset) → struct{breaks, counts} (the Histogram
  * object, via sum()'s first differences). */
case class ApproxHistPostAgg(child: Expression, kind: String,
    params: Seq[Double] = Nil)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import ApproxHistQuantileAgg.Hist
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.catalyst.InternalRow

  override def dataType: DataType = kind match {
    case "summary" => StringType
    case "quantile" | "min" | "max" => DoubleType
    case "quantiles" => StructType(Seq(
      StructField("probabilities", ArrayType(DoubleType, containsNull = false)),
      StructField("quantiles", ArrayType(DoubleType, containsNull = false)),
      StructField("min", DoubleType), StructField("max", DoubleType)))
    case _ => StructType(Seq(
      StructField("breaks", ArrayType(DoubleType, containsNull = false)),
      StructField("counts", ArrayType(DoubleType, containsNull = false))))
  }

  override protected def nullSafeEval(v: Any): Any = {
    val h = Hist.fromBytes(v.asInstanceOf[Array[Byte]], 50)
    def hist(breaks: Array[Float]): Any =
      org.apache.spark.sql.catalyst.InternalRow(
        ArrayData.toArrayData(breaks.map(_.toDouble)),
        ArrayData.toArrayData(h.histogramBreaks(breaks)))
    kind match {
      // the engine's established output rendering for a bare approxHistogram
      // aggregate: rounded "x:y" centroid pairs
      case "summary" =>
        org.apache.spark.unsafe.types.UTF8String.fromString(
          h.positions.zip(h.bins).map { case (x, y) =>
            s"${math.round(x.toDouble)}:${y}"
          }.mkString(","))
      case "quantile" => if (h.count == 0) null else h.quantile(params.head).toDouble
      case "min" => if (h.count == 0) null else h.min.toDouble
      case "max" => if (h.count == 0) null else h.max.toDouble
      case "quantiles" =>
        if (h.count == 0) null
        else InternalRow(
          ArrayData.toArrayData(params.map(_.toFloat.toDouble).toArray),
          ArrayData.toArrayData(params.map(p => h.quantile(p).toDouble).toArray),
          h.min.toDouble, h.max.toDouble)
      case "customBuckets" => if (h.count == 0) null else hist(params.map(_.toFloat).toArray)
      case "equalBuckets" => if (h.count == 0) null else hist(h.equalBreaks(params.head.toInt))
      case "buckets" =>
        if (h.count == 0) null
        else hist(h.bucketBreaks(params.head.toFloat, params(1).toFloat))
      case k => throw new IllegalArgumentException(s"approxHistogram post-agg: $k")
    }
  }
  override protected def withNewChildInternal(c: Expression): ApproxHistPostAgg =
    copy(child = c)
  override def prettyName: String = s"approx_histogram_$kind"
}
