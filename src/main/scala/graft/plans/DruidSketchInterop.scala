package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Read-side interop for the reference's OWN sketch binary formats, so
  * sketch columns written by an existing Druid cluster can be estimated and
  * merged by this engine without re-ingesting raw data (SURVEY §7.3 deferred
  * the write path; the migration-critical direction is read).
  *
  * HyperLogLogCollector (reference: hll/.../HyperLogLogCollector.java:53):
  * 2048 buckets × 4-bit registers with a shared additive `registerOffset`,
  * V1 layout (VersionOneHyperLogLogCollector.java:33-41):
  *   byte 0: version (0x1) · byte 1: registerOffset · bytes 2-3:
  *   numNonZeroRegisters · byte 4: maxOverflowValue · bytes 5-6:
  *   maxOverflowRegister · payload: dense (1024 bytes, two nibbles per
  *   byte) or sparse ((short position, byte register) triples).
  *
  * The decoder expands a collector to its 2048 effective register values
  * (nibble + offset, max'd with the overflow register); merging collectors
  * is then an elementwise max — value-space equivalent of
  * HyperLogLogCollector.fold — and the estimate applies the reference's
  * harmonic mean + correction formula (estimateCardinality:521,
  * applyCorrection:143) verbatim.
  */
object DruidHllc {
  val NumBuckets = 2048
  private val Alpha = 0.7213 / (1 + 1.079 / NumBuckets)
  private val CorrectionParameter = Alpha * NumBuckets * NumBuckets
  private val LowCorrectionThreshold = (5 * NumBuckets) / 2.0d
  private val TwoToTheSixtyFour = math.pow(2, 64)
  private val HighCorrectionThreshold = TwoToTheSixtyFour / 30.0d

  /** Decode collector bytes to 2048 effective register values. */
  def registerValues(bytes: Array[Byte]): Array[Int] = {
    val v = new Array[Int](NumBuckets)
    if (bytes == null || bytes.isEmpty) return v
    val version = bytes(0)
    require(version == 1,
      s"unsupported HyperLogLogCollector version $version (V1 only; V0 predates the reference's current writer)")
    val buf = ByteBuffer.wrap(bytes)
    val offset: Int = buf.get(1)
    val overflowValue: Int = buf.get(4) & 0xff
    val overflowRegister: Int = buf.getShort(5) & 0xffff
    val overflowPosition = overflowRegister >>> 1
    val isUpperNibble = (overflowRegister & 0x1) == 0
    val payloadLen = bytes.length - 7

    def put(pos: Int, nibbleUpper: Int, nibbleLower: Int): Unit = {
      var upper = nibbleUpper + offset
      var lower = nibbleLower + offset
      if (overflowValue != 0 && pos == overflowPosition) {
        if (isUpperNibble) upper = math.max(upper, overflowValue)
        else lower = math.max(lower, overflowValue)
      }
      // a zero nibble at offset 0 is an unset register (true zero); the
      // sparse estimator likewise scores missing registers as value 0
      v(2 * pos) = if (nibbleUpper == 0 && offset == 0) 0 else upper
      v(2 * pos + 1) = if (nibbleLower == 0 && offset == 0) 0 else lower
    }

    if (payloadLen == NumBuckets / 2) {
      // dense: one byte per bucket pair
      var pos = 0
      while (pos < NumBuckets / 2) {
        val reg = bytes(7 + pos) & 0xff
        put(pos, (reg & 0xf0) >>> 4, reg & 0x0f)
        pos += 1
      }
    } else {
      // sparse: (short position, byte register) triples; missing = zero
      require(payloadLen % 3 == 0, s"malformed HLLC sparse payload: $payloadLen bytes")
      var i = 7
      while (i < bytes.length) {
        val pos = buf.getShort(i) & 0xffff
        val reg = bytes(i + 2) & 0xff
        put(pos, (reg & 0xf0) >>> 4, reg & 0x0f)
        i += 3
      }
    }
    v
  }

  /** applyCorrection (HyperLogLogCollector.java:143), verbatim semantics. */
  def estimate(values: Array[Int]): Double = {
    var sum = 0.0d
    var zeroCount = 0
    var i = 0
    while (i < NumBuckets) {
      sum += 1.0d / math.pow(2, values(i))
      if (values(i) == 0) zeroCount += 1
      i += 1
    }
    val e = CorrectionParameter / sum
    if (e <= LowCorrectionThreshold) {
      if (zeroCount == 0) e else NumBuckets * math.log(NumBuckets / zeroCount.toDouble)
    } else if (e > HighCorrectionThreshold) {
      val ratio = e / TwoToTheSixtyFour
      if (ratio >= 1) Double.PositiveInfinity
      else -TwoToTheSixtyFour * math.log(1 - ratio)
    } else e
  }

  def estimate(bytes: Array[Byte]): Double = estimate(registerValues(bytes))

  /** Elementwise-max merge — value-space fold(). */
  def mergeInto(acc: Array[Int], bytes: Array[Byte]): Unit = {
    val other = registerValues(bytes)
    var i = 0
    while (i < NumBuckets) { if (other(i) > acc(i)) acc(i) = other(i); i += 1 }
  }
}

/** Uniform read facade over quantile-sketch bytes: this engine WRITES KLL
  * (SURVEY §7.3), but a migrating Druid cluster's stored
  * quantilesDoublesSketch columns are CLASSIC DoublesSketch bytes
  * (extensions-core/datasketches .../DoublesSketchAggregatorFactory). The
  * DataSketches preamble carries the family id at byte 2 (QUANTILES = 8,
  * KLL = 15), so every quantile post-agg expression dispatches on it and
  * accepts either format as input. */
object QuantileSketchBytes {
  import org.apache.datasketches.kll.KllDoublesSketch
  import org.apache.datasketches.memory.Memory
  import org.apache.datasketches.quantiles.DoublesSketch

  private val ClassicFamilyId = 8 // Family.QUANTILES
  private val KllFamilyId = 15    // Family.KLL

  trait Q {
    def isEmpty: Boolean
    def getN: Long
    def quantile(q: Double): Double
    def rank(v: Double): Double
    def cdf(sp: Array[Double]): Array[Double]
    def pmf(sp: Array[Double]): Array[Double]
    def minItem: Double
    def maxItem: Double
  }

  def wrap(bytes: Array[Byte]): Q = (bytes(2) & 0xff) match {
    case KllFamilyId =>
      val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
      new Q {
        def isEmpty = sk.isEmpty; def getN = sk.getN
        def quantile(q: Double) = sk.getQuantile(q)
        def rank(v: Double) = sk.getRank(v)
        def cdf(sp: Array[Double]) = sk.getCDF(sp)
        def pmf(sp: Array[Double]) = sk.getPMF(sp)
        def minItem = sk.getMinItem; def maxItem = sk.getMaxItem
      }
    case ClassicFamilyId =>
      val sk = DoublesSketch.heapify(Memory.wrap(bytes))
      new Q {
        def isEmpty = sk.isEmpty; def getN = sk.getN
        def quantile(q: Double) = sk.getQuantile(q)
        def rank(v: Double) = sk.getRank(v)
        def cdf(sp: Array[Double]) = sk.getCDF(sp)
        def pmf(sp: Array[Double]) = sk.getPMF(sp)
        def minItem = sk.getMinItem; def maxItem = sk.getMaxItem
      }
    case other => throw new IllegalArgumentException(
      s"unsupported quantile sketch family id $other (KLL=15, classic DoublesSketch=8)")
  }
}

/** HLLC_ESTIMATE(druid_hllc_bytes) → double: estimate one stored
  * hyperUnique column value. */
case class HllcEstimate(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    DruidHllc.estimate(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): HllcEstimate = copy(child = c)
  override def prettyName: String = "hllc_estimate"
}

/** HLLC_UNION_ESTIMATE(druid_hllc_bytes) → double: merge a column of
  * stored hyperUnique sketches (the reference's hyperUnique aggregator over
  * an ingested hyperUnique metric) and estimate the union — what
  * APPROX_COUNT_DISTINCT does on a Druid cluster's sketch column. */
case class HllcUnionEstimate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](DruidHllc.NumBuckets)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) DruidHllc.mergeInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < DruidHllc.NumBuckets) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = DruidHllc.estimate(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(DruidHllc.NumBuckets)
    var i = 0
    // register values fit a byte (4-bit nibble + byte offset ≤ 79)
    while (i < DruidHllc.NumBuckets) { bb.put(buf(i).toByte); i += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val buf = new Array[Int](DruidHllc.NumBuckets)
    var i = 0
    while (i < DruidHllc.NumBuckets) { buf(i) = bytes(i) & 0xff; i += 1 }
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): HllcUnionEstimate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllcUnionEstimate = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllcUnionEstimate = copy(child = c)
  override def prettyName: String = "hllc_union_estimate"
}
