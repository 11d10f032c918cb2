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
  /** V1 header: version, registerOffset, numNonZero (short), overflow value,
    * overflow register (short) — VersionOneHyperLogLogCollector.java:33-41. */
  val HeaderNumBytes = 7
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
      // sparse: (short position, byte register) triples; missing = zero.
      // Positions are BYTE positions including the 7-byte header — the
      // writer emits `i + startPosition - initPosition` (toByteArray) and
      // fold reads them back as `getShort() - getNumHeaderBytes()`
      // (HyperLogLogCollector.java:494, fold's sparse branch) — so the
      // bucket-pair index is the stored short minus the header size
      require(payloadLen % 3 == 0, s"malformed HLLC sparse payload: $payloadLen bytes")
      var i = 7
      while (i < bytes.length) {
        val pos = (buf.getShort(i) & 0xffff) - HeaderNumBytes
        require(pos >= 0 && pos < NumBuckets / 2,
          s"malformed HLLC sparse position: ${pos + HeaderNumBytes}")
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

  /** add(byte[] hashedValue) straight into a value-space register array —
    * bucket from the trailing short masked to 11 bits, positionOf1 from the
    * leading 8 bytes' first set bit (HyperLogLogCollector.add:303-331). */
  def addHashed(regs: Array[Int], hashed: Array[Byte]): Unit = {
    val bucket = (((hashed(hashed.length - 2) & 0xff) << 8) |
      (hashed(hashed.length - 1) & 0xff)) & 0x7ff
    var positionOf1 = 0
    var i = 0
    var found = false
    while (i < 8 && !found) {
      val b = hashed(i) & 0xff
      if (b == 0) positionOf1 += 8
      else { positionOf1 += Integer.numberOfLeadingZeros(b) - 24 + 1; found = true }
      i += 1
    }
    if (positionOf1 > regs(bucket)) regs(bucket) = positionOf1
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
    /** inclusive=false is the reference's rule: its datasketches 3.1.0
      * getQuantile returns the smallest item whose natural rank is
      * STRICTLY greater than the fraction (the modern library's EXCLUSIVE
      * criterion); inclusive=true is the modern default (percentile_disc).
      * The same 3.1.0-vs-4.0+ flip applies to the search direction of
      * rank/CDF/PMF: 3.1.0's getRank/getCDF/getPMF count items STRICTLY
      * LESS THAN the value/splitPoint (datasketches-java 4.0.0 release
      * notes: "the default criterion changed from EXCLUSIVE to
      * INCLUSIVE"), so reference-parity callers pass inclusive=false. */
    def quantile(q: Double, inclusive: Boolean = true): Double
    def rank(v: Double, inclusive: Boolean = true): Double
    def cdf(sp: Array[Double], inclusive: Boolean = true): Array[Double]
    def pmf(sp: Array[Double], inclusive: Boolean = true): Array[Double]
    def minItem: Double
    def maxItem: Double
  }

  def criterion(inclusive: Boolean)
      : org.apache.datasketches.quantilescommon.QuantileSearchCriteria =
    if (inclusive) org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE
    else org.apache.datasketches.quantilescommon.QuantileSearchCriteria.EXCLUSIVE

  def wrap(bytes: Array[Byte]): Q = (bytes(2) & 0xff) match {
    case KllFamilyId =>
      val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
      new Q {
        def isEmpty = sk.isEmpty; def getN = sk.getN
        def quantile(q: Double, inclusive: Boolean) =
          sk.getQuantile(q, criterion(inclusive))
        def rank(v: Double, inclusive: Boolean) = sk.getRank(v, criterion(inclusive))
        def cdf(sp: Array[Double], inclusive: Boolean) = sk.getCDF(sp, criterion(inclusive))
        def pmf(sp: Array[Double], inclusive: Boolean) = sk.getPMF(sp, criterion(inclusive))
        def minItem = sk.getMinItem; def maxItem = sk.getMaxItem
      }
    case ClassicFamilyId =>
      val sk = DoublesSketch.heapify(Memory.wrap(bytes))
      new Q {
        def isEmpty = sk.isEmpty; def getN = sk.getN
        def quantile(q: Double, inclusive: Boolean) =
          sk.getQuantile(q, criterion(inclusive))
        def rank(v: Double, inclusive: Boolean) = sk.getRank(v, criterion(inclusive))
        def cdf(sp: Array[Double], inclusive: Boolean) = sk.getCDF(sp, criterion(inclusive))
        def pmf(sp: Array[Double], inclusive: Boolean) = sk.getPMF(sp, criterion(inclusive))
        def minItem = sk.getMinItem; def maxItem = sk.getMaxItem
      }
    case other => throw new IllegalArgumentException(
      s"unsupported quantile sketch family id $other (KLL=15, classic DoublesSketch=8)")
  }
}

/** WRITE-side HyperLogLogCollector interop: build reference-format V1
  * collector bytes from raw values, so a Druid cluster can read THIS
  * engine's hyperUnique output (the inverse of DruidHllc's read path).
  *
  * Faithful to the reference's state machine
  * (hll/.../HyperLogLogCollector.java):
  *  - values hash with Guava murmur3_128 — the exact library call the
  *    reference makes (HyperLogLogHash.java:39 Hashing.murmur3_128(),
  *    strings as UTF-8)
  *  - bucket = big-endian short at hash bytes 14-15 masked to 11 bits;
  *    positionOf1 = leading-zero count over hash bytes 0-7, plus one
  *    (add(byte[]):303-331 with ByteBitLookup)
  *  - registers hold positionOf1 max'd per bucket; values beyond the
  *    4-bit range above registerOffset go to the single max-overflow slot,
  *    and the offset bumps when all 2048 registers are nonzero
  *    (add(short,byte):333-364)
  *  - serialization emits the V1 layout: 7-byte header + dense 1024-byte
  *    payload, or sparse (position+7, byte) triples when fewer than 128
  *    registers are set (toByteArray:476-498, DENSE_THRESHOLD)
  */
object DruidHllcBuild {
  import DruidHllc.{HeaderNumBytes, NumBuckets}
  private val DenseThreshold = 128 // HyperLogLogCollector.DENSE_THRESHOLD
  private val Range = 15           // 4-bit nibble range

  /** Value-space collector state: regs hold effective register values
    * (offset + nibble); the offset/overflow fields evolve exactly like the
    * reference's header fields. */
  final class State {
    val regs = new Array[Int](NumBuckets)
    var offset = 0
    var numNonZero = 0 // count of regs(b) > offset
    var overflowValue = 0
    var overflowBucket = 0
  }

  private val hashFn = com.google.common.hash.Hashing.murmur3_128()

  /** HyperLogLogHash.hash: murmur3_128 over the value's UTF-8 bytes
    * (binary input hashes raw). */
  def hashValue(v: Any): Array[Byte] = v match {
    case b: Array[Byte] => hashFn.hashBytes(b).asBytes()
    case other => hashFn.hashBytes(
      other.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)).asBytes()
  }

  /** The CARDINALITY aggregator's string hashing — murmur3_128 over the
    * UTF-16 chars (CardinalityAggregator.HASH_FUNCTION.hashUnencodedChars,
    * StringCardinalityAggregatorColumnSelectorStrategy.java:44), which is a
    * DIFFERENT register placement than HyperLogLogHash's UTF-8 bytes; the
    * reference's published cardinality constants depend on it. */
  def hashChars(s: String): Array[Byte] = hashFn.hashUnencodedChars(s).asBytes()

  /** The CARDINALITY aggregator's typed numeric hashing — the reference
    * picks a per-type strategy: DOUBLE columns hash
    * murmur3_128.hashLong(doubleToLongBits)
    * (DoubleCardinalityAggregatorColumnSelectorStrategy.java), LONG columns
    * hashLong(v) (Long...Strategy), FLOAT columns hashInt(floatToIntBits)
    * (Float...Strategy). Byte-exact register placement reproduces even the
    * reference's own register collisions (e.g. the 9-value/8-register
    * 8.015665809687173 in testGroupByCardinalityAggOnFloat). */
  def hashLong(v: Long): Array[Byte] = hashFn.hashLong(v).asBytes()
  def hashInt(v: Int): Array[Byte] = hashFn.hashInt(v).asBytes()

  /** add(byte[] hashedValue): bucket from the trailing short, positionOf1
    * from the leading 8 bytes' first set bit. */
  def addHashed(st: State, hashed: Array[Byte]): Unit = {
    val bucket = (((hashed(hashed.length - 2) & 0xff) << 8) |
      (hashed(hashed.length - 1) & 0xff)) & 0x7ff
    var positionOf1 = 0
    var i = 0
    var found = false
    while (i < 8 && !found) {
      val b = hashed(i) & 0xff
      if (b == 0) positionOf1 += 8
      else { positionOf1 += Integer.numberOfLeadingZeros(b) - 24 + 1; found = true }
      i += 1
    }
    add(st, bucket, positionOf1)
  }

  /** add(short bucket, byte positionOf1) — the reference's exact
    * discard/overflow/offset-bump ladder in value space. */
  def add(st: State, bucket: Int, positionOf1: Int): Unit = {
    if (positionOf1 <= st.offset) return
    if (positionOf1 > st.offset + Range) {
      if (positionOf1 > st.overflowValue) {
        val currMax = st.overflowValue
        val currBucket = st.overflowBucket
        st.overflowValue = positionOf1
        st.overflowBucket = bucket
        // the displaced overflow folds back into the registers when it now
        // fits the range (reference: add(getMaxOverflowRegister(), currMax))
        if (currMax > st.offset && currMax <= st.offset + Range)
          add(st, currBucket, currMax)
      }
      return
    }
    if (positionOf1 > st.regs(bucket)) {
      val wasZero = st.regs(bucket) <= st.offset
      st.regs(bucket) = positionOf1
      if (wasZero) {
        st.numNonZero += 1
        if (st.numNonZero == NumBuckets) {
          // all registers set: raise the shared offset; registers sitting at
          // exactly the new offset become "zero" nibbles (their effective
          // value is unchanged — nibble 0 at offset o reads as o)
          st.offset += 1
          var b = 0
          var n = 0
          while (b < NumBuckets) { if (st.regs(b) > st.offset) n += 1; b += 1 }
          st.numNonZero = n
        }
      }
    }
  }

  /** Merge = the reference fold's value-space effect: elementwise max of
    * effective register values, overflow folded through the same ladder. */
  def merge(a: State, b: State): Unit = {
    var i = 0
    while (i < NumBuckets) {
      if (b.regs(i) > 0) add(a, i, b.regs(i))
      i += 1
    }
    if (b.overflowValue > 0) add(a, b.overflowBucket, b.overflowValue)
  }

  /** Fold a bucket array of EFFECTIVE register values through the add
    * ladder into collector state — the value-space equivalent of folding a
    * stored collector into an empty one (reference fold()). Used to emit a
    * merged collector's bytes from union register state. */
  def fromRegisters(regs: Array[Int]): State = {
    val st = new State
    var i = 0
    while (i < regs.length) { if (regs(i) > 0) add(st, i, regs(i)); i += 1 }
    st
  }

  /** Emit reference V1 bytes (toByteArray): sparse below DENSE_THRESHOLD
    * nonzero registers, dense otherwise. */
  def toBytes(st: State): Array[Byte] = {
    val nibbles = new Array[Byte](NumBuckets / 2)
    var nonZero = 0
    var b = 0
    while (b < NumBuckets) {
      val nib = if (st.regs(b) > st.offset) st.regs(b) - st.offset else 0
      if (nib > 0) nonZero += 1
      val idx = b >> 1
      if ((b & 1) == 0) nibbles(idx) = (nibbles(idx) | (nib << 4)).toByte
      else nibbles(idx) = (nibbles(idx) | nib).toByte
      b += 1
    }
    def header(buf: ByteBuffer): Unit = {
      buf.put(0, 1.toByte)
      buf.put(1, st.offset.toByte)
      buf.putShort(2, nonZero.toShort)
      buf.put(4, st.overflowValue.toByte)
      buf.putShort(5, st.overflowBucket.toShort)
    }
    if (nonZero < DenseThreshold) {
      val pairs = nibbles.indices.count(nibbles(_) != 0)
      val buf = ByteBuffer.allocate(HeaderNumBytes + pairs * 3)
      header(buf)
      buf.position(HeaderNumBytes)
      var i = 0
      while (i < nibbles.length) {
        if (nibbles(i) != 0) {
          // positions include the header size, as the reference writes them
          buf.putShort((i + HeaderNumBytes).toShort)
          buf.put(nibbles(i))
        }
        i += 1
      }
      buf.array()
    } else {
      val buf = ByteBuffer.allocate(HeaderNumBytes + NumBuckets / 2)
      header(buf)
      System.arraycopy(nibbles, 0, buf.array(), HeaderNumBytes, nibbles.length)
      buf.array()
    }
  }

  /** Internal partial-state codec for the aggregation buffer shuffle. */
  def serializeState(st: State): Array[Byte] = {
    val buf = ByteBuffer.allocate(12 + NumBuckets)
    buf.putInt(st.offset).putInt(st.overflowValue).putInt(st.overflowBucket)
    var i = 0
    while (i < NumBuckets) { buf.put(st.regs(i).toByte); i += 1 }
    buf.array()
  }
  def deserializeState(bytes: Array[Byte]): State = {
    val buf = ByteBuffer.wrap(bytes)
    val st = new State
    st.offset = buf.getInt
    st.overflowValue = buf.getInt
    st.overflowBucket = buf.getInt
    var i = 0
    var n = 0
    while (i < NumBuckets) {
      st.regs(i) = bytes(12 + i) & 0xff
      if (st.regs(i) > st.offset) n += 1
      i += 1
    }
    st.numNonZero = n
    st
  }
}

/** HLLC_BUILD(col) → binary: aggregate raw values into a reference-format
  * HyperLogLogCollector (V1 bytes a Druid cluster reads as a stored
  * hyperUnique column). The write-side inverse of HllcUnionEstimate. */
case class HllcBuild(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DruidHllcBuild.State] with UnaryLike[Expression] {

  override def createAggregationBuffer(): DruidHllcBuild.State = new DruidHllcBuild.State

  override def update(st: DruidHllcBuild.State, input: InternalRow): DruidHllcBuild.State = {
    val v = child.eval(input)
    if (v != null) DruidHllcBuild.addHashed(st, DruidHllcBuild.hashValue(v match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => other
    }))
    st
  }

  override def merge(a: DruidHllcBuild.State, b: DruidHllcBuild.State): DruidHllcBuild.State = {
    DruidHllcBuild.merge(a, b)
    a
  }

  override def eval(st: DruidHllcBuild.State): Any = DruidHllcBuild.toBytes(st)

  override def serialize(st: DruidHllcBuild.State): Array[Byte] =
    DruidHllcBuild.serializeState(st)
  override def deserialize(bytes: Array[Byte]): DruidHllcBuild.State =
    DruidHllcBuild.deserializeState(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): HllcBuild = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllcBuild = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllcBuild = copy(child = c)
  override def prettyName: String = "hllc_build"
}

/** Per-row SINGLE-VALUE HyperLogLogCollector bytes (V1) — the ingest-time
  * complex-column representation of a hyperUnique metric when rollup does
  * not merge rows (HyperUniquesSerde's extractor builds a one-value
  * collector per input row; TestIndex's quality_uniques column is exactly
  * this). Query-time hyperUnique aggregation unions these. */
case class HllcOf(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any = {
    val st = new DruidHllcBuild.State
    DruidHllcBuild.addHashed(st, DruidHllcBuild.hashValue(v match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => other
    }))
    DruidHllcBuild.toBytes(st)
  }
  override protected def withNewChildInternal(c: Expression): HllcOf = copy(child = c)
  override def prettyName: String = "hllc_of"
}

/** CARDINALITY(fields...) → double: the cardinality aggregator's HLLC
  * estimate (CardinalityAggregator.java byValue: every non-null field value
  * of every row is added to ONE collector per group — SQL-compatible null
  * handling skips nulls, StringCardinalityAggregatorColumnSelectorStrategy
  * .java:37-46; values hash with the reference's murmur3_128 over UTF-16
  * chars, reproducing the published estimate constants exactly). A
  * multi-value (array) field adds each element. One register array per
  * GROUP, updated in place — no per-row allocation on the 100 TB path. */
case class HllcCardinality(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](DruidHllc.NumBuckets)

  private def add(buf: Array[Int], v: Any, dt: DataType): Unit = v match {
    case null => ()
    case a: org.apache.spark.sql.catalyst.util.ArrayData =>
      // multi-value dimension: each ELEMENT is added separately (the
      // reference's hashValues loops the row's IndexedInts) — element
      // access typed from the child's declared element type
      val et = dt match {
        case org.apache.spark.sql.types.ArrayType(t, _) => t
        case _ => org.apache.spark.sql.types.StringType
      }
      var i = 0
      while (i < a.numElements()) {
        if (!a.isNullAt(i)) add(buf, a.get(i, et), et)
        i += 1
      }
    case s: org.apache.spark.unsafe.types.UTF8String =>
      DruidHllc.addHashed(buf, DruidHllcBuild.hashChars(s.toString))
    // typed numeric columns hash by VALUE BITS like the reference's
    // per-type selector strategies (see DruidHllcBuild.hashLong/hashInt)
    case d: java.lang.Double =>
      DruidHllc.addHashed(buf,
        DruidHllcBuild.hashLong(java.lang.Double.doubleToLongBits(d)))
    case f: java.lang.Float =>
      DruidHllc.addHashed(buf,
        DruidHllcBuild.hashInt(java.lang.Float.floatToIntBits(f)))
    case l: java.lang.Long =>
      DruidHllc.addHashed(buf, DruidHllcBuild.hashLong(l))
    case i: java.lang.Integer =>
      DruidHllc.addHashed(buf, DruidHllcBuild.hashLong(i.longValue()))
    case other =>
      DruidHllc.addHashed(buf, DruidHllcBuild.hashChars(other.toString))
  }

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    var i = 0
    while (i < children.length) {
      add(buf, children(i).eval(input), children(i).dataType); i += 1
    }
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
  override def withNewMutableAggBufferOffset(o: Int): HllcCardinality = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllcCardinality = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): HllcCardinality = copy(children = cs)
  override def prettyName: String = "hllc_cardinality"
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

/** HLLC_UNION(druid_hllc_bytes) → binary: union a column of stored
  * hyperUnique collectors and emit the MERGED collector's V1 bytes — the
  * hyperUnique aggregator's shouldFinalize=false shape, consumed by a
  * re-aggregating outer query or a rollup sink
  * (HyperUniquesAggregatorFactory.getCombiningFactory with
  * finalizeComputation bypassed; GroupByQueryRunnerTest
  * .testSubqueryWithHyperUniques exercises exactly this hop). */
case class HllcUnionBytes(
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

  override def eval(buf: Array[Int]): Any =
    DruidHllcBuild.toBytes(DruidHllcBuild.fromRegisters(buf))

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(DruidHllc.NumBuckets)
    var i = 0
    while (i < DruidHllc.NumBuckets) { bb.put(buf(i).toByte); i += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val buf = new Array[Int](DruidHllc.NumBuckets)
    var i = 0
    while (i < DruidHllc.NumBuckets) { buf(i) = bytes(i) & 0xff; i += 1 }
    buf
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): HllcUnionBytes = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllcUnionBytes = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllcUnionBytes = copy(child = c)
  override def prettyName: String = "hllc_union"
}
