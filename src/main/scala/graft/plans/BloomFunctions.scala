package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.LongType

/** Bloom filter surface (SURVEY §2.4 `bloom` DimFilter + §2.6 bloom
  * aggregator — extensions-core/druid-bloom-filter).
  *
  * Wraps Spark's internal BloomFilterAggregate / BloomFilterMightContain
  * (the machinery behind runtime row-level filtering) as user-facing
  * functions: build a serialized bloom filter over a key column, then test
  * membership — including against filters built in a previous job, which is
  * the reference's use case (POST a serialized filter with the query).
  * Classic 100 TB pattern: build on the small side, semi-join the fact scan
  * with might_contain before the real join.
  */
object BloomFunctions {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    CatalystBridge.column(e)
  private def e(col: Column) = CatalystBridge.expression(col)

  /** Aggregate a LONG key column into a serialized bloom filter (binary). */
  def bloomFilterAgg(col: Column, expectedItems: Long = 100000L, numBits: Long = 1L << 22): Column =
    c(BloomFilterAggregate(e(col.cast("long")),
      Literal(expectedItems, LongType), Literal(numBits, LongType), 0, 0)
      .toAggregateExpression())

  /** Test membership of a LONG key against a serialized bloom filter. */
  def mightContain(bloom: Column, key: Column): Column =
    c(BloomFilterMightContain(e(bloom), e(key.cast("long"))))

  /** Aggregate a column into a DRUID-format BloomKFilter (binary). */
  def druidBloomAgg(col: Column, maxNumEntries: Long = 1500L,
      foldInput: Boolean = false): Column =
    c(DruidBloomAgg(e(col), maxNumEntries, foldInput = foldInput)
      .toAggregateExpression())

  /** Test a value against stored Druid BloomKFilter bytes. */
  def druidBloomTest(bloom: Column, value: Column): Column =
    c(DruidBloomTest(e(bloom), e(value)))
}

/** Read/write interop for the reference's OWN bloom binary format
  * (extensions-core/druid-bloom-filter/.../BloomKFilter.java — itself a
  * copy of Hive's block-based BloomKFilter, whose original ships on
  * Spark's classpath in hive-storage-api): 1 byte numHashFunctions, 1
  * big-endian int bitset-long-count, big-endian longs
  * (BloomKFilter.java:135-148 serialize). Using the Hive original gives
  * byte-exact parity with filters serialized by a Druid cluster
  * (BloomFilterSerializersModule.java base64-wraps these bytes in the
  * `bloom` DimFilter / aggregator JSON), the same migration-critical read
  * direction as DruidSketchInterop's HLLC/DoublesSketch readers. */
object DruidBloomBytes {
  import org.apache.hive.common.util.BloomKFilter

  def deserialize(bytes: Array[Byte]): BloomKFilter =
    BloomKFilter.deserialize(new java.io.ByteArrayInputStream(bytes))

  def serialize(f: BloomKFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    BloomKFilter.serialize(out, f)
    out.toByteArray
  }

  /** The reference's null handling (BloomKFilter.java:376 `val == null ?
    * Murmur3.NULL_HASHCODE`) is a Druid adaptation the Hive original lacks
    * (Hive 2.8.1 NPEs on null) — replicated here against the live bitset
    * (getBitSet returns the backing array), mirroring the reference's
    * addHash/testHash block math (BloomKFilter.java:398-424: first hash
    * picks the 8-long block, K combined hashes pick bit offsets). */
  private def hashBits(bits: Array[Long], k: Int, hash64: Long, set: Boolean): Boolean = {
    val hash1 = hash64.toInt
    val hash2 = (hash64 >>> 32).toInt
    var firstHash = hash1 + hash2
    if (firstHash < 0) firstHash = ~firstHash
    val blockBaseOffset = (firstHash % (bits.length / 8)) << 3
    var i = 1
    while (i <= k) {
      var combinedHash = hash1 + ((i + 1) * hash2)
      if (combinedHash < 0) combinedHash = ~combinedHash
      val absOffset = blockBaseOffset + (combinedHash & 7)
      val bitPos = (combinedHash >>> 3) & 63
      if (set) bits(absOffset) |= (1L << bitPos)
      else if ((bits(absOffset) & (1L << bitPos)) == 0) return false
      i += 1
    }
    true
  }
  private def addNull(f: BloomKFilter): Unit =
    hashBits(f.getBitSet, f.getNumHashFunctions, org.apache.hive.common.util.Murmur3.NULL_HASHCODE, set = true)
  private def testNull(f: BloomKFilter): Boolean =
    hashBits(f.getBitSet, f.getNumHashFunctions, org.apache.hive.common.util.Murmur3.NULL_HASHCODE, set = false)

  /** Typed add matching the reference's BloomFilterAggregator dispatch
    * (addString / addLong / addDouble / addFloat; null → NULL_HASHCODE). */
  def add(f: BloomKFilter, v: Any): Unit = v match {
    case null => addNull(f)
    case s: org.apache.spark.unsafe.types.UTF8String => f.addBytes(s.getBytes)
    case s: String => f.addString(s)
    case l: java.lang.Long => f.addLong(l)
    case i: java.lang.Integer => f.addLong(i.toLong)
    case d: java.lang.Double => f.addDouble(d)
    case fl: java.lang.Float => f.addFloat(fl)
    case b: Array[Byte] => f.addBytes(b)
    case other => f.addString(other.toString)
  }

  /** Typed membership test (BloomDimFilter's per-type value matcher). */
  def test(f: BloomKFilter, v: Any): Boolean = v match {
    case null => testNull(f)
    case s: org.apache.spark.unsafe.types.UTF8String => f.testBytes(s.getBytes)
    case s: String => f.testString(s)
    case l: java.lang.Long => f.testLong(l)
    case i: java.lang.Integer => f.testLong(i.toLong)
    case d: java.lang.Double => f.testDouble(d)
    case fl: java.lang.Float => f.testFloat(fl)
    case b: Array[Byte] => f.testBytes(b)
    case other => f.testString(other.toString)
  }
}

/** DRUID_BLOOM_TEST(bloomBytes, value) → boolean: the reference's `bloom`
  * DimFilter over stored Druid-format filter bytes (BloomDimFilter.java;
  * SQL BLOOM_FILTER_TEST — BloomFilterOperatorConversion). The filter side
  * is usually a literal (the query POSTs base64 bytes), so the
  * deserialized filter is cached per last-seen byte array. */
case class DruidBloomTest(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.BooleanType
  override def dataType: org.apache.spark.sql.types.DataType = BooleanType
  override def nullable: Boolean = left.nullable

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFilter: org.apache.hive.common.util.BloomKFilter = _
  @transient private var cachedSpark: org.apache.spark.util.sketch.BloomFilter = _

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = left.eval(input)
    if (b == null) return null
    val bytes = b.asInstanceOf[Array[Byte]]
    // identity check first (the dominant literal-filter case re-sees the
    // same array every row); content equality as the fallback so a bloom
    // BYTES COLUMN (one filter per row, e.g. joined from a filter table)
    // still caches across equal-valued rows instead of re-deserializing
    if ((cachedFilter == null && cachedSpark == null) ||
        ((cachedBytes ne bytes) && !java.util.Arrays.equals(cachedBytes, bytes))) {
      cachedBytes = bytes
      // byte-layout dispatch (same rule as the JSON `bloom` filter): the
      // reference's BloomKFilter leads with numHashFunctions ≥ 1, Spark's
      // sketch with a big-endian version int whose first byte is 0 — so a
      // Spark-built filter COLUMN keeps testing through Spark's sketch
      if (bytes.nonEmpty && bytes(0) != 0) {
        cachedFilter = DruidBloomBytes.deserialize(bytes); cachedSpark = null
      } else {
        cachedSpark = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bytes))
        cachedFilter = null
      }
    }
    // a null VALUE still tests (Druid's filter matches nulls that were
    // added to the filter: NULL_HASHCODE membership)
    if (cachedFilter != null) DruidBloomBytes.test(cachedFilter, right.eval(input))
    else right.eval(input) match {
      case null => false
      case s: org.apache.spark.unsafe.types.UTF8String =>
        cachedSpark.mightContainBinary(s.getBytes)
      case l: java.lang.Long => cachedSpark.mightContainLong(l)
      case i: java.lang.Integer => cachedSpark.mightContainLong(i.toLong)
      case other => cachedSpark.mightContain(other)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DruidBloomTest =
    copy(left = l, right = r)
  override def prettyName: String = "druid_bloom_test"
}

/** The bloom expression-macro family (extensions-core/druid-bloom-filter
  * BloomFilterExpressions.java): per-row filter manipulation inside
  * expression virtual columns and expression-lambda aggregators —
  * `bloom_filter(maxEntries)` creates empty reference-format bytes,
  * `bloom_filter_add(value, filter)` adds typed values (a null VALUE adds
  * the NULL_HASHCODE like AddExprMacro; a null FILTER is null; a BINARY
  * value merges another filter), `bloom_filter_test` is [[DruidBloomTest]].
  * Mirrors the hyper_unique() macro family's lifecycle. */
case class BloomCreateExpr(maxEntries: Int)
  extends org.apache.spark.sql.catalyst.expressions.LeafExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = false // each call site is a fresh filter
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    DruidBloomBytes.serialize(new org.apache.hive.common.util.BloomKFilter(maxEntries.toLong))
  override def prettyName: String = "bloom_filter"
}

case class BloomAddExpr(value: Expression, filter: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def left: Expression = value
  override def right: Expression = filter
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BinaryType
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val fb = filter.eval(input)
    if (fb == null) return null
    val f = DruidBloomBytes.deserialize(fb.asInstanceOf[Array[Byte]])
    value.eval(input) match {
      case b: Array[Byte] => // merge another filter (AddExprMacro's bloom case)
        f.merge(DruidBloomBytes.deserialize(b))
      case v => DruidBloomBytes.add(f, v) // typed add; null adds NULL_HASHCODE
    }
    DruidBloomBytes.serialize(f)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomAddExpr =
    copy(value = l, filter = r)
  override def prettyName: String = "bloom_filter_add"
}

/** DRUID_BLOOM_FILTER(col, maxNumEntries) → binary: the reference's bloom
  * AGGREGATOR (BloomFilterAggregatorFactory.java) producing Druid-format
  * BloomKFilter bytes — partial filters merge by bitwise OR of block-aligned
  * bitsets (BloomKFilter.mergeBloomFilterBytes), here via the Hive
  * original's merge(). */
case class DruidBloomAgg(
    child: Expression,
    maxNumEntries: Long,
    // foldInput: the input column holds SERIALIZED BloomKFilter bytes (an
    // inner query's unfinalized bloom aggregate) — MERGE them instead of
    // hashing the bytes as a value (the reference's
    // BloomFilterMergeAggregator, selected when the field's column type is
    // the bloom COMPLEX type)
    foldInput: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[
    org.apache.hive.common.util.BloomKFilter]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  import org.apache.hive.common.util.BloomKFilter

  override def createAggregationBuffer(): BloomKFilter = new BloomKFilter(maxNumEntries)

  override def update(buf: BloomKFilter, input: org.apache.spark.sql.catalyst.InternalRow): BloomKFilter = {
    child.eval(input) match {
      case b: Array[Byte] if foldInput =>
        buf.merge(DruidBloomBytes.deserialize(b))
      case null if foldInput => () // no partial filter from that row
      case v => DruidBloomBytes.add(buf, v)
    }
    buf
  }
  override def merge(buf: BloomKFilter, other: BloomKFilter): BloomKFilter = {
    buf.merge(other); buf
  }
  override def eval(buf: BloomKFilter): Any = DruidBloomBytes.serialize(buf)
  override def serialize(buf: BloomKFilter): Array[Byte] = DruidBloomBytes.serialize(buf)
  override def deserialize(bytes: Array[Byte]): BloomKFilter = DruidBloomBytes.deserialize(bytes)

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): DruidBloomAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DruidBloomAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DruidBloomAgg = copy(child = c)
  override def prettyName: String = "druid_bloom_filter"
}
