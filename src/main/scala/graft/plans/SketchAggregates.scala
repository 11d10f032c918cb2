package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.datasketches.tuple.arrayofdoubles.{ArrayOfDoublesCompactSketch, ArrayOfDoublesSetOperationBuilder, ArrayOfDoublesSketches, ArrayOfDoublesUnion, ArrayOfDoublesUpdatableSketch, ArrayOfDoublesUpdatableSketchBuilder}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch-typed aggregates (SURVEY §2.6 extensions — the reference's
  * datasketches module: theta sketches with set-op post-aggregators and
  * quantile sketches with quantile/rank/CDF post-ops).
  *
  * Built as Catalyst `TypedImperativeAggregate`s over the DataSketches-java
  * library that ships with Spark — same partial→final lifecycle as the
  * reference's AggregatorFactory (per-segment build → broker merge):
  * executors build per-partition sketches, the shuffle carries the compact
  * serialized form (bytes, not raw values), and the final merge unions them.
  * That is exactly the property that makes distinct-count/quantiles feasible
  * at 100 TB: sketch size is bounded (≈2^lgK entries) regardless of input.
  *
  * The serialized binary is the column value, so sketches can be stored in
  * rollup tables and re-merged later (Druid's COMPLEX metric columns).
  */

/** thetaSketch build+merge aggregate → serialized CompactSketch bytes.
  * (reference: extensions-core/datasketches/.../theta/SketchModule.java) */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        buf.update(v.asInstanceOf[Number].longValue())
      case DoubleType | FloatType => buf.update(v.asInstanceOf[Number].doubleValue())
      case StringType => buf.update(v.asInstanceOf[UTF8String].toString)
      case BinaryType => buf.update(v.asInstanceOf[Array[Byte]])
      // a MULTI-VALUE dimension updates once per element — the reference's
      // CardinalityAggregator/theta build iterate the row's values
      // (SURVEY §1.4; cardinality/CardinalityAggregator.java)
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) buf.update(arr.getUTF8String(i).toString)
          i += 1
        }
      case dt => throw new IllegalArgumentException(s"theta_sketch: unsupported type $dt")
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg = copy(child = c)
  override def prettyName: String = "theta_sketch"
}

/** THETA_SKETCH_ESTIMATE(sketch_bytes) → double. */
case class ThetaEstimate(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate = copy(child = c)
  override def prettyName: String = "theta_sketch_estimate"
}

/** Theta set operations over two serialized sketches → serialized sketch.
  * op: "union" | "intersect" | "not" (A and not B).
  * (reference: theta sketch set-op post-aggregators) */
case class ThetaSetOp(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = Sketches.wrapSketch(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = Sketches.wrapSketch(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    val out: CompactSketch = op match {
      case "union" =>
        val u = SetOperation.builder().buildUnion(); u.union(sa); u.union(sb); u.getResult
      case "intersect" =>
        val i = SetOperation.builder().buildIntersection(); i.intersect(sa); i.intersect(sb); i.getResult
      case "not" =>
        SetOperation.builder().buildANotB().aNotB(sa, sb)
      case o => throw new IllegalArgumentException(s"theta set op: $o")
    }
    out.toByteArray
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaSetOp =
    copy(left = l, right = r)
  override def prettyName: String = s"theta_sketch_$op"
}

/** Union of SERIALIZED theta sketches across rows — the combining side of
  * the reference's SketchMergeAggregatorFactory (isInputThetaSketch=true:
  * re-aggregating a rollup segment's COMPLEX theta column,
  * SketchAggregatorFactory.getCombiningFactory). Distinct from
  * [[ThetaSketchAgg]], whose BinaryType update hashes the bytes as an ITEM. */
/** APPROX_COUNT_DISTINCT_DS_THETA — build (or, for binary input, merge) and
  * finalize to the ROUNDED LONG estimate in one aggregate
  * (ThetaSketchApproxCountDistinctSqlAggregator). A bare AggregateFunction
  * so SQL FILTER (WHERE ...) clauses attach; an empty sketch finalizes to 0
  * like the reference (ThetaSketchSqlAggregatorTest.testEmptyTimeseries
  * Results). Update semantics are ThetaSketchAgg's, including the
  * library's skip-empty-string contract. */
case class ThetaAcdAgg(
    child: Expression,
    lgK: Int = 12,
    mergeInput: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  private val build = ThetaSketchAgg(child, lgK)

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
  override def update(buf: Union, input: InternalRow): Union = {
    if (mergeInput) {
      val v = child.eval(input)
      if (v != null)
        buf.union(Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    } else build.update(buf, input)
  }
  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }
  override def eval(buf: Union): Any = math.round(buf.getResult.getEstimate)
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): ThetaAcdAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaAcdAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaAcdAgg = copy(child = c)
  override def prettyName: String = "approx_count_distinct_ds_theta"
}

case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }
  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg = copy(child = c)
  override def prettyName: String = "theta_sketch_union_agg"
}

/** Merge of SERIALIZED KLL doubles sketches across rows — the combining
  * side of the reference's quantiles merge factory
  * (DoublesSketchMergeAggregatorFactory). */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }
  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg = copy(child = c)
  override def prettyName: String = "kll_doubles_merge_agg"
}

/** Union of SERIALIZED ArrayOfDoubles tuple sketches across rows — the
  * combining side of ArrayOfDoublesSketchMergeAggregatorFactory. */
case class TupleUnionAgg(
    child: Expression,
    numValues: Int = 1,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleSketchBuf] with UnaryLike[Expression] {

  override def createAggregationBuffer(): TupleSketchBuf =
    new TupleSketchBuf(numValues, 1 << lgK)

  override def update(buf: TupleSketchBuf, input: InternalRow): TupleSketchBuf = {
    val v = child.eval(input)
    if (v != null)
      buf.mergeIn(ArrayOfDoublesSketches.wrapSketch(
        Memory.wrap(v.asInstanceOf[Array[Byte]])).compact())
    buf
  }
  override def merge(buf: TupleSketchBuf, other: TupleSketchBuf): TupleSketchBuf = {
    buf.mergeIn(other); buf
  }
  override def eval(buf: TupleSketchBuf): Any = buf.result().toByteArray
  override def serialize(buf: TupleSketchBuf): Array[Byte] = buf.result().toByteArray
  override def deserialize(bytes: Array[Byte]): TupleSketchBuf = {
    val b = createAggregationBuffer()
    b.mergeIn(ArrayOfDoublesSketches.wrapSketch(Memory.wrap(bytes)).compact())
    b
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): TupleUnionAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TupleUnionAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TupleUnionAgg = copy(child = c)
  override def prettyName: String = "ds_tuple_union_agg"
}

/** Mutable buffer for the tuple sketch aggregate: rows accumulate into an
  * updatable sketch; merges fold compacted sketches into a union. flush()
  * is idempotent, so result()/serialize() can be called safely at any
  * point of the partial→final lifecycle. */
final class TupleSketchBuf(numValues: Int, nominal: Int) {
  private var sketch: ArrayOfDoublesUpdatableSketch = null
  private var union: ArrayOfDoublesUnion = null

  private def ensureUnion(): Unit =
    if (union == null)
      union = new ArrayOfDoublesSetOperationBuilder()
        .setNumberOfValues(numValues).setNominalEntries(nominal).buildUnion()

  def update(key: Any, values: Array[Double]): Unit = {
    if (sketch == null)
      sketch = new ArrayOfDoublesUpdatableSketchBuilder()
        .setNumberOfValues(numValues).setNominalEntries(nominal).build()
    key match {
      case l: Long => sketch.update(l, values)
      case s: String => sketch.update(s, values)
      case n: Number => sketch.update(n.longValue(), values)
      case b: Array[Byte] => sketch.update(b, values)
      case k => throw new IllegalArgumentException(s"tuple sketch key: ${k.getClass}")
    }
  }

  private def flush(): Unit = if (sketch != null) {
    ensureUnion(); union.union(sketch.compact()); sketch = null
  }

  def mergeIn(other: TupleSketchBuf): Unit = {
    flush(); other.flush()
    if (other.union != null) { ensureUnion(); union.union(other.union.getResult) }
  }

  def mergeIn(serialized: ArrayOfDoublesCompactSketch): Unit = {
    flush(); ensureUnion(); union.union(serialized)
  }

  def result(): ArrayOfDoublesCompactSketch = {
    flush()
    if (union != null) union.getResult
    else new ArrayOfDoublesUpdatableSketchBuilder()
      .setNumberOfValues(numValues).setNominalEntries(nominal).build().compact()
  }
}

/** ArrayOfDoubles tuple sketch (reference: extensions-core/datasketches/
  * tuple/ArrayOfDoublesSketchModule — distinct-key sketch carrying N double
  * metrics per retained key, summed on duplicate keys). Exact while
  * retained keys ≤ nominal 2^lgK; the serialized bytes are the column
  * value, re-mergeable from rollup tables like every other sketch here. */
case class TupleSketchAgg(
    key: Expression,
    values: Seq[Expression],
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleSketchBuf] {

  override def children: Seq[Expression] = key +: values

  override def createAggregationBuffer(): TupleSketchBuf =
    new TupleSketchBuf(values.size, 1 << lgK)

  override def update(buf: TupleSketchBuf, input: InternalRow): TupleSketchBuf = {
    val k = key.eval(input)
    if (k != null) {
      val vs = values.map { v =>
        val x = v.eval(input)
        if (x == null) 0.0 else x.asInstanceOf[Number].doubleValue()
      }.toArray
      val keyVal = key.dataType match {
        case StringType => k.asInstanceOf[UTF8String].toString
        case _ => k
      }
      buf.update(keyVal, vs)
    }
    buf
  }

  override def merge(buf: TupleSketchBuf, other: TupleSketchBuf): TupleSketchBuf = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TupleSketchBuf): Any = buf.result().toByteArray

  override def serialize(buf: TupleSketchBuf): Array[Byte] = buf.result().toByteArray
  override def deserialize(bytes: Array[Byte]): TupleSketchBuf = {
    val b = createAggregationBuffer()
    b.mergeIn(ArrayOfDoublesSketches.wrapSketch(Memory.wrap(bytes)).compact())
    b
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): TupleSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TupleSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TupleSketchAgg =
    copy(key = cs.head, values = cs.tail)
  override def prettyName: String = "ds_tuple_sketch"
}

/** DS_TUPLE_DOUBLES_SKETCH estimate: distinct keys. */
case class TupleEstimate(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    ArrayOfDoublesSketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(c: Expression): TupleEstimate = copy(child = c)
  override def prettyName: String = "ds_tuple_estimate"
}

/** DS_TUPLE_DOUBLES_METRICS_SUM_ESTIMATE: per-metric sums over retained
  * keys, scaled by 1/theta (exact when the sketch never sampled). */
case class TupleMetricsSum(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val sk = ArrayOfDoublesSketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    val sums = new Array[Double](sk.getNumValues)
    val it = sk.iterator()
    while (it.next()) {
      val vals = it.getValues
      var i = 0
      while (i < vals.length) { sums(i) += vals(i); i += 1 }
    }
    val theta = sk.getTheta
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sums.map(_ / theta))
  }
  override protected def withNewChildInternal(c: Expression): TupleMetricsSum = copy(child = c)
  override def prettyName: String = "ds_tuple_metrics_sum"
}

/** arrayOfDoublesSketchToNumEntries (ArrayOfDoublesSketchToNumEntriesPostAggregator):
  * retained entries — NOT the estimate. */
case class TupleNumEntries(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    ArrayOfDoublesSketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      .getRetainedEntries.toLong
  override protected def withNewChildInternal(c: Expression): TupleNumEntries = copy(child = c)
  override def prettyName: String = "ds_tuple_num_entries"
}

/** arrayOfDoublesSketchToMeans / ToVariances: per-metric mean / SAMPLE
  * variance over retained entries (the reference streams them through
  * commons-math SummaryStatistics — Welford here, same n-1 denominator). */
case class TupleColumnStats(child: Expression, stat: String)
  extends UnaryExpression with CodegenFallback {
  require(stat == "mean" || stat == "variance", s"stat must be mean|variance, got $stat")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val sk = ArrayOfDoublesSketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    val m = sk.getNumValues
    val n = new Array[Long](m); val mean = new Array[Double](m); val m2 = new Array[Double](m)
    val it = sk.iterator()
    while (it.next()) {
      val vals = it.getValues
      var i = 0
      while (i < m) {
        n(i) += 1
        val d = vals(i) - mean(i)
        mean(i) += d / n(i)
        m2(i) += d * (vals(i) - mean(i))
        i += 1
      }
    }
    val out = (0 until m).map { i =>
      if (stat == "mean") (if (n(i) == 0) Double.NaN else mean(i))
      else if (n(i) < 2) (if (n(i) == 1) 0.0 else Double.NaN)
      else m2(i) / (n(i) - 1)
    }.toArray
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): TupleColumnStats = copy(child = c)
  override def prettyName: String = s"ds_tuple_$stat"
}

/** arrayOfDoublesSketchToEstimateAndBounds: [estimate, lowerBound(numStdDevs),
  * upperBound(numStdDevs)]. */
case class TupleEstimateAndBounds(child: Expression, numStdDevs: Int)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val sk = ArrayOfDoublesSketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(sk.getEstimate, sk.getLowerBound(numStdDevs), sk.getUpperBound(numStdDevs)))
  }
  override protected def withNewChildInternal(c: Expression): TupleEstimateAndBounds =
    copy(child = c)
  override def prettyName: String = "ds_tuple_estimate_and_bounds"
}

/** arrayOfDoublesSketchSetOp (ArrayOfDoublesSketchOperations.Operation):
  * UNION / INTERSECT (values summed on common keys, the reference's
  * COMBINER) / NOT. Output numValues follows the left operand. */
case class TupleSetOp(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ArrayOfDoublesSketches.wrapSketch(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = ArrayOfDoublesSketches.wrapSketch(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    val builder = new ArrayOfDoublesSetOperationBuilder()
      .setNumberOfValues(sa.getNumValues)
    val result = op match {
      case "union" =>
        val u = builder.buildUnion(); u.union(sa); u.union(sb); u.getResult
      case "intersect" =>
        val i = builder.buildIntersection()
        val combiner = new org.apache.datasketches.tuple.arrayofdoubles.ArrayOfDoublesCombiner {
          override def combine(x: Array[Double], y: Array[Double]): Array[Double] = {
            val r = new Array[Double](x.length)
            var i = 0; while (i < x.length) { r(i) = x(i) + y(i); i += 1 }; r
          }
        }
        i.intersect(sa, combiner); i.intersect(sb, combiner); i.getResult
      case "not" =>
        val n = builder.buildAnotB(); n.update(sa, sb); n.getResult
      case o => throw new IllegalArgumentException(s"tuple set op: $o")
    }
    result.toByteArray
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TupleSetOp =
    copy(left = l, right = r)
  override def prettyName: String = s"ds_tuple_$op"
}

/** arrayOfDoublesSketchToQuantilesSketch: the distribution of one metric
  * column over retained keys as a quantile sketch. Deviation (documented):
  * a KLL doubles sketch, this engine's quantile sketch family, not the
  * classic DoublesSketch. */
case class TupleToKll(child: Expression, column: Int, k: Int)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any = {
    val sk = ArrayOfDoublesSketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    require(column >= 1 && column <= sk.getNumValues,
      s"column $column out of range 1..${sk.getNumValues}")
    val kll = KllDoublesSketch.newHeapInstance(k)
    val it = sk.iterator()
    while (it.next()) kll.update(it.getValues()(column - 1))
    kll.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): TupleToKll = copy(child = c)
  override def prettyName: String = "ds_tuple_to_kll"
}

/** KLL doubles quantile sketch build+merge → serialized sketch bytes.
  * (reference: datasketches/quantiles — DoublesSketch; KLL is the modern
  * equivalent with better accuracy per byte). Exact while n ≤ k. */
case class KllDoublesAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Number].doubleValue())
    buf
  }
  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KllDoublesAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllDoublesAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllDoublesAgg = copy(child = c)
  override def prettyName: String = "kll_doubles_sketch"
}

/** Classic DoublesSketch build+merge aggregate → compact classic bytes
  * (family id 8). This is the WRITE-side interop for the reference's
  * quantiles module: its deserializer is `DoublesSketch.wrap(Memory.wrap)`
  * (extensions-core/datasketches/.../quantiles/DoublesSketchOperations
  * .java:56), which reads exactly these bytes — so a Druid cluster can
  * consume quantile columns this engine writes. The KLL aggregate remains
  * the in-engine default (smaller state, same error class); choose this
  * one when the output feeds a reference deployment. */
case class ClassicDoublesAgg(
    child: Expression,
    k: Int = 128,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.quantiles.DoublesUnion]
  with UnaryLike[Expression] {
  import org.apache.datasketches.quantiles.DoublesUnion

  override def createAggregationBuffer(): DoublesUnion =
    DoublesUnion.builder().setMaxK(k).build()

  override def update(buf: DoublesUnion, input: InternalRow): DoublesUnion = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Number].doubleValue())
    buf
  }
  override def merge(buf: DoublesUnion, other: DoublesUnion): DoublesUnion = {
    buf.union(other.getResult); buf
  }
  override def eval(buf: DoublesUnion): Any = buf.getResult.toByteArray(true)
  override def serialize(buf: DoublesUnion): Array[Byte] = buf.getResult.toByteArray(true)
  override def deserialize(b: Array[Byte]): DoublesUnion =
    DoublesUnion.heapify(Memory.wrap(b))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): ClassicDoublesAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ClassicDoublesAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ClassicDoublesAgg = copy(child = c)
  override def prettyName: String = "classic_doubles_sketch"
}

/** DS_HLL / APPROX_COUNT_DISTINCT_DS_HLL — build (or, for binary input,
  * merge) a DataSketches HLL sketch (HllSketchObjectSqlAggregator /
  * HllSketchApproxCountDistinctSqlAggregator). finalizeEstimate=true
  * finalizes to the ROUNDED LONG estimate (empty → 0, like the reference's
  * testEmptyTimeseriesResults); false emits HLL_8 sketch bytes readable by
  * Spark's hll_* functions and this engine's estimate/summary expressions.
  * A bare AggregateFunction so SQL FILTER clauses attach (Spark's own
  * hll_sketch_agg refuses FILTER). Strings update via the library's
  * update(String) (skips empty, like the reference's build aggregator);
  * doubles via update(double) — the reference's exact hash input
  * (HllSketchBuildAggregator). Binary inputs accept BOTH this engine's
  * Spark-built sketches and reference-written ones (same wire format). */
case class HllAcdAgg(
    child: Expression,
    lgK: Int = 12,
    mergeInput: Boolean = false,
    finalizeEstimate: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.hll.Union] with UnaryLike[Expression] {

  private type HUnion = org.apache.datasketches.hll.Union

  override def createAggregationBuffer(): HUnion =
    new org.apache.datasketches.hll.Union(lgK)
  override def update(buf: HUnion, input: InternalRow): HUnion = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeInput)
        buf.update(org.apache.datasketches.hll.HllSketch.heapify(
          Memory.wrap(v.asInstanceOf[Array[Byte]])))
      else child.dataType match {
        case LongType | IntegerType | ShortType | ByteType =>
          buf.update(v.asInstanceOf[Number].longValue())
        case DoubleType | FloatType => buf.update(v.asInstanceOf[Number].doubleValue())
        case StringType => buf.update(v.asInstanceOf[UTF8String].toString)
        case BinaryType => buf.update(v.asInstanceOf[Array[Byte]])
        case dt => throw new IllegalArgumentException(
          s"approx_count_distinct_ds_hll: unsupported type $dt")
      }
    }
    buf
  }
  override def merge(buf: HUnion, other: HUnion): HUnion = {
    buf.update(other.getResult); buf
  }
  override def eval(buf: HUnion): Any =
    if (finalizeEstimate) math.round(buf.getEstimate)
    else buf.getResult(org.apache.datasketches.hll.TgtHllType.HLL_8).toUpdatableByteArray
  override def serialize(buf: HUnion): Array[Byte] =
    buf.getResult(org.apache.datasketches.hll.TgtHllType.HLL_8).toUpdatableByteArray
  override def deserialize(bytes: Array[Byte]): HUnion = {
    val u = createAggregationBuffer()
    u.update(org.apache.datasketches.hll.HllSketch.heapify(Memory.wrap(bytes)))
    u
  }
  override def dataType: DataType = if (finalizeEstimate) LongType else BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): HllAcdAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAcdAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllAcdAgg = copy(child = c)
  override def prettyName: String = "approx_count_distinct_ds_hll"
}

/** KLL post-ops: DS_GET_QUANTILE / DS_RANK / DS_CDF equivalents.
  * inclusive=false reproduces the reference's getQuantile rule (its
  * datasketches 3.1.0 uses the strictly-greater search the modern library
  * calls EXCLUSIVE — DoublesSketchToQuantilePostAggregator.java:86). */
case class KllQuantile(child: Expression, q: Double, inclusive: Boolean = false)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any = {
    val sk = QuantileSketchBytes.wrap(v.asInstanceOf[Array[Byte]])
    // empty sketch → NaN, never null (the reference's 3.1.0 getQuantile on
    // an empty sketch; DoublesSketchToQuantilePostAggregator passes it up)
    if (sk.isEmpty) Double.NaN else sk.quantile(q, inclusive)
  }
  override protected def withNewChildInternal(c: Expression): KllQuantile = copy(child = c)
  override def prettyName: String = "kll_quantile"
}

/** Build-or-merge KLL + finalize to one quantile in a single aggregate —
  * the SQL APPROX_QUANTILE_DS surface (DoublesSketchSqlAggregator). A
  * plain AggregateFunction (not a post-op wrapper) so Spark's FILTER
  * clause attaches; an empty sketch finalizes to NaN exactly like the
  * reference's post-aggregator over an empty DoublesSketch. Uses the
  * reference's strictly-greater quantile rule. */
case class KllQuantileAgg(
    child: Expression,
    q: Double,
    k: Int = 128,
    mergeInput: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeInput)
        buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      else buf.update(v.asInstanceOf[Number].doubleValue())
    }
    buf
  }
  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }
  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) Double.NaN
    else buf.getQuantile(q, QuantileSketchBytes.criterion(inclusive = false))
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): KllQuantileAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantileAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllQuantileAgg = copy(child = c)
  override def prettyName: String = "approx_quantile_ds"
}

/** Normalized rank of a value. inclusive=false (default) is the reference's
  * datasketches-3.1.0 getRank: the fraction of the stream STRICTLY LESS
  * THAN the value (DoublesSketchToRankPostAggregator.java:86 delegates to
  * the library; 4.0.0 flipped the library default to INCLUSIVE). */
case class KllRank(child: Expression, value: Double, inclusive: Boolean = false)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any = {
    val sk = QuantileSketchBytes.wrap(v.asInstanceOf[Array[Byte]])
    // empty → NaN (DoublesSketchToRankPostAggregatorTest.emptySketch)
    if (sk.isEmpty) Double.NaN else sk.rank(value, inclusive)
  }
  override protected def withNewChildInternal(c: Expression): KllRank = copy(child = c)
  override def prettyName: String = "kll_rank"
}

/** CDF at splitPoints. inclusive=false (default) is the reference's
  * datasketches-3.1.0 getCDF: mass STRICTLY LESS THAN each splitPoint
  * (DoublesSketchToCDFPostAggregator.java:66). */
case class KllCdf(child: Expression, splits: Seq[Double], inclusive: Boolean = false)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val sk = QuantileSketchBytes.wrap(v.asInstanceOf[Array[Byte]])
    // empty → NaN per point incl. the trailing total-mass cell
    // (DoublesSketchToCDFPostAggregatorTest.emptySketch: 1 split → [NaN, NaN])
    if (sk.isEmpty) org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.fill(splits.size + 1)(Double.NaN))
    else org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      sk.cdf(splits.toArray, inclusive))
  }
  override protected def withNewChildInternal(c: Expression): KllCdf = copy(child = c)
  override def prettyName: String = "kll_cdf"
}

/** Stream length n of a serialized KLL sketch — the reference finalizes a
  * quantilesDoublesSketch aggregator to getN()
  * (DoublesSketchAggregatorFactory.java:354-357). */
case class KllN(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    QuantileSketchBytes.wrap(v.asInstanceOf[Array[Byte]]).getN
  override protected def withNewChildInternal(c: Expression): KllN = copy(child = c)
  override def prettyName: String = "kll_n"
}

/** Multi-fraction quantile lookup (quantilesDoublesSketchToQuantiles post-agg,
  * DoublesSketchToQuantilesPostAggregator.java). */
case class KllQuantiles(child: Expression, fractions: Seq[Double],
    inclusive: Boolean = false)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val sk = QuantileSketchBytes.wrap(v.asInstanceOf[Array[Byte]])
    // empty → NaN per fraction (DoublesSketchToQuantilesPostAggregatorTest
    // .emptySketch: a 3-fraction query returns [NaN, NaN, NaN])
    if (sk.isEmpty) org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.fill(fractions.size)(Double.NaN))
    else org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      fractions.map(f => sk.quantile(f, inclusive)).toArray)
  }
  override protected def withNewChildInternal(c: Expression): KllQuantiles = copy(child = c)
  override def prettyName: String = "kll_quantiles"
}

/** Histogram of estimated item counts per bin (quantilesDoublesSketchToHistogram
  * post-agg, DoublesSketchToHistogramPostAggregator.java:52-55): either
  * explicit splitPoints or numBins equal-width bins over [min, max]; each
  * bin's value is the PMF mass times the stream length n. inclusive=false
  * (default) is the reference's datasketches-3.1.0 getPMF: bin boundaries
  * split on STRICTLY-LESS-THAN (an item equal to a splitPoint lands in
  * the bin ABOVE it). */
case class KllHistogram(child: Expression, splits: Seq[Double], numBins: Option[Int],
    inclusive: Boolean = false)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val sk = QuantileSketchBytes.wrap(v.asInstanceOf[Array[Byte]])
    // empty → NaN per bin (DoublesSketchToHistogramPostAggregatorTest
    // .emptySketch: 1 split → [NaN, NaN])
    if (sk.isEmpty) return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.fill(numBins.getOrElse(splits.size + 1))(Double.NaN))
    val sp: Array[Double] = numBins match {
      case Some(m) if m > 1 =>
        val lo = sk.minItem; val hi = sk.maxItem
        val w = (hi - lo) / m
        (1 until m).map(i => lo + w * i).toArray
      case _ => splits.toArray
    }
    val pmf = sk.pmf(sp, inclusive)
    val n = sk.getN.toDouble
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(pmf.map(_ * n))
  }
  override protected def withNewChildInternal(c: Expression): KllHistogram = copy(child = c)
  override def prettyName: String = "kll_histogram"
}

/** hyper_unique() / hyper_unique_add(v, sketch) / hyper_unique_estimate(sketch)
  * expression macros (reference: processing/.../query/expression/
  * HyperUniqueExpressions.java:44-260) — per-row HLL collector manipulation
  * used inside expression virtual columns and expression-lambda aggregators.
  * The collector IS the reference's HyperLogLogCollector (V1 bytes,
  * value-space registers — plans.DruidSketchInterop), hashed with the SAME
  * functions as the cardinality aggregator (hashUnencodedChars for strings,
  * hashLong(doubleToLongBits) for doubles — HyperUniqueExpressions.java:
  * 168-191), so a lambda-built estimate matches the cardinality
  * aggregator's published constants byte-exactly
  * (TopNQueryRunnerTest.testExpressionAggregatorComplex expects
  * carExpr == car == UNIQUES_9). The lgK argument is accepted and ignored —
  * the reference collector is fixed at 2^11 buckets. */
case class HllCreateExpr(lgK: Int)
  extends org.apache.spark.sql.catalyst.expressions.LeafExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = false // each call site is a fresh collector
  override def eval(input: InternalRow): Any =
    DruidHllcBuild.toBytes(new DruidHllcBuild.State)
  override def prettyName: String = "hyper_unique"
}

case class HllAddExpr(value: Expression, sketch: Expression)
  extends BinaryExpression with CodegenFallback {
  override def left: Expression = value
  override def right: Expression = sketch
  override def dataType: DataType = BinaryType
  // Null VALUE passes the collector through unchanged (the reference's
  // sql-compatible mode skips nulls, HyperUniqueExpressions.java:168-191);
  // only a null sketch yields null. BinaryExpression.nullSafeEval would
  // null the accumulator permanently on the first null row.
  override def eval(input: InternalRow): Any = {
    val s = sketch.eval(input)
    if (s == null) null
    else {
      val v = value.eval(input)
      if (v == null) s else nullSafeEval(v, s)
    }
  }
  override protected def nullSafeEval(v: Any, s: Any): Any = {
    val st = DruidHllcBuild.fromRegisters(
      DruidHllc.registerValues(s.asInstanceOf[Array[Byte]]))
    value.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        DruidHllcBuild.addHashed(st,
          DruidHllcBuild.hashLong(v.asInstanceOf[Number].longValue()))
      case DoubleType | FloatType =>
        DruidHllcBuild.addHashed(st, DruidHllcBuild.hashLong(
          java.lang.Double.doubleToLongBits(v.asInstanceOf[Number].doubleValue())))
      case StringType =>
        DruidHllcBuild.addHashed(st,
          DruidHllcBuild.hashChars(v.asInstanceOf[UTF8String].toString))
      case BinaryType => // fold another collector (reference COMPLEX case)
        val other = DruidHllcBuild.fromRegisters(
          DruidHllc.registerValues(v.asInstanceOf[Array[Byte]]))
        DruidHllcBuild.merge(st, other)
      case dt => throw new IllegalArgumentException(s"hyper_unique_add: unsupported type $dt")
    }
    DruidHllcBuild.toBytes(st)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HllAddExpr =
    copy(value = l, sketch = r)
  override def prettyName: String = "hyper_unique_add"
}

case class HllEstimateExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    DruidHllc.estimate(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): HllEstimateExpr = copy(child = c)
  override def prettyName: String = "hyper_unique_estimate"
}

/** Fractional estimate of DATASKETCHES HLL bytes — the HLLSketchBuild /
  * HLLSketchMerge finalization (HllSketchAggregatorFactory
  * .finalizeComputation, round=false). A separate expression from
  * [[HllEstimateExpr]]: the datasketches extension's blobs and the core
  * hyperUnique HLLC collector are different wire formats in the reference
  * too. */
/** Per-row DATASKETCHES HLL construction — the HLLSketchBuild-over-MV path
  * folds a row's array elements into one DataSketches blob that Spark's
  * hll_union_agg then merges across rows (HllSketchBuildAggregator updates
  * per element). Distinct from the HLLC-backed hyper_unique() macros. */
case class DsHllCreateExpr(lgK: Int)
  extends org.apache.spark.sql.catalyst.expressions.LeafExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any =
    new org.apache.datasketches.hll.HllSketch(lgK).toUpdatableByteArray
  override def prettyName: String = "ds_hll_create"
}

case class DsHllAddExpr(value: Expression, sketch: Expression)
  extends BinaryExpression with CodegenFallback {
  override def left: Expression = value
  override def right: Expression = sketch
  override def dataType: DataType = BinaryType
  override def eval(input: InternalRow): Any = {
    val s = sketch.eval(input)
    if (s == null) null
    else {
      val v = value.eval(input)
      if (v == null) s else nullSafeEval(v, s)
    }
  }
  override protected def nullSafeEval(v: Any, s: Any): Any = {
    val sk = org.apache.datasketches.hll.HllSketch.heapify(
      Memory.wrap(s.asInstanceOf[Array[Byte]]))
    value.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        sk.update(v.asInstanceOf[Number].longValue())
      case DoubleType | FloatType => sk.update(v.asInstanceOf[Number].doubleValue())
      case StringType => sk.update(v.asInstanceOf[UTF8String].toString)
      case dt => throw new IllegalArgumentException(s"ds_hll_add: unsupported type $dt")
    }
    sk.toUpdatableByteArray
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DsHllAddExpr =
    copy(value = l, sketch = r)
  override def prettyName: String = "ds_hll_add"
}

case class DsHllEstimateExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    org.apache.datasketches.hll.HllSketch.heapify(
      Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(c: Expression): DsHllEstimateExpr = copy(child = c)
  override def prettyName: String = "ds_hll_estimate"
}

/** thetaSketchEstimate with errorBoundsStdDev set → the reference returns a
  * SketchEstimateWithErrorBounds object rather than a bare double
  * (theta/SketchEstimatePostAggregator.java:88-96; field names and order
  * from SketchEstimateWithErrorBounds.java:44-47). Rendered as a STRUCT so
  * the server's JSON layer serializes the same {estimate, highBound,
  * lowBound, numStdDev} shape. */
case class ThetaEstimateBounds(child: Expression, numStdDevs: Int)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("highBound", DoubleType, nullable = false),
    StructField("lowBound", DoubleType, nullable = false),
    StructField("numStdDev", IntegerType, nullable = false)))
  override protected def nullSafeEval(v: Any): Any = {
    val sk = Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    InternalRow(sk.getEstimate, sk.getUpperBound(numStdDevs),
      sk.getLowerBound(numStdDevs), numStdDevs)
  }
  override protected def withNewChildInternal(c: Expression): ThetaEstimateBounds =
    copy(child = c)
  override def prettyName: String = "theta_sketch_estimate_bounds"
}

/** HLLSketchEstimateWithBounds → [estimate, lower, upper] at numStdDev
  * (hll/HllSketchToEstimateWithBoundsPostAggregator.java:104-108). */
case class HllEstimateWithBounds(child: Expression, numStdDevs: Int)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val sk = org.apache.datasketches.hll.HllSketch.heapify(
      Memory.wrap(v.asInstanceOf[Array[Byte]]))
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(sk.getEstimate, sk.getLowerBound(numStdDevs), sk.getUpperBound(numStdDevs)))
  }
  override protected def withNewChildInternal(c: Expression): HllEstimateWithBounds =
    copy(child = c)
  override def prettyName: String = "hll_estimate_with_bounds"
}

/** Two-sided Welch's t-test p-value — the math behind the reference's
  * ArrayOfDoublesSketchTTestPostAggregator (it delegates to
  * commons-math3 TTest.tTest(stats1, stats2), which is exactly this:
  * unequal-variance t statistic, Welch–Satterthwaite df, p = the
  * regularized incomplete beta I_x(df/2, 1/2) at x = df/(df+t²)).
  * Self-contained standard numerics (Lanczos log-gamma + Lentz continued
  * fraction for the incomplete beta) — no stats library in the sandbox. */
/** PvaluefromZscorePostAggregator (extensions-core/stats teststats,
  * JSON type "pvalue2tailedZtest"): 2·(1 − Φ(|z|)). */
case class PvalueFromZscore(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any = v match {
    case n: Number => 2.0 * (1.0 - StatInference.normalCdf(math.abs(n.doubleValue())))
    case _ => null
  }
  override protected def withNewChildInternal(c: Expression): PvalueFromZscore =
    copy(child = c)
  override def prettyName: String = "pvalue_2tailed_ztest"
}

object StatInference {
  private val LanczosG = 7.0
  private val LanczosCoefs = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  def logGamma(x0: Double): Double = {
    // Lanczos approximation (reflection for x < 0.5)
    if (x0 < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x0)) - logGamma(1.0 - x0)
    else {
      val x = x0 - 1.0
      var a = LanczosCoefs(0)
      val t = x + LanczosG + 0.5
      var i = 1
      while (i < LanczosCoefs.length) { a += LanczosCoefs(i) / (x + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Continued fraction for the incomplete beta (Numerical Recipes betacf,
    * modified Lentz). */
  private def betacf(a: Double, b: Double, x: Double): Double = {
    val MaxIt = 300; val Eps = 3e-16; val FpMin = 1e-300
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= MaxIt) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d; h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) return h
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a, b). */
  def regularizedBeta(x: Double, a: Double, b: Double): Double = {
    if (x <= 0.0) 0.0
    else if (x >= 1.0) 1.0
    else {
      val bt = math.exp(logGamma(a + b) - logGamma(a) - logGamma(b) +
        a * math.log(x) + b * math.log1p(-x))
      if (x < (a + 1.0) / (a + b + 2.0)) bt * betacf(a, b, x) / a
      else 1.0 - bt * betacf(b, a, 1.0 - x) / b
    }
  }

  /** Regularized upper incomplete gamma Q(a, x) — series for x < a+1,
    * Lentz continued fraction otherwise (the same machinery commons-math's
    * Erf rides, matching it to ~1e-14). */
  def regularizedGammaQ(a: Double, x: Double): Double = {
    if (x <= 0.0) 1.0
    else if (x < a + 1.0) {
      // P(a,x) by series, Q = 1 - P
      var ap = a; var sum = 1.0 / a; var del = sum
      var n = 0
      while (n < 500 && math.abs(del) > math.abs(sum) * 1e-16) {
        ap += 1.0; del *= x / ap; sum += del; n += 1
      }
      1.0 - sum * math.exp(-x + a * math.log(x) - logGamma(a))
    } else {
      var b = x + 1.0 - a; var c = 1.0 / 1e-300; var d = 1.0 / b; var h = d
      var i = 1
      var done = false
      while (i <= 500 && !done) {
        val an = -i * (i - a)
        b += 2.0
        d = an * d + b; if (math.abs(d) < 1e-300) d = 1e-300
        c = b + an / c; if (math.abs(c) < 1e-300) c = 1e-300
        d = 1.0 / d
        val del = d * c
        h *= del
        if (math.abs(del - 1.0) < 1e-16) done = true
        i += 1
      }
      math.exp(-x + a * math.log(x) - logGamma(a)) * h
    }
  }

  /** Standard normal CDF via erfc — NormalDistribution.cumulativeProbability
    * (the PvaluefromZscorePostAggregator's distribution). */
  def normalCdf(x: Double): Double = {
    val z = x / math.sqrt(2.0)
    val erfc = if (z >= 0) regularizedGammaQ(0.5, z * z)
               else 2.0 - regularizedGammaQ(0.5, z * z)
    1.0 - 0.5 * erfc
  }

  /** Two-sided Welch p-value from summary stats (mean, SAMPLE variance, n). */
  def welchPValue(m1: Double, v1: Double, n1: Long,
      m2: Double, v2: Double, n2: Long): Double = {
    val se = v1 / n1 + v2 / n2
    if (se == 0.0 || n1 < 2 || n2 < 2) return if (m1 == m2) 1.0 else 0.0
    val t = (m1 - m2) / math.sqrt(se)
    val df = se * se /
      ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1))
    regularizedBeta(df / (df + t * t), df / 2.0, 0.5)
  }
}

/** arrayOfDoublesSketchTTest: per-value-column two-sided Welch p-values
  * between two tuple sketches' retained entries
  * (tuple/ArrayOfDoublesSketchTTestPostAggregator.java:67-89 — the
  * reference feeds each column's SummaryStatistics into commons-math's
  * TTest.tTest; [[StatInference]] reproduces that math directly). */
case class TupleTTest(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private def stats(bytes: Array[Byte]): (Array[Double], Array[Double], Long) = {
    val sk = ArrayOfDoublesSketches.wrapSketch(Memory.wrap(bytes))
    val k = sk.getNumValues
    val n = sk.getRetainedEntries.toLong
    val sums = new Array[Double](k)
    val sqs = new Array[Double](k)
    val it = sk.iterator()
    while (it.next()) {
      val vs = it.getValues
      var i = 0
      while (i < k) { sums(i) += vs(i); sqs(i) += vs(i) * vs(i); i += 1 }
    }
    val means = sums.map(_ / n)
    val vars0 = Array.tabulate(k) { i =>
      if (n < 2) 0.0 else math.max(0.0, (sqs(i) - n * means(i) * means(i)) / (n - 1))
    }
    (means, vars0, n)
  }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (m1, v1, n1) = stats(a.asInstanceOf[Array[Byte]])
    val (m2, v2, n2) = stats(b.asInstanceOf[Array[Byte]])
    require(m1.length == m2.length,
      s"Sketches have different number of values: ${m1.length} and ${m2.length}")
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.tabulate(m1.length)(i =>
        StatInference.welchPValue(m1(i), v1(i), n1, m2(i), v2(i), n2)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TupleTTest =
    copy(left = l, right = r)
  override def prettyName: String = "ds_tuple_t_test"
}

/** Sketch summary (the *ToString post-agg family: thetaSketchToString,
  * HLLSketchToString, quantilesDoublesSketchToString — each returns the
  * sketch's human-readable diagnostic summary, reference
  * theta/SketchToStringPostAggregator.java:70-74 etc.). `kind` picks the
  * deserializer; "quantiles" tries KLL first (our storage form) and falls
  * back to the classic DoublesSketch layout (binary interop columns). */
case class SketchSummary(child: Expression, kind: String)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any = {
    val mem = Memory.wrap(v.asInstanceOf[Array[Byte]])
    val s = kind match {
      case "theta" => Sketches.wrapSketch(mem).toString
      case "hll" => org.apache.datasketches.hll.HllSketch.heapify(mem).toString
      case "tuple" => ArrayOfDoublesSketches.wrapSketch(mem).toString
      case "quantiles" =>
        try KllDoublesSketch.heapify(mem).toString
        catch { case _: Exception =>
          org.apache.datasketches.quantiles.DoublesSketch.heapify(mem).toString }
      case k => throw new IllegalArgumentException(s"sketch summary kind: $k")
    }
    UTF8String.fromString(s)
  }
  override protected def withNewChildInternal(c: Expression): SketchSummary =
    copy(child = c)
  override def prettyName: String = s"${kind}_sketch_to_string"
}

/** Column-level API for the sketch family (plus HLL aliases over Spark's
  * built-in DataSketches HLL functions). */
object SketchFunctions {
  private def c(e: Expression): Column = CatalystBridge.column(e)
  private def e(col: Column): Expression = CatalystBridge.expression(col)

  /** DS_THETA(col): build a theta sketch; finalize with thetaEstimate. */
  def thetaSketch(col: Column, lgK: Int = 12): Column =
    c(ThetaSketchAgg(e(col), lgK).toAggregateExpression())
  def thetaEstimate(col: Column): Column = c(ThetaEstimate(e(col)))
  def thetaEstimateBounds(col: Column, numStdDevs: Int = 1): Column =
    c(ThetaEstimateBounds(e(col), numStdDevs))
  def thetaSummary(col: Column): Column = c(SketchSummary(e(col), "theta"))
  def hllEstimateWithBounds(col: Column, numStdDevs: Int = 1): Column =
    c(HllEstimateWithBounds(e(col), numStdDevs))
  def hllSummary(col: Column): Column = c(SketchSummary(e(col), "hll"))
  def quantilesSummary(col: Column): Column = c(SketchSummary(e(col), "quantiles"))
  def tupleSummary(col: Column): Column = c(SketchSummary(e(col), "tuple"))
  def tupleTTest(a: Column, b: Column): Column = c(TupleTTest(e(a), e(b)))
  /** Union a column OF serialized theta sketches (rollup re-aggregation). */
  def thetaUnionAgg(col: Column, lgK: Int = 12): Column =
    c(ThetaUnionAgg(e(col), lgK).toAggregateExpression())
  /** Merge a column OF serialized KLL sketches (rollup re-aggregation). */
  def kllMerge(col: Column, k: Int = 200): Column =
    c(KllMergeAgg(e(col), k).toAggregateExpression())
  /** Union a column OF serialized tuple sketches (rollup re-aggregation). */
  def tupleUnionAgg(col: Column, numValues: Int = 1, lgK: Int = 12): Column =
    c(TupleUnionAgg(e(col), numValues, lgK).toAggregateExpression())
  def thetaUnion(a: Column, b: Column): Column = c(ThetaSetOp(e(a), e(b), "union"))
  def thetaIntersect(a: Column, b: Column): Column = c(ThetaSetOp(e(a), e(b), "intersect"))
  def thetaNot(a: Column, b: Column): Column = c(ThetaSetOp(e(a), e(b), "not"))

  /** DS_QUANTILES_SKETCH(col, k): KLL doubles sketch. Exact while n ≤ k. */
  def kllSketch(col: Column, k: Int = 200): Column =
    c(KllDoublesAgg(e(col), k).toAggregateExpression())

  /** Classic DoublesSketch bytes (reference wire format — write-side
    * interop, see [[ClassicDoublesAgg]]); read back through the same
    * family-dispatching DS_* post-aggs. */
  def classicQuantilesSketch(col: Column, k: Int = 128): Column =
    c(ClassicDoublesAgg(e(col), k).toAggregateExpression())
  /** Quantile/rank/CDF lookups default to inclusive=false — the
    * reference's datasketches-3.1.0 search rules (strictly-greater
    * getQuantile, strictly-less getRank/getCDF/getPMF; 4.0.0 flipped the
    * library defaults to INCLUSIVE). Pass inclusive=true for the modern
    * percentile_disc-style behavior. */
  def kllQuantile(col: Column, q: Double, inclusive: Boolean = false): Column =
    c(KllQuantile(e(col), q, inclusive))
  def kllRank(col: Column, v: Double, inclusive: Boolean = false): Column =
    c(KllRank(e(col), v, inclusive))
  def kllCdf(col: Column, splits: Seq[Double], inclusive: Boolean = false): Column =
    c(KllCdf(e(col), splits, inclusive))
  def kllN(col: Column): Column = c(KllN(e(col)))
  def kllQuantiles(col: Column, fractions: Seq[Double],
      inclusive: Boolean = false): Column =
    c(KllQuantiles(e(col), fractions, inclusive))
  def kllHistogram(col: Column, splits: Seq[Double], numBins: Option[Int] = None): Column =
    c(KllHistogram(e(col), splits, numBins))

  /** hyper_unique expression-macro family (per-row HLL collectors). */
  /** DataSketches per-row build pair (HLLSketchBuild over MV cells). */
  def dsHyperUnique(lgK: Int = 12): Column = c(DsHllCreateExpr(lgK))
  def dsHyperUniqueAdd(value: Column, sketch: Column): Column =
    c(DsHllAddExpr(e(value), e(sketch)))

  def hyperUnique(lgK: Int = 12): Column = c(HllCreateExpr(lgK))
  def hyperUniqueAdd(value: Column, sketch: Column): Column =
    c(HllAddExpr(e(value), e(sketch)))
  def hyperUniqueEstimate(sketch: Column): Column = c(DsHllEstimateExpr(e(sketch)))

  /** DS_TUPLE_DOUBLES family (ArrayOfDoublesSketchModule). */
  def tupleSketch(key: Column, values: Seq[Column], lgK: Int = 12): Column =
    c(TupleSketchAgg(e(key), values.map(e), lgK).toAggregateExpression())
  def tupleEstimate(col: Column): Column = c(TupleEstimate(e(col)))
  def tupleMetricsSum(col: Column): Column = c(TupleMetricsSum(e(col)))
  def tupleNumEntries(col: Column): Column = c(TupleNumEntries(e(col)))
  def tupleMeans(col: Column): Column = c(TupleColumnStats(e(col), "mean"))
  def tupleVariances(col: Column): Column = c(TupleColumnStats(e(col), "variance"))
  def tupleEstimateAndBounds(col: Column, numStdDevs: Int = 1): Column =
    c(TupleEstimateAndBounds(e(col), numStdDevs))
  def tupleUnion(a: Column, b: Column): Column = c(TupleSetOp(e(a), e(b), "union"))
  def tupleIntersect(a: Column, b: Column): Column = c(TupleSetOp(e(a), e(b), "intersect"))
  def tupleNot(a: Column, b: Column): Column = c(TupleSetOp(e(a), e(b), "not"))
  def tupleToKll(col: Column, column: Int = 1, k: Int = 200): Column =
    c(TupleToKll(e(col), column, k))

  /** Druid HyperLogLogCollector binary interop — read (estimate/union) AND
    * write (build reference-format V1 bytes a Druid cluster can consume). */
  def hllcBuild(col: Column): Column =
    c(HllcBuild(e(col)).toAggregateExpression())
  /** Per-row single-value collector bytes (ingest-time complex column). */
  def hllcOf(col: Column): Column = c(HllcOf(e(col)))

  /** Cardinality aggregator's HLLC estimate over N field values. */
  def hllcCardinality(cols: Seq[Column]): Column =
    c(HllcCardinality(cols.map(e)).toAggregateExpression())
  def hllcEstimate(col: Column): Column = c(HllcEstimate(e(col)))
  def hllcUnion(col: Column): Column =
    c(HllcUnionBytes(e(col)).toAggregateExpression())
  def hllcUnionEstimate(col: Column): Column =
    c(HllcUnionEstimate(e(col)).toAggregateExpression())

  /** DS_HLL family — Spark ships DataSketches-backed HLL functions.
    * hllEstimate rounds via the graft expression instead of Spark's
    * "hll_sketch_estimate", whose name the Druid-parity SQL surface
    * overrides with the fractional-DOUBLE semantic (Spark 4's functions
    * API resolves by name through the session registry). */
  def hllSketch(col: Column, lgK: Int = 12): Column =
    org.apache.spark.sql.functions.hll_sketch_agg(col, lgK)
  def hllEstimate(col: Column): Column =
    org.apache.spark.sql.functions.round(hyperUniqueEstimate(col)).cast("long")
  def hllUnionAgg(col: Column): Column =
    org.apache.spark.sql.functions.hll_union_agg(col)
}
