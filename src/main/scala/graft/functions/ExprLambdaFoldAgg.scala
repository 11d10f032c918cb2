package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable accumulator holder for [[ExprLambdaFoldAgg]]. A wrapper class (vs
  * the raw value) so a null accumulator is distinguishable from an absent
  * buffer and the fold can replace the value in place. */
final class LambdaAcc(var value: Any, var hasValue: Boolean)

/** Bounded expression-lambda aggregator (reference: processing/.../
  * aggregation/ExpressionLambdaAggregatorFactory.java): folds each input row
  * into a SCALAR accumulator buffer via the pre-compiled `fold` expression
  * and merges partials via `combine` — the same incremental lifecycle the
  * reference's ExpressionLambdaAggregator runs, and the opposite of a
  * `collect_list`+`aggregate` compilation whose partial state is the whole
  * group (every raw value crossing the shuffle, the group materialized in
  * one task). Memory per group is the accumulator alone, capped at
  * `maxSizeBytes` like the reference's buffer
  * (ExpressionLambdaAggregatorFactory.java:68 DEFAULT_MAX_SIZE_BYTES = 1KiB).
  *
  * The fold/combine/finalize bodies arrive fully resolved and bound:
  *  - `foldExpr`   over the row [acc, field1..fieldN]
  *  - `combineExpr` over the row [lhsAcc, rhsAcc]
  *  - `finalizeExpr` over the row [acc]
  * (compiled by [[ExpressionLambda]] via the session analyzer, so Druid-named
  * functions and type coercion resolve exactly as in a query).
  */
case class ExprLambdaFoldAgg(
    fields: Seq[Expression],
    accType: DataType,
    initExpr: Expression,
    foldExpr: Expression,
    combineExpr: Expression,
    finalizeExpr: Option[Expression],
    resultType: DataType,
    maxSizeBytes: Int,
    // ExpressionLambdaAggregatorFactory.java:77-131 null-handling knobs:
    // skip rows with any null input; skip null partials at combine; result
    // null unless at least one row aggregated (sql-compatible default)
    aggregateNullInputs: Boolean = true,
    combineNullInputs: Boolean = true,
    nullUnlessAggregated: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LambdaAcc] {

  override def children: Seq[Expression] = fields
  override def dataType: DataType = resultType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): LambdaAcc =
    // hasValue starts false under isNullUnlessAggregated
    // (ExpressionLambdaAggregator.java:45) and flips on the first
    // aggregated row
    new LambdaAcc(initExpr.eval(InternalRow.empty), !nullUnlessAggregated)

  // an input value may point into the scan's reused row buffer (UTF8String /
  // UnsafeArrayData over UnsafeRow memory); anything that may outlive this
  // row — i.e. anything the fold result can embed — must be copied first
  private def copyOf(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case a: ArrayData => a.copy()
    case m: MapData => m.copy()
    case r: InternalRow => r.copy()
    case x => x
  }

  /** Approximate accumulator footprint, mirroring the spirit of the
    * reference's ExprEval size accounting (type byte + null byte + value). */
  private def sizeOf(v: Any): Int = v match {
    case null => 2
    case s: UTF8String => 6 + s.numBytes
    case b: Array[Byte] => 6 + b.length
    case a: ArrayData =>
      val perElem = accType match {
        case ArrayType(StringType, _) => 16
        case _ => 9
      }
      10 + a.numElements() * perElem
    case _ => 10
  }

  private def guard(v: Any): Any = {
    if (sizeOf(v) > maxSizeBytes)
      throw new IllegalStateException(
        s"Exceeded memory usage when aggregating type [$accType]: " +
          s"buffer would exceed maxSizeBytes [$maxSizeBytes]")
    v
  }

  @transient private lazy val foldRow = new GenericInternalRow(1 + fields.length)
  override def update(buf: LambdaAcc, input: InternalRow): LambdaAcc = {
    foldRow.update(0, buf.value)
    var i = 0
    while (i < fields.length) {
      val v = copyOf(fields(i).eval(input))
      // shouldAggregateNullInputs=false: a row with ANY null input is
      // skipped before the fold runs (ExpressionLambdaAggregator.java:54-59)
      if (v == null && !aggregateNullInputs) return buf
      foldRow.update(i + 1, v)
      i += 1
    }
    buf.value = guard(copyOf(foldExpr.eval(foldRow)))
    buf.hasValue = true
    buf
  }

  @transient private lazy val combineRow = new GenericInternalRow(2)
  override def merge(buf: LambdaAcc, other: LambdaAcc): LambdaAcc = {
    // a partial that never aggregated IS the null partial; skipped when
    // shouldCombineAggregateNullInputs=false, else combined as null
    val rhs = if (other.hasValue) other.value else null
    if (rhs == null && !combineNullInputs) return buf
    combineRow.update(0, buf.value)
    combineRow.update(1, rhs)
    buf.value = guard(copyOf(combineExpr.eval(combineRow)))
    buf.hasValue = buf.hasValue || other.hasValue
    buf
  }

  @transient private lazy val finalRow = new GenericInternalRow(1)
  override def eval(buf: LambdaAcc): Any =
    if (!buf.hasValue) null // isNullUnlessAggregated (:79)
    else finalizeExpr match {
      case Some(fin) => finalRow.update(0, buf.value); fin.eval(finalRow)
      case None => buf.value
    }

  @transient private lazy val serProj =
    UnsafeProjection.create(Array(accType, org.apache.spark.sql.types.BooleanType))
  @transient private lazy val serRow = new GenericInternalRow(2)
  override def serialize(buf: LambdaAcc): Array[Byte] = {
    serRow.update(0, buf.value)
    serRow.update(1, buf.hasValue)
    serProj(serRow).copy().getBytes
  }
  override def deserialize(bytes: Array[Byte]): LambdaAcc = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    new LambdaAcc(copyOf(row.get(0, accType)), row.getBoolean(1))
  }

  override def withNewMutableAggBufferOffset(o: Int): ExprLambdaFoldAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExprLambdaFoldAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExprLambdaFoldAgg =
    copy(fields = newChildren)
  override def prettyName: String = "expression_lambda_fold"
}
