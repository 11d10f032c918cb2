package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's variance aggregator, arithmetic-exact
  * (extensions-core/stats/.../variance/VarianceAggregatorCollector.java):
  * a (count, sum, nvariance) stream fold — update adds
  * t²/(count·(count−1)) with t = count·v − sum (:125-139), merge folds
  * with ratio/(n1+n2)·t² (:86-91) — finalized by getVariance (:162-171):
  * count 0 → null (SQL mode), count 1 → 0.0, else nvariance/count
  * (population) or nvariance/(count−1) (sample). This single-value-0 and
  * empty-null contract differs from ANSI VAR_SAMP (null at n ≤ 1), which
  * is why the engine does not reuse Spark's builtin
  * (VarianceSqlAggregatorTest.testVarianceOrderBy pins the 0f rows).
  *
  * inputType drives BOTH the per-value coercion (float reads float32 like
  * VarianceAggregatorFactory's float factory; long truncates; anything
  * else lenient-parses to double) and the OUTPUT type (the SQL layer
  * returns the variance as the input's width —
  * VarianceSqlAggregator: float → FLOAT, long → LONG, else DOUBLE).
  * sqrtOut finalizes to the standard deviation INSIDE the aggregate
  * (StandardDeviationPostAggregator), keeping STDDEV* a bare
  * AggregateFunction so SQL FILTER clauses attach. */
case class DruidVarianceAgg(
    child: Expression,
    population: Boolean,
    inputType: String = "double",     // double | float | long
    sqrtOut: Boolean = false,
    // SQL (BaseVarianceSqlAggregator) types the OUTPUT by the input width;
    // the native factory always finalizes DOUBLE
    // (VarianceAggregatorFactory.finalizeComputation) — typedOutput=false
    // keeps the float/long input coercion but emits DOUBLE
    typedOutput: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  // buffer: [count, sum, nvariance]
  override def createAggregationBuffer(): Array[Double] = Array(0.0, 0.0, 0.0)

  private def coerce(v: Any): Option[Double] = v match {
    case null => None
    case n: Number => inputType match {
      case "float" => Some(n.floatValue().toDouble)
      case "long" => Some(n.longValue().toDouble)
      case _ => Some(n.doubleValue())
    }
    case s: UTF8String => // lenient string parse (Rows.objectToNumber)
      try Some(java.lang.Double.parseDouble(s.toString)) catch { case _: Exception => None }
    case b: java.lang.Boolean => Some(if (b) 1.0 else 0.0)
    case _ => None
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    coerce(child.eval(input)).foreach { v =>
      buf(0) += 1; buf(1) += v
      if (buf(0) > 1) {
        val t = buf(0) * v - buf(1)
        buf(2) += (t * t) / (buf(0) * (buf(0) - 1))
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other(0) == 0) buf
    else if (buf(0) == 0) { other.copyToArray(buf); buf }
    else {
      val ratio = buf(0) / other(0)
      val t = buf(1) / ratio - other(1)
      buf(2) += other(2) + (ratio / (buf(0) + other(0)) * t * t)
      buf(0) += other(0); buf(1) += other(1)
      buf
    }
  }

  override def eval(buf: Array[Double]): Any = {
    val variance: java.lang.Double =
      if (buf(0) == 0) null
      else if (buf(0) == 1) 0.0
      else if (population) buf(2) / buf(0)
      else buf(2) / (buf(0) - 1)
    if (variance == null) null
    else {
      val out = if (sqrtOut) math.sqrt(variance) else variance.doubleValue()
      if (!typedOutput) out
      else inputType match {
        case "float" => out.toFloat
        case "long" => out.toLong
        case _ => out
      }
    }
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24)
    bb.putDouble(buf(0)).putDouble(buf(1)).putDouble(buf(2))
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array(bb.getDouble, bb.getDouble, bb.getDouble)
  }

  override def dataType: DataType =
    if (!typedOutput) DoubleType
    else inputType match {
      case "float" => FloatType
      case "long" => LongType
      case _ => DoubleType
    }
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): DruidVarianceAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DruidVarianceAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DruidVarianceAgg =
    copy(child = c)
  override def prettyName: String =
    (if (sqrtOut) "stddev" else "variance") + (if (population) "_pop" else "_samp")
}

object DruidVarianceAgg {
  /** inputType from the resolved input column (VarianceSqlAggregator reads
    * the Druid column type): float32 stays float, integral stays long,
    * everything else doubles. */
  def inferInputType(e: Expression): String =
    try {
      if (!e.resolved) "double"
      else e.dataType match {
        case FloatType => "float"
        case LongType | IntegerType | ShortType | ByteType => "long"
        case _ => "double"
      }
    } catch { case _: Throwable => "double" }
}
