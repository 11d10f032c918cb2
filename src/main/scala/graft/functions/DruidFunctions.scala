package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Druid scalar-function surface (math-expr builtins + SQL operator
  * conversions) re-expressed over Spark built-ins.
  *
  * Reference: core/src/main/java/org/apache/druid/math/expr/Function.java and
  * sql/src/main/java/org/apache/druid/sql/calcite/expression/builtin/.
  * Only genuinely-missing functions get custom code; everything else is a
  * thin alias over `org.apache.spark.sql.functions` so it stays inside
  * whole-stage codegen.
  */
object DruidFunctions {

  // --- conditional / null (Function.java:2089-2304) ---
  def nvl(a: Column, b: Column): Column = coalesce(a, b)
  /** Druid safe_divide (Function.java:1171-1213, sql-compatible mode):
    * x/0 → null EXCEPT 0/0 → 0 (also for NaN denominators). */
  def safeDivide(a: Column, b: Column): Column =
    when(b === 0 || isnan(b), when(a === 0, lit(0)).otherwise(lit(null)))
      .otherwise(a / b)
  /** Druid `div(x,y)`: integer division. */
  def intDiv(a: Column, b: Column): Column = (a.cast("long") / b.cast("long")).cast("long")

  // --- string (Function.java:2348-2840) ---
  /** Druid strpos is 0-based, -1 when absent. */
  def strpos(haystack: Column, needle: Column): Column =
    call_function("locate", needle, haystack) - 1
  def textcat(a: Column, b: Column): Column = concat(a, b)
  def containsString(h: Column, n: String): Column = h.contains(n)
  def iContainsString(h: Column, n: String): Column = lower(h).contains(n.toLowerCase)

  // --- multi-value string dimension helpers (§1.4 of SURVEY) ---
  // Reference semantics: processing/.../segment/DimensionSelector.java (MV cells),
  // filter = any-element-matches (query/filter/Filter.java:93),
  // groupBy = one group per element (epinephelinae/GroupByQueryEngineV2.java:603).
  def mvContains(c: Column, v: Any): Column = array_contains(c, v)
  def mvOverlap(a: Column, b: Column): Column = arrays_overlap(a, b)
  /** MV_FILTER_ONLY/NONE plan to the reference's ListFilteredVirtualColumn,
    * whose dimension selector yields NULL — not an empty cell — when nothing
    * survives the list (processing/.../virtual/ListFilteredVirtualColumn.java;
    * CalciteMultiValueStringQueryTest.java:1184 documents the quirk vs the
    * filter() expression fallback), so 0-length results nullify here. */
  def mvFilterOnly(c: Column, allowed: Seq[String]): Column =
    nullifyEmpty(filter(c, x => x.isin(allowed: _*)))
  def mvFilterNone(c: Column, denied: Seq[String]): Column =
    nullifyEmpty(filter(c, x => !x.isin(denied: _*)))
  private def nullifyEmpty(arr: Column): Column = when(size(arr) > 0, arr)
  def mvLength(c: Column): Column = size(c)
  /** array_to_string stringifies null ELEMENTS as "null" (Function.java
    * ArrayToStringFunction joins with String.valueOf; e.g.
    * CalciteArraysQueryTest.java:1967 expects "null,1a,2,a,defabc"); a null
    * ARRAY still yields null. */
  def mvToString(c: Column, sep: String): Column = array_join(c, sep, "null")
  def stringToMv(c: Column, sep: String): Column = split(c, sep)
  /** Any-element-matches filter semantics for arbitrary predicates. */
  def mvAnyMatch(c: Column, pred: Column => Column): Column = exists(c, pred)

  // --- histograms (extensions-core/histogram) ---
  /** approxHistogram (ApproximateHistogramAggregatorFactory.java): the
    * reference implements Ben-Haim/Tom-Tov streaming centroids — the SAME
    * algorithm behind Spark's built-in `histogram_numeric`, so the alias is
    * semantically faithful (and exact whenever distinct values ≤ k).
    * Returns array<struct<x,y>> of centroids.
    */
  def approxHistogram(c: Column, k: Int = 50): Column =
    call_function("histogram_numeric", c, lit(k))

  /** fixedBucketsHistogram (FixedBucketsHistogramAggregatorFactory.java):
    * `numBuckets` equal buckets over [lower, upper); returns the per-bucket
    * counts as an array. Outlier modes per the reference: "clip" counts
    * out-of-range values in the edge buckets, "ignore" drops them.
    * Compiles to numBuckets codegen'd sum(when) aggregates — partial-agg
    * combinable, so it scales like any sum.
    */
  def fixedBucketsHistogram(c: Column, lower: Double, upper: Double,
      numBuckets: Int, outlierMode: String = "clip"): Column = {
    val width = (upper - lower) / numBuckets
    val rawIdx = floor((c - lower) / width).cast("int")
    val idx = outlierMode match {
      case "clip" => least(greatest(rawIdx, lit(0)), lit(numBuckets - 1))
      // "overflow" keeps outliers OUT of the buckets too — the reference
      // tracks them in separate lower/upperOutlierCount fields
      // (FixedBucketsHistogram.java OutlierHandlingMode.OVERFLOW), which
      // this rendering (bucket counts) does not carry; the bucket VALUES
      // are identical to ignore's
      case "ignore" | "overflow" => when(rawIdx >= 0 && rawIdx < numBuckets, rawIdx)
      case m => throw new IllegalArgumentException(s"outlier mode: $m")
    }
    array((0 until numBuckets).map(i =>
      sum(when(idx === i, 1L).otherwise(0L))): _*)
  }

  // --- format (Function.java:3691-3721) ---
  private val decUnits = Seq("B", "KB", "MB", "GB", "TB", "PB", "EB")
  private val binUnits = Seq("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB")
  private def humanReadable(c: Column, base: Double, units: Seq[String], precision: Int): Column = {
    // the BYTE formats long-cast their input first (SizeFormatFunc
    // value.asLong(): NaN→0 B, ±Inf→±Long extremes→±8 EiB, floats truncate
    // — FunctionTest.testSizeFormatWithEdgeCases)
    val lc = c.cast("long")
    val b = lc.cast("double")
    val mag = when(b === 0, 0).otherwise(floor(log(base, abs(b))).cast("int"))
    val magC = least(greatest(mag, lit(0)), lit(units.size - 1))
    val scaled = b / pow(lit(base), magC.cast("double"))
    val unit = element_at(array(units.map(lit): _*), magC + 1)
    // the reference prints the RAW long below one unit ("1000 B", no
    // precision) and %.Nf above it — no thousands grouping either way
    // (HumanReadableBytes.java:253,272 BinaryFormatter/DecimalFormatter)
    when(c.isNull, lit(null).cast("string"))
      .when(abs(b) < base, concat(lc.cast("string"), lit(" "), lit(units.head)))
      .otherwise(concat(format_string(s"%.${precision}f", scaled), lit(" "), unit))
  }
  /** Precision as a per-row expression (the reference evaluates it per row;
    * valid range [0,3], HumanReadableBytes.java:249). */
  private[functions] def humanReadableDyn(c: Column, base: Double, units: Seq[String],
      p: Column): Column =
    when(p === 1, humanReadable(c, base, units, 1))
      .when(p === 2, humanReadable(c, base, units, 2))
      .when(p === 3, humanReadable(c, base, units, 3))
      .otherwise(humanReadable(c, base, units, 0))
  def humanReadableDecimalByteFormatDyn(c: Column, p: Column): Column =
    humanReadableDyn(c, 1000.0, decUnits, p)
  def humanReadableBinaryByteFormatDyn(c: Column, p: Column): Column =
    humanReadableDyn(c, 1024.0, binUnits, p)
  def humanReadableDecimalByteFormat(c: Column, precision: Int = 2): Column =
    humanReadable(c, 1000.0, decUnits, precision)
  def humanReadableBinaryByteFormat(c: Column, precision: Int = 2): Column =
    humanReadable(c, 1024.0, binUnits, precision)
  /** HUMAN_READABLE_DECIMAL_FORMAT (HumanReadableNumber: plain count units
    * K/M/G/T/P/E, no suffix below 1000 — "49.38 K",
    * CalciteQueryTest.java:13725). */
  def humanReadableDecimalFormat(c: Column, precision: Int = 2): Column = {
    val b = c.cast("double")
    val mag = when(b === 0, 0).otherwise(floor(log(1000.0, abs(b))).cast("int"))
    val magC = least(greatest(mag, lit(0)), lit(6))
    val scaled = b / pow(lit(1000.0), magC.cast("double"))
    val unit = element_at(array(Seq("", "K", "M", "G", "T", "P", "E").map(lit): _*), magC + 1)
    when(magC === 0, format_number(b, precision))
      .otherwise(concat(format_number(scaled, precision), lit(" "), unit))
  }

  // --- IPv4 (query/expression/IPv4Address*ExprMacro.java) ---
  /** Dotted-quad string → long (null if malformed). */
  def ipv4Parse(c: Column): Column = {
    val parts = split(c, "\\.")
    val ok = c.rlike("^((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])$")
    when(ok,
      element_at(parts, 1).cast("long") * 16777216L +
      element_at(parts, 2).cast("long") * 65536L +
      element_at(parts, 3).cast("long") * 256L +
      element_at(parts, 4).cast("long"))
  }
  /** long → dotted-quad string. */
  def ipv4Stringify(c: Column): Column = {
    val v = c.cast("long")
    concat_ws(".",
      ((v / 16777216L).cast("long") % 256).cast("string"),
      ((v / 65536L).cast("long") % 256).cast("string"),
      ((v / 256L).cast("long") % 256).cast("string"),
      (v % 256).cast("string"))
  }
  /** ipv4_match(addr, 'cidr/len'): addr (string or long) inside subnet.
    * Reference semantics (IPv4AddressMatchExprMacro +
    * IPv4AddressMatchExprMacroTest): a STRING argument matches only as a
    * dotted-quad — an unsigned-int string, an IPv6 form, or any other text
    * is FALSE (not null, :84-146,160-170); a LONG argument matches by
    * value. The SQL registration dispatches on the resolved input type. */
  def ipv4Match(addr: Column, cidr: String): Column =
    ipv4MatchOn(when(addr.cast("string").rlike("^\\d+\\.\\d+"), ipv4Parse(addr.cast("string")))
      .otherwise(addr.cast("long")), cidr)

  /** String-typed input: dotted-quad only. */
  def ipv4MatchString(addr: Column, cidr: String): Column =
    ipv4MatchOn(ipv4Parse(addr), cidr)

  /** Numeric input: the long value is the address. */
  def ipv4MatchLong(addr: Column, cidr: String): Column =
    ipv4MatchOn(addr.cast("long"), cidr)

  private def ipv4MatchOn(addrLong: Column, cidr: String): Column = {
    val Array(base, len) = cidr.split("/")
    val baseLong = base.split("\\.").map(_.toLong).reduce(_ * 256 + _)
    val bits = len.toInt
    val mask = if (bits == 0) 0L else (0xFFFFFFFFL << (32 - bits)) & 0xFFFFFFFFL
    // unparseable/null input evaluates FALSE like the reference macro's
    // ofLongBoolean(false), never null
    coalesce(addrLong.bitwiseAND(mask) === (baseLong & mask), lit(false))
  }

  // --- parse_long with radix (sql PARSE_LONG) ---
  def parseLong(c: Column, radix: Int = 10): Column =
    if (radix == 10) c.cast("long")
    else if (radix == 16) conv(regexp_replace(c, "^0[xX]", ""), 16, 10).cast("long")
    else conv(c, radix, 10).cast("long")

  // --- math gaps (most math fns are 1:1 Spark builtins) ---
  /** Java Math.scalb: x * 2^n. */
  def scalb(x: Column, n: Column): Column = x * pow(lit(2.0), n.cast("double"))

  /** Druid `round(x, n)` — Spark round is identical (HALF_UP). */
  def roundTo(x: Column, n: Int): Column = round(x, n)

  /** bucket extraction fn: floor((x - offset)/size)*size + offset. */
  def bucket(x: Column, size: Double, offset: Double = 0.0): Column =
    floor((x - offset) / size) * size + offset

  // --- lookup (LookupExprMacro.java): small-map enrichment ---
  /** lookup via literal map — compiles to element_at on a map literal
    * (broadcast to every task as part of the plan; fine for small maps).
    * For large lookups use Lookups.register + join (sources/Lookups.scala).
    */
  def lookupMap(c: Column, m: Map[String, String]): Column = {
    val entries = m.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    element_at(map(entries: _*), c)
  }
}

/** Math-expr truthiness in predicate position (Evals.java:60-73, 0.23
  * default mode): numerics are true when > 0, strings via
  * Boolean.parseBoolean, booleans pass through. RuntimeReplaceable: the
  * coercion resolves to plain comparisons once the operand type is known,
  * so boolean expressions stay exactly as they were (full codegen, no
  * wrapper at execution). */
case class DruidTruthyExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types._
  override lazy val replacement: Expression = child.dataType match {
    case BooleanType => child
    case _: NumericType => GreaterThan(child, Literal.default(child.dataType))
    case StringType => EqualTo(Lower(child), Literal("true"))
    case _ => Literal(false)
  }
  override protected def withNewChildInternal(c: Expression): DruidTruthyExpr =
    copy(child = c)
  override def prettyName: String = "druid_truthy"
}

/** Timestamp coercion for the time family's inputs: the math-expr dialect
  * carries time as epoch-MILLIS longs (every timestamp_* macro does
  * `expr.eval(...).asLong()` millis — TimestampFloorExprMacro etc.), while
  * this engine's native columns are TIMESTAMP. A LONG/INT input therefore
  * reads as MILLIS — Spark's bare long→timestamp cast would read SECONDS
  * and be off by 1000×. Timestamps, dates and parseable strings cast
  * through normally. */
case class DruidTimeInput(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types._
  // Casts carry an explicit session zone: a RuntimeReplaceable's
  // replacement must be fully resolved, and ResolveTimeZone does not look
  // inside it
  private def tzCast(e: Expression, to: DataType): Expression =
    Cast(e, to, Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
  override lazy val replacement: Expression = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => MillisToTimestamp(child)
    case _: DecimalType | DoubleType | FloatType =>
      MillisToTimestamp(tzCast(child, LongType))
    case _ => tzCast(child, TimestampType)
  }
  override protected def withNewChildInternal(c: Expression): DruidTimeInput =
    copy(child = c)
  override def prettyName: String = "druid_time_input"
}

/** The math-expr `^` power operator (BinaryMathOperatorExpr.java BinPowExpr
  * :204-226): LONG ^ LONG evaluates in INTEGER space — LongMath.pow wraps
  * mod 2^64 via repeated squaring, so `3037000499 ^ 2` is the exact long
  * 9223372030926249001, which double pow cannot represent — anything else
  * evaluates Math.pow as DOUBLE. Negative long exponents throw like guava's
  * precondition. */
case class MxPowExpr(left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  private def integral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }
  // lazy: children resolve after construction in FunctionRegistry builders
  private lazy val longPow: Boolean = integral(left.dataType) && integral(right.dataType)
  override def dataType: DataType = if (longPow) LongType else DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (longPow) {
      var base = a.asInstanceOf[Number].longValue()
      var k = b.asInstanceOf[Number].longValue()
      require(k >= 0, s"exponent ($k) must be >= 0")
      // overflow-wrapping repeated squaring (guava LongMath.pow semantics)
      var acc = 1L
      while (k > 0) {
        if ((k & 1L) == 1L) acc *= base
        base *= base
        k >>= 1
      }
      acc
    } else {
      def num(v: Any): Double = v match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString.toDouble
        case n: Number => n.doubleValue()
        case x => x.toString.toDouble
      }
      math.pow(num(a), num(b))
    }
  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): MxPowExpr =
    copy(left = l, right = r)
  override def prettyName: String = "druid_mx_pow"
}

/** BITWISE_CONVERT_DOUBLE_TO_LONG_BITS (Function.java BitwiseConvertDoubleToLongBits):
  * IEEE-754 bit pattern of the double as a long — no Spark builtin. */
case class DoubleToLongBits(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): DoubleToLongBits = copy(child = c)
  override def prettyName: String = "bitwise_convert_double_to_long_bits"
}

/** BITWISE_CONVERT_LONG_BITS_TO_DOUBLE: the inverse reinterpretation. */
case class LongBitsToDouble(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DoubleType
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Double.longBitsToDouble(v.asInstanceOf[Long])
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): LongBitsToDouble = copy(child = c)
  override def prettyName: String = "bitwise_convert_long_bits_to_double"
}
