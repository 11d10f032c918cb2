package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial filter surface (reference: processing/.../query/filter/
  * SpatialDimFilter.java with rectangular / radius / polygon bounds over
  * spatial-indexed dimensions, processing/.../segment/column/SpatialIndex
  * .java R-tree).
  *
  * Spark-first: coordinates are plain numeric columns; the bounds compile to
  * range predicates (parquet min/max prunable — the stats-based analog of
  * the reference's R-tree) plus an exact distance/containment check.
  */
object SpatialFunctions {

  /** rectangular bound: point within [minX,maxX] × [minY,maxY]. */
  def withinRectangle(x: Column, y: Column,
      minX: Double, minY: Double, maxX: Double, maxY: Double): Column =
    x >= minX && x <= maxX && y >= minY && y <= maxY

  /** radius bound (euclidean, matching the reference's RadiusBound). The
    * bounding-box conjunct makes the predicate min/max-prunable; the circle
    * check is exact. */
  def withinRadius(x: Column, y: Column, cx: Double, cy: Double, r: Double): Column =
    withinRectangle(x, y, cx - r, cy - r, cx + r, cy + r) &&
      (x - cx) * (x - cx) + (y - cy) * (y - cy) <= r * r

  /** polygon bound: ray-casting point-in-polygon over literal vertices
    * (reference: PolygonBound). Pure column arithmetic, codegen-friendly. */
  def withinPolygon(x: Column, y: Column, abscissa: Seq[Double], ordinate: Seq[Double]): Column = {
    require(abscissa.size == ordinate.size && abscissa.size >= 3, "polygon needs >= 3 vertices")
    val n = abscissa.size
    // count edge crossings of a ray to +inf in x; odd → inside
    val crossings = (0 until n).map { i =>
      val j = (i + n - 1) % n
      val (xi, yi) = (abscissa(i), ordinate(i))
      val (xj, yj) = (abscissa(j), ordinate(j))
      when(((lit(yi) > y) =!= (lit(yj) > y)) &&
        (x < (lit(xj - xi) * (y - yi) / (yj - yi) + xi)), 1).otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  /** great-circle distance in km (haversine) for geo radius filters. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * 6371.0088) * asin(sqrt(a))
  }
}

/** Druid StringComparators (reference: core/.../java/util/common/guava/
  * StringComparators.java — lexicographic / alphanumeric / numeric /
  * version orderings used by bound filters and limit specs).
  * Implemented as sort-KEY expressions: orderBy(key) reproduces the
  * ordering with plain, codegen-friendly comparisons.
  */
object StringOrderings {
  import org.apache.spark.sql.graftbridge.CatalystBridge

  /** The BigDecimal-grammar parseable gate of the numeric comparator (sign,
    * digits, optional fraction, optional exponent — "Infinity"/"NaN" are NOT
    * parseable there). */
  private val NumericGrammar = "^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?$"

  /** numeric ordering (NumericComparator, StringComparators.java:358-404):
    * null first, then unparseable strings (ordered lexicographically among
    * themselves), then parseable numbers by value. The value field is a
    * double, a documented precision approximation of the reference's
    * BigDecimal beyond ~15 significant digits. */
  def numericKey(c: Column): Column = {
    val s = c.cast("string")
    val parseable = s.rlike(NumericGrammar)
    struct(
      when(parseable, lit(2)).otherwise(lit(1)).as("cls"),
      when(parseable, s.cast("double")).as("num"),
      when(!parseable, s).as("str"))
  }

  /** numericKey fast path for a column whose type is ALREADY numeric: every
    * value is parseable by construction, so the per-row
    * cast-to-string + BigDecimal-grammar RLIKE (up to 3 evaluations per row
    * in the bound-filter hot path) collapses to a plain double cast. Same
    * struct shape and ordering as [[numericKey]], so the two sides of a
    * comparison may mix (a numeric column against a string literal key). */
  def numericKeyNumericInput(c: Column,
      inputType: Option[org.apache.spark.sql.types.DataType] = None): Column = {
    // cls mirrors the slow path EXACTLY, null input included: numericKey's
    // `when(parseable, 2).otherwise(1)` routes NULL through the otherwise
    // branch to cls=1 (nulls group before unparseable strings and both
    // precede every number) — a plain lit(2) here would flip which side of
    // an upper bound a null row lands on.
    // A FLOAT column compares through its STRING form re-parsed (the
    // reference's selector renders Float.toString and the numeric
    // comparator BigDecimal-parses it): 10.1f keys as 10.1, not the
    // widened 10.100000381... — a direct double cast would exclude it from
    // a [10.1, ...] bound (BoundFilterTest numeric families over f0)
    val num = inputType match {
      case Some(org.apache.spark.sql.types.FloatType) => c.cast("string").cast("double")
      case _ => c.cast("double")
    }
    struct(when(c.isNotNull, lit(2)).otherwise(lit(1)).as("cls"),
      num.as("num"),
      lit(null).cast("string").as("str"))
  }

  /** numericKey of a driver-known string literal: parseability is decided at
    * plan-build time, no runtime regex at all. */
  def numericKeyLiteral(s: String): Column = {
    val parseable = s != null && s.matches(NumericGrammar)
    if (parseable)
      struct(lit(2).as("cls"), lit(s.toDouble).as("num"),
        lit(null).cast("string").as("str"))
    else
      struct(lit(1).as("cls"), lit(null).cast("double").as("num"),
        lit(s).as("str"))
  }

  /** version ordering (VersionComparator → maven DefaultArtifactVersion):
    * order-preserving byte key, see [[OrderingKeys.versionKey]]. */
  def versionKey(c: Column): Column =
    CatalystBridge.column(VersionOrderKey(CatalystBridge.expression(c.cast("string"))))

  /** alphanumeric ordering (AlphanumericComparator — the Alphanum
    * algorithm): order-preserving byte key, see
    * [[OrderingKeys.alphanumKey]]. */
  def alphanumericKey(c: Column): Column =
    CatalystBridge.column(AlphanumOrderKey(CatalystBridge.expression(c.cast("string"))))

  /** A named StringComparator as a sort key (StringComparators.java) —
    * orderBy(key(name, c)) reproduces the comparator's ordering.
    * `inputType` (when the caller knows the column's schema type) enables
    * the numeric fast path: a LONG/DOUBLE column never needs the
    * parseability regex. */
  def key(ordering: String, c: Column,
      inputType: Option[org.apache.spark.sql.types.DataType] = None): Column =
    ordering match {
      case "lexicographic" => c.cast("string")
      case "numeric" => inputType match {
        case Some(_: org.apache.spark.sql.types.NumericType) =>
          numericKeyNumericInput(c, inputType)
        case _ => numericKey(c)
      }
      case "alphanumeric" => alphanumericKey(c)
      case "version" => versionKey(c)
      // strlen comparator: shorter first, ties lexicographic
      case "strlen" => struct(length(c.cast("string")), c.cast("string"))
      case o => throw new IllegalArgumentException(s"unsupported string comparator: $o")
    }
}
