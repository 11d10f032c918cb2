package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.TimeFunctions

/** Typed Scala DSL mirroring the reference's native query types
  * (reference: processing/src/main/java/org/apache/druid/query/Query.java:55-75
  * — timeseries / topN / groupBy / scan / search / timeBoundary /
  * segmentMetadata / dataSourceMetadata).
  *
  * Spark-first: each builder *declares* a logical plan with the DataFrame API
  * and lets Catalyst + AQE pick the physical strategy. There is deliberately
  * no custom execution here — the reference's per-segment engines
  * (vectorized cursors, off-heap groupers, spilling, merge buffers) are all
  * subsumed by HashAggregateExec / Tungsten / whole-stage codegen.
  * At cluster scale, the scatter-gather+broker-merge of the reference becomes
  * shuffle-based partial→final aggregation, which removes the reference's
  * single-node broker merge bottleneck (whitepaper §"broker level").
  */

/** Dimension spec (reference: processing/.../query/dimension/DimensionSpec.java:41-45).
  * MultiValueDim reproduces the exploded-grouping semantic of MV string dims
  * (GroupByQueryEngineV2.java:603: one group per array element).
  */
sealed trait DimSpec {
  def output: String
  def col: Column
  def isMultiValue: Boolean = false
}
final case class Dim(name: String, outputName: String = null) extends DimSpec {
  def output: String = if (outputName == null) name else outputName
  // backtick names containing dots (e.g. join rightPrefix columns "r.p_brand")
  def col: Column = org.apache.spark.sql.functions.col(
    if (name.contains(".")) s"`$name`" else name)
}
/** extraction dimensionSpec / virtual column: any expression as a dimension. */
final case class ExprDim(expr: Column, output: String) extends DimSpec {
  def col: Column = expr
}
/** Multi-value string dimension: grouped rows are exploded, one group per
  * element (null-preserving via explode_outer, matching Druid's null row for
  * empty MV cells in sql-compatible mode).
  */
final case class MvDim(expr: Column, output: String) extends DimSpec {
  def col: Column = expr
  override def isMultiValue: Boolean = true
}
/** listFiltered dimensionSpec: only `allowed` values survive, rest of the row's
  * array is filtered before explode (DimensionSpec.java `listFiltered`).
  */
final case class ListFilteredDim(expr: Column, allowed: Seq[String], output: String) extends DimSpec {
  def col: Column = filter(expr, x => x.isin(allowed: _*))
  override def isMultiValue: Boolean = true
}
/** prefixFiltered dimensionSpec: only values with the prefix survive
  * (DimensionSpec.java:41-45 `prefixFiltered`). */
final case class PrefixFilteredDim(expr: Column, prefix: String, output: String) extends DimSpec {
  def col: Column = filter(expr, x => x.startsWith(prefix))
  override def isMultiValue: Boolean = true
}

/** Named aggregation — the DSL's AggregatorFactory equivalent; any Spark
  * aggregate Column (sum/min/max/count/min_by/approx_count_distinct/custom
  * Aggregator) works. `filtered` aggs use Column.filter via `aggFilter`.
  */
final case class Agg(name: String, column: Column) {
  def aliased: Column = column.as(name)
}
object Agg {
  /** FilteredAggregatorFactory (reference: query/aggregation/
    * FilteredAggregatorFactory.java) → conditional input: sum/min/max over
    * `when(pred, col)`, count via sum of when(pred,1). Codegen'd, no UDF.
    */
  def filteredSum(name: String, c: Column, pred: Column): Agg =
    Agg(name, sum(when(pred, c)))
  def filteredCount(name: String, pred: Column): Agg =
    Agg(name, sum(when(pred, 1L).otherwise(0L)))
}

/** Post-aggregator: expression over aggregate results, applied after .agg()
  * (reference: processing/.../query/aggregation/post). */
final case class PostAgg(name: String, column: Column)

/** first/last over rolled-up data (reference: query/aggregation/first/
  * LongFirstAggregatorFactory.java + SerializablePairLongString.java — a
  * rollup segment stores the metric as a (timestamp, value) PAIR, which
  * later queries re-fold instead of re-reading raw rows).
  *
  * Store `firstPair`/`lastPair` as the rollup metric (BatchIngest
  * RollupSpec aggregation); re-fold across any number of rollup levels
  * with `refoldFirst`/`refoldLast`; read the final value with
  * `firstValue`/`lastValue`. Ordering key is (time, value), so ties on
  * time resolve deterministically — required for exact oracle compares.
  */
object FirstLast {
  import graft.functions.FirstLastAgg
  // Hash-plannable pair folds (FirstLastFoldAgg → ObjectHashAggregateExec);
  // the earlier min_by/max_by spellings were immutable-buffer declarative
  // aggregates that forced SortAggregate on both shuffle sides.
  def firstPair(value: Column, time: Column): Column =
    FirstLastAgg.earliest(struct(time.as("t"), value.as("v")), struct(time, value))
  def lastPair(value: Column, time: Column): Column =
    FirstLastAgg.latest(struct(time.as("t"), value.as("v")), struct(time, value))
  /** Re-fold pair states from a rollup table (struct ordering = time-then-value). */
  def refoldFirst(pair: Column): Column = FirstLastAgg.earliest(pair, pair)
  def refoldLast(pair: Column): Column = FirstLastAgg.latest(pair, pair)
  def firstValue(pair: Column): Column = refoldFirst(pair).getField("v")
  def lastValue(pair: Column): Column = refoldLast(pair).getField("v")
}

/** Granularity for timeseries bucketing: ISO period + optional origin
  * (reference: PeriodGranularity). `All` = single bucket. */
sealed trait Granularity
case object AllGranularity extends Granularity
/** `none`: no truncation — every distinct timestamp is its own bucket
  * (NoneGranularity.java). Zero-fill never applies (the reference docs warn
  * against none+timeseries for exactly the millisecond-spine reason). */
case object NoneGranularity extends Granularity
final case class PeriodGranularity(period: String, origin: String = null,
    timeZone: String = null) extends Granularity {
  def bucket(ts: Column): Column = {
    val o = if (origin == null) null else lit(origin).cast("timestamp")
    // timestamp_ntz keeps parquet output type aligned with the tz-naive
    // source columns (session TZ is UTC, so the conversion is identity).
    // timeZone (PeriodGranularity.java `timeZone`) computes bucket
    // boundaries on that zone's wall clock.
    TimeFunctions.timeFloor(ts, period, o, timeZone).cast("timestamp_ntz")
  }
}
/** Fixed-millisecond bucketing (DurationGranularity.java:49-95): origin is
  * stored mod duration, bucketStart(t) = t - ((t % duration - origin) mod+
  * duration) — the exact reference arithmetic, negative dividends included.
  */
final case class DurationGranularity(durationMs: Long, originMs: Long = 0L)
    extends Granularity {
  require(durationMs > 0, "duration should be greater than 0!")
  private val originMod = originMs % durationMs // Java-% semantics, like the reference
  def bucket(ts: Column): Column = {
    val t = unix_millis(ts.cast("timestamp"))
    val off0 = t % durationMs - lit(originMod)
    val off = when(off0 < 0, off0 + durationMs).otherwise(off0)
    timestamp_millis(t - off).cast("timestamp_ntz")
  }
}

object QueryCommon {
  /** Internal column materializing an inlined subquery's merged-result row
    * order (NativeQuery's groupBy-subquery natural order) — first/last
    * aggregators fold on (timestamp, thisRank) so timestamp ties break
    * deterministically even after partial-aggregate merges re-order rows.
    * Never part of a query's output: full-column passthrough paths (scan
    * with no explicit columns) drop it. */
  val RowOrderCol = "__graft_row_order"

  /** True when the aggregation is a plain count — Druid's zero-filled empty
    * buckets carry the aggregator's initial value: 0 for count, null for
    * sums/min/max/first in sql-compatible null mode. */
  def isCountAgg(c: Column): Boolean =
    try org.apache.spark.sql.graftbridge.CatalystBridge.expression(c) match {
      // typed-API Columns convert to an UnresolvedFunction pre-analysis
      case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        uf.nameParts.last.equalsIgnoreCase("count")
      case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
        ae.aggregateFunction.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.Count]
      case _ => false
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Sketch-estimate aggregations (hyperUnique/cardinality/HLL estimates)
    * zero-fill to 0: the reference fills empty buckets with each
    * aggregator's nil, and an EMPTY sketch estimates 0.0 — unlike sums,
    * whose nil is null in sql-compatible mode. */
  def isSketchEstimateAgg(c: Column): Boolean =
    try org.apache.spark.sql.graftbridge.CatalystBridge.expression(c).exists {
      case _: graft.plans.ThetaEstimate => true
      case _: graft.plans.HllcUnionEstimate => true
      case _: graft.plans.HllEstimateExpr => true
      case _: graft.plans.DsHllEstimateExpr => true
      case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        uf.nameParts.last.equalsIgnoreCase("hll_sketch_estimate")
      case _ => false
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Explode MV dims (if any), then return (prepared df, groupable columns). */
  def prepareDims(df: DataFrame, dims: Seq[DimSpec]): (DataFrame, Seq[Column]) = {
    val withCols = dims.foldLeft(df) { (d, spec) =>
      if (spec.isMultiValue) d.withColumn(spec.output, explode_outer(spec.col))
      else d.withColumn(spec.output, spec.col)
    }
    (withCols, dims.map(s => col(s.output)))
  }
  def applyPostAggs(df: DataFrame, postAggs: Seq[PostAgg]): DataFrame =
    postAggs.foldLeft(df)((d, p) => d.withColumn(p.name, p.column))
}

/** timeseries query (reference: query/timeseries/TimeseriesQuery.java:52).
  * grandTotal context flag → an extra all-time row via rollup-style union.
  *
  * Empty buckets are zero-filled by default, matching the reference
  * (TimeseriesQueryEngine.java:131,210 — buckets are skipped only when the
  * `skipEmptyBuckets` context flag is set): every granularity bucket between
  * the first and last observed bucket (or spanning `fillIntervals` when the
  * query carries explicit intervals) emits a row, with count aggregators
  * filled as 0 and everything else null (sql-compatible null mode).
  */
final case class TimeseriesQuery(
    timeColumn: String = "__time",
    granularity: Granularity = PeriodGranularity("P1D"),
    filter: Column = null,
    aggregations: Seq[Agg] = Nil,
    postAggregations: Seq[PostAgg] = Nil,
    descending: Boolean = false,
    grandTotal: Boolean = false,
    limit: Option[Int] = None,
    skipEmptyBuckets: Boolean = false,
    fillIntervals: Seq[(String, String)] = Nil,
    // CTX_TIMESTAMP_RESULT_FIELD (TimeseriesQuery.java:54): materialize the
    // bucket timestamp as an extra LONG-millis result column, visible to
    // post-aggregators (testTimeseriesWithPostAggregatorReferencingTimestampResultField)
    timestampResultField: Option[String] = None) {

  /** The bucket spine for zero-fill: one row per granularity bucket. From
    * explicit intervals it is generated driver-free via the granularity's
    * `bucketSeq`; otherwise bounds come from an aggregate over the (already
    * small) grouped result — Catalyst reuses the aggregation exchange, so
    * the input is scanned once.
    *
    * `fixedStepMs` (set only for fixed-width UTC steps) enables the
    * fold guard: a long spine over LITERAL endpoints would constant-fold
    * `sequence(lit, lit)` into a plan-embedded literal array (PT1M × 3y ≈
    * 1.6M instants materialized on the driver), so past
    * [[TimeseriesQuery.SpineFoldThreshold]] buckets the spine is built from
    * `range()` arithmetic — rows, not plan literals.
    */
  private def zeroFill(grouped: DataFrame, source: DataFrame,
      bucketFn: Column => Column,
      bucketSeq: (Column, Column) => Column, fixedStepMs: Option[Long]): DataFrame = {
    val spine0 =
      if (fillIntervals.nonEmpty) {
        val rangeStep = fixedStepMs.filter { stepMs =>
          fillIntervals.exists { case (a, b) =>
            (for (am <- parseUtcMs(a); bm <- parseUtcMs(b))
              yield (bm - am) / stepMs > TimeseriesQuery.SpineFoldThreshold)
              .getOrElse(false)
          }
        }
        rangeStep match {
          case Some(stepMs) =>
            fillIntervals.map { case (a, b) =>
              val aMs = parseUtcMs(a).get
              val bMs = parseUtcMs(b).get
              // floor(a) + k*step enumerates the fixed-width buckets; +2
              // covers the floor slack, the filter trims past floor(b-1ms)
              val n = (bMs - 1 - aMs) / stepMs + 2
              val lastBucket = bucketFn(timestamp_millis(lit(bMs - 1)).cast("timestamp"))
              grouped.sparkSession.range(n)
                .select(bucketFn(timestamp_millis(lit(aMs) + col("id") * stepMs)
                  .cast("timestamp")).as(timeColumn))
                .where(col(timeColumn) <= lastBucket)
            }.reduce(_ union _).distinct()
          case None =>
            val seqs = fillIntervals.map { case (a, b) =>
              val lo = bucketFn(lit(a).cast("timestamp"))
              // buckets covering [a, b): floor(b - 1ms) is the last bucket
              val hi = bucketFn(timestamp_millis(unix_millis(lit(b).cast("timestamp")) - 1)
                .cast("timestamp"))
              bucketSeq(lo, hi)
            }
            grouped.sparkSession.range(1)
              .select(explode(flatten(array(seqs: _*))).as(timeColumn)).distinct()
        }
      } else
        grouped.agg(min(col(timeColumn)).as("lo"), max(col(timeColumn)).as("hi"))
          .where(col("lo").isNotNull) // empty input → nothing to fill
          .select(explode(bucketSeq(col("lo"), col("hi"))).as(timeColumn))
    // Interval spines clip to the UNFILTERED datasource's time bounds:
    // the reference zero-fills the query intervals only where SEGMENTS
    // exist (a 1970-2020 full-on interval over a 3-month table emits
    // 3 months of buckets — TimeseriesQueryRunnerTest.testFullOnTimeseries),
    // while a query FILTER does not shrink segment coverage, so sparse
    // filtered data still fills the whole covered interval. min/max over
    // the raw time column ride parquet footer stats (aggregatePushdown).
    val spine =
      if (fillIntervals.isEmpty) spine0
      else {
        val bounds = source
          .agg(bucketFn(min(col(timeColumn))).as("__fill_lo"),
            bucketFn(max(col(timeColumn))).as("__fill_hi"))
        spine0.crossJoin(broadcast(bounds))
          .where(col(timeColumn).between(col("__fill_lo"), col("__fill_hi")))
          .select(col(timeColumn))
      }
    val fills = aggregations.map { a =>
      if (QueryCommon.isCountAgg(a.column)) coalesce(col(a.name), lit(0L)).as(a.name)
      else if (QueryCommon.isSketchEstimateAgg(a.column))
        // the aggregator's nil is an EMPTY sketch whose estimate is 0.0
        // (hyperUnique/cardinality/HLL on the reference's zero-filled
        // buckets), unlike sums/min/max which are null-filled
        coalesce(col(a.name), lit(0).cast(grouped.schema(a.name).dataType)).as(a.name)
      else col(a.name)
    }
    spine.join(grouped, Seq(timeColumn), "left")
      .select(col(timeColumn) +: fills: _*)
  }

  /** An interval endpoint string as UTC epoch millis, when driver-parseable
    * (NativeQuery normalizes endpoints to `yyyy-MM-dd[ HH:mm[:ss[.SSS]]]`
    * UTC; DSL callers may pass anything `cast("timestamp")` accepts, in
    * which case the guard simply stays off). */
  private def parseUtcMs(s: String): Option[Long] =
    try {
      val t = s.trim.replace("T", " ")
      val padded =
        if (t.length == 10) t + " 00:00:00"
        else if (t.length == 16) t + ":00"
        else t
      Some(java.time.LocalDateTime.parse(padded.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    } catch { case scala.util.control.NonFatal(_) => None }

  def run(ds: DataFrame): DataFrame = {
    GraftSession.configure(ds.sparkSession)
    // a timeseries with NO aggregators still emits one row per bucket with
    // an empty value map (TimeseriesQueryRunnerTest.testTimeseriesNoAggregators)
    // — bucket on an internal count, dropped from the result
    if (aggregations.isEmpty)
      return copy(aggregations = Seq(Agg(TimeseriesQuery.InternalRows, count(lit(1)))))
        .run(ds).drop(TimeseriesQuery.InternalRows)
    val filtered = if (filter == null) ds else ds.filter(filter)
    val aggCols = aggregations.map(_.aliased)
    // bucket fn + zero-fill step per granularity kind; `none` buckets every
    // distinct timestamp and never zero-fills (a millisecond spine)
    def bucketedRun(bucketFn: Column => Column,
        spine: Option[((Column, Column) => Column, Option[Long])]): DataFrame = {
        val bucketed = filtered.withColumn("__bucket", bucketFn(col(timeColumn)))
        def fill(g: DataFrame): DataFrame = spine match {
          case Some((seqFn, fixedStepMs)) if !skipEmptyBuckets =>
            zeroFill(g, ds, bucketFn, seqFn, fixedStepMs)
          case _ => g
        }
        val withTotal = if (grandTotal) {
          // Druid emits one extra grand-total row (TimeseriesQuery.java:54
          // ctx key). r16: per-bucket rows and the total come from ONE
          // GROUPING SETS aggregate — ((__bucket), ()) — instead of a second
          // full aggregate over the scan, so the fact is read once.
          // r17: the r16 shape split that aggregate into three __gid-
          // filtered consumers (per-bucket branch, total branch, zero-fill
          // spine probe) and needed a lazy localCheckpoint barrier to stop
          // Catalyst pushing the filters through the Expand (the plan
          // otherwise re-split into 3 scans); the barrier's ExistingRDD
          // boundary cost ~+0.6 s locally (driver-measured r16 regression).
          // The aggregate now feeds exactly ONE consumer — zero-fill became
          // a per-gap window+explode over the (output-sized) aggregate
          // instead of a spine self-join — so no barrier, no checkpoint,
          // and no __gid filter ever pushes anywhere.
          val names = aggregations.map(_.name)
          val sets = bucketed
            .groupingSets(Seq(Seq(col("__bucket")), Seq()), col("__bucket"))
            .agg(aggCols.head, (aggCols.tail :+ grouping_id().as("__gid")): _*)
          val needFill = spine.isDefined && !skipEmptyBuckets
          val body = if (needFill && fillIntervals.isEmpty) {
            // gap-fill: between consecutive per-bucket rows, emit the
            // missing buckets of (prev, cur] via the granularity's own
            // bucket-sequence fn — the identical bucket set the old
            // seqFn(min, max) spine enumerated, with the identical fills
            // (count → 0, sketch estimate → empty-sketch 0, rest null).
            // Null buckets drop exactly as the spine join dropped them (a
            // null bucket never appeared in the spine). The window runs
            // over one row per bucket — output-scale, like the spine.
            val seqFn = spine.get._1
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col("__gid")).orderBy(col("__bucket"))
            val withPrev = sets
              .where(!(col("__gid") === 0 && col("__bucket").isNull))
              .withColumn("__prev", lag(col("__bucket"), 1).over(w))
            val gapSeq = when(col("__prev").isNull, array(col("__bucket")))
              .otherwise(seqFn(col("__prev"), col("__bucket")))
            val exploded = withPrev.select(
              explode(gapSeq).as("__b") +: col("__bucket") +: col("__prev") +:
                names.map(col): _*)
              .where(col("__prev").isNull || col("__b") > col("__prev"))
            val isReal = col("__b") <=> col("__bucket")
            val outAggs = aggregations.map { a =>
              if (QueryCommon.isCountAgg(a.column))
                when(isReal, col(a.name)).otherwise(lit(0L)).as(a.name)
              else if (QueryCommon.isSketchEstimateAgg(a.column))
                when(isReal, col(a.name))
                  .otherwise(lit(0).cast(sets.schema(a.name).dataType)).as(a.name)
              else when(isReal, col(a.name)).as(a.name)
            }
            exploded.select(col("__b").as(timeColumn) +: outAggs: _*)
          } else if (needFill) {
            // explicit fill intervals: the interval spine clips to the
            // UNFILTERED source's time bounds, which takes its own probe —
            // the r16 barrier shape stays for this (rarer) case.
            val ck = sets.localCheckpoint(false)
            val perBucket = fill(ck.filter(col("__gid") === 0)
              .select(col("__bucket").as(timeColumn) +: names.map(col): _*))
            val total = ck.filter(col("__gid") === 1)
              .select(col("__bucket").cast(perBucket.schema(timeColumn).dataType)
                .as(timeColumn) +: names.map(col): _*)
              .select(perBucket.columns.map(col): _*)
            perBucket.unionByName(total)
          } else {
            // no fill: every aggregate row IS a result row (per-bucket rows
            // plus the ()-set total, whose __bucket is already null)
            sets.select(col("__bucket").as(timeColumn) +: names.map(col): _*)
          }
          // The reference appends the grand-total row UNCONDITIONALLY — an
          // empty sequence still yields one totals row of aggregator nils
          // (TimeseriesQueryQueryToolChest.mergeResults) — while a
          // grouping-sets aggregate over zero input rows emits zero rows,
          // () set included. Restore the contract with a LITERAL nil row
          // (the same classification zeroFill applies to empty buckets:
          // count → 0, sketch estimate → empty-sketch 0, rest null — i.e.
          // the reference's aggregator nils), anti-joined against a limit-1
          // existence probe of the filtered input so it survives only when
          // the input is empty. Literals on a range(1), not an aggregate
          // over an empty relation, keep the fallback to two trivial plan
          // stages (probe + build) — no shuffle, no scan.
          val nilRow = aggregations.map { a =>
            val dt = sets.schema(a.name).dataType
            if (QueryCommon.isCountAgg(a.column)) lit(0L).cast(dt).as(a.name)
            else if (QueryCommon.isSketchEstimateAgg(a.column)) lit(0).cast(dt).as(a.name)
            else lit(null).cast(dt).as(a.name)
          }
          val emptyTotal = filtered.sparkSession.range(1)
            .select(lit(null).cast(body.schema(timeColumn).dataType)
              .as(timeColumn) +: nilRow: _*)
          val present = filtered.select(lit(1).as("__present")).limit(1)
          body.unionByName(emptyTotal.join(present, lit(true), "left_anti"))
        } else fill(bucketed.groupBy(col("__bucket").as(timeColumn))
          .agg(aggCols.head, aggCols.tail: _*))
        // order applied after the optional union; grand-total row sorts last
        val ordered = if (descending) withTotal.orderBy(col(timeColumn).desc_nulls_last)
                      else withTotal.orderBy(col(timeColumn).asc_nulls_last)
        // the timestamp result field materializes BEFORE post-aggs so a
        // fieldAccess post-agg can read the bucket millis
        val withTsField = timestampResultField.fold(ordered)(fname =>
          ordered.withColumn(fname, unix_millis(col(timeColumn).cast("timestamp"))))
        val out = QueryCommon.applyPostAggs(withTsField, postAggregations)
        limit.fold(out)(out.limit)
    }

    granularity match {
      case AllGranularity =>
        val base = filtered.agg(aggCols.head, aggCols.tail: _*)
        // ALL-granularity bucket timestamp = the first query interval's start
        val withTs = timestampResultField.fold(base)(fname =>
          base.withColumn(fname,
            fillIntervals.headOption.flatMap(iv => parseUtcMs(iv._1))
              .map(ms => lit(ms)).getOrElse(lit(null)).cast("long")))
        val out = QueryCommon.applyPostAggs(withTs, postAggregations)
        limit.fold(out)(out.limit)
      case g: PeriodGranularity =>
        val p = TimeFunctions.periodParts(g.period)
        if (p.months > 0 && (p.days > 0 || p.millis > 0)) {
          // COMPOUND periods (P1M2D): the spine must step ITERATIVELY from
          // each boundary — exactly CompoundPeriodFloor's walk — because
          // sequence() computes boundary k as lo + k·step (multiplied
          // calendar addition), which drifts once month-end clamping
          // compounds (P1M15D diverges at the 3rd boundary); a drifted
          // spine would DROP real buckets on the zero-fill join.
          val bridge = org.apache.spark.sql.graftbridge.CatalystBridge
          val zid = if (g.timeZone == null) "UTC" else g.timeZone
          val seqFn: (Column, Column) => Column = (lo, hi) =>
            transform(
              bridge.column(graft.functions.CompoundPeriodSpine(
                bridge.expression(unix_millis(lo.cast("timestamp"))),
                bridge.expression(unix_millis(hi.cast("timestamp"))),
                p.months, p.days, p.millis, zid)),
              ms => timestamp_millis(ms).cast("timestamp_ntz"))
          bucketedRun(g.bucket, Some((seqFn, None)))
        } else {
          // Zone-stepped spine ONLY for day-and-coarser periods: their
          // boundaries anchor to the zone's wall clock and shift at DST. Pure
          // SUB-DAY periods must keep the fixed UTC step — bucket instants
          // stay exactly period-spaced through a transition, and the
          // fall-back's REPEATED local hour yields two distinct buckets that
          // wall-clock stepping would visit only once.
          val step =
            if (p.months == 0)
              make_dt_interval(lit(0), lit(0), lit(0),
                lit((p.days * 86400000L + p.millis) / 1000.0))
            else
              make_ym_interval(lit(0), lit(p.months))
          val zoneStep =
            if (p.months > 0 || (p.days > 0 && p.millis == 0)) Option(g.timeZone) else None
          val seqFn: (Column, Column) => Column = zoneStep match {
            case None => (lo, hi) => sequence(lo, hi, step)
            case Some(z) => (lo, hi) =>
              // Under an explicit zone, bucket boundaries shift with DST (a
              // fixed-interval UTC sequence would drift an hour past a
              // transition: LA month buckets are ...-07:00 then ...-08:00 —
              // QueryGranularityTest.testIterableMonth), so the spine steps
              // in the zone's WALL CLOCK and converts each bucket back.
              transform(
                sequence(from_utc_timestamp(lo.cast("timestamp"), z),
                  from_utc_timestamp(hi.cast("timestamp"), z), step),
                x => to_utc_timestamp(x, z).cast("timestamp_ntz"))
          }
          val fixedStepMs =
            if (p.months == 0 && zoneStep.isEmpty)
              Some(p.days * 86400000L + p.millis)
            else None
          bucketedRun(g.bucket, Some((seqFn, fixedStepMs)))
        }
      case g: DurationGranularity =>
        val step = make_dt_interval(lit(0), lit(0), lit(0), lit(g.durationMs / 1000.0))
        bucketedRun(g.bucket,
          Some(((lo: Column, hi: Column) => sequence(lo, hi, step), Some(g.durationMs))))
      case NoneGranularity =>
        bucketedRun(ts => ts.cast("timestamp_ntz"), None)
    }
  }
}

object TimeseriesQuery {
  /** Explicit-interval spines larger than this build from `range()` rows
    * instead of a (constant-foldable) `sequence(lit, lit)` — past it the
    * folded literal array bloats the plan on the driver. */
  val SpineFoldThreshold: Long = 8192L

  /** Internal grouping aggregator for aggregator-less timeseries queries. */
  val InternalRows = "__internal_rows"
}

/** topN (reference: query/topn/TopNQuery.java:50). Exact semantics: Druid's
  * per-segment-K + merge is approximate; we compute the exact top-K, which is
  * Druid's documented exact mode. Catalyst plans this as partial agg →
  * shuffle → final agg → TakeOrderedAndProject: per-partition top-K then a
  * driver-side K-merge, i.e. the same two-level pattern, but lossless.
  */
final case class TopNQuery(
    dimension: DimSpec,
    metric: String,
    threshold: Int,
    filter: Column = null,
    aggregations: Seq[Agg] = Nil,
    postAggregations: Seq[PostAgg] = Nil,
    ascending: Boolean = false,
    // dimension metric spec (reference: query/topn/DimensionTopNMetricSpec
    // .java): rank by a sort KEY over the dimension value (lexicographic /
    // alphanumeric / version / numeric via StringOrderings) instead of a
    // metric. When set, `metric` is ignored for ordering.
    sortKey: Option[Column] = None,
    // previousStop pagination (TopNMetricSpecBuilder.skipTo / the dimension
    // metric specs' "previousStop"): only dimension values strictly AFTER
    // the stop under the spec's ordering participate. Applied pre-agg so
    // skipped pages never aggregate.
    stopFilter: Option[Column] = None,
    // Finalization (sketch → estimate) applied BEFORE the metric sort: the
    // reference's sketch comparators order on finalized estimates
    // (SketchAggregatorFactory.getComparator), so sorting raw binary sketch
    // bytes would rank garbage. NativeQuery passes its aggFinalizers here.
    finalizeFn: DataFrame => DataFrame = identity,
    // non-ALL granularity ranks top-K PER TIME BUCKET (the reference emits
    // one TopNResultValue per granularity bucket —
    // TopNQueryRunnerTest.testTopNOverFirstLastAggregator's MONTH ranking);
    // buckets with no rows are skipped, topN never zero-fills
    granularity: Granularity = AllGranularity,
    timeColumn: String = "__time") {

  def run(ds: DataFrame): DataFrame = {
    GraftSession.configure(ds.sparkSession)
    val filtered = if (filter == null) ds else ds.filter(filter)
    val bucketFn: Option[Column => Column] = granularity match {
      case AllGranularity => None
      case NoneGranularity => Some(t => t.cast("timestamp_ntz"))
      case g: PeriodGranularity => Some(g.bucket)
      case g: DurationGranularity => Some(g.bucket)
    }
    // bucket into a DISTINCT internal column so time-extraction dimensions
    // and aggregators reading the time column (e.g. longMax over __time)
    // still see the RAW row timestamp under non-ALL granularity — the
    // reference's selectors read raw __time; only grouping uses the bucket
    // (same shape as TimeseriesQuery's __bucket column)
    val bucketCol = "__graft_topn_bucket"
    val bucketed = bucketFn.fold(filtered)(b =>
      filtered.withColumn(bucketCol, b(col(timeColumn))))
    val (prepared0, dimCols0) = QueryCommon.prepareDims(bucketed, Seq(dimension))
    val prepared = stopFilter.fold(prepared0)(prepared0.filter)
    val dimCols = if (bucketFn.isEmpty) dimCols0 else col(bucketCol) +: dimCols0
    // an aggregator-less topN ranks the distinct dimension values under the
    // dimension metric spec (TopNQueryRunnerTest.testSortOnDoubleAsLong) —
    // a dummy agg keeps the groupBy shape and is dropped after
    val (aggCols, dummyAgg) = aggregations match {
      case Nil => (Seq(count(lit(1)).as("__graft_dummy_agg")), true)
      case as => (as.map(_.aliased), false)
    }
    // metric ties break by the dimension ascending with NULL FIRST
    // (TopNNumericResultBuilder.DIM_VALUE_COMPARATOR: null < everything —
    // TopNQueryRunnerTest.testTopNWithNullProducingDimExtractionFn ranks the
    // null group before 'upfront' on a 4-4 rows tie)
    val dimOrd = col(dimension.output).asc_nulls_first
    // Two-phase "aggregate the topN metric first"
    // (AggregateTopNMetricFirstAlgorithm.java:47): with a WIDE aggregator
    // list, aggregate ONLY the ranking metric, rank-limit to the K surviving
    // dimension values, broadcast-semi-join the survivors back onto the
    // scan, and compute the remaining aggregators over just those groups —
    // heavy per-group state (sketches, first/last pairs) is never built for
    // groups the rank would discard. Gated on aggregator count (the second
    // scan only pays for itself when the saved aggregate state is wide) and
    // on the rank metric being one of the aggregators (not a dimension
    // ordering or a post-agg). Null-safe (<=>) keys keep a null dimension
    // group rankable.
    val twoPhaseMin = ds.sparkSession.conf
      .get("spark.graft.topn.aggregateMetricFirstThreshold", "6").toInt
    val rankAggOpt = aggregations.find(_.name == metric)
    val aggInput =
      if (sortKey.isEmpty && rankAggOpt.isDefined &&
          aggregations.size >= twoPhaseMin) {
        val p1 = finalizeFn(
          prepared.groupBy(dimCols: _*).agg(rankAggOpt.get.aliased))
        val p1ord = if (ascending) col(metric).asc else col(metric).desc
        val survivorRows = bucketFn match {
          case None => p1.orderBy(p1ord, dimOrd).limit(threshold)
          case Some(_) =>
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col(bucketCol)).orderBy(p1ord, dimOrd)
            p1.withColumn("__topn_rank", row_number().over(w))
              .where(col("__topn_rank") <= threshold)
        }
        val keyNames = (if (bucketFn.isEmpty) Nil else Seq(bucketCol)) :+
          dimension.output
        // survivor keys renamed to avoid self-join lineage ambiguity
        val survivors = broadcast(survivorRows.select(
          keyNames.zipWithIndex.map { case (n, i) =>
            col(n).as(s"__graft_surv_$i") }: _*))
        prepared.join(survivors,
          keyNames.zipWithIndex.map { case (n, i) =>
            col(n) <=> col(s"__graft_surv_$i") }.reduce(_ && _),
          "left_semi")
      } else prepared
    val agged0 = aggInput.groupBy(dimCols: _*).agg(aggCols.head, aggCols.tail: _*)
    val agged = if (dummyAgg) agged0.drop("__graft_dummy_agg") else agged0
    val post = finalizeFn(QueryCommon.applyPostAggs(agged, postAggregations))
    val key = sortKey.getOrElse(col(metric))
    val ord = if (ascending) key.asc else key.desc
    bucketFn match {
      case None => post.orderBy(ord, dimOrd).limit(threshold)
      case Some(_) =>
        // per-bucket K: rank within each bucket, keep ≤ threshold — the
        // window shuffle repartitions on the (already aggregated, small)
        // bucket key; globally ordered by bucket then rank. The bucket is
        // renamed to the time column only in the output projection.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(bucketCol)).orderBy(ord, dimOrd)
        post.withColumn("__topn_rank", row_number().over(w))
          .where(col("__topn_rank") <= threshold)
          .orderBy(col(bucketCol).asc, col("__topn_rank").asc)
          .drop("__topn_rank")
          .withColumnRenamed(bucketCol, timeColumn)
    }
  }
}

/** limitSpec (reference: query/groupby/orderby/DefaultLimitSpec.java:71). */
final case class LimitSpec(orderBy: Seq[Column] = Nil, limit: Option[Int] = None, offset: Int = 0)

/** groupBy (reference: query/groupby/GroupByQuery.java:91). having = filter on
  * aggregated rows; subtotalsSpec → GROUPING SETS (strategy/GroupByStrategyV2
  * .java:464 processSubtotalsSpec) — here a single shuffle-free-reuse pass via
  * Spark's native grouping sets rather than Druid's re-aggregation of the
  * base result.
  */
final case class GroupByQuery(
    dimensions: Seq[DimSpec],
    filter: Column = null,
    aggregations: Seq[Agg] = Nil,
    postAggregations: Seq[PostAgg] = Nil,
    having: Column = null,
    limitSpec: LimitSpec = LimitSpec(),
    subtotalsSpec: Seq[Seq[String]] = null,
    // bucket column exposed to `having` as an epoch-millis `__time` column
    // (DimFilterHavingSpec filters can name __time — the ResultRow carries
    // the bucket timestamp as a long; GroupByQueryRunnerTest
    // .testDimFilterHavingSpec selects on its millis string)
    havingTimeBucket: Option[String] = None) {

  def run(ds: DataFrame): DataFrame = {
    GraftSession.configure(ds.sparkSession)
    val filtered = if (filter == null) ds else ds.filter(filter)
    val (prepared, dimCols) = QueryCommon.prepareDims(filtered, dimensions)
    // aggregator-less groupBy is legal (the reference's SQL planner emits
    // dimensions-only GroupByQuerys for DISTINCT subqueries); a dummy agg
    // keeps the single groupBy/groupingSets shape and is dropped after
    val (aggCols, dummyAgg) = aggregations match {
      case Nil => (Seq(count(lit(1)).as("__graft_dummy_agg")), true)
      case as => (as.map(_.aliased), false)
    }
    val agged0 =
      if (subtotalsSpec == null) {
        if (dimCols.isEmpty) prepared.agg(aggCols.head, aggCols.tail: _*)
        else prepared.groupBy(dimCols: _*).agg(aggCols.head, aggCols.tail: _*)
      } else {
        // subtotalsSpec → native GROUPING SETS (single pass; Druid instead
        // re-aggregates the base result per subtotal set,
        // GroupByStrategyV2.processSubtotalsSpec).
        val sets = subtotalsSpec.map(_.map(n => col(n)))
        prepared.groupingSets(sets, dimCols: _*).agg(aggCols.head, aggCols.tail: _*)
      }
    val agged = if (dummyAgg) agged0.drop("__graft_dummy_agg") else agged0
    // having evaluates AFTER post-aggregation — a having spec can name a
    // post-aggregated column (GroupByQueryQueryToolChest post-processing
    // order; GroupByQueryRunnerTest.testPostAggHavingSpec pins it)
    val post0 = QueryCommon.applyPostAggs(agged, postAggregations)
    val post = if (having == null) post0 else {
      val withTime = havingTimeBucket.fold(post0)(b =>
        post0.withColumn("__time", unix_millis(col(b).cast("timestamp"))))
      havingTimeBucket.fold(withTime.filter(having))(_ =>
        withTime.filter(having).drop("__time"))
    }
    val ordered = if (limitSpec.orderBy.nonEmpty) post.orderBy(limitSpec.orderBy: _*) else post
    val offsetted = if (limitSpec.offset > 0) ordered.offset(limitSpec.offset) else ordered
    limitSpec.limit.fold(offsetted)(offsetted.limit)
  }

}

/** scan (reference: query/scan/ScanQuery.java:52): raw rows, projection,
  * filter, order by time ASC/DESC or generalized per-column `orderBy`
  * (ScanQuery.OrderBy, ScanQuery.java:184,566-591), limit+offset.
  *
  * `order` and `orderBy` reconcile exactly like the reference's
  * verifyAndReconcileOrdering: a lone `orderBy` on `timeColumn` IS the time
  * order; specifying both with incompatible directions is an error. The
  * reference's native engine refuses to EXECUTE non-time orderBys
  * (verifyOrderByForNativeExecution, ScanQuery.java:256-261 — only its SQL
  * layer sorts them); here Spark's distributed sort runs them directly
  * (TakeOrderedAndProject when a limit is present), a documented superset.
  */
final case class ScanQuery(
    columns: Seq[String] = Nil,
    filter: Column = null,
    timeColumn: String = "__time",
    order: Option[Boolean] = None, // Some(true)=ASC, Some(false)=DESC, None=no order
    limit: Option[Int] = None,
    offset: Int = 0,
    // generalized ordering: (columnName, ascending) pairs; wins over `order`
    orderBy: Seq[(String, Boolean)] = Nil,
    // deterministic pagination: Druid breaks time ties by segment/row order,
    // which has no distributed analog — callers needing stable offset/limit
    // boundaries pass unique tiebreak columns appended to the ordering
    tiebreakers: Seq[Column] = Nil) {

  /** Effective ordering after reconciling `order` with `orderBy`
    * (ScanQuery.java:566-591). */
  private def effectiveOrderBys: Seq[(String, Boolean)] =
    if (orderBy.nonEmpty) orderBy
    else order.map(asc => Seq(timeColumn -> asc)).getOrElse(Nil)

  /** ASCENDING/DESCENDING iff the ordering is exactly the time column
    * (computeTimeOrderFromOrderBys, ScanQuery.java:601-612). */
  def timeOrder: Option[Boolean] = effectiveOrderBys match {
    case Seq((c, asc)) if c == timeColumn => Some(asc)
    case _ => None
  }

  def run(ds: DataFrame): DataFrame = {
    GraftSession.configure(ds.sparkSession)
    val obs = effectiveOrderBys
    // both kinds given and the orderBy is not that exact time order → IAE
    // (ScanQuery.java:586-589)
    if (order.isDefined && orderBy.nonEmpty && timeOrder != order)
      throw new IllegalArgumentException("Cannot provide 'order' incompatible with 'orderBy'")
    // orderBy columns must be selected (ScanQuery.java:231-244)
    if (columns.nonEmpty) obs.foreach { case (c, _) =>
      if (!columns.contains(c)) {
        if (orderBy.nonEmpty)
          throw new IllegalArgumentException(
            s"Column [$c] from 'orderBy' must also appear in 'columns'.")
        else
          throw new IllegalArgumentException(
            "The __time column must be selected if the results are time-ordered.")
      }
    }
    val filtered = if (filter == null) ds else ds.filter(filter)
    // a selected column ABSENT from the datasource reads as NULL — Druid's
    // schema-on-read missing column (ScanQueryRunnerTest
    // .testFullSelectNoDimensionAndMetric selects two bogus columns and
    // still gets every row)
    def sel(c: String): Column =
      if (ds.columns.contains(c)) col(c) else lit(null).cast("string").as(c)
    val projected =
      if (columns.isEmpty) filtered.drop(QueryCommon.RowOrderCol)
      else filtered.select(columns.map(sel): _*)
    val ordered =
      if (obs.isEmpty) projected
      else {
        val lastAsc = obs.last._2
        // time-ordered scans break timestamp ties in SEGMENT ROW ORDER
        // (ascending) / reverse row order (descending) — the reference's
        // per-segment cursor order. The per-partition monotonic id is the
        // distributed analog (nondeterministic exprs can't sit in a sort
        // key, so it materializes as a column first); explicit
        // `tiebreakers` still win.
        val autoTie = tiebreakers.isEmpty && timeOrder.isDefined
        val base =
          if (autoTie) projected.withColumn("__scan_tie", monotonically_increasing_id())
          else projected
        val tieCols: Seq[Column] =
          if (autoTie) Seq(col("__scan_tie")) else tiebreakers
        val keys = obs.map { case (c, asc) => if (asc) col(c).asc else col(c).desc } ++
          tieCols.map(t => if (lastAsc) t.asc else t.desc)
        base.orderBy(keys: _*).drop("__scan_tie")
      }
    val off = if (offset > 0) ordered.offset(offset) else ordered
    limit.fold(off)(off.limit)
  }
}

/** search (reference: query/search/SearchQuery.java:42): find dimension VALUES
  * matching a predicate across a set of dimensions. Implemented as an unpivot
  * (stack) → filter → distinct-count, fully parallel (the reference walks
  * per-segment indexes; a shuffle agg is the scale-out equivalent).
  */
final case class SearchQuery(
    searchDimensions: Seq[String],
    matcher: Column => Column, // e.g. _.contains("foo") | insensitive variants
    filter: Column = null,
    limit: Option[Int] = None,
    // SearchSortSpec (query/search/SearchSortSpec.java): hits order by VALUE
    // under a StringComparator — lexicographic (default) / alphanumeric /
    // strlen / numeric / version — with dimension as the lexicographic tiebreak
    sort: String = "lexicographic",
    // per-dimension value-column overrides (an ARRAY<STRING> of the row's
    // searchable values) — how extraction/typed dimension SPECS search
    // (SearchQueryRunnerTest.testSearchOnTime's timeFormat extraction);
    // names absent here read the schema column directly
    dimColumns: Map[String, Column] = Map.empty) {

  def run(ds: DataFrame): DataFrame = {
    GraftSession.configure(ds.sparkSession)
    // no searchable dimensions (every requested dimension was missing from
    // the datasource) → an empty hit set, not an analysis error
    if (searchDimensions.isEmpty)
      return ds.select(lit("").as("dimension"), lit("").as("value"),
        lit(0L).as("count")).limit(0)
    val filtered = if (filter == null) ds else ds.filter(filter)
    // a multi-value dimension searches per ELEMENT (the reference's search
    // cursors iterate each row value — SURVEY §1.4); scalars cast to string
    def values(d: String): Column = dimColumns.getOrElse(d, ds.schema(d).dataType match {
      case _: org.apache.spark.sql.types.ArrayType =>
        transform(col(d), _.cast("string"))
      case _ => array(col(d).cast("string"))
    })
    val pairs = searchDimensions.flatMap(d => Seq(lit(d), values(d)))
    val unpivoted = filtered
      .select(explode(map(pairs: _*)).as(Seq("dimension", "values")))
      .select(col("dimension"), explode(col("values")).as("value"))
    val matched = unpivoted.filter(matcher(col("value")))
    val counted = matched.groupBy("dimension", "value").agg(count(lit(1)).as("count"))
      .orderBy(graft.functions.StringOrderings.key(sort, col("value")), col("dimension"))
    limit.fold(counted)(counted.limit)
  }
}

/** Timewarp post-processing (reference: processing/.../query/
  * TimewarpOperator.java): evaluate a query over a window shifted into the
  * past and re-map its timestamps into the present — the "overlay last
  * week's curve on today's dashboard" operator.
  */
object Timewarp {
  import graft.functions.TimeFunctions
  /** Shift the query's time filter back by `period`×`steps`, run `query`,
    * then shift result timestamps forward again. */
  def apply(ds: DataFrame, timeColumn: String, period: String, steps: Int)(
      query: DataFrame => DataFrame): DataFrame = {
    val shiftedInput = ds.withColumn(timeColumn,
      TimeFunctions.timeShift(col(timeColumn), period, steps)
        .cast(ds.schema(timeColumn).dataType))
    query(shiftedInput)
  }

  /** The reference's periodic offset (TimewarpOperator.computeOffset,
    * TimewarpOperator.java:151-169): map instant `t` into the LAST whole
    * `periodMillis` period ending inside the data interval, phase-aligned to
    * `originMillis` (e.g. a Monday for week periods), with a DST correction
    * so wall-clock alignment survives an offset change between t and its
    * warped image. Returns the millis to ADD to t. */
  def computeOffset(t: Long, dataIntervalEndMillis: Long, periodMillis: Long,
      originMillis: Long, tz: java.time.ZoneId): Long = {
    var start = dataIntervalEndMillis - periodMillis
    var startOffset = start % periodMillis - originMillis % periodMillis
    if (startOffset < 0) startOffset += periodMillis
    start -= startOffset
    var tOffset = t % periodMillis - originMillis % periodMillis
    if (tOffset < 0) tOffset += periodMillis
    tOffset += start
    val rules = tz.getRules
    def zoneOff(x: Long): Long =
      rules.getOffset(java.time.Instant.ofEpochMilli(x)).getTotalSeconds * 1000L
    tOffset - t - (zoneOff(tOffset) - zoneOff(t))
  }

  /** Periodic overlay: replay the aligned past period as if it were the
    * present — input timestamps shift forward by the inverse of
    * computeOffset(now), so present-frame filters and result timestamps
    * apply unchanged (the reference's postProcess maps the query interval
    * into the past and result timestamps back; shifting the DATA forward is
    * the same composition on one relation). */
  def overlay(ds: DataFrame, timeColumn: String, dataIntervalEndMillis: Long,
      periodMillis: Long, originMillis: Long, nowMillis: Long,
      tz: java.time.ZoneId = java.time.ZoneOffset.UTC)(
      query: DataFrame => DataFrame): DataFrame = {
    val offset = computeOffset(nowMillis, dataIntervalEndMillis, periodMillis,
      originMillis, tz)
    val shifted = ds.withColumn(timeColumn,
      timestamp_millis(unix_millis(col(timeColumn).cast("timestamp")) - offset)
        .cast(ds.schema(timeColumn).dataType))
    query(shifted)
  }
}

/** timeBoundary (reference: query/timeboundary/TimeBoundaryQuery.java:46). */
final case class TimeBoundaryQuery(
    timeColumn: String = "__time",
    filter: Column = null,
    bound: Option[String] = None) { // Some("minTime")/Some("maxTime")

  def run(ds: DataFrame): DataFrame = {
    GraftSession.configure(ds.sparkSession)
    val filtered = if (filter == null) ds else ds.filter(filter)
    // a filter matching NOTHING yields an empty result, not a null row
    // (TimeBoundaryQueryRunnerTest.testFilteredTimeBoundaryQueryNoMatches)
    bound match {
      case Some("minTime") => filtered.agg(min(col(timeColumn)).as("minTime"))
        .where(col("minTime").isNotNull)
      case Some("maxTime") => filtered.agg(max(col(timeColumn)).as("maxTime"))
        .where(col("maxTime").isNotNull)
      case _ => filtered.agg(min(col(timeColumn)).as("minTime"),
          max(col(timeColumn)).as("maxTime"))
        .where(col("minTime").isNotNull)
    }
  }
}

/** dataSourceMetadata (reference: query/datasourcemetadata/DataSourceMetadataQuery.java:43). */
final case class DataSourceMetadataQuery(timeColumn: String = "__time") {
  def run(ds: DataFrame): DataFrame = {
    GraftSession.configure(ds.sparkSession)
    ds.agg(max(col(timeColumn)).as("maxIngestedEventTime"))
  }
}

/** segmentMetadata (reference: query/metadata/metadata/SegmentMetadataQuery.java:46):
  * per-column analysis. `exact=true` (the default surface) reproduces the
  * reference's exact bitmap-index cardinalities; `exact=false` (the
  * "approximate" analysis flag on the JSON route) is the single-scan scale
  * mode — every column's analyses in ONE Aggregate over ONE FileScan with
  * approx_count_distinct cardinalities.
  *
  * analysisTypes (reference AnalysisType enum, SegmentMetadataQuery.java:50):
  *  - "cardinality", "nulls" — always-on base analysis (r2 behavior)
  *  - "minmax"   — per-column min/max (as strings; the time column's pair
  *                 is the reference's INTERVAL analysis)
  *  - "size"     — estimated byte size: Σ length(string rendering), the
  *                 same estimation idea as the reference's serialized-size
  *                 analysis
  * AGGREGATORS/ROLLUP/TIMESTAMPSPEC analyses describe the ingestion spec,
  * not the data — they live in the ingest/rollup registries, not here.
  */
final case class SegmentMetadataQuery(exact: Boolean = false,
    analysisTypes: Set[String] = Set("cardinality", "nulls"),
    // spec-describing analyses (AGGREGATORS / ROLLUP / TIMESTAMPSPEC /
    // QUERYGRANULARITY, SegmentMetadataQuery.java:50) are served from the
    // ingest spec that produced the table (BatchIngest.specOf)
    ingestSpec: Option[graft.sources.BatchIngest.IngestSpec] = None) {
  def run(ds0: DataFrame): DataFrame = {
    GraftSession.configure(ds0.sparkSession)
    val ds = ds0.drop(QueryCommon.RowOrderCol)
    val analysisNames = Seq("cardinality", "nullCount") ++
      (if (analysisTypes("minmax")) Seq("minValue", "maxValue") else Nil) ++
      (if (analysisTypes("size")) Seq("size_bytes") else Nil)
    val cols = if (exact) {
      // EXACT mode: one aggregate per column, unioned — NOT one aggregate
      // with N exact distincts: multiple count_distinct in one Aggregate
      // makes Catalyst Expand the input N× (one replica per distinct), an
      // N-fold row blowup at scale. Per-column branches read the same total
      // bytes (each scan prunes to its own column) and each runs a plain
      // two-phase distinct aggregate; the single-value numRows aggregate
      // broadcasts onto every branch row.
      val numRows = ds.groupBy().agg(count(lit(1)).as("numRows"))
      val branches = ds.schema.fields.toSeq.map { f =>
        val c = col(f.name)
        val base = Seq(
          count_distinct(c).as("cardinality"),
          sum(when(c.isNull, 1L).otherwise(0L)).as("nullCount"))
        val mm = if (analysisTypes("minmax"))
          Seq(min(c).cast("string").as("minValue"), max(c).cast("string").as("maxValue")) else Nil
        val sz = if (analysisTypes("size"))
          Seq(sum(length(c.cast("string")).cast("long")).as("size_bytes")) else Nil
        val aggs = base ++ mm ++ sz
        ds.select(c).agg(aggs.head, aggs.tail: _*)
          .select(lit(f.name).as("column") +:
            lit(f.dataType.simpleString).as("type") +: analysisNames.map(col): _*)
      }
      branches.reduce(_.unionByName(_)).crossJoin(broadcast(numRows))
    } else {
      // APPROXIMATE mode (the 100 TB path): ONE scan, ONE Aggregate holding
      // every column's analyses side by side — approx_count_distinct is a
      // plain declarative aggregate (HLL++ buffer per column), so N of them
      // plan WITHOUT the Expand replication that N exact distincts force.
      // The single result row pivots to per-column rows with inline() over
      // a struct array — a one-row driver-free reshape.
      val fields = ds.schema.fields.toSeq
      val aggCols: Seq[Column] = fields.zipWithIndex.flatMap { case (f, i) =>
        val c = col(f.name)
        Seq(
          // r17: DataSketches HLL at lgK 14 (~0.8% RSE — the tight-
          // cardinality intent of r16's rsd-1% HLL++, which this replaces).
          // HLL++ at rsd 1% allocated 2^14 registers as ~2.7k FIXED-WIDTH
          // BUFFER FIELDS per column; four columns pushed the aggregate
          // past spark.sql.codegen.maxFields, so the ENTIRE analysis ran
          // interpreted (profiled: 2.3-3.0 s for the HLLs alone, 12 µs/row,
          // and the 1.4-1.9 s run-to-run variance VERDICT item 7 flagged).
          // hll_sketch_agg keeps ONE binary buffer per column, codegen
          // stays on for every other analysis, and the update path is the
          // sketch library's own: profiled 1.45 -> 0.33 s for the full
          // single-pass analysis. Values stay within the single-pass
          // spec's pinned 5%-of-exact tolerance (exact at tiny n: the
          // sketch is lossless in sparse mode).
          hll_sketch_estimate(hll_sketch_agg(c.cast("string"), lit(14)))
            .cast("long").as(s"__c${i}_card"),
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"__c${i}_nulls")) ++
        (if (analysisTypes("minmax"))
          Seq(min(c).cast("string").as(s"__c${i}_min"),
            max(c).cast("string").as(s"__c${i}_max")) else Nil) ++
        (if (analysisTypes("size"))
          Seq(sum(length(c.cast("string")).cast("long")).as(s"__c${i}_size")) else Nil)
      } :+ count(lit(1)).as("numRows")
      val one = ds.agg(aggCols.head, aggCols.tail: _*)
      val structs = array(fields.zipWithIndex.map { case (f, i) =>
        struct(
          lit(f.name).as("column") +:
          lit(f.dataType.simpleString).as("type") +:
          (Seq(col(s"__c${i}_card").as("cardinality"),
            coalesce(col(s"__c${i}_nulls"), lit(0L)).as("nullCount")) ++
          (if (analysisTypes("minmax"))
            Seq(col(s"__c${i}_min").as("minValue"),
              col(s"__c${i}_max").as("maxValue")) else Nil) ++
          (if (analysisTypes("size"))
            Seq(col(s"__c${i}_size").as("size_bytes")) else Nil)): _*)
      }: _*)
      one.select(inline(structs), col("numRows"))
    }
    val sorted = cols.orderBy("column")
    // table-level spec analyses repeat on every row (the reference reports
    // them once per segment alongside the per-column map)
    val withAggs =
      if (!analysisTypes("aggregators")) sorted
      else sorted.withColumn("aggregators", lit(ingestSpec.flatMap(_.rollup)
        .map(_.aggregations.map(a => s"${a.name}=${a.column.toString}").mkString(";"))
        .orNull))
    val withRollup =
      if (!analysisTypes("rollup")) withAggs
      else withAggs.withColumn("rollup", lit(ingestSpec.map(_.rollup.isDefined).orNull))
    val withGran =
      if (!analysisTypes("queryGranularity")) withRollup
      else withRollup.withColumn("queryGranularity",
        lit(ingestSpec.flatMap(_.rollup).map(_.granularity.period).orNull))
    if (!analysisTypes("timestampSpec")) withGran
    else withGran.withColumn("timestampSpec", lit(ingestSpec.map(_.timeColumn).orNull))
  }
}
