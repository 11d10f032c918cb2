package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Rollup-aware aggregate rewrite — the one genuinely custom optimizer piece
  * (SURVEY §4.1): Druid ingests with rollup=true so queries aggregate
  * pre-aggregated rows "for free"; here the same effect is an optimizer
  * `Rule[LogicalPlan]` that redirects eligible aggregates from the raw table
  * to a registered rollup table.
  *
  * Eligibility: the aggregate reads the registered base table directly (no
  * intervening filter/project that the rollup can't answer), groups only by
  * rollup dimensions, and every aggregate is derivable from rollup metrics:
  *   count(*)         → sum(countMetric)
  *   sum(x)           → sum(sum_x)
  *   min(x) / max(x)  → min(min_x) / max(max_x)
  *
  * The rewrite preserves the original output attribute ids (a Project of
  * aliases pinned to the old exprIds), so parent operators are untouched.
  *
  * At 100 TB this is the difference between scanning the raw corpus and
  * scanning a table that is orders of magnitude smaller; it composes with
  * time-partition pruning on the rollup's truncated time column.
  */
object RollupRewrite {

  /** metric name on the base table → (op, rollup column). op ∈ sum|min|max.
    * countColumn: rollup column holding the per-group row count. */
  final case class RollupDef(
      basePath: String,
      rollup: DataFrame,
      dimensions: Set[String],
      metricMap: Map[String, (String, String)],
      countColumn: String)

  /** Session-level registry (Druid: the coordinator knows which datasources
    * are rollup-materialized). */
  final class Catalog {
    private val defs = scala.collection.mutable.ArrayBuffer.empty[RollupDef]
    def register(d: RollupDef): Unit = defs synchronized { defs += d }
    def all: Seq[RollupDef] = defs synchronized { defs.toList }
  }

  final class RewriteRule(catalog: Catalog) extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(groups, aggExprs, child, _) =>
        catalog.all.view.flatMap { rd =>
          unwrap(child, rd).collect {
            case filters if rewritable(groups, aggExprs, rd) => rewrite(agg, rd, filters)
          }
        }.headOption.getOrElse(agg)
    }

    // compare normalized full paths (scheme-stripped), not a suffix match —
    // an unrelated table whose path shares the registered suffix must not
    // be redirected
    private def normPath(s: String): String =
      new org.apache.hadoop.fs.Path(s).toUri.getPath.stripSuffix("/")

    /** Peel attribute-only Projects and DIMENSION-only Filters off the
      * aggregate's child down to the registered base scan, collecting the
      * filter predicates to re-apply over the rollup. A `WHERE dim = x` (or
      * a range on the rollup's truncated time dimension) is the common
      * rollup query shape — the reference answers filtered queries from
      * rolled-up segments as a matter of course (GroupByStrategyV2); a
      * predicate touching any non-dimension column (raw time, metrics)
      * disqualifies the rewrite, since rollup rows can't answer it. */
    private def unwrap(plan: LogicalPlan, rd: RollupDef): Option[Seq[Expression]] =
      plan match {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
            if fs.location.rootPaths.exists(p => normPath(p.toString) == normPath(rd.basePath)) =>
          Some(Nil)
        // look through column pruning (attribute-only projections)
        case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
          unwrap(child, rd)
        case Filter(cond, child)
            if cond.deterministic &&
              cond.references.forall(a => rd.dimensions.contains(a.name)) =>
          unwrap(child, rd).map(cond +: _)
        case _ => None
      }

    private def rewritable(groups: Seq[Expression], aggExprs: Seq[NamedExpression],
        rd: RollupDef): Boolean = {
      val groupsOk = groups.forall {
        case a: AttributeReference => rd.dimensions.contains(a.name)
        case _ => false
      }
      val aggsOk = aggExprs.forall {
        case a: AttributeReference => rd.dimensions.contains(a.name)
        case Alias(AggregateExpression(f, Complete, false, None, _), _) => f match {
          case Count(Seq(Literal(1, _))) => true
          case Sum(a: AttributeReference, _) => rd.metricMap.get(a.name).exists(_._1 == "sum")
          case Min(a: AttributeReference) => rd.metricMap.get(a.name).exists(_._1 == "min")
          case Max(a: AttributeReference) => rd.metricMap.get(a.name).exists(_._1 == "max")
          case _ => false
        }
        case _ => false
      }
      groupsOk && aggsOk
    }

    private def rewrite(agg: Aggregate, rd: RollupDef,
        filters: Seq[Expression]): LogicalPlan = {
      val rollupPlan = rd.rollup.queryExecution.analyzed
      def rollupAttr(name: String): AttributeReference =
        rollupPlan.output.collectFirst {
          case a: AttributeReference if a.name == name => a
        }.getOrElse(throw new IllegalStateException(s"rollup table lacks column $name"))

      def aggExpr(f: AggregateFunction): AggregateExpression =
        AggregateExpression(f, Complete, isDistinct = false)

      // dimension filters re-apply verbatim over the rollup (one rollup row
      // per (time-bucket, dims) group, dims stored as ingested), remapped to
      // the rollup plan's attributes
      val newChild = filters.foldRight(rollupPlan: LogicalPlan) { (cond, p) =>
        Filter(cond.transform { case a: AttributeReference => rollupAttr(a.name) }, p)
      }

      val newGroups = agg.groupingExpressions.map {
        case a: AttributeReference => rollupAttr(a.name)
        case e => e
      }
      val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case a: AttributeReference =>
          Alias(rollupAttr(a.name), a.name)(exprId = a.exprId)
        case al @ Alias(AggregateExpression(f, _, _, _, _), name) =>
          val repl: Expression = f match {
            // count(*) is never NULL: a global (no GROUP BY) aggregate over
            // an empty rollup table must yield 0, but sum(cnt) yields NULL
            case Count(Seq(Literal(1, _))) =>
              Coalesce(Seq(aggExpr(Sum(rollupAttr(rd.countColumn))), Literal(0L)))
            case Sum(a: AttributeReference, _) => aggExpr(Sum(rollupAttr(rd.metricMap(a.name)._2)))
            case Min(a: AttributeReference) => aggExpr(Min(rollupAttr(rd.metricMap(a.name)._2)))
            case Max(a: AttributeReference) => aggExpr(Max(rollupAttr(rd.metricMap(a.name)._2)))
            case other => throw new IllegalStateException(s"unexpected agg $other")
          }
          Alias(repl, name)(exprId = al.exprId)
        case e => e
      }
      val rewritten = Aggregate(newGroups, newAggs.map(stripOuterAliasKeepId), newChild)
      // pin output schema: count(*) over rollup becomes sum(cnt) of LongType —
      // cast back where the rewritten type widened (sum(long) → long is fine;
      // sum over the count col stays long) via a no-op Project with old names
      Project(rewritten.output.zip(agg.output).map { case (n, o) =>
        if (n.exprId == o.exprId && n.dataType == o.dataType) n
        else Alias(Cast(n, o.dataType), o.name)(exprId = o.exprId)
      }, rewritten)
    }

    private def stripOuterAliasKeepId(e: NamedExpression): NamedExpression = e
  }

  /** Use with SparkSession.builder().withExtensions(...) for new sessions. */
  class Extensions extends (SparkSessionExtensions => Unit) {
    def apply(e: SparkSessionExtensions): Unit =
      e.injectOptimizerRule(_ => new RewriteRule(globalCatalog))
  }

  /** Shared catalog for extension-injected rules (extension instances are
    * constructed by Spark, so the catalog must be reachable statically). */
  lazy val globalCatalog = new Catalog

  /** Attach to an already-running session via experimental optimizations. */
  def enable(spark: SparkSession, catalog: Catalog = globalCatalog): Unit = {
    val experimental = spark.experimental
    if (!experimental.extraOptimizations.exists(_.isInstanceOf[RewriteRule]))
      experimental.extraOptimizations =
        experimental.extraOptimizations :+ new RewriteRule(catalog)
  }
}
