package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Unroll higher-order array functions over FIXED-LENGTH literal arrays
  * into scalar expression trees.
  *
  * Spark evaluates `transform`/`filter`/`exists`/`forall`/`aggregate`
  * lambdas INTERPRETED — every one is a codegen boundary, and the math-expr
  * apply-fn dialect (reference: math-expr.md "apply functions";
  * `fold((x, acc) -> acc + x, map(...), 0)`) compiles straight to them. The
  * dominant native shape is a chain over a LITERAL array constructor
  * (`["l_linenumber", "l_orderkey" % 10, 3]` — a CreateArray of known
  * length), where the whole chain is expressible as plain scalar
  * conditionals: `fold(f, map(g, filter(p, [a,b,c])), z)` becomes three
  * nested `If(p(e), f(acc, g(e)), acc)` steps — fully codegen-able, no
  * per-row lambda interpretation, no array materialization.
  *
  * Soundness per element (verified against the interpreted path in
  * HofUnrollSpec, nulls included):
  *  - filter keeps elements whose predicate is TRUE (null drops) → the
  *    fused `If(pred, step, acc)` treats a null predicate as false;
  *  - exists follows 3VL (any true → true, else any null → null, else
  *    false) → an Or-chain IS 3VL Or; the legacy non-3VL flag coalesces
  *    each term to false;
  *  - forall is the And-chain dual;
  *  - aggregate folds sequentially left-to-right → literal unroll order.
  *
  * Bails (keeps the interpreted form) on: non-literal arrays, arrays
  * longer than [[HofUnroll.MaxElems]], index-taking lambdas below a filter
  * (the index depends on survivors), nondeterministic lambdas, and
  * unrolled trees past [[HofUnroll.MaxNodes]] nodes (acc duplication
  * blow-up guard).
  */
object HofUnroll {

  val MaxElems = 10
  val MaxNodes = 2000

  final class UnrollRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      // stacked virtual columns put the literal array in a CHILD Project
      // (`array(...) AS arr` below `aggregate(...arr...) AS folded`) and
      // CollapseProject keeps them apart because `arr` is referenced
      // multiple times — inline the array alias into the HOF tree, and if
      // the HOFs then unroll away, merge the two Projects (the unrolled
      // scalars are cheap to duplicate)
      val merged = plan.transformUp {
        case p @ Project(upper, Project(lower, child)) =>
          tryMergeUnroll(upper, lower, child).getOrElse(p)
      }
      merged.transformAllExpressions {
        case e: HigherOrderFunction => rewrite(e)
      }
    }

    private def noHof(e: Expression): Boolean =
      !e.exists(_.isInstanceOf[HigherOrderFunction])

    private def tryMergeUnroll(upper: Seq[NamedExpression],
        lower: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
      val arrays = lower.collect {
        case al @ Alias(ca @ CreateArray(es, _), _) if es.size <= MaxElems =>
          al.exprId -> ca
      }.toMap
      if (arrays.isEmpty) return None
      var changed = false
      val newUpper = upper.map { ne =>
        ne.transformUp {
          case h: HigherOrderFunction if !noHof(h) =>
            val subbed = h.transformUp {
              case a: AttributeReference if arrays.contains(a.exprId) => arrays(a.exprId)
            }
            val un = rewrite(subbed)
            if (noHof(un)) { changed = true; un } else h
        }.asInstanceOf[NamedExpression]
      }
      if (!changed) return None
      // CollapseProject-style inline of every remaining lower alias the
      // rewritten upper still references, then drop the lower Project (the
      // substituted CreateArray references CHILD columns, so the lower
      // Project cannot simply stay). Inlining a NONDETERMINISTIC alias
      // would re-evaluate it once per upper reference — bail instead (the
      // HOF stays interpreted, which is only a performance loss).
      val aliasMap = lower.collect { case al: Alias => al.exprId -> al.child }.toMap
      val stillReferenced = newUpper.flatMap(_.collect {
        case a: AttributeReference if aliasMap.contains(a.exprId) => a.exprId
      })
      if (stillReferenced.exists(id => !aliasMap(id).deterministic)) return None
      val mergedUpper = newUpper.map(_.transformUp {
        case a: AttributeReference if aliasMap.contains(a.exprId) => aliasMap(a.exprId)
      }.asInstanceOf[NamedExpression])
      Some(Project(mergedUpper, child))
    }

    /** Bottom-up: inner HOFs first, so chains collapse in one pass. */
    private def rewrite(e: Expression): Expression = {
      val w = e.mapChildren(rewrite)
      w match {
        case t @ ArrayTransform(arr, lf: LambdaFunction) if lf.deterministic =>
          elemsOf(arr) match {
            case Some(elems) if elems.forall(_._2.isEmpty) =>
              // pure transform over a literal array stays an array
              val mapped = elems.zipWithIndex.map { case ((el, _), i) =>
                inline(lf, el, i)
              }
              if (mapped.forall(_.isDefined)) sized(t, CreateArray(mapped.map(_.get)))
              else t
            case _ => t
          }
        case agg @ ArrayAggregate(arr, zero, merge: LambdaFunction, finish: LambdaFunction)
            if merge.deterministic && finish.deterministic =>
          elemsOf(arr) match {
            case Some(elems) =>
              val acc = elems.foldLeft(Option(zero)) {
                case (Some(a), (el, pred)) =>
                  inline2(merge, a, el).map(step =>
                    pred.fold(step)(p => If(p, step, a)))
                case (None, _) => None
              }
              (for (a <- acc; fin <- inline(finish, a, 0)) yield sized(agg, fin))
                .getOrElse(agg)
            case None => agg
          }
        case ex @ ArrayExists(arr, lf: LambdaFunction, _) if lf.deterministic =>
          elemsOf(arr) match {
            case Some(elems) =>
              val terms = elems.map { case (el, pred) =>
                inline(lf, el, 0).map { q0 =>
                  val q = if (ex.followThreeValuedLogic) q0
                          else Coalesce(Seq(q0, Literal(false)))
                  pred.fold(q)(p => If(p, q, Literal(false)))
                }
              }
              if (terms.forall(_.isDefined))
                sized(ex, terms.map(_.get)
                  .foldLeft(Literal(false): Expression)((a, b) => Or(a, b)))
              else ex
            case None => ex
          }
        case fa @ ArrayForAll(arr, lf: LambdaFunction) if lf.deterministic =>
          elemsOf(arr) match {
            case Some(elems) =>
              val terms = elems.map { case (el, pred) =>
                inline(lf, el, 0).map(q =>
                  pred.fold(q)(p => If(p, q, Literal(true))))
              }
              if (terms.forall(_.isDefined))
                sized(fa, terms.map(_.get)
                  .foldLeft(Literal(true): Expression)((a, b) => And(a, b)))
              else fa
            case None => fa
          }
        // MathExpr.foldInit's type-WIDENING zero — `coalesce(element_at(
        // chain, 1) * 0, 0)` — is identically the zero literal for INTEGRAL
        // element types (never for floating point: NaN * 0 = NaN), which
        // frees a fold's zero operand of its embedded HOF chain
        case c @ Coalesce(Seq(Multiply(_, z1 @ Literal(_, _), _), z2 @ Literal(_, _)))
            if isIntegralZero(z1) && isIntegralZero(z2) &&
              (c.dataType match {
                case org.apache.spark.sql.types.ByteType |
                     org.apache.spark.sql.types.ShortType |
                     org.apache.spark.sql.types.IntegerType |
                     org.apache.spark.sql.types.LongType => true
                case _ => false
              }) =>
          z2
        case other => other
      }
    }

    private def isIntegralZero(l: Literal): Boolean = l.value match {
      case 0L | 0 => true
      case b: Byte => b == 0
      case sh: Short => sh == 0
      case _ => false
    }

    /** Literal-length element list with accumulated per-element keep
      * predicates: CreateArray directly; filter composes a predicate;
      * transform maps the element (1-arg lambdas only once a predicate is
      * in play — a survivor INDEX is not static). */
    private def elemsOf(arr: Expression): Option[Seq[(Expression, Option[Expression])]] =
      arr match {
        case CreateArray(es, _) if es.size <= MaxElems => Some(es.map((_, None)))
        // ConstantFolding turns an all-literal CreateArray into a Literal
        // array (the empty `array()` included)
        case Literal(data: org.apache.spark.sql.catalyst.util.ArrayData,
            org.apache.spark.sql.types.ArrayType(et, _)) if data.numElements <= MaxElems =>
          Some((0 until data.numElements).map(i => (Literal(data.get(i, et), et), None)))
        case ArrayFilter(inner, lf: LambdaFunction)
            if lf.deterministic && lf.arguments.size == 1 =>
          elemsOf(inner).flatMap { elems =>
            val out = elems.map { case (el, pred) =>
              inline(lf, el, 0).map { p =>
                (el, Some(pred.fold(p)(p0 => And(p0, p))))
              }
            }
            if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
          }
        case ArrayTransform(inner, lf: LambdaFunction) if lf.deterministic =>
          elemsOf(inner).flatMap { elems =>
            if (lf.arguments.size == 2 && elems.exists(_._2.nonEmpty)) None
            else {
              val out = elems.zipWithIndex.map { case ((el, pred), i) =>
                inline(lf, el, i).map((_, pred))
              }
              if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
            }
          }
        case _ => None
      }

    /** Substitute a 1-arg (element) or 2-arg (element, index) lambda. */
    private def inline(lf: LambdaFunction, el: Expression, idx: Int): Option[Expression] =
      lf.arguments.map(_.asInstanceOf[NamedLambdaVariable]) match {
        case Seq(x) => Some(subst(lf.function, Map(x.exprId -> el)))
        case Seq(x, i) => Some(subst(lf.function, Map(x.exprId -> el, i.exprId -> Literal(idx))))
        case _ => None
      }

    /** Substitute a 2-arg (acc, element) merge lambda. */
    private def inline2(lf: LambdaFunction, acc: Expression, el: Expression): Option[Expression] =
      lf.arguments.map(_.asInstanceOf[NamedLambdaVariable]) match {
        case Seq(a, x) => Some(subst(lf.function, Map(a.exprId -> acc, x.exprId -> el)))
        case _ => None
      }

    private def subst(body: Expression, m: Map[ExprId, Expression]): Expression =
      body.transformUp {
        case v: NamedLambdaVariable if m.contains(v.exprId) => m(v.exprId)
      }

    /** Node-count guard: a merge body referencing acc k times duplicates the
      * accumulated tree k-fold per element. */
    private def sized(orig: Expression, candidate: Expression): Expression = {
      var n = 0
      candidate.foreach(_ => n += 1)
      if (n <= MaxNodes) candidate else orig
    }
  }

  /** Idempotent per-session attach (the native query path calls this). */
  def enable(spark: SparkSession): Unit = {
    val experimental = spark.experimental
    if (!experimental.extraOptimizations.exists(_.isInstanceOf[UnrollRule]))
      experimental.extraOptimizations =
        experimental.extraOptimizations :+ new UnrollRule
  }
}
