package graft.functions

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Expression, LambdaFunction, UnresolvedNamedLambdaVariable}

/** Druid's "unapplied bindings" transformation for multi-value string
  * columns (reference: core/.../math/expr/Parser.java:207-241
  * applyUnappliedBindings + applyUnapplied + liftApplyLambda): a scalar
  * function over an identifier that is actually a multi-value column is
  * automatically mapped over the elements —
  *
  *   concat(tags, 'foo')            → map((t) -> concat(t, 'foo'), tags)
  *   concat(tags, othertags)        → cartesian_map((t, o) -> concat(t, o), tags, othertags)
  *   concat(tags, tags)             → map((t) -> concat(t, t), tags)   (same binding, no product)
  *   map((x) -> concat(x, other), tags)
  *                                  → cartesian_map((x, other) -> …, tags, other)
  *   array_to_string(concat('foo', tags), ',')
  *                                  → the lift lands on the ARRAY-SLOT
  *                                    argument, not the whole expression
  *
  * and an identifier used BOTH as a scalar and as an array in one
  * expression is rejected ("[tags] used as both scalar and array
  * variables" — MultiValuedDimensionTest testGroupByExpressionMultiConflicting).
  *
  * Spark-side realization: the transformation runs on the UNRESOLVED
  * parsed tree (post-MathExpr translation, where Druid apply fns are
  * already Spark higher-order calls), guided by the DataFrame schema's
  * ArrayType columns. The cartesian product spells as nested `transform`
  * calls flattened back to one level (first identifier varies slowest,
  * CartesianList order), and a fold whose lambda body holds an unapplied
  * identifier nests a shadowing inner `aggregate` (cartesian_fold). The
  * output is a plain Catalyst expression tree — fully analyzable, no new
  * runtime machinery.
  */
object MvAutoApply {

  /** Argument slots that consume ARRAYS, per Function.getArrayInputs
    * (Function.java:381-530 — ArrayScalarFunction one slot, ArraysFunction
    * both) and the Spark higher-order spellings MathExpr emits. */
  private val ArraySlots: Map[String, Set[Int]] = Map(
    // Spark HOFs (translated map/filter/any/all/fold) + flatten
    "transform" -> Set(0), "filter" -> Set(0), "exists" -> Set(0),
    "forall" -> Set(0), "aggregate" -> Set(0), "flatten" -> Set(0),
    "zip_with" -> Set(0, 1),
    // Druid array family (registered under their own names)
    "array_length" -> Set(0), "array_offset" -> Set(0), "array_ordinal" -> Set(0),
    "array_offset_of" -> Set(0), "array_ordinal_of" -> Set(0),
    "array_contains" -> Set(0, 1), "array_overlap" -> Set(0, 1),
    "array_append" -> Set(0), "array_prepend" -> Set(1),
    "array_concat" -> Set(0, 1), "array_slice" -> Set(0),
    "array_to_string" -> Set(0), "array_set_add" -> Set(0),
    "array_set_add_all" -> Set(0, 1),
    // Spark spellings the translator/foldInit emit, plus the SQL-layer MV
    // aliases (same functions in the reference dialect)
    "element_at" -> Set(0), "size" -> Set(0), "cardinality" -> Set(0),
    "array_join" -> Set(0), "slice" -> Set(0), "sort_array" -> Set(0),
    "array_sort" -> Set(0), "array_distinct" -> Set(0),
    "array_position" -> Set(0), "array_remove" -> Set(0),
    "array_max" -> Set(0), "array_min" -> Set(0),
    "arrays_overlap" -> Set(0, 1), "array_union" -> Set(0, 1),
    "array_except" -> Set(0, 1), "array_intersect" -> Set(0, 1),
    "mv_filter_only" -> Set(0), "mv_filter_none" -> Set(0),
    "mv_to_array" -> Set(0), "mv_length" -> Set(0), "mv_offset" -> Set(0),
    "mv_ordinal" -> Set(0), "mv_offset_of" -> Set(0), "mv_ordinal_of" -> Set(0),
    "mv_contains" -> Set(0, 1), "mv_overlap" -> Set(0, 1),
    "mv_append" -> Set(0), "mv_prepend" -> Set(1), "mv_concat" -> Set(0, 1),
    "mv_slice" -> Set(0), "mv_to_string" -> Set(0))

  /** Higher-order functions whose LAMBDA BODY gets unapplied identifiers
    * lifted into a cartesian (Parser.liftApplyLambda). */
  private val LiftableHofs = Set("transform", "aggregate")

  private def fnName(f: UnresolvedFunction): String =
    f.nameParts.last.toLowerCase(java.util.Locale.ENGLISH)

  /** A single-part column-reference name. Spark's parser marks EVERY bare
    * identifier inside a lambda body as a candidate lambda variable
    * (`lambda 'othertags`) and lets ResolveLambdaVariables demote the
    * unmatched ones back to attributes — so a column reference inside a
    * lambda arrives as UnresolvedNamedLambdaVariable, not
    * UnresolvedAttribute. Shadowing (a real lambda param of the same name)
    * is handled by the callers' shadow sets. */
  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute =>
      a.nameParts match { case Seq(n) => Some(n); case _ => None }
    case v: UnresolvedNamedLambdaVariable =>
      v.nameParts match { case Seq(n) => Some(n); case _ => None }
    case _ => None
  }

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)
  private def fresh(): String = s"__mv${counter.incrementAndGet()}"

  /** Entry point: returns the input tree unchanged (eq) when no lift is
    * needed. Throws IllegalArgumentException on scalar/array conflicts. */
  def lift(tree: Expression, arrayCols: Set[String]): Expression = {
    if (arrayCols.isEmpty) return tree
    val (scalarUses, arrayUses) = collectUses(tree, arrayCols)
    val conflicting = scalarUses intersect arrayUses
    if (conflicting.nonEmpty)
      throw new IllegalArgumentException(
        s"Invalid expression: [${conflicting.head}] used as both scalar and array variables")
    if (scalarUses.isEmpty) return tree
    liftTop(tree, Set.empty, arrayCols)
  }

  /** Shadow-aware usage scan: which array columns appear in scalar
    * position, which in array position. */
  private def collectUses(e: Expression, arrayCols: Set[String]): (Set[String], Set[String]) = {
    val scalar = scala.collection.mutable.Set.empty[String]
    val array = scala.collection.mutable.Set.empty[String]
    def walk(x: Expression, shadow: Set[String], inArraySlot: Boolean): Unit = x match {
      case f: UnresolvedFunction =>
        val slots = ArraySlots.getOrElse(fnName(f), Set.empty)
        f.arguments.zipWithIndex.foreach { case (arg, i) =>
          walk(arg, shadow, slots.contains(i))
        }
      case lf: LambdaFunction =>
        val params = lf.arguments.collect {
          case v: UnresolvedNamedLambdaVariable => v.nameParts.last
        }.toSet
        walk(lf.function, shadow ++ params, inArraySlot = false)
      case leaf if attrName(leaf).isDefined =>
        attrName(leaf).filter(n => arrayCols(n) && !shadow(n)).foreach { n =>
          if (inArraySlot) array += n else scalar += n
        }
      case other =>
        other.children.foreach(walk(_, shadow, inArraySlot = false))
    }
    walk(e, Set.empty, inArraySlot = false)
    (scalar.toSet, array.toSet)
  }

  /** Remaining unapplied identifiers: array columns in scalar position. */
  private def unapplied(e: Expression, shadow: Set[String], arrayCols: Set[String]): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    def walk(x: Expression, sh: Set[String], inArraySlot: Boolean): Unit = x match {
      case f: UnresolvedFunction =>
        val slots = ArraySlots.getOrElse(fnName(f), Set.empty)
        f.arguments.zipWithIndex.foreach { case (arg, i) => walk(arg, sh, slots.contains(i)) }
      case lf: LambdaFunction =>
        val params = lf.arguments.collect {
          case v: UnresolvedNamedLambdaVariable => v.nameParts.last
        }.toSet
        walk(lf.function, sh ++ params, inArraySlot = false)
      case leaf if attrName(leaf).isDefined =>
        attrName(leaf).filter(n => arrayCols(n) && !sh(n) && !inArraySlot).foreach(out += _)
      case other => other.children.foreach(walk(_, sh, inArraySlot = false))
    }
    walk(e, shadow, inArraySlot = false)
    out.toSeq
  }

  /** Replace unshadowed single-part attribute references to `id` with
    * `replacement` (used to turn a column reference into a lambda var). */
  private def subst(e: Expression, id: String, replacement: Expression): Expression = {
    def go(x: Expression, shadow: Set[String]): Expression = x match {
      case lf: LambdaFunction =>
        val params = lf.arguments.collect {
          case v: UnresolvedNamedLambdaVariable => v.nameParts.last
        }.toSet
        if (params(id)) lf
        else lf.copy(function = go(lf.function, shadow ++ params))
      case leaf if attrName(leaf).contains(id) && !shadow(id) => replacement
      case other => other.mapChildren(go(_, shadow))
    }
    go(e, Set.empty)
  }

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)
  private def lamVar(name: String) = UnresolvedNamedLambdaVariable(Seq(name))
  private def lambda(body: Expression, params: Seq[String]) =
    LambdaFunction(body, params.map(lamVar))

  /** `transform(id1, v1 -> transform(id2, v2 -> … body))` with the first
    * identifier varying SLOWEST (CartesianList order), flattened back to a
    * single level. `body` is the scalar expression with ids substituted. */
  private def cartesianMap(ids: Seq[String], body: Expression,
      vars: Seq[String]): Expression = {
    val nested = ids.zip(vars).foldRight(body) { case ((id, v), inner) =>
      fn("transform", UnresolvedAttribute(Seq(id)), lambda(inner, Seq(v)))
    }
    // k nested transforms produce k array levels; flatten back to one
    (1 until ids.size).foldLeft(nested)((e, _) => fn("flatten", e))
  }

  /** Full treatment of one expression: recursively process array-slot
    * arguments and liftable lambdas, then wrap any REMAINING unapplied
    * identifiers at this level in a (cartesian) map — the shape of
    * Parser.applyUnappliedBindings. */
  private def liftTop(e: Expression, shadow: Set[String], arrayCols: Set[String]): Expression = {
    val processed = process(e, shadow, arrayCols)
    val ids = unapplied(processed, shadow, arrayCols)
    if (ids.isEmpty) processed
    else {
      val vars = ids.map(_ => fresh())
      val body = ids.zip(vars).foldLeft(processed) { case (b, (id, v)) =>
        subst(b, id, lamVar(v))
      }
      cartesianMap(ids, body, vars)
    }
  }

  private def process(e: Expression, shadow: Set[String], arrayCols: Set[String]): Expression =
    e match {
      case f: UnresolvedFunction =>
        val name = fnName(f)
        val slots = ArraySlots.getOrElse(name, Set.empty)
        // liftable HOF with a lambda body holding unapplied identifiers →
        // cartesian lift into the lambda (Parser.liftApplyLambda)
        val hofLifted: Option[Expression] =
          if (LiftableHofs(name)) f.arguments.collectFirst {
            case lf: LambdaFunction => lf
          }.flatMap { lf =>
            val params = lf.arguments.collect {
              case v: UnresolvedNamedLambdaVariable => v.nameParts.last
            }
            val bodyIds = unapplied(lf.function, shadow ++ params.toSet, arrayCols)
            if (bodyIds.isEmpty) None
            else Some(liftHof(f, name, lf, params, bodyIds, shadow, arrayCols))
          } else None
        hofLifted.getOrElse {
          val newArgs = f.arguments.zipWithIndex.map { case (arg, i) =>
            arg match {
              case lf: LambdaFunction =>
                val params = lf.arguments.collect {
                  case v: UnresolvedNamedLambdaVariable => v.nameParts.last
                }.toSet
                lf.copy(function = process(lf.function, shadow ++ params, arrayCols))
              case a: UnresolvedAttribute => a
              case other if slots.contains(i) =>
                // a non-identifier expression in an ARRAY slot receives the
                // full lift (rewriteUnappliedSubExpressions' FunctionExpr
                // branch): array_to_string(concat('foo', tags), ',') lifts
                // the concat, not the whole call
                liftTop(other, shadow, arrayCols)
              case other => process(other, shadow, arrayCols)
            }
          }
          f.copy(arguments = newArgs)
        }
      case lf: LambdaFunction =>
        val params = lf.arguments.collect {
          case v: UnresolvedNamedLambdaVariable => v.nameParts.last
        }.toSet
        lf.copy(function = process(lf.function, shadow ++ params, arrayCols))
      case other => other.mapChildren(process(_, shadow, arrayCols))
    }

  /** Lift unapplied identifiers out of a transform/aggregate lambda body:
    *
    *   transform(arr, (x) -> body⟨y⟩)
    *     → flatten(transform(arr, (x) -> transform(y, (v) -> body⟨v⟩)))
    *   aggregate(arr, init, (acc, x) -> body⟨y⟩)
    *     → aggregate(arr, init, (acc, x) -> aggregate(y, acc, (acc, v) -> body⟨v⟩))
    *
    * — cartesian_map / cartesian_fold with the original array slowest
    * (liftApplyLambda appends the new identifiers after the existing
    * lambda args). The inner fold reuses the SAME accumulator name, so the
    * body's accumulator references bind to the innermost scope. */
  private def liftHof(f: UnresolvedFunction, name: String, lf: LambdaFunction,
      params: Seq[String], bodyIds: Seq[String], shadow: Set[String],
      arrayCols: Set[String]): Expression = {
    val processedBody = process(lf.function, shadow ++ params.toSet ++ bodyIds.toSet, arrayCols)
    val vars = bodyIds.map(_ => fresh())
    val substituted = bodyIds.zip(vars).foldLeft(processedBody) { case (b, (id, v)) =>
      subst(b, id, lamVar(v))
    }
    name match {
      case "transform" =>
        val inner = bodyIds.zip(vars).foldRight(substituted) { case ((id, v), b) =>
          fn("transform", UnresolvedAttribute(Seq(id)), lambda(b, Seq(v)))
        }
        val rebuilt = f.copy(arguments = f.arguments.map {
          case `lf` => lambda(inner, params)
          case a => a
        })
        bodyIds.indices.foldLeft(rebuilt: Expression)((x, _) => fn("flatten", x))
      case "aggregate" =>
        // params = (acc, x) in Spark argument order
        val acc = params.head
        val inner = bodyIds.zip(vars).foldRight(substituted) { case ((id, v), b) =>
          fn("aggregate", UnresolvedAttribute(Seq(id)), lamVar(acc), lambda(b, Seq(acc, v)))
        }
        f.copy(arguments = f.arguments.map {
          case `lf` => lambda(inner, params)
          case a => a
        })
      case other =>
        throw new IllegalStateException(s"liftHof on non-liftable $other")
    }
  }
}
