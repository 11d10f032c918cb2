package graft.functions

import org.apache.spark.sql.Column

/** Minimal Druid math-expr → Spark SQL translator (reference: core/src/main/
  * java/org/apache/druid/math/expr/Parser.java — the ANTLR expression
  * dialect used by JSON `virtualColumns`, `expression` filters/aggregators
  * and post-aggregators).
  *
  * The two dialects are already near-identical at the token level; the real
  * deltas handled here are:
  *  - double-quoted identifiers (`"__time"`) → backquoted (Spark parses
  *    double quotes as string literals);
  *  - logical operators `&&` / `||` / `!` → `AND` / `OR` / `NOT`
  *    (math-expr `||` is OR, Spark's is string concat);
  *  - `^` (math-expr power) has XOR semantics in Spark SQL → rejected
  *    loudly rather than silently wrong; use `pow(a, b)`;
  *  - array literals `[1, 2, 3]` → `array(1, 2, 3)`, typed empties
  *    `<LONG>[]` / `<DOUBLE>[]` / `<STRING>[]` → typed empty-array casts
  *    (Parser.java array literal productions);
  *  - functions whose math-expr semantics differ from the SQL-layer name
  *    (Function.java vs the SQL operator table) rename to dialect-specific
  *    registrations: `strpos` (0-based, -1 absent — the SQL STRPOS is
  *    1-based), `substring` (0-based with negative-length = rest — SQL
  *    SUBSTRING is 1-based), `cast` (function-style with Druid type-name
  *    strings), `strlen` (Spark spells it length).
  *
  * Remaining function names need no rewriting: GraftSqlFunctions registers
  * the Druid names (timestamp_floor/ceil/shift/extract/parse/format,
  * case_searched, case_simple, lookup, the MV_ and array families,
  * array_set_add/array_set_add_all; nvl/if/isnull/notnull/div are Spark
  * builtins), so a Druid expression string parses as-is after this pass.
  */
object MathExpr {

  /** math-expr name → this engine's registration, applied only in call
    * position (identifier directly before a `(`). */
  private val FnRenames = Map(
    "strlen" -> "length",
    "strpos" -> "druid_mx_strpos",
    "substring" -> "druid_mx_substring",
    "cast" -> "druid_mx_cast")

  private val TypedEmpty = Map(
    "<LONG>[]" -> "CAST(array() AS ARRAY<BIGINT>)",
    "<DOUBLE>[]" -> "CAST(array() AS ARRAY<DOUBLE>)",
    "<STRING>[]" -> "CAST(array() AS ARRAY<STRING>)")

  def toSparkSql(e: String): String = {
    val sb = new StringBuilder(e.length + 16)
    var i = 0
    var inSingle = false
    var inDouble = false
    def isIdentStart(c: Char) = c.isLetter || c == '_'
    def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < e.length) {
      val ch = e.charAt(i)
      if (inSingle) {
        sb.append(ch); if (ch == '\'') inSingle = false; i += 1
      } else if (inDouble) {
        if (ch == '"') { sb.append('`'); inDouble = false } else sb.append(ch)
        i += 1
      } else ch match {
        case '\'' => inSingle = true; sb.append(ch); i += 1
        case '"' => inDouble = true; sb.append('`'); i += 1
        case '&' if i + 1 < e.length && e.charAt(i + 1) == '&' => sb.append(" AND "); i += 2
        case '|' if i + 1 < e.length && e.charAt(i + 1) == '|' => sb.append(" OR "); i += 2
        case '!' if i + 1 < e.length && e.charAt(i + 1) == '=' => sb.append("!="); i += 2
        case '!' => sb.append(" NOT "); i += 1
        case '^' => throw new IllegalArgumentException(
          "math-expr '^' (power) is XOR in Spark SQL; write pow(a, b) instead")
        case '<' if TypedEmpty.keys.exists(k => e.regionMatches(i, k, 0, k.length)) =>
          val k = TypedEmpty.keys.find(k => e.regionMatches(i, k, 0, k.length)).get
          sb.append(TypedEmpty(k)); i += k.length
        case '[' => sb.append("array("); i += 1
        case ']' => sb.append(')'); i += 1
        case c if isIdentStart(c) =>
          val start = i
          while (i < e.length && isIdentChar(e.charAt(i))) i += 1
          val ident = e.substring(start, i)
          var j = i
          while (j < e.length && e.charAt(j) == ' ') j += 1
          val isCall = j < e.length && e.charAt(j) == '('
          sb.append(if (isCall) FnRenames.getOrElse(ident, ident) else ident)
        case c => sb.append(c); i += 1
      }
    }
    if (inSingle || inDouble)
      throw new IllegalArgumentException(s"unterminated quote in expression: $e")
    sb.toString
  }

  /** Compile a Druid math-expr string to a Column. The session must have
    * GraftSqlFunctions registered for the Druid-named functions to resolve.
    */
  def expr(e: String): Column = org.apache.spark.sql.functions.expr(toSparkSql(e))
}

/** ExpressionLambdaAggregatorFactory lifecycle (reference: processing/.../
  * aggregation/ExpressionLambdaAggregatorFactory.java:103-125 — JSON fields
  * `fields`, `accumulatorIdentifier` (default "__acc"), `initialValue`,
  * `fold`, `combine`, `finalize`, all math-expr strings).
  *
  * Spark-first compilation: the per-row fold becomes a higher-order
  * `aggregate(collect_list(struct(fields)), init, (acc, row) -> fold)` —
  * the fold/finalize math-expr strings are parsed by [[MathExpr]] and their
  * identifier references substituted at the Catalyst level (accumulator id →
  * the lambda's acc variable, field names → row-struct extraction).
  * `combine` is accepted but not separately executed: folding the complete
  * collected list is equivalent whenever (initialValue, fold, combine) form
  * the fold monoid the reference requires of this aggregator.
  */
object ExpressionLambda {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BindReferences, Expression}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graftbridge.CatalystBridge
  import org.apache.spark.sql.types.{DataType, StructType}

  private def substitute(template: Column, binds: Map[String, Column]): Column =
    CatalystBridge.column(CatalystBridge.expression(template).transformUp {
      case ua: UnresolvedAttribute if ua.nameParts.length == 1 && binds.contains(ua.nameParts.head) =>
        CatalystBridge.expression(binds(ua.nameParts.head))
    })

  /** Type the initial accumulator like the reference's math-expr literals:
    * integral text is a Druid LONG, decimal text a DOUBLE; anything else
    * (e.g. `hyper_unique()`) is compiled as-is. */
  private def initColumn(init: String): Column = {
    val t = init.trim
    if (t.matches("-?\\d+")) MathExpr.expr(t).cast("long")
    else if (t.matches("-?\\d*\\.\\d+([eE]-?\\d+)?")) MathExpr.expr(t).cast("double")
    else MathExpr.expr(t)
  }

  /** Compile the factory to the BOUNDED incremental aggregator
    * ([[ExprLambdaFoldAgg]]): the fold body runs once per input row against
    * a scalar accumulator, partials merge via `combine`, and the buffer is
    * capped at `maxSizeBytes` — the reference lifecycle
    * (ExpressionLambdaAggregatorFactory.java:103-125, buffer cap :68,193).
    * Falls back to the collected-fold compilation only when the bounded
    * form can't be built (our lenient superset: multiple fields with no
    * combine, or a fold whose accumulator type doesn't settle).
    *
    * `name` is the aggregator's output name — the identifier `combine`
    * uses for the right-hand partial (the reference binds
    * combine(accumulatorId → lhs, name → rhs),
    * ExpressionLambdaAggregatorFactory.java:332-344). */
  def fold(spark: SparkSession, schema: StructType, fields: Seq[String],
      accumulatorId: String, initialValue: String, foldExpr: String,
      combineExpr: Option[String], finalizeExpr: Option[String],
      name: String, maxSizeBytes: Int = 1024): Column = {
    require(fields.nonEmpty, "expression lambda aggregator needs at least one field")
    try bounded(spark, schema, fields, accumulatorId, initialValue, foldExpr,
      combineExpr, finalizeExpr, name, maxSizeBytes)
    catch {
      case scala.util.control.NonFatal(_) =>
        foldCollected(fields, accumulatorId, initialValue, foldExpr, finalizeExpr)
    }
  }

  private def bounded(spark: SparkSession, schema: StructType, fields: Seq[String],
      accId: String, initialValue: String, foldStr: String,
      combineStr: Option[String], finalizeStr: Option[String],
      name: String, maxSizeBytes: Int): Column = {
    val fieldTypes = fields.map(f => schema(f).dataType) // throws on a missing field → fallback
    val init0 = CatalystBridge.resolveAgainst(spark, initColumn(initialValue), Nil)

    // the accumulator type is the fixpoint of the fold's output type
    // starting from the initial value's (type coercion may widen, e.g.
    // LONG init + DOUBLE field → DOUBLE accumulator)
    var accT: DataType = init0.dataType
    var foldAttrs: Seq[AttributeReference] = Nil
    var foldResolved: Expression = null
    var converged = false
    var iters = 0
    while (!converged && iters < 3) {
      foldAttrs = AttributeReference(accId, accT)() +:
        fields.zip(fieldTypes).map { case (f, t) => AttributeReference(f, t)() }
      foldResolved = CatalystBridge.resolveAgainst(spark, MathExpr.expr(foldStr), foldAttrs)
      if (foldResolved.dataType == accT) converged = true
      else { accT = foldResolved.dataType; iters += 1 }
    }
    require(converged, s"fold accumulator type did not converge (last: $accT)")

    val initResolved =
      if (init0.dataType == accT) init0
      else CatalystBridge.resolveAgainst(spark, CatalystBridge.column(init0).cast(accT), Nil)

    // combine(lhs, rhs): accumulatorId binds lhs, the aggregator NAME binds
    // rhs; absent combine requires a single field and reuses the fold with
    // that field standing in for the rhs partial
    // (ExpressionLambdaAggregatorFactory.java:135-145,332-344)
    val (combineResolved, combineAttrs) = combineStr match {
      case Some(c) =>
        val attrs = Seq(AttributeReference(accId, accT)(), AttributeReference(name, accT)())
        (CatalystBridge.resolveAgainst(spark, MathExpr.expr(c), attrs), attrs)
      case None =>
        require(fields.size == 1,
          "Must have a single input field if no combine expression is supplied")
        val attrs = Seq(AttributeReference(accId, accT)(), AttributeReference(fields.head, accT)())
        (CatalystBridge.resolveAgainst(spark, MathExpr.expr(foldStr), attrs), attrs)
    }
    require(combineResolved.dataType == accT,
      s"combine type ${combineResolved.dataType} != accumulator type $accT")

    // finalize references the accumulator as `o` (FINALIZE_IDENTIFIER)
    val finAttrs = Seq(AttributeReference("o", accT)())
    val finResolved = finalizeStr.map(f =>
      CatalystBridge.resolveAgainst(spark, MathExpr.expr(f), finAttrs))

    val agg = ExprLambdaFoldAgg(
      fields = fields.map(f => CatalystBridge.expression(org.apache.spark.sql.functions.col(f))),
      accType = accT,
      initExpr = initResolved,
      foldExpr = BindReferences.bindReference(foldResolved, foldAttrs.map(a => a: org.apache.spark.sql.catalyst.expressions.Attribute)),
      combineExpr = BindReferences.bindReference(combineResolved, combineAttrs.map(a => a: org.apache.spark.sql.catalyst.expressions.Attribute)),
      finalizeExpr = finResolved.map(f => BindReferences.bindReference(f, finAttrs.map(a => a: org.apache.spark.sql.catalyst.expressions.Attribute))),
      resultType = finResolved.map(_.dataType).getOrElse(accT),
      maxSizeBytes = maxSizeBytes)
    CatalystBridge.column(agg.toAggregateExpression())
  }

  /** The pre-r9 collected compilation — fold over
    * `collect_list(struct(fields))` — kept ONLY as the lenient-superset
    * fallback for factories the bounded form rejects (multi-field folds
    * with no combine). Unbounded state: every raw field value of a group
    * crosses the shuffle. */
  def foldCollected(fields: Seq[String], accumulatorId: String, initialValue: String,
      foldExpr: String, finalizeExpr: Option[String]): Column = {
    require(fields.nonEmpty, "expression lambda aggregator needs at least one field")
    val rows = collect_list(struct(fields.map(f => org.apache.spark.sql.functions.col(f).as(f)): _*))
    val foldTemplate = MathExpr.expr(foldExpr)
    val agg = aggregate(rows, initColumn(initialValue), (acc, row) =>
      substitute(foldTemplate,
        fields.map(f => f -> row.getField(f)).toMap + (accumulatorId -> acc)))
    finalizeExpr.fold(agg) { fin =>
      // finalize references the accumulator as `o` (reference: the factory's
      // FINALIZE_IDENTIFIER)
      substitute(MathExpr.expr(fin), Map("o" -> agg))
    }
  }
}
