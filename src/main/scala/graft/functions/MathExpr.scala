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
  *    loudly rather than silently wrong; use `pow(a, b)`.
  *
  * Function names need no rewriting: GraftSqlFunctions registers the Druid
  * names (timestamp_floor/ceil/shift/extract/parse/format, case_searched,
  * case_simple, lookup, the MV_ and array families; nvl/if/isnull/notnull/
  * div are Spark builtins), so a Druid expression string parses as-is after
  * this lexical pass.
  */
object MathExpr {

  def toSparkSql(e: String): String = {
    val sb = new StringBuilder(e.length + 16)
    var i = 0
    var inSingle = false
    var inDouble = false
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
