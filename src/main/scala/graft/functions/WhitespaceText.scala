package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte-level replacements for the whitespace-normalization
  * pipeline `trim(regexp_replace(text, "\s+", " "))` and its derived
  * tokenizer `split(<normalized>, " ")` — the first step of EVERY corpus-wide
  * text/dedup query, previously a Java-regex replaceAll over the multi-KB
  * text payload per row (plus a regex split and an intermediate normalized
  * string per row for the tokenizer).
  *
  * Equivalence (asserted against the regex spellings in WhitespaceTextSpec):
  *  - Java's `\s` is exactly ASCII [ \t\n\x0B\f\r]; multi-byte UTF-8 chars
  *    never contain ASCII bytes (continuation bytes are >= 0x80), so a
  *    byte-level scan classifies identically to the regex — non-breaking
  *    spaces etc. stay inside tokens, as `\s` leaves them.
  *  - normalizeWs = the non-whitespace runs joined by single spaces (the
  *    regex collapses each run to ' ', trim drops the boundary ones).
  *  - tokens = the runs themselves; an input with NO runs normalizes to ""
  *    and `split("", " ")` yields [""], reproduced exactly.
  *  - tokenCount(c) = when(length(norm) = 0, 0).otherwise(size(tokens)) =
  *    simply the number of runs.
  */
object WhitespaceText {
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** trim(regexp_replace(s, "\\s+", " ")) in one byte pass; returns the
    * input object untouched when it is already normalized. */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    // fast path: already normalized (no leading/trailing ws, no run of 2+,
    // no non-space ws)
    var i = 0
    var clean = true
    var prevWs = true // true at start: a leading space is "dirty"
    while (clean && i < n) {
      val b = bytes(i)
      if (isWs(b)) {
        if (b != ' ' || prevWs) clean = false
        prevWs = true
      } else prevWs = false
      i += 1
    }
    if (clean && !prevWs) return s
    if (clean && n == 0) return s
    val out = new Array[Byte](n)
    var o = 0
    i = 0
    while (i < n) {
      // skip a whitespace run; emit a single ' ' only between runs
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n && o > 0) { out(o) = ' '; o += 1 }
      while (i < n && !isWs(bytes(i))) { out(o) = bytes(i); o += 1; i += 1 }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** split(normalize(s), " "): the non-whitespace runs; [""] when none. */
  def tokens(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val toks = new scala.collection.mutable.ArrayBuffer[AnyRef](16)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) toks += UTF8String.fromBytes(bytes, start, i - start)
    }
    if (toks.isEmpty) toks += UTF8String.EMPTY_UTF8
    new GenericArrayData(toks.toArray)
  }

  /** Number of non-whitespace runs = the engine's tokenCount. */
  def tokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var c = 0
    var i = 0
    var inTok = false
    while (i < n) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) c += 1
      inTok = !ws
      i += 1
    }
    c
  }
}

case class NormalizeWsExpr(child: Expression) extends UnaryExpression {
  require(!child.resolved || child.dataType == StringType,
    "normalize_ws expects a string child")
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any =
    WhitespaceText.normalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WhitespaceText.normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeWsExpr =
    copy(child = newChild)
  override def prettyName: String = "normalize_ws"
}

case class WhitespaceTokensExpr(child: Expression) extends UnaryExpression {
  require(!child.resolved || child.dataType == StringType,
    "ws_tokens expects a string child")
  // matches split()'s ArrayType(StringType) (containsNull = true) so every
  // downstream schema is byte-identical to the regex spelling
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any =
    WhitespaceText.tokens(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WhitespaceText.tokens($c)")
  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokensExpr =
    copy(child = newChild)
  override def prettyName: String = "ws_tokens"
}

case class WhitespaceTokenCountExpr(child: Expression) extends UnaryExpression {
  require(!child.resolved || child.dataType == StringType,
    "ws_token_count expects a string child")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any =
    WhitespaceText.tokenCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WhitespaceText.tokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokenCountExpr =
    copy(child = newChild)
  override def prettyName: String = "ws_token_count"
}
