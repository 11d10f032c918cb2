package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-preserving byte keys for the reference's stateful StringComparators
  * (query/ordering/StringComparators.java) — `sort_array`-style Catalyst keys
  * cannot call a pairwise comparator, so each comparator is re-expressed as a
  * value → byte-string mapping whose unsigned lexicographic order reproduces
  * the comparator's order. BinaryType sorts byte-wise unsigned in Spark,
  * so `orderBy(key(c))` = the reference's ordering.
  *
  * - alphanumeric ("the Alphanum algorithm", AlphanumericComparator,
  *   StringComparators.java:100-239): digit runs compare by significant-digit
  *   count, then digit values, then leading-zero count; text runs compare
  *   case-insensitively; digit runs sort before text runs; total length
  *   breaks prefix ties. Encoded with per-chunk markers (digit 0x01 < text
  *   0x02) and fixed-width length/zero-count fields.
  * - version (VersionComparator, StringComparators.java:435-456 →
  *   maven DefaultArtifactVersion / ComparableVersion): dot/dash/digit-letter
  *   tokenization, qualifier ranking alpha < beta < milestone < rc <
  *   snapshot < "" (release) < sp < other qualifiers (lexicographic) <
  *   numbers, trailing null items ("0", "") trimmed, ga/final/release ≡ ""
  *   and cr ≡ rc aliases, a/b/m before digits ≡ alpha/beta/milestone.
  *   Two documented approximations, both unreachable from orderings that are
  *   total (maven's own item order is non-transitive — 0 ≡ null ≡ "" yet
  *   0 > "" — so no order-embedding can be exact): dash sub-lists are
  *   flattened (maven ranks a sub-list above a bare qualifier at the same
  *   position), and a null item ("0"/"") directly before a below-release
  *   suffix is dropped so "1.0-SNAPSHOT" < "1.0" resolves like the
  *   reference's null-padding compare.
  */
object OrderingKeys {

  // ---------------- alphanumeric ----------------

  // AlphanumericComparator.isDigit (StringComparators.java:201-208):
  // ASCII + Arabic-Indic, Extended Arabic-Indic, Devanagari, fullwidth.
  private def isDigit(cp: Int): Boolean =
    (cp >= '0' && cp <= '9') ||
      (cp >= '٠' && cp <= '٩') ||
      (cp >= '۰' && cp <= '۹') ||
      (cp >= '०' && cp <= '९') ||
      (cp >= '０' && cp <= '９')

  private def isZero(cp: Int): Boolean =
    cp == '0' || cp == '٠' || cp == '۰' || cp == '०' || cp == '０'

  private def digitValue(cp: Int): Int =
    if (cp <= '9') cp - '0'
    else if (cp <= '٩') cp - '٠'
    else if (cp <= '۹') cp - '۰'
    else if (cp <= '९') cp - '०'
    else cp - '０'

  private def padded(n: Int, width: Int, out: ByteArrayOutputStream): Unit = {
    val s = n.toString
    var i = s.length
    while (i < width) { out.write('0'); i += 1 }
    out.write(s.getBytes(StandardCharsets.US_ASCII))
  }

  /** Alphanum-algorithm sort key. Digit chunks: marker 0x01, six-digit
    * significant-length field, significant digits (normalized to ASCII),
    * six-digit leading-zero-count field. Text chunks: marker 0x02 and the
    * case-folded chunk in UTF-8.
    */
  def alphanumKey(s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream(s.length + 16)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isDigit(cp)) {
        var zeros = 0
        var j = i
        while (j < s.length && isZero(s.codePointAt(j))) {
          zeros += 1; j += Character.charCount(s.codePointAt(j))
        }
        val sigStart = j
        var sig = 0
        while (j < s.length && isDigit(s.codePointAt(j))) {
          sig += 1; j += Character.charCount(s.codePointAt(j))
        }
        out.write(0x01)
        padded(sig, 6, out)
        var k = sigStart
        while (k < j) {
          val d = s.codePointAt(k)
          out.write('0' + digitValue(d))
          k += Character.charCount(d)
        }
        padded(zeros, 6, out)
        i = j
      } else {
        out.write(0x02)
        var j = i
        while (j < s.length && !isDigit(s.codePointAt(j))) {
          val c = s.codePointAt(j)
          // String.CASE_INSENSITIVE_ORDER folding: upper, then lower
          val folded = Character.toLowerCase(Character.toUpperCase(c))
          out.write(new String(Character.toChars(folded)).getBytes(StandardCharsets.UTF_8))
          j += Character.charCount(c)
        }
        i = j
      }
    }
    out.toByteArray
  }

  // ---------------- maven version ----------------

  private sealed trait Tok
  private final case class Num(digits: String) extends Tok { // leading zeros stripped
    def isNullLevel: Boolean = digits.isEmpty
  }
  private final case class Qual(rank: Int, text: String) extends Tok // rank per QUALIFIERS

  // ComparableVersion.StringItem.QUALIFIERS order:
  // alpha beta milestone rc snapshot "" sp; unknown after sp, lexicographic.
  private val RankAlpha = 1
  private val RankBeta = 2
  private val RankMilestone = 3
  private val RankRc = 4
  private val RankSnapshot = 5
  private val RankRelease = 6 // "" — the null level
  private val RankSp = 7
  private val RankOther = 8

  private def qualifier(tokRaw: String, followedByDigit: Boolean): Qual = {
    val tok =
      if (followedByDigit) tokRaw match {
        case "a" => "alpha"
        case "b" => "beta"
        case "m" => "milestone"
        case t => t
      } else tokRaw
    tok match {
      case "alpha" => Qual(RankAlpha, "")
      case "beta" => Qual(RankBeta, "")
      case "milestone" => Qual(RankMilestone, "")
      case "rc" | "cr" => Qual(RankRc, "")
      case "snapshot" => Qual(RankSnapshot, "")
      case "" | "ga" | "final" | "release" => Qual(RankRelease, "")
      case "sp" => Qual(RankSp, "")
      case other => Qual(RankOther, other)
    }
  }

  private def tokenize(version: String): List[Tok] = {
    val s = version.toLowerCase(Locale.ENGLISH)
    val toks = scala.collection.mutable.ListBuffer.empty[Tok]
    val cur = new StringBuilder
    var curIsDigit = false

    def flush(followedByDigit: Boolean): Unit = {
      val t = cur.toString
      cur.clear()
      if (t.isEmpty) toks += Num("") // empty segment ≡ "0"
      else if (curIsDigit) toks += Num(t.dropWhile(_ == '0'))
      else toks += qualifier(t, followedByDigit)
    }

    var i = 0
    var seen = false
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '.' | '-' =>
          if (seen || cur.nonEmpty) flush(followedByDigit = false)
          seen = true
        case d if d.isDigit =>
          if (cur.nonEmpty && !curIsDigit) { flush(followedByDigit = true); seen = true }
          curIsDigit = true
          cur.append(d)
        case o =>
          if (cur.nonEmpty && curIsDigit) { flush(followedByDigit = false); seen = true }
          curIsDigit = false
          cur.append(o)
      }
      i += 1
    }
    if (cur.nonEmpty || !seen) flush(followedByDigit = false)
    else if (s.nonEmpty && (s.last == '.' || s.last == '-')) toks += Num("")
    toks.toList
  }

  private def isNullLevel(t: Tok): Boolean = t match {
    case n: Num => n.isNullLevel
    case Qual(r, _) => r == RankRelease
  }

  private def belowNull(t: Tok): Boolean = t match {
    case Qual(r, _) => r < RankRelease
    case _ => false
  }

  /** Trailing null items trimmed; null items directly ahead of a
    * below-release suffix dropped (the reference's null-padded positional
    * compare makes them invisible there). */
  private def normalize(toks: List[Tok]): List[Tok] = {
    val trimmed = toks.reverse.dropWhile(isNullLevel).reverse
    // right-to-left: track whether the suffix compares below the null level
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var suffixBelow = false
    trimmed.reverse.foreach { t =>
      if (isNullLevel(t) && suffixBelow) () // drop
      else {
        out.prepend(t)
        if (!isNullLevel(t)) suffixBelow = belowNull(t)
      }
    }
    out.toList
  }

  /** Maven-version sort key: one marker byte per token (0x02 below-release
    * qualifiers + rank, 0x06 release/zero, 0x07 sp, 0x08 other qualifier +
    * text, 0x0A number + 24-digit field), 0x06 terminator (so a
    * below-release suffix sorts under plain release, and any other suffix
    * over it).
    */
  def versionKey(s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream(s.length + 8)
    normalize(tokenize(s)).foreach {
      case Num(digits) =>
        if (digits.isEmpty) out.write(0x06)
        else {
          // length-major + digits (no leading zeros) = exact numeric order
          // at any magnitude (maven promotes to BigInteger the same way)
          out.write(0x0A)
          padded(digits.length, 6, out)
          out.write(digits.getBytes(StandardCharsets.US_ASCII))
        }
      case Qual(RankRelease, _) => out.write(0x06)
      case Qual(RankSp, _) => out.write(0x07)
      case Qual(RankOther, text) =>
        out.write(0x08)
        out.write(text.getBytes(StandardCharsets.UTF_8))
      case Qual(rank, _) =>
        out.write(0x02)
        out.write(rank)
    }
    out.write(0x06)
    out.toByteArray
  }
}

/** `alphanumKey` as a Catalyst expression (CodegenFallback — computed once
  * per row as a sort/compare key, off every aggregation hot path). */
case class AlphanumOrderKey(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    OrderingKeys.alphanumKey(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): AlphanumOrderKey = copy(child = c)
  override def prettyName: String = "alphanum_order_key"
}

/** `versionKey` as a Catalyst expression. */
case class VersionOrderKey(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    OrderingKeys.versionKey(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): VersionOrderKey = copy(child = c)
  override def prettyName: String = "version_order_key"
}
