package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 8 md5 digest bytes as ONE big-endian signed long, straight from the
  * digest — the engine's md5-derived dedup hashes without the hex round trip.
  *
  * The spelling it replaces, `conv(substring(md5(c), p, n), 16, 10)
  * .cast("long")`, pays four string passes per hash on top of the digest:
  * render 32 hex chars, substring-copy, conv's hex parse + decimal render,
  * and the cast's decimal parse. The dedup family evaluates these once per
  * SHINGLE/TOKEN (corpus × ~tokens-per-doc), so the string work rivals the
  * digest itself. From the raw long every pinned hash is a shift:
  *
  *   hex chars 1-15 (60-bit)  =  raw >>> 4
  *   hex chars 1-8  (32-bit)  =  raw >>> 32
  *   hex chars 9-16 (hi 32)   =  raw & 0xFFFFFFFF
  *
  * (hex char i is nibble i of the digest, big-endian, so the first 16 chars
  * ARE the first 8 bytes; dropping the 16th keeps chars 1-15, etc.). Values
  * are BIT-IDENTICAL to the conv spelling — asserted exhaustively against it
  * in Md5HashingSpec — so every oracle-pinned dedup result is unchanged.
  *
  * Sharing falls out for free: hexLong32 and hexLong32Hi over the same input
  * are now two shifts of the SAME subtree, which codegen subexpression
  * elimination evaluates once (simhash digests each token once, as the
  * md5-hex spelling did via its shared md5() subtree).
  */
case class Md5First8Long(child: Expression)
  extends UnaryExpression {

  require(!child.resolved || child.dataType == StringType,
    s"md5_first8_long expects a string child")
  override def dataType: DataType = LongType
  // keep the replaced spelling's nullability (cast-of-conv was nullable) so
  // downstream schemas are byte-identical
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    Md5Hashing.first8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hashing.first8($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5First8Long =
    copy(child = newChild)
  override def prettyName: String = "md5_first8_long"
}

object Md5Hashing {
  private val localMd = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 8 bytes of md5(utf8 bytes of s) as a big-endian signed long. */
  def first8(s: UTF8String): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }
}
