package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-light twin of the md5-hex-prefix coins in [[graft.text.Hashing]]
  * (guide: expressions/codegen — eliminate per-row allocation in the hot
  * path).
  *
  * The oracle-portable coin formulas are all "first k hex digits of
  * md5(text), parsed as a number":
  *
  *   conv(substring(md5(c), 1, 4), 16, 10)  — feature bucket (per GRAM —
  *                                            the DSIR/classifier hot path)
  *   conv(substring(md5(c), 1, 2), 16, 10)  — sampling byte (per doc)
  *   substring(md5(c), 1, 1) vs 'e'         — split arm (per doc)
  *
  * Evaluated literally, each row pays: a fresh MessageDigest instance
  * (DigestUtils.getDigest), a 32-char hex String, a Spark UTF8String
  * wrapper, a substring copy, and a conv() radix parse — five
  * allocations to read TWO BYTES of the digest. [[Md5Prefix16]] returns
  * those two bytes directly: the big-endian unsigned value of digest
  * bytes 0..1 — EXACTLY the integer conv() parses from hex digits 1..4
  * (hex digit i is nibble i of the digest), so
  *
  *   Md5Prefix16(c)       ≡ conv(substring(md5(c),1,4),16,10) :: long
  *   Md5Prefix16(c) >> 8  ≡ conv(substring(md5(c),1,2),16,10)
  *   Md5Prefix16(c) >> 12 ≡ the first hex digit's nibble value
  *
  * bit-for-bit (Md5ExpressionsSpec pins all three against the literal
  * SQL forms). One thread-local MessageDigest, zero per-row allocation
  * beyond the digest's internal buffer; null in → null out (same as the
  * md5 chain).
  */
object Md5Ops {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Big-endian unsigned int of the first 2 md5-digest bytes ∈ [0, 65535]. */
  def prefix16(s: UTF8String): Long = {
    val md = tl.get()
    // digest() resets the instance, so the thread-local is reusable
    val d = md.digest(s.getBytes)
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)).toLong
  }

  /** Column API. */
  def md5Prefix16(c: Column): Column =
    Bridge.toColumn(Md5Prefix16(Bridge.toExpression(c)))
}

case class Md5Prefix16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix16"
  override def checkInputDataTypes() =
    TextExpressions.requireType(child, prettyName, "string")(_ == StringType)

  override def nullSafeEval(input: Any): Any =
    Md5Ops.prefix16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.Md5Ops.prefix16($str);")

  override protected def withNewChildInternal(c: Expression): Md5Prefix16 =
    copy(child = c)
}
