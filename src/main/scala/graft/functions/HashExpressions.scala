package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `md5_head(s, n)` — the first `n` hex digits of md5(s) as a BIGINT
  * (r17 optimization round, guide §4 "per-task work"): the drop-in for
  * the sketch family's ubiquitous
  *
  *   conv(substring(md5(x), 1, n), 16, 10) CAST AS BIGINT
  *
  * chain, which per value materializes the full 32-char hex string,
  * slices it, has `conv` parse hex → BigInteger-ish accumulation →
  * DECIMAL STRING, and then has the cast parse that string back into a
  * long. This expression computes the MD5 digest of the UTF8 bytes
  * (exactly what Spark's `md5(string)` hashes — its implicit
  * string→binary cast is UTF8String.getBytes) and folds the first `n`
  * hex DIGITS (nibbles) directly into a long.
  *
  * Equivalence with the conv chain, pinned in VectorExprSpec over
  * ASCII/unicode/empty strings for n ∈ {1, 5, 8, 15}:
  *  - both read the same n leading hex digits of the same digest;
  *  - conv treats the input as unsigned and renders a decimal string;
  *    for n ≤ 15 the value is < 16^15 = 2^60, so the long cast parses
  *    it back without overflow or sign ambiguity — bit-equal to the
  *    nibble fold. n = 16 would be ambiguous (2^64 range); the
  *    constructor rejects n outside 1..15.
  *  - null input → null, matching the chain's null propagation.
  */
object HashExpressions {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static helper the codegen'd and interpreted paths share. */
  def md5HeadBytes(b: Array[Byte], nHex: Int): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(b)
    var acc = 0L
    var i = 0
    while (i < nHex) {
      val by = dig(i >> 1) & 0xff
      val digit = if ((i & 1) == 0) by >>> 4 else by & 0xf
      acc = (acc << 4) | digit
      i += 1
    }
    acc
  }

  case class Md5Head(child: Expression, nHex: Int) extends UnaryExpression {
    require(nHex >= 1 && nHex <= 15,
      s"md5_head width must be 1..15 hex digits (signed-long-exact), got $nHex")

    override def dataType: DataType = LongType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_head requires a string input, got $t")
      }

    override def nullSafeEval(input: Any): Any =
      md5HeadBytes(input.asInstanceOf[UTF8String].getBytes, nHex)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.HashExpressions.md5HeadBytes($c.getBytes(), $nHex);")

    override protected def withNewChildInternal(newChild: Expression): Md5Head =
      copy(child = newChild)
  }

  def md5_head(c: Column, nHex: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      Md5Head(org.apache.spark.sql.GraftBridge.expression(c), nHex))
}
