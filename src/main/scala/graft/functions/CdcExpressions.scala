package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary scan as ONE native expression.
  *
  * The SQL formulation (`filter(sequence(2, n), p -> substring(md5(
  * substring(text, p, 8)), 1, 1) = '0')`) pays, per CHARACTER of every
  * document: a lambda dispatch, a substring allocation, a fresh
  * MessageDigest, a 32-char hex rendering, and a string compare. This
  * expression computes the identical boundaries — window = chars
  * p..min(p+7, n), boundary iff the window's UTF-8 md5 starts with
  * hex nibble 0 — in one pass with a REUSED digest and no hex
  * materialization (`(digest[0] & 0xF0) == 0` IS "first hex char is
  * '0'"), so results are bit-for-bit the SQL formulation's and the
  * DuckDB oracle needs no change. ASCII documents (the common case)
  * window directly over the UTF-8 bytes; multibyte text falls back to
  * per-position character slicing for exact SQL-substring semantics.
  *
  * Eval-only (CodegenFallback): the per-row call overhead is
  * amortized over the document-length internal loop.
  */
case class CdcBounds(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_bounds requires a string input, got $t")
    }

  // per-thread digest: interpreted-eval expression instances can be
  // shared across local-mode tasks
  @transient private lazy val mdTL =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val md = mdTL.get()
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    val nChars = u.numChars()
    val out = new scala.collection.mutable.ArrayBuffer[Int](nChars / 12 + 3)
    out += 1
    if (bytes.length == nChars) {
      // pure-ASCII fast path: character windows ARE byte windows
      var p = 2
      while (p <= nChars) {
        md.reset()
        md.update(bytes, p - 1, math.min(8, nChars - p + 1))
        if ((md.digest()(0) & 0xf0) == 0) out += p
        p += 1
      }
    } else {
      val s = u.toString
      var p = 2
      while (p <= nChars) {
        md.reset()
        md.update(s.substring(p - 1, math.min(p + 7, nChars)).getBytes("UTF-8"))
        if ((md.digest()(0) & 0xf0) == 0) out += p
        p += 1
      }
    }
    out += nChars + 1
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcBounds =
    copy(child = newChild)
}

object CdcExpressions {
  /** `[1] ++ boundaries ++ [len+1]` — drop-in for the SQL concat/
    * filter/sequence formulation in [[graft.operators.Dedup.dedupCdc]]. */
  def cdc_bounds(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      CdcBounds(org.apache.spark.sql.GraftBridge.expression(text)))
}
