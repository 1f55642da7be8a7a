package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * `doGenCode` emits the ASCII scan as a plain Java loop inside the
  * whole-stage-codegen body (digest held as generated-class mutable
  * state, one per codegen instance — no ThreadLocal lookup per row);
  * the multibyte fallback routes to ONE shared helper
  * ([[CdcBounds.multibyteBounds]]) called by both the generated code
  * and the interpreted eval, so the two paths cannot diverge.
  */
case class CdcBounds(child: Expression) extends UnaryExpression {

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
    val buf = new Array[Int](nChars + 2)
    var cnt = 0
    buf(cnt) = 1; cnt += 1
    if (bytes.length == nChars) {
      // pure-ASCII fast path: character windows ARE byte windows
      var p = 2
      while (p <= nChars) {
        md.reset()
        md.update(bytes, p - 1, math.min(8, nChars - p + 1))
        if ((md.digest()(0) & 0xf0) == 0) { buf(cnt) = p; cnt += 1 }
        p += 1
      }
    } else {
      cnt = CdcBounds.multibyteBounds(u, md, buf, cnt)
    }
    buf(cnt) = nChars + 1; cnt += 1
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      java.util.Arrays.copyOf(buf, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "cdcMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, u => {
      val bytes = ctx.freshName("cdcBytes")
      val nChars = ctx.freshName("cdcChars")
      val buf = ctx.freshName("cdcBuf")
      val cnt = ctx.freshName("cdcCnt")
      val p = ctx.freshName("cdcP")
      s"""
         |byte[] $bytes = $u.getBytes();
         |int $nChars = $u.numChars();
         |int[] $buf = new int[$nChars + 2];
         |int $cnt = 0;
         |$buf[$cnt++] = 1;
         |if ($bytes.length == $nChars) {
         |  for (int $p = 2; $p <= $nChars; $p++) {
         |    $md.reset();
         |    $md.update($bytes, $p - 1, java.lang.Math.min(8, $nChars - $p + 1));
         |    if (($md.digest()[0] & 0xF0) == 0) $buf[$cnt++] = $p;
         |  }
         |} else {
         |  $cnt = graft.functions.CdcBounds.multibyteBounds($u, $md, $buf, $cnt);
         |}
         |$buf[$cnt++] = $nChars + 1;
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  java.util.Arrays.copyOf($buf, $cnt));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CdcBounds =
    copy(child = newChild)
}

object CdcBounds {
  /** Multibyte (non-ASCII) boundary scan shared by interpreted eval and
    * the generated code path: per position p, the window is the SQL
    * `substring(text, p, 8)` slice, hashed as UTF-8 — exactly the HOF
    * formulation's semantics. Appends boundary positions into `buf`
    * starting at `cnt0`; returns the new count. Called from generated
    * Java via the companion's static forwarder.
    *
    * Positions count Unicode CODEPOINTS (r16): SQL `substring` in both
    * engines treats one astral codepoint — a 4-byte emoji — as ONE
    * character, but `java.lang.String` indexes UTF-16 code units,
    * where the same emoji is a surrogate PAIR. The earlier
    * String.substring form was correct for BMP-only multibyte text
    * (CJK, accents, RTL — one UTF-16 unit each) but would have split
    * windows mid-emoji once the `_uni` fixture reached this operator.
    * The scan now windows over a once-built codepoint→byte-offset
    * table — one O(n) pass, hashing UTF-8 byte slices directly. */
  def multibyteBounds(
      u: UTF8String, md: java.security.MessageDigest, buf: Array[Int], cnt0: Int): Int = {
    val bytes = u.getBytes
    val nChars = u.numChars()
    // byte offset where codepoint i starts; offs(nChars) = total bytes
    val offs = new Array[Int](nChars + 1)
    var i = 0
    var b = 0
    while (i < nChars) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(nChars) = bytes.length
    var cnt = cnt0
    var p = 2
    while (p <= nChars) {
      val start = offs(p - 1)
      val end = offs(math.min(p + 7, nChars))
      md.reset()
      md.update(bytes, start, end - start)
      if ((md.digest()(0) & 0xf0) == 0) { buf(cnt) = p; cnt += 1 }
      p += 1
    }
    cnt
  }
}

object CdcExpressions {
  /** `[1] ++ boundaries ++ [len+1]` — drop-in for the SQL concat/
    * filter/sequence formulation in [[graft.operators.Dedup.dedupCdc]]. */
  def cdc_bounds(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      CdcBounds(org.apache.spark.sql.GraftBridge.expression(text)))
}
