package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-key occurrence counts of one string array inside another
  * (r16 optimization round, guide §4 "per-task work"):
  *
  *   counts_in(values, keys)[i] = COUNT of values == keys(i)
  *
  * is the drop-in for the HOF formulation
  * `transform(keys, k -> cast(size(filter(values, x -> x = k)) as
  * bigint))` that the stateless streaming twins (stream_char_entropy,
  * stream_hash_embedding) fuse map-side. The HOF form is QUADRATIC
  * per row — each distinct key re-scans the full value array through
  * interpreted lambda dispatch — which made those two keys the
  * slowest map-side streams in the bench. This expression builds one
  * hash count map over `values` (O(n)) and probes it per key (O(k)).
  *
  * Result equivalence with the HOF form, case by case:
  *  - non-null key: `x = k` is true only for non-null equal values,
  *    so the HOF counts non-null equal elements — exactly the hash
  *    map's count (UTF8String equality IS Spark's string `=`);
  *  - null key: `x = k` is null for every x, filter drops all rows,
  *    HOF yields 0 — the map probe returns 0 for null too;
  *  - null value elements: `x = k` is null, dropped by filter, and
  *    the map never counts nulls;
  *  - either array null: BinaryExpression's default null intolerance
  *    yields null, matching transform/filter on a null array.
  */
object CountsIn {

  case class CountsInExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"counts_in requires array<string> inputs, got ${left.dataType} / ${right.dataType}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val values = a.asInstanceOf[ArrayData]
      val keys = b.asInstanceOf[ArrayData]
      val m = new java.util.HashMap[UTF8String, java.lang.Long](
        values.numElements() * 2 + 1)
      var i = 0
      val nv = values.numElements()
      while (i < nv) {
        if (!values.isNullAt(i)) {
          val v = values.getUTF8String(i)
          val c = m.get(v)
          m.put(v, if (c == null) 1L else c.longValue() + 1L)
        }
        i += 1
      }
      val nk = keys.numElements()
      val out = new Array[Long](nk)
      var j = 0
      while (j < nk) {
        if (!keys.isNullAt(j)) {
          val c = m.get(keys.getUTF8String(j))
          out(j) = if (c == null) 0L else c.longValue()
        }
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CountsInExpr =
      copy(left = newLeft, right = newRight)
  }

  def counts_in(values: Column, keys: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      CountsInExpr(org.apache.spark.sql.GraftBridge.expression(values),
        org.apache.spark.sql.GraftBridge.expression(keys)))
}
