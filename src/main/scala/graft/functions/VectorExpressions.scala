package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<double>`
  * (SURVEY.md §2C similarity ops).
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate
  * through interpreted lambda machinery; a million-row ANN scoring pass
  * spends most of its time in that overhead. These expressions are
  * plain `BinaryExpression`s with `doGenCode`, so the dot product
  * compiles into the whole-stage-codegen loop: one fused Java loop per
  * row, no lambda dispatch, no boxing.
  *
  * The summation order is the same sequential left-to-right fold the
  * HOF formulation (and the DuckDB oracle) uses, so swapping these in
  * is bit-for-bit result-neutral.
  */
object VectorExpressions {

  /** Σ a(i)*b(i), sequential order; null if either side is null.
    * Mismatched lengths fold over the common prefix (caller contract:
    * fixed-dim embedding columns). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0d
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: dot product of two array<double> columns. */
  def vec_dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      DotProduct(org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** L2 norm via the same codegen'd kernel. */
  def vec_norm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vec_dot(a, a))
  }

  /** cosine(a, b) given precomputed norms. */
  def vec_cos(a: Column, b: Column, na: Column, nb: Column): Column =
    vec_dot(a, b) / (na * nb)
}
