package graft.sources.netcdf

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bit-replay of [[Hdf5Format.quantDouble]] as a native expression —
  * the nc4_quantize gate re-derives every stored element's quantized
  * form (BitRound / both BitGroom parities) and compares it to the
  * file's value, which no builtin can express. Previously two Scala
  * UDFs (the last UDFs anywhere in src/main); as a codegen'd
  * UnaryExpression the replay fuses into the scan's whole-stage
  * loop and the comparisons stay plain builtin equality. */
case class QuantReplay(mode: String, bits: Int, form: Long, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quant_replay requires a double input, got $t")
    }

  def compute(x: Double): Double = Hdf5Format.quantDouble(mode, bits, x, form)

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantReplay", this,
      classOf[QuantReplay].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantReplay =
    copy(child = newChild)
}

object QuantReplay {
  def quant(x: Column, mode: String, bits: Int, form: Long): Column =
    org.apache.spark.sql.GraftBridge.column(
      QuantReplay(mode, bits, form, org.apache.spark.sql.GraftBridge.expression(x)))
}
