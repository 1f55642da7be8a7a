package graft

import graft.functions.VectorExpressions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Activate with
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * or `.withExtensions(new GraftExtensions)`. After that,
  * `SELECT vec_dot(a, b)` works in `spark.sql(...)` alongside the
  * Column API in [[graft.functions.VectorExpressions]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "vec_dot(a, b) takes two arguments")
        DotProduct(children.head, children(1))
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("sq_dequant"),
      new ExpressionInfo(
        classOf[graft.functions.VectorExpressions.SqDequant].getName, "sq_dequant"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3, "sq_dequant(v, mns, mxs) takes three arguments")
        graft.functions.VectorExpressions.SqDequant(
          children.head, children(1), children(2))
      }))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cdc_bounds"),
      new ExpressionInfo(classOf[graft.functions.CdcBounds].getName, "cdc_bounds"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "cdc_bounds(text) takes one argument")
        graft.functions.CdcBounds(children.head)
      }))
  }
}
