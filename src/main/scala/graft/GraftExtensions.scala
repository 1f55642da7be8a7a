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
  }
}
