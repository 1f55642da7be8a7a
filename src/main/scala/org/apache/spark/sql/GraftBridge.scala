package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's Column↔Expression conversions, which are
  * `private[sql]` in the classic API (Column is ColumnNode-backed in
  * 4.x). Same pattern the public Spark-extension ecosystem uses (cf.
  * SNIPPETS.md [3], Qbeast's DatasetFactory): a minimal shim compiled
  * into the org.apache.spark.sql namespace.
  */
object GraftBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
