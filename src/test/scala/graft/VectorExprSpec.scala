package graft

import graft.functions.VectorExpressions.{vec_dot, vec_norm}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExprSpec extends AnyFunSuite {
  import TestSession._

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))

  test("DotProduct matches the HOF fold bit-for-bit") {
    val both = emb.select(
      vec_dot(col("v"), col("v")).as("native"),
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
    assert(both.count() > 0)
  }

  test("DotProduct participates in whole-stage codegen") {
    val plan = emb.select(vec_dot(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // `*(n)` marks operators fused into a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l => l.contains("dotproduct") && l.contains("*(")),
      plan.take(800))
  }

  test("vec_norm is sqrt of self-dot") {
    val r = emb.select((vec_norm(col("v")) - sqrt(vec_dot(col("v"), col("v")))).as("diff"))
    assert(r.filter(abs(col("diff")) > 0d).isEmpty)
  }

  test("nulls propagate") {
    val r = emb.select(vec_dot(lit(null).cast("array<double>"), col("v")).as("d"))
    assert(r.filter(col("d").isNotNull).isEmpty)
  }

  test("CdcBounds participates in whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = docs.select(graft.functions.CdcExpressions.cdc_bounds(col("text")).as("b"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("cdcbounds") && l.contains("*(")),
      plan.take(800))
  }

  test("CdcBounds codegen matches the SQL HOF formulation bit-for-bit") {
    // corpus rows exercise the ASCII fast path; the appended multibyte
    // doc forces the shared character-slicing fallback through the
    // generated-code branch too
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("text")
      .union(spark.sql("SELECT 'café au lait — naïve résumé über alles, 2²=4' AS text"))
    val both = docs.filter(length(col("text")) >= 2).select(
      graft.functions.CdcExpressions.cdc_bounds(col("text")).as("native"),
      expr("concat(array(1), filter(sequence(2, length(text)), " +
        "p -> substring(md5(CAST(substring(text, p, 8) AS BINARY)), 1, 1) = '0'), " +
        "array(length(text) + 1))").as("hof"))
    assert(both.filter(expr("native <> hof")).isEmpty)
    assert(both.count() > 0)
  }
}
