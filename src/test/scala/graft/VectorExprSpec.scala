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
}
