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

  // ------------------------------------------------------------------
  // r16 optimization round: SqL2Dist + CountsIn replace interpreted
  // HOF chains in the PQ scorers and the stateless streaming twins —
  // these pins are the bit-for-bit equivalence evidence
  // ------------------------------------------------------------------

  test("SqL2Dist matches the zip_with/aggregate HOF fold bit-for-bit") {
    import graft.functions.VectorExpressions.vec_sqdist
    // pair distinct rows so left != right exercises real differences
    val a = emb.select(col("vec_id").as("ia"), col("v").as("va")).filter(col("ia") < 64)
    val b = emb.select(col("vec_id").as("ib"), col("v").as("vb")).filter(col("ib") < 64)
    val both = a.crossJoin(b).select(
      vec_sqdist(col("va"), col("vb")).as("native"),
      expr("aggregate(zip_with(va, vb, (x, y) -> (x - y) * (x - y)), 0D, (acc, z) -> acc + z)")
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
    assert(both.count() > 0)
  }

  test("SqL2Dist participates in whole-stage codegen") {
    import graft.functions.VectorExpressions.vec_sqdist
    val plan = emb.select(vec_sqdist(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("sql2dist") && l.contains("*(")),
      plan.take(800))
  }

  test("Md5Head matches the conv(substring(md5)) chain bit-for-bit") {
    import graft.functions.HashExpressions.md5_head
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text"))
      .unionAll(Seq("", "a", "\u8868\u793a\u3055\u308c\u307e\u3059", "x y z").toDF("text"))
    Seq(1, 5, 8, 15).foreach { n =>
      val both = docs.select(
        md5_head(col("text"), n).as("native"),
        expr(s"CAST(conv(substring(md5(text), 1, $n), 16, 10) AS BIGINT)").as("chain"))
      assert(both.filter(col("native") =!= col("chain")).isEmpty, s"width $n")
      assert(both.count() > 0)
    }
    // null propagation matches the chain
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(md5_head(col("text"), 8).as("native"))
    assert(nulls.filter(col("native").isNotNull).isEmpty)
  }

  test("Md5Head participates in whole-stage codegen") {
    import graft.functions.HashExpressions.md5_head
    val plan = spark.read.parquet(s"$sf/documents.parquet")
      .select(md5_head(col("text"), 8).as("h"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("md5head") && l.contains("*(")),
      plan.take(800))
  }

  test("CountsIn matches the transform/filter HOF formulation, incl. null keys") {
    import graft.functions.CountsIn.counts_in
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("text")
      .union(spark.sql("SELECT 'ぁあ中中中 mixed 中 runs ぁ' AS text"))
      .withColumn("cs", expr("filter(split(lower(text), ''), ch -> ch != '')"))
      .withColumn("dc", expr("array_distinct(cs)"))
      // a null key probes the null-key-counts-zero branch both ways
      .withColumn("dcn", expr("concat(dc, array(CAST(NULL AS STRING)))"))
    val both = docs.select(
      counts_in(col("cs"), col("dcn")).as("native"),
      expr("transform(dcn, d -> cast(size(filter(cs, x -> x = d)) as bigint))").as("hof"))
    assert(both.filter(expr("native <> hof")).isEmpty)
    assert(both.count() > 0)
  }
}
