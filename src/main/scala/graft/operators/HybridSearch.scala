package graft.operators

import graft.Tables._
import graft.functions.VectorExpressions.{vec_dot, vec_norm}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hybrid lexical+vector retrieval with reciprocal-rank fusion
  * (SURVEY.md §2C) — the two-tower search shape every modern
  * retrieval/curation stack runs: a BM25 branch over the text and a
  * cosine branch over the embeddings, fused per candidate by
  *
  *   rrf(q, d) = Σ_branch 1,000,000 div (60 + rank_branch(q, d))
  *
  * — RRF with the standard k=60, ppm-quantized so the fused score is
  * an exact BIGINT on both engines (ranks are integers by
  * construction: the lexical branch is the all-BIGINT [[Bm25]] score
  * and the vector branch ranks on round(cos, 9) with id tie-breaks,
  * the sim-family device). A document missing from one branch's
  * top-[[BRANCH_K]] simply contributes nothing from that branch —
  * standard RRF truncation.
  *
  * The lexical branch IS [[Bm25.scoredLex]] (same plan as the
  * standalone operator), so hybrid correctness also re-gates the
  * shared scorer. The probe ids are the same doc_id < 8 set; document
  * and embedding ids are joined positionally (doc_id = vec_id), the
  * layout a paired corpus/embedding store ships.
  *
  * Scale shape: both branches end in per-query top-[[BRANCH_K]] lists
  * — metadata-sized — so the fusion full-outer join and final window
  * touch n_queries × 2·[[BRANCH_K]] rows, never the corpus. The
  * vector branch broadcasts the probe vectors and scores map-side
  * with the codegen'd dot kernel; only the bounded per-query window
  * follows. */
object HybridSearch {

  type Q = (SparkSession, String) => DataFrame

  private val BRANCH_K = 20
  private val TOP_K = 5
  private val RRF_K = 60

  def simHybridRrf: Q = (s, dir) => {
    // lexical branch: top-BRANCH_K of the shared BM25 score table
    val lw = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    val lex = Bm25.scoredLex(s, dir)
      .withColumn("lex_rank", row_number().over(lw))
      .filter(col("lex_rank") <= BRANCH_K)
      .select(col("qid"), col("doc_id"), col("lex_rank"))
    // vector branch: brute-force cosine top-BRANCH_K for the same probes
    val emb = t(s, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", vec_norm(col("v")))
    val probes = emb.filter(col("vec_id") < Bm25.N_QUERIES)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val vec = emb.join(broadcast(probes), col("vec_id") =!= col("qid"))
      .withColumn("cos", vec_dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .groupBy("qid")
      .agg(graft.functions.TopK.topk(BRANCH_K)(
        round(col("cos"), 9), col("vec_id"), round(col("cos"), 6)).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("qid"), col("e._2").as("doc_id"),
        (col("pos") + 1).cast(IntegerType).as("vec_rank"))
    // ppm-quantized RRF over the union of both branch lists
    val fused = lex.join(vec, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf", expr(
        s"""coalesce(1000000 div ($RRF_K + lex_rank), 0) +
           |coalesce(1000000 div ($RRF_K + vec_rank), 0)""".stripMargin)
        .cast(LongType))
    val fw = Window.partitionBy("qid").orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(fw).cast(LongType))
      .filter(col("rank") <= TOP_K)
      .select(col("qid").cast(LongType).as("qid"), col("doc_id"),
        col("rrf"), col("rank"))
  }

  private val normSqlDuck: String =
    "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  private val dotSqlDuck: String =
    "list_sum(list_transform(generate_series(1, 64), i -> CAST(qa.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))"

  val simHybridRrfSql: String =
    s"""WITH ${Bm25.scoredLexCtes},
       |lex AS (
       |  SELECT qid, doc_id, lex_rank FROM (
       |    SELECT qid, doc_id,
       |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS lex_rank
       |    FROM scored)
       |  WHERE lex_rank <= $BRANCH_K),
       |vec AS (
       |  SELECT qid, doc_id, vec_rank FROM (
       |    SELECT qa.vec_id AS qid, e.vec_id AS doc_id,
       |      row_number() OVER (PARTITION BY qa.vec_id
       |        ORDER BY round($dotSqlDuck / (qa.nrm * e.nrm), 9) DESC, e.vec_id) AS vec_rank
       |    FROM (SELECT vec_id, embedding, $normSqlDuck AS nrm FROM embeddings
       |          WHERE vec_id < ${Bm25.N_QUERIES}) qa
       |    JOIN (SELECT vec_id, embedding, $normSqlDuck AS nrm FROM embeddings) e
       |      ON e.vec_id <> qa.vec_id)
       |  WHERE vec_rank <= $BRANCH_K),
       |fused AS (
       |  SELECT qid, doc_id,
       |    COALESCE(1000000 // ($RRF_K + lex_rank), 0) +
       |    COALESCE(1000000 // ($RRF_K + vec_rank), 0) AS rrf
       |  FROM lex FULL OUTER JOIN vec USING (qid, doc_id))
       |SELECT CAST(qid AS BIGINT) AS qid, doc_id, CAST(rrf AS BIGINT) AS rrf,
       |  CAST(rank AS BIGINT) AS rank
       |FROM (
       |  SELECT qid, doc_id, rrf,
       |    row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rank
       |  FROM fused)
       |WHERE rank <= $TOP_K""".stripMargin

  val queries: Map[String, Q] = Map("sim_hybrid_rrf" -> simHybridRrf)
  val oracles: Map[String, String] = Map("sim_hybrid_rrf" -> simHybridRrfSql)
}
