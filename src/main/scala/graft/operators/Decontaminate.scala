package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decontamination EXECUTION ledger (SURVEY.md §2C) —
  * `pipeline_contamination` measures benchmark overlap; this operator
  * is the half a release pipeline actually runs: DROP the flagged
  * documents and account for exactly what left the corpus, per
  * source. Release notes for every serious LLM training set carry
  * this table ("n documents removed for eval overlap"), and a
  * monitoring job alerts when one source's drop rate jumps.
  *
  * Per source: total non-benchmark docs, docs dropped as
  * contaminated, kept docs, kept char mass, and the exact ppm of
  * char mass removed (integer cross-multiplication `1e6·dropped DIV
  * total` — no float division near the reported number, the
  * text_gopher_rules posture).
  *
  * Scale shape: the contamination side is already
  * broadcast-bounded (eval shingles are MB-sized against a TB
  * corpus); its flagged doc list is sparse and joins LEFT on doc_id;
  * the ledger itself is one partial-agg'd groupBy(source). Nothing
  * new shuffles — the operator adds accounting, not data movement.
  */
object Decontaminate {

  type Q = (SparkSession, String) => DataFrame

  def pipelineDecontaminate: Q = (s, dir) => {
    val flagged = Contamination.pipelineContamination(s, dir)
      .filter(col("flagged")).select(col("doc_id"), lit(true).as("dropme"))
    t(s, dir, "documents")
      .filter(!Contamination.isBench)
      .select("doc_id", "source", "n_chars")
      .join(broadcast(flagged), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("dropme"), 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("dropme").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("dropme").isNull, col("n_chars")).otherwise(0L)).as("kept_chars"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("source"), col("n_docs"), col("n_dropped"), col("n_kept"),
        col("kept_chars"),
        expr("1000000L * (total_chars - kept_chars) DIV total_chars")
          .as("dropped_ppm"))
  }

  val pipelineDecontaminateSql: String =
    s"""WITH cont AS (${Contamination.pipelineContaminationSql}),
       |flagged AS (SELECT doc_id, TRUE AS dropme FROM cont WHERE flagged),
       |nb AS (
       |  SELECT d.doc_id, d.source, d.n_chars, f.dropme
       |  FROM documents d LEFT JOIN flagged f ON f.doc_id = d.doc_id
       |  WHERE NOT (substr(md5('graft-bench-v1:' || CAST(d.doc_id AS VARCHAR)), 1, 2) < '08')),
       |led AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN dropme THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |    CAST(SUM(CASE WHEN dropme IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    CAST(SUM(CASE WHEN dropme IS NULL THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
       |    CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |  FROM nb GROUP BY source)
       |SELECT source, n_docs, n_dropped, n_kept, kept_chars,
       |  1000000 * (total_chars - kept_chars) // total_chars AS dropped_ppm
       |FROM led""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipeline_decontaminate" -> pipelineDecontaminate)
  val oracles: Map[String, String] = Map(
    "pipeline_decontaminate" -> pipelineDecontaminateSql)
}
