package graft.operators

import graft.Tables._
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flagship composite (SURVEY.md §2C): the end-to-end training-data
  * curation flow a 100 TB corpus goes through before tokenization —
  *
  *   quality filter → exact dedup (keep min doc per fingerprint) →
  *   near-dup clustering (keep each cluster's canonical doc) →
  *   final keep-list
  *
  * Every stage is one of the already-oracle-checked operators, so the
  * composite is oracle-checked too (the DuckDB side composes the same
  * CTEs). Each stage is a semi-join against the base table: the
  * surviving-doc sets are small relative to the corpus and the joins
  * are all on doc_id, so the composition adds no new shuffle shape.
  */
object PipelineKeepList {

  type Q = (SparkSession, String) => DataFrame

  private val QUALITY_MIN = 0.5

  def pipelineKeepList: Q = (s, dir) => {
    val quality = TextOps.textQuality(s, dir)
      .filter(col("quality_score") >= QUALITY_MIN)
      .select("doc_id")
    val exactKeep = TextOps.dedupExact(s, dir)
      .select(col("keep_id").as("doc_id"))
    val canonical = DedupClusters.dedupClusters(s, dir)
      .filter(col("doc_id") === col("canonical_id"))
      .select("doc_id")
    t(s, dir, "documents")
      .select("doc_id", "lang", "n_chars")
      .join(quality, Seq("doc_id"), "left_semi")
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(canonical, Seq("doc_id"), "left_semi")
  }

  val pipelineKeepListSql: String =
    s"""WITH quality AS (
       |  SELECT doc_id FROM (${TextOps.textQualitySql}) q
       |  WHERE quality_score >= $QUALITY_MIN),
       |exact_keep AS (
       |  SELECT keep_id AS doc_id FROM (${TextOps.dedupExactSql}) e),
       |clusters AS (${DedupClusters.dedupClustersSql}),
       |canon AS (SELECT doc_id FROM clusters WHERE doc_id = canonical_id)
       |SELECT d.doc_id, d.lang, d.n_chars
       |FROM documents d
       |WHERE d.doc_id IN (SELECT doc_id FROM quality)
       |  AND d.doc_id IN (SELECT doc_id FROM exact_keep)
       |  AND d.doc_id IN (SELECT doc_id FROM canon)""".stripMargin

  val queries: Map[String, Q] = Map("pipeline_keep_list" -> pipelineKeepList)
  val oracles: Map[String, String] = Map("pipeline_keep_list" -> pipelineKeepListSql)
}
