package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus snapshot diff (SURVEY.md §2C): classify every document of
  * two dataset versions as added / removed / changed / unchanged and
  * report the counts per source — the release audit a training-data
  * pipeline runs between crawl refreshes before re-tokenizing
  * anything downstream.
  *
  * Scale posture: the diff is ONE full-outer hash join keyed by the
  * primary key, comparing md5 content fingerprints computed map-side —
  * document payloads never shuffle, only (id, source, 16-byte fp)
  * triples. With both snapshots bucketed by doc_id at layout time
  * (the [[ScaleJoins]] device) the join is exchange-free; the status
  * counts are partial-agg'd on low-cardinality (source, status) keys.
  *
  * Version 2 here is derived deterministically from version 1 by an
  * md5 id-bucket (same RNG-free device as the benchmark slice in
  * [[Contamination]]): ~3% of docs removed, ~3% rewritten, ~3% cloned
  * under fresh ids as additions. A real deployment reads two real
  * snapshots instead.
  */
object DatasetDiff {

  type Q = (SparkSession, String) => DataFrame

  private val SALT = "graft-diff-v2:"
  private val RM_TH = "08" // bucket < '08'  → dropped in v2   (~3%)
  private val CH_TH = "10" // bucket < '10'  → text rewritten  (~3%)
  private val ADD_TH = "f8" // bucket >= 'f8' → cloned as a new doc (~3%)

  private def bucket =
    substring(md5(concat(lit(SALT), col("doc_id").cast(StringType))), 1, 2)

  /** Deterministic synthetic "next crawl" of the documents table.
    * Clone ids offset by max(doc_id)+1 (a 1-row broadcast scalar, not
    * a fixed constant) so the added slice is provably disjoint from
    * surviving ids at ANY corpus size — a fixed offset could collide
    * with real ids and silently corrupt the full-outer join keys. */
  private def v2(docs: DataFrame): DataFrame = {
    val b = docs.withColumn("bk", bucket)
    val survivors = b.filter(col("bk") >= RM_TH)
      .withColumn("text",
        when(col("bk") < CH_TH, upper(col("text"))).otherwise(col("text")))
    val clones = b.filter(col("bk") >= ADD_TH)
      .crossJoin(broadcast(docs.agg(max(col("doc_id")).as("_mx"))))
      .withColumn("doc_id", col("doc_id") + col("_mx") + lit(1L))
      .drop("_mx")
    survivors.unionByName(clones).drop("bk")
  }

  /** (source, status, n) over the v1-vs-v2 full-outer fingerprint
    * compare. A rewrite that leaves the fingerprint identical counts
    * as unchanged — the diff is content-level, not provenance-level. */
  def pipelineDatasetDiff: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val v1 = docs.select(col("doc_id"), col("source"), md5(col("text")).as("fp"))
    val v2f = v2(docs).select(col("doc_id").as("doc_id2"),
      col("source").as("source2"), md5(col("text")).as("fp2"))
    v1.join(v2f, col("doc_id") === col("doc_id2"), "full_outer")
      .withColumn("status",
        when(col("doc_id").isNull, lit("added"))
          .when(col("doc_id2").isNull, lit("removed"))
          .when(col("fp") === col("fp2"), lit("unchanged"))
          .otherwise(lit("changed")))
      .groupBy(coalesce(col("source"), col("source2")).as("source"), col("status"))
      .agg(count(lit(1)).as("n"))
  }

  val pipelineDatasetDiffSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, source, text,
       |    substr(md5('$SALT' || CAST(doc_id AS VARCHAR)), 1, 2) AS bk
       |  FROM documents),
       |v1 AS (SELECT doc_id, source, md5(text) AS fp FROM documents),
       |v2 AS (
       |  SELECT doc_id, source,
       |    md5(CASE WHEN bk < '$CH_TH' THEN upper(text) ELSE text END) AS fp
       |  FROM b WHERE bk >= '$RM_TH'
       |  UNION ALL
       |  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents), source, md5(text)
       |  FROM b WHERE bk >= '$ADD_TH')
       |SELECT COALESCE(v1.source, v2.source) AS source,
       |  CASE WHEN v1.doc_id IS NULL THEN 'added'
       |       WHEN v2.doc_id IS NULL THEN 'removed'
       |       WHEN v1.fp = v2.fp THEN 'unchanged'
       |       ELSE 'changed' END AS status,
       |  CAST(COUNT(*) AS BIGINT) AS n
       |FROM v1 FULL OUTER JOIN v2 ON v2.doc_id = v1.doc_id
       |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, Q] = Map("pipeline_dataset_diff" -> pipelineDatasetDiff)
  val oracles: Map[String, String] =
    Map("pipeline_dataset_diff" -> pipelineDatasetDiffSql)
}
