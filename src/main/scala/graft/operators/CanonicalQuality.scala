package graft.operators

import graft.Tables._
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quality-aware canonical election (SURVEY.md §2C) — when a near-dup
  * cluster collapses to one kept document, production pipelines keep
  * the BEST copy, not an arbitrary one: the min-id election behind
  * `dedup_clusters` is deterministic but quality-blind (it can keep
  * the truncated mirror and drop the clean original). This operator
  * re-elects each cluster's representative as
  * argmax(quality_score, tie-break min doc_id) over the
  * already-oracle-checked cluster table and quality scores.
  *
  * Output per cluster: the elected doc, its quality, the cluster
  * size, and whether the election DIFFERS from the min-id choice —
  * the audit signal for how much a quality-blind dedup would have
  * thrown away.
  *
  * Scale shape: one equi-join of the cluster table (bounded-LSH CC
  * output) against per-doc quality scores on doc_id, then ONE
  * partial-aggregated groupBy per cluster — the argmax is a
  * max(struct(quality, −doc_id)) partial aggregate, NOT a window, so
  * election combines map-side and never materializes a per-cluster
  * sort. (The oracle uses row_number for the same order — windows
  * are fine at DuckDB's scale; the Spark side keeps the agg shape.)
  */
object CanonicalQuality {

  type Q = (SparkSession, String) => DataFrame

  def dedupCanonicalQuality: Q = (s, dir) => {
    val clusters = DedupClusters.dedupClusters(s, dir)
    val q = TextOps.textQuality(s, dir).select("doc_id", "quality_score")
    clusters.join(q, "doc_id")
      .groupBy(col("canonical_id").as("cluster_id"))
      .agg(
        max(struct(col("quality_score").as("q"), (-col("doc_id")).as("nid"))).as("m"),
        max(col("cluster_size")).as("cluster_size"))
      .select(col("cluster_id"), (-col("m.nid")).as("best_id"),
        col("cluster_size"), col("m.q").as("best_quality"),
        (-col("m.nid") =!= col("cluster_id")).as("differs_from_minid"))
  }

  val dedupCanonicalQualitySql: String =
    s"""WITH cl AS (
       |${DedupClusters.dedupClustersSql}
       |),
       |q AS (${TextOps.textQualitySql}),
       |j AS (
       |  SELECT cl.doc_id, cl.canonical_id, cl.cluster_size, q.quality_score
       |  FROM cl JOIN q USING (doc_id)),
       |r AS (
       |  SELECT canonical_id AS cluster_id, doc_id, cluster_size, quality_score,
       |    row_number() OVER (PARTITION BY canonical_id
       |      ORDER BY quality_score DESC, doc_id) AS rn
       |  FROM j)
       |SELECT cluster_id, doc_id AS best_id, cluster_size,
       |  quality_score AS best_quality,
       |  doc_id <> cluster_id AS differs_from_minid
       |FROM r WHERE rn = 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "dedup_canonical_quality" -> dedupCanonicalQuality)
  val oracles: Map[String, String] = Map(
    "dedup_canonical_quality" -> dedupCanonicalQualitySql)
}
