package graft.operators

import graft.Tables._
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DEDUP ATTRITION FUNNEL (SURVEY.md §2C): the per-stage removal-rate
  * table a dataset card leads with — "exact dedup removed X%, near-dup
  * clustering removed another Y%" (the RefinedWeb/Dolma reporting
  * shape). Composes the pipeline's own stages SEQUENTIALLY with
  * FIRST-FAILING-STAGE attribution (the quality_ensemble discipline),
  * so per-source kill counts sum EXACTLY to n_docs — an invariant the
  * spec pins.
  *
  * Stage 1 (exact): a doc dies if it is not the min-doc_id canonical
  * of its normalized-text md5 group — the [[TextOps.dedupExact]]
  * election verbatim. Stage 2 (near-dup): among exact SURVIVORS, a
  * doc dies if it is not the min-doc_id survivor of its LSH
  * connected-component cluster ([[DedupClusters.dedupClusters]]); the
  * canonical is re-elected among survivors because the corpus-level
  * cluster canonical may itself have died in stage 1 — sequential
  * semantics, exactly what a staged production run produces.
  *
  * Scale shape: stage 1 is one md5-keyed partial-agg groupBy + an
  * equi-join back; stage 2 joins the (bounded-LSH) cluster ledger on
  * doc_id and re-elects with a min() partial agg per cluster — no
  * windows, no corpus-sized intermediate beyond the ledgers the
  * stages themselves already produce. The rollup is one partial agg
  * to a per-source row.
  */
object Attrition {

  type Q = (SparkSession, String) => DataFrame

  def pipelineDedupAttrition: Q = (s, dir) => {
    val fp = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), md5(expr(TextOps.normExpr)).as("fp"))
    val keepExact = fp.groupBy("fp").agg(min(col("doc_id")).as("keep_id"))
    val st1 = fp.join(keepExact, "fp")
      .select(col("doc_id"), col("source"),
        (col("doc_id") =!= col("keep_id")).as("killed_exact"))
      .cache() // feeds both the per-source rollup and the survivor branch
    val surv = st1.filter(!col("killed_exact"))
      .join(DedupClusters.dedupClusters(s, dir).select("doc_id", "canonical_id"), "doc_id")
    val clusterKeep = surv.groupBy("canonical_id").agg(min(col("doc_id")).as("ck"))
    val st2 = surv.join(clusterKeep, "canonical_id")
      .select(col("source"), (col("doc_id") =!= col("ck")).as("killed_near"))
    val agg1 = st1.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("killed_exact"), 1L).otherwise(0L)).as("kill_exact"))
    val agg2 = st2.groupBy("source")
      .agg(sum(when(col("killed_near"), 1L).otherwise(0L)).as("kill_near"))
    agg1.join(agg2, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("kill_exact"),
        coalesce(col("kill_near"), lit(0L)).as("kill_near"),
        (col("n_docs") - col("kill_exact") -
          coalesce(col("kill_near"), lit(0L))).as("n_kept"))
  }

  val pipelineDedupAttritionSql: String =
    s"""WITH cl AS (
       |${DedupClusters.dedupClustersSql}
       |),
       |fp AS (SELECT doc_id, source, md5(${TextOps.normSqlDuck}) AS fp FROM documents),
       |ke AS (SELECT fp, MIN(doc_id) AS keep_id FROM fp GROUP BY fp),
       |st1 AS (
       |  SELECT f.doc_id, f.source, f.doc_id <> ke.keep_id AS killed_exact
       |  FROM fp f JOIN ke USING (fp)),
       |surv AS (
       |  SELECT st1.doc_id, st1.source, cl.canonical_id
       |  FROM st1 JOIN cl USING (doc_id) WHERE NOT killed_exact),
       |ck AS (SELECT canonical_id, MIN(doc_id) AS ck FROM surv GROUP BY canonical_id),
       |st2 AS (
       |  SELECT surv.source, surv.doc_id <> ck.ck AS killed_near
       |  FROM surv JOIN ck USING (canonical_id)),
       |agg1 AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN killed_exact THEN 1 ELSE 0 END) AS BIGINT) AS kill_exact
       |  FROM st1 GROUP BY source),
       |agg2 AS (
       |  SELECT source,
       |    CAST(SUM(CASE WHEN killed_near THEN 1 ELSE 0 END) AS BIGINT) AS kill_near
       |  FROM st2 GROUP BY source)
       |SELECT a1.source, a1.n_docs, a1.kill_exact,
       |  CAST(COALESCE(a2.kill_near, 0) AS BIGINT) AS kill_near,
       |  a1.n_docs - a1.kill_exact - CAST(COALESCE(a2.kill_near, 0) AS BIGINT) AS n_kept
       |FROM agg1 a1 LEFT JOIN agg2 a2 USING (source)""".stripMargin

  val queries: Map[String, Q] = Map("pipeline_dedup_attrition" -> pipelineDedupAttrition)
  val oracles: Map[String, String] = Map(
    "pipeline_dedup_attrition" -> pipelineDedupAttritionSql)
}
