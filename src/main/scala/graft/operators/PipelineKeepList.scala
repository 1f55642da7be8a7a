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

  private val REP_MAX = 0.2

  /** Per-document keep/drop decision with REASONS — the auditable form
    * of a curation filter (a 100 TB run keeps the drop ledger for
    * filter-rate monitoring; a bare keep-list can't tell you WHY the
    * corpus shrank). Composes four already-oracle-checked signals:
    * quality score, Gopher repetition, language ID, benchmark
    * contamination. Every signal join is per-doc_id (left joins, the
    * sparse contamination side pre-filtered to flagged docs), so the
    * ledger costs the same shuffle shape as the keep-list itself.
    * Signals that don't apply (rep_ratio of a <3-word doc) skip their
    * check via null semantics — identically in both engines. */
  def pipelineQualityFilter: Q = (s, dir) => {
    val q = TextOps.textQuality(s, dir).select("doc_id", "quality_score")
    val rep = TextOps.textRepetition(s, dir).select("doc_id", "rep_ratio")
    val lid = TextOps.textLangId(s, dir).select("doc_id", "pred_lang")
    val cont = Contamination.pipelineContamination(s, dir)
      .filter(col("flagged")).select("doc_id", "flagged")
    t(s, dir, "documents").select("doc_id")
      .join(q, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"), "left")
      .join(lid, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .withColumn("drop_reasons", concat_ws(",",
        when(col("quality_score") < QUALITY_MIN, lit("quality")),
        when(col("rep_ratio") > REP_MAX, lit("repetition")),
        when(col("pred_lang") === "und", lit("langid")),
        when(col("flagged"), lit("contaminated"))))
      .select(col("doc_id"), col("drop_reasons"),
        (col("drop_reasons") === "").as("keep"))
  }

  val pipelineQualityFilterSql: String =
    s"""WITH q AS (${TextOps.textQualitySql}),
       |rep AS (${TextOps.textRepetitionSql}),
       |lid AS (${TextOps.textLangIdSql}),
       |cont AS (${Contamination.pipelineContaminationSql}),
       |led AS (
       |  SELECT d.doc_id,
       |    concat_ws(',',
       |      CASE WHEN q.quality_score < $QUALITY_MIN THEN 'quality' END,
       |      CASE WHEN rep.rep_ratio > $REP_MAX THEN 'repetition' END,
       |      CASE WHEN lid.pred_lang = 'und' THEN 'langid' END,
       |      CASE WHEN c2.flagged THEN 'contaminated' END) AS drop_reasons
       |  FROM documents d
       |  LEFT JOIN q ON q.doc_id = d.doc_id
       |  LEFT JOIN rep ON rep.doc_id = d.doc_id
       |  LEFT JOIN lid ON lid.doc_id = d.doc_id
       |  LEFT JOIN (SELECT doc_id, flagged FROM cont WHERE flagged) c2
       |    ON c2.doc_id = d.doc_id)
       |SELECT doc_id, drop_reasons, drop_reasons = '' AS keep FROM led""".stripMargin

  /** Temperature-adjusted data-mixing weights per source shard
    * (α = 0.5 up-samples rare sources, the standard multi-corpus
    * sampling device): token-mass shares, then
    * w_i = share_i^α / Σ share_j^α. Two tiny aggregates (per-source,
    * then the totals — broadcast back); everything heavy is one
    * partial-agg'd token-count pass over the corpus. The α-powered
    * terms are floor-quantized to 1e-15 before the normalizing sum so
    * the denominator is an INTEGER sum — bit-identical cross-engine
    * regardless of float summation order. */
  def pipelineMixWeights: Q = (s, dir) => {
    val tok = t(s, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("ntok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
    val tot = tok.agg(sum(col("n_tokens")).as("tot"))
    val sh = tok.crossJoin(broadcast(tot))
      .withColumn("share", expr("CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)"))
      .withColumn("sqf", expr("CAST(floor(sqrt(share) * 1e15) AS BIGINT)"))
    val den = sh.agg(sum(col("sqf")).as("den"))
    sh.crossJoin(broadcast(den))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share"),
        expr("CAST(sqf AS DOUBLE) / CAST(den AS DOUBLE)").as("mix_weight"))
  }

  val pipelineMixWeightsSql: String =
    """WITH tok AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM tok),
      |sh AS (
      |  SELECT tok.*,
      |    CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
      |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e15) AS BIGINT) AS sqf
      |  FROM tok CROSS JOIN tot),
      |den AS (SELECT CAST(SUM(sqf) AS BIGINT) AS den FROM sh)
      |SELECT source, n_docs, n_tokens, share,
      |  CAST(sqf AS DOUBLE) / CAST(den AS DOUBLE) AS mix_weight
      |FROM sh CROSS JOIN den""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipeline_keep_list" -> pipelineKeepList,
    "pipeline_quality_filter" -> pipelineQualityFilter,
    "pipeline_mix_weights" -> pipelineMixWeights)
  val oracles: Map[String, String] = Map(
    "pipeline_keep_list" -> pipelineKeepListSql,
    "pipeline_quality_filter" -> pipelineQualityFilterSql,
    "pipeline_mix_weights" -> pipelineMixWeightsSql)
}
