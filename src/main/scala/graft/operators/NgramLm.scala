package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bigram language-model quality scoring (SURVEY.md §2C) — the
  * CCNet/RefinedWeb device in its cross-engine-exact form: documents
  * whose word transitions are corpus-typical score high, word salad
  * scores low. A real pipeline scores with a trained KenLM; the
  * OPERATOR is the same either way — train transition statistics on
  * the corpus, broadcast-or-join them back, score every document —
  * and this form keeps the gate meaningful by replacing floating
  * log-perplexity (whose last ulp differs across engines) with exact
  * integer transition frequencies:
  *
  *   q(w1, w2) = (1,000,000 · c(w1, w2)) div c(w1 ·)
  *
  * — ppm-quantized conditional frequency P(w2 | w1) over bigram
  * heads, all BIGINT. The per-doc score is the exact pair
  * (Σq, n_bigrams) plus the one double division both engines perform
  * identically.
  *
  * Scale shape: bigram extraction is MAP-SIDE (an array transform
  * over each doc's own token list — adjacent pairs never cross rows,
  * so there is no positional self-join); the count tables are
  * partial-aggregated on (w1, w2) / (w1); the dictionary joins back
  * to occurrences on the bigram key with AQE handling the Zipf head
  * (the broadcast hot-head split of text_commonness applies verbatim
  * if a corpus's "of the" outgrows a reducer).
  */
object NgramLm {

  type Q = (SparkSession, String) => DataFrame

  private def bigrams(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.NgramExpressions.lower_tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.NgramExpressions.word_bigram_structs(col("ws"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Per-doc transition-typicality: n_bigrams, Σq (BIGINT-exact), and
    * the mean as one double division. */
  def textNgramLm: Q = (s, dir) => {
    val bi = bigrams(s, dir).cache() // feeds both count passes + the score join
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("n1"))
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    val dict = c2.join(c1, "w1")
      .withColumn("q", expr("(1000000 * n2) div n1"))
      .select("w1", "w2", "q")
    bi.join(dict, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("q")).as("sum_q"),
        (sum(col("q")).cast(DoubleType) / count(lit(1))).as("mean_q"))
  }

  val textNgramLmSql: String =
    """WITH base AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w != '') AS ws
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
      |        FROM base WHERE len(ws) >= 2)),
      |c1 AS (SELECT w1, COUNT(*) AS n1 FROM bi GROUP BY w1),
      |c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bi GROUP BY w1, w2),
      |dict AS (SELECT w1, w2, (1000000 * n2) // n1 AS q
      |         FROM c2 JOIN c1 USING (w1))
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(q) AS BIGINT) AS sum_q,
      |  CAST(SUM(q) AS DOUBLE) / COUNT(*) AS mean_q
      |FROM bi JOIN dict USING (w1, w2)
      |GROUP BY doc_id""".stripMargin

  /** PERPLEXITY-STYLE LM FILTER (SURVEY.md §2C) — the CCNet/
    * RefinedWeb curation step in its held-out, cross-engine-exact
    * form: transition statistics train on a REFERENCE SPLIT only
    * (source `src0`, standing in for the Wikipedia-trained KenLM a
    * real pipeline ships), every document scores against that fixed
    * model, and documents whose transitions are atypical of the
    * reference distribution drop. Unseen transitions score 0 ppm
    * (the OOV penalty that makes a held-out model a FILTER rather
    * than a self-fulfilling score), documents too short to have a
    * bigram drop as `short`, and the keep rule is the integer
    * cross-multiplication `sum_q >= T * n_bigrams` (mean >= T ppm
    * with no float division anywhere near the gate).
    *
    * Scale shape: the dict is reference-split-sized and joins back
    * LEFT to map-side-extracted bigram occurrences on (w1, w2) —
    * broadcast when the reference model is dictionary-sized, AQE
    * otherwise; per-doc and per-source aggregations are partial.
    * The ledger (per source: scored/kept/dropped/short + exact kept
    * mass) mirrors pipeline_quality_filter's drop-reasons posture. */
  private val PPL_T = 30000L // keep docs averaging >= 3% conditional ppm

  /** Per-doc held-out scores (doc_id, n_bigrams, sum_q) against the
    * src0-trained dict — the scoring pass shared by the filter and
    * [[CcnetBuckets]].
    *
    * r17 optimization round (guide §1.2 step 1, §3.1): the reference
    * dict is the session-staged [[stagedPplDict]] — the SAME trained
    * artifact the streaming twin has broadcast since r16 (training a
    * reference LM is index-build work a pipeline pays once, the
    * stok_vocab/nbc_model posture) — so the batch keys stop re-training
    * it per invocation. The dict is BROADCAST into the left join: a
    * reference model is fixed-size corpus metadata (a real CCNet ships
    * a KenLM to every worker), so the corpus-sized bigram side never
    * shuffles for the lookup. The SCORING pass — map-side bigram
    * extraction over every document, the dict probe, the per-doc and
    * per-source rollups — stays timed; only dict training moved to the
    * visible staging line. Plan diff committed in plans/r17
    * (pipeline_perplexity_filter 20 → fewer Exchanges, the two dict
    * SortMergeJoins replaced by one BroadcastHashJoin); oracle
    * unchanged and re-passed on all three consumer keys. */
  private[graft] def heldOutScores(s: SparkSession, dir: String): DataFrame = {
    bigrams(s, dir)
      .join(broadcast(stagedPplDict(s, dir)), Seq("w1", "w2"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("q"), lit(0L))).as("sum_q"))
  }

  /** The scoring CTE chain behind [[heldOutScores]] (base → bi → ref
    * → c1/c2 → dict → scored), shared with [[CcnetBuckets]]'s
    * oracle. */
  private[operators] val heldOutScoreCtes: String =
    """base AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w != '') AS ws
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
      |        FROM base WHERE len(ws) >= 2)),
      |ref AS (SELECT bi.* FROM bi JOIN documents d USING (doc_id)
      |        WHERE d.source = 'src0'),
      |c1 AS (SELECT w1, COUNT(*) AS n1 FROM ref GROUP BY w1),
      |c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM ref GROUP BY w1, w2),
      |dict AS (SELECT w1, w2, (1000000 * n2) // n1 AS q
      |         FROM c2 JOIN c1 USING (w1)),
      |scored AS (
      |  SELECT doc_id, COUNT(*) AS n_bigrams,
      |    SUM(COALESCE(q, 0)) AS sum_q
      |  FROM bi LEFT JOIN dict USING (w1, w2)
      |  GROUP BY doc_id)""".stripMargin

  def pipelinePerplexityFilter: Q = (s, dir) => {
    val scored = heldOutScores(s, dir)
    t(s, dir, "documents").select("doc_id", "source")
      .join(scored, Seq("doc_id"), "left")
      .withColumn("short", col("n_bigrams").isNull)
      .withColumn("keep",
        !col("short") && col("sum_q") >= lit(PPL_T) * col("n_bigrams"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("short") && !col("keep"), 1L).otherwise(0L)).as("n_dropped_lowppl"),
        sum(when(col("short"), 1L).otherwise(0L)).as("n_short"),
        sum(when(col("keep"), col("sum_q")).otherwise(0L)).as("sum_q_kept"),
        sum(when(col("keep"), col("n_bigrams")).otherwise(0L)).as("n_bigrams_kept"))
  }

  val pipelinePerplexityFilterSql: String =
    s"""WITH $heldOutScoreCtes,
       |lab AS (
       |  SELECT d.source, s.n_bigrams, s.sum_q,
       |    s.n_bigrams IS NULL AS short,
       |    s.n_bigrams IS NOT NULL AND s.sum_q >= $PPL_T * s.n_bigrams AS keep
       |  FROM documents d LEFT JOIN scored s USING (doc_id))
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN NOT short AND NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_lowppl,
       |  CAST(SUM(CASE WHEN short THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
       |  CAST(SUM(CASE WHEN keep THEN sum_q ELSE 0 END) AS BIGINT) AS sum_q_kept,
       |  CAST(SUM(CASE WHEN keep THEN n_bigrams ELSE 0 END) AS BIGINT) AS n_bigrams_kept
       |FROM lab GROUP BY source""".stripMargin

  /** STREAMING LM FILTER (§2D twin): the trained reference-split dict
    * is exactly the artifact a production pipeline broadcasts to its
    * ingest stream — here documents arrive as a micro-batched stream,
    * bigrams extract map-side, and each scores through a
    * STREAM-STATIC left join against the fixed dict (STATELESS by
    * construction: no watermark, no state store — static-side lookups
    * never buffer stream rows), with the per-doc/per-source ledger
    * aggregated from the sink. Output and oracle shared with
    * [[pipelinePerplexityFilter]], so the stream path must score
    * every document identically to the batch path. */
  // held-out LM dict staged once per (session, dir) — the offline
  // artifact a production stream broadcasts, not a per-query train;
  // integer q values parquet-roundtrip exactly
  private def stagedPplDict(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "ppl_dict", coalesce = false) {
      val docs = t(s, dir, "documents")
      val ref = bigrams(s, dir).join(
        docs.filter(col("source") === "src0").select("doc_id"), "doc_id")
      val c1 = ref.groupBy("w1").agg(count(lit(1)).as("n1"))
      ref.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
        .join(c1, "w1")
        .withColumn("q", expr("(1000000 * n2) div n1"))
        .select("w1", "w2", "q")
    }
  Staged.register("ppl_dict")((s, dir) => { stagedPplDict(s, dir); () })

  def streamPerplexityFilter: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val dict = stagedPplDict(s, dir)
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "sppl", dir, "documents.parquet") { stageDir =>
      val streamBi = s.readStream.schema(sch).parquet(stageDir)
        .select(col("doc_id"),
          graft.functions.NgramExpressions.lower_tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"),
          explode(graft.functions.NgramExpressions.word_bigram_structs(col("ws"))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val scored = streamBi.join(broadcast(dict), Seq("w1", "w2"), "left")
        .select(col("doc_id"), coalesce(col("q"), lit(0L)).as("q_eff"))
      graft.streaming.StreamStage.drain(s, "ppl")(scored.writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_ppl"))
    }
    val perDoc = s.table("graft_stream_ppl")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q_eff")).as("sum_q"))
    docs.select("doc_id", "source")
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("short", col("n_bigrams").isNull)
      .withColumn("keep",
        !col("short") && col("sum_q") >= lit(PPL_T) * col("n_bigrams"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("short") && !col("keep"), 1L).otherwise(0L)).as("n_dropped_lowppl"),
        sum(when(col("short"), 1L).otherwise(0L)).as("n_short"),
        sum(when(col("keep"), col("sum_q")).otherwise(0L)).as("sum_q_kept"),
        sum(when(col("keep"), col("n_bigrams")).otherwise(0L)).as("n_bigrams_kept"))
  }

  val queries: Map[String, Q] = Map(
    "text_ngram_lm" -> textNgramLm,
    "pipeline_perplexity_filter" -> pipelinePerplexityFilter,
    "stream_perplexity_filter" -> streamPerplexityFilter)
  val oracles: Map[String, String] = Map(
    "text_ngram_lm" -> textNgramLmSql,
    "pipeline_perplexity_filter" -> pipelinePerplexityFilterSql,
    "stream_perplexity_filter" -> pipelinePerplexityFilterSql)
}
