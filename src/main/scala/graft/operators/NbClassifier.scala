package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed-feature Naive-Bayes quality classifier (SURVEY.md §2C) —
  * the "train a cheap linear classifier on a curated-vs-crawl split,
  * score the whole pool, keep what scores positive" curation step the
  * GPT-3 and LLaMA data pipelines ship (fastText/logistic in the
  * papers; multinomial NB here, whose training IS one aggregation
  * pass, so the whole train step is two tiny groupBys — no SGD, no
  * iteration, nothing order-dependent).
  *
  * Feature space is shared verbatim with [[Dsir]] (unigram + bigram →
  * 256 md5-prefix buckets). Training: POSITIVE class = the curated
  * reference split (`src0`, the same held-out convention as
  * pipeline_perplexity_filter / pipeline_dsir), NEGATIVE class = the
  * crawl sample (`src1`). Per-bucket add-1-smoothed log-likelihood
  * ratios quantize ONCE on the 256-row model to integer micro-nats
  *
  *   w(b) = round(1e6 · ln( ((p_b+1) · (N+256)) / ((n_b+1) · (P+256)) ))
  *
  * and the class prior folds in the same way
  * (prior = round(1e6 · ln(docs_pos / docs_neg))), so each scored
  * document's decision value  prior + Σ c(b)·w(b)  is EXACT BIGINT —
  * no float summation order anywhere near the keep/drop gate.
  * Documents from the two training splits are excluded from scoring
  * (a classifier is evaluated on data it did not train on); output is
  * the full per-doc ledger (score, keep = decision > 0) — what a
  * filter-rate monitor consumes.
  *
  * Scale shape: identical to DSIR's — map-side feature extraction,
  * per-(doc, bucket) partial agg, BROADCAST 256-row weight dict +
  * 1-row prior, and the only corpus-sized shuffle is the per-doc
  * rollup. Training cost is the same single pass at any corpus size.
  */
object NbClassifier {

  type Q = (SparkSession, String) => DataFrame

  private[operators] val NBUCKETS = 256
  private[operators] val POS = "src0"
  private[operators] val NEG = "src1"

  /** 256-row weight dictionary + the 1-row quantized prior. The dict
    * enumerates the FULL bucket domain (not just buckets seen in
    * training): under add-1 smoothing an unseen feature still carries
    * the nonzero weight ln((N+256)/(P+256)) — dropping it would bias
    * every out-of-vocabulary occurrence toward the larger class. */
  private[operators] def model(s: SparkSession, pdb: DataFrame): (DataFrame, DataFrame) = {
    val domain = s.range(NBUCKETS)
      .select(format_string("%02x", col("id")).as("bucket"))
    val posB = pdb.filter(col("source") === POS)
      .groupBy("bucket").agg(sum(col("c")).as("p_b"))
    val negB = pdb.filter(col("source") === NEG)
      .groupBy("bucket").agg(sum(col("c")).as("n_b"))
    val w = domain.join(posB, Seq("bucket"), "left").join(negB, Seq("bucket"), "left")
      .crossJoin(broadcast(posB.agg(sum(col("p_b")).as("pt"))))
      .crossJoin(broadcast(negB.agg(sum(col("n_b")).as("nt"))))
      .withColumn("w", expr(
        s"CAST(round(1e6 * ln((CAST(COALESCE(p_b, 0) + 1 AS DOUBLE) * (nt + $NBUCKETS)) / " +
          s"(CAST(COALESCE(n_b, 0) + 1 AS DOUBLE) * (pt + $NBUCKETS)))) AS BIGINT)"))
      .select("bucket", "w")
    val prior = pdb.select("doc_id", "source").distinct()
      .agg(
        sum(when(col("source") === POS, 1L).otherwise(0L)).as("dp"),
        sum(when(col("source") === NEG, 1L).otherwise(0L)).as("dn"))
      .select(expr(
        "CAST(round(1e6 * ln(CAST(dp AS DOUBLE) / CAST(dn AS DOUBLE))) AS BIGINT)")
        .as("prior"))
    (w, prior)
  }

  def pipelineNbClassifier: Q = (s, dir) => {
    val pdb = Dsir.perDocBuckets(s, dir).cache()
    val (w, prior) = model(s, pdb)
    val scored = pdb.filter(!col("source").isin(POS, NEG))
      .join(broadcast(w), "bucket")
      .groupBy("doc_id", "source")
      .agg(sum(col("c") * col("w")).as("llr_unats"), sum(col("c")).as("n_feats"))
    scored.crossJoin(broadcast(prior))
      .select(col("doc_id"), col("source"), col("n_feats"),
        (col("llr_unats") + col("prior")).as("score_unats"),
        (col("llr_unats") + col("prior") > 0).as("keep"))
  }

  /** The model's DuckDB CTEs (weight dict `w` + 1-row `prior`),
    * parameterized by the training source table — shared VERBATIM by
    * this oracle and `pipeline_nb_calibration`'s (which trains on the
    * md5-split half), the SQL-side mirror of both Scala paths sharing
    * [[model]]: a smoothing/prior change cannot drift between the two
    * oracles. */
  private[operators] def modelCtes(trainSrc: String): String =
    s"""posb AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS p_b FROM $trainSrc
       |         WHERE source = '$POS' GROUP BY bucket),
       |negb AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS n_b FROM $trainSrc
       |         WHERE source = '$NEG' GROUP BY bucket),
       |ptot AS (SELECT CAST(SUM(p_b) AS BIGINT) AS pt FROM posb),
       |ntot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS nt FROM negb),
       |dom AS (SELECT printf('%02x', i) AS bucket FROM range($NBUCKETS) t(i)),
       |w AS (
       |  SELECT dom.bucket,
       |    CAST(round(1e6 * ln(
       |      (CAST(COALESCE(p_b, 0) + 1 AS DOUBLE) * (nt + $NBUCKETS)) /
       |      (CAST(COALESCE(n_b, 0) + 1 AS DOUBLE) * (pt + $NBUCKETS)))) AS BIGINT) AS w
       |  FROM dom LEFT JOIN posb ON posb.bucket = dom.bucket
       |  LEFT JOIN negb ON negb.bucket = dom.bucket
       |  CROSS JOIN ptot CROSS JOIN ntot),
       |prior AS (
       |  SELECT CAST(round(1e6 * ln(
       |      CAST(COUNT(DISTINCT CASE WHEN source = '$POS' THEN doc_id END) AS DOUBLE) /
       |      CAST(COUNT(DISTINCT CASE WHEN source = '$NEG' THEN doc_id END) AS DOUBLE)))
       |    AS BIGINT) AS prior
       |  FROM $trainSrc)""".stripMargin

  val pipelineNbClassifierSql: String =
    s"""WITH ${Dsir.pdbCtes},
       |${modelCtes("pdb")},
       |scored AS (
       |  SELECT doc_id, source, CAST(SUM(c * w) AS BIGINT) AS llr_unats,
       |    CAST(SUM(c) AS BIGINT) AS n_feats
       |  FROM pdb JOIN w USING (bucket)
       |  WHERE source NOT IN ('$POS', '$NEG')
       |  GROUP BY doc_id, source)
       |SELECT doc_id, source, n_feats,
       |  llr_unats + prior AS score_unats,
       |  llr_unats + prior > 0 AS keep
       |FROM scored CROSS JOIN prior""".stripMargin

  /** STREAMING classifier (§2D twin): the 256-row weight dict + prior
    * are the offline-trained artifact a production pipeline broadcasts
    * to its ingest stream; documents arrive micro-batched, features
    * extract map-side, and every occurrence scores through a
    * STREAM-STATIC broadcast join — STATELESS (no watermark, no state
    * store), so the filter runs forever on an unbounded firehose.
    * Output and oracle shared verbatim with [[pipelineNbClassifier]]. */
  /** Offline artifacts staged once per (session, dir): the weight
    * dict + prior parquet-roundtrip exactly (integer micro-nats).
    * Registered so a bench harness can charge training to its own
    * staging line item (r12 verdict #2). */
  private def stagedModel(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    lazy val trained = model(s, Dsir.perDocBuckets(s, dir))
    (Staged.table(s, dir, "nbc_w")(trained._1),
      Staged.table(s, dir, "nbc_prior")(trained._2))
  }
  Staged.register("nbc_model")((s, dir) => { stagedModel(s, dir); () })

  def streamNbClassifier: Q = (s, dir) => {
    val (w, prior) = stagedModel(s, dir)
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    // r13 (r12 verdict #2): per-batch per-doc partial aggregates land
    // in a distributed parquet sink via foreachBatch instead of one
    // memory-sink row per feature occurrence (a corpus-sized driver
    // funnel); the final rollup re-aggregates the exact BIGINT partials
    val sink = graft.streaming.StreamStage.freshSink(s, dir, "snbc_sink")
    graft.streaming.StreamStage.withStaged(s, "snbc", dir, "documents.parquet") { stageDir =>
      val streamFeats = s.readStream.schema(sch).parquet(stageDir)
        .filter(!col("source").isin(POS, NEG))
        .select(col("doc_id"), col("source"),
          graft.functions.NgramExpressions.lower_tokens(col("text")).as("ws"))
        .select(col("doc_id"), col("source"), explode(
          concat(col("ws"), graft.functions.NgramExpressions.word_ngrams(col("ws"), 2))).as("feat"))
        .select(col("doc_id"), col("source"),
          substring(md5(col("feat")), 1, 2).as("bucket"))
      val scored = streamFeats.join(broadcast(w), "bucket")
        .select(col("doc_id"), col("source"), col("w"))
      // overwrite-by-batchId (r15, r14 verdict #2): a replayed batch
      // after a crash-between-write-and-commit must not double-count
      graft.streaming.StreamStage.drain(s, "d")(scored.writeStream.outputMode("append")
        .foreachBatch(graft.streaming.StreamStage.idempotentBatchWriter(sink) {
          batch => batch.groupBy("doc_id", "source")
            .agg(sum(col("w")).as("s"), count(lit(1)).as("c"))
        }))
    }
    s.read.parquet(sink)
      .groupBy("doc_id", "source")
      .agg(sum(col("s")).as("llr_unats"), sum(col("c")).as("n_feats"))
      .crossJoin(broadcast(prior))
      .select(col("doc_id"), col("source"), col("n_feats"),
        (col("llr_unats") + col("prior")).as("score_unats"),
        (col("llr_unats") + col("prior") > 0).as("keep"))
  }

  val queries: Map[String, Q] = Map(
    "pipeline_nb_classifier" -> pipelineNbClassifier,
    "stream_nb_classifier" -> streamNbClassifier)
  val oracles: Map[String, String] = Map(
    "pipeline_nb_classifier" -> pipelineNbClassifierSql,
    "stream_nb_classifier" -> pipelineNbClassifierSql)
}
