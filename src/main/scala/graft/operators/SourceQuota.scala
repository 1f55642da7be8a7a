package graft.operators

import graft.Tables._
import graft.functions.TextOps.{sqlList, stoplist}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Per-source document QUOTA and corpus-balance ledger (SURVEY.md
  * §2C) — the domain-cap curation step: no single source (domain,
  * crawl host, shard provider) may contribute more than K documents,
  * and when a source exceeds its cap the BEST K by quality survive.
  * Published web-scale pipelines apply exactly this shape to stop a
  * handful of mega-domains from dominating the training mix (the
  * C4/RefinedWeb per-domain cap posture).
  *
  * Cross-engine-exact and SCALE-SAFE selection: top-K-per-source is
  * NOT a per-source sort. The composite quality score quantizes to an
  * integer ppm key (`qk`, pure BIGINT arithmetic — every term a
  * floor-divided rational of row integers, so both engines agree
  * bit-for-bit), the per-(source, qk) HISTOGRAM gets
  * counts-from-above via a window over the histogram — never over
  * docs — and whole key groups classify map-side against the cap
  * (cb ≥ K → drop all, cb+c ≤ K → keep all). Only the ONE key group
  * straddling the cap ranks, by doc_id, over a window bounded by that
  * group's tie count. The ledger carries `kept_docid_sum`, so the
  * oracle gates the selected SET, not just its size.
  *
  * The corpus shuffles ONCE — into a histogram that carries per-key
  * doc_id/char sums, so whole key groups contribute to the ledger
  * from histogram rows alone; doc rows are touched a second time only
  * for the ≤1-per-source tie groups, through a broadcast join that
  * prunes that pass map-side.
  *
  * The streaming twin maintains the (source, qk) histogram as a
  * complete-mode aggregation (state = one row per live key, bounded
  * by the ppm key domain — metadata-sized next to a 100 TB corpus)
  * and runs the identical cut math on the drained totals: a streaming
  * ingest can enforce/refresh its domain caps incrementally without
  * rescanning the corpus.
  */
object SourceQuota {

  type Q = (SparkSession, String) => DataFrame

  /** Per-source document cap. 20 sources × 25 docs at the sf0.01
    * oracle gate, so the cap genuinely bites on every source. */
  private val QUOTA = 15L

  /** `text_quality`'s composite score on the exact 1e6 (ppm) integer
    * grid: 0.4·min(n_words/50, 1) + 0.3·stop_ratio
    * + 0.3·min(avg_word_len/8, 1), each term floor-quantized
    * independently so the key is pure BIGINT on both engines. Spark
    * `DIV` and DuckDB `//` agree on the nonnegative operands here. */
  private val qkExpr =
    "8000 * least(n_words, 50) + (300000 * n_stop) DIV n_words" +
      " + least((300000 * (length(text) - n_words + 1)) DIV (8 * n_words), 300000)"

  /** The map-side scoring projection over any documents relation —
    * shared by the batch key and BOTH stream twins (r16), so the
    * quality key the cut is computed on and the key the enforcement
    * pass classifies docs with are one expression chain. */
  private def scoreCols(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_words", size(split(col("text"), " ")).cast(LongType))
      .withColumn("n_stop",
        graft.functions.NgramExpressions.count_tokens_in(col("text"), stoplist)
          .cast(LongType))
      .withColumn("qk", expr(qkExpr))
      .select("doc_id", "source", "n_chars", "qk")

  private[graft] def scored(s: SparkSession, dir: String): DataFrame =
    scoreCols(t(s, dir, "documents"))

  /** (source, qk) histogram → per-key-group keep count against the
    * cap: c (keep whole group), 0 (drop whole group), or the straddle
    * remainder K − cb for the single tie group per source. */
  private def keepPlan(hist: DataFrame): DataFrame = {
    val wcum = Window.partitionBy("source").orderBy(col("qk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cb", coalesce(sum(col("c")).over(wcum), lit(0L)))
      .withColumn("keep_m",
        when(col("cb") >= QUOTA, lit(0L))
          .when(col("cb") + col("c") <= QUOTA, col("c"))
          .otherwise(lit(QUOTA) - col("cb")))
      .select("source", "qk", "c", "keep_m")
  }

  def pipelineSourceQuota: Q = (s, dir) => {
    val docs = scored(s, dir)
    // the histogram carries per-(source, qk) doc_id/char sums, so
    // WHOLE key groups contribute to the ledger from histogram rows
    // alone — the corpus shuffles ONCE, into the histogram
    val plan = docs.groupBy("source", "qk")
      .agg(count(lit(1)).as("c"), sum(col("doc_id")).as("sd"),
        sum(col("n_chars")).as("sch"))
      .transform(h => keepPlan(h).drop("c").join(h, Seq("source", "qk")))
    val base = plan.groupBy("source")
      .agg(sum(col("c")).as("n_docs"), sum(col("keep_m")).as("n_kept"),
        sum(col("c") - col("keep_m")).as("n_dropped"),
        min(when(col("keep_m") > 0L, col("qk"))).as("cut_qk"),
        sum(when(col("keep_m") === col("c"), col("sd"))).as("full_sd"),
        sum(when(col("keep_m") === col("c"), col("sch"))).as("full_sch"))
    // only the straddling tie group (≤1 per source) needs doc rows: a
    // broadcast semi-style join prunes the second pass map-side, and
    // the ranking window's partition is bounded by that group's ties
    val tieKeys = plan.filter(col("keep_m") > 0L && col("keep_m") < col("c"))
      .select("source", "qk", "keep_m")
    val tie = docs.join(broadcast(tieKeys), Seq("source", "qk"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("source", "qk").orderBy(col("doc_id"))))
      .filter(col("rn") <= col("keep_m"))
      .groupBy("source")
      .agg(sum(col("doc_id")).as("tie_sd"), sum(col("n_chars")).as("tie_sch"))
    base.join(tie, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_kept"), col("n_dropped"),
        col("cut_qk"),
        (coalesce(col("full_sd"), lit(0L)) + coalesce(col("tie_sd"), lit(0L)))
          .as("kept_docid_sum"),
        (coalesce(col("full_sch"), lit(0L)) + coalesce(col("tie_sch"), lit(0L)))
          .as("kept_chars"))
  }

  private val scoredCte =
    s"""d AS (
       |  SELECT doc_id, source, n_chars,
       |    8000 * least(n_words, 50) + (300000 * n_stop) // n_words
       |      + least((300000 * (length(text) - n_words + 1)) // (8 * n_words), 300000)
       |      AS qk
       |  FROM (
       |    SELECT doc_id, source, n_chars, text,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |      CAST(len(list_filter(string_split(text, ' '),
       |        w -> w IN (${sqlList(stoplist)}))) AS BIGINT) AS n_stop
       |    FROM documents)),
       |hist AS (SELECT source, qk, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
       |k AS (
       |  SELECT source, qk, c,
       |    CASE WHEN cb >= $QUOTA THEN 0
       |         WHEN cb + c <= $QUOTA THEN c
       |         ELSE $QUOTA - cb END AS keep_m
       |  FROM (
       |    SELECT source, qk, c,
       |      COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY qk DESC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
       |    FROM hist))""".stripMargin

  val pipelineSourceQuotaSql: String =
    s"""WITH $scoredCte,
       |r AS (
       |  SELECT d.doc_id, d.source, d.n_chars, d.qk, k.c, k.keep_m,
       |    row_number() OVER (PARTITION BY d.source, d.qk ORDER BY d.doc_id) AS rn
       |  FROM d JOIN k USING (source, qk)),
       |f AS (SELECT *, keep_m = c OR (keep_m > 0 AND rn <= keep_m) AS kept FROM r)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       |  CAST(MIN(CASE WHEN kept THEN qk END) AS BIGINT) AS cut_qk,
       |  CAST(SUM(CASE WHEN kept THEN doc_id END) AS BIGINT) AS kept_docid_sum,
       |  CAST(SUM(CASE WHEN kept THEN n_chars END) AS BIGINT) AS kept_chars
       |FROM f GROUP BY source""".stripMargin

  /** STREAMING quota twin: the (source, qk) histogram accumulates as
    * a complete-mode streaming aggregation over a file stream of the
    * corpus, then the identical [[keepPlan]] cut runs batch-side on
    * the drained totals. The ledger is everything the histogram alone
    * determines (counts + cut key); doc-level set proof is the batch
    * key's job — a histogram cannot name the tie group's members. */
  def streamSourceQuota: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "ssq", dir, "documents.parquet") { stageDir =>
      val hist = scoreCols(s.readStream.schema(sch).parquet(stageDir))
        .groupBy("source", "qk")
        .agg(count(lit(1)).as("c"))
      graft.streaming.StreamStage.drain(s, "sq")(hist.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_sq"))
    }
    keepPlan(s.table("graft_stream_sq"))
      .groupBy("source")
      .agg(sum(col("c")).as("n_docs"),
        sum(col("keep_m")).as("n_kept"),
        sum(col("c") - col("keep_m")).as("n_dropped"),
        min(when(col("keep_m") > 0L, col("qk"))).as("cut_qk"))
  }

  val streamSourceQuotaSql: String =
    s"""WITH $scoredCte
       |SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
       |  CAST(SUM(keep_m) AS BIGINT) AS n_kept,
       |  CAST(SUM(c - keep_m) AS BIGINT) AS n_dropped,
       |  CAST(MIN(CASE WHEN keep_m > 0 THEN qk END) AS BIGINT) AS cut_qk
       |FROM k GROUP BY source""".stripMargin

  /** STREAMING quota with DOC-LEVEL enforcement (r16 — r15 verdict #2,
    * closing the gap the histogram twin names: a histogram cannot name
    * the tie group's kept MEMBERS, but a streaming curation pipeline
    * enforcing caps inline needs the per-doc keep/drop decision). Two
    * passes over the doc stream, both scale-safe:
    *
    *  1. the histogram drain (state = one row per live (source, qk)
    *     key — metadata-sized, [[streamSourceQuota]]'s exact shape);
    *  2. a STATELESS enforcement pass: docs score map-side with the
    *     shared [[scoreCols]] chain and inner-join a BROADCAST of the
    *     drained cut (only keys with keep_m > 0 — the kept-or-tie
    *     sliver of the key domain), landing candidate keeps in a
    *     distributed parquet sink. At 100 TB this is the shape that
    *     runs at ingest: the cut is corpus metadata refreshed by pass
    *     1; enforcement costs one broadcast probe per arriving doc.
    *
    * Whole key groups (keep_m = c) are kept outright from the sink;
    * only the ≤1-per-source straddling tie group ranks by doc_id, over
    * a window bounded by that group's tie count — the batch key's
    * exact tie discipline. Output is the kept SET itself (doc_id,
    * source, qk), row-for-row hash-gated against the batch oracle —
    * stronger than the ledger's kept_docid_sum. */
  def streamSourceQuotaDocs: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    val sink = graft.streaming.StreamStage.freshSink(s, dir, "ssqd_sink")
    graft.streaming.StreamStage.withStaged(s, "ssqd", dir, "documents.parquet") { stageDir =>
      val hist = scoreCols(s.readStream.schema(sch).parquet(stageDir))
        .groupBy("source", "qk")
        .agg(count(lit(1)).as("c"))
      graft.streaming.StreamStage.drain(s, "sqd")(hist.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_sqd"))
      val cut = keepPlan(s.table("graft_stream_sqd"))
        .filter(col("keep_m") > 0L)
      val kept = scoreCols(s.readStream.schema(sch).parquet(stageDir))
        .join(broadcast(cut), Seq("source", "qk")) // stream-static, stateless
        .select("doc_id", "source", "qk", "c", "keep_m")
      graft.streaming.StreamStage.drain(s, "sq_enforce")(kept.writeStream.outputMode("append")
        .format("parquet").option("path", sink))
    }
    val out = s.read.parquet(sink)
    val full = out.filter(col("keep_m") === col("c"))
      .select("doc_id", "source", "qk")
    val tie = out.filter(col("keep_m") < col("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source", "qk").orderBy(col("doc_id"))))
      .filter(col("rn") <= col("keep_m"))
      .select("doc_id", "source", "qk")
    full.unionByName(tie)
  }

  val streamSourceQuotaDocsSql: String =
    s"""WITH $scoredCte,
       |r AS (
       |  SELECT d.doc_id, d.source, d.qk, k.c, k.keep_m,
       |    row_number() OVER (PARTITION BY d.source, d.qk ORDER BY d.doc_id) AS rn
       |  FROM d JOIN k USING (source, qk))
       |SELECT doc_id, source, qk
       |FROM r WHERE keep_m = c OR (keep_m > 0 AND rn <= keep_m)""".stripMargin

  /** Per-source CHARACTER budget. ~25 docs × ~300 chars per source at
    * the sf0.01 oracle gate, so a 4000-char budget genuinely cuts
    * mid-source everywhere. */
  private val CHAR_BUDGET = 4000L

  /** Per-source CHARACTER-BUDGET quota (r16) — the token-mass twin of
    * [[pipelineSourceQuota]]: real pipelines cap a domain's share of
    * the training mix by TOKEN MASS, not document count (a domain of
    * ten book-length documents outweighs a thousand tweets), so the
    * cut is the maximal quality-ordered PREFIX whose cumulative
    * n_chars fits the budget — order (qk DESC, doc_id ASC), strictly
    * prefix semantics (the first doc that would overflow ends the
    * prefix; no knapsack back-fill, so the kept set is reproducible
    * and order-independent of arrival).
    *
    * Scale shape: the SAME one-corpus-shuffle histogram-cut device —
    * the (source, qk) histogram carries per-key char/doc_id sums,
    * chars-from-above cumulate over HISTOGRAM rows, whole key groups
    * classify map-side against the budget (cb ≥ B → drop all,
    * cb + sch ≤ B → keep all), and only the ≤1-per-source straddling
    * group touches doc rows again, through a broadcast join carrying
    * that group's REMAINING budget, with a cumulative-char window
    * bounded by the group's tie count. Ledger carries kept_docid_sum
    * and kept_chars, so the oracle gates the selected SET and its
    * exact mass. */
  def pipelineSourceQuotaChars: Q = (s, dir) => {
    val docs = scored(s, dir)
    val hist = docs.groupBy("source", "qk")
      .agg(count(lit(1)).as("c"), sum(col("n_chars")).as("sch"),
        sum(col("doc_id")).as("sd"))
    val wcum = Window.partitionBy("source").orderBy(col("qk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val plan = hist
      .withColumn("cb", coalesce(sum(col("sch")).over(wcum), lit(0L)))
      .cache() // metadata-sized: base ledger + tie-key extraction
    val base = plan.groupBy("source")
      .agg(sum(col("c")).as("n_docs"), sum(col("sch")).as("total_chars"),
        sum(when(col("cb") + col("sch") <= CHAR_BUDGET, col("c"))).as("full_n"),
        sum(when(col("cb") + col("sch") <= CHAR_BUDGET, col("sch"))).as("full_sch"),
        sum(when(col("cb") + col("sch") <= CHAR_BUDGET, col("sd"))).as("full_sd"),
        min(when(col("cb") + col("sch") <= CHAR_BUDGET, col("qk"))).as("full_cut_qk"))
    val tieKeys = plan
      .filter(col("cb") < CHAR_BUDGET && col("cb") + col("sch") > CHAR_BUDGET)
      .select(col("source"), col("qk"), (lit(CHAR_BUDGET) - col("cb")).as("rem"))
    val wtie = Window.partitionBy("source", "qk").orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tie = docs.join(broadcast(tieKeys), Seq("source", "qk"))
      .withColumn("cum", sum(col("n_chars")).over(wtie))
      .filter(col("cum") <= col("rem"))
      .groupBy("source")
      .agg(count(lit(1)).as("tie_n"), sum(col("n_chars")).as("tie_sch"),
        sum(col("doc_id")).as("tie_sd"), min(col("qk")).as("tie_qk"))
    base.join(tie, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("total_chars"),
        (coalesce(col("full_n"), lit(0L)) + coalesce(col("tie_n"), lit(0L)))
          .as("n_kept"),
        (coalesce(col("full_sch"), lit(0L)) + coalesce(col("tie_sch"), lit(0L)))
          .as("kept_chars"),
        (coalesce(col("full_sd"), lit(0L)) + coalesce(col("tie_sd"), lit(0L)))
          .as("kept_docid_sum"),
        least(coalesce(col("full_cut_qk"), col("tie_qk")),
          coalesce(col("tie_qk"), col("full_cut_qk"))).as("cut_qk"))
  }

  val pipelineSourceQuotaCharsSql: String =
    s"""WITH $scoredCte,
       |o AS (
       |  SELECT doc_id, source, n_chars, qk,
       |    SUM(n_chars) OVER (PARTITION BY source ORDER BY qk DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |  CAST(SUM(CASE WHEN cum <= $CHAR_BUDGET THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(COALESCE(SUM(CASE WHEN cum <= $CHAR_BUDGET THEN n_chars END), 0) AS BIGINT) AS kept_chars,
       |  CAST(COALESCE(SUM(CASE WHEN cum <= $CHAR_BUDGET THEN doc_id END), 0) AS BIGINT) AS kept_docid_sum,
       |  CAST(MIN(CASE WHEN cum <= $CHAR_BUDGET THEN qk END) AS BIGINT) AS cut_qk
       |FROM o GROUP BY source""".stripMargin

  /** STREAMING char-budget quota with DOC-LEVEL enforcement (r16 —
    * the char-budget member of the enforcement matrix, composing the
    * two delivered devices exactly as [[streamSourceQuotaDocs]]
    * composes the doc-count ones): pass 1 drains the (source, qk)
    * histogram WITH char mass (state = one row per live key,
    * metadata-sized); the drained rows classify against the budget
    * batch-side (chars-from-above over HISTOGRAM rows — never over
    * docs), producing a cut of keep-whole keys plus the
    * ≤1-per-source straddling key carrying its REMAINING budget;
    * pass 2 is a STATELESS enforcement stream — docs score map-side
    * with the shared [[scoreCols]] chain, inner-join the BROADCAST
    * cut, and land in a distributed parquet sink. Whole key groups
    * keep outright; the straddling group ranks by doc_id under a
    * tie-bounded cumulative-char window against its remainder —
    * strict prefix semantics, the batch key's exact discipline.
    * Output is the kept SET itself (doc_id, source, qk), hash-gated
    * row-for-row against the quality-ordered-prefix oracle. At
    * ingest scale: the cut is corpus metadata refreshed by pass 1;
    * enforcement costs one broadcast probe per arriving doc. */
  def streamSourceQuotaChars: Q = (s, dir) => {
    val sch0 = s.read.parquet(s"$dir/documents.parquet").schema
    val sink = graft.streaming.StreamStage.freshSink(s, dir, "ssqc_sink")
    graft.streaming.StreamStage.withStaged(s, "ssqc", dir, "documents.parquet") { stageDir =>
      val hist = scoreCols(s.readStream.schema(sch0).parquet(stageDir))
        .groupBy("source", "qk")
        .agg(count(lit(1)).as("c"), sum(col("n_chars")).as("sch"))
      graft.streaming.StreamStage.drain(s, "sqc")(hist.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_sqc"))
      val wcum = Window.partitionBy("source").orderBy(col("qk").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val cut = s.table("graft_stream_sqc")
        .withColumn("cb", coalesce(sum(col("sch")).over(wcum), lit(0L)))
        .filter(col("cb") < CHAR_BUDGET) // keep-whole and straddling keys only
        .select(col("source"), col("qk"),
          (col("cb") + col("sch") <= CHAR_BUDGET).as("whole"),
          (lit(CHAR_BUDGET) - col("cb")).as("rem"))
      val kept = scoreCols(s.readStream.schema(sch0).parquet(stageDir))
        .join(broadcast(cut), Seq("source", "qk")) // stream-static, stateless
        .select("doc_id", "source", "qk", "n_chars", "whole", "rem")
      graft.streaming.StreamStage.drain(s, "sq_enforce")(kept.writeStream.outputMode("append")
        .format("parquet").option("path", sink))
    }
    val out = s.read.parquet(sink)
    val full = out.filter(col("whole")).select("doc_id", "source", "qk")
    val wtie = Window.partitionBy("source", "qk").orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tie = out.filter(!col("whole"))
      .withColumn("cum", sum(col("n_chars")).over(wtie))
      .filter(col("cum") <= col("rem"))
      .select("doc_id", "source", "qk")
    full.unionByName(tie)
  }

  val streamSourceQuotaCharsSql: String =
    s"""WITH $scoredCte,
       |o AS (
       |  SELECT doc_id, source, qk,
       |    SUM(n_chars) OVER (PARTITION BY source ORDER BY qk DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d)
       |SELECT doc_id, source, qk FROM o WHERE cum <= $CHAR_BUDGET""".stripMargin

  /** CORPUS-BALANCE ledger — per language: how many sources feed it
    * and how evenly (source-share Shannon entropy, the number a
    * dataset card reports beside the mix table; a lang fed 99% by one
    * domain is a diversity risk no per-doc quality score sees).
    * Entropy in integer micro-nats via the established device
    * (round(1e6·ln k) of integer k per row, then pure BIGINT:
    * H = (N·λ(N) − Σ n_s·λ(n_s)) DIV N); top_share_ppm is an integer
    * floor-division. Two partial-agg passes, nothing joins or sorts. */
  /** Entropy finisher over a (lang, source, ns) count histogram —
    * shared VERBATIM by the batch key and the streaming twin, so the
    * two cannot drift: H = (N·λ(N) − Σ n_s·λ(n_s)) DIV N in integer
    * micro-nats, top share in ppm. */
  private def entropyOf(hist: DataFrame): DataFrame =
    hist
      .groupBy("lang")
      .agg(sum(col("ns")).as("n_docs"), count(lit(1)).as("n_sources"),
        sum(col("ns") * expr("CAST(round(1e6 * ln(CAST(ns AS DOUBLE))) AS BIGINT)"))
          .as("sum_nlnn"),
        max(col("ns")).as("max_ns"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        expr("(n_docs * CAST(round(1e6 * ln(CAST(n_docs AS DOUBLE))) AS BIGINT)" +
          " - sum_nlnn) DIV n_docs").as("entropy_unats"),
        expr("(1000000 * max_ns) DIV n_docs").as("top_share_ppm"))

  def pipelineSourceEntropy: Q = (s, dir) =>
    entropyOf(t(s, dir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("ns")))

  /** STREAMING balance twin (§2D): the (lang, source) count histogram
    * accumulates as a complete-mode streaming aggregation — state is
    * one row per live (lang, source) pair, bounded by the source
    * vocabulary (metadata-sized next to a 100 TB ingest) — then the
    * batch key's IDENTICAL [[entropyOf]] finisher runs on the drained
    * totals: a streaming ingest refreshes its dataset-card diversity
    * numbers incrementally without rescanning the corpus. */
  def streamSourceEntropy: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "sse", dir, "documents.parquet") { stageDir =>
      val hist = s.readStream.schema(sch).parquet(stageDir)
        .groupBy("lang", "source").agg(count(lit(1)).as("ns"))
      graft.streaming.StreamStage.drain(s, "se")(hist.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_se"))
    }
    entropyOf(s.table("graft_stream_se"))
  }

  val pipelineSourceEntropySql: String =
    """WITH counts AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS ns
      |  FROM documents GROUP BY 1, 2),
      |agg AS (
      |  SELECT lang, CAST(SUM(ns) AS BIGINT) AS n_docs,
      |    CAST(COUNT(*) AS BIGINT) AS n_sources,
      |    CAST(SUM(ns * CAST(round(1e6 * ln(CAST(ns AS DOUBLE))) AS BIGINT)) AS BIGINT)
      |      AS sum_nlnn,
      |    CAST(MAX(ns) AS BIGINT) AS max_ns
      |  FROM counts GROUP BY lang)
      |SELECT lang, n_docs, n_sources,
      |  (n_docs * CAST(round(1e6 * ln(CAST(n_docs AS DOUBLE))) AS BIGINT) - sum_nlnn)
      |    // n_docs AS entropy_unats,
      |  (1000000 * max_ns) // n_docs AS top_share_ppm
      |FROM agg""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipeline_source_quota" -> pipelineSourceQuota,
    "stream_source_quota" -> streamSourceQuota,
    "stream_source_quota_docs" -> streamSourceQuotaDocs,
    "pipeline_source_quota_chars" -> pipelineSourceQuotaChars,
    "stream_source_quota_chars" -> streamSourceQuotaChars,
    "pipeline_source_entropy" -> pipelineSourceEntropy,
    "stream_source_entropy" -> streamSourceEntropy)
  val oracles: Map[String, String] = Map(
    "pipeline_source_quota" -> pipelineSourceQuotaSql,
    "stream_source_quota" -> streamSourceQuotaSql,
    "stream_source_quota_docs" -> streamSourceQuotaDocsSql,
    "pipeline_source_quota_chars" -> pipelineSourceQuotaCharsSql,
    "stream_source_quota_chars" -> streamSourceQuotaCharsSql,
    "pipeline_source_entropy" -> pipelineSourceEntropySql,
    "stream_source_entropy" -> pipelineSourceEntropySql)
}
