package graft.operators

import graft.Tables._
import graft.functions.Tokenize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unicode-tokenizer-mode keys (SURVEY.md §2C, r14 — r13 verdict
  * punch #4): the opt-in `_uni` twins of the text family, running
  * [[graft.functions.Tokenize]]'s shared whitespace+punctuation+CJK
  * regex instead of the house `split(lower(text), ' ')`. Every key
  * unions the [[Tokenize.FIXTURE]] (tabs, newlines, vertical tab,
  * form feed, ASCII + CJK punctuation, Han/hiragana/katakana/hangul)
  * into the corpus IN BOTH ENGINES, so the oracle gate exercises
  * non-space separators the synthetic corpus never contains.
  *
  * Scale shape is unchanged from the ASCII twins: tokenization is a
  * map-side projection (regexp_extract_all rides whole-stage codegen,
  * no UDF); the fixture union is a LocalRelation (zero scan cost);
  * the tfidf twin stages its tf table once ([[TfIdf]]'s r14 posture)
  * and derives the idf dict from it — one corpus tokenize per
  * artifact build, none per query. */
object UniText {

  type Q = (SparkSession, String) => DataFrame

  /** (doc_id, w) exploded unicode tokens over the unioned corpus. */
  private def toks(s: SparkSession, dir: String): DataFrame =
    Tokenize.unionedDocs(s, dir)
      .select(col("doc_id"), explode(Tokenize.tokens(col("text"))).as("w"))

  /** Session-staged unicode TOKEN table (r17 optimization round, r16
    * VERDICT item 3 "build them from one shared tokenized scan"):
    * during prestage, the five unicode index builders (sh4_uni,
    * lsh_pairs_uni, simhash_fps_uni, winnow_fps_uni, tfidf_uni_tf)
    * each re-ran the regexp tokenizer over the fixture-unioned
    * corpus; they now all derive from this ONE tokenize pass.
    * String arrays parquet-roundtrip exactly, so every downstream
    * shingle/fingerprint/signature is bit-identical to the inline
    * form (the oracle gates every consumer either way). TIMED uni
    * keys keep their inline tokenize — this artifact only feeds
    * other STAGED builders, so no query's timed body changes. */
  private[operators] def unionedToks(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "utoks", coalesce = false)(
      Tokenize.unionedDocs(s, dir)
        .select(col("doc_id"), Tokenize.tokens(col("text")).as("toks")))
  Staged.register("utoks")((s, dir) => { unionedToks(s, dir); () })

  private val duckToks =
    s"""toks AS (
       |  SELECT doc_id, unnest(${Tokenize.duckTokens("text")}) AS w
       |  FROM udocs)""".stripMargin

  // -------------------------------------------------------------------
  // text_tokens_unicode: per-doc token accounting — total tokens,
  // distinct types, CJK single-char tokens. Entirely map-side (array
  // functions on the token array, no explode, no shuffle): the
  // tokenizer-health probe a multilingual ingest runs per shard.
  // -------------------------------------------------------------------

  def textTokensUnicode: Q = (s, dir) =>
    Tokenize.unionedDocs(s, dir)
      .select(col("doc_id"), Tokenize.tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tok"),
        size(array_distinct(col("tk"))).cast("long").as("n_types"),
        expr(s"CAST(size(filter(tk, t -> t rlike '${Tokenize.CJK_ONE}')) AS BIGINT)")
          .as("n_cjk"))

  val textTokensUnicodeSql: String =
    s"""WITH ${Tokenize.udocsCte},
       |tk AS (SELECT doc_id, ${Tokenize.duckTokens("text")} AS tk FROM udocs)
       |SELECT doc_id,
       |  CAST(len(tk) AS BIGINT) AS n_tok,
       |  CAST(len(list_distinct(tk)) AS BIGINT) AS n_types,
       |  CAST(len(list_filter(tk, t -> regexp_matches(t, '${Tokenize.CJK_ONE}'))) AS BIGINT) AS n_cjk
       |FROM tk""".stripMargin

  // -------------------------------------------------------------------
  // text_topterms_uni: corpus top-20 by document frequency under the
  // unicode tokenizer — the [[graft.functions.TextOps]] top-terms twin
  // (per-doc distinct explode → vocab-bounded partial agg → ordered
  // limit, TakeOrderedAndProject; the corpus never sorts globally).
  // -------------------------------------------------------------------

  def textTopTermsUni: Q = (s, dir) =>
    Tokenize.unionedDocs(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(Tokenize.tokens(col("text")))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("word"))
      .limit(20)

  val textTopTermsUniSql: String =
    s"""WITH ${Tokenize.udocsCte}
       |SELECT word, COUNT(*) AS df FROM (
       |  SELECT DISTINCT doc_id, unnest(${Tokenize.duckTokens("text")}) AS word
       |  FROM udocs)
       |GROUP BY word
       |ORDER BY df DESC, word
       |LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // text_tfidf_topk_uni: per-doc top-5 tf·idf under the unicode
  // tokenizer — [[TfIdf]]'s exact machinery (integer micro-nat idf,
  // doc-vocab-bounded top-k) over the unioned corpus, with its own
  // staged tf/idf artifacts (one tokenize pass per corpus, r14).
  // -------------------------------------------------------------------

  private def stagedTfUni(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "tfidf_uni_tf", coalesce = false)(
      unionedToks(s, dir) // r17: shared staged tokenize
        .select(col("doc_id"), explode(col("toks")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf")))
  Staged.register("tfidf_uni_tf")((s, dir) => { stagedTfUni(s, dir); () })

  private def stagedIdfUni(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "tfidf_uni_idf", coalesce = false) {
      val n = Tokenize.unionedDocs(s, dir).agg(count(lit(1)).as("n_docs"))
      stagedTfUni(s, dir).groupBy("w").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(n))
        .select(col("w"), expr(
          "CAST(round(1e6 * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))) AS BIGINT)")
          .as("idf_unats"))
    }
  Staged.register("tfidf_uni_idf")((s, dir) => { stagedIdfUni(s, dir); () })

  def textTfidfTopkUni: Q = (s, dir) =>
    TfIdf.topTerms(stagedTfUni(s, dir).join(stagedIdfUni(s, dir), "w"))

  val textTfidfTopkUniSql: String =
    s"""WITH ${Tokenize.udocsCte},
       |$duckToks,
       |tf AS (
       |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM toks GROUP BY doc_id, w),
       |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM udocs),
       |idf AS (
       |  SELECT w, CAST(round(1e6 * ln(CAST(n_docs AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS idf_unats
       |  FROM tf CROSS JOIN nd GROUP BY w, n_docs),
       |scored AS (
       |  SELECT tf.doc_id, tf.w, tf.tf, tf.tf * idf.idf_unats AS score_unats,
       |    row_number() OVER (PARTITION BY tf.doc_id
       |      ORDER BY tf.tf * idf.idf_unats DESC, tf.w) AS rank
       |  FROM tf JOIN idf USING (w))
       |SELECT doc_id, w AS term, score_unats, tf, CAST(rank AS BIGINT) AS rank
       |FROM scored WHERE rank <= ${TfIdf.TOPK}""".stripMargin

  // -------------------------------------------------------------------
  // text_bm25_topk_uni: BM25 top-k retrieval under the unicode
  // tokenizer — [[Bm25]]'s centi-quantized integer scoring chain
  // (broadcast query terms = inverted-index access, partial-agg
  // stats, bounded per-qid candidate sets) over the unioned corpus;
  // only the token table differs.
  // -------------------------------------------------------------------

  def textBm25TopkUni: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val rw = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    Bm25.scoredLexFrom(toks(s, dir))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("doc_id"), col("score"), col("rank"))
  }

  val textBm25TopkUniSql: String =
    s"""WITH ${Tokenize.udocsCte},
       |${Bm25.scoredLexCtesFrom(duckToks)}
       |SELECT qid, doc_id, CAST(score AS BIGINT) AS score, CAST(rank AS BIGINT) AS rank
       |FROM (
       |  SELECT qid, doc_id, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin

  // -------------------------------------------------------------------
  // dedup_ngram_jaccard_uni: word-4-gram Jaccard near-dup pairs under
  // the unicode tokenizer — [[Dedup]]'s df-capped inverted-index
  // candidate generation (every join bucket ≤ 64 members, never
  // O(n²)) with shingles built from unicode tokens.
  // -------------------------------------------------------------------

  /** Session-staged df-capped unicode 4-gram shingle table — the
    * unicode twin of [[Dedup.shingles4Staged]] (r16 optimization
    * round): one staged inverted index feeds the jaccard /
    * containment / top-m uni keys instead of three per-invocation
    * tokenize → shingle → df-cap reruns. */
  private def shingles4Uni(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "sh4_uni", coalesce = false)(
      Dedup.cappedShingles(unionedToks(s, dir), 4, col("toks")))
  Staged.register("sh4_uni")((s, dir) => { shingles4Uni(s, dir); () })

  def dedupNgramJaccardUni: Q = (s, dir) =>
    Dedup.ngramPairs(shingles4Uni(s, dir))

  /** The unicode 4-gram shingle CTE chain (udocs + df-capped sh) —
    * shared by the jaccard / containment / top-m uni oracles. */
  private val uniSh4Ctes =
    s"""${Tokenize.udocsCte},
       |sh AS (${Dedup.shinglesSqlFrom(4, Tokenize.duckTokens("text"), "udocs")})""".stripMargin

  private val invIndexCandCte =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id)""".stripMargin

  val dedupNgramJaccardUniSql: String =
    Dedup.jaccardSqlOver(invIndexCandCte, uniSh4Ctes)

  // -------------------------------------------------------------------
  // The span / CDC / containment / top-m families under the unicode
  // tokenizer (r16 — r15 verdict #1, the last tokenizer-dependent
  // residual): on a CJK-dense crawl the ASCII split sees a whole
  // unspaced sentence as ONE "word", so 8-word substring-dedup windows
  // span pages, containment shingles never match, and top-m neighbor
  // lists go empty exactly where duplication is densest. Each key is
  // its ASCII twin's EXACT machinery via the shared `ws=` hook —
  // only the token array differs; plan shapes pinned in Round16Spec.
  // -------------------------------------------------------------------

  /** Unicode exact-substring span dedup: [[Dedup.substringSpansOf]]
    * VERBATIM over [[Tokenize.tokens]] arrays of the fixture-unioned
    * corpus (window hashing, repeat test, gaps-and-islands merge all
    * shared). Zero-token docs need no guard here: the per-doc ledger
    * divides by `greatest(n_words, 1)` in both engines. */
  def dedupSubstringSpansUni: Q = (s, dir) => Dedup.substringSpansOf(
    Tokenize.unionedDocs(s, dir)
      .select(col("doc_id"), Tokenize.tokens(col("text")).as("ws")))

  val dedupSubstringSpansUniSql: String = Dedup.dedupSubstringSpansSqlFrom(
    Tokenize.duckTokens("text"), "udocs", s"${Tokenize.udocsCte},\n")

  /** Unicode CDC chunk dedup: [[Dedup.cdcOf]] over the fixture-unioned
    * corpus. CDC is CHARACTER-level and tokenizer-free, so there is no
    * token array to swap — this twin's value is pinning the
    * codepoint-indexing parity (CJK, RTL, combining marks, astral
    * emoji — one codepoint = one substring position in both engines)
    * that the ASCII corpus never exercises, through the native
    * [[graft.functions.CdcExpressions]] boundary scan's multibyte
    * path. */
  def dedupCdcUni: Q = (s, dir) => Dedup.cdcOf(Tokenize.unionedDocs(s, dir))

  val dedupCdcUniSql: String =
    Dedup.dedupCdcSqlFrom("udocs", s"${Tokenize.udocsCte},\n")

  /** Unicode directional containment: [[Dedup.containmentOf]] over
    * the session-staged df-capped unicode 4-gram shingle index
    * ([[shingles4Uni]] — r16 optimization round). */
  def dedupContainmentUni: Q = (s, dir) =>
    Dedup.containmentOf(shingles4Uni(s, dir)) // r16: staged inverted index

  val dedupContainmentUniSql: String = Dedup.dedupContainmentSqlOver(uniSh4Ctes)

  /** Unicode output-bounded top-m neighbor lists: the shared
    * [[Dedup.topmNeighbors]] bounded-TopK tail over the unicode
    * inverted-index pair set — ≤ m rows per doc regardless of CJK
    * clone density. */
  def dedupNgramTopmUni: Q = (s, dir) =>
    Dedup.topmNeighbors(Dedup.ngramPairs(shingles4Uni(s, dir)))

  val dedupNgramTopmUniSql: String =
    Dedup.topmSqlOver(Dedup.jaccardSqlOver(invIndexCandCte, uniSh4Ctes))

  // -------------------------------------------------------------------
  // The near-dup FINGERPRINT family under the unicode tokenizer (r15,
  // r14 verdict #1 — the highest-value residual): on a CJK-dense
  // crawl, space-split fingerprints see whole sentences as single
  // "words", so near-dup RECALL degrades exactly where the corpus is
  // non-ASCII. Each key is its ASCII twin's EXACT machinery — df-cap,
  // banding, bounded self-joins all shared via the ws= hook — with
  // only the token array swapped; plan shapes are pinned identical in
  // PlanAuditSpec/Round15Spec.
  // -------------------------------------------------------------------

  /** Session-staged unicode LSH pair table — the same index-build
    * artifact discipline as the ASCII `lsh_pairs`. */
  private def minhashPairsUni(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "lsh_pairs_uni") {
      val sh = Dedup.cappedShingles(unionedToks(s, dir), 3, col("toks")).cache()
      Dedup.withJaccard(Dedup.lshCandidates(sh), sh)
    }
  Staged.register("lsh_pairs_uni")((s, dir) => { minhashPairsUni(s, dir); () })

  def dedupMinhashLshUni: Q = (s, dir) => minhashPairsUni(s, dir)

  val dedupMinhashLshUniSql: String = Dedup.jaccardSqlOver(
    Dedup.lshCandCteSql,
    s"""${Tokenize.udocsCte},
       |sh AS (${Dedup.shinglesSqlFrom(3, Tokenize.duckTokens("text"), "udocs")})""".stripMargin)

  /** Unicode SimHash near-dup pairs: the staged 64-bit fingerprint
    * index over the unioned corpus, banded with the shared device. */
  def dedupSimhashUni: Q = (s, dir) => {
    val fps = Staged.table(s, dir, "simhash_fps_uni", coalesce = false)(
      Dedup.simhashFps(unionedToks(s, dir), col("toks")))
    Dedup.simhashPairsOf(fps)
  }
  Staged.register("simhash_fps_uni")((s, dir) => {
    Staged.table(s, dir, "simhash_fps_uni", coalesce = false)(
      Dedup.simhashFps(unionedToks(s, dir), col("toks")))
    ()
  })

  val dedupSimhashUniSql: String = Dedup.dedupSimhashSqlFrom(
    Tokenize.duckTokens("text"), "udocs", s"${Tokenize.udocsCte},\n")

  /** Unicode winnowing fingerprints — entirely map-side like the
    * ASCII twin (per-row gram arrays, no explode). */
  def textWinnowFingerprintUni: Q = (s, dir) =>
    Winnowing.winnowOf(Tokenize.unionedDocs(s, dir), Tokenize.tokens(col("text")))

  val textWinnowFingerprintUniSql: String = Winnowing.textWinnowFingerprintSqlFrom(
    Tokenize.duckTokens("text"), "udocs", s"${Tokenize.udocsCte},\n")

  /** Unicode winnow candidate pairs — df-capped keyed self-join on
    * selected fingerprints, the ASCII twin's exact shape. */
  def dedupWinnowPairsUni: Q = (s, dir) =>
    Winnowing.dedupWinnowPairsUniStaged(s, dir) // r16: staged fp index

  val dedupWinnowPairsUniSql: String = Winnowing.dedupWinnowPairsSqlFrom(
    Tokenize.duckTokens("text"), "udocs", s"${Tokenize.udocsCte},\n")

  /** Unicode GRAPH dedup (r15 — closing the layer above pair
    * generation): min-label connected components over the unicode LSH
    * pair table (verified Jaccard ≥ 0.2 edges, the ASCII
    * `dedup_clusters` bar), so the full dedup chain — tokenize →
    * shingle → band → verify → cluster — runs under the unicode
    * tokenizer end-to-end. Same checkpointed star-contraction loop,
    * same staged `lsh_pairs_uni` edge artifact; nodes are the
    * fixture-unioned corpus (every edge endpoint present by
    * construction). */
  def dedupClustersUni: Q = (s, dir) => {
    val nodes = Tokenize.unionedDocs(s, dir).select(col("doc_id").as("id"))
    val edges = minhashPairsUni(s, dir)
      .filter(col("jaccard") >= 0.2)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val cc = DedupClusters.connectedComponents(nodes, edges)
    val sizes = cc.groupBy("canonical").agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "canonical")
      .select(col("id").as("doc_id"), col("canonical").as("canonical_id"),
        col("cluster_size"))
  }

  val dedupClustersUniSql: String =
    s"""WITH RECURSIVE ${Tokenize.udocsCte},
       |pairs AS ($dedupMinhashLshUniSql),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs WHERE jaccard >= 0.2),
       |sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
       |reach(v, r) AS (
       |  SELECT doc_id, doc_id FROM udocs
       |  UNION
       |  SELECT sym.b, reach.r FROM sym JOIN reach ON reach.v = sym.a),
       |cc AS (SELECT v AS doc_id, MIN(r) AS canonical_id FROM reach GROUP BY v),
       |sizes AS (SELECT canonical_id, COUNT(*) AS cluster_size FROM cc GROUP BY canonical_id)
       |SELECT cc.doc_id, cc.canonical_id, sizes.cluster_size
       |FROM cc JOIN sizes USING (canonical_id)""".stripMargin

  // -------------------------------------------------------------------
  // text_segment_dedup_uni (r15b): segment-level BOILERPLATE removal
  // under the unicode tokenizer — the remaining space-split family
  // after the fingerprint keys. On a CJK crawl the ASCII mode sees a
  // whole unspaced sentence as ONE token, so 8-"token" segments span
  // pages and shared boilerplate (nav menus, cookie banners in any
  // script) never repeats exactly; character-level CJK tokens restore
  // the segment granularity the scrub needs. Rides
  // [[Boilerplate.scrubToks]] VERBATIM (segmentation, df count,
  // broadcast scrub join, residual md5) — only the token array
  // differs. One guard both engines share: a doc whose text is ALL
  // separators has a zero-length token array (the ASCII split never
  // produces one), and the two engines' integer divisions disagree at
  // -1 (Spark div truncates, DuckDB // floors), so zero-token docs are
  // excluded EXPLICITLY in both rather than left to divergent
  // degenerate-segment behavior.
  // -------------------------------------------------------------------

  def textSegmentDedupUni: Q = (s, dir) => Boilerplate.scrubToks(
    Tokenize.unionedDocs(s, dir)
      .withColumn("toks", Tokenize.tokens(col("text")))
      // the shared guard text (r16, r15 verdict #7): one predicate
      // literal, both engines — see Boilerplate.nonEmptyPred
      .filter(expr(Boilerplate.nonEmptyPred("size"))))

  val textSegmentDedupUniSql: String = Boilerplate.scrubSql(
    s"${Tokenize.udocsCte},\n", Tokenize.duckTokens("text"), "udocs",
    nonEmptyGuard = true)

  // -------------------------------------------------------------------
  // stream_tokens_unicode: the streaming twin of the accounting key —
  // stateless map-side projection per micro-batch into a distributed
  // parquet sink. The fixture docs are staged as one extra stream
  // file (full document schema, dummy metadata columns), so the
  // drained stream carries exactly the udocs union the oracle scores.
  // -------------------------------------------------------------------

  def streamTokensUnicode: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    val sink = graft.streaming.StreamStage.freshSink(s, dir, "sutok_sink")
    graft.streaming.StreamStage.withStaged(s, "sutok", dir, "documents.parquet") { stageDir =>
      import s.implicits._
      Tokenize.FIXTURE.toDF("doc_id", "text")
        .withColumn("lang", lit("fx")).withColumn("source", lit("fx"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select(sch.fields.map(f => col(f.name).cast(f.dataType)).toSeq: _*)
        .coalesce(1).write.mode("append").parquet(stageDir)
      val stream = s.readStream.schema(sch).parquet(stageDir)
      val out = stream
        .select(col("doc_id"), Tokenize.tokens(col("text")).as("tk"))
        .select(col("doc_id"),
          size(col("tk")).cast("long").as("n_tok"),
          size(array_distinct(col("tk"))).cast("long").as("n_types"),
          expr(s"CAST(size(filter(tk, t -> t rlike '${Tokenize.CJK_ONE}')) AS BIGINT)")
            .as("n_cjk"))
      graft.streaming.StreamStage.drain(s, "d")(out.writeStream.outputMode("append")
        .format("parquet").option("path", sink))
    }
    s.read.parquet(sink)
  }

  val queries: Map[String, Q] = Map(
    "text_tokens_unicode" -> textTokensUnicode,
    "text_topterms_uni" -> textTopTermsUni,
    "text_tfidf_topk_uni" -> textTfidfTopkUni,
    "text_bm25_topk_uni" -> textBm25TopkUni,
    "dedup_ngram_jaccard_uni" -> dedupNgramJaccardUni,
    "dedup_substring_spans_uni" -> dedupSubstringSpansUni,
    "dedup_cdc_uni" -> dedupCdcUni,
    "dedup_containment_uni" -> dedupContainmentUni,
    "dedup_ngram_topm_uni" -> dedupNgramTopmUni,
    "dedup_minhash_lsh_uni" -> dedupMinhashLshUni,
    "dedup_simhash_uni" -> dedupSimhashUni,
    "text_winnow_fingerprint_uni" -> textWinnowFingerprintUni,
    "dedup_winnow_pairs_uni" -> dedupWinnowPairsUni,
    "dedup_clusters_uni" -> dedupClustersUni,
    "text_segment_dedup_uni" -> textSegmentDedupUni,
    "stream_tokens_unicode" -> streamTokensUnicode)
  val oracles: Map[String, String] = Map(
    "text_tokens_unicode" -> textTokensUnicodeSql,
    "text_topterms_uni" -> textTopTermsUniSql,
    "text_tfidf_topk_uni" -> textTfidfTopkUniSql,
    "text_bm25_topk_uni" -> textBm25TopkUniSql,
    "dedup_ngram_jaccard_uni" -> dedupNgramJaccardUniSql,
    "dedup_substring_spans_uni" -> dedupSubstringSpansUniSql,
    "dedup_cdc_uni" -> dedupCdcUniSql,
    "dedup_containment_uni" -> dedupContainmentUniSql,
    "dedup_ngram_topm_uni" -> dedupNgramTopmUniSql,
    "dedup_minhash_lsh_uni" -> dedupMinhashLshUniSql,
    "dedup_simhash_uni" -> dedupSimhashUniSql,
    "text_winnow_fingerprint_uni" -> textWinnowFingerprintUniSql,
    "dedup_winnow_pairs_uni" -> dedupWinnowPairsUniSql,
    "dedup_clusters_uni" -> dedupClustersUniSql,
    "text_segment_dedup_uni" -> textSegmentDedupUniSql,
    "stream_tokens_unicode" -> textTokensUnicodeSql)
}
