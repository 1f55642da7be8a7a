package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BM25 top-k retrieval over the document corpus (SURVEY.md §2C) —
  * the lexical search primitive a training-data pipeline leans on for
  * eval-set contamination sweeps, near-duplicate triage, and targeted
  * corpus probes (the reference's query surface has no retrieval
  * operator; this is a pipeline-completeness addition like the dedup
  * family).
  *
  * Cross-engine exactness uses the [[NgramLm]] device: the floating
  * BM25 formula is replaced by its CENTI-QUANTIZED integer form, so
  * the gate hashes BIGINTs instead of trusting both engines' `ln` to
  * agree in the last ulp:
  *
  *   avgdl_c    = (100·T) div N                    — centi-token mean doc length
  *   nrm_c(d)   = 25 + (7500·|d|) div avgdl_c      — ≈ 100·(1−b+b·|d|/avgdl), b = 0.75
  *   tfq(w, d)  = (2,200,000·tf) div (1000·tf + 12·nrm_c(d))
  *                                                 — ≈ 1000·tf·(k1+1)/(tf + k1·nrm), k1 = 1.2
  *   idfq(w)    = (1,000,000·(N−df)) div (df+1)    — ppm probabilistic idf (N−df)/df,
  *                                                   the log-free idf surrogate
  *   score(q,d) = Σ_{w∈q} idfq(w)·tfq(w, d)        — all BIGINT, exact
  *
  * Products stay far inside BIGINT: idfq ≤ 10^6·N, tfq ≤ 2200, ten
  * terms per query — overflow needs N beyond ~4·10^11 documents.
  *
  * Scale shape: the query-term table is metadata-sized (n_queries ×
  * 10 rows) and BROADCASTS into an equi-join on the term — the
  * inverted-index access pattern, so only the postings of query terms
  * ever leave the scan; df/|d|/avgdl are partial-agg'd corpus
  * statistics (avgdl is ONE broadcast row); per-(query, doc) partial
  * sums combine map-side before the (qid, doc_id) shuffle; the final
  * rank is a per-qid window over the candidate set, which is bounded
  * by the postings of ten rare terms — not the corpus.
  */
object Bm25 {

  type Q = (SparkSession, String) => DataFrame

  /** Probe-query predicate: `doc_id < N_QUERIES`. Over the base corpus
    * (non-negative ids) that is corpus docs 0..7. Over the unicode
    * twin's UNIONED corpus the fixture docs carry NEGATIVE ids, so the
    * same predicate makes every fixture doc an ADDITIONAL probe — that
    * is deliberate (r15, r14 ADVICE): the fixture docs are exactly the
    * non-ASCII query surface the `_uni` key exists to score, and the
    * oracle shares the predicate verbatim. Round15Spec pins the probe
    * count at N_QUERIES + Tokenize.FIXTURE.size for the uni twin. */
  private[graft] val N_QUERIES = 8
  private val TERMS_PER_QUERY = 10
  private val TOP_K = 5

  private def tokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.NgramExpressions.lower_tokens(col("text"))).as("w"))

  /** The centi-quantized BM25 score table (qid, doc_id, score) for
    * the [[N_QUERIES]] probe documents — shared by the top-k gate and
    * the hybrid-fusion operator, so "lexical branch of hybrid" is
    * provably the same plan as the standalone retrieval. */
  private[operators] def scoredLex(s: SparkSession, dir: String): DataFrame =
    scoredLexFrom(tokens(s, dir))

  /** [[scoredLex]] over an arbitrary (doc_id, w) token table (r14 —
    * the unicode tokenizer twin passes its own tokenization; every
    * shape downstream of the token table is shared). */
  private[operators] def scoredLexFrom(toks0: DataFrame): DataFrame = {
    val toks = toks0.cache() // feeds tf, df, lengths, and query terms
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val stats = dl.groupBy().agg(count(lit(1)).as("n_docs"),
        sum(col("len")).as("t_tokens"))
      .withColumn("avgdl_c", expr("(100 * t_tokens) div n_docs"))
      .select("n_docs", "avgdl_c")
    val tf = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    // query terms: each probe doc's TERMS_PER_QUERY RAREST words
    // (df ascending, then alphabetic — deterministic), the terms that
    // actually discriminate documents; the per-qid set is metadata-sized
    val qw = Window.partitionBy("qid").orderBy(col("df"), col("w"))
    val qterms = toks.filter(col("doc_id") < N_QUERIES)
      .select(col("doc_id").as("qid"), col("w")).distinct()
      .join(df, "w")
      .withColumn("rn", row_number().over(qw))
      .filter(col("rn") <= TERMS_PER_QUERY)
      .select("qid", "w")
    tf
      .join(broadcast(qterms), "w") // inverted-index access: query postings only
      .join(df, "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .filter(col("doc_id") =!= col("qid"))
      .withColumn("nrm_c", expr("25 + (7500 * len) div avgdl_c"))
      .withColumn("part", expr(
        """((1000000 * (n_docs - df)) div (df + 1)) *
          |((2200000 * tf) div (1000 * tf + 12 * nrm_c))""".stripMargin))
      .groupBy("qid", "doc_id")
      .agg(sum(col("part")).as("score"))
  }

  def textBm25TopK: Q = (s, dir) => {
    val rw = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    scoredLex(s, dir).withColumn("rank", row_number().over(rw).cast(LongType))
      .filter(col("rank") <= TOP_K)
      .select(col("qid"), col("doc_id"), col("score"), col("rank"))
  }

  /** The DuckDB CTE chain ending in `scored(qid, doc_id, score)` —
    * shared verbatim by the top-k oracle and the hybrid oracle. */
  private[operators] val scoredLexCtes: String = scoredLexCtesFrom(
    s"""toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), w -> w != '')) AS w
       |  FROM documents)""".stripMargin)

  /** [[scoredLexCtes]] over an arbitrary `toks(doc_id, w)` CTE (r14 —
    * the unicode twin's tokenization; the scoring chain is shared). */
  private[operators] def scoredLexCtesFrom(toksCte: String): String =
    s"""$toksCte,
       |dl AS (SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY doc_id),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    (100 * CAST(SUM(len) AS BIGINT)) // COUNT(*) AS avgdl_c
       |  FROM dl),
       |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w),
       |df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
       |qterms AS (
       |  SELECT qid, w FROM (
       |    SELECT qid, w,
       |      row_number() OVER (PARTITION BY qid ORDER BY df, w) AS rn
       |    FROM (SELECT DISTINCT doc_id AS qid, w FROM toks
       |          WHERE doc_id < $N_QUERIES)
       |    JOIN df USING (w))
       |  WHERE rn <= $TERMS_PER_QUERY),
       |scored AS (
       |  SELECT q.qid, f.doc_id,
       |    SUM( ((1000000 * (s.n_docs - d.df)) // (d.df + 1)) *
       |         ((2200000 * f.tf) // (1000 * f.tf + 12 * (25 + (7500 * l.len) // s.avgdl_c))) ) AS score
       |  FROM qterms q
       |  JOIN tf f USING (w)
       |  JOIN df d USING (w)
       |  JOIN dl l ON l.doc_id = f.doc_id
       |  CROSS JOIN stats s
       |  WHERE f.doc_id <> q.qid
       |  GROUP BY q.qid, f.doc_id)""".stripMargin

  val textBm25TopKSql: String =
    s"""WITH $scoredLexCtes
       |SELECT qid, doc_id, CAST(score AS BIGINT) AS score, CAST(rank AS BIGINT) AS rank
       |FROM (
       |  SELECT qid, doc_id, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)
       |WHERE rank <= $TOP_K""".stripMargin

  val queries: Map[String, Q] = Map("text_bm25_topk" -> textBm25TopK)
  val oracles: Map[String, String] = Map("text_bm25_topk" -> textBm25TopKSql)
}
