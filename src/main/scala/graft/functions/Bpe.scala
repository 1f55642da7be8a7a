package graft.functions

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE-style subword tokenization over a fixed, ordered merge table
  * (SURVEY §7 candidate; the reference's pipeline-side analogue is a
  * token-budget pipeline that needs subword counts, not whitespace
  * counts).
  *
  * The tokenizer is real byte-pair-encoding: a word becomes a
  * space-separated character-token string, then each merge rule
  * `(a, b) -> ab` rewrites adjacent token pairs in table order.
  * Each rewrite is a literal `replace(' a b ' -> ' ab ')` — both Spark
  * and DuckDB scan left-to-right over non-overlapping occurrences,
  * which is exactly BPE's greedy merge order, so the oracle replays
  * the *algorithm*, not a reimplementation (one nuance: a replace pass
  * consumes the separator shared by back-to-back matches, so each rule
  * runs two passes — pass 2 merges the occurrences whose leading
  * separator pass 1 consumed; BPE's fixed point for a single rule).
  *
  * Scale shape: tokenization runs once per DISTINCT word (vocabulary-
  * sized — sublinear in corpus size), then joins counts back to word
  * occurrences. At 100 TB the vocab table is still small enough that
  * AQE broadcasts the join; nothing tokenizes per-occurrence.
  */
object Bpe {

  type Q = (SparkSession, String) => DataFrame

  /** Ordered merge table — fixed and public so both engines (and any
    * future session) replay identical tokenizations. Pairs are common
    * English bigrams; compound rules (e.g. `th e`, `in g`) only fire
    * after their prerequisite merges, as in any trained BPE table. */
  val merges: Seq[(String, String)] = Seq(
    "t h" -> "th", "i n" -> "in", "a n" -> "an", "e r" -> "er",
    "o n" -> "on", "r e" -> "re", "e n" -> "en", "a t" -> "at",
    "o r" -> "or", "e s" -> "es", "s t" -> "st", "a r" -> "ar",
    "o u" -> "ou", "l e" -> "le", "i s" -> "is", "i t" -> "it",
    "a l" -> "al", "e d" -> "ed", "n g" -> "ng", "th e" -> "the",
    "in g" -> "ing", "an d" -> "and", "a b" -> "ab", "o f" -> "of")

  /** Spark-SQL expression: BPE token count of (already lowercased)
    * word column `w`. Guard spaces let every rule match at token
    * boundaries only; multi-char tokens keep single separators, so a
    * pair pattern can never match inside a previously merged token. */
  def sparkCountExpr(w: String): String = {
    val spaced = s"concat(' ', regexp_replace($w, '(.)', '$$1 '))"
    val chain = merges.foldLeft(spaced) { case (acc, (p, r)) =>
      s"replace(replace($acc, ' $p ', ' $r '), ' $p ', ' $r ')"
    }
    s"size(filter(split($chain, ' '), x -> x != ''))"
  }

  /** Same computation in DuckDB SQL (RE2 backreference + explicit
    * global flag; list_filter/len for the count). */
  def duckCountExpr(w: String): String = {
    val spaced = s"' ' || regexp_replace($w, '(.)', '\\1 ', 'g')"
    val chain = merges.foldLeft(spaced) { case (acc, (p, r)) =>
      s"replace(replace($acc, ' $p ', ' $r '), ' $p ', ' $r ')"
    }
    s"len(list_filter(string_split($chain, ' '), x -> x != ''))"
  }

  /** Per-document token counts: (doc_id, n_ws, n_tokens) where
    * n_tokens is the summed BPE count. Distinct-word tokenize + join
    * back — the vocabulary is the unit of tokenization work. */
  def docTokenCounts(s: SparkSession, dir: String): DataFrame = {
    // the exploded word list feeds two branches (vocab + the
    // occurrence join), and the per-doc result feeds three inventory
    // queries (tokencount_bpe, pack_sequences, pack_bins) —
    // CacheManager dedupes the repeats by canonicalized plan
    val words = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w0"))
      .select(col("doc_id"), lower(col("w0")).as("w"))
      .cache()
    val vocab = words.select("w").distinct()
      .withColumn("n_bpe", expr(sparkCountExpr("w")).cast(LongType))
    words.join(vocab, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ws"), sum("n_bpe").as("n_tokens"))
      .cache()
  }

  /** DuckDB CTE bodies mirroring [[docTokenCounts]]; interpolate into
    * `WITH ...` of any oracle that needs `bpe_doc_tokens`. */
  val duckDocTokensCtes: String =
    s"""bpe_words AS (
       |  SELECT doc_id, lower(w) AS w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
       |bpe_vocab AS (
       |  SELECT w, CAST(${duckCountExpr("w")} AS BIGINT) AS n_bpe
       |  FROM (SELECT DISTINCT w FROM bpe_words)),
       |bpe_doc_tokens AS (
       |  SELECT doc_id, COUNT(*) AS n_ws, CAST(SUM(n_bpe) AS BIGINT) AS n_tokens
       |  FROM bpe_words JOIN bpe_vocab USING (w) GROUP BY doc_id)""".stripMargin

  /** Whitespace vs BPE token counts per document. */
  def textTokencountBpe: Q = (s, dir) =>
    docTokenCounts(s, dir).select(col("doc_id"),
      col("n_ws").as("n_ws_tokens"), col("n_tokens").as("n_bpe_tokens"))

  val textTokencountBpeSql: String =
    s"""WITH $duckDocTokensCtes
       |SELECT doc_id, n_ws AS n_ws_tokens, n_tokens AS n_bpe_tokens
       |FROM bpe_doc_tokens""".stripMargin

  val queries: Map[String, Q] = Map(
    "text_tokencount_bpe" -> textTokencountBpe)

  val oracles: Map[String, String] = Map(
    "text_tokencount_bpe" -> textTokencountBpeSql)
}
