package graft.operators

import graft.Tables._
import graft.functions.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer FERTILITY per language (SURVEY.md §2C) — the standard
  * multilingual-tokenizer suitability metric (subwords emitted per
  * whitespace word; e.g. Rust et al. 2021 "How Good is Your
  * Tokenizer?"): a tokenizer with fertility ≈ 1 encodes a language
  * near word-level, while high fertility means the vocabulary
  * under-serves that language — it pays more sequence length (and so
  * more training/inference compute) per word, the number a
  * vocabulary-allocation decision consumes.
  *
  * Rides the oracle-checked BPE token counts (`Bpe.docTokenCounts` —
  * distinct-word tokenization joined back to occurrences, so work is
  * vocabulary-sized). Fertility is reported as the exact integer
  * ppm ratio 1e6·Σ bpe_tokens DIV Σ ws_tokens per language (no float
  * division near the gate), beside the raw sums for re-aggregation.
  *
  * Scale shape: one doc_id equi-join (counts ⋈ lang), one
  * partial-agg'd groupBy(lang) — the heavy work (per-word BPE merge
  * chain) stays vocabulary-sized exactly like text_tokencount_bpe.
  */
object Fertility {

  type Q = (SparkSession, String) => DataFrame

  def textBpeFertility: Q = (s, dir) => {
    t(s, dir, "documents").select("doc_id", "lang")
      .join(Bpe.docTokenCounts(s, dir), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("n_ws_tokens"),
        sum(col("n_tokens")).as("n_bpe_tokens"))
      .withColumn("fertility_ppm",
        expr("(1000000L * n_bpe_tokens) DIV n_ws_tokens"))
  }

  val textBpeFertilitySql: String =
    s"""WITH ${Bpe.duckDocTokensCtes}
       |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(t.n_ws) AS BIGINT) AS n_ws_tokens,
       |  CAST(SUM(t.n_tokens) AS BIGINT) AS n_bpe_tokens,
       |  (1000000 * CAST(SUM(t.n_tokens) AS BIGINT)) // CAST(SUM(t.n_ws) AS BIGINT)
       |    AS fertility_ppm
       |FROM documents d JOIN bpe_doc_tokens t USING (doc_id)
       |GROUP BY d.lang""".stripMargin

  val queries: Map[String, Q] = Map(
    "text_bpe_fertility" -> textBpeFertility)
  val oracles: Map[String, String] = Map(
    "text_bpe_fertility" -> textBpeFertilitySql)
}
