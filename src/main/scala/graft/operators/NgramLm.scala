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
        expr("filter(split(lower(text), ' '), w -> w != '')").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> named_struct('w1', element_at(ws, i), 'w2', element_at(ws, i + 1)))"))
        .as("b"))
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

  val queries: Map[String, Q] = Map("text_ngram_lm" -> textNgramLm)
  val oracles: Map[String, String] = Map("text_ngram_lm" -> textNgramLmSql)
}
