package graft.operators

import graft.Tables._
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset card (SURVEY.md §2C): the per-(source, language) summary a
  * released training corpus ships — counts, token mass, length range,
  * and mean quality — computed in ONE partial-aggregating pass over
  * the corpus (every aggregate here is map-side combinable, so the
  * shuffle carries one row per (source, lang) group regardless of
  * corpus size).
  *
  * The mean quality is emitted as an exact integer pair
  * (quality_micro_sum = Σ floor(score·10⁶), n_docs) rather than a
  * double mean: a double sum's partial-agg merge order differs
  * between engines in the last ulp, while the floor-quantized integer
  * sum is associative and bit-identical — the reader divides. Same
  * device as pipeline_mix_weights' quantized denominator. */
object DatasetCard {

  type Q = (SparkSession, String) => DataFrame

  def pipelineDatasetCard: Q = (s, dir) =>
    TextOps.withQualityScore(t(s, dir, "documents"))
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_tokens"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(floor(col("score") * 1e6).cast(LongType)).as("quality_micro_sum"))

  val pipelineDatasetCardSql: String =
    s"""SELECT source, lang,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_words) AS BIGINT) AS n_tokens,
       |  MIN(n_chars) AS min_chars,
       |  MAX(n_chars) AS max_chars,
       |  CAST(SUM(CAST(floor((least(n_words / 50.0, 1.0) * 0.4
       |    + (n_stop / n_words) * 0.3
       |    + least(((length(text) - (n_words - 1)) / n_words) / 8.0, 1.0) * 0.3
       |    ) * 1e6) AS BIGINT)) AS BIGINT) AS quality_micro_sum
       |FROM (
       |  SELECT doc_id, source, lang, text, n_chars,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      w -> w IN (${TextOps.sqlList(TextOps.stoplist)}))) AS BIGINT) AS n_stop
       |  FROM documents) sub
       |GROUP BY source, lang""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipeline_dataset_card" -> pipelineDatasetCard)
  val oracles: Map[String, String] = Map(
    "pipeline_dataset_card" -> pipelineDatasetCardSql)
}
