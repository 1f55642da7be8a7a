package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus profiling statistics (SURVEY.md §2C): the two distribution
  * tables a dataset card prints beside the entropy/Zipf lines.
  *
  * `text_hapax_ratio` — per-source HAPAX LEGOMENA fraction: the share
  * of a source's vocabulary that occurs exactly once. The classic
  * corpus-growth indicator (Heaps'-law regime: a healthy natural
  * corpus keeps minting hapaxes as it grows — template spam and
  * near-dup soup don't), and the denominator-side companion to
  * `text_novelty`'s per-doc rate. Pure integer report.
  *
  * `pipeline_length_histogram` — per-(source, log2-bucket) document
  * length distribution: the sequence-length figure every dataset card
  * plots, and the input the packing stages (`pipeline_pack_*`) size
  * their bins from. The bucket is computed BIT-EXACTLY as
  * length(bin(n)) − 1 — the binary-representation length, identical
  * in both engines — never floor(log2(n)), whose float round-trip
  * misbuckets exact powers of two (log2(8) can evaluate under 3.0).
  *
  * Scale shape: hapax is the one (source, word) partial-agg pass plus
  * a vocab-sized rollup; the histogram is pure map-side arithmetic on
  * each row's own token count plus one partial agg to ≤ sources ×
  * 64 buckets. Linear shuffle, no joins at all.
  */
object CorpusStats {

  type Q = (SparkSession, String) => DataFrame

  def textHapaxRatio: Q = (s, dir) => {
    t(s, dir, "documents")
      .select(col("source"),
        explode(graft.functions.NgramExpressions.lower_tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("vocab"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("vocab"), col("n_tokens"), col("n_hapax"),
        expr("(1000000 * n_hapax) DIV vocab").as("hapax_ppm"))
  }

  val textHapaxRatioSql: String =
    """WITH wf AS (
      |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT source,
      |          unnest(list_filter(string_split(lower(text), ' '), w -> w != '')) AS w
      |        FROM documents)
      |  GROUP BY source, w)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
      |  CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  (1000000 * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT))
      |    // CAST(COUNT(*) AS BIGINT) AS hapax_ppm
      |FROM wf GROUP BY source""".stripMargin

  def pipelineLengthHistogram: Q = (s, dir) => {
    t(s, dir, "documents")
      .select(col("source"),
        size(graft.functions.NgramExpressions.lower_tokens(col("text"))).cast("long").as("n"))
      .withColumn("bucket",
        expr("CASE WHEN n = 0 THEN -1 ELSE CAST(length(bin(n)) - 1 AS INT) END"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("sum_tokens"))
  }

  val pipelineLengthHistogramSql: String =
    """WITH d AS (
      |  SELECT source,
      |    CAST(len(list_filter(string_split(lower(text), ' '), w -> w != '')) AS BIGINT) AS n
      |  FROM documents)
      |SELECT source,
      |  CASE WHEN n = 0 THEN -1 ELSE CAST(length(bin(n)) - 1 AS INT) END AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n) AS BIGINT) AS sum_tokens
      |FROM d GROUP BY 1, 2""".stripMargin

  val queries: Map[String, Q] = Map(
    "text_hapax_ratio" -> textHapaxRatio,
    "pipeline_length_histogram" -> pipelineLengthHistogram)
  val oracles: Map[String, String] = Map(
    "text_hapax_ratio" -> textHapaxRatioSql,
    "pipeline_length_histogram" -> pipelineLengthHistogramSql)
}
