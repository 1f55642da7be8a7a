package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zipf-law fit per source (SURVEY.md §2C) — the classic
  * corpus-quality diagnostic: natural language has word frequencies
  * f(r) ∝ r^s with slope s ≈ −1 on the log-log rank/frequency plot
  * (Zipf 1949; Piantadosi 2014 for the modern treatment). Boilerplate
  * farms, template spam, and tokenizer glitches all bend the slope,
  * so per-source slope monitoring is a standard crawl-triage signal.
  *
  * Fit = ordinary least squares of ln(freq) on ln(rank), made
  * cross-engine-exact the repo's usual way: both logs quantize to
  * integer micro-nats PER ROW (round(1e6·ln(k)) of an integer k —
  * sub-ulp libm differences die at the 1e-6 grid, the DSIR/RRF
  * posture), all second-moment sums accumulate in DECIMAL(38,0)
  * (exact at any vocabulary size — a raw double Σqx² would lose
  * low bits above 2^53), and the closed-form slope/intercept divide
  * the EXACT integer moments only at the very end:
  *
  *   slope_ppm = round(1e6 · (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²))
  *
  * Ranks are deterministic (freq DESC, word ASC tie-break).
  *
  * Scale shape: the corpus-sized pass is the word-count groupBy
  * (map-side partial aggs); everything after runs on the
  * VOCABULARY-sized frequency table — the per-source ranking window
  * sorts each source's vocab within its own partition (parallelism =
  * source count, rows = vocab, never corpus), and the final moments
  * are one partial-agg'd rollup to one row per source.
  */
object ZipfFit {

  type Q = (SparkSession, String) => DataFrame

  def textZipfFit: Q = (s, dir) => {
    val wf = t(s, dir, "documents")
      .select(col("source"),
        explode(graft.functions.NgramExpressions.lower_tokens(col("text"))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("f"))
    val ranked = wf
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy(col("f").desc, col("word"))))
      .withColumn("qx", expr("CAST(round(1e6 * ln(CAST(rank AS DOUBLE))) AS BIGINT)"))
      .withColumn("qy", expr("CAST(round(1e6 * ln(CAST(f AS DOUBLE))) AS BIGINT)"))
    ranked.groupBy("source").agg(
      count(lit(1)).as("n"),
      sum(col("f")).as("n_tokens"),
      sum(col("qx").cast("decimal(38,0)")).as("sx"),
      sum(col("qy").cast("decimal(38,0)")).as("sy"),
      sum((col("qx") * col("qy")).cast("decimal(38,0)")).as("sxy"),
      sum((col("qx") * col("qx")).cast("decimal(38,0)")).as("sxx"))
      .filter(col("n") >= 2)
      .withColumn("slope_ppm", expr(
        "CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE) / " +
          "CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)"))
      .withColumn("intercept_unats", expr(
        "CAST(round((CAST(sy AS DOUBLE) - CAST(slope_ppm AS DOUBLE) / 1e6 * " +
          "CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS BIGINT)"))
      .select(col("source"), col("n").as("n_vocab"), col("n_tokens"),
        col("slope_ppm"), col("intercept_unats"))
  }

  val textZipfFitSql: String =
    """WITH wf AS (
      |  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS f
      |  FROM (SELECT source,
      |          unnest(list_filter(string_split(lower(text), ' '), w -> w != '')) AS word
      |        FROM documents)
      |  GROUP BY source, word),
      |ranked AS (
      |  SELECT source, f,
      |    row_number() OVER (PARTITION BY source ORDER BY f DESC, word) AS rank
      |  FROM wf),
      |q AS (
      |  SELECT source, f,
      |    CAST(round(1e6 * ln(CAST(rank AS DOUBLE))) AS BIGINT) AS qx,
      |    CAST(round(1e6 * ln(CAST(f AS DOUBLE))) AS BIGINT) AS qy
      |  FROM ranked),
      |mom AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(f) AS BIGINT) AS n_tokens,
      |    SUM(CAST(qx AS HUGEINT)) AS sx, SUM(CAST(qy AS HUGEINT)) AS sy,
      |    SUM(CAST(qx AS HUGEINT) * qy) AS sxy,
      |    SUM(CAST(qx AS HUGEINT) * qx) AS sxx
      |  FROM q GROUP BY source HAVING COUNT(*) >= 2)
      |SELECT source, n AS n_vocab, n_tokens,
      |  CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE) /
      |       CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) AS slope_ppm,
      |  CAST(round((CAST(sy AS DOUBLE) -
      |       CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE) /
      |            CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) / 1e6 *
      |       CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS BIGINT) AS intercept_unats
      |FROM mom""".stripMargin

  val queries: Map[String, Q] = Map("text_zipf_fit" -> textZipfFit)
  val oracles: Map[String, String] = Map("text_zipf_fit" -> textZipfFitSql)
}
