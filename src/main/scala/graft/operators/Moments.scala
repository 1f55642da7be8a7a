package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable MOMENT SKETCH (SURVEY.md §2C): per-language exact power
  * sums S1..S4 of document length, finished into mean / variance /
  * skewness / excess kurtosis — the four numbers a corpus monitor
  * tracks per segment (a drifting length distribution is the earliest
  * symptom of a broken extractor or a changed crawl mix).
  *
  * Why this shape at 100 TB: the STATE is the sketch — (n, S1..S4)
  * per group, five integers, mergeable by addition across shards,
  * partial-aggregating map-side like any sum. The moments finish on
  * the group-count-sized result. Cross-engine exactness: every power
  * is WIDENED BEFORE the first multiply (the first factor is cast to
  * DECIMAL(38,0) / HUGEINT, so x^2..x^4 never pass through 64-bit —
  * a BIGINT x^3 would silently wrap past n_chars ≈ 2.1M under
  * non-ANSI Spark while DuckDB raised, diverging the engines) and
  * summed in DECIMAL(38,0) / HUGEINT (order-free), and the
  * double-precision finishing runs the
  * IDENTICAL expression text in both engines (one exact
  * integer→double cast per sum, then the same IEEE arithmetic), so
  * the rounded outputs gate bit-for-bit.
  *
  * The streaming twin's complete-mode state is the same (lang,
  * n, S1..S4) row set — bounded by the language count forever. */
object Moments {

  type Q = (SparkSession, String) => DataFrame

  /** Shared finishing arithmetic — spliced VERBATIM into the Spark
    * selectExpr and the DuckDB oracle so the double ops are the same
    * expression tree on both engines. Inputs: n, s1..s4 as DOUBLE. */
  private val meanExpr = "s1 / n"
  private val varExpr = "s2 / n - (s1 / n) * (s1 / n)"
  private val skewExpr =
    "CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0 THEN " +
      "(s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n)) " +
      "/ ((s2 / n - (s1 / n) * (s1 / n)) * sqrt(s2 / n - (s1 / n) * (s1 / n))) " +
      "ELSE 0.0 END"
  private val kurtExpr =
    "CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0 THEN " +
      "(s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n) " +
      "- 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) " +
      "/ ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3 " +
      "ELSE 0.0 END"

  /** Finish a (lang, n, s1..s4) sketch table into the moment report. */
  private def finish(sums: DataFrame): DataFrame =
    sums.selectExpr("lang", "CAST(n AS BIGINT) AS n_docs",
      "CAST(n AS DOUBLE) AS n", "CAST(s1 AS DOUBLE) AS s1",
      "CAST(s2 AS DOUBLE) AS s2", "CAST(s3 AS DOUBLE) AS s3",
      "CAST(s4 AS DOUBLE) AS s4")
      .selectExpr("lang", "n_docs",
        s"round($meanExpr, 6) AS mean_len",
        s"round($varExpr, 6) AS var_len",
        s"round($skewExpr, 6) AS skew",
        s"round($kurtExpr, 6) AS kurt_excess")

  private def sums(docs: DataFrame): DataFrame =
    docs.select(col("lang"), col("n_chars").as("x"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("s1"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("s2"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x * x")).as("s3"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x * x * x")).as("s4"))

  def sketchMoments: Q = (s, dir) => finish(sums(t(s, dir, "documents")))

  /** Streaming twin: the running complete-mode aggregate IS the
    * five-integer sketch per language — constant state forever. */
  def streamMoments: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "smom", dir, "documents.parquet") { stageDir =>
      val sk = sums(s.readStream.schema(sch).parquet(stageDir))
      graft.streaming.StreamStage.drain(s, "moments")(sk.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_moments"))
    }
    finish(s.table("graft_stream_moments"))
  }

  val sketchMomentsSql: String =
    s"""WITH sums AS (
       |  SELECT lang, COUNT(*) AS n,
       |    SUM(CAST(n_chars AS HUGEINT)) AS s1,
       |    SUM(CAST(n_chars AS HUGEINT) * n_chars) AS s2,
       |    SUM(CAST(n_chars AS HUGEINT) * n_chars * n_chars) AS s3,
       |    SUM(CAST(n_chars AS HUGEINT) * n_chars * n_chars * n_chars) AS s4
       |  FROM documents GROUP BY lang),
       |d AS (
       |  SELECT lang, CAST(n AS BIGINT) AS n_docs, CAST(n AS DOUBLE) AS n,
       |    CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
       |    CAST(s3 AS DOUBLE) AS s3, CAST(s4 AS DOUBLE) AS s4
       |  FROM sums)
       |SELECT lang, n_docs,
       |  round($meanExpr, 6) AS mean_len,
       |  round($varExpr, 6) AS var_len,
       |  round($skewExpr, 6) AS skew,
       |  round($kurtExpr, 6) AS kurt_excess
       |FROM d""".stripMargin

  val queries: Map[String, Q] = Map(
    "sketch_moments" -> sketchMoments,
    "stream_moments" -> streamMoments)
  val oracles: Map[String, String] = Map(
    "sketch_moments" -> sketchMomentsSql,
    "stream_moments" -> sketchMomentsSql)
}
