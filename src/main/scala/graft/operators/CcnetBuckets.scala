package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet head/middle/tail perplexity bucketing (SURVEY.md §2C) —
  * Wenzek et al. 2020's published split: each language's corpus
  * divides into thirds by reference-LM perplexity, and downstream
  * consumers pick the head (or head+middle) slice. Rides the same
  * held-out src0-trained scoring pass as
  * `pipeline_perplexity_filter`.
  *
  * Cross-engine-exact and SCALE-SAFE bucketing: production CCNet
  * does not globally sort the corpus — it computes percentile
  * CUTOFFS and assigns map-side. Same here: each doc's score
  * quantizes to an integer key (1e6·sum_q DIV n_bigrams, all
  * BIGINT), the per-(lang, key) HISTOGRAM (bounded by the ppm key
  * domain, metadata-sized next to the corpus) gets cumulative
  * counts-from-top via a window over the histogram — never over
  * docs — and the bucket rule is pure integer arithmetic on whole
  * key groups (3·cum_before < n → head; < 2n → middle; else tail),
  * so ties never straddle a boundary and both engines agree exactly.
  * Doc assignment is then an equi-join back on (lang, key).
  *
  * Output: the per-(lang, bucket) ledger (docs, char mass, score
  * range) — the table a CCNet-style release publishes per language.
  */
object CcnetBuckets {

  type Q = (SparkSession, String) => DataFrame

  def pipelineCcnetBuckets: Q = (s, dir) => {
    val keyed = t(s, dir, "documents").select("doc_id", "lang", "n_chars")
      .join(NgramLm.heldOutScores(s, dir), "doc_id") // short docs (no bigrams) excluded
      .withColumn("skey", expr("(1000000L * sum_q) DIV n_bigrams"))
    val hist = keyed.groupBy("lang", "skey").agg(count(lit(1)).as("c"))
    val totals = keyed.groupBy("lang").agg(count(lit(1)).as("n"))
    val wcum = Window.partitionBy("lang").orderBy(col("skey").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = hist
      .withColumn("cb", coalesce(sum(col("c")).over(wcum), lit(0L)))
      .join(totals, "lang")
      .withColumn("bucket",
        when(col("cb") * 3 < col("n"), "head")
          .when(col("cb") * 3 < col("n") * 2, "middle")
          .otherwise("tail"))
      .select("lang", "skey", "bucket")
    keyed.join(buckets, Seq("lang", "skey"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
        min(col("skey")).as("min_score_ppm"), max(col("skey")).as("max_score_ppm"))
  }

  val pipelineCcnetBucketsSql: String =
    s"""WITH ${NgramLm.heldOutScoreCtes},
       |keyed AS (
       |  SELECT d.lang, d.n_chars, sc.doc_id,
       |    (1000000 * sc.sum_q) // sc.n_bigrams AS skey
       |  FROM documents d JOIN scored sc USING (doc_id)),
       |hist AS (SELECT lang, skey, COUNT(*) AS c FROM keyed GROUP BY lang, skey),
       |tot AS (SELECT lang, COUNT(*) AS n FROM keyed GROUP BY lang),
       |cum AS (
       |  SELECT lang, skey,
       |    COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY skey DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
       |  FROM hist),
       |buck AS (
       |  SELECT cum.lang, cum.skey,
       |    CASE WHEN cb * 3 < n THEN 'head'
       |         WHEN cb * 3 < n * 2 THEN 'middle'
       |         ELSE 'tail' END AS bucket
       |  FROM cum JOIN tot USING (lang))
       |SELECT k.lang, b.bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(k.n_chars) AS BIGINT) AS n_chars,
       |  CAST(MIN(k.skey) AS BIGINT) AS min_score_ppm,
       |  CAST(MAX(k.skey) AS BIGINT) AS max_score_ppm
       |FROM keyed k JOIN buck b ON b.lang = k.lang AND b.skey = k.skey
       |GROUP BY k.lang, b.bucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipeline_ccnet_buckets" -> pipelineCcnetBuckets)
  val oracles: Map[String, String] = Map(
    "pipeline_ccnet_buckets" -> pipelineCcnetBucketsSql)
}
