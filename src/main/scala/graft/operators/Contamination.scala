package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Benchmark-contamination check for the training-data pipeline
  * (SURVEY.md §2C): flag corpus documents whose word-5-gram shingles
  * overlap a held-out benchmark/eval set — the standard decontamination
  * step before LLM training (n-gram collision against eval suites).
  *
  * The benchmark here is a deterministic ~3% slice of `documents`
  * (md5 hex-prefix selection, same RNG-free device as
  * [[graft.functions.TextOps.pipelineSampleStratified]]); a real
  * deployment points it at the eval suites instead.
  *
  * Scale posture — the whole reason this is cheap at 100 TB: the
  * benchmark side is tiny relative to the corpus (eval suites are
  * MBs, the corpus is TBs), so its distinct shingle set is collected
  * once and BROADCAST. The corpus side then never shuffles its
  * payload: shingling is map-side (array_distinct + explode), the hit
  * test is a broadcast hash join, and the only shuffle is the
  * partial-agg'd per-doc count of (uniform) doc_id keys.
  */
object Contamination {

  type Q = (SparkSession, String) => DataFrame

  private val N = 5 // word n-gram size for overlap testing
  private val SALT = "graft-bench-v1:"
  private val BENCH_TH = "08" // md5 prefix < '08' → 8/256 ≈ 3% benchmark slice
  private val FLAG_AT = 0.5 // flag docs with >= 50% contaminated shingles

  private[operators] def isBench = // deterministic benchmark membership
    substring(md5(concat(lit(SALT), col("doc_id").cast(StringType))), 1, 2) < BENCH_TH

  /** (doc_id, n_sh, n_hit, contamination, flagged) for every
    * non-benchmark document sharing at least one 5-gram with the
    * benchmark slice. */
  def pipelineContamination: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val benchSh = Dedup.shingles(docs.filter(isBench), N).select("sh").distinct()
    // corpus shingles feed both the totals and the hit join
    val corpSh = Dedup.shingles(docs.filter(!isBench), N).cache()
    val totals = corpSh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val hits = corpSh.join(broadcast(benchSh), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    hits.join(totals, "doc_id")
      .select(col("doc_id"), col("n_sh"), col("n_hit"),
        (col("n_hit") / col("n_sh")).as("contamination"),
        (col("n_hit") / col("n_sh") >= FLAG_AT).as("flagged"))
  }

  val pipelineContaminationSql: String = {
    val concatExpr = (1 to N).map(j => s"ws[i + ${j - 1}]").mkString(" || ' ' || ")
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    substr(md5('$SALT' || CAST(doc_id AS VARCHAR)), 1, 2) < '$BENCH_TH' AS is_bench
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, is_bench, sh FROM (
       |    SELECT doc_id, is_bench, unnest(list_transform(generate_series(1, len(ws) - ${N - 1}),
       |      i -> $concatExpr)) AS sh
       |    FROM (SELECT doc_id, is_bench, string_split(text, ' ') AS ws FROM d)
       |    WHERE len(ws) >= $N)),
       |bsh AS (SELECT DISTINCT sh FROM sh WHERE is_bench),
       |totals AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh WHERE NOT is_bench GROUP BY doc_id),
       |hits AS (
       |  SELECT s.doc_id, COUNT(*) AS n_hit
       |  FROM sh s JOIN bsh ON bsh.sh = s.sh
       |  WHERE NOT s.is_bench GROUP BY s.doc_id)
       |SELECT h.doc_id, t.n_sh, h.n_hit,
       |  h.n_hit / t.n_sh AS contamination,
       |  h.n_hit / t.n_sh >= $FLAG_AT AS flagged
       |FROM hits h JOIN totals t ON t.doc_id = h.doc_id""".stripMargin
  }

  /** Streaming twin of [[pipelineContamination]]: the corpus arrives
    * as a file stream, shingling stays map-side on the stream, the hit
    * test is the same stream-static BROADCAST join against the batch
    * benchmark shingle set, and the per-doc tally is a complete-mode
    * aggregation. Same output, same oracle — decontamination as an
    * ingest-time filter instead of a batch pass. */
  def streamContamination: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val benchSh = Dedup.shingles(docs.filter(isBench), N).select("sh").distinct()
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "sct", dir, "documents.parquet") { stageDir =>
      val corpSh = Dedup.shingles(
        s.readStream.schema(sch).parquet(stageDir).filter(!isBench), N)
      val agg = corpSh
        .join(broadcast(benchSh.withColumn("hit", lit(1L))), Seq("sh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sh"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      graft.streaming.StreamStage.drain(s, "ct")(agg.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_ct"))
    }
    s.table("graft_stream_ct")
      .filter(col("n_hit") > 0)
      .select(col("doc_id"), col("n_sh"), col("n_hit"),
        (col("n_hit") / col("n_sh")).as("contamination"),
        (col("n_hit") / col("n_sh") >= FLAG_AT).as("flagged"))
  }

  val queries: Map[String, Q] = Map(
    "pipeline_contamination" -> pipelineContamination,
    "stream_contamination" -> streamContamination)
  val oracles: Map[String, String] = Map(
    "pipeline_contamination" -> pipelineContaminationSql,
    "stream_contamination" -> pipelineContaminationSql)
}
