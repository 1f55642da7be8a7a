package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decontamination EXECUTION ledger (SURVEY.md §2C) —
  * `pipeline_contamination` measures benchmark overlap; this operator
  * is the half a release pipeline actually runs: DROP the flagged
  * documents and account for exactly what left the corpus, per
  * source. Release notes for every serious LLM training set carry
  * this table ("n documents removed for eval overlap"), and a
  * monitoring job alerts when one source's drop rate jumps.
  *
  * Per source: total non-benchmark docs, docs dropped as
  * contaminated, kept docs, kept char mass, and the exact ppm of
  * char mass removed (integer cross-multiplication `1e6·dropped DIV
  * total` — no float division near the reported number, the
  * text_gopher_rules posture).
  *
  * Scale shape: the contamination side is already
  * broadcast-bounded (eval shingles are MB-sized against a TB
  * corpus); its flagged doc list is sparse and joins LEFT on doc_id;
  * the ledger itself is one partial-agg'd groupBy(source). Nothing
  * new shuffles — the operator adds accounting, not data movement.
  */
object Decontaminate {

  type Q = (SparkSession, String) => DataFrame

  def pipelineDecontaminate: Q = (s, dir) => {
    val flagged = Contamination.pipelineContamination(s, dir)
      .filter(col("flagged")).select(col("doc_id"), lit(true).as("dropme"))
    t(s, dir, "documents")
      .filter(!Contamination.isBench)
      .select("doc_id", "source", "n_chars")
      .join(broadcast(flagged), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("dropme"), 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("dropme").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("dropme").isNull, col("n_chars")).otherwise(0L)).as("kept_chars"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("source"), col("n_docs"), col("n_dropped"), col("n_kept"),
        col("kept_chars"),
        expr("1000000L * (total_chars - kept_chars) DIV total_chars")
          .as("dropped_ppm"))
  }

  val pipelineDecontaminateSql: String =
    s"""WITH cont AS (${Contamination.pipelineContaminationSql}),
       |flagged AS (SELECT doc_id, TRUE AS dropme FROM cont WHERE flagged),
       |nb AS (
       |  SELECT d.doc_id, d.source, d.n_chars, f.dropme
       |  FROM documents d LEFT JOIN flagged f ON f.doc_id = d.doc_id
       |  WHERE NOT (substr(md5('graft-bench-v1:' || CAST(d.doc_id AS VARCHAR)), 1, 2) < '08')),
       |led AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN dropme THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |    CAST(SUM(CASE WHEN dropme IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    CAST(SUM(CASE WHEN dropme IS NULL THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
       |    CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |  FROM nb GROUP BY source)
       |SELECT source, n_docs, n_dropped, n_kept, kept_chars,
       |  1000000 * (total_chars - kept_chars) // total_chars AS dropped_ppm
       |FROM led""".stripMargin

  private val SEM_TH = 0.3 // same near-dup bar as dedup_embedding
  private val DIMS = 64

  /** Per-doc max cosine against the broadcast bench probes — the
    * shared corpus-scoring pass behind both the semantic MEASUREMENT
    * key and the semantic drop LEDGER (one body, the two cannot
    * drift). Output: (doc_id, max_cos) for every non-bench embedded
    * doc, max over round(cos, 6)-quantized scores. */
  private def maxCosVsBench(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExpressions._
    val isBenchVec =
      substring(md5(concat(lit("graft-bench-v1:"), col("vec_id").cast(org.apache.spark.sql.types.StringType))), 1, 2) < "08"
    val emb = t(s, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", vec_norm(col("v")))
    val probes = emb.filter(isBenchVec)
      .select(col("v").as("pv"), col("nrm").as("pn"))
    emb.filter(!isBenchVec)
      .select(col("vec_id").as("doc_id"), col("v"), col("nrm"))
      .crossJoin(broadcast(probes))
      .groupBy("doc_id")
      .agg(max(round(vec_dot(col("v"), col("pv")) / (col("nrm") * col("pn")), 6))
        .as("max_cos"))
  }

  /** Semantic contamination MEASUREMENT — the embedding-space twin of
    * `pipeline_contamination`'s per-doc report (measurement and
    * execution are separate keys in the n-gram family; the semantic
    * family gets the same split): every non-bench embedded doc with
    * its max cosine against any benchmark probe and the flag at the
    * 0.3 near-dup bar. The release-review surface: sort by max_cos,
    * eyeball the borderline band, THEN run the drop ledger. Same
    * broadcast-probes / map-side-scoring / slim-row-max shape as the
    * ledger — this IS the ledger's scoring pass, surfaced. */
  def pipelineContaminationSemantic: Q = (s, dir) =>
    maxCosVsBench(s, dir)
      .select(col("doc_id"), col("max_cos"),
        (col("max_cos") >= SEM_TH).as("flagged"))

  /** The `e` + `mc` CTE pair (probe norms, per-doc max cosine) —
    * ONE text spliced into both semantic oracle twins, mirroring the
    * shared [[maxCosVsBench]] body on the Spark side. */
  private val semMcCtes: String =
    s"""e AS (
       |  SELECT vec_id, embedding,
       |    substr(md5('graft-bench-v1:' || CAST(vec_id AS VARCHAR)), 1, 2) < '08' AS is_bench,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |mc AS (
       |  SELECT c.vec_id AS doc_id,
       |    MAX(round(list_sum(list_transform(generate_series(1, $DIMS),
       |      i -> CAST(c.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
       |      / (c.nrm * b.nrm), 6)) AS max_cos
       |  FROM e c JOIN e b ON b.is_bench AND NOT c.is_bench
       |  GROUP BY c.vec_id)""".stripMargin

  val pipelineContaminationSemanticSql: String =
    s"""WITH $semMcCtes
       |SELECT doc_id, max_cos, max_cos >= $SEM_TH AS flagged FROM mc""".stripMargin

  /** SEMANTIC decontamination ledger — the embedding-space twin of
    * [[pipelineDecontaminate]]. N-gram overlap misses paraphrased
    * benchmark leakage (reworded eval questions share no 5-gram with
    * the original); the standard second line of defense scores every
    * corpus document against the benchmark set by embedding cosine
    * and drops docs whose MAX similarity to any probe crosses the
    * near-dup bar (0.3 — the same threshold `dedup_embedding`
    * establishes for this embedding space). Probe set = the bench
    * slice's embeddings (vec_id rides the same salted-md5 membership
    * as doc_id — one predicate, both tables); coverage is the
    * EMBEDDED slice (inner join doc_id = vec_id): a doc with no
    * embedding cannot be semantically tested and is out of scope by
    * construction (at sf0.1 embeddings cover 2 000 of 5 000 docs —
    * the ledger says so via its n_docs column).
    *
    * Scale shape: the probe side is an eval suite — MBs against a TB
    * corpus — so it BROADCASTS; scoring is map-side (codegen'd
    * [[graft.functions.VectorExpressions.vec_dot]] per (doc, probe)
    * pair, no corpus payload shuffle); the per-doc max is a
    * partial-agg'd groupBy(vec_id) moving one slim row per doc; the
    * doc join prunes documents to (doc_id, source, n_chars); the
    * ledger is one partial-agg'd groupBy(source). Flag decisions
    * compare round(cos, 6) — quantized BEFORE the threshold, so both
    * engines flag the identical set. */
  def pipelineDecontaminateSemantic: Q = (s, dir) => {
    val maxCos = maxCosVsBench(s, dir)
    t(s, dir, "documents")
      .filter(!Contamination.isBench)
      .select("doc_id", "source", "n_chars")
      .join(maxCos, "doc_id")
      .withColumn("dropme", col("max_cos") >= SEM_TH)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("dropme"), 1L).otherwise(0L)).as("n_dropped"),
        sum(when(!col("dropme"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("dropme"), col("n_chars")).otherwise(0L)).as("kept_chars"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("source"), col("n_docs"), col("n_dropped"), col("n_kept"),
        col("kept_chars"),
        expr("1000000L * (total_chars - kept_chars) DIV total_chars")
          .as("dropped_ppm"))
  }

  val pipelineDecontaminateSemanticSql: String =
    s"""WITH $semMcCtes,
       |led AS (
       |  SELECT d.source, d.n_chars, mc.max_cos >= $SEM_TH AS dropme
       |  FROM documents d
       |  JOIN mc ON mc.doc_id = d.doc_id
       |  WHERE NOT (substr(md5('graft-bench-v1:' || CAST(d.doc_id AS VARCHAR)), 1, 2) < '08')),
       |agg AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN dropme THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |    CAST(SUM(CASE WHEN NOT dropme THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    CAST(SUM(CASE WHEN NOT dropme THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
       |    CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |  FROM led GROUP BY source)
       |SELECT source, n_docs, n_dropped, n_kept, kept_chars,
       |  1000000 * (total_chars - kept_chars) // total_chars AS dropped_ppm
       |FROM agg""".stripMargin

  /** STREAMING semantic decontamination — the inline-enforcement
    * posture: embeddings arrive as a stream and every doc is scored
    * AS IT PASSES, with the drop ledger accumulating behind it. The
    * per-doc max over probes is computed MAP-SIDE on the stream via
    * HOFs over a broadcast 1-row probe ARRAY (collect_list of probe
    * structs — order-free because per-probe cosines are round(·, 6)-
    * quantized BEFORE the max, so the fold is a set max): per-doc
    * state is ZERO — the stream never keys on doc_id (a
    * groupBy(doc_id).max formulation would hold corpus-sized state,
    * the posture the streaming-Heaps rejection names). The inner dot
    * is the same ascending sequential fold as the batch twin's
    * vec_dot kernel (zip_with + aggregate), so stream == batch on
    * the identical doubles. Source labels ride a STATELESS
    * stream-static inner join against documents; the only streaming
    * state is the complete-mode per-source ledger (≤ n_sources
    * rows). Gate: the SAME oracle SQL as the batch ledger. */
  /** The map-side streaming scorer behind BOTH semantic stream twins
    * (one chain — ledger and kept-set enforcement cannot drift):
    * embeddings arrive on the stream, score against the broadcast
    * 1-row probe array via HOFs (zip_with + aggregate dot — the batch
    * twin's ascending fold; per-probe cosines round(·, 6)-quantized
    * BEFORE the max so collect_list order is irrelevant), and join
    * source/n_chars stream-static. Per-doc state ZERO. */
  private def semScoredStream(s: SparkSession, dir: String, stageDir: String): DataFrame = {
    import graft.functions.VectorExpressions._
    val isBenchVec =
      substring(md5(concat(lit("graft-bench-v1:"), col("vec_id").cast(org.apache.spark.sql.types.StringType))), 1, 2) < "08"
    val probesArr = t(s, dir, "embeddings")
      .filter(isBenchVec)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", vec_norm(col("v")))
      .agg(collect_list(struct(col("v").as("pv"), col("nrm").as("pn"))).as("ps"))
    val docsSide = t(s, dir, "documents")
      .filter(!Contamination.isBench)
      .select(col("doc_id").as("vec_id"), col("source"), col("n_chars"))
    val sch = s.read.parquet(s"$dir/embeddings.parquet").schema
    s.readStream.schema(sch).parquet(stageDir)
      .filter(!isBenchVec)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", vec_norm(col("v")))
      .crossJoin(broadcast(probesArr))
      // r16 optimization (guide §4): the inner dot is the codegen'd
      // vec_dot kernel instead of `aggregate(zip_with(v, p.pv,
      // (x, y) -> x * y), 0D, (a, e) -> a + e)` — the HOF form
      // materialized a fresh 64-element product array per (doc, probe)
      // pair through interpreted lambda dispatch. vec_dot is the SAME
      // ascending left-to-right fold from 0.0 (VectorExpressions
      // scaladoc), so per-probe cosines are bit-identical; the outer
      // per-probe max stays a HOF (once per probe, not per element).
      .withColumn("max_cos",
        aggregate(col("ps"), lit(-2.0), (acc, p) => greatest(acc,
          round(graft.functions.VectorExpressions.vec_dot(col("v"), p.getField("pv")) /
            (col("nrm") * p.getField("pn")), 6))))
      .withColumn("dropme", col("max_cos") >= SEM_TH)
      .join(docsSide, Seq("vec_id")) // stream-static, stateless
  }

  def streamDecontaminateSemantic: Q = (s, dir) => {
    graft.streaming.StreamStage.withStaged(s, "sdsem", dir, "embeddings.parquet") { stageDir =>
      val led = semScoredStream(s, dir, stageDir)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("dropme"), 1L).otherwise(0L)).as("n_dropped"),
          sum(when(!col("dropme"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(!col("dropme"), col("n_chars")).otherwise(0L)).as("kept_chars"),
          sum(col("n_chars")).as("total_chars"))
      graft.streaming.StreamStage.drain(s, "sdsem")(led.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_sdsem"))
    }
    s.table("graft_stream_sdsem")
      .select(col("source"), col("n_docs"), col("n_dropped"), col("n_kept"),
        col("kept_chars"),
        expr("1000000L * (total_chars - kept_chars) DIV total_chars")
          .as("dropped_ppm"))
  }

  /** STREAMING semantic enforcement, KEPT-SET output (r16 — the
    * ledger twin proves the accounting; this twin proves the
    * per-doc keep/drop DECISION, the half an inline filter actually
    * executes): the same [[semScoredStream]] chain, then a pure
    * FILTER (max_cos below the bar) landing survivors in a
    * distributed parquet sink — append mode, NO aggregation, so the
    * whole pipeline is STATELESS end to end (zero streaming state of
    * any kind — the purest enforcement shape in the repo: score,
    * decide, write, forget). Output is the kept SET (doc_id, source),
    * hash-gated row-for-row against the batch-formulated oracle. At
    * ingest scale this is the filter that runs in front of the
    * training-set writer: one broadcast probe-array scoring pass per
    * arriving doc, no drain barrier, no checkpointed aggregates. */
  def streamDecontaminateSemanticDocs: Q = (s, dir) => {
    val sink = graft.streaming.StreamStage.freshSink(s, dir, "sdsd_sink")
    graft.streaming.StreamStage.withStaged(s, "sdsd", dir, "embeddings.parquet") { stageDir =>
      val kept = semScoredStream(s, dir, stageDir)
        .filter(!col("dropme"))
        .select(col("vec_id").as("doc_id"), col("source"))
      graft.streaming.StreamStage.drain(s, "d")(kept.writeStream.outputMode("append")
        .format("parquet").option("path", sink))
    }
    s.read.parquet(sink).select("doc_id", "source")
  }

  val streamDecontaminateSemanticDocsSql: String =
    s"""WITH $semMcCtes
       |SELECT d.doc_id, d.source
       |FROM documents d
       |JOIN mc ON mc.doc_id = d.doc_id
       |WHERE NOT (substr(md5('graft-bench-v1:' || CAST(d.doc_id AS VARCHAR)), 1, 2) < '08')
       |  AND mc.max_cos < $SEM_TH""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipeline_decontaminate" -> pipelineDecontaminate,
    "pipeline_contamination_semantic" -> pipelineContaminationSemantic,
    "pipeline_decontaminate_semantic" -> pipelineDecontaminateSemantic,
    "stream_decontaminate_semantic" -> streamDecontaminateSemantic,
    "stream_decontaminate_semantic_docs" -> streamDecontaminateSemanticDocs)
  val oracles: Map[String, String] = Map(
    "pipeline_decontaminate" -> pipelineDecontaminateSql,
    "pipeline_contamination_semantic" -> pipelineContaminationSemanticSql,
    "pipeline_decontaminate_semantic" -> pipelineDecontaminateSemanticSql,
    "stream_decontaminate_semantic" -> pipelineDecontaminateSemanticSql,
    "stream_decontaminate_semantic_docs" -> streamDecontaminateSemanticDocsSql)
}
