package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OVERLAPPING DOCUMENT CHUNKER (SURVEY.md §2C): split every document
  * into fixed-size token windows with overlap — the sequence-prep
  * staple shared by context-window training prep and RAG indexing
  * (overlap keeps boundary-straddling spans intact in at least one
  * chunk). Window [[W]] = 64 tokens, stride [[S]] = 48 (16-token
  * overlap); a document of n tokens yields 1 + max(0, ⌈(n−W)/S⌉)
  * chunks, the last one short.
  *
  * Cross-engine exactness: the chunk count uses INTEGER arithmetic
  * guarded against the div-semantics split (Spark `div` truncates
  * toward zero, DuckDB `//` floors — they differ on negatives, so the
  * n−W−1 numerator is clamped through GREATEST(0, …) on both sides).
  *
  * Scale shape: ENTIRELY map-side — tokenize, per-row sequence
  * explode, slice, join — no shuffle anywhere; a 100 TB corpus chunks
  * at scan speed and the output partitioning inherits the input's. */
object Chunker {

  type Q = (SparkSession, String) => DataFrame

  private val W = 64 // tokens per chunk
  private val S = 48 // stride (W - S = 16 tokens of overlap)

  private[graft] def chunks(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), graft.functions.NgramExpressions.space_tokens(col("text")).as("ws"))
      .withColumn("n", size(col("ws")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n"), col("ws"),
        explode(expr(s"sequence(0, greatest(0, (n - ${W + 1} + $S) div $S))")).as("i"))
      .select(col("doc_id"),
        col("i").cast("long").as("chunk_id"),
        (col("i") * S + 1).cast("long").as("start_tok"),
        least(lit(W), col("n") - col("i") * S).cast("long").as("n_tokens"),
        expr(s"array_join(slice(ws, i * $S + 1, least($W, n - i * $S)), ' ')").as("chunk"))

  def pipelineChunkOverlap: Q = (s, dir) => chunks(t(s, dir, "documents"))

  /** Streaming twin: stateless map-side chunking on the ingest stream,
    * landing chunks in a distributed parquet sink (rows are
    * corpus-sized — a memory sink would funnel them through the
    * driver). */
  def streamChunkDocs: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    val sink = graft.streaming.StreamStage.freshSink(s, dir, "schunk_sink")
    graft.streaming.StreamStage.withStaged(s, "schunk", dir, "documents.parquet") { stageDir =>
      val out = chunks(s.readStream.schema(sch).parquet(stageDir))
      graft.streaming.StreamStage.drain(s, "d")(out.writeStream.outputMode("append")
        .format("parquet").option("path", sink))
    }
    s.read.parquet(sink)
  }

  val pipelineChunkOverlapSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w != '') AS ws
       |  FROM documents),
       |b2 AS (SELECT doc_id, ws, len(ws) AS n FROM base WHERE len(ws) > 0),
       |c AS (
       |  SELECT doc_id, ws, n,
       |    unnest(range(0, 1 + GREATEST(0, (n - ${W + 1} + $S) // $S))) AS i
       |  FROM b2)
       |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       |  CAST(i * $S + 1 AS BIGINT) AS start_tok,
       |  CAST(LEAST($W, n - i * $S) AS BIGINT) AS n_tokens,
       |  array_to_string(ws[(i * $S + 1):(i * $S + LEAST($W, n - i * $S))], ' ') AS chunk
       |FROM c""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipeline_chunk_overlap" -> pipelineChunkOverlap,
    "stream_chunk_docs" -> streamChunkDocs)
  val oracles: Map[String, String] = Map(
    "pipeline_chunk_overlap" -> pipelineChunkOverlapSql,
    "stream_chunk_docs" -> pipelineChunkOverlapSql)
}
