package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-document TF-IDF keyword extraction (SURVEY.md §2C): the top-5
  * highest-tf·idf terms of every document — the auto-tagging /
  * deduplication-explanation staple (BM25's [[Bm25]] cousin scoped to
  * one doc at a time rather than a query).
  *
  * Cross-engine-exact form: idf quantizes ONCE on the vocab-sized
  * dictionary to integer micro-nats (round(1e6·ln(N/df)), the [[Dsir]]
  * λ-dict posture), so each term's score tf·idf_unats is EXACT BIGINT;
  * ranking is (score DESC, term ASC), a total order.
  *
  * Scale shape: tf is a per-(doc, term) map-side partial agg; df is a
  * vocab-bounded aggregate; the dict joins back on the term key (no
  * fan-out); and the per-doc top-5 is a collect+sort whose state is
  * bounded by the DOCUMENT's own vocabulary (≤ its token count) —
  * never a corpus-sized window partition. The streaming twin scores
  * each micro-batch against the broadcast staged dictionary and lands
  * finished per-doc rows in a distributed parquet sink. */
object TfIdf {

  type Q = (SparkSession, String) => DataFrame

  private[operators] val TOPK = 5

  private def tf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.NgramExpressions.lower_tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))

  /** The (doc, term, tf) table — staged ONCE per corpus (r14, r13
    * verdict #2: scoring and the idf dict each re-tokenized the
    * corpus, two full scans+aggregations where one serves both).
    * Corpus-row-sized, so it keeps its natural partitioning. */
  private def stagedTf(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "tfidf_tf", coalesce = false)(tf(t(s, dir, "documents")))
  Staged.register("tfidf_tf")((s, dir) => { stagedTf(s, dir); () })

  /** The vocab-sized idf dictionary in integer micro-nats — an
    * index-build artifact for the stream twin (staged + registered),
    * derived from the staged tf table (no second tokenize pass). */
  private def idfDict(s: SparkSession, dir: String): DataFrame = {
    // n_docs reads parquet row-group counts only (column-pruned
    // count-star), not a second tokenize of the corpus
    val n = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    stagedTf(s, dir).groupBy("w").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("w"), expr(
        "CAST(round(1e6 * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))) AS BIGINT)")
        .as("idf_unats"))
  }
  private def stagedIdf(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "tfidf_idf", coalesce = false)(idfDict(s, dir))
  Staged.register("tfidf_idf")((s, dir) => { stagedIdf(s, dir); () })

  /** Per-doc top-[[TOPK]]: doc-vocab-bounded collect + sort. Shared
    * with the unicode-tokenizer twin ([[UniText]], r14). */
  private[operators] def topTerms(scored: DataFrame): DataFrame =
    scored
      .select(col("doc_id"), struct(
        (-col("tf") * col("idf_unats")).as("neg"), col("w"),
        (col("tf") * col("idf_unats")).as("score_unats"), col("tf")).as("e"))
      .groupBy("doc_id")
      .agg(expr(s"slice(array_sort(collect_list(e)), 1, $TOPK)").as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("doc_id"), col("e.w").as("term"),
        col("e.score_unats").as("score_unats"), col("e.tf").as("tf"),
        (col("pos") + 1).cast("long").as("rank"))

  def textTfidfTopk: Q = (s, dir) =>
    topTerms(stagedTf(s, dir).join(stagedIdf(s, dir), "w"))

  def streamTfidfTopk: Q = (s, dir) => {
    val dict = stagedIdf(s, dir)
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    val sink = graft.streaming.StreamStage.freshSink(s, dir, "stfidf_sink")
    graft.streaming.StreamStage.withStaged(s, "stfidf", dir, "documents.parquet") { stageDir =>
      val stream = s.readStream.schema(sch).parquet(stageDir)
      // a document arrives whole in one batch row, so per-batch
      // tf + top-k is exactly the batch-twin computation;
      // overwrite-by-batchId (r15, r14 verdict #2): a replayed batch
      // after a crash-between-write-and-commit must not re-append
      // its documents' rows
      graft.streaming.StreamStage.drain(s, "d")(stream.writeStream.outputMode("append")
        .foreachBatch(graft.streaming.StreamStage.idempotentBatchWriter(sink) {
          batch => topTerms(tf(batch).join(broadcast(dict), "w"))
        }))
    }
    s.read.parquet(sink)
      .select("doc_id", "term", "score_unats", "tf", "rank")
  }

  val textTfidfTopkSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id,
       |          unnest(list_filter(string_split(lower(text), ' '), w -> w != '')) AS w
       |        FROM documents)
       |  GROUP BY doc_id, w),
       |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
       |idf AS (
       |  SELECT w, CAST(round(1e6 * ln(CAST(n_docs AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS idf_unats
       |  FROM tf CROSS JOIN nd GROUP BY w, n_docs),
       |scored AS (
       |  SELECT tf.doc_id, tf.w, tf.tf, tf.tf * idf.idf_unats AS score_unats,
       |    row_number() OVER (PARTITION BY tf.doc_id
       |      ORDER BY tf.tf * idf.idf_unats DESC, tf.w) AS rank
       |  FROM tf JOIN idf USING (w))
       |SELECT doc_id, w AS term, score_unats, tf, CAST(rank AS BIGINT) AS rank
       |FROM scored WHERE rank <= $TOPK""".stripMargin

  val queries: Map[String, Q] = Map(
    "text_tfidf_topk" -> textTfidfTopk,
    "stream_tfidf_topk" -> streamTfidfTopk)
  val oracles: Map[String, String] = Map(
    "text_tfidf_topk" -> textTfidfTopkSql,
    "stream_tfidf_topk" -> textTfidfTopkSql)
}
