package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus diversity diagnostics (SURVEY.md §2C): the two numbers a
  * dataset report card leads with before any training run.
  *
  * `text_novelty` — per-document NOVEL-n-GRAM RATE: the fraction of a
  * doc's distinct word-8-grams that appear in NO other document
  * (corpus df = 1). Published dataset analyses (the Dolma/RedPajama
  * report style, and the memorization line of work descending from
  * Lee et al. 2021) lead with exactly this number: a corpus whose
  * novel-n-gram mass collapses is template spam or near-dup soup,
  * and per-doc novelty is the cheap signal for both. Distinct from
  * `dedup_substring_spans` (duplicated-MASS measurement for span
  * removal) and `pipeline_contamination` (overlap vs a tiny broadcast
  * benchmark slice): novelty tests each doc against the WHOLE corpus.
  *
  * Scale shape: shingling is map-side (each doc's own window
  * transform), the df table is ONE partial-agg groupBy on the shingle
  * (map tasks emit one row per distinct shingle, so a stop-phrase
  * never concentrates in a reducer), the join back is keyed on the
  * shingle with NO fan-out (df is one row per shingle), and the
  * per-doc rollup partial-aggregates. Linear shuffle in token count —
  * the organic-growth audit's shape.
  *
  * `text_unigram_entropy` — per-SOURCE Shannon entropy of the unigram
  * distribution, the corpus-level diversity twin of the per-doc
  * `text_char_entropy`: H = (1/N)·Σ c_w·(ln N − ln c_w) with both
  * logarithms quantized per row to integer micro-nats (the 1e-6-grid
  * posture), so the reported entropy is exact BIGINT arithmetic and
  * the DuckDB oracle gates it bit-for-bit. Intermediate is
  * vocabulary-sized per source; nothing corpus-sized shuffles twice.
  */
object Novelty {

  type Q = (SparkSession, String) => DataFrame

  private val N = 8 // word n-gram width for novelty

  def textNovelty: Q = (s, dir) => {
    val sh = Dedup.shingles(t(s, dir, "documents"), N).cache() // df pass + join back
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val per = sh.join(df, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
    t(s, dir, "documents").select("doc_id", "source")
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        expr("(1000000 * coalesce(n_novel, 0)) div greatest(coalesce(n_grams, 0), 1)")
          .as("novelty_ppm"))
  }

  val textNoveltySql: String = {
    val cat = (0 until N).map(j => s"ws[i + $j]").mkString(" || ' ' || ")
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, sh FROM (
       |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - ${N - 1}),
       |      i -> $cat)) AS sh
       |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
       |    WHERE len(ws) >= $N)),
       |df AS (SELECT sh, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY sh),
       |per AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |    CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
       |  FROM sh JOIN df USING (sh) GROUP BY doc_id)
       |SELECT d.doc_id, d.source,
       |  CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       |  CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
       |  CAST((1000000 * COALESCE(p.n_novel, 0))
       |    // GREATEST(COALESCE(p.n_grams, 0), 1) AS BIGINT) AS novelty_ppm
       |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin
  }

  def textUnigramEntropy: Q = (s, dir) => {
    val counts = t(s, dir, "documents")
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    counts.groupBy("source")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("vocab"),
        sum(col("c") * expr("CAST(round(1e6 * ln(CAST(c AS DOUBLE))) AS BIGINT)"))
          .as("sum_clnc"))
      .select(col("source"), col("n").as("n_tokens"), col("vocab"),
        expr("(n * CAST(round(1e6 * ln(CAST(n AS DOUBLE))) AS BIGINT) - sum_clnc) DIV n")
          .as("entropy_unats"))
  }

  val textUnigramEntropySql: String =
    """WITH counts AS (
      |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents)
      |  WHERE w <> ''
      |  GROUP BY source, w),
      |agg AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS vocab,
      |    CAST(SUM(c * CAST(round(1e6 * ln(CAST(c AS DOUBLE))) AS BIGINT)) AS BIGINT)
      |      AS sum_clnc
      |  FROM counts GROUP BY source)
      |SELECT source, n AS n_tokens, vocab,
      |  (n * CAST(round(1e6 * ln(CAST(n AS DOUBLE))) AS BIGINT) - sum_clnc) // n
      |    AS entropy_unats
      |FROM agg""".stripMargin

  /** STREAMING novelty (§2D twin): the corpus df table is the
    * index-build artifact — staged once per (session, dir) like the
    * LSH pair table — and each arriving doc's distinct 8-grams score
    * through a STREAM-STATIC equi-join against it (STATELESS: no
    * watermark, no state store); the per-doc rollup and ledger join
    * run batch-side from the drained sink, the [[Dsir]] twin shape.
    * Output and oracle shared verbatim with [[textNovelty]]. */
  private def stagedDfTab(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "nov_df", coalesce = false) {
      Dedup.shingles(t(s, dir, "documents"), N)
        .groupBy("sh").agg(count(lit(1)).as("df"))
    }
  Staged.register("nov_df")((s, dir) => { stagedDfTab(s, dir); () })

  def streamNovelty: Q = (s, dir) => {
    val dfTab = stagedDfTab(s, dir)
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "snov", dir, "documents.parquet") { stageDir =>
      val streamSh = Dedup.shingles(s.readStream.schema(sch).parquet(stageDir), N)
      val scored = streamSh.join(dfTab, "sh").select(col("doc_id"), col("df"))
      graft.streaming.StreamStage.drain(s, "nov")(scored.writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_nov"))
    }
    val per = s.table("graft_stream_nov")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
    t(s, dir, "documents").select("doc_id", "source")
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        expr("(1000000 * coalesce(n_novel, 0)) div greatest(coalesce(n_grams, 0), 1)")
          .as("novelty_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "text_novelty" -> textNovelty,
    "text_unigram_entropy" -> textUnigramEntropy,
    "stream_novelty" -> streamNovelty)
  val oracles: Map[String, String] = Map(
    "text_novelty" -> textNoveltySql,
    "text_unigram_entropy" -> textUnigramEntropySql,
    "stream_novelty" -> textNoveltySql)
}
