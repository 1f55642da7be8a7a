package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VOCABULARY-GROWTH curve + Heaps'-law fit (SURVEY.md §2C, r15b) —
  * the companion diagnostic to [[ZipfFit]]: as a corpus grows, its
  * distinct-type inventory should follow V ≈ α·Nᵝ (Heaps/Herdan,
  * β ≈ 0.4–0.8 for natural-language word vocabularies — corpus- and
  * tokenizer-dependent; SURVEY.md §2 quotes the same range for this
  * key's alarm contract). A β near 1 means the inventory
  * never saturates — the classic symptom of serial numbers, hashes,
  * or boilerplate IDs flooding the stream; β near 0 means the corpus
  * is massively repetitive. Dataset cards report the curve; ingest
  * monitors alarm on the exponent; dedup planners read it directly —
  * V(N) of the SHINGLE inventory is exactly the growth rate of every
  * shingle-keyed dedup index in this repo.
  *
  * The type unit here is the word 3-GRAM (the dedup family's shingle
  * unit), not the unigram: the synthetic corpus draws from a
  * ~31-word pool, so its unigram "vocabulary" saturates inside the
  * first checkpoint (β would be exactly 0 — a correct but degenerate
  * diagnostic that exercises nothing), while the 3-gram inventory
  * grows like real text (β ≈ 0.81 at sf0.01). On a real crawl either
  * unit works; the gram width is a constant.
  *
  * The curve needs V(N) at increasing prefixes of the corpus in
  * doc_id order. The scale-safe trick: a type's contribution to every
  * prefix is determined ENTIRELY by its FIRST occurrence — so one
  * inventory-sized `min(doc_id) per gram` aggregation replaces any
  * sequential scan. Prefixes are ten equal-width doc_id slices
  * ((doc_id−lo)·10 DIV span bucketing — pure nonnegative integer
  * arithmetic, identical under Spark's truncating DIV and DuckDB's
  * flooring //); per-bucket doc/gram/first-seen counts partial-agg
  * map-side, and the cumulative sums run over the 10-row histogram
  * (a window over ten rows, never over the corpus).
  *
  * CHECKPOINT-PLACEMENT assumption (r16, r15 ADVICE #2): the ten
  * slices are equal-width cuts of doc_id VALUE space, not row-count
  * prefixes — exact and cheap when ids are ~dense/contiguous (this
  * corpus; any ingest that assigns sequential ids), but on a corpus
  * with sparse or clustered ids (post-dedup keep-lists, sharded id
  * ranges with gaps) the ten prefixes carry uneven gram mass and the
  * fit points bunch toward the populated ranges. The curve and β stay
  * CORRECT (each checkpoint is still a genuine prefix of the doc_id
  * order — the x values just stop being evenly spaced in log-N); a
  * deployment on sparse ids should derive the K cut points from
  * cumulative doc counts instead (the [[SourceQuota]] histogram-cut
  * device: bucket ids into a fine histogram, one window over the
  * histogram picks ~equal-population boundaries) — same two corpus
  * passes, one extra metadata-sized window.
  *
  * The fit is least squares of λ(V) on λ(N_grams) over the ten
  * cumulative points, in integer micro-nats (the established
  * round(1e6·ln n) device): all four moment sums are exact BIGINT
  * (≤ 10·(3.3e7)² ≈ 1.1e16 even at 10¹⁴ grams — no overflow two
  * decades past 100 TB), and the single double division at the end is
  * ONE shared expression text in both engines (the [[Moments]]
  * posture). */
object HeapsFit {

  type Q = (SparkSession, String) => DataFrame

  private val K = 10
  private val GRAM = 3

  /** β finishing expression over the exact integer moment sums —
    * spliced verbatim into both engines. Guarded for a degenerate
    * constant-x fit (den = 0). */
  private val betaExpr =
    "CASE WHEN kn * sxx - sx * sx = 0 THEN 0.0 ELSE " +
      "round(CAST(kn * sxy - sx * sy AS DOUBLE) / " +
      "CAST(kn * sxx - sx * sx AS DOUBLE), 6) END"

  /** Per-doc 3-gram token array (ALL occurrences, uncapped — Heaps
    * counts tokens, unlike the distinct df-capped dedup shingles). */
  private def gramsCol = graft.functions.NgramExpressions.word_ngrams(col("ws"), GRAM)

  def textHeapsFit: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.NgramExpressions.lower_tokens(col("text")).as("ws"))
    val bounds = docs.agg(min(col("doc_id")).as("lo"),
      (max(col("doc_id")) - min(col("doc_id")) + 1L).as("span"))
    // doc pass: the per-doc gram COUNT is pure arithmetic on the token
    // count (|grams| = max(|ws| − 2, 0)) — no gram strings materialize
    val dhist = docs.crossJoin(broadcast(bounds))
      .select(expr(s"(($K * (doc_id - lo)) DIV span) + 1").as("k"),
        expr(s"CAST(greatest(size(ws) - ${GRAM - 1}, 0) AS BIGINT)").as("n_tok"))
      .groupBy("k")
      .agg(count(lit(1)).as("nd"), sum(col("n_tok")).as("nt"))
    // inventory pass: gram strings build exactly ONCE, for the
    // first-occurrence agg — the operator's only corpus-sized shuffle
    val vhist = docs.select(col("doc_id"), explode(gramsCol).as("g"))
      .groupBy("g").agg(min(col("doc_id")).as("fd"))
      .crossJoin(broadcast(bounds))
      .select(expr(s"(($K * (fd - lo)) DIV span) + 1").as("k"))
      .groupBy("k").agg(count(lit(1)).as("nv"))
    // the 10-row grid CACHES so the output branch and the fit branch
    // share one evaluation of everything above (uncached, the final
    // crossJoin re-runs both corpus passes per branch)
    val grid = s.range(1, K + 1).select(col("id").as("k"))
      .join(broadcast(dhist), Seq("k"), "left")
      .join(broadcast(vhist), Seq("k"), "left")
      .select(col("k"), coalesce(col("nd"), lit(0L)).as("nd"),
        coalesce(col("nt"), lit(0L)).as("nt"), coalesce(col("nv"), lit(0L)).as("nv"))
      .cache()
    // cumulative over the 10-row histogram (window input is K rows by
    // construction — never the corpus)
    val w10 = org.apache.spark.sql.expressions.Window.orderBy("k")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val curve = grid.select(col("k"),
      sum(col("nd")).over(w10).as("n_docs"),
      sum(col("nt")).over(w10).as("n_grams"),
      sum(col("nv")).over(w10).as("vocab"))
    val fit = curve.filter(col("n_grams") > 0L && col("vocab") > 0L)
      .select(
        expr("CAST(round(1e6 * ln(CAST(n_grams AS DOUBLE))) AS BIGINT)").as("x"),
        expr("CAST(round(1e6 * ln(CAST(vocab AS DOUBLE))) AS BIGINT)").as("y"))
      .agg(count(lit(1)).as("kn"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .selectExpr(s"$betaExpr AS heaps_beta")
    curve.crossJoin(broadcast(fit))
  }

  val textHeapsFitSql: String = {
    val cat = (0 until GRAM).map(j => s"ws[i + $j]").mkString(" || ' ' || ")
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) >= $GRAM
       |      THEN list_transform(generate_series(1, len(ws) - ${GRAM - 1}), i -> $cat)
       |      ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(lower(text), ' '), w -> w != '') AS ws
       |        FROM documents)),
       |bounds AS (
       |  SELECT CAST(MIN(doc_id) AS BIGINT) AS lo,
       |    CAST(MAX(doc_id) - MIN(doc_id) + 1 AS BIGINT) AS span
       |  FROM base),
       |dhist AS (
       |  SELECT (($K * (doc_id - lo)) // span) + 1 AS k,
       |    CAST(COUNT(*) AS BIGINT) AS nd,
       |    CAST(SUM(len(gs)) AS BIGINT) AS nt
       |  FROM base CROSS JOIN bounds GROUP BY 1),
       |vhist AS (
       |  SELECT (($K * (fd - lo)) // span) + 1 AS k,
       |    CAST(COUNT(*) AS BIGINT) AS nv
       |  FROM (SELECT g, MIN(doc_id) AS fd
       |        FROM (SELECT doc_id, unnest(gs) AS g FROM base)
       |        GROUP BY g) CROSS JOIN bounds
       |  GROUP BY 1),
       |grid AS (
       |  SELECT CAST(i AS BIGINT) AS k,
       |    COALESCE(nd, 0) AS nd, COALESCE(nt, 0) AS nt, COALESCE(nv, 0) AS nv
       |  FROM range(1, ${K + 1}) t(i)
       |  LEFT JOIN dhist ON dhist.k = i LEFT JOIN vhist ON vhist.k = i),
       |curve AS (
       |  SELECT k,
       |    CAST(SUM(nd) OVER w AS BIGINT) AS n_docs,
       |    CAST(SUM(nt) OVER w AS BIGINT) AS n_grams,
       |    CAST(SUM(nv) OVER w AS BIGINT) AS vocab
       |  FROM grid
       |  WINDOW w AS (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |pts AS (
       |  SELECT CAST(round(1e6 * ln(CAST(n_grams AS DOUBLE))) AS BIGINT) AS x,
       |    CAST(round(1e6 * ln(CAST(vocab AS DOUBLE))) AS BIGINT) AS y
       |  FROM curve WHERE n_grams > 0 AND vocab > 0),
       |fit AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS kn,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
       |  FROM pts)
       |SELECT k, n_docs, n_grams, vocab, $betaExpr AS heaps_beta
       |FROM curve CROSS JOIN fit""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "text_heaps_fit" -> textHeapsFit)
  val oracles: Map[String, String] = Map(
    "text_heaps_fit" -> textHeapsFitSql)
}
