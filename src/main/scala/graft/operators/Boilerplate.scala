package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Segment-level boilerplate removal (SURVEY.md §2C): the CCNet /
  * RefinedWeb "line dedup" step — text is split into fixed segments
  * (newline-delimited lines in a real crawl; fixed 8-token windows on
  * this corpus, the segmentation is a parameter), and any segment
  * whose exact content appears in ≥ DF_MIN distinct documents is
  * removed from EVERY document (headers, footers, nav menus,
  * cookie banners). This differs from document-level dedup: no doc is
  * dropped, but the shared substring mass is — the residual text is
  * what a trainer should see.
  */
object Boilerplate {

  type Q = (SparkSession, String) => DataFrame

  private[operators] val SEG = 8
  private[operators] val DF_MIN = 2

  /** Zero-token-doc guard as ONE spliced predicate (r16 — r15 verdict
    * #7): a doc whose text is all separators has an empty token array
    * under the unicode tokenizer (impossible under the ASCII split),
    * and the two engines' integer divisions disagree at the −1
    * degenerate segment index (Spark `div` truncates, DuckDB `//`
    * floors) — so the `_uni` scrub excludes zero-token docs EXPLICITLY
    * in both engines. The predicate text lives here once; only the
    * engine's array-length function name is a parameter (`size` /
    * `len`), so the threshold and comparison cannot drift between the
    * Spark filter and the DuckDB oracle. */
  private[operators] def nonEmptyPred(lenFn: String): String = s"$lenFn(toks) >= 1"

  /** Per-doc boilerplate scrub ledger: segment count, kept count, and
    * an order-sensitive md5 of the residual (kept segments joined in
    * document order) — the gate checks the exact reconstructed text,
    * not just counts.
    *
    * Scale shape: segmentation is a pure map-side array transform (no
    * explode-regroup — `slice` windows over the token array); the df
    * count shuffles (seg_hash, doc_id) pairs — hashes, never segment
    * text; and the boilerplate set (df ≥ DF_MIN) is BROADCAST to a
    * left join, so the corpus side never shuffles for the scrub
    * itself. When the boilerplate vocabulary outgrows a broadcast,
    * swap the broadcast join for the Bloom pre-prune of
    * [[BloomKeep]] — the semantics are the same anti-membership
    * test. */
  /** The scrub over a (doc_id, toks) table — the tokenizer is the
    * caller's: the house ASCII split here, [[graft.functions.Tokenize]]
    * for the `_uni` twin (which threads through this body VERBATIM, so
    * the two modes cannot drift in segmentation, df counting, or the
    * residual-hash reconstruction). */
  private[graft] def scrubToks(segsIn: DataFrame): DataFrame = {
    val segs = segsIn
      .select(col("doc_id"), posexplode(
        graft.functions.NgramExpressions.space_segments(col("toks"), SEG))
        .as(Seq("seg", "seg_text")))
      .withColumn("seg_hash", md5(col("seg_text")))
      .cache() // df pass + scrub pass
    val boiler = segs.groupBy("seg_hash")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= DF_MIN)
    segs.join(broadcast(boiler), Seq("seg_hash"), "left")
      .withColumn("keep", col("df").isNull)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        md5(concat_ws(" ", graft.functions.NgramExpressions.sorted_vals(collect_list(
          // collect_list skips nulls, so `when(keep, ...)` collects
          // exactly the kept segments the filter-after-sort selected;
          // seg is distinct per doc, so key-sort == struct-sort
          when(col("keep"), struct(col("seg"), col("seg_text"))))))).as("residual_hash"))
  }

  def textSegmentDedup: Q = (s, dir) => scrubToks(
    t(s, dir, "documents").withColumn("toks", split(col("text"), " ")))

  /** DuckDB twin of [[scrubToks]], parameterized the same way the
    * Spark side is (the `dedupSimhashSqlFrom` convention): `preCtes`
    * prepends fixture CTEs, `toksExpr`/`from` swap the tokenizer and
    * source, `nonEmptyGuard` adds the zero-token exclusion the
    * unicode twin needs — ONE body, so a scrub-semantics change
    * cannot drift between the ASCII and `_uni` oracles. */
  private[operators] def scrubSql(preCtes: String, toksExpr: String,
      from: String, nonEmptyGuard: Boolean): String = {
    val nz = if (nonEmptyGuard) s",\nnz AS (SELECT * FROM base WHERE ${nonEmptyPred("len")})" else ""
    val src = if (nonEmptyGuard) "nz" else "base"
    s"""WITH ${preCtes}base AS (SELECT doc_id, $toksExpr AS toks FROM $from)$nz,
       |sg AS (SELECT doc_id, toks,
       |         unnest(range(0, CAST((len(toks) - 1) // $SEG AS BIGINT) + 1)) AS seg
       |       FROM $src),
       |st AS (SELECT doc_id, seg,
       |         array_to_string(list_slice(toks, seg * $SEG + 1, seg * $SEG + $SEG), ' ') AS seg_text
       |       FROM sg),
       |dfc AS (SELECT md5(seg_text) AS h, COUNT(DISTINCT doc_id) AS df
       |        FROM st GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= $DF_MIN),
       |mk AS (SELECT st.doc_id, st.seg, st.seg_text, dfc.df IS NULL AS keep
       |       FROM st LEFT JOIN dfc ON dfc.h = md5(st.seg_text))
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
       |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  md5(coalesce(string_agg(CASE WHEN keep THEN seg_text END, ' ' ORDER BY seg), ''))
       |    AS residual_hash
       |FROM mk GROUP BY doc_id""".stripMargin
  }

  val textSegmentDedupSql: String =
    scrubSql("", "string_split(text, ' ')", "documents", nonEmptyGuard = false)

  /** The Bloom-fallback form of [[textSegmentDedup]] — for when the
    * boilerplate vocabulary outgrows a broadcast (at 100 TB a crawl's
    * shared-segment set can be billions of hashes). The anti-membership
    * test decomposes exactly: a segment whose hash the Bloom filter
    * does NOT contain is DEFINITELY not boilerplate — kept map-side,
    * never joined; only the might-contain sliver (true boilerplate +
    * false positives) reaches the exact join that removes false
    * positives. The sketch changes the plan, never the answer: output
    * is bit-identical to [[textSegmentDedup]] (same oracle; pinned in
    * Round5Spec with the might_contain plan check). */
  def textSegmentDedupBloom: Q = (s, dir) => {
    // r17: NOT cached — with the segmentation kernel the re-derive is
    // a cheap map-side scan, while caching the corpus-sized exploded
    // segment table paid a memory-columnar write + three reads (and
    // could never be the 100 TB posture anyway)
    val segs = t(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), posexplode(
        graft.functions.NgramExpressions.space_segments(col("toks"), SEG))
        .as(Seq("seg", "seg_text")))
      .withColumn("seg_hash", md5(col("seg_text")))
    val boiler = segs.groupBy("seg_hash")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= DF_MIN)
      .cache() // bloom build + exact join
    val bloom = BloomKeep.buildBloom(boiler, "seg_hash", estimatedItems = 1000000L)
    val flagged = segs.withColumn("mc", BloomKeep.mightContain(bloom, "seg_hash"))
    val maybe = flagged.filter(col("mc"))
      .join(boiler, Seq("seg_hash"), "left") // exactness: clear false positives
      .select(col("doc_id"), col("seg"), col("seg_text"), col("df").isNull.as("keep"))
    val cleared = flagged.filter(!col("mc"))
      .select(col("doc_id"), col("seg"), col("seg_text"), lit(true).as("keep"))
    maybe.unionByName(cleared)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        md5(concat_ws(" ", graft.functions.NgramExpressions.sorted_vals(collect_list(
          // collect_list skips nulls, so `when(keep, ...)` collects
          // exactly the kept segments the filter-after-sort selected;
          // seg is distinct per doc, so key-sort == struct-sort
          when(col("keep"), struct(col("seg"), col("seg_text"))))))).as("residual_hash"))
  }

  val queries: Map[String, Q] = Map(
    "text_segment_dedup" -> textSegmentDedup,
    "text_segment_dedup_bloom" -> textSegmentDedupBloom)
  val oracles: Map[String, String] = Map(
    "text_segment_dedup" -> textSegmentDedupSql,
    "text_segment_dedup_bloom" -> textSegmentDedupSql)
}
