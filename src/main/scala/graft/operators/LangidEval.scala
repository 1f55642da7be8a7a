package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Language-ID CONFUSION MATRIX (SURVEY.md §2C) — the QA table run
  * before any language-conditioned curation decision (mix weights,
  * CCNet buckets, per-lang fertility all key on language): cross-
  * tabulate the corpus's labeled `lang` against `text_langid`'s
  * prediction. A language whose row mass leaks into `und` or a
  * neighbor is one whose downstream per-lang statistics are lying.
  *
  * Output per (lang, pred_lang) cell: doc count and the exact ppm of
  * the true-language row it represents (integer DIV, the
  * text_gopher_rules posture) — the diagonal ppm IS per-language
  * recall, off-diagonal cells name the confusion.
  *
  * Scale shape: the langid pass is map-side (marker-word counting per
  * doc, no shuffle); the matrix is one partial-agg'd
  * groupBy(lang, pred_lang) — cells are bounded by |langs|², so the
  * broadcast-back of row totals is metadata-sized.
  */
object LangidEval {

  type Q = (SparkSession, String) => DataFrame

  def textLangidConfusion: Q = (s, dir) => {
    val cells = TextOps.textLangId(s, dir)
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
    val rows = cells.groupBy("lang").agg(sum(col("n_docs")).as("row_total"))
    cells.join(broadcast(rows), "lang")
      .select(col("lang"), col("pred_lang"), col("n_docs"),
        expr("(1000000L * n_docs) DIV row_total").as("row_ppm"),
        (col("lang") === col("pred_lang")).as("correct"))
  }

  val textLangidConfusionSql: String =
    s"""WITH lid AS (${TextOps.textLangIdSql}),
       |cells AS (
       |  SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM lid GROUP BY lang, pred_lang),
       |rows_t AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS row_total
       |           FROM cells GROUP BY lang)
       |SELECT c.lang, c.pred_lang, c.n_docs,
       |  (1000000 * c.n_docs) // r.row_total AS row_ppm,
       |  c.lang = c.pred_lang AS correct
       |FROM cells c JOIN rows_t r ON r.lang = c.lang""".stripMargin

  val queries: Map[String, Q] = Map(
    "text_langid_confusion" -> textLangidConfusion)
  val oracles: Map[String, String] = Map(
    "text_langid_confusion" -> textLangidConfusionSql)
}
