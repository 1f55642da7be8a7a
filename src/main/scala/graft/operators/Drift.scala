package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-source DISTRIBUTION DRIFT (SURVEY.md §2C): Jensen–Shannon
  * divergence between each source's unigram distribution P and the
  * REST of the corpus Q — the dataset-card number that flags a crawl
  * snapshot whose language drifted from the rest of the mix (and the
  * shift statistic CCNet-style curation monitors between dumps).
  *
  * Cross-engine-exact form: with integer counts c1 (source), c2 =
  * total − c1 (rest), N1, N2 token masses, every log JSD needs is a
  * log of an INTEGER:
  *
  *   p/m = 2·c1·N2 / (c1·N2 + c2·N1)      (p = c1/N1, q = c2/N2,
  *   q/m = 2·c2·N1 / (c1·N2 + c2·N1)       m = (p+q)/2)
  *
  * so ln(p/m) = ln2 + ln(c1·N2) − ln(c1·N2 + c2·N1), each term
  * quantized per row to integer micro-nats AFTER the count multiply
  * (round(1e6·c·ln k) — a libm last-ulp flip costs ≤1 unat per row
  * instead of c unats), term sums carried as
  * DECIMAL(38,0) (a raw double Σ would lose low bits past 2^53), and
  * only the final N1/N2 normalization runs in (exactly-converted)
  * doubles. Words ABSENT from the source (p = 0) contribute exactly
  * q·ln2 each, so their whole mass folds into the closed form
  * ln2·(N2 − Σ_present c2) — no absent-(source,word) rows are ever
  * materialized (that cross product is the naive plan's corpus×vocab
  * blowup).
  *
  * Scale shape: ONE corpus-sized pass (the (source, word) count
  * groupBy, map-side partial aggs); the totals table is vocab-sized
  * and joins on the word key with no fan-out; N1/Ntot are
  * metadata-sized broadcast joins; the rollup partial-aggregates to
  * one row per source. Linear shuffle in token count.
  */
object Drift {

  type Q = (SparkSession, String) => DataFrame

  private val QLN2 = 693147L // round(1e6 · ln 2)

  def textJsDrift: Q = (s, dir) => {
    // the vocab-sized count table feeds FOUR plan branches (totals,
    // masses, grand total, and the term join) — cache it or the
    // corpus explode recomputes once per branch
    val c1 = t(s, dir, "documents")
      .select(col("source"),
        explode(graft.functions.NgramExpressions.lower_tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c1"))
      .cache()
    val tot = c1.groupBy("w").agg(sum(col("c1")).as("tw"))
    val n1 = c1.groupBy("source").agg(sum(col("c1")).as("n1"))
    val nt = c1.agg(sum(col("c1")).as("ntot"))
    val j = c1.join(tot, "w")
      .join(broadcast(n1), "source")
      .crossJoin(broadcast(nt))
      .select(col("source"), col("c1"), (col("tw") - col("c1")).as("c2"),
        col("n1"), (col("ntot") - col("n1")).as("n2"))
      .filter(col("n2") > 0) // drift vs an empty rest is undefined
    // r13 (r12 ADVICE): quantize AFTER the c1/c2 multiply — round(1e6·
    // c·ln(…)) instead of c·round(1e6·ln(…)) — so a last-ulp libm
    // difference at a .5 boundary flips at most 1 unat PER ROW instead
    // of c unats (the count used to amplify the flip). Residual
    // cross-engine risk is the double's own ulp once 1e6·c·ln(…)
    // exceeds 2^53 — astronomically-counted terms, the same regime
    // where the c·n products themselves need widening.
    val terms = j.select(col("source"), col("n1"), col("n2"), col("c2"),
      expr(s"""$QLN2 * c1
              |  + CAST(round(1e6 * c1 * ln(CAST(c1 * n2 AS DOUBLE))) AS BIGINT)
              |  - CAST(round(1e6 * c1 * ln(CAST(c1 * n2 + c2 * n1 AS DOUBLE))) AS BIGINT)"""
        .stripMargin).as("at"),
      expr(s"""CASE WHEN c2 > 0 THEN $QLN2 * c2
              |  + CAST(round(1e6 * c2 * ln(CAST(c2 * n1 AS DOUBLE))) AS BIGINT)
              |  - CAST(round(1e6 * c2 * ln(CAST(c1 * n2 + c2 * n1 AS DOUBLE))) AS BIGINT)
              |ELSE 0 END""".stripMargin).as("bt"))
    terms.groupBy("source", "n1", "n2")
      .agg(count(lit(1)).as("vocab"),
        sum(col("at").cast("decimal(38,0)")).as("s1"),
        sum(col("bt").cast("decimal(38,0)")).as("s2p"),
        sum(col("c2")).as("c2p"))
      .select(col("source"), col("n1").as("n_tokens"), col("vocab"),
        expr(s"""CAST(round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                |  + (CAST(s2p AS DOUBLE) + $QLN2 * CAST(n2 - c2p AS DOUBLE))
                |      / CAST(n2 AS DOUBLE)) / 2) AS BIGINT)""".stripMargin)
          .as("jsd_unats"))
  }

  val textJsDriftSql: String =
    s"""WITH c1 AS (
       |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c1
       |  FROM (SELECT source,
       |          unnest(list_filter(string_split(lower(text), ' '), w -> w != '')) AS w
       |        FROM documents)
       |  GROUP BY source, w),
       |tot AS (SELECT w, CAST(SUM(c1) AS BIGINT) AS tw FROM c1 GROUP BY w),
       |n1 AS (SELECT source, CAST(SUM(c1) AS BIGINT) AS n1 FROM c1 GROUP BY source),
       |nt AS (SELECT CAST(SUM(c1) AS BIGINT) AS ntot FROM c1),
       |j AS (
       |  SELECT c1.source, c1.c1, tot.tw - c1.c1 AS c2, n1.n1, nt.ntot - n1.n1 AS n2
       |  FROM c1 JOIN tot USING (w) JOIN n1 USING (source) CROSS JOIN nt
       |  WHERE nt.ntot - n1.n1 > 0),
       |terms AS (
       |  SELECT source, n1, n2, c2,
       |    $QLN2 * c1
       |      + CAST(round(1e6 * c1 * ln(CAST(c1 * n2 AS DOUBLE))) AS BIGINT)
       |      - CAST(round(1e6 * c1 * ln(CAST(c1 * n2 + c2 * n1 AS DOUBLE))) AS BIGINT) AS at,
       |    CASE WHEN c2 > 0 THEN $QLN2 * c2
       |      + CAST(round(1e6 * c2 * ln(CAST(c2 * n1 AS DOUBLE))) AS BIGINT)
       |      - CAST(round(1e6 * c2 * ln(CAST(c1 * n2 + c2 * n1 AS DOUBLE))) AS BIGINT)
       |    ELSE 0 END AS bt
       |  FROM j),
       |agg AS (
       |  SELECT source, n1, n2, CAST(COUNT(*) AS BIGINT) AS vocab,
       |    SUM(CAST(at AS HUGEINT)) AS s1, SUM(CAST(bt AS HUGEINT)) AS s2p,
       |    CAST(SUM(c2) AS BIGINT) AS c2p
       |  FROM terms GROUP BY source, n1, n2)
       |SELECT source, n1 AS n_tokens, vocab,
       |  CAST(round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       |    + (CAST(s2p AS DOUBLE) + $QLN2 * CAST(n2 - c2p AS DOUBLE))
       |        / CAST(n2 AS DOUBLE)) / 2) AS BIGINT) AS jsd_unats
       |FROM agg""".stripMargin

  val queries: Map[String, Q] = Map("text_js_drift" -> textJsDrift)
  val oracles: Map[String, String] = Map("text_js_drift" -> textJsDriftSql)
}
