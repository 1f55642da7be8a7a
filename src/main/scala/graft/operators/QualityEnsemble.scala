package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** QUALITY-SIGNAL ENSEMBLE (SURVEY.md §2C, r12): real curation stacks
  * don't run one filter — they run a battery (the C4/Gopher heuristic
  * rules, an entropy/garbage screen, a redundancy screen) and report
  * per-rule attrition so the data card explains WHERE mass went. This
  * operator composes three already-gated per-doc signals —
  * `text_gopher_rules`' word-count rule (the full keep_doc flag is
  * degenerate on this corpus: the synthetic vocabulary carries no
  * English stopwords, so the stopword rule kills everything — a
  * dead-branch ensemble gates nothing), `text_char_entropy`'s
  * micro-nat entropy, `text_novelty`'s novel-8-gram ppm — into the
  * standard sequential-attribution ledger: a doc is killed by the
  * FIRST rule it fails (length → entropy → novelty), so the per-rule
  * counts sum to exactly n_docs − n_kept per source.
  *
  * Thresholds are integer micro-nat / ppm constants (both sides share
  * the literals; no float compare anywhere), chosen so BOTH branches
  * of every rule fire on the test corpus.
  *
  * Scale shape: each signal is its own already-linear plan; the
  * composition is three keyed equi-joins on doc_id (uniform keys) and
  * one per-source partial-agg rollup. At 100 TB the three signals
  * land in one pass each over the corpus and the ensemble join
  * shuffles doc_id-keyed rows of a few columns — the attribution
  * ledger costs no more than its inputs. */
object QualityEnsemble {

  type Q = (SparkSession, String) => DataFrame

  private val T_ENTROPY = 2800000L // micro-nats
  private val T_NOVELTY = 500000L // ppm

  def pipelineQualityEnsemble: Q = (s, dir) => {
    val g = graft.functions.TextOps.textGopherRules(s, dir)
      .select(col("doc_id"), col("r_wordcount").as("pass_len"))
    val ce = CharEntropy.textCharEntropy(s, dir)
      .select("doc_id", "entropy_unats")
    val nv = Novelty.textNovelty(s, dir)
      .select("doc_id", "novelty_ppm")
    t(s, dir, "documents").select("doc_id", "source")
      .join(g, "doc_id").join(ce, "doc_id").join(nv, "doc_id")
      .withColumn("pass_e", col("entropy_unats") >= T_ENTROPY)
      .withColumn("pass_n", col("novelty_ppm") >= T_NOVELTY)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pass_len") && col("pass_e") && col("pass_n"), 1L)
          .otherwise(0L)).as("n_kept"),
        sum(when(!col("pass_len"), 1L).otherwise(0L)).as("killed_length"),
        sum(when(col("pass_len") && !col("pass_e"), 1L).otherwise(0L))
          .as("killed_entropy"),
        sum(when(col("pass_len") && col("pass_e") && !col("pass_n"), 1L)
          .otherwise(0L)).as("killed_novelty"))
  }

  /** Oracle: the three gated signals' own SQL bodies as CTEs (nested
    * WITHs scope locally), composed with the same integer thresholds
    * and first-failing-rule attribution. */
  val pipelineQualityEnsembleSql: String =
    s"""WITH geq AS (
       |${graft.functions.TextOps.textGopherRulesSql.replace("\n", "\n  ")}
       |),
       |ceq AS (
       |${CharEntropy.textCharEntropySql.replace("\n", "\n  ")}
       |),
       |nvq AS (
       |${Novelty.textNoveltySql.replace("\n", "\n  ")}
       |)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN g.r_wordcount AND c.entropy_unats >= $T_ENTROPY
       |    AND n.novelty_ppm >= $T_NOVELTY THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN NOT g.r_wordcount THEN 1 ELSE 0 END) AS BIGINT) AS killed_length,
       |  CAST(SUM(CASE WHEN g.r_wordcount AND c.entropy_unats < $T_ENTROPY
       |    THEN 1 ELSE 0 END) AS BIGINT) AS killed_entropy,
       |  CAST(SUM(CASE WHEN g.r_wordcount AND c.entropy_unats >= $T_ENTROPY
       |    AND n.novelty_ppm < $T_NOVELTY THEN 1 ELSE 0 END) AS BIGINT) AS killed_novelty
       |FROM documents d
       |JOIN geq g ON g.doc_id = d.doc_id
       |JOIN ceq c ON c.doc_id = d.doc_id
       |JOIN nvq n ON n.doc_id = d.doc_id
       |GROUP BY d.source""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipeline_quality_ensemble" -> pipelineQualityEnsemble)
  val oracles: Map[String, String] = Map(
    "pipeline_quality_ensemble" -> pipelineQualityEnsembleSql)
}
