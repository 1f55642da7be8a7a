package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Held-out RELIABILITY ledger for the NB quality classifier
  * (SURVEY.md §2C, r15b): before a curation pipeline trusts
  * [[NbClassifier]]'s keep/drop gate on 100 TB, it measures the
  * classifier against data it did not train on — the published
  * pipelines report exactly this before applying a fastText/LR
  * filter. The split is deterministic, engine-free, and UNCORRELATED
  * with the data layout (the synthetic corpus assigns sources
  * round-robin, so doc_id PARITY is perfectly confounded with the
  * class label — an md5 split bit, the house RNG-free sampler device,
  * is the honest coin): documents of the two training sources with
  * split bit 0 train the model, bit-1 documents score as the held-out
  * set (label = curated source), and the ledger is the reliability
  * diagram over ten
  * equal-width score bands: per band — population, true positives by
  * label, positive rate in ppm, predicted-positive and
  * correctly-predicted counts at the production threshold (0). All
  * ten bands are ALWAYS present (r16, r15 ADVICE #4): empty bands
  * appear as explicit zero rows via a 1..10 grid left-join — the
  * HeapsFit grid device — so a consumer plotting the diagram or
  * diffing band counts across runs never infers gaps; min/max_score
  * stay NULL for an unpopulated band. A
  * well-separated model shows pos_ppm monotone in the band index;
  * accuracy/precision/recall at the gate threshold aggregate from the
  * band rows.
  *
  * Scale shape: training is [[NbClassifier.model]]'s one aggregation
  * pass over the even half; scoring is the same broadcast-dict
  * partial-agg chain; banding is MAP-SIDE arithmetic against a
  * broadcast 1-row (lo, hi) bound — no window, no sort, no ntile
  * (equal-WIDTH bins need only the extremes, where equal-POPULATION
  * deciles would need a global sort). Cross-engine exactness: scores
  * are exact BIGINT micro-nats (the classifier's own device), the
  * band index is pure nonnegative integer arithmetic
  * ((score−lo)·10 DIV span, where Spark's truncating DIV and DuckDB's
  * flooring // agree), and pos_ppm is an integer floor division.
  */
object NbCalibration {

  type Q = (SparkSession, String) => DataFrame

  private val BANDS = 10

  /** The held-out coin: bit 0 trains, bit 1 evaluates. Spark and
    * DuckDB texts of the SAME hash (the SamplePlan device). */
  private def splitBit: org.apache.spark.sql.Column =
    graft.functions.HashExpressions.md5_head(concat(lit("cal:"), col("doc_id").cast("string")), 8) % 2
  private[operators] val splitBitDuck =
    "CAST('0x' || substr(md5('cal:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 2"

  def pipelineNbCalibration: Q = (s, dir) => {
    val pdb = Dsir.perDocBuckets(s, dir)
      .filter(col("source").isin(NbClassifier.POS, NbClassifier.NEG))
      .cache() // train pass + eval pass
    val (w, prior) = NbClassifier.model(s, pdb.filter(splitBit === 0))
    // the held-out score table CACHES (eval-split-sized — two sources'
    // bit-1 docs, never the corpus): the bounds aggregate and the
    // banding pass would otherwise each re-run the train + score chain
    val scored = pdb.filter(splitBit === 1)
      .join(broadcast(w), "bucket")
      .groupBy("doc_id", "source")
      .agg(sum(col("c") * col("w")).as("llr"))
      .crossJoin(broadcast(prior))
      .select(col("doc_id"),
        (col("llr") + col("prior")).as("score_unats"),
        (col("source") === NbClassifier.POS).as("pos"))
      .cache()
    val bounds = scored.agg(
      min(col("score_unats")).as("lo"),
      (max(col("score_unats")) - min(col("score_unats")) + 1L).as("span"))
    val banded = scored.crossJoin(broadcast(bounds))
      .withColumn("band",
        expr(s"(($BANDS * (score_unats - lo)) DIV span) + 1"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("score_unats") > 0L, 1L).otherwise(0L)).as("n_predpos"),
        sum(when(col("pos") && col("score_unats") > 0L, 1L).otherwise(0L)).as("n_tp"),
        min(col("score_unats")).as("min_score"),
        max(col("score_unats")).as("max_score"))
    // the 1..BANDS grid left-join (r16, r15 ADVICE #4 — the HeapsFit
    // grid device): EMPTY score bands appear as explicit zero rows, so
    // a reliability-diagram consumer never has to infer gaps and the
    // band count is a constant across runs; min/max_score stay NULL
    // for an unpopulated band (there is no score to report)
    val out = s.range(1, BANDS + 1).select(col("id").as("band"))
      .join(broadcast(banded), Seq("band"), "left")
      .select(col("band"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        expr("(1000000 * coalesce(n_pos, 0)) DIV greatest(coalesce(n, 0), 1)")
          .as("pos_ppm"),
        coalesce(col("n_predpos"), lit(0L)).as("n_predpos"),
        coalesce(col("n_tp"), lit(0L)).as("n_tp"),
        col("min_score"), col("max_score"))
      .cache()
    // materialize the ≤BANDS-row ledger NOW so the two corpus-scale
    // caches release executor memory immediately (r15 ADVICE #3) —
    // uncached they would pin storage for the rest of a bench session
    out.count()
    pdb.unpersist()
    scored.unpersist()
    out
  }

  val pipelineNbCalibrationSql: String = {
    val P = NbClassifier.POS
    val N = NbClassifier.NEG
    s"""WITH ${Dsir.pdbCtes},
       |tv AS (SELECT * FROM pdb WHERE source IN ('$P', '$N')),
       |tr AS (SELECT * FROM tv WHERE $splitBitDuck = 0),
       |ev AS (SELECT * FROM tv WHERE $splitBitDuck = 1),
       |${NbClassifier.modelCtes("tr")},
       |scored0 AS (
       |  SELECT doc_id, source = '$P' AS pos,
       |    CAST(SUM(c * w) AS BIGINT) AS llr
       |  FROM ev JOIN w USING (bucket)
       |  GROUP BY doc_id, source),
       |scored AS (
       |  SELECT doc_id, pos, llr + prior AS score_unats
       |  FROM scored0 CROSS JOIN prior),
       |bounds AS (
       |  SELECT CAST(MIN(score_unats) AS BIGINT) AS lo,
       |    CAST(MAX(score_unats) - MIN(score_unats) + 1 AS BIGINT) AS span
       |  FROM scored),
       |banded AS (
       |  SELECT (($BANDS * (score_unats - lo)) // span) + 1 AS band,
       |    pos, score_unats
       |  FROM scored CROSS JOIN bounds),
       |agg AS (
       |  SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |    CAST(SUM(CASE WHEN score_unats > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_predpos,
       |    CAST(SUM(CASE WHEN pos AND score_unats > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
       |    CAST(MIN(score_unats) AS BIGINT) AS min_score,
       |    CAST(MAX(score_unats) AS BIGINT) AS max_score
       |  FROM banded GROUP BY band),
       |grid AS (SELECT CAST(i AS BIGINT) AS band FROM range(1, ${BANDS + 1}) t(i))
       |SELECT g.band, COALESCE(a.n, 0) AS n, COALESCE(a.n_pos, 0) AS n_pos,
       |  (1000000 * COALESCE(a.n_pos, 0)) // GREATEST(COALESCE(a.n, 0), 1) AS pos_ppm,
       |  COALESCE(a.n_predpos, 0) AS n_predpos, COALESCE(a.n_tp, 0) AS n_tp,
       |  a.min_score, a.max_score
       |FROM grid g LEFT JOIN agg a ON a.band = g.band""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "pipeline_nb_calibration" -> pipelineNbCalibration)
  val oracles: Map[String, String] = Map(
    "pipeline_nb_calibration" -> pipelineNbCalibrationSql)
}
