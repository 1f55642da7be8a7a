package graft.functions

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for the training-data pipeline
  * (SURVEY.md §2C): token counting, quality scoring, language ID,
  * document fingerprinting, exact dedup.
  *
  * Everything here is built from codegen'd `functions._` and
  * higher-order array functions — no UDFs — so the plans stay inside
  * whole-stage codegen and scale linearly with document count (pure
  * map-side work except the final dedup groupBy, which shuffles on the
  * 128-bit fingerprint: effectively uniform keys, no skew).
  *
  * Every operator has an exact DuckDB oracle: the heuristics are
  * deliberately expressed with functions whose semantics match between
  * Spark (Java regex) and DuckDB (RE2) on the ASCII patterns used.
  */
object TextOps {

  type Q = (SparkSession, String) => DataFrame

  private[graft] val stoplist = Seq("the", "a", "of", "and", "in", "to", "is", "on")
  private[graft] def sqlList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** Normalized text: lowercase, trimmed, whitespace collapsed.
    * graft-visible so stage-composing operators (the attrition
    * funnel) share the exact canonical form dedup_exact elects by. */
  private[graft] val normExpr = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"
  private[graft] val normSqlDuck = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** Whitespace + BPE-ish regex token counting. */
  def textTokenCount: Q = (s, dir) => {
    t(s, dir, "documents").select(
      col("doc_id"),
      length(col("text")).cast(LongType).as("n_chars_calc"),
      size(split(col("text"), " ")).cast(LongType).as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast(LongType).as("n_re_tokens"))
  }

  val textTokenCountSql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars_calc,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_re_tokens
      |FROM documents""".stripMargin

  /** Quality scoring: length/stopword/word-shape ratios + composite
    * score. All ratios are single double divisions (deterministic). */
  def textQuality: Q = (s, dir) => {
    t(s, dir, "documents")
      .withColumn("n_words", size(split(col("text"), " ")).cast(LongType))
      .withColumn("n_stop",
        graft.functions.NgramExpressions.count_tokens_in(col("text"), stoplist)
          .cast(LongType))
      .select(
        col("doc_id"),
        col("n_words"),
        ((length(col("text")) - (col("n_words") - 1)) / col("n_words")).as("avg_word_len"),
        (col("n_stop") / col("n_words")).as("stop_ratio"),
        (least(col("n_words") / 50.0, lit(1.0)) * 0.4
          + (col("n_stop") / col("n_words")) * 0.3
          + least(((length(col("text")) - (col("n_words") - 1)) / col("n_words")) / 8.0, lit(1.0)) * 0.3
          ).as("quality_score"))
  }

  val textQualitySql: String =
    s"""SELECT doc_id, n_words,
       |  (length(text) - (n_words - 1)) / n_words AS avg_word_len,
       |  n_stop / n_words AS stop_ratio,
       |  least(n_words / 50.0, 1.0) * 0.4
       |    + (n_stop / n_words) * 0.3
       |    + least(((length(text) - (n_words - 1)) / n_words) / 8.0, 1.0) * 0.3 AS quality_score
       |FROM (
       |  SELECT doc_id, text,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |    CAST(len(list_filter(string_split(text, ' '), w -> w IN (${sqlList(stoplist)}))) AS BIGINT) AS n_stop
       |  FROM documents) sub""".stripMargin

  /** Stopword-marker language ID: count marker-word hits per language,
    * argmax with a fixed preference order, 'und' when nothing hits. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans"),
    "es" -> Seq("el", "los", "las", "una", "por", "como"),
    "zh" -> Seq("de5", "shi4", "le5"))

  /** The langid transform as a pure per-row map (shared by the batch
    * key and its r12 streaming twin — marker counting, argmax and the
    * tie order are all row-local expressions). */
  private[graft] def langIdOf(docs: DataFrame): DataFrame = {
    val base = markers.foldLeft(docs) { case (df, (lg, ws)) =>
      df.withColumn(s"c_$lg",
        graft.functions.NgramExpressions.count_tokens_in(col("text"), ws).cast(LongType))
    }
    val best = markers.map { case (lg, _) => col(s"c_$lg") }.reduce(greatest(_, _))
    val pred = markers.foldRight(lit("und")) { case ((lg, _), acc) =>
      when(col(s"c_$lg") > 0 && col(s"c_$lg") === best, lit(lg)).otherwise(acc)
    }
    // foldRight keeps 'en' as the outermost WHEN → ties prefer en,de,fr,es,zh
    base.select(col("doc_id"), col("lang"), pred.as("pred_lang"))
  }

  def textLangId: Q = (s, dir) => langIdOf(t(s, dir, "documents"))

  val textLangIdSql: String = {
    val counts = markers.map { case (lg, ws) =>
      s"CAST(len(list_filter(string_split(text, ' '), w -> w IN (${sqlList(ws)}))) AS BIGINT) AS c_$lg"
    }.mkString(",\n    ")
    val best = "greatest(" + markers.map { case (lg, _) => s"c_$lg" }.mkString(", ") + ")"
    val cases = markers.map { case (lg, _) =>
      s"WHEN c_$lg > 0 AND c_$lg = $best THEN '$lg'"
    }.mkString("\n    ")
    s"""SELECT doc_id, lang,
       |  CASE $cases ELSE 'und' END AS pred_lang
       |FROM (
       |  SELECT doc_id, lang, $counts
       |  FROM documents) sub""".stripMargin
  }

  /** Document fingerprints: md5 of normalized text + the minimum
    * word-3-gram shingle hash (the seed of the MinHash scheme). */
  def textFingerprint: Q = (s, dir) => {
    t(s, dir, "documents")
      .withColumn("norm", expr(normExpr))
      .withColumn("ws", split(col("norm"), " "))
      .select(
        col("doc_id"),
        md5(col("norm")).as("fp_md5"),
        when(size(col("ws")) >= 3,
          array_min(graft.functions.NgramExpressions.array_md5(graft.functions.NgramExpressions.word_ngrams(col("ws"), 3))))
          .otherwise(md5(col("norm"))).as("fp_shingle_min"))
  }

  val textFingerprintSql: String =
    s"""SELECT doc_id,
       |  md5(norm) AS fp_md5,
       |  CASE WHEN len(ws) >= 3
       |    THEN list_min(list_transform(generate_series(1, len(ws) - 2),
       |      i -> md5(ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])))
       |    ELSE md5(norm) END AS fp_shingle_min
       |FROM (
       |  SELECT doc_id, $normSqlDuck AS norm,
       |    string_split($normSqlDuck, ' ') AS ws
       |  FROM documents) sub""".stripMargin

  /** Exact dedup: group by normalized-text fingerprint, keep the
    * minimum doc_id per group. Shuffles on the md5 key (uniform). */
  def dedupExact: Q = (s, dir) => {
    t(s, dir, "documents")
      .select(col("doc_id"), md5(expr(normExpr)).as("fp"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("group_size"))
  }

  val dedupExactSql: String =
    s"""SELECT fp, MIN(doc_id) AS keep_id, COUNT(*) AS group_size
       |FROM (SELECT doc_id, md5($normSqlDuck) AS fp FROM documents) sub
       |GROUP BY fp""".stripMargin

  /** Per-doc character diversity as Simpson/Gini impurity over the
    * letter distribution: gini = (n² − Σc²)/n² — 0 for "aaaa…" spam,
    * →1 for varied text. The log-free diversity index: Shannon entropy
    * needs floating logs whose last ulp differs across engines, while
    * this is all-BIGINT until one final integer-derived division.
    * Letter counts come from 26 codegen'd length(replace(…)) pairs
    * over the LOWERCASED text (so "AAAA" spam and mixed-case prose
    * score the same as their lowercase forms; the signal stays ASCII
    * a-z — non-Latin scripts fall to n_letters=0 by contract) —
    * pure map-side, no explode, ZERO shuffle for the whole signal. */
  def textCharDiversity: Q = (s, dir) => {
    val counts = ('a' to 'z').map(ch =>
      (length(col("text")) - length(expr(s"replace(text, '$ch', '')")))
        .cast(LongType))
    val n = counts.reduce(_ + _)
    val sumSq = counts.map(c => c * c).reduce(_ + _)
    t(s, dir, "documents")
      .select(col("doc_id"), lower(col("text")).as("text"))
      .select(
        col("doc_id"), n.as("n_letters"), sumSq.as("sum_sq"),
        when(n > 0, ((n * n - sumSq).cast(DoubleType)) / (n * n).cast(DoubleType))
          .otherwise(lit(0.0)).as("gini"))
  }

  val textCharDiversitySql: String = {
    val cs = ('a' to 'z').map(ch =>
      s"CAST(length(text) - length(replace(text, '$ch', '')) AS BIGINT)")
    val n = cs.mkString(" + ")
    val sq = cs.map(c => s"($c) * ($c)").mkString(" + ")
    s"""SELECT doc_id, n_letters, sum_sq,
       |  CASE WHEN n_letters > 0
       |    THEN CAST(n_letters * n_letters - sum_sq AS DOUBLE)
       |      / CAST(n_letters * n_letters AS DOUBLE)
       |    ELSE 0.0 END AS gini
       |FROM (
       |  SELECT doc_id, CAST($n AS BIGINT) AS n_letters,
       |    CAST($sq AS BIGINT) AS sum_sq
       |  FROM (SELECT doc_id, lower(text) AS text FROM documents) lowered) sub""".stripMargin
  }

  /** Corpus-level top terms by document frequency: per-document
    * distinct words (map-side array_distinct — a word repeated in one
    * doc counts once), partial-agg'd counts keyed by word, then a
    * deterministic top-20 (df desc, word asc). The ordered limit plans
    * as TakeOrderedAndProject over the partial aggregation, so only
    * each task's local top rows reach the driver-side merge — the same
    * 100 TB shape as q3's top-k. */
  def textTopTerms: Q = (s, dir) => {
    t(s, dir, "documents")
      .select(col("doc_id"), explode(expr("array_distinct(split(text, ' '))")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("word"))
      .limit(20)
  }

  val textTopTermsSql: String =
    """SELECT word, COUNT(*) AS df FROM (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents)
      |WHERE word <> ''
      |GROUP BY word
      |ORDER BY df DESC, word
      |LIMIT 20""".stripMargin

  private val VOCAB_K = 512

  /** Out-of-vocabulary rate per document against the corpus's own
    * top-[[VOCAB_K]] vocabulary — the tokenizer-health signal of a
    * curation pipeline (rising OOV = drifting corpus or wrong vocab).
    * The vocabulary is a deterministic ordered limit (count desc,
    * word asc → TakeOrderedAndProject over a partial agg, driver
    * merges each task's top rows) and is BROADCAST to the per-token
    * membership join — vocabulary-sized, so the corpus side never
    * shuffles; the per-doc aggregation partial-aggregates on doc_id. */
  def textOovRate: Q = (s, dir) => {
    val words = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val vocab = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(VOCAB_K)
      .select(col("w"), lit(1).as("in_v"))
    words.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1).otherwise(0)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov") / col("n_tokens").cast(DoubleType)).as("oov_rate"))
  }

  /** Per-doc mean corpus term frequency ("commonness") — the
    * inverse-rarity quality signal: low mean_tf = jargon/noise-heavy
    * doc, high = stopword soup. The corpus-vs-corpus token join is the
    * skew case study: token keys are Zipfian, so a naive equi-join
    * puts "the" on one reducer. Mitigation here is the canonical
    * head/tail split — the top-[[VOCAB_K]] head of the frequency table
    * (metadata-sized by construction) joins BROADCAST map-side, and
    * only the long tail (cold keys, near-uniform by definition) takes
    * the shuffle join; AQE skew handling backstops the residue. */
  def textCommonness: Q = (s, dir) => {
    val words = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val freq = words.groupBy("w").agg(count(lit(1)).as("tf"))
    val head = freq.orderBy(col("tf").desc, col("w")).limit(VOCAB_K)
    val hot = words.join(broadcast(head), Seq("w"))
    val cold = words.join(broadcast(head.select("w")), Seq("w"), "left_anti")
      .join(freq, Seq("w"))
    hot.unionByName(cold)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("tf")).as("sum_tf"))
      .select(col("doc_id"), col("n_tokens"), col("sum_tf"),
        (col("sum_tf") / col("n_tokens").cast(DoubleType)).as("mean_tf"))
  }

  val textCommonnessSql: String =
    """WITH w AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> ''),
      |f AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS tf FROM w GROUP BY w)
      |SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(f.tf) AS BIGINT) AS sum_tf,
      |  CAST(SUM(f.tf) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS mean_tf
      |FROM w JOIN f ON f.w = w.w
      |GROUP BY w.doc_id""".stripMargin

  val textOovRateSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> ''),
       |v AS (
       |  SELECT w, 1 AS in_v FROM (
       |    SELECT w, COUNT(*) AS cnt FROM w GROUP BY w
       |    ORDER BY cnt DESC, w LIMIT $VOCAB_K) t)
       |SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN v.in_v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST(SUM(CASE WHEN v.in_v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    / CAST(COUNT(*) AS DOUBLE) AS oov_rate
       |FROM w LEFT JOIN v ON v.w = w.w
       |GROUP BY w.doc_id""".stripMargin

  /** Deterministic stratified sampling for corpus curation: per-stratum
    * (language) keep rates expressed as hex-prefix thresholds over
    * md5(salt ++ doc_id) — two hex digits = 256 uniform buckets, so
    * '20' keeps 32/256 = 12.5%. No RNG: the same row set is kept on
    * every run, every engine, any partitioning — the reproducibility
    * property a 100 TB curation pipeline needs (and the oracle can
    * replay exactly). Pure map-side filter; nothing shuffles. */
  private val sampleRates: Seq[(String, String)] = Seq(
    "en" -> "20", // 12.5% of the dominant stratum
    "de" -> "80", // 50%
    "fr" -> "80", // 50%
    "es" -> "40", // 25%
    "zh" -> "ff") // ~100% of the rare stratum (255/256)
  private val SAMPLE_SALT = "graft-sample-v1:"

  def pipelineSampleStratified: Q = (s, dir) => {
    val bucket = substring(md5(concat(lit(SAMPLE_SALT), col("doc_id").cast(StringType))), 1, 2)
    val threshold = sampleRates.foldRight(lit("00")) { case ((lg, th), acc) =>
      when(col("lang") === lg, lit(th)).otherwise(acc)
    }
    t(s, dir, "documents")
      .filter(bucket < threshold)
      .select(col("doc_id"), col("lang"), bucket.as("bucket"))
  }

  val pipelineSampleStratifiedSql: String = {
    val cases = sampleRates.map { case (lg, th) => s"WHEN lang = '$lg' THEN '$th'" }
      .mkString("\n    ")
    s"""SELECT doc_id, lang, substr(md5('$SAMPLE_SALT' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
       |FROM documents
       |WHERE substr(md5('$SAMPLE_SALT' || CAST(doc_id AS VARCHAR)), 1, 2)
       |  < CASE $cases ELSE '00' END""".stripMargin
  }

  /** PII scrubbing + denylist redaction. The PII patterns (email,
    * IPv4, US-style phone) are the real-world payload — chosen so the
    * Java-regex and RE2 semantics coincide (ASCII classes, `\b`,
    * bounded repetition); on this synthetic corpus they are a
    * documented no-op (the corpus has no digits), while the denylist
    * hits constantly, so the oracle exercises both the fire and
    * no-fire paths. Pure map-side string work: no shuffle at all, the
    * exact shape a 100 TB scrub pass needs (and why it composes with
    * any downstream op for free). */
  private val piiPatterns = Seq( // (pattern, replacement) — applied in order
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b" -> "<PHONE>")
  private val termPattern = "\\b(customer|order)\\b" // stand-in sensitive-term denylist

  /** The scrub transform as a pure per-row map (shared by the batch
    * key and its r12 streaming twin). */
  private[graft] def redactOf(docs: DataFrame): DataFrame = {
    val redacted = (piiPatterns :+ (termPattern -> "<TERM>"))
      .foldLeft(col("text")) { case (c, (re, repl)) => regexp_replace(c, re, repl) }
    val nPii = piiPatterns.map { case (re, _) =>
      size(expr(s"regexp_extract_all(text, '${re.replace("\\", "\\\\")}', 0)")).cast(LongType)
    }.reduce(_ + _)
    docs.select(
      col("doc_id"),
      redacted.as("clean_text"),
      nPii.as("n_pii"),
      size(expr(s"regexp_extract_all(text, '${termPattern.replace("\\", "\\\\")}', 0)"))
        .cast(LongType).as("n_terms"))
  }

  def textRedact: Q = (s, dir) => redactOf(t(s, dir, "documents"))

  val textRedactSql: String = {
    val redacted = (piiPatterns :+ (termPattern -> "<TERM>"))
      .foldLeft("text") { case (c, (re, repl)) => s"regexp_replace($c, '$re', '$repl', 'g')" }
    val nPii = piiPatterns.map { case (re, _) =>
      s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT)"
    }.mkString(" + ")
    s"""SELECT doc_id,
       |  $redacted AS clean_text,
       |  $nPii AS n_pii,
       |  CAST(len(regexp_extract_all(text, '$termPattern')) AS BIGINT) AS n_terms
       |FROM documents""".stripMargin
  }

  /** Inverse-document-frequency-weighted language ID — the §7 upgrade
    * over [[textLangId]]'s raw marker counts: a marker word's vote is
    * weighted by how RARE it is in this corpus, so ubiquitous markers
    * ("the" in a mostly-English crawl) stop drowning out decisive ones.
    * Weights are fixed-point longs — `1e6 / (df + 1)` by integer
    * division — so every partial sum is exact integer arithmetic:
    * engine-independent, partial-agg-order-independent, no float drift
    * (a double idf·count sum would hash-mismatch across fold orders).
    *
    * Scale shape: two broadcast joins (marker table ~30 rows; df table
    * ≤ marker count) around map-side explodes; the per-doc score
    * groupBy shuffles uniform (doc_id, lang) keys; the final argmax
    * window partitions by doc_id (unique keys, skew-free). */
  def textLangIdWeighted: Q = (s, dir) => {
    import s.implicits._
    val markerDf = broadcast(
      markers.flatMap { case (lg, ws) => ws.map(w => (w, lg)) }.toDF("word", "mlang"))
    val docs = t(s, dir, "documents")
    val words = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("word"))
    val hits = words.join(markerDf, "word") // broadcast
    // document frequency of each marker word (distinct docs containing it)
    val dfTab = hits.select("word", "doc_id").distinct()
      .groupBy("word").agg(count(lit(1)).as("df"))
    val scored = hits
      .groupBy(col("doc_id"), col("lang"), col("mlang"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(dfTab), "word")
      // `div`, not `/`: Spark's `/` on longs is double division, and a
      // double quotient that rounds up across an integer boundary would
      // diverge from the oracle's exact `//`
      .withColumn("w_score", expr("cnt * 1000000L div (df + 1L)"))
      .groupBy(col("doc_id"), col("lang"), col("mlang"))
      .agg(sum(col("w_score")).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("mlang"))
    val best = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("mlang"), col("score"))
    docs.select("doc_id", "lang").join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("mlang"), lit("und")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  val textLangIdWeightedSql: String = {
    val markerRows = markers.flatMap { case (lg, ws) => ws.map(w => s"('$w', '$lg')") }
      .mkString(", ")
    s"""WITH mk(word, mlang) AS (VALUES $markerRows),
       |words AS (
       |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents),
       |hits AS (SELECT w.doc_id, w.lang, w.word, mk.mlang FROM words w JOIN mk ON mk.word = w.word),
       |dftab AS (
       |  SELECT word, COUNT(*) AS df FROM (SELECT DISTINCT word, doc_id FROM hits) GROUP BY word),
       |scored AS (
       |  SELECT h.doc_id, h.lang, h.mlang,
       |    CAST(SUM(h.cnt * 1000000 // (d.df + 1)) AS BIGINT) AS score
       |  FROM (SELECT doc_id, lang, mlang, word, COUNT(*) AS cnt
       |        FROM hits GROUP BY doc_id, lang, mlang, word) h
       |  JOIN dftab d ON d.word = h.word
       |  GROUP BY h.doc_id, h.lang, h.mlang),
       |best AS (
       |  SELECT doc_id, mlang, score FROM (
       |    SELECT doc_id, mlang, score, row_number() OVER (
       |      PARTITION BY doc_id ORDER BY score DESC, mlang) AS rn
       |    FROM scored) WHERE rn = 1)
       |SELECT d.doc_id, d.lang,
       |  coalesce(b.mlang, 'und') AS pred_lang,
       |  CAST(coalesce(b.score, 0) AS BIGINT) AS score
       |FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id""".stripMargin
  }

  /** Sequence packing for pretraining batches: documents are packed
    * contiguously (straddle allowed) into fixed token-budget bins,
    * per source shard — each doc gets the bin and offset where it
    * starts. Packing is planned with a running token total, which is
    * only tractable at 100 TB because the window partitions by shard:
    * every source packs independently and in parallel, and no global
    * order exists to serialize on (a corpus-global cumsum would funnel
    * everything through one partition — the classic window anti-shape
    * this avoids). All integer arithmetic, so the plan is exact and
    * engine-independent. */
  private val PACK_BUDGET = 2048 // tokens per packed sequence

  /** Pack plan with running totals: (doc_id, source, n_tokens, cum)
    * where n_tokens is the document's BPE subword count (r3: re-pointed
    * from whitespace counts to [[Bpe.docTokenCounts]] — a token-budget
    * pipeline packs what the model will actually see) and cum its
    * per-shard running total. */
  private def packPlanCum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents").select(col("doc_id"), col("source"))
      .join(Bpe.docTokenCounts(s, dir).select("doc_id", "n_tokens"), Seq("doc_id"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
  }

  /** DuckDB twin of [[packPlanCum]] — append to [[Bpe.duckDocTokensCtes]]. */
  private val packPlanCte: String =
    """pack_plan AS (
      |  SELECT d.doc_id, d.source, t.n_tokens,
      |    CAST(SUM(t.n_tokens) OVER (PARTITION BY d.source ORDER BY d.doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM documents d JOIN bpe_doc_tokens t USING (doc_id))""".stripMargin

  def pipelinePackSequences: Q = (s, dir) => {
    packPlanCum(s, dir)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"(cum - n_tokens) div ${PACK_BUDGET}L").as("bin_id"),
        expr(s"(cum - n_tokens) % ${PACK_BUDGET}L").as("bin_offset"))
  }

  val pipelinePackSequencesSql: String =
    s"""WITH ${Bpe.duckDocTokensCtes},
       |$packPlanCte
       |SELECT doc_id, source, n_tokens,
       |  CAST((cum - n_tokens) // $PACK_BUDGET AS BIGINT) AS bin_id,
       |  CAST((cum - n_tokens) % $PACK_BUDGET AS BIGINT) AS bin_offset
       |FROM pack_plan""".stripMargin

  /** Packed-bin materialization: explode each planned document into
    * the (bin_id, slice) pieces that realize the packing — a document
    * occupying shard-token interval [cum - n_tokens, cum) contributes
    * one slice per bin it straddles. Downstream, a writer groups by
    * (source, bin_id) and concatenates slices at bin_offset to emit
    * fixed-budget training sequences. Map-side explode over the plan
    * (`sequence` spans are tiny: a doc touches ⌈n_tokens/budget⌉+1
    * bins), so the shuffle — if the writer needs one — is keyed by
    * bin, never by corpus order. Every bin's slice lengths sum to the
    * budget except each shard's final bin (asserted in BpeSpec). */
  def pipelinePackBins: Q = (s, dir) => {
    val B = PACK_BUDGET
    packPlanCum(s, dir)
      .filter(col("n_tokens") > 0L)
      .withColumn("start", col("cum") - col("n_tokens"))
      .withColumn("bin_id", explode(expr(s"sequence(start div ${B}L, (cum - 1L) div ${B}L)")))
      .select(col("source"), col("bin_id"), col("doc_id"),
        greatest(col("bin_id") * B - col("start"), lit(0L)).as("slice_start"),
        (least(col("cum"), (col("bin_id") + 1) * B) -
          greatest(col("start"), col("bin_id") * B)).as("slice_len"),
        (greatest(col("start"), col("bin_id") * B) - col("bin_id") * B).as("bin_offset"))
  }

  val pipelinePackBinsSql: String =
    s"""WITH ${Bpe.duckDocTokensCtes},
       |$packPlanCte,
       |exploded AS (
       |  SELECT source, doc_id, n_tokens, cum,
       |    unnest(generate_series((cum - n_tokens) // $PACK_BUDGET, (cum - 1) // $PACK_BUDGET)) AS bin_id
       |  FROM pack_plan WHERE n_tokens > 0)
       |SELECT source, CAST(bin_id AS BIGINT) AS bin_id, doc_id,
       |  CAST(greatest(bin_id * $PACK_BUDGET - (cum - n_tokens), 0) AS BIGINT) AS slice_start,
       |  CAST(least(cum, (bin_id + 1) * $PACK_BUDGET) -
       |    greatest(cum - n_tokens, bin_id * $PACK_BUDGET) AS BIGINT) AS slice_len,
       |  CAST(greatest(cum - n_tokens, bin_id * $PACK_BUDGET) - bin_id * $PACK_BUDGET AS BIGINT) AS bin_offset
       |FROM exploded""".stripMargin

  /** Per-bin ATTENTION-MASK metadata for the packed sequences: the
    * ordered document-boundary list (as an order-sensitive digest),
    * segment count, fill, and padding tail — what a packed-sequence
    * trainer needs to reset attention at document boundaries without
    * re-reading any text. One partial-agg'd groupBy over the
    * pack_bins assignment; the per-bin collect is bounded by
    * docs-per-bin (budget/min-doc-len), never corpus-sized. */
  def pipelinePackMask: Q = (s, dir) => {
    val B = PACK_BUDGET
    pipelinePackBins(s, dir)
      .groupBy("source", "bin_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(col("slice_len")).as("fill"),
        md5(concat_ws(",", graft.functions.NgramExpressions.sorted_vals(collect_list(struct(col("bin_offset"),
            expr("concat(CAST(bin_offset AS STRING), ':', CAST(slice_len AS STRING))"))))))
          .as("mask_md5"))
      .select(col("source"), col("bin_id"), col("n_segments"), col("fill"),
        (lit(B) - col("fill")).as("n_pad"), col("mask_md5"))
  }

  val pipelinePackMaskSql: String =
    s"""WITH ${Bpe.duckDocTokensCtes},
       |$packPlanCte,
       |exploded AS (
       |  SELECT source, doc_id, n_tokens, cum,
       |    unnest(generate_series((cum - n_tokens) // $PACK_BUDGET, (cum - 1) // $PACK_BUDGET)) AS bin_id
       |  FROM pack_plan WHERE n_tokens > 0),
       |pb AS (
       |  SELECT source, CAST(bin_id AS BIGINT) AS bin_id,
       |    CAST(least(cum, (bin_id + 1) * $PACK_BUDGET) -
       |      greatest(cum - n_tokens, bin_id * $PACK_BUDGET) AS BIGINT) AS slice_len,
       |    CAST(greatest(cum - n_tokens, bin_id * $PACK_BUDGET) - bin_id * $PACK_BUDGET AS BIGINT) AS bin_offset
       |  FROM exploded)
       |SELECT source, bin_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
       |  CAST(SUM(slice_len) AS BIGINT) AS fill,
       |  CAST($PACK_BUDGET - SUM(slice_len) AS BIGINT) AS n_pad,
       |  md5(string_agg(CAST(bin_offset AS VARCHAR) || ':' || CAST(slice_len AS VARCHAR),
       |    ',' ORDER BY bin_offset)) AS mask_md5
       |FROM pb GROUP BY source, bin_id""".stripMargin

  /** Intra-document repetition (Gopher-style quality signal): the
    * fraction of word-3-gram occurrences that are repeats of an
    * earlier 3-gram in the same document. Pure map-side array work —
    * no shuffle, composes with any keep-list filter for free. */
  def textRepetition: Q = (s, dir) => {
    t(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 3)
      .withColumn("grams", graft.functions.NgramExpressions.word_ngrams(col("ws"), 3))
      .select(col("doc_id"),
        size(col("grams")).cast(LongType).as("n_grams"),
        size(array_distinct(col("grams"))).cast(LongType).as("n_distinct"),
        ((size(col("grams")) - size(array_distinct(col("grams"))))
          / size(col("grams")).cast(DoubleType)).as("rep_ratio"))
  }

  val textRepetitionSql: String =
    """SELECT doc_id,
      |  CAST(len(grams) AS BIGINT) AS n_grams,
      |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
      |  (len(grams) - len(list_distinct(grams))) / CAST(len(grams) AS DOUBLE) AS rep_ratio
      |FROM (
      |  SELECT doc_id, list_transform(generate_series(1, len(ws) - 2),
      |    i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]) AS grams
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 3)""".stripMargin

  /** Quality-decile bucketing WITHOUT a global sort — how you decile
    * 100 TB: (1) one partial-agg stats pass over the quality score,
    * (2) a 64-bin mergeable histogram (map-side agg onto ≤64 keys),
    * (3) the nine decile boundaries interpolated from the 64-row
    * histogram (the [[Sketches.sketchHistogramQuantile]] estimator),
    * (4) boundary vector BROADCAST and each doc's bucket = count of
    * boundaries ≤ its score (a map-side array scan), (5) per-bucket
    * stats. The ntile() formulation would range-shuffle every row;
    * here the corpus is touched by exactly three scans, all
    * partial-aggregating, and nothing wider than 64 rows ever sits in
    * one place. */
  /** Attach (n_words, score) to any DataFrame with a `text` column —
    * the composite quality score, usable on batch AND streaming
    * inputs (pure map-side expressions, no aggregation). */
  private[graft] def withQualityScore(df: DataFrame): DataFrame =
    df
      .withColumn("n_words", size(split(col("text"), " ")).cast(LongType))
      .withColumn("n_stop",
        graft.functions.NgramExpressions.count_tokens_in(col("text"), stoplist)
          .cast(LongType))
      .withColumn("score",
        least(col("n_words") / 50.0, lit(1.0)) * 0.4
          + (col("n_stop") / col("n_words")) * 0.3
          + least(((length(col("text")) - (col("n_words") - 1)) / col("n_words")) / 8.0,
            lit(1.0)) * 0.3)

  /** (doc_id, source, n_words, score) with the composite quality
    * score — shared base of the decile operators. */
  private[graft] def qualityDocs(s: SparkSession, dir: String): DataFrame =
    withQualityScore(t(s, dir, "documents"))
      .select(col("doc_id"), col("source"), col("n_words"), col("score"))

  /** One-row DataFrame holding the 9 decile boundaries of `score` as a
    * sorted array `bs`, estimated from a 64-bin mergeable histogram
    * (the sketchHistogramQuantile closed form — constant state, no
    * global sort). */
  private[graft] def decileBounds(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val st = docs.agg(min(col("score")).as("lo"), max(col("score")).as("hi"),
        count(lit(1)).as("n"))
      .withColumn("w", expr("(hi - lo) / CAST(64 AS DOUBLE)"))
    val hist = docs.crossJoin(broadcast(st))
      .select(expr("CAST(least(floor((score - lo) / w), CAST(63 AS DOUBLE)) AS BIGINT)")
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val cum = hist.select(col("bin"), col("cnt"),
      sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
        .orderBy("bin").rowsBetween(Long.MinValue, 0)).as("cum"))
    import s.implicits._
    val qs = (1 to 9).map(_ / 10.0).toDF("p")
    val sel = cum.crossJoin(broadcast(st)).crossJoin(broadcast(qs))
      .filter(expr("CAST(cum AS DOUBLE) >= p * CAST(n AS DOUBLE)"))
      .groupBy("p").agg(min(col("bin")).as("bin"))
    sel.join(cum, "bin").crossJoin(broadcast(st))
      .select(expr("""lo + w * (CAST(bin AS DOUBLE)
                     |  + (p * CAST(n AS DOUBLE) - (CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE)))
                     |    / CAST(cnt AS DOUBLE))""".stripMargin).as("q"))
      .agg(sort_array(collect_list(col("q"))).as("bs"))
  }

  /** Streaming QUALITY-HISTOGRAM twin (r6): the corpus quality
    * distribution maintained incrementally as shards land. The
    * composite score is a convex combination of [0,1] signals, so the
    * domain is FIXED — bin = min(floor(score·64), 63) needs no prior
    * stats pass, which is precisely what makes the histogram a
    * legitimate streaming aggregate: complete-mode state is ≤64 rows
    * for ANY stream length (the data-derived-bounds batch form cannot
    * stream — its bin width depends on a finished min/max pass).
    * Decile boundaries interpolate batch-side from the drained 64-row
    * histogram (the sketchHistogramQuantile closed form; the window
    * runs over ≤64 rows, never the corpus). A 100 TB ingest keeps its
    * quality deciles current per micro-batch instead of rescanning. */
  def streamQualityHistogram: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "sqh", dir, "documents.parquet") { stageDir =>
      val docs = withQualityScore(s.readStream.schema(sch).parquet(stageDir))
      val hist = docs
        .select(expr(
          "CAST(least(CAST(floor(score * CAST(64 AS DOUBLE)) AS DOUBLE), CAST(63 AS DOUBLE)) AS BIGINT)")
          .as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cnt"))
      graft.streaming.StreamStage.drain(s, "qh")(hist.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_qh"))
    }
    val s2 = s
    import s2.implicits._
    val hist = s.table("graft_stream_qh")
    val st = hist.agg(sum(col("cnt")).as("n"))
    val cum = hist.select(col("bin"), col("cnt"),
      sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
        .orderBy("bin").rowsBetween(Long.MinValue, 0)).as("cum"))
    val qs = (1 to 9).map(_ / 10.0).toDF("p")
    val sel = cum.crossJoin(broadcast(st)).crossJoin(broadcast(qs))
      .filter(expr("CAST(cum AS DOUBLE) >= p * CAST(n AS DOUBLE)"))
      .groupBy("p").agg(min(col("bin")).as("bin"))
    sel.join(cum, "bin").crossJoin(broadcast(st))
      .select(col("p"), col("bin"),
        expr("""(CAST(bin AS DOUBLE)
               |  + (p * CAST(n AS DOUBLE) - (CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE)))
               |    / CAST(cnt AS DOUBLE)) / CAST(64 AS DOUBLE)""".stripMargin).as("est_q"))
  }

  val streamQualityHistogramSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id,
       |    least(n_words / 50.0, 1.0) * 0.4
       |      + (n_stop / n_words) * 0.3
       |      + least(((length(text) - (n_words - 1)) / n_words) / 8.0, 1.0) * 0.3 AS score
       |  FROM (
       |    SELECT doc_id, text,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |      CAST(len(list_filter(string_split(text, ' '), w -> w IN (${sqlList(stoplist)}))) AS BIGINT) AS n_stop
       |    FROM documents) sub),
       |b AS (SELECT CAST(LEAST(FLOOR(score * CAST(64 AS DOUBLE)), CAST(63 AS DOUBLE)) AS BIGINT) AS bin,
       |             COUNT(*) AS cnt
       |      FROM docs GROUP BY 1),
       |st AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM b),
       |c AS (SELECT bin, cnt, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum FROM b),
       |q AS (SELECT UNNEST([CAST(0.1 AS DOUBLE), CAST(0.2 AS DOUBLE), CAST(0.3 AS DOUBLE),
       |                     CAST(0.4 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.6 AS DOUBLE),
       |                     CAST(0.7 AS DOUBLE), CAST(0.8 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS p),
       |sel AS (SELECT q.p, MIN(c.bin) AS bin
       |        FROM q, c, st WHERE CAST(c.cum AS DOUBLE) >= q.p * CAST(st.n AS DOUBLE)
       |        GROUP BY q.p)
       |SELECT sel.p, sel.bin,
       |  (CAST(sel.bin AS DOUBLE)
       |    + (sel.p * CAST(st.n AS DOUBLE) - (CAST(c.cum AS DOUBLE) - CAST(c.cnt AS DOUBLE)))
       |      / CAST(c.cnt AS DOUBLE)) / CAST(64 AS DOUBLE) AS est_q
       |FROM sel JOIN c ON c.bin = sel.bin CROSS JOIN st""".stripMargin

  def pipelineQualityBuckets: Q = (s, dir) => {
    val docs = qualityDocs(s, dir).cache() // stats + histogram + assignment passes
    docs.crossJoin(broadcast(decileBounds(docs)))
      .withColumn("bucket", expr("CAST(size(filter(bs, b -> b <= score)) AS BIGINT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"),
        sum(col("n_words")).as("total_words"))
  }

  /** The decile-boundary CTE chain ([[decileBounds]]'s DuckDB twin) —
    * shared by the quality-bucket and curriculum oracles. */
  private val decileCtesSqlDuck: String =
    s"""docs AS (
       |  SELECT doc_id, n_words,
       |    least(n_words / 50.0, 1.0) * 0.4
       |      + (n_stop / n_words) * 0.3
       |      + least(((length(text) - (n_words - 1)) / n_words) / 8.0, 1.0) * 0.3 AS score
       |  FROM (
       |    SELECT doc_id, text,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |      CAST(len(list_filter(string_split(text, ' '), w -> w IN (${sqlList(stoplist)}))) AS BIGINT) AS n_stop
       |    FROM documents) sub),
       |st AS (SELECT MIN(score) AS lo, MAX(score) AS hi, COUNT(*) AS n,
       |              (MAX(score) - MIN(score)) / CAST(64 AS DOUBLE) AS w FROM docs),
       |b AS (SELECT CAST(LEAST(FLOOR((docs.score - st.lo) / st.w), CAST(63 AS DOUBLE)) AS BIGINT) AS bin,
       |             COUNT(*) AS cnt
       |      FROM docs CROSS JOIN st GROUP BY 1),
       |c AS (SELECT bin, cnt, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum FROM b),
       |q AS (SELECT UNNEST([CAST(0.1 AS DOUBLE), CAST(0.2 AS DOUBLE), CAST(0.3 AS DOUBLE),
       |                     CAST(0.4 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.6 AS DOUBLE),
       |                     CAST(0.7 AS DOUBLE), CAST(0.8 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS p),
       |sel AS (SELECT q.p, MIN(c.bin) AS bin
       |        FROM q, c, st WHERE CAST(c.cum AS DOUBLE) >= q.p * CAST(st.n AS DOUBLE)
       |        GROUP BY q.p),
       |bq AS (SELECT st.lo + st.w * (CAST(sel.bin AS DOUBLE)
       |         + (sel.p * CAST(st.n AS DOUBLE) - (CAST(c.cum AS DOUBLE) - CAST(c.cnt AS DOUBLE)))
       |           / CAST(c.cnt AS DOUBLE)) AS q
       |       FROM sel JOIN c ON c.bin = sel.bin CROSS JOIN st),
       |bs AS (SELECT list(q ORDER BY q) AS bs FROM bq)""".stripMargin

  val pipelineQualityBucketsSql: String =
    s"""WITH $decileCtesSqlDuck
       |SELECT CAST(len(list_filter(bs.bs, bb -> bb <= docs.score)) AS BIGINT) AS bucket,
       |  COUNT(*) AS n_docs, MIN(docs.score) AS min_score, MAX(docs.score) AS max_score,
       |  CAST(SUM(docs.n_words) AS BIGINT) AS total_words
       |FROM docs CROSS JOIN bs
       |GROUP BY 1""".stripMargin

  /** Multi-phase training CURRICULUM schedule (r6): the standard
    * quality-annealing plan — later training phases restrict to
    * higher quality deciles (phase 0 sees everything, phase 1 drops
    * the bottom 3 deciles, phase 2 keeps the top 3). Composes the
    * broadcast decile boundaries with a map-side membership test per
    * (doc, phase); per-phase doc/token mass + keep share is one
    * partial-agg'd groupBy over 3·corpus fanned rows. What the
    * trainer's data loader reads to plan each phase's token budget. */
  def pipelineCurriculum: Q = (s, dir) => {
    val s2 = s
    import s2.implicits._
    val docs = qualityDocs(s, dir).cache()
    val bucketed = docs.crossJoin(broadcast(decileBounds(docs)))
      .withColumn("bucket", expr("CAST(size(filter(bs, b -> b <= score)) AS BIGINT)"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    val phases = Seq((0L, 0L), (1L, 3L), (2L, 7L)).toDF("phase", "floor_decile")
    bucketed.crossJoin(broadcast(phases))
      .filter(col("bucket") >= col("floor_decile"))
      .groupBy("phase", "floor_decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("total_words"))
      .crossJoin(broadcast(total))
      .select(col("phase"), col("floor_decile"), col("n_docs"), col("total_words"),
        (col("n_docs").cast(DoubleType) / col("n_total")).as("keep_share"))
  }

  val pipelineCurriculumSql: String =
    s"""WITH $decileCtesSqlDuck,
       |bucketed AS (
       |  SELECT docs.doc_id, docs.n_words,
       |    CAST(len(list_filter(bs.bs, bb -> bb <= docs.score)) AS BIGINT) AS bucket
       |  FROM docs CROSS JOIN bs),
       |tot AS (SELECT COUNT(*) AS n_total FROM docs),
       |ph(phase, floor_decile) AS (VALUES
       |  (CAST(0 AS BIGINT), CAST(0 AS BIGINT)), (1, 3), (2, 7))
       |SELECT ph.phase, ph.floor_decile,
       |  COUNT(*) AS n_docs, CAST(SUM(b.n_words) AS BIGINT) AS total_words,
       |  CAST(COUNT(*) AS DOUBLE) / tot.n_total AS keep_share
       |FROM bucketed b CROSS JOIN ph CROSS JOIN tot
       |WHERE b.bucket >= ph.floor_decile
       |GROUP BY ph.phase, ph.floor_decile, tot.n_total""".stripMargin

  /** Feature-hashed document embeddings (r6 — the HashingVectorizer/
    * Vowpal device): each token maps to one of 256 buckets by md5 hex
    * prefix (string buckets — no integer conversion, so both engines
    * agree without a conv() dependency), per-doc bucket counts form a
    * sparse vector. Emitted as exact integers (nnz, Σcnt²), the L2
    * norm (IEEE sqrt is correctly rounded — deterministic), and an
    * order-sensitive fingerprint over the sorted sparse entries, so a
    * single miscounted bucket breaks the hash. Map-side explode + two
    * partial-agg groupBys; at 100 TB this is how you get fixed-width
    * features from text WITHOUT a vocabulary build or a training
    * pass — the cheap embedding the ANN/dedup family can consume. */
  def textHashEmbedding: Q = (s, dir) => {
    t(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.NgramExpressions.lower_tokens(col("text"))).as("w"))
      .withColumn("bucket", substring(md5(col("w")), 1, 2))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nnz"),
        sum(col("cnt") * col("cnt")).as("sum_sq"),
        sqrt(sum(col("cnt") * col("cnt")).cast(DoubleType)).as("l2"),
        md5(concat_ws(",", graft.functions.NgramExpressions.sorted_vals(collect_list(struct(col("bucket"),
            expr("concat(bucket, ':', cnt)"))))))
          .as("vec_fp"))
  }

  val textHashEmbeddingSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), w -> w != '')) AS w
      |  FROM documents),
      |bt AS (
      |  SELECT doc_id, substr(md5(w), 1, 2) AS bucket, COUNT(*) AS cnt
      |  FROM toks GROUP BY doc_id, substr(md5(w), 1, 2))
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nnz,
      |  CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq,
      |  sqrt(CAST(SUM(cnt * cnt) AS DOUBLE)) AS l2,
      |  md5(string_agg(bucket || ':' || cnt, ',' ORDER BY bucket)) AS vec_fp
      |FROM bt GROUP BY doc_id""".stripMargin

  /** Per-decile hex thresholds for the md5-bucket sampler: decile b
    * keeps ~b/10 of its docs (floor(256·b/10) as two hex chars, the
    * same string-comparison device as pipeline_sample_stratified). */
  private val decileThresholds: Seq[String] = (0 to 9).map(b => f"${b * 256 / 10}%02x")

  /** Quality-weighted sampling: compose the decile assignment
    * ([[pipelineQualityBuckets]]'s boundary machinery) with the
    * deterministic md5-threshold sampler — higher-quality deciles keep
    * a larger fraction (decile b keeps ≈b/10), the standard
    * quality-curriculum downsampling move. Per (source, decile) cell
    * the plan reports corpus size, the integer target floor(n·b/10),
    * and the count actually selected by the hash threshold — both
    * engines materialize the identical sample set, so the gate checks
    * the selection itself, not just its size. Everything is map-side
    * after the broadcast boundary join; one groupBy on (source,
    * bucket) ends the plan. */
  def pipelineSampleByQuality: Q = (s, dir) => {
    val docs = qualityDocs(s, dir).cache()
    val thr = decileThresholds.map(t => s"'$t'").mkString(", ")
    docs.crossJoin(broadcast(decileBounds(docs)))
      .withColumn("bucket", expr("CAST(size(filter(bs, b -> b <= score)) AS BIGINT)"))
      .withColumn("sampled",
        expr(s"substring(md5(concat('qs:', CAST(doc_id AS STRING))), 1, 2)") <
          expr(s"element_at(array($thr), CAST(bucket AS INT) + 1)"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(count(*) * first(bucket) div 10 AS BIGINT)").as("target_n"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("sampled_n"))
  }

  val pipelineSampleByQualitySql: String = {
    val thr = decileThresholds.map(t => s"'$t'").mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, source,
       |    least(n_words / 50.0, 1.0) * 0.4
       |      + (n_stop / n_words) * 0.3
       |      + least(((length(text) - (n_words - 1)) / n_words) / 8.0, 1.0) * 0.3 AS score
       |  FROM (
       |    SELECT doc_id, source, text,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |      CAST(len(list_filter(string_split(text, ' '), w -> w IN (${sqlList(stoplist)}))) AS BIGINT) AS n_stop
       |    FROM documents) sub),
       |st AS (SELECT MIN(score) AS lo, MAX(score) AS hi, COUNT(*) AS n,
       |              (MAX(score) - MIN(score)) / CAST(64 AS DOUBLE) AS w FROM docs),
       |b AS (SELECT CAST(LEAST(FLOOR((docs.score - st.lo) / st.w), CAST(63 AS DOUBLE)) AS BIGINT) AS bin,
       |             COUNT(*) AS cnt
       |      FROM docs CROSS JOIN st GROUP BY 1),
       |c AS (SELECT bin, cnt, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum FROM b),
       |q AS (SELECT UNNEST([CAST(0.1 AS DOUBLE), CAST(0.2 AS DOUBLE), CAST(0.3 AS DOUBLE),
       |                     CAST(0.4 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.6 AS DOUBLE),
       |                     CAST(0.7 AS DOUBLE), CAST(0.8 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS p),
       |sel AS (SELECT q.p, MIN(c.bin) AS bin
       |        FROM q, c, st WHERE CAST(c.cum AS DOUBLE) >= q.p * CAST(st.n AS DOUBLE)
       |        GROUP BY q.p),
       |bq AS (SELECT st.lo + st.w * (CAST(sel.bin AS DOUBLE)
       |         + (sel.p * CAST(st.n AS DOUBLE) - (CAST(c.cum AS DOUBLE) - CAST(c.cnt AS DOUBLE)))
       |           / CAST(c.cnt AS DOUBLE)) AS q
       |       FROM sel JOIN c ON c.bin = sel.bin CROSS JOIN st),
       |bs AS (SELECT list(q ORDER BY q) AS bs FROM bq),
       |assigned AS (
       |  SELECT docs.doc_id, docs.source, docs.score,
       |    CAST(len(list_filter(bs.bs, bb -> bb <= docs.score)) AS BIGINT) AS bucket
       |  FROM docs CROSS JOIN bs)
       |SELECT source, bucket, COUNT(*) AS n_docs,
       |  CAST(COUNT(*) * bucket // 10 AS BIGINT) AS target_n,
       |  CAST(SUM(CASE WHEN substr(md5('qs:' || CAST(doc_id AS VARCHAR)), 1, 2)
       |    < ([$thr])[CAST(bucket AS INT) + 1] THEN 1 ELSE 0 END) AS BIGINT) AS sampled_n
       |FROM assigned
       |GROUP BY source, bucket""".stripMargin
  }

  /** Lexical-diversity signals: type-token ratio (distinct / total
    * whitespace tokens) and hapax ratio (share of types occurring
    * exactly once) — standard quality features for filtering
    * low-diversity (spammy, template-generated) documents. One
    * explode + two partial-agg groupBys; ratios are single double
    * divisions rounded to 6 so both engines agree bit-for-bit. */
  def textTtr: Q = (s, dir) => {
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast(DoubleType) / col("n_tokens"), 6).as("ttr"),
        round(col("n_hapax").cast(DoubleType) / col("n_types"), 6).as("hapax_ratio"))
  }

  val textTtrSql: String =
    """SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_types,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  round(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS ttr,
      |  round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS hapax_ratio
      |FROM (
      |  SELECT doc_id, tok, COUNT(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok)
      |GROUP BY doc_id""".stripMargin

  /** GOPHER-STYLE quality rule filter (r9 — the MassiveText rule set
    * from Rae et al. 2021, the published heuristic battery most
    * production LLM corpora start from): per document, each rule is
    * an INTEGER-EXACT predicate (ratio thresholds as
    * cross-multiplications, so no float division can diverge between
    * engines) — word-count bounds [50, 100k], mean word length
    * [3, 10] chars, symbol-to-word ratio (# + ellipsis) < 0.1,
    * bullet-started lines < 90%, ellipsis-ended lines < 30%, words
    * with an alphabetic char ≥ 80%, and ≥ 2 distinct stop words
    * present. keep_doc = all rules. Pure map-side (one projection
    * over the corpus scan — no shuffle at any scale); the per-rule
    * bits feed the usual "which rule kills how much data" curation
    * report downstream. */
  def textGopherRules: Q = (s, dir) => gopherRules(t(s, dir, "documents"))

  /** Rule body over any (doc_id, text) frame — split out so specs can
    * anchor each rule on crafted documents and the streaming twin can
    * carry extra columns through (`passthrough`). */
  def gopherRules(docs: org.apache.spark.sql.DataFrame,
      passthrough: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val base = docs
      .withColumn("words", graft.functions.NgramExpressions.space_tokens(col("text")))
      .withColumn("lines", split(col("text"), "\n"))
      .withColumn("wc", size(col("words")).cast(LongType))
      .withColumn("twl", expr("aggregate(words, 0L, (a, w) -> a + length(w))"))
      .withColumn("hashes", (length(col("text")) - length(expr("replace(text, '#', '')"))).cast(LongType))
      .withColumn("ells", expr("CAST((length(text) - length(replace(text, '...', ''))) DIV 3 AS BIGINT)"))
      .withColumn("nl", size(col("lines")).cast(LongType))
      .withColumn("bul", expr("size(filter(lines, l -> l LIKE '- %' OR l LIKE '* %'))").cast(LongType))
      .withColumn("ell_lines", expr("size(filter(lines, l -> l LIKE '%...'))").cast(LongType))
      .withColumn("aw", expr("size(filter(words, w -> w rlike '[A-Za-z]'))").cast(LongType))
      .withColumn("stop_hits",
        expr(s"size(filter(array(${sqlList(gopherStops)}), sw -> array_contains(words, sw)))")
          .cast(LongType))
    val rWc = col("wc") >= 50L && col("wc") <= 100000L
    val rWl = lit(3L) * col("wc") <= col("twl") && col("twl") <= lit(10L) * col("wc")
    val rSym = lit(10L) * (col("hashes") + col("ells")) < col("wc")
    val rBul = lit(10L) * col("bul") <= lit(9L) * col("nl")
    val rEll = lit(10L) * col("ell_lines") <= lit(3L) * col("nl")
    val rAlpha = lit(5L) * col("aw") >= lit(4L) * col("wc")
    val rStop = col("stop_hits") >= 2L
    base.select(passthrough.map(col) ++ Seq(col("doc_id"), col("wc"),
      rWc.as("r_wordcount"), rWl.as("r_wordlen"), rSym.as("r_symbol"),
      rBul.as("r_bullets"), rEll.as("r_ellipsis"), rAlpha.as("r_alpha"),
      rStop.as("r_stopwords"),
      (rWc && rWl && rSym && rBul && rEll && rAlpha && rStop).as("keep_doc")): _*)
  }

  val textGopherRulesSql: String = {
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    s"""SELECT doc_id, wc,
       |  wc >= 50 AND wc <= 100000 AS r_wordcount,
       |  3 * wc <= twl AND twl <= 10 * wc AS r_wordlen,
       |  10 * (hashes + ells) < wc AS r_symbol,
       |  10 * bul <= 9 * nl AS r_bullets,
       |  10 * ell_lines <= 3 * nl AS r_ellipsis,
       |  5 * aw >= 4 * wc AS r_alpha,
       |  stop_hits >= 2 AS r_stopwords,
       |  (wc >= 50 AND wc <= 100000) AND (3 * wc <= twl AND twl <= 10 * wc)
       |    AND (10 * (hashes + ells) < wc) AND (10 * bul <= 9 * nl)
       |    AND (10 * ell_lines <= 3 * nl) AND (5 * aw >= 4 * wc)
       |    AND (stop_hits >= 2) AS keep_doc
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(words) AS BIGINT) AS wc,
       |    CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS BIGINT) AS twl,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hashes,
       |    CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS ells,
       |    CAST(len(lines) AS BIGINT) AS nl,
       |    CAST(len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %')) AS BIGINT) AS bul,
       |    CAST(len(list_filter(lines, l -> l LIKE '%...')) AS BIGINT) AS ell_lines,
       |    CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS aw,
       |    CAST(len(list_filter([${sqlList(gopherStops)}], sw -> list_contains(words, sw))) AS BIGINT) AS stop_hits
       |  FROM (
       |    SELECT doc_id, text,
       |      list_filter(string_split(text, ' '), w -> w <> '') AS words,
       |      string_split(text, chr(10)) AS lines
       |    FROM documents) a) b""".stripMargin
  }

  /** Per-source PII-density report (r9 — the release-gating number a
    * curation pipeline publishes before shipping a corpus slice:
    * which sources leak how much, by type): per source, doc counts,
    * docs carrying ≥1 hit, and per-type totals (email / IP / phone,
    * the [[textRedact]] pattern set — one definition shared with the
    * redaction operator, so the report and the scrubber can never
    * disagree about what counts as PII). Map-side regex extraction +
    * one partial-agg groupBy; all counts integer-exact. */
  def pipelinePiiRate: Q = (s, dir) =>
    piiCounts(t(s, dir, "documents"), Seq("source"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("c_email") + col("c_ip") + col("c_phone") > 0, 1L).otherwise(0L))
          .as("n_docs_with_pii"),
        sum(col("c_email")).as("n_email"),
        sum(col("c_ip")).as("n_ip"),
        sum(col("c_phone")).as("n_phone"))

  /** Per-doc PII hit counts over any frame with a `text` column —
    * split out so specs can anchor each pattern on crafted strings. */
  def piiCounts(docs: org.apache.spark.sql.DataFrame,
      passthrough: Seq[String]): org.apache.spark.sql.DataFrame = {
    val cnts = piiPatterns.map { case (re, repl) =>
      val name = repl.stripPrefix("<").stripSuffix(">").toLowerCase
      size(expr(s"regexp_extract_all(text, '${re.replace("\\", "\\\\")}', 0)"))
        .cast(LongType).as(s"c_$name")
    }
    docs.select(passthrough.map(col) ++ cnts: _*)
  }

  val pipelinePiiRateSql: String = {
    val cnts = piiPatterns.map { case (re, repl) =>
      val name = repl.stripPrefix("<").stripSuffix(">").toLowerCase
      s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS c_$name"
    }.mkString(",\n    ")
    s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN c_email + c_ip + c_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_with_pii,
       |  CAST(SUM(c_email) AS BIGINT) AS n_email,
       |  CAST(SUM(c_ip) AS BIGINT) AS n_ip,
       |  CAST(SUM(c_phone) AS BIGINT) AS n_phone
       |FROM (
       |  SELECT source,
       |    $cnts
       |  FROM documents) sub
       |GROUP BY source""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "pipeline_pii_rate" -> pipelinePiiRate,
    "text_gopher_rules" -> textGopherRules,
    "pipeline_quality_buckets" -> pipelineQualityBuckets,
    "stream_quality_histogram" -> streamQualityHistogram,
    "pipeline_curriculum" -> pipelineCurriculum,
    "text_hash_embedding" -> textHashEmbedding,
    "pipeline_sample_by_quality" -> pipelineSampleByQuality,
    "text_ttr" -> textTtr,
    "pipeline_pack_sequences" -> pipelinePackSequences,
    "pipeline_pack_bins" -> pipelinePackBins,
    "text_repetition" -> textRepetition,
    "text_redact" -> textRedact,
    "text_langid_weighted" -> textLangIdWeighted,
    "text_topterms" -> textTopTerms,
    "text_oov_rate" -> textOovRate,
    "text_commonness" -> textCommonness,
    "pipeline_pack_mask" -> pipelinePackMask,
    "text_char_diversity" -> textCharDiversity,
    "pipeline_sample_stratified" -> pipelineSampleStratified,
    "text_tokencount" -> textTokenCount,
    "text_quality" -> textQuality,
    "text_langid" -> textLangId,
    "text_fingerprint" -> textFingerprint,
    "dedup_exact" -> dedupExact)

  val oracles: Map[String, String] = Map(
    "pipeline_pii_rate" -> pipelinePiiRateSql,
    "text_gopher_rules" -> textGopherRulesSql,
    "pipeline_quality_buckets" -> pipelineQualityBucketsSql,
    "stream_quality_histogram" -> streamQualityHistogramSql,
    "pipeline_curriculum" -> pipelineCurriculumSql,
    "text_hash_embedding" -> textHashEmbeddingSql,
    "pipeline_sample_by_quality" -> pipelineSampleByQualitySql,
    "text_ttr" -> textTtrSql,
    "pipeline_pack_sequences" -> pipelinePackSequencesSql,
    "pipeline_pack_bins" -> pipelinePackBinsSql,
    "text_repetition" -> textRepetitionSql,
    "text_redact" -> textRedactSql,
    "text_langid_weighted" -> textLangIdWeightedSql,
    "text_topterms" -> textTopTermsSql,
    "text_oov_rate" -> textOovRateSql,
    "text_commonness" -> textCommonnessSql,
    "pipeline_pack_mask" -> pipelinePackMaskSql,
    "text_char_diversity" -> textCharDiversitySql,
    "pipeline_sample_stratified" -> pipelineSampleStratifiedSql,
    "text_tokencount" -> textTokenCountSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangIdSql,
    "text_fingerprint" -> textFingerprintSql,
    "dedup_exact" -> dedupExactSql)
}
