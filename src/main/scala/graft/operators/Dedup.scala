package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Near-duplicate detection for the training-data pipeline
  * (SURVEY.md §2C): MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale posture: never O(n²). Candidate pairs come from equi-joins on
  * LSH bucket keys (band hashes / fingerprint bands / rare shingles),
  * so the shuffle is keyed by bucket and the pair count is bounded by
  * per-bucket membership, not by the corpus size. Verification
  * (Jaccard / hamming) runs only on candidates.
  *
  * All hashing is md5-based so the DuckDB oracle can replay the exact
  * same pipeline — even the MinHash signatures are oracle-checked.
  *
  * Cache note: the md5-heavy base DataFrames are `.cache()`d because
  * each feeds several plan branches (self-join sides recompute
  * uncached subtrees). The returned queries are lazy, so the operator
  * cannot unpersist them itself; Spark's storage pool is LRU-evictable
  * under pressure, and CacheManager dedupes repeat invocations by
  * canonicalized plan, so retention is bounded per distinct query.
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  private val H = 8 // minhash functions
  private val BANDS = 4 // bands of 2 rows each

  /** Shingle document-frequency cap. A shingle shared by f documents
    * contributes O(f²) candidate pairs to an inverted-index self-join
    * while carrying no near-dup signal once f is large — at corpus
    * scale a single stop-phrase 4-gram present in 1% of a 100 TB
    * corpus would alone create ~10¹⁴ pairs. Dropping shingles with
    * df > MAX_DF (standard inverted-index pruning) bounds every
    * bucket; the hot-shingle list is tiny, so it broadcasts.
    * Measured at sf0.1: no shingle exceeds df=64 in the synthetic
    * corpus, so results there are identical with or without the cap —
    * it is purely the worst-case bound a real corpus needs.
    */
  private val MAX_DF = 64

  /** (doc_id, sh): distinct word n-gram shingles per document, raw
    * (no df cap — feeds [[cappedShingles]]; [[Contamination]] reuses
    * it for benchmark-overlap shingling). `ws` overrides the token
    * array (r14 — the unicode tokenizer twin passes
    * [[graft.functions.Tokenize.tokens]]). */
  private[operators] def shingles(docs: DataFrame, n: Int,
      ws: Column = split(col("text"), " ")): DataFrame =
    docs
      .withColumn("ws", ws)
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.NgramExpressions.word_ngrams(col("ws"), n))).as("sh"))

  /** [[shingles]] minus shingles with document frequency > [[MAX_DF]].
    * The hot list is computed with a partial-agg groupBy (each map
    * task emits one (sh, cnt) row, so a skewed stop-phrase never
    * concentrates rows in one task) and removed with a broadcast
    * left-anti join — no shuffle of the big side. */
  private[operators] def cappedShingles(docs: DataFrame, n: Int,
      ws: Column = split(col("text"), " ")): DataFrame = {
    val sh = shingles(docs, n, ws).cache() // feeds the hot list + the join
    val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > MAX_DF).select("sh")
    // re-select: USING-joins move the join column first, and callers
    // rename positionally via toDF
    sh.join(broadcast(hot), Seq("sh"), "left_anti").select("doc_id", "sh")
  }

  /** Session-staged df-capped 3-gram shingle table (r16 optimization
    * round — the inverted index every minhash/incremental consumer
    * probes; the same posture as the staged 4-gram `sh4`). The staged
    * index builders (lsh_pairs, mh_sigs, truth_pairs) read it too, so
    * prestage extracts the corpus shingles ONCE instead of once per
    * artifact. */
  Staged.register("sh3")((s, dir) => { shingles3Staged(s, dir); () })
  private[operators] def shingles3Staged(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "sh3", coalesce = false)(
      cappedShingles(t(s, dir, "documents"), 3))

  /** Session-staged df-cap HOT LIST (metadata-sized): the broadcast
    * corpus artifact the streaming incremental twin ships to its
    * map-side df-cap — staged beside [[shingles3Staged]] so the
    * stream key stops re-scanning the raw corpus shingles per call. */
  Staged.register("sh3_hot")((s, dir) => { hotShingles3Staged(s, dir); () })
  private[operators] def hotShingles3Staged(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "sh3_hot") {
      shingles(t(s, dir, "documents"), 3).groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") > MAX_DF).select("sh")
    }

  /** DuckDB twin of [[cappedShingles]]. `wsExpr`/`from` override the
    * token-array expression and source table (r14 — the unicode
    * tokenizer twin shingles `udocs` with the shared regex). */
  private[operators] def shinglesSqlFrom(n: Int, wsExpr: String, from: String): String = {
    val concatExpr = (1 to n).map(j => s"ws[i + ${j - 1}]").mkString(" || ' ' || ")
    s"""SELECT doc_id, sh FROM (
       |  SELECT doc_id, sh, COUNT(*) OVER (PARTITION BY sh) AS df FROM (
       |    SELECT DISTINCT doc_id, sh FROM (
       |      SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - ${n - 1}),
       |        i -> $concatExpr)) AS sh
       |      FROM (SELECT doc_id, $wsExpr AS ws FROM $from)
       |      WHERE len(ws) >= $n)))
       |WHERE df <= $MAX_DF""".stripMargin
  }
  private def shinglesSql(n: Int): String =
    shinglesSqlFrom(n, "string_split(text, ' ')", "documents")

  /** MinHash-LSH candidate pairs over a (cached) shingle base — the
    * shared banding device of [[dedupMinhashLsh]] and [[dedupEval]]:
    * sig_i = min over shingles of the first 16 hex chars of
    * md5("i:" ++ shingle); band hash = md5(sig_2b ++ sig_2b+1). */
  private[operators] def lshCandidates(sh: DataFrame): DataFrame = {
    val sigAggs = (0 until H).map(i =>
      min(substring(md5(concat(lit(s"$i:"), col("sh"))), 1, 16)).as(s"h$i"))
    val sigs = sh.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    val bandCols = (0 until BANDS).map(b =>
      struct(lit(b).as("band"), md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bh")))
    val bands = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("s"))
      .select(col("doc_id"), col("s.band").as("band"), col("s.bh").as("bh"))
      .cache() // both sides of the self-join
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Session-staged verified near-dup pair table (r8): like the IVF
    * quantizers, the LSH pair set is an INDEX-BUILD product — a real
    * pipeline computes it once and then clustering, cross-shard CC,
    * and the keep-list composite all read the same artifact. First
    * call per (session, dir) runs the full shingle → band → verify
    * pipeline and stages the (small) pair table to parquet; every
    * consumer — including the pair query itself — reads that. */
  Staged.register("lsh_pairs")((s, dir) => { minhashPairs(s, dir); () })
  private[operators] def minhashPairs(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "lsh_pairs") {
      // the shingle set feeds 4 plan branches (signatures, both sides
      // of the candidate join via bands, and the Jaccard intersection);
      // r16: the branches read the staged sh3 index (one extraction
      // per session, shared with mh_sigs/truth_pairs) instead of a
      // per-artifact cached re-extraction
      val sh = shingles3Staged(s, dir)
      withJaccard(lshCandidates(sh), sh)
    }

  /** Session-staged full-corpus MinHash SIGNATURE table (r8): the
    * per-doc H-hash signature index a real incremental-dedup system
    * maintains at ingest. Computed once per (session, dir); the
    * incremental batch/stream twins band the staged index instead of
    * re-hashing the whole corpus per query. */
  Staged.register("mh_sigs")((s, dir) => { minhashSigs(s, dir); () })
  private[operators] def minhashSigs(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "mh_sigs", coalesce = false) {
      val sigAggs = (0 until H).map(i =>
        min(substring(md5(concat(lit(s"$i:"), col("sh"))), 1, 16)).as(s"h$i"))
      shingles3Staged(s, dir) // r16: shared staged extraction
        .groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    }

  /** LSH band rows of a signature table (the shared banding device):
    * band hash = md5(sig_2b ++ sig_2b+1). */
  private def bandsOf(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until BANDS).map(b =>
      struct(lit(b).as("band"), md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bh")))
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("s"))
      .select(col("doc_id"), col("s.band").as("band"), col("s.bh").as("bh"))
  }

  def dedupMinhashLsh: Q = (s, dir) => minhashPairs(s, dir)

  /** NEAR-DUP DEGREE HISTOGRAM (r13 — the dedup-monitoring number: how
    * many near-dup partners does a typical document have?): per-doc
    * degree over the staged LSH pair table, rolled into a (degree →
    * n_docs) histogram with the zero-degree mass included (documents in
    * no pair at all — the healthy majority). A fattening high-degree
    * tail is the canary for template storms and crawl loops, and the
    * histogram is what sizes a clustering pass before running it.
    *
    * Scale shape: pair endpoints union + per-doc partial-agg count
    * (pair-table-sized, bounded by banding); the histogram rollup
    * partial-aggregates onto ≤degree-domain keys; zero-degree mass is
    * corpus_count − distinct_paired, computed from two 1-row
    * aggregates — the corpus itself is never joined. */
  def dedupDegreeHist: Q = (s, dir) => {
    val pairs = minhashPairs(s, dir).select("id_a", "id_b")
    val deg = pairs.select(col("id_a").as("doc_id"))
      .unionAll(pairs.select(col("id_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
    val hist = deg.groupBy("degree").agg(count(lit(1)).as("n_docs"))
    val nPaired = deg.agg(count(lit(1)).as("n_paired"))
    val nAll = t(s, dir, "documents").agg(count(lit(1)).as("n_all"))
    hist.unionByName(
      nAll.crossJoin(nPaired)
        .select(lit(0L).as("degree"), (col("n_all") - col("n_paired")).as("n_docs")))
  }

  // lazy: dedupMinhashLshSql initializes later in this object body
  lazy val dedupDegreeHistSql: String =
    s"""WITH pairs AS (
       |$dedupMinhashLshSql
       |),
       |deg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree FROM (
       |    SELECT id_a AS doc_id FROM pairs
       |    UNION ALL SELECT id_b AS doc_id FROM pairs)
       |  GROUP BY doc_id),
       |hist AS (SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs FROM deg GROUP BY degree),
       |zero AS (
       |  SELECT CAST(0 AS BIGINT) AS degree,
       |    (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM deg) AS n_docs)
       |SELECT degree, n_docs FROM hist
       |UNION ALL SELECT degree, CAST(n_docs AS BIGINT) FROM zero""".stripMargin

  /** Attach verified Jaccard over shingle sets to candidate pairs.
    * Intersections are computed candidates-only (cand ⋈ shingles ⋈
    * shingles on equal shingle), never all-pairs. */
  private[operators] def withJaccard(cand: DataFrame, sh: DataFrame): DataFrame = {
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.toDF("id_a", "sh"), "id_a")
      .join(sh.toDF("id_b", "sh"), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(cnt.toDF("id_a", "n_a"), "id_a")
      .join(cnt.toDF("id_b", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"), col("n_inter"),
        (col("n_inter") / (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
  }

  private def jaccardSql(candCte: String, shingleN: Int): String =
    jaccardSqlOver(candCte, s"sh AS (${shinglesSql(shingleN)})")

  /** [[jaccardSql]] over an arbitrary `sh` CTE chain (r14 — the
    * unicode shingle twin prepends its own udocs + sh CTEs). */
  private[operators] def jaccardSqlOver(candCte: String, shCtes: String): String =
    s"""WITH $shCtes,
       |$candCte,
       |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.id_a
       |  JOIN sh sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
       |  GROUP BY c.id_a, c.id_b)
       |SELECT i.id_a, i.id_b, i.n_inter,
       |  i.n_inter / (ca.n_sh + cb.n_sh - i.n_inter) AS jaccard
       |FROM inter i
       |JOIN cnt ca ON ca.doc_id = i.id_a
       |JOIN cnt cb ON cb.doc_id = i.id_b""".stripMargin

  /** The sig/bands/cand CTE chain (expects a `sh` CTE in scope) —
    * shared by [[dedupMinhashLshSql]] and [[dedupEvalSql]]. */
  private[operators] val lshCandCteSql: String = {
    val sigCols = (0 until H)
      .map(i => s"min(substr(md5('$i:' || sh), 1, 16)) AS h$i").mkString(", ")
    val bandSelects = (0 until BANDS)
      .map(b => s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS bh FROM sig")
      .mkString("\n  UNION ALL ")
    s"""sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin
  }

  val dedupMinhashLshSql: String = jaccardSql(lshCandCteSql, 3)

  /** Banding-quality evaluation AS AN OPERATOR (the dedup-tuning
    * twin of sim_recall_eval): ground-truth near-dup pairs are every
    * pair with verified Jaccard ≥ 0.4 over the df-capped inverted
    * index (pairs sharing ≥1 shingle — a KEYED join bounded by the
    * df cap at ≤ MAX_DF ids per bucket, so the ground truth itself is
    * never an all-pairs scan; J = 0 pairs share nothing and cannot be
    * near-dups), and the candidate set is the MinHash band device.
    * One row out: candidate/truth/hit counts with precision (how much
    * verify work the bands waste) and recall (what the bands miss) —
    * the two numbers that decide H and band count at 100 TB. */
  def dedupEval: Q = (s, dir) => {
    val truth = truthPairsStaged(s, dir).cache() // counted + probed
    // r16 optimization: candidates band the SESSION-STAGED signature
    // index (mh_sigs) instead of re-running the full shingle →
    // signature pipeline per invocation — bandsOf(minhashSigs) is the
    // identical construction dedup_incremental already bands, and
    // lshCandidates(sh) is definitionally sigs → bands → self-join
    // over the same df-capped 3-gram shingles mh_sigs staged
    val bands = bandsOf(minhashSigs(s, dir)).cache() // both join sides
    val cand = bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
      .cache() // counted + probed
    val hits = cand.join(truth, Seq("id_a", "id_b"), "left_semi")
    cand.agg(count(lit(1)).as("n_cand"))
      .crossJoin(truth.agg(count(lit(1)).as("n_true")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .select(col("n_cand"), col("n_true"), col("n_hits"),
        round(col("n_hits") / greatest(col("n_cand"), lit(1L)), 6).as("lsh_precision"),
        round(col("n_hits") / greatest(col("n_true"), lit(1L)), 6).as("lsh_recall"))
  }

  val dedupEvalSql: String =
    s"""WITH sh AS (${shinglesSql(3)}),
       |$lshCandCteSql,
       |tc AS (
       |  SELECT DISTINCT sa.doc_id AS id_a, sb.doc_id AS id_b
       |  FROM sh sa JOIN sh sb ON sb.sh = sa.sh AND sa.doc_id < sb.doc_id),
       |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT t.id_a, t.id_b, COUNT(*) AS n_inter
       |  FROM tc t
       |  JOIN sh sa ON sa.doc_id = t.id_a
       |  JOIN sh sb ON sb.doc_id = t.id_b AND sb.sh = sa.sh
       |  GROUP BY t.id_a, t.id_b),
       |truth AS (
       |  SELECT i.id_a, i.id_b FROM inter i
       |  JOIN cnt ca ON ca.doc_id = i.id_a
       |  JOIN cnt cb ON cb.doc_id = i.id_b
       |  WHERE round(i.n_inter / (ca.n_sh + cb.n_sh - i.n_inter), 6) >= 0.4),
       |hits AS (
       |  SELECT c.id_a, c.id_b FROM cand c
       |  JOIN truth t ON t.id_a = c.id_a AND t.id_b = c.id_b)
       |SELECT CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_cand,
       |  CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
       |  CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_hits,
       |  round((SELECT COUNT(*) FROM hits)
       |    / greatest((SELECT COUNT(*) FROM cand), 1), 6) AS lsh_precision,
       |  round((SELECT COUNT(*) FROM hits)
       |    / greatest((SELECT COUNT(*) FROM truth), 1), 6) AS lsh_recall""".stripMargin

  /** Verified ground-truth near-dup pairs (J ≥ 0.4) over a df-capped
    * shingle base, in ONE self-join: because shingle rows are distinct
    * per doc, grouping the keyed self-join by pair counts the
    * intersection directly — the pair set and n_inter fall out of the
    * same aggregation. (The candidate-probe path [[withJaccard]] must
    * join candidates back to shingles because its pairs arrive WITHOUT
    * shingle context; the exhaustive truth has it for free, so
    * materializing truthCand first and re-joining would run the same
    * keyed join twice.) */
  /** Session-staged exhaustive ground truth (r8): the J ≥ 0.4 truth
    * pair set both banding evaluators probe — an evaluation dataset a
    * real pipeline computes once, not per metric refresh. */
  Staged.register("truth_pairs")((s, dir) => { truthPairsStaged(s, dir); () })
  private def truthPairsStaged(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "truth_pairs") {
      truthPairs(shingles3Staged(s, dir)) // r16: shared staged extraction
    }

  private def truthPairs(sh: DataFrame): DataFrame = {
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.toDF("id_a", "sh")
      .join(sh.toDF("id_b", "sh"), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(cnt.toDF("id_a", "n_a"), "id_a")
      .join(cnt.toDF("id_b", "n_b"), "id_b")
      .filter(round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 6) >= 0.4)
      .select("id_a", "id_b")
  }

  /** Sweep width: band counts 1..8 at 2 rows per band → H up to 16. */
  private val SWEEP_MAXB = 8

  /** Banding-parameter SWEEP in one query — the [[dedupEval]] grid
    * form the tuning loop wants at 100 TB: precision/recall for every
    * (H = 2k, bands = k), k = 1..8, with band settings as DATA columns,
    * not code. The device making one pass serve the whole grid: band b
    * of the k-band config hashes the same (h_2b, h_2b+1) signature pair
    * for EVERY k > b, so config k's candidate set is exactly the pairs
    * whose minimum shared band index is < k. One 16-hash signature
    * pass, one 8-band self-join annotated with min(band), one ground
    * truth (computed once, reused by all 8 rows), and the per-config
    * counts fall out of an 8×8 metadata-sized join — the corpus is
    * scanned once, not 8 times. Recall is monotone nondecreasing in k
    * by construction (candidate sets are nested) — pinned in
    * Round5Spec. */
  def dedupEvalSweep: Q = (s, dir) => {
    val sh = shingles3Staged(s, dir) // r16: staged inverted index
    val sigAggs = (0 until 2 * SWEEP_MAXB).map(i =>
      min(substring(md5(concat(lit(s"$i:"), col("sh"))), 1, 16)).as(s"h$i"))
    val sigs = sh.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    val bandCols = (0 until SWEEP_MAXB).map(b =>
      struct(lit(b).as("band"), md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bh")))
    val bands = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("s"))
      .select(col("doc_id"), col("s.band").as("band"), col("s.bh").as("bh"))
      .cache() // both sides of the self-join
    val cand = bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(min(col("a.band")).as("min_band"))
      .cache() // counted per config + probed against truth
    val truth = truthPairsStaged(s, dir)
    val hitBand = cand.join(truth, Seq("id_a", "id_b"), "left_semi")
    // per-min_band histograms first (≤8 rows each), so the config join
    // below is metadata×metadata — the corpus never touches it
    val candByBand = cand.groupBy("min_band").agg(count(lit(1)).as("nc"))
    val hitsByBand = hitBand.groupBy("min_band").agg(count(lit(1)).as("nh"))
    val ks = s.range(1, SWEEP_MAXB + 1).toDF("n_bands")
    val nCand = ks.join(candByBand, col("min_band") < col("n_bands"), "left")
      .groupBy("n_bands").agg(coalesce(sum("nc"), lit(0L)).as("n_cand"))
    val nHits = ks.join(hitsByBand, col("min_band") < col("n_bands"), "left")
      .groupBy("n_bands").agg(coalesce(sum("nh"), lit(0L)).as("n_hits"))
    nCand.join(nHits, Seq("n_bands"))
      .crossJoin(truth.agg(count(lit(1)).as("n_true")))
      .select(
        (col("n_bands") * 2).as("n_hash"),
        col("n_bands"), col("n_cand"), col("n_true"), col("n_hits"),
        round(col("n_hits") / greatest(col("n_cand"), lit(1L)), 6).as("lsh_precision"),
        round(col("n_hits") / greatest(col("n_true"), lit(1L)), 6).as("lsh_recall"))
  }

  val dedupEvalSweepSql: String = {
    val sigCols = (0 until 2 * SWEEP_MAXB)
      .map(i => s"min(substr(md5('$i:' || sh), 1, 16)) AS h$i").mkString(", ")
    val bandSelects = (0 until SWEEP_MAXB)
      .map(b => s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS bh FROM sig")
      .mkString("\n  UNION ALL ")
    s"""WITH sh AS (${shinglesSql(3)}),
       |sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, MIN(a.band) AS min_band
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |tc AS (
       |  SELECT DISTINCT sa.doc_id AS id_a, sb.doc_id AS id_b
       |  FROM sh sa JOIN sh sb ON sb.sh = sa.sh AND sa.doc_id < sb.doc_id),
       |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT t.id_a, t.id_b, COUNT(*) AS n_inter
       |  FROM tc t
       |  JOIN sh sa ON sa.doc_id = t.id_a
       |  JOIN sh sb ON sb.doc_id = t.id_b AND sb.sh = sa.sh
       |  GROUP BY t.id_a, t.id_b),
       |truth AS (
       |  SELECT i.id_a, i.id_b FROM inter i
       |  JOIN cnt ca ON ca.doc_id = i.id_a
       |  JOIN cnt cb ON cb.doc_id = i.id_b
       |  WHERE round(i.n_inter / (ca.n_sh + cb.n_sh - i.n_inter), 6) >= 0.4),
       |hits AS (
       |  SELECT c.min_band FROM cand c
       |  JOIN truth t ON t.id_a = c.id_a AND t.id_b = c.id_b),
       |ks AS (SELECT n_bands FROM generate_series(1, $SWEEP_MAXB) t(n_bands)),
       |cc AS (
       |  SELECT k.n_bands, CAST(COUNT(c.min_band) AS BIGINT) AS n_cand
       |  FROM ks k LEFT JOIN cand c ON c.min_band < k.n_bands GROUP BY 1),
       |hc AS (
       |  SELECT k.n_bands, CAST(COUNT(h.min_band) AS BIGINT) AS n_hits
       |  FROM ks k LEFT JOIN hits h ON h.min_band < k.n_bands GROUP BY 1)
       |SELECT CAST(cc.n_bands * 2 AS BIGINT) AS n_hash,
       |  CAST(cc.n_bands AS BIGINT) AS n_bands, cc.n_cand,
       |  CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true, hc.n_hits,
       |  round(hc.n_hits / greatest(cc.n_cand, 1), 6) AS lsh_precision,
       |  round(hc.n_hits
       |    / greatest((SELECT COUNT(*) FROM truth), 1), 6) AS lsh_recall
       |FROM cc JOIN hc ON hc.n_bands = cc.n_bands""".stripMargin
  }

  /** Exact Jaccard straight from inverted-index OVERLAP MULTIPLICITY
    * (r11 — the r10 10× hotspot closed): the df-capped self-join
    * already emits exactly one row per (pair, shared shingle), so
    * n_inter is ONE partial-agg count over the join output — never
    * the old distinct-then-re-join plan whose verification fanned
    * every candidate pair back out against both docs' full shingle
    * lists (pairs × |doc| rows; ~600M at the 10× bench, 26-34 s).
    * Join volume is ≤ MAX_DF · |sh| rows by the df cap — LINEAR in
    * corpus size regardless of duplication skew; only the OUTPUT
    * pair count reflects the data's true near-dup mass. Same values
    * as the re-join form (both count |A∩B| over distinct capped
    * shingles), so the oracle is unchanged. */
  private[operators] def ngramPairs(sh: DataFrame): DataFrame = {
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.toDF("id_a", "sh").join(sh.toDF("id_b", "sh"), "sh")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(cnt.toDF("id_a", "n_a"), "id_a")
      .join(cnt.toDF("id_b", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"), col("n_inter"),
        (col("n_inter") / (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
  }

  /** Word-4-gram Jaccard: candidates = pairs sharing at least one
    * df-capped 4-gram (inverted-index self-join on the shingle; the
    * df cap bounds every join bucket to <= MAX_DF members, so the
    * worst case is corpus_size·MAX_DF pairs, never O(n²)). */
  /** Session-staged df-capped 4-gram shingle table — the INVERTED
    * INDEX the ngram/containment family probes (r16 optimization
    * round, the `mh_sigs` posture: a dedup system extracts its
    * shingle index once at ingest; pre-r16 each of the three
    * consumer keys re-ran tokenize → shingle → df-cap per
    * invocation). Parquet roundtrips (long, string) exactly. */
  Staged.register("sh4")((s, dir) => { shingles4Staged(s, dir); () })
  private[operators] def shingles4Staged(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "sh4", coalesce = false)(
      cappedShingles(t(s, dir, "documents"), 4))

  def dedupNgramJaccard: Q = (s, dir) => {
    val sh = shingles4Staged(s, dir)
    ngramPairs(sh)
  }

  val dedupNgramJaccardSql: String = {
    val candCte =
      """cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id)""".stripMargin
    jaccardSql(candCte, 4)
  }

  /** Per-doc output bound for [[dedupNgramTopm]]: each document keeps
    * its TOPM_M best-Jaccard neighbors. */
  private[operators] val TOPM_M = 8

  /** OUTPUT-BOUNDED n-gram Jaccard (r10 — the variant a
    * duplicate-heavy real corpus must run): [[dedupNgramJaccard]]'s
    * output is one row per verified near-dup PAIR, and on a corpus
    * with heavy template duplication the true pair set grows
    * QUADRATICALLY in the per-template clone count (measured at 10×:
    * 38,937 → 4,122,480 result rows — the r9 bench's worst scale
    * ratio was this operator reporting 106× more duplicates because
    * there WERE 106× more). A dedup pipeline doesn't need the full
    * clique: it needs, per document, a bounded list of its best
    * near-duplicates to pick a canonical survivor. This variant keeps
    * each doc's top-[[TOPM_M]] neighbors by (jaccard DESC, nbr_id
    * ASC) via the bounded [[graft.functions.TopK]] partial aggregator
    * — each map task emits ≤ m rows per doc to the shuffle and the
    * OUTPUT is ≤ m·corpus rows regardless of duplication skew, while
    * candidate generation keeps the same df-capped inverted-index
    * bound as the exhaustive key. The exhaustive key stays registered
    * for oracle parity; this is the 100 TB route. */
  /** Shared top-m tail: symmetrize verified pairs so EVERY doc owns
    * its neighbor list (canonical id_a < id_b pairs split a doc's
    * partners across both sides), then the bounded TopK partial
    * aggregate — ≤ m rows per doc per map task to the shuffle. */
  private[operators] def topmNeighbors(pairs: DataFrame): DataFrame = {
    val sym = pairs.select(col("id_a").as("doc_id"), col("id_b").as("nbr_id"),
        col("n_inter"), col("jaccard"))
      .unionAll(pairs.select(col("id_b").as("doc_id"), col("id_a").as("nbr_id"),
        col("n_inter"), col("jaccard")))
    val top = graft.functions.TopK.topk(TOPM_M)
    sym.groupBy("doc_id")
      .agg(top(round(col("jaccard"), 9), col("nbr_id"),
        col("n_inter").cast(DoubleType)).as("nbrs"))
      .select(col("doc_id"), posexplode(col("nbrs")))
      .select(col("doc_id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col._2").as("nbr_id"), col("col._3").cast(LongType).as("n_inter"),
        col("col._1").as("jaccard"))
  }

  /** SQL twin of [[topmNeighbors]] over any pairs CTE body. */
  private[operators] def topmSqlOver(pairsSql: String): String =
    s"""WITH pairs AS (${pairsSql.replace("\n", "\n  ")}),
       |sym AS (
       |  SELECT id_a AS doc_id, id_b AS nbr_id, n_inter, jaccard FROM pairs
       |  UNION ALL
       |  SELECT id_b AS doc_id, id_a AS nbr_id, n_inter, jaccard FROM pairs),
       |ranked AS (
       |  SELECT doc_id, nbr_id, n_inter, round(jaccard, 9) AS jaccard,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY round(jaccard, 9) DESC, nbr_id) AS rank
       |  FROM sym)
       |SELECT doc_id, rank, nbr_id, n_inter, jaccard
       |FROM ranked WHERE rank <= $TOPM_M""".stripMargin

  def dedupNgramTopm: Q = (s, dir) => {
    val sh = shingles4Staged(s, dir) // r16: staged inverted index
    topmNeighbors(ngramPairs(sh))
  }

  val dedupNgramTopmSql: String = {
    val candCte =
      """cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id)""".stripMargin
    topmSqlOver(jaccardSql(candCte, 4))
  }

  /** BOUNDED NEIGHBOR LISTS AT THE LSH ROUTE (r11 — the composition a
    * 100 TB dedup actually runs: MinHash banding generates the
    * candidate pairs (bucket-bounded, recall tuned by H × bands),
    * exact Jaccard verifies them, and each doc keeps its top-m — so
    * BOTH the candidate work (banding) and the output (TopK) are
    * bounded, where `dedup_ngram_topm` bounds output over exhaustive
    * inverted-index candidates. Same oracle chain as
    * `dedup_minhash_lsh` with the shared top-m tail.
    *
    * Consumes [[minhashPairs]] — the SAME session-staged index-build
    * artifact every other LSH consumer (clustering, cross-shard CC,
    * keep-list) reads — instead of re-running shingle → band → verify
    * inline per invocation (the r11 bench's heaviest absolute 10×
    * entry, 39.3 s, was exactly that re-run; the identical pair
    * values come off the staged table). */
  def dedupMinhashTopm: Q = (s, dir) =>
    topmNeighbors(minhashPairs(s, dir))

  val dedupMinhashTopmSql: String = topmSqlOver(jaccardSql(lshCandCteSql, 3))

  /** Directional CONTAINMENT dedup (Broder 1997's containment measure
    * — the asymmetric twin of [[dedupNgramJaccard]]): c(A→B) =
    * |A∩B| / |A| over 4-gram shingle sets. Jaccard is blind to
    * sub-document duplication — a short doc wholly quoted inside a
    * long one scores |A|/|B| ≈ 0 Jaccard but containment 1.0 — and
    * real corpora are full of it (quote pages, boilerplate wrappers,
    * excerpt farms). Candidates and intersection counts come from ONE
    * inverted-index equi-join + partial-agg groupBy (bounded by the
    * [[MAX_DF]] cap like every candidate generator here), per-doc set
    * sizes broadcast back, and a pair is flagged when EITHER direction
    * reaches 0.5. `jaccard_blind` marks the pairs symmetric Jaccard
    * (< 0.5) would have missed — the operator's reason to exist. */
  /** The containment math over a (cached) df-capped shingle base —
    * shared by the ASCII key and the unicode twin (r16, r15 verdict
    * #1: same `ws=` hook discipline as the fingerprint family). */
  private[operators] def containmentOf(sh: DataFrame): DataFrame = {
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.toDF("id_a", "sh").join(sh.toDF("id_b", "sh"), "sh")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(cnt.toDF("id_a", "n_a")), "id_a")
      .join(broadcast(cnt.toDF("id_b", "n_b")), "id_b")
      .withColumn("cont_ab", col("n_inter") / col("n_a"))
      .withColumn("cont_ba", col("n_inter") / col("n_b"))
      .withColumn("jac", col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(greatest(col("cont_ab"), col("cont_ba")) >= 0.5)
      .select(col("id_a"), col("id_b"), col("n_inter"),
        round(col("cont_ab"), 6).as("cont_ab"),
        round(col("cont_ba"), 6).as("cont_ba"),
        round(col("jac"), 6).as("jaccard"),
        (col("jac") < 0.5).as("jaccard_blind"))
  }

  def dedupContainment: Q = (s, dir) =>
    containmentOf(shingles4Staged(s, dir)) // r16: staged inverted index

  /** [[dedupContainmentSql]] over an arbitrary `sh` CTE chain (r16 —
    * the unicode twin prepends its udocs + unicode-shingle CTEs). */
  private[operators] def dedupContainmentSqlOver(shCtes: String): String =
    s"""WITH $shCtes,
       |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
       |  FROM sh a JOIN sh b ON b.sh = a.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT i.id_a, i.id_b, i.n_inter,
       |  round(i.n_inter / ca.n_sh, 6) AS cont_ab,
       |  round(i.n_inter / cb.n_sh, 6) AS cont_ba,
       |  round(i.n_inter / (ca.n_sh + cb.n_sh - i.n_inter), 6) AS jaccard,
       |  (i.n_inter / (ca.n_sh + cb.n_sh - i.n_inter)) < 0.5 AS jaccard_blind
       |FROM inter i
       |JOIN cnt ca ON ca.doc_id = i.id_a
       |JOIN cnt cb ON cb.doc_id = i.id_b
       |WHERE greatest(i.n_inter / ca.n_sh, i.n_inter / cb.n_sh) >= 0.5""".stripMargin

  val dedupContainmentSql: String =
    dedupContainmentSqlOver(s"sh AS (${shinglesSql(4)})")

  private val SIMHASH_DIMS = 64
  private val SIMHASH_BANDS = 4
  private val BAND_MASK = 65535L // 16-bit bands

  /** 64-dim SimHash from md5 hex digits: each word hashes to 64 hex
    * chars (md5(w) ++ md5("x:" ++ w)); dimension d votes +1 when hex
    * digit d is >= '8', else -1; bit d of the fingerprint is set when
    * the vote sum is positive. Near-dup candidates share one of four
    * 16-bit fingerprint bands — 65,536 buckets per band, so candidate
    * pairs grow O(n²/65536) per band instead of the O(n²/256) an
    * 8-bit banding gives (measured at sf0.1: 15.0M banded pairs under
    * the round-1 scheme → 555k under this one, 27×; the survivors are
    * dominated by genuine near-dup clusters, which no banding can
    * shrink). Pairs are kept when hamming distance <= 3. */
  /** The per-doc 64-bit SimHash fingerprint plan over an arbitrary
    * (doc_id, text) source and token array (r15 — the unicode twin
    * passes [[graft.functions.Tokenize.tokens]]; every shape
    * downstream of the word array is shared). */
  private[operators] def simhashFps(docs: DataFrame,
      ws: Column = split(col("text"), " ")): DataFrame =
    // r17 (guide §4): one-pass codegen kernel replacing the 64
    // interpreted per-dimension filter passes over a per-word hash
    // array (bit-equivalence with that chain pinned in VectorExprSpec)
    docs
      .withColumn("ws", ws)
      .select(col("doc_id"),
        graft.functions.NgramExpressions.simhash64(col("ws")).as("fp"))

  /** Banded hamming-≤3 pair selection over a fingerprint table —
    * shared by the ASCII key and the unicode twin. */
  private[operators] def simhashPairsOf(fps: DataFrame): DataFrame = {
    val bandCols = (0 until SIMHASH_BANDS).map(b =>
      struct(lit(b).as("band"), (shiftright(col("fp"), 16 * b).bitwiseAND(lit(BAND_MASK))).as("bv")))
    val bands = fps
      .select(col("doc_id"), col("fp"), explode(array(bandCols: _*)).as("s"))
      .select(col("doc_id"), col("fp"), col("s.band").as("band"), col("s.bv").as("bv"))
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast(LongType))
      .filter(col("hamming") <= 3) // prune before the distinct shuffle:
      .distinct() // band buckets can be dense, hamming survivors are few
  }

  def dedupSimhash: Q = (s, dir) => {
    // the 64-bit fingerprint table is an index-build artifact (one
    // giant 64-dimension codegen plan — THE cold-JIT heavy of every
    // bench session): staged once per (session, dir), banded cheaply
    // thereafter
    val fps = Staged.table(s, dir, "simhash_fps", coalesce = false)(
      simhashFps(t(s, dir, "documents")))
    simhashPairsOf(fps)
  }

  /** The SimHash pair SQL over an arbitrary docs relation and token
    * expression (r15 — the unicode twin scores `udocs` with the shared
    * regex; the 64-dimension chain is rendered once here). */
  private[operators] def dedupSimhashSqlFrom(wsExpr: String, from: String,
      withPrefix: String): String = {
    val cnts = (0 until SIMHASH_DIMS).map(d =>
      s"CAST(len(list_filter(hs, h -> substr(h, ${d + 1}, 1) >= '8')) AS BIGINT) AS cnt$d")
      .mkString(",\n    ")
    val fpExpr = (0 until SIMHASH_DIMS).map(d =>
      s"(CASE WHEN cnt$d * 2 > n THEN CAST(${1L << d} AS BIGINT) ELSE 0 END)").mkString(" | ")
    val bandSelects = (0 until SIMHASH_BANDS)
      .map(b => s"SELECT doc_id, fp, $b AS band, (fp >> ${16 * b}) & $BAND_MASK AS bv FROM fps")
      .mkString("\n  UNION ALL ")
    s"""WITH ${withPrefix}base AS (
       |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
       |    $cnts
       |  FROM (SELECT doc_id, ws, list_transform(ws, w -> md5(w) || md5('x:' || w)) AS hs
       |        FROM (SELECT doc_id, $wsExpr AS ws FROM $from))),
       |fps AS (SELECT doc_id, $fpExpr AS fp FROM base),
       |bands AS (
       |  $bandSelects)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.fp AS fp_a, b.fp AS fp_b,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin
  }

  val dedupSimhashSql: String =
    dedupSimhashSqlFrom("string_split(text, ' ')", "documents", "")

  /** Content-defined chunking dedup (the rsync/LBFS device, md5-gear):
    * a position p starts a new chunk when md5 of the 8-char window at p
    * begins with hex '0' — boundaries move WITH the content (~1/16
    * rate, mean chunk ≈16 chars), so an insertion early in a document
    * shifts chunk offsets without changing the chunks after it; exact
    * dedup on chunk hashes then catches shared SUBSTRINGS that
    * doc-level fingerprints miss. Reports every chunk repeated across
    * the corpus with its occurrence/document counts and repeated mass.
    *
    * Scale shape: boundary detection and chunk hashing are pure
    * map-side array work per document; the only shuffle groups by
    * ch_hash — uniform md5 keys, skew-free, partial-agg'd. (Real CDC
    * uses a rolling gear hash for O(1) per position instead of md5's
    * O(w); md5 keeps the operator oracle-replayable, the shapes are
    * identical.) */
  /** The CDC chunk-repeat ledger over an arbitrary (doc_id, text)
    * relation (r16 — the unicode twin runs the fixture-unioned corpus;
    * chunking itself is CHARACTER-level and tokenizer-free, so the
    * twin's job is proving codepoint-indexing parity on CJK / RTL /
    * astral content, not swapping a tokenizer). Both engines index
    * substrings by Unicode CODEPOINT (Spark's UTF8String and DuckDB's
    * substr both count one astral emoji as one character) and md5 the
    * UTF-8 bytes, so boundaries and chunk hashes agree byte-for-byte
    * on non-ASCII text. */
  private[graft] def cdcOf(docs: DataFrame): DataFrame = {
    docs
      .filter(length(col("text")) >= 2)
      // one-pass native boundary scan (reused digest, no hex
      // rendering) — bit-identical to the SQL filter/sequence
      // formulation the oracle replays; see CdcExpressions
      .withColumn("bnds", graft.functions.CdcExpressions.cdc_bounds(col("text")))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(bnds) - 1), i -> named_struct(
          |  'h', md5(substring(text, element_at(bnds, i),
          |           element_at(bnds, i + 1) - element_at(bnds, i))),
          |  'len', element_at(bnds, i + 1) - element_at(bnds, i)))""".stripMargin)).as("c"))
      .groupBy(col("c.h").as("ch_hash"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("c.len")).as("dup_chars"))
      .filter(col("n_occ") > 1)
  }

  def dedupCdc: Q = (s, dir) => cdcOf(t(s, dir, "documents"))

  /** [[dedupCdcSql]] over an arbitrary docs relation (r16 — the
    * unicode twin scores `udocs` with a fixture-CTE prefix). */
  private[operators] def dedupCdcSqlFrom(from: String, withPrefix: String): String =
    s"""WITH ${withPrefix}base AS (
      |  SELECT doc_id, text, length(text) AS n FROM $from WHERE length(text) >= 2),
      |b AS (
      |  SELECT doc_id, text,
      |    list_concat(list_concat([1],
      |      list_filter(generate_series(2, n),
      |        p -> substr(md5(substr(text, p, 8)), 1, 1) = '0')),
      |      [n + 1]) AS bnds
      |  FROM base),
      |ch AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(bnds) - 1),
      |    i -> struct_pack(h := md5(substr(text, bnds[i], bnds[i + 1] - bnds[i])),
      |                     len := bnds[i + 1] - bnds[i]))) AS c
      |  FROM b)
      |SELECT c.h AS ch_hash, COUNT(*) AS n_occ,
      |  COUNT(DISTINCT doc_id) AS n_docs,
      |  CAST(SUM(c.len) AS BIGINT) AS dup_chars
      |FROM ch GROUP BY c.h HAVING COUNT(*) > 1""".stripMargin

  val dedupCdcSql: String = dedupCdcSqlFrom("documents", "")

  /** Incremental (index-vs-batch) near-dup detection — the ingest
    * scenario: an ARRIVING shard (sources src0/src1) is checked
    * against the EXISTING corpus without re-pairing the existing
    * corpus with itself. Same MinHash signatures and banding as
    * [[dedupMinhashLsh]], but the band join is ONE-DIRECTIONAL
    * (new × existing) — at 100 TB the existing side's band index is
    * precomputed and the per-batch cost is |batch| band lookups, not
    * a corpus self-join. Each new doc reports its best verified match
    * (max Jaccard, min existing id on ties) via a lexicographic
    * struct-max — a partial aggregate, not a window. */
  def dedupIncremental: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val sh = shingles3Staged(s, dir) // r16: staged inverted index
    // band the session-staged signature INDEX (what the incremental
    // system maintains at ingest) instead of re-hashing the corpus
    val bands = bandsOf(minhashSigs(s, dir))
      .cache() // split into the new and existing sides below
    val newIds = docs.filter(col("source").isin("src0", "src1")).select("doc_id")
    val bandsNew = bands.join(broadcast(newIds), Seq("doc_id"), "left_semi")
    val bandsOld = bands.join(broadcast(newIds), Seq("doc_id"), "left_anti")
    val cand = bandsNew.alias("a")
      .join(bandsOld.alias("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    withJaccard(cand, sh)
      .groupBy(col("id_a").as("new_id"))
      .agg(max(struct(col("jaccard"), (-col("id_b")).as("nb"),
        col("id_b"), col("n_inter"))).as("m"))
      .select(col("new_id"), col("m.id_b").as("match_id"),
        col("m.n_inter").as("n_inter"), col("m.jaccard").as("jaccard"))
  }

  val dedupIncrementalSql: String = {
    val sigCols = (0 until H)
      .map(i => s"min(substr(md5('$i:' || sh), 1, 16)) AS h$i").mkString(", ")
    val bandSelects = (0 until BANDS)
      .map(b => s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS bh FROM sig")
      .mkString("\n  UNION ALL ")
    val candCte =
      s"""sig AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
         |bands AS (
         |  $bandSelects),
         |newids AS (SELECT doc_id FROM documents WHERE source IN ('src0', 'src1')),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
         |  WHERE a.doc_id IN (SELECT doc_id FROM newids)
         |    AND b.doc_id NOT IN (SELECT doc_id FROM newids))""".stripMargin
    s"""WITH pairs AS (
       |${jaccardSql(candCte, 3)}
       |)
       |SELECT id_a AS new_id, id_b AS match_id, n_inter, jaccard
       |FROM (
       |  SELECT p.*, row_number() OVER (PARTITION BY id_a ORDER BY jaccard DESC, id_b) AS rn
       |  FROM pairs p) q
       |WHERE rn = 1""".stripMargin
  }

  /** Streaming twin of [[dedupIncremental]] (r6) — MinHash signature
    * maintenance AT INGEST: the arriving shard is a file stream,
    * shingling + the df-cap are map-side ON the stream (the hot-list
    * is corpus metadata shipped as a broadcast artifact, exactly like
    * stream_contamination's benchmark shingle set), and the per-doc
    * signature index is a complete-mode aggregation whose state is
    * ONE row per arriving doc — bounded by shard size, not corpus
    * size. Banding + the one-directional join against the existing
    * corpus's band index + Jaccard verification run batch-side on the
    * drained signatures (the stream_topterms convention: streaming
    * maintains the state, the bounded tail math replays per refresh).
    * Output and oracle identical to the batch form, so the gate
    * proves the incrementally-built signatures match the batch-built
    * ones byte for byte. */
  def streamDedupIncremental: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val sh = shingles3Staged(s, dir) // r16: staged inverted index
    val hotList = hotShingles3Staged(s, dir) // r16: staged corpus artifact
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    val sigAggs = (0 until H).map(i =>
      min(substring(md5(concat(lit(s"$i:"), col("sh"))), 1, 16)).as(s"h$i"))
    graft.streaming.StreamStage.withStaged(s, "sdi", dir, "documents.parquet") { stageDir =>
      val arriving = s.readStream.schema(sch).parquet(stageDir)
        .filter(col("source").isin("src0", "src1"))
      val shStream = shingles(arriving, 3)
        .join(broadcast(hotList), Seq("sh"), "left_anti")
      val sigs = shStream.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
      graft.streaming.StreamStage.drain(s, "sdi")(sigs.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_sdi"))
    }
    val bandsNew = bandsOf(s.table("graft_stream_sdi"))
    val newIds = docs.filter(col("source").isin("src0", "src1")).select("doc_id")
    // the existing side is the session-staged signature index — the
    // stream maintains arriving signatures; the corpus index is a
    // precomputed artifact, exactly as it would be at 100 TB
    val bandsOld = bandsOf(
      minhashSigs(s, dir).join(broadcast(newIds), Seq("doc_id"), "left_anti"))
    val cand = bandsNew.alias("a")
      .join(bandsOld.alias("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    withJaccard(cand, sh)
      .groupBy(col("id_a").as("new_id"))
      .agg(max(struct(col("jaccard"), (-col("id_b")).as("nb"),
        col("id_b"), col("n_inter"))).as("m"))
      .select(col("new_id"), col("m.id_b").as("match_id"),
        col("m.n_inter").as("n_inter"), col("m.jaccard").as("jaccard"))
  }

  /** Sparse-FEATURE near-dup mining (r6) — the inverted-index device
    * over hashed BIGRAM features, the multiset complement of shingle
    * MinHash: docs are 65,536-bucket hashed count vectors (md5 4-hex
    * buckets of word bigrams — unigrams are useless on this corpus's
    * ≈30-word shared vocabulary, and at real scale unigram buckets
    * are exactly the hot keys the df cap deletes anyway), candidates
    * are pairs sharing ≥ MIN_SHARED rare buckets (df ≤ 64 cap, the
    * same inverted-index pruning as the shingle family; measured at
    * sf0.01: 80k pairs at ≥2 shared → 55 at ≥16, with 24 of the 25
    * true ≥0.4 pairs surviving — the knob trades recall for verify
    * cost), verified by EXACT weighted Jaccard over the full count
    * vectors: Σmin / Σmax with Σmax = tot_a + tot_b − Σmin, so only
    * SHARED buckets ever join (per-doc totals ride along broadcast)
    * and everything is BIGINT until the one final division. */
  /** Session-staged hashed-BIGRAM count vectors — the 65,536-bucket
    * feature index [[dedupSparseFeatures]] probes (r16 optimization
    * round, the `pdb_feats`/`mh_sigs` posture: extracted once at
    * ingest, not per query). Parquet roundtrips (long, string, long)
    * exactly. */
  Staged.register("sparse_feats")((s, dir) => { sparseFeatsStaged(s, dir); () })
  private def sparseFeatsStaged(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "sparse_feats", coalesce = false) {
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.NgramExpressions.lower_tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"),
          explode(graft.functions.NgramExpressions.word_ngrams(col("ws"), 2)).as("g"))
        .withColumn("bucket", substring(md5(col("g")), 1, 4))
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
    }

  def dedupSparseFeatures: Q = (s, dir) => {
    val MAXDF = 64
    val MIN_SHARED = 16
    val TH = 0.4
    val feats = sparseFeatsStaged(s, dir) // r16: staged feature index
    val totals = feats.groupBy("doc_id").agg(sum(col("cnt")).as("tot"))
    val hot = feats.groupBy("bucket").agg(count(lit(1)).as("bdf"))
      .filter(col("bdf") > MAXDF).select("bucket")
    val rare = feats.join(broadcast(hot), Seq("bucket"), "left_anti")
      .select("doc_id", "bucket")
    val cand = rare.alias("a")
      .join(rare.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared_rare"))
      .filter(col("n_shared_rare") >= MIN_SHARED)
    val shared = cand
      .join(feats.alias("fa"), col("fa.doc_id") === col("id_a"))
      .join(feats.alias("fb"),
        col("fb.doc_id") === col("id_b") && col("fb.bucket") === col("fa.bucket"))
      .groupBy(col("id_a"), col("id_b"), col("n_shared_rare"))
      .agg(sum(least(col("fa.cnt"), col("fb.cnt"))).as("smin"))
    shared
      .join(broadcast(totals.select(col("doc_id").as("id_a"), col("tot").as("tot_a"))), "id_a")
      .join(broadcast(totals.select(col("doc_id").as("id_b"), col("tot").as("tot_b"))), "id_b")
      .withColumn("sim",
        col("smin").cast(org.apache.spark.sql.types.DoubleType)
          / (col("tot_a") + col("tot_b") - col("smin")))
      .filter(col("sim") >= TH)
      .select("id_a", "id_b", "n_shared_rare", "smin", "sim")
  }

  val dedupSparseFeaturesSql: String =
    """WITH base AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w != '') AS ws
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
      |        FROM base WHERE len(ws) >= 2)),
      |feats AS (
      |  SELECT doc_id, substr(md5(g), 1, 4) AS bucket, COUNT(*) AS cnt
      |  FROM bi GROUP BY doc_id, substr(md5(g), 1, 4)),
      |tot AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS tot FROM feats GROUP BY doc_id),
      |hot AS (SELECT bucket FROM (
      |  SELECT bucket, COUNT(*) AS bdf FROM feats GROUP BY bucket) h WHERE bdf > 64),
      |rare AS (SELECT doc_id, bucket FROM feats
      |  WHERE bucket NOT IN (SELECT bucket FROM hot)),
      |cand AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared_rare
      |  FROM rare a JOIN rare b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= 16),
      |sh AS (
      |  SELECT c.id_a, c.id_b, c.n_shared_rare,
      |    CAST(SUM(LEAST(fa.cnt, fb.cnt)) AS BIGINT) AS smin
      |  FROM cand c
      |  JOIN feats fa ON fa.doc_id = c.id_a
      |  JOIN feats fb ON fb.doc_id = c.id_b AND fb.bucket = fa.bucket
      |  GROUP BY c.id_a, c.id_b, c.n_shared_rare)
      |SELECT sh.id_a, sh.id_b, sh.n_shared_rare, sh.smin,
      |  CAST(sh.smin AS DOUBLE) / (ta.tot + tb.tot - sh.smin) AS sim
      |FROM sh
      |JOIN tot ta ON ta.doc_id = sh.id_a
      |JOIN tot tb ON tb.doc_id = sh.id_b
      |WHERE CAST(sh.smin AS DOUBLE) / (ta.tot + tb.tot - sh.smin) >= 0.4""".stripMargin

  /** Deterministic train/val/test split WITH a near-dup LEAKAGE audit
    * (r6) — the ablation-hygiene op every training-data release needs:
    * the split is an md5-threshold bucket (RNG-free, partitioning-
    * independent, ~90/5/5 via hex-prefix thresholds 0xe6/0xf3), and
    * the audit counts verified near-dup pairs (the MinHash-LSH
    * J ≥ 0.4 pairs — the same machinery the dedup family gates) that
    * STRADDLE split boundaries: a straddling pair is eval
    * contamination that survives document-level splitting, exactly
    * what SemDeDup/benchmark-decontamination papers warn about. One
    * row: per-split sizes, total verified pairs, leaking pairs. */
  def pipelineSplitLeakage: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val bucket = substring(md5(concat(lit("graft-split:"),
      col("doc_id").cast(org.apache.spark.sql.types.StringType))), 1, 2)
    val sp = docs.select(col("doc_id"),
      when(bucket < "e6", "train").when(bucket < "f3", "val")
        .otherwise("test").as("split"))
    val pairs = minhashPairs(s, dir)
      .filter(round(col("jaccard"), 6) >= 0.4)
    val leak = pairs
      .join(sp.toDF("id_a", "split_a"), "id_a")
      .join(sp.toDF("id_b", "split_b"), "id_b")
      .agg(count(lit(1)).as("n_dup_pairs"),
        sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L))
          .as("n_leak_pairs"))
    sp.agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      .crossJoin(broadcast(leak))
  }

  val pipelineSplitLeakageSql: String = {
    val candCte = lshCandCteSql
    s"""WITH pairs AS (
       |${jaccardSql(candCte, 3)}
       |),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN substr(md5('graft-split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
       |         WHEN substr(md5('graft-split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |leak AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
       |    CAST(SUM(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS BIGINT) AS n_leak_pairs
       |  FROM pairs p
       |  JOIN sp sa ON sa.doc_id = p.id_a
       |  JOIN sp sb ON sb.doc_id = p.id_b
       |  WHERE round(p.jaccard, 6) >= 0.4),
       |cnt AS (
       |  SELECT CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |    CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
       |    CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
       |  FROM sp)
       |SELECT cnt.n_train, cnt.n_val, cnt.n_test, leak.n_dup_pairs, leak.n_leak_pairs
       |FROM cnt CROSS JOIN leak""".stripMargin
  }

  /** EXACT-SUBSTRING SPAN DEDUP (the Lee et al. 2021 "Deduplicating
    * Training Data Makes Language Models Better" shape, scalably
    * approximated with fixed-width windows the way production
    * pipelines run it): every [[SPAN_W]]-word rolling window hashes,
    * windows whose hash occurs MORE THAN ONCE in the corpus (across
    * or within documents) are duplicated text, and each document's
    * marked positions merge into MAXIMAL duplicated spans
    * (gaps-and-islands: a new span starts when coverage breaks).
    * Output per doc: span count, duplicated word mass, and an exact
    * ppm fraction — the numbers a span-removal or doc-drop policy
    * consumes downstream.
    *
    * Scale shape: window extraction is MAP-SIDE (transform over each
    * doc's own words), the repeat test is one partial-agg count on
    * the window hash, the join back is hash-on-digest, and the
    * islands window is PARTITIONED BY doc_id (parallelism = corpus
    * size, never a global sort) — everything linear in token count. */
  private[operators] val SPAN_W = 8

  /** The span machinery over an arbitrary (doc_id, ws) token-array
    * relation (r16 — the unicode twin passes
    * [[graft.functions.Tokenize.tokens]] arrays over the
    * fixture-unioned corpus; window hashing, the repeat test, and the
    * gaps-and-islands merge are shared VERBATIM, so the two modes
    * cannot drift). */
  private[operators] def substringSpansOf(words: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = words.filter(size(col("ws")) >= SPAN_W)
      .select(col("doc_id"), posexplode(graft.functions.NgramExpressions.array_md5(
        graft.functions.NgramExpressions.word_ngrams(col("ws"), SPAN_W)))
        .as(Seq("p", "h")))
      .select(col("doc_id"), (col("p") + 1).cast(LongType).as("pos"), col("h"))
    val dup = win.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("h")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val spans = win.join(dup, "h")
      .select("doc_id", "pos")
      .withColumn("brk",
        when(col("pos") > lag("pos", 1).over(byDoc) + SPAN_W, 1L).otherwise(0L))
      .withColumn("g", sum("brk").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "g")
      .agg((max("pos") - min("pos") + SPAN_W).as("span_words"))
    val perDoc = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum("span_words").as("dup_words"))
    words.select(col("doc_id"), size(col("ws")).cast(LongType).as("n_words"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_words"), lit(0L)).as("dup_words"),
        expr("(1000000 * coalesce(dup_words, 0)) div greatest(n_words, 1)").as("dup_ppm"))
  }

  def dedupSubstringSpans: Q = (s, dir) => substringSpansOf(
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.NgramExpressions.lower_tokens(col("text")).as("ws")))

  /** [[dedupSubstringSpansSql]] over an arbitrary token expression and
    * docs relation (r16 — the unicode twin splices the shared regex
    * over `udocs`). */
  private[operators] def dedupSubstringSpansSqlFrom(wsExpr: String,
      from: String, withPrefix: String): String = {
    val cat = (0 until SPAN_W).map(j => s"ws[i + $j]").mkString(" || ' ' || ")
    s"""WITH ${withPrefix}base AS (
       |  SELECT doc_id, $wsExpr AS ws
       |  FROM $from),
       |win AS (
       |  SELECT doc_id, i AS pos, md5($cat) AS h
       |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${SPAN_W - 2})) AS i
       |        FROM base WHERE len(ws) >= $SPAN_W)),
       |dup AS (SELECT h FROM win GROUP BY h HAVING COUNT(*) > 1),
       |marked AS (SELECT w.doc_id, w.pos FROM win w JOIN dup USING (h)),
       |isl AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $SPAN_W
       |         THEN 1 ELSE 0 END AS brk
       |  FROM marked),
       |grps AS (
       |  SELECT doc_id, pos,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS g
       |  FROM isl),
       |spans AS (
       |  SELECT doc_id, g, MAX(pos) - MIN(pos) + $SPAN_W AS span_words
       |  FROM grps GROUP BY doc_id, g),
       |per AS (SELECT doc_id, COUNT(*) AS n_spans, SUM(span_words) AS dup_words
       |        FROM spans GROUP BY doc_id)
       |SELECT b.doc_id, CAST(len(b.ws) AS BIGINT) AS n_words,
       |  CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
       |  CAST(COALESCE(p.dup_words, 0) AS BIGINT) AS dup_words,
       |  CAST((1000000 * COALESCE(p.dup_words, 0)) // GREATEST(len(b.ws), 1) AS BIGINT) AS dup_ppm
       |FROM base b LEFT JOIN per p USING (doc_id)""".stripMargin
  }

  val dedupSubstringSpansSql: String = dedupSubstringSpansSqlFrom(
    "list_filter(string_split(lower(text), ' '), w -> w != '')", "documents", "")

  /** SPAN REMOVAL with the KEEP-FIRST policy (r11 — the half of Lee
    * et al. 2021 that [[dedupSubstringSpans]] measures but does not
    * decide: duplicated text is removed EVERYWHERE EXCEPT its first
    * occurrence, so the corpus keeps exactly one copy of every
    * repeated passage): for each duplicated window hash the
    * occurrence with the smallest (doc_id, pos) is canonical; only
    * NON-canonical occurrences mark text, marks merge into maximal
    * spans per doc, and the per-source ledger reports docs touched,
    * words removed, and the exact ppm of corpus mass dropped — the
    * numbers the curation report carries. Canonical election is a
    * `min(struct(doc_id, pos))` PARTIAL AGGREGATE per hash (the
    * [[CanonicalQuality]] device) — combiner-friendly, so a
    * boilerplate span repeated 10^8 times reduces map-side instead of
    * sorting its whole occurrence list in one reducer the way a
    * per-hash row_number window would. Everything else shares the
    * span machinery's scale shape. */
  def pipelineSpanRemoval: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val words = t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.NgramExpressions.lower_tokens(col("text")).as("ws"))
    val win = words.filter(size(col("ws")) >= SPAN_W)
      .select(col("doc_id"), posexplode(graft.functions.NgramExpressions.array_md5(
        graft.functions.NgramExpressions.word_ngrams(col("ws"), SPAN_W)))
        .as(Seq("p", "h")))
      .select(col("doc_id"), (col("p") + 1).cast(LongType).as("pos"), col("h"))
    // dup detection and canonical election fused into ONE partial agg:
    // min(struct(doc_id, pos)) is lexicographic, matching the
    // keep-first (doc_id, pos) order, and combines map-side
    val canon = win.groupBy("h")
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      .filter(col("c") > 1)
      .select(col("h"),
        col("first.doc_id").as("c_doc"), col("first.pos").as("c_pos"))
    val marked = win.join(canon, "h") // the first occurrence survives
      .filter(col("doc_id") =!= col("c_doc") || col("pos") =!= col("c_pos"))
      .select("doc_id", "pos")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val spans = marked
      .withColumn("brk",
        when(col("pos") > lag("pos", 1).over(byDoc) + SPAN_W, 1L).otherwise(0L))
      .withColumn("g", sum("brk").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "g")
      .agg((max("pos") - min("pos") + SPAN_W).as("span_words"))
    val perDoc = spans.groupBy("doc_id")
      .agg(sum("span_words").as("removed_words"))
    t(s, dir, "documents").select("doc_id", "source")
      .join(words.select(col("doc_id"), size(col("ws")).cast(LongType).as("n_words")), "doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("total_words"),
        sum(when(col("removed_words").isNotNull, 1L).otherwise(0L)).as("n_docs_touched"),
        sum(coalesce(col("removed_words"), lit(0L))).as("removed_words"),
        expr("(1000000 * sum(coalesce(removed_words, 0))) div greatest(sum(n_words), 1)")
          .as("removed_ppm"))
  }

  /** SPAN REMOVAL APPLIED (r12 — the edit itself, closing the Lee et
    * al. 2021 loop: `dedup_substring_spans` measures, `pipeline_span_
    * removal` decides, this key PRODUCES the cleaned corpus): every
    * non-canonical duplicated window marks its 8 word positions,
    * marked positions drop, and each doc's surviving words — in
    * original order — render to a content fingerprint (md5 over the
    * joined kept words), so the gate pins the EDITED TEXT itself, not
    * just its mass. Same min-struct canonical election as the ledger
    * key; coverage explode is a constant 8× of marked occurrences;
    * the anti-join is keyed on (doc, position); the per-doc rebuild
    * collects only that doc's own kept words (bounded by doc length). */
  def pipelineSpanApply: Q = (s, dir) => {
    val words = t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.NgramExpressions.lower_tokens(col("text")).as("ws"))
    val win = words.filter(size(col("ws")) >= SPAN_W)
      .select(col("doc_id"), posexplode(graft.functions.NgramExpressions.array_md5(
        graft.functions.NgramExpressions.word_ngrams(col("ws"), SPAN_W)))
        .as(Seq("p", "h")))
      .select(col("doc_id"), (col("p") + 1).cast(LongType).as("pos"), col("h"))
    val canon = win.groupBy("h")
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      .filter(col("c") > 1)
      .select(col("h"),
        col("first.doc_id").as("c_doc"), col("first.pos").as("c_pos"))
    val marked = win.join(canon, "h")
      .filter(col("doc_id") =!= col("c_doc") || col("pos") =!= col("c_pos"))
      .select("doc_id", "pos")
    val covered = marked
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${SPAN_W - 1})")).as("p"))
      .distinct()
    val wordPos = words
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("p0", "w")))
      .select(col("doc_id"), (col("p0") + 1).cast(LongType).as("p"), col("w"))
    val perDoc = wordPos.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ", graft.functions.NgramExpressions.sorted_vals(
          collect_list(struct(col("p"), col("w")))))).as("clean_fp"))
    words.select(col("doc_id"), size(col("ws")).cast(LongType).as("n_words"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_fp"), md5(lit(""))).as("clean_fp"))
  }

  val pipelineSpanApplySql: String = {
    val cat = (0 until SPAN_W).map(j => s"ws[i + $j]").mkString(" || ' ' || ")
    s"""WITH base AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w != '') AS ws
       |  FROM documents),
       |win AS (
       |  SELECT doc_id, i AS pos, md5($cat) AS h
       |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${SPAN_W - 2})) AS i
       |        FROM base WHERE len(ws) >= $SPAN_W)),
       |marked AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT w.doc_id, w.pos,
       |      row_number() OVER (PARTITION BY w.h ORDER BY w.doc_id, w.pos) AS rn,
       |      COUNT(*) OVER (PARTITION BY w.h) AS c
       |    FROM win w)
       |  WHERE c > 1 AND rn > 1),
       |cov AS (
       |  SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS p
       |  FROM (SELECT doc_id, unnest(range(pos, pos + $SPAN_W)) AS p FROM marked)),
       |wp AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS p, ws[i] AS w
       |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM base)),
       |kept AS (
       |  SELECT wp.doc_id, wp.p, wp.w
       |  FROM wp LEFT JOIN cov ON cov.doc_id = wp.doc_id AND cov.p = wp.p
       |  WHERE cov.p IS NULL),
       |per AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |    md5(string_agg(w, ' ' ORDER BY p)) AS clean_fp
       |  FROM kept GROUP BY doc_id)
       |SELECT b.doc_id, CAST(len(b.ws) AS BIGINT) AS n_words,
       |  CAST(COALESCE(p.n_kept, 0) AS BIGINT) AS n_kept,
       |  COALESCE(p.clean_fp, md5('')) AS clean_fp
       |FROM base b LEFT JOIN per p USING (doc_id)""".stripMargin
  }

  val pipelineSpanRemovalSql: String = {
    val cat = (0 until SPAN_W).map(j => s"ws[i + $j]").mkString(" || ' ' || ")
    s"""WITH base AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w != '') AS ws
       |  FROM documents),
       |win AS (
       |  SELECT doc_id, i AS pos, md5($cat) AS h
       |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${SPAN_W - 2})) AS i
       |        FROM base WHERE len(ws) >= $SPAN_W)),
       |dup AS (SELECT h FROM win GROUP BY h HAVING COUNT(*) > 1),
       |marked AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT w.doc_id, w.pos,
       |      row_number() OVER (PARTITION BY w.h ORDER BY w.doc_id, w.pos) AS rn
       |    FROM win w JOIN dup USING (h))
       |  WHERE rn > 1),
       |isl AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $SPAN_W
       |         THEN 1 ELSE 0 END AS brk
       |  FROM marked),
       |grps AS (
       |  SELECT doc_id, pos,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS g
       |  FROM isl),
       |spans AS (
       |  SELECT doc_id, g, MAX(pos) - MIN(pos) + $SPAN_W AS span_words
       |  FROM grps GROUP BY doc_id, g),
       |per AS (SELECT doc_id, SUM(span_words) AS removed_words FROM spans GROUP BY doc_id)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len(b.ws)) AS BIGINT) AS total_words,
       |  CAST(SUM(CASE WHEN p.removed_words IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_touched,
       |  CAST(SUM(COALESCE(p.removed_words, 0)) AS BIGINT) AS removed_words,
       |  CAST((1000000 * SUM(COALESCE(p.removed_words, 0))) // GREATEST(SUM(len(b.ws)), 1) AS BIGINT) AS removed_ppm
       |FROM documents d
       |JOIN base b USING (doc_id)
       |LEFT JOIN per p USING (doc_id)
       |GROUP BY d.source""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "dedup_substring_spans" -> dedupSubstringSpans,
    "pipeline_span_removal" -> pipelineSpanRemoval,
    "pipeline_span_apply" -> pipelineSpanApply,
    "pipeline_split_leakage" -> pipelineSplitLeakage,
    "dedup_sparse_features" -> dedupSparseFeatures,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_degree_hist" -> dedupDegreeHist,
    "dedup_minhash_topm" -> dedupMinhashTopm,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_ngram_topm" -> dedupNgramTopm,
    "dedup_containment" -> dedupContainment,
    "dedup_simhash" -> dedupSimhash,
    "dedup_cdc" -> dedupCdc,
    "dedup_incremental" -> dedupIncremental,
    "stream_dedup_incremental" -> streamDedupIncremental,
    "dedup_eval" -> dedupEval,
    "dedup_eval_sweep" -> dedupEvalSweep)

  val oracles: Map[String, String] = Map(
    "dedup_substring_spans" -> dedupSubstringSpansSql,
    "pipeline_span_removal" -> pipelineSpanRemovalSql,
    "pipeline_span_apply" -> pipelineSpanApplySql,
    "pipeline_split_leakage" -> pipelineSplitLeakageSql,
    "dedup_sparse_features" -> dedupSparseFeaturesSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_degree_hist" -> dedupDegreeHistSql,
    "dedup_minhash_topm" -> dedupMinhashTopmSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_ngram_topm" -> dedupNgramTopmSql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_cdc" -> dedupCdcSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "stream_dedup_incremental" -> dedupIncrementalSql,
    "dedup_eval" -> dedupEvalSql,
    "dedup_eval_sweep" -> dedupEvalSweepSql)
}
