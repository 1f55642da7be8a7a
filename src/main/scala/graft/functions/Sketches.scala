package graft.functions

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed cardinality sketch (SURVEY.md §2C): KMV (k-minimum
  * values). The estimator keeps the k smallest distinct hash values of
  * the key; if h_k is the k-th smallest as a fraction of the hash
  * space, distinct ≈ (k-1)/h_k. Unlike HLL, KMV is an order statistic
  * of md5 values — fully deterministic given the data — so the DuckDB
  * oracle replays the estimate bit-for-bit (cross-engine-checkable
  * sketching; an HLL would diverge by implementation).
  *
  * Scale shape: hash map-side, one distinct shuffle on uniform md5
  * keys, then TakeOrderedAndProject(k) — each task contributes only
  * its local k smallest, the driver merges k·tasks rows. The sketch
  * is mergeable the same way across datasets (union the k-min sets,
  * re-take k).
  */
object Sketches {

  type Q = (SparkSession, String) => DataFrame

  private val K = 256
  /** 15 hex chars = 60 bits; hash space size 2^60 (exact as a double). */
  private val SPACE = "1152921504606846976.0"

  /** 2^60 as an exact integer, for the all-BIGINT bucket-min estimator. */
  private val SPACE_L = 1152921504606846976L
  private val NB = 64 // stochastic-averaging buckets

  /** Bucket-min cardinality sketch (stochastic averaging): hash every
    * row, keep ONE minimum per h%NB bucket, estimate distinct count as
    * Σ_b (2^60 div (min_b+1) − 1). Unlike bottom-k KMV (heap, awkward
    * to maintain incrementally) the state is a FIXED NB-row vector
    * maintained by a plain min aggregate — trivially mergeable across
    * shards and directly expressible as a streaming aggregation (see
    * [[streamKmv]], which shares this oracle). No distinct shuffle
    * anywhere: the sketch consumes the raw stream. All-BIGINT floor
    * arithmetic keeps both engines bit-identical. */
  def sketchBucketMin: Q = (s, dir) => {
    val ev = events(s, dir)
    val h = ev.select(
      graft.functions.HashExpressions.md5_head(col("user_id").cast(StringType), 15).as("h"))
    val bm = h.groupBy((col("h") % NB).as("bucket")).agg(min(col("h")).as("mn"))
    val est = bm.agg(count(lit(1)).as("n_buckets"),
      sum(expr(s"${SPACE_L}L DIV (mn + 1) - 1")).as("est_distinct"))
    val ex = ev.select("user_id").distinct()
      .agg(count(lit(1)).as("exact_distinct"))
    est.crossJoin(ex)
  }

  val sketchBucketMinSql: String =
    s"""WITH h AS (
       |  SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM events),
       |bm AS (SELECT h % $NB AS bucket, MIN(h) AS mn FROM h GROUP BY 1),
       |est AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |    CAST(SUM($SPACE_L // (mn + 1) - 1) AS BIGINT) AS est_distinct FROM bm),
       |ex AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct FROM events)
       |SELECT n_buckets, est_distinct, exact_distinct
       |FROM est CROSS JOIN ex""".stripMargin

  /** Streaming twin of [[sketchBucketMin]]: the NB bucket minima
    * maintained as a complete-mode streaming aggregation over the
    * event file stream — running state is exactly NB rows for ANY
    * stream length, the property bottom-k KMV cannot offer. Estimator
    * and exact count run batch-side on the drained minima; output and
    * oracle identical to the batch build. */
  def streamKmv: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/events.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "kmv", dir, "events.parquet") { stageDir =>
      val bm = s.readStream.schema(sch).parquet(stageDir)
        .select(graft.functions.HashExpressions.md5_head(col("user_id").cast(StringType), 15).as("h"))
        .groupBy((col("h") % NB).as("bucket")).agg(min(col("h")).as("mn"))
      graft.streaming.StreamStage.drain(s, "kmv")(bm.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_kmv"))
    }
    val est = s.table("graft_stream_kmv")
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"${SPACE_L}L DIV (mn + 1) - 1")).as("est_distinct"))
    val ex = events(s, dir).select("user_id").distinct()
      .agg(count(lit(1)).as("exact_distinct"))
    est.crossJoin(ex)
  }

  def sketchKmvDistinct: Q = (s, dir) => {
    val hashes = t(s, dir, "lineitem")
      .select(graft.functions.HashExpressions.md5_head(col("l_orderkey").cast(StringType), 15).as("h"))
      .distinct()
    val topk = hashes.orderBy("h").limit(K)
    val sk = topk.agg(max(col("h")).as("hk"), count(lit(1)).as("k"))
    val exact = t(s, dir, "lineitem")
      .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
    sk.crossJoin(exact)
      .select(col("k"), col("hk"),
        ((col("k") - 1).cast(DoubleType) * expr(SPACE) / col("hk").cast(DoubleType))
          .as("est_distinct"),
        col("exact_distinct"))
  }

  val sketchKmvDistinctSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM lineitem),
       |topk AS (SELECT h FROM h ORDER BY h LIMIT $K),
       |agg AS (SELECT MAX(h) AS hk, COUNT(*) AS k FROM topk),
       |ex AS (SELECT COUNT(DISTINCT l_orderkey) AS exact_distinct FROM lineitem)
       |SELECT k, hk,
       |  CAST(k - 1 AS DOUBLE) * $SPACE / CAST(hk AS DOUBLE) AS est_distinct,
       |  exact_distinct
       |FROM agg CROSS JOIN ex""".stripMargin

  /** Exact grouped quantiles: p25/p50/p75/p95 of l_quantity per return
    * flag, linear interpolation at rank p·(n-1) — the same definition
    * DuckDB's quantile_cont uses, and l_quantity is integer-valued, so
    * the interpolation arithmetic is bit-identical cross-engine.
    *
    * Scale note: Spark's exact `percentile` buffers a value→count map
    * per group — fine for bounded-cardinality domains like quantities,
    * prices-in-cents, or token counts (the common pipeline cases). For
    * unbounded continuous domains the 100 TB path is
    * `percentile_approx` (t-digest, constant memory); it is not
    * cross-engine replayable, which is why the oracle-checked query
    * uses the exact form. */
  def sketchQuantile: Q = (s, dir) =>
    t(s, dir, "lineitem").groupBy("l_returnflag").agg(
      expr("percentile(l_quantity, 0.25D)").as("p25"),
      expr("percentile(l_quantity, 0.5D)").as("p50"),
      expr("percentile(l_quantity, 0.75D)").as("p75"),
      expr("percentile(l_quantity, 0.95D)").as("p95"))

  val sketchQuantileSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  quantile_cont(l_quantity, 0.95) AS p95
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Cross-shard mergeable sketch: one KMV per source shard, merged
    * into a union-cardinality estimate — the sketch property that
    * makes distributed distinct counting cheap (ship k hashes per
    * shard, not the key sets; dedup across 100 TB of shards costs
    * k·shards rows of traffic).
    *
    * Scale shape: per-shard k-min sets come from the bounded [[TopK]]
    * aggregator (constant sort key → ordered by hash ascending), so
    * each task ships at most k rows per shard — the window-function
    * formulation would shuffle EVERY distinct hash. The merge is an
    * explode + re-take-k over k·shards rows (driver-scale). Output:
    * one row per shard plus the merged ALL row, each with the exact
    * count alongside (validation column — sampled or dropped in a
    * real 100 TB run, as with sketch_kmv_distinct). */
  def sketchKmvMerge: Q = (s, dir) => {
    val hd = t(s, dir, "documents")
      .select(col("source"),
        graft.functions.HashExpressions.md5_head(col("text"), 15).as("h"))
      .distinct()
      .cache() // feeds the sketch and both exact-count branches
    val mins = hd.groupBy("source")
      .agg(TopK.topk(K)(lit(0.0), col("h"), lit(0.0)).as("m"))
      .cache() // feeds per-shard rows and the merge
    val perSrc = mins.select(col("source").as("scope"),
      size(col("m")).cast(LongType).as("k"),
      expr("element_at(m, size(m))._2").as("hk"))
    val merged = mins.select(explode(col("m")).as("e"))
      .select(col("e._2").as("h")).distinct()
      .orderBy("h").limit(K)
      .agg(count(lit(1)).as("k"), max(col("h")).as("hk"))
      .select(lit("ALL").as("scope"), col("k"), col("hk"))
    val exact = hd.groupBy(col("source").as("scope"))
      .agg(count(lit(1)).as("exact_distinct"))
      .unionByName(hd.select("h").distinct()
        .agg(count(lit(1)).as("exact_distinct"))
        .select(lit("ALL").as("scope"), col("exact_distinct")))
    perSrc.unionByName(merged)
      .join(exact, "scope")
      .select(col("scope"), col("k"), col("hk"),
        ((col("k") - 1).cast(DoubleType) * expr(SPACE) / col("hk").cast(DoubleType))
          .as("est_distinct"),
        col("exact_distinct"))
  }

  val sketchKmvMergeSql: String =
    s"""WITH hd AS (
       |  SELECT DISTINCT source, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
       |  FROM documents),
       |mins AS (
       |  SELECT source, h FROM (
       |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM hd) WHERE rn <= $K),
       |persrc AS (
       |  SELECT source AS scope, CAST(COUNT(*) AS BIGINT) AS k, MAX(h) AS hk
       |  FROM mins GROUP BY source),
       |mtop AS (SELECT h FROM (SELECT DISTINCT h FROM mins) ORDER BY h LIMIT $K),
       |mrow AS (SELECT 'ALL' AS scope, CAST(COUNT(*) AS BIGINT) AS k, MAX(h) AS hk FROM mtop),
       |sk AS (SELECT * FROM persrc UNION ALL SELECT * FROM mrow),
       |exsrc AS (
       |  SELECT source AS scope, CAST(COUNT(*) AS BIGINT) AS exact_distinct
       |  FROM hd GROUP BY source),
       |exall AS (
       |  SELECT 'ALL' AS scope, CAST(COUNT(DISTINCT h) AS BIGINT) AS exact_distinct FROM hd),
       |ex AS (SELECT * FROM exsrc UNION ALL SELECT * FROM exall)
       |SELECT sk.scope, sk.k, sk.hk,
       |  CAST(sk.k - 1 AS DOUBLE) * $SPACE / CAST(sk.hk AS DOUBLE) AS est_distinct,
       |  ex.exact_distinct
       |FROM sk JOIN ex USING (scope)""".stripMargin

  /** Approximate quantiles from a mergeable equi-width HISTOGRAM
    * sketch — the constant-memory companion to [[sketchQuantile]] for
    * unbounded continuous domains (exact `percentile` buffers a
    * value→count map per group; a 64-bin histogram buffers 64 longs
    * regardless of scale). Unlike a t-digest, bin counts are integers
    * and the estimator is a closed-form double expression, so the
    * DuckDB oracle replays the estimate bit-for-bit.
    *
    * Scale shape: one min/max/count pass (partial agg), one bin-count
    * pass (map-side partial agg onto ≤64 keys), then all sketch math
    * — cumulative counts, bin selection, interpolation — runs on the
    * 64-row histogram (the cumulative window's single partition holds
    * 64 rows, not data). Merging shards = adding bin counts, the same
    * groupBy that builds it. Estimator: for target rank r = p·n,
    * choose the first bin with cum ≥ r and interpolate
    * lo + w·(bin + (r - cum_before)/cnt). */
  def sketchHistogramQuantile: Q = (s, dir) => {
    val x = events(s, dir).select(col("value").cast(DoubleType).as("x"))
    val st = x.agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
        count(lit(1)).as("n"))
      .withColumn("w", expr("(hi - lo) / CAST(64 AS DOUBLE)"))
    val hist = x.crossJoin(broadcast(st))
      .select(expr("CAST(least(floor((x - lo) / w), CAST(63 AS DOUBLE)) AS BIGINT)").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val cum = hist.select(col("bin"), col("cnt"),
      sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
        .orderBy("bin").rowsBetween(Long.MinValue, 0)).as("cum"))
    import s.implicits._
    val qs = Seq(0.25, 0.5, 0.75, 0.95).toDF("p")
    val sel = cum.crossJoin(broadcast(st)).crossJoin(broadcast(qs))
      .filter(expr("CAST(cum AS DOUBLE) >= p * CAST(n AS DOUBLE)"))
      .groupBy("p").agg(min(col("bin")).as("bin"))
    sel.join(cum, "bin").crossJoin(broadcast(st))
      .select(col("p"), col("bin"), col("cnt"), col("cum"),
        expr("""lo + w * (CAST(bin AS DOUBLE)
               |  + (p * CAST(n AS DOUBLE) - (CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE)))
               |    / CAST(cnt AS DOUBLE))""".stripMargin).as("est_q"))
  }

  val sketchHistogramQuantileSql: String =
    """WITH x AS (SELECT value AS x FROM events),
      |st AS (SELECT MIN(x) AS lo, MAX(x) AS hi, COUNT(*) AS n,
      |              (MAX(x) - MIN(x)) / CAST(64 AS DOUBLE) AS w FROM x),
      |b AS (SELECT CAST(LEAST(FLOOR((x.x - st.lo) / st.w), CAST(63 AS DOUBLE)) AS BIGINT) AS bin,
      |             COUNT(*) AS cnt
      |      FROM x CROSS JOIN st GROUP BY 1),
      |c AS (SELECT bin, cnt, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum FROM b),
      |q AS (SELECT UNNEST([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
      |                     CAST(0.75 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS p),
      |sel AS (SELECT q.p, MIN(c.bin) AS bin
      |        FROM q, c, st WHERE CAST(c.cum AS DOUBLE) >= q.p * CAST(st.n AS DOUBLE)
      |        GROUP BY q.p)
      |SELECT sel.p, sel.bin, c.cnt, c.cum,
      |  st.lo + st.w * (CAST(sel.bin AS DOUBLE)
      |    + (sel.p * CAST(st.n AS DOUBLE) - (CAST(c.cum AS DOUBLE) - CAST(c.cnt AS DOUBLE)))
      |      / CAST(c.cnt AS DOUBLE)) AS est_q
      |FROM sel JOIN c ON c.bin = sel.bin CROSS JOIN st""".stripMargin

  /** STREAMING quantiles from a FIXED-DOMAIN mergeable histogram (r8 —
    * the prometheus `histogram_quantile` shape: monitoring histograms
    * DECLARE their bucket domain up front, which is exactly what makes
    * the sketch a ONE-PASS streaming aggregate — the batch twin's
    * data-derived [min, max] needs a first pass a stream doesn't
    * have). 64 bins over the declared [0, 1024) (out-of-domain values
    * clip into the edge bins), bin counts maintained as a
    * complete-mode streaming aggregate — 64 rows of state regardless
    * of stream length — then the same rank-interpolation estimator
    * finishing as the batch key. */
  def streamQuantileHistogram: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/events.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "qhist", dir, "events.parquet") { stageDir =>
      val bins = s.readStream.schema(sch).parquet(stageDir)
        .select(expr(
          """CAST(greatest(least(floor(CAST(value AS DOUBLE) / CAST(16 AS DOUBLE)),
            |  CAST(63 AS DOUBLE)), CAST(0 AS DOUBLE)) AS BIGINT)""".stripMargin).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cnt"))
      graft.streaming.StreamStage.drain(s, "qhist")(bins.writeStream.outputMode("complete").format("memory")
        .queryName("graft_stream_qhist"))
    }
    val hist = s.table("graft_stream_qhist")
    val st = hist.agg(sum(col("cnt")).as("n"))
    val cum = hist.select(col("bin"), col("cnt"),
      sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
        .orderBy("bin").rowsBetween(Long.MinValue, 0)).as("cum"))
    import s.implicits._
    val qs = Seq(0.25, 0.5, 0.75, 0.95).toDF("p")
    val sel = cum.crossJoin(broadcast(st)).crossJoin(broadcast(qs))
      .filter(expr("CAST(cum AS DOUBLE) >= p * CAST(n AS DOUBLE)"))
      .groupBy("p").agg(min(col("bin")).as("bin"))
    sel.join(cum, "bin").crossJoin(broadcast(st))
      .select(col("p"), col("bin"), col("cnt"), col("cum"),
        expr("""CAST(16 AS DOUBLE) * (CAST(bin AS DOUBLE)
               |  + (p * CAST(n AS DOUBLE) - (CAST(cum AS DOUBLE) - CAST(cnt AS DOUBLE)))
               |    / CAST(cnt AS DOUBLE))""".stripMargin).as("est_q"))
  }

  val streamQuantileHistogramSql: String =
    """WITH b AS (SELECT CAST(GREATEST(LEAST(FLOOR(CAST(value AS DOUBLE) / CAST(16 AS DOUBLE)),
      |    CAST(63 AS DOUBLE)), CAST(0 AS DOUBLE)) AS BIGINT) AS bin,
      |    COUNT(*) AS cnt FROM events GROUP BY 1),
      |st AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM b),
      |c AS (SELECT bin, cnt, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum FROM b),
      |q AS (SELECT UNNEST([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
      |                     CAST(0.75 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS p),
      |sel AS (SELECT q.p, MIN(c.bin) AS bin
      |        FROM q, c, st WHERE CAST(c.cum AS DOUBLE) >= q.p * CAST(st.n AS DOUBLE)
      |        GROUP BY q.p)
      |SELECT sel.p, sel.bin, c.cnt, c.cum,
      |  CAST(16 AS DOUBLE) * (CAST(sel.bin AS DOUBLE)
      |    + (sel.p * CAST(st.n AS DOUBLE) - (CAST(c.cum AS DOUBLE) - CAST(c.cnt AS DOUBLE)))
      |      / CAST(c.cnt AS DOUBLE)) AS est_q
      |FROM sel JOIN c ON c.bin = sel.bin CROSS JOIN st""".stripMargin

  private val CMS_D = 4
  private val CMS_W = 512

  /** Count-min sketch: frequency estimation for heavy hitters in
    * D×W = 4×512 longs of state, mergeable by cell-wise addition —
    * the constant-memory companion to the exact [[graft.functions
    * .TextOps]] top-terms (exact counting holds the full vocabulary;
    * the CMS holds 2k cells no matter the vocabulary size). Each
    * token increments one bucket per hash row (md5-derived, so the
    * DuckDB oracle replays the exact sketch); a point query takes the
    * MIN over its D cells — an upper bound on the true count, never
    * under. The query reports the top-10 exact terms alongside their
    * CMS estimates, so the gate checks both the sketch contents and
    * the estimator.
    *
    * Scale shape: building the sketch is one map-side-combined
    * groupBy onto ≤ D·W keys (partial aggs shrink every task's
    * contribution to ≤2k rows); the probe side is driver-scale and
    * the sketch itself is broadcast to the probe join. */
  def sketchCms: Q = (s, dir) => {
    def buckets = array((0 until CMS_D).map(d =>
      graft.functions.HashExpressions.md5_head(concat(lit(s"$d:"), col("tok")), 8) % CMS_W): _*)
    val toks = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok")).cache() // sketch + probes
    val sketch = toks.select(posexplode(buckets).as(Seq("d", "bucket")))
      .groupBy("d", "bucket").agg(count(lit(1)).as("cnt"))
    val probes = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("tok").asc).limit(10)
    probes.select(col("tok"), col("exact_n"), posexplode(buckets).as(Seq("d", "bucket")))
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy("tok", "exact_n").agg(min(col("cnt")).as("est_n"))
  }

  val sketchCmsSql: String = {
    def bucketSql(tokRef: String) =
      s"CAST('0x' || substr(md5(CAST(g.d AS VARCHAR) || ':' || $tokRef), 1, 8) AS BIGINT) % $CMS_W"
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |keyed AS (
       |  SELECT g.d, ${bucketSql("toks.tok")} AS bucket
       |  FROM toks CROSS JOIN generate_series(0, ${CMS_D - 1}) g(d)),
       |sketch AS (SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
       |           FROM keyed GROUP BY d, bucket),
       |probes AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n
       |           FROM toks GROUP BY tok ORDER BY COUNT(*) DESC, tok LIMIT 10),
       |pk AS (
       |  SELECT p.tok, p.exact_n, g.d, ${bucketSql("p.tok")} AS bucket
       |  FROM probes p CROSS JOIN generate_series(0, ${CMS_D - 1}) g(d))
       |SELECT pk.tok, pk.exact_n, MIN(s.cnt) AS est_n
       |FROM pk JOIN sketch s USING (d, bucket)
       |GROUP BY pk.tok, pk.exact_n""".stripMargin
  }

  /** Streaming CMS build: the identical D×W sketch accumulated by a
    * Structured Streaming aggregation (complete mode — the sketch IS
    * the running state, ≤2k cells regardless of stream length) over a
    * file stream of the corpus, probed batch-side after the stream
    * drains. The final rows must equal the batch [[sketchCms]] exactly
    * — same oracle — proving the sketch is stream-accumulable with no
    * semantic drift (the mergeability claim, exercised through Spark's
    * own incremental execution). */
  def streamCms: Q = (s, dir) => {
    def buckets = array((0 until CMS_D).map(d =>
      graft.functions.HashExpressions.md5_head(concat(lit(s"$d:"), col("tok")), 8) % CMS_W): _*)
    // the file-stream source requires a DIRECTORY: stage the corpus
    // file into a scratch dir for the drain, deleted right after
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "cms", dir, "documents.parquet") { stageDir =>
      val sketchStream = s.readStream.schema(sch).parquet(stageDir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .select(posexplode(buckets).as(Seq("d", "bucket")))
        .groupBy("d", "bucket").agg(count(lit(1)).as("cnt"))
      graft.streaming.StreamStage.drain(s, "cms")(sketchStream.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_cms"))
    }
    val sketch = s.table("graft_stream_cms")
    val toks = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val probes = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("tok").asc).limit(10)
    probes.select(col("tok"), col("exact_n"), posexplode(buckets).as(Seq("d", "bucket")))
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy("tok", "exact_n").agg(min(col("cnt")).as("est_n"))
  }

  /** Streaming heavy hitters (the CMS × heap composition): the D×W
    * count-min sketch is accumulated as a complete-mode Structured
    * Streaming aggregation over a file stream of the events table
    * (running state = the ≤2k-cell sketch, bounded for any stream
    * length), then every candidate is probed against the BROADCAST
    * final sketch and kept iff its estimate clears the support
    * threshold est·128 ≥ N — the classic φ = 1/128 heavy-hitter
    * query, reported with exact counts alongside so the gate checks
    * estimator and threshold together. Candidates here are the
    * distinct keys (bounded: ~150 users); on an unbounded key domain
    * the candidate set itself rides along in the stream as a
    * per-micro-batch top-k heap merged in foreachBatch — the sketch
    * side (the state bound) is what this query pins. Output is
    * integer-only: CMS cells and counts replay exactly in DuckDB. */
  def streamHeavyHitters: Q = (s, dir) => {
    def buckets(c: org.apache.spark.sql.Column) = array((0 until CMS_D).map(d =>
      graft.functions.HashExpressions.md5_head(concat(lit(s"$d:"), c), 8) % CMS_W): _*)
    val sch = s.read.parquet(s"$dir/events.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "hh", dir, "events.parquet") { stageDir =>
      val sketchStream = s.readStream.schema(sch).parquet(stageDir)
        .select(col("user_id").cast(StringType).as("u"))
        .select(posexplode(buckets(col("u"))).as(Seq("d", "bucket")))
        .groupBy("d", "bucket").agg(count(lit(1)).as("cnt"))
      graft.streaming.StreamStage.drain(s, "hh")(sketchStream.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_hh"))
    }
    val sketch = s.table("graft_stream_hh")
    val ev = t(s, dir, "events").select(col("user_id").cast(StringType).as("u"))
    val tot = ev.agg(count(lit(1)).as("n_total"))
    val probes = ev.groupBy("u").agg(count(lit(1)).as("exact_n"))
    probes.select(col("u"), col("exact_n"), posexplode(buckets(col("u"))).as(Seq("d", "bucket")))
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy("u", "exact_n").agg(min(col("cnt")).as("est_n"))
      .crossJoin(broadcast(tot))
      .filter(col("est_n") * 128 >= col("n_total"))
      .select(col("u").cast(LongType).as("user_id"), col("exact_n"),
        col("est_n"), col("n_total"))
  }

  val streamHeavyHittersSql: String = {
    def bucketSql(uRef: String) =
      s"CAST('0x' || substr(md5(CAST(g.d AS VARCHAR) || ':' || $uRef), 1, 8) AS BIGINT) % $CMS_W"
    s"""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS u FROM events),
       |keyed AS (
       |  SELECT g.d, ${bucketSql("ev.u")} AS bucket
       |  FROM ev CROSS JOIN generate_series(0, ${CMS_D - 1}) g(d)),
       |sketch AS (SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
       |           FROM keyed GROUP BY d, bucket),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM ev),
       |probes AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS exact_n
       |           FROM ev GROUP BY u),
       |pk AS (
       |  SELECT p.u, p.exact_n, g.d, ${bucketSql("p.u")} AS bucket
       |  FROM probes p CROSS JOIN generate_series(0, ${CMS_D - 1}) g(d)),
       |est AS (SELECT pk.u, pk.exact_n, MIN(s.cnt) AS est_n
       |        FROM pk JOIN sketch s USING (d, bucket)
       |        GROUP BY pk.u, pk.exact_n)
       |SELECT CAST(u AS BIGINT) AS user_id, exact_n, est_n, n_total
       |FROM est CROSS JOIN tot
       |WHERE est_n * 128 >= n_total""".stripMargin
  }

  /** KMV set-operation estimation (Beyer et al., SIGMOD'07): the
    * intersection of two audiences estimated from their k-min sketches
    * ALONE — the union's k minima are the k smallest of the combined
    * sketches, the Jaccard estimate is the fraction of those minima
    * present in BOTH input sketches, and |A∩B| ≈ J·|A∪B|. At 100 TB
    * the point is that the sketches are the ONLY thing that crosses
    * shard boundaries (k 8-byte hashes per set, vs re-scanning either
    * side for the exact answer); the exact intersection rides along
    * here for the oracle's accuracy check. All selection is integer
    * order statistics over md5 hashes — bit-identical cross-engine. */
  def sketchKmvIntersect: Q = (s, dir) => {
    val ev = events(s, dir)
    def userHashes(typ: String) = ev.filter(col("event_type") === typ)
      .select(graft.functions.HashExpressions.md5_head(col("user_id").cast(StringType), 15).as("h"))
      .distinct()
    val a = userHashes("click").orderBy("h").limit(K).cache()
    val b = userHashes("view").orderBy("h").limit(K).cache()
    val u = a.unionByName(b).distinct().orderBy("h").limit(K).cache()
    val uk = u.agg(count(lit(1)).as("k"), max(col("h")).as("hk"))
    val both = u.join(a, Seq("h"), "left_semi").join(b, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    val exact = ev.filter(col("event_type").isin("click", "view"))
      .select("user_id", "event_type").distinct()
      .groupBy("user_id").agg(count(lit(1)).as("nt"))
      .filter(col("nt") === 2)
      .agg(count(lit(1)).as("exact_intersect"))
    uk.crossJoin(both).crossJoin(exact)
      .select(col("k"), col("n_both"),
        round(col("n_both") / col("k"), 6).as("jaccard_est"),
        round((col("k") - 1).cast(DoubleType) * expr(SPACE) / col("hk").cast(DoubleType)
          * (col("n_both") / col("k")), 3).as("est_intersect"),
        col("exact_intersect"))
  }

  val sketchKmvIntersectSql: String =
    s"""WITH a AS (
       |  SELECT DISTINCT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM events WHERE event_type = 'click' ORDER BY h LIMIT $K),
       |b AS (
       |  SELECT DISTINCT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM events WHERE event_type = 'view' ORDER BY h LIMIT $K),
       |u AS (
       |  SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b) t
       |  ORDER BY h LIMIT $K),
       |uk AS (SELECT COUNT(*) AS k, MAX(h) AS hk FROM u),
       |nb AS (
       |  SELECT COUNT(*) AS n_both FROM u
       |  WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)),
       |ex AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersect FROM (
       |    SELECT user_id FROM (
       |      SELECT DISTINCT user_id, event_type FROM events
       |      WHERE event_type IN ('click', 'view')) t
       |    GROUP BY user_id HAVING COUNT(*) = 2))
       |SELECT k, n_both,
       |  round(n_both / k, 6) AS jaccard_est,
       |  round(CAST(k - 1 AS DOUBLE) * $SPACE / CAST(hk AS DOUBLE)
       |    * (n_both / k), 3) AS est_intersect,
       |  exact_intersect
       |FROM uk CROSS JOIN nb CROSS JOIN ex""".stripMargin

  /** KMV set-DIFFERENCE estimation (the A-NOT-B operation of the
    * theta-sketch family, same Beyer et al. foundation as
    * [[sketchKmvIntersect]]): |A∖B| ≈ ρ·|A∪B| where ρ is the fraction
    * of the union's k minima that lie in A's sketch but not B's —
    * the audience-exclusion question ("clicked but never viewed")
    * answered from two k-hash sketches alone, no rescan of either
    * side. Selection is integer order statistics over md5 hashes —
    * bit-identical cross-engine; the exact answer rides along for the
    * oracle's accuracy check. */
  def sketchKmvDiff: Q = (s, dir) => {
    val ev = events(s, dir)
    def userHashes(typ: String) = ev.filter(col("event_type") === typ)
      .select(graft.functions.HashExpressions.md5_head(col("user_id").cast(StringType), 15).as("h"))
      .distinct()
    val a = userHashes("click").orderBy("h").limit(K).cache()
    val b = userHashes("view").orderBy("h").limit(K).cache()
    val u = a.unionByName(b).distinct().orderBy("h").limit(K).cache()
    val uk = u.agg(count(lit(1)).as("k"), max(col("h")).as("hk"))
    val aNotB = u.join(a, Seq("h"), "left_semi").join(b, Seq("h"), "left_anti")
      .agg(count(lit(1)).as("n_a_not_b"))
    val exact = ev.filter(col("event_type").isin("click", "view"))
      .select("user_id", "event_type").distinct()
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("ca"),
        max(when(col("event_type") === "view", 1).otherwise(0)).as("cb"))
      .filter(col("ca") === 1 && col("cb") === 0)
      .agg(count(lit(1)).as("exact_diff"))
    uk.crossJoin(aNotB).crossJoin(exact)
      .select(col("k"), col("n_a_not_b"),
        round(col("n_a_not_b") / col("k"), 6).as("rho_est"),
        round((col("k") - 1).cast(DoubleType) * expr(SPACE) / col("hk").cast(DoubleType)
          * (col("n_a_not_b") / col("k")), 3).as("est_diff"),
        col("exact_diff"))
  }

  val sketchKmvDiffSql: String =
    s"""WITH a AS (
       |  SELECT DISTINCT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM events WHERE event_type = 'click' ORDER BY h LIMIT $K),
       |b AS (
       |  SELECT DISTINCT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM events WHERE event_type = 'view' ORDER BY h LIMIT $K),
       |u AS (
       |  SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b) t
       |  ORDER BY h LIMIT $K),
       |uk AS (SELECT COUNT(*) AS k, MAX(h) AS hk FROM u),
       |nab AS (
       |  SELECT COUNT(*) AS n_a_not_b FROM u
       |  WHERE h IN (SELECT h FROM a) AND h NOT IN (SELECT h FROM b)),
       |ex AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_diff FROM (
       |    SELECT user_id FROM (
       |      SELECT DISTINCT user_id, event_type FROM events
       |      WHERE event_type IN ('click', 'view')) t
       |    GROUP BY user_id
       |    HAVING MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1
       |       AND MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 0))
       |SELECT k, n_a_not_b,
       |  round(n_a_not_b / k, 6) AS rho_est,
       |  round(CAST(k - 1 AS DOUBLE) * $SPACE / CAST(hk AS DOUBLE)
       |    * (n_a_not_b / k), 3) AS est_diff,
       |  exact_diff
       |FROM uk CROSS JOIN nab CROSS JOIN ex""".stripMargin

  // ── HyperLogLog (Flajolet et al. 2007) — THE standard cardinality
  // sketch, here in a fully DETERMINISTIC cross-engine construction
  // (the built-in approx_count_distinct HLLs diverge by
  // implementation, which is why the KMV family led): register index
  // and rank both derive from md5 hex, the power sum Σ2^(49−M_j) is
  // an exact BIGINT (no float-order sensitivity), and the
  // small-range linear-counting branch m·ln(m/V) reads from a table
  // of 64 PRE-RENDERED decimal literals spliced into BOTH engines —
  // so neither engine ever calls a floating log. Scale shape: one
  // map-side hash + a 64-key partial-agg max; the register vector is
  // the mergeable state (the gate re-derives it from per-event-type
  // sub-sketches and pins the merge equal). ──
  private val HLL_M = 64
  private val POW49 = "562949953421312" // 2^49, exact in BIGINT and DOUBLE
  /** m·ln(m/V) for V = 1..64, rendered once via JVM math and spliced
    * as identical decimal literals into both engines. */
  private val hllLnTab: IndexedSeq[String] =
    (1 to HLL_M).map(v => java.lang.Double.toString(
      HLL_M.toDouble * math.log(HLL_M.toDouble / v)))

  /** md5-derived HLL registers of a (user_id, …) row set. */
  private def hllRegsOf(rows: DataFrame): DataFrame = rows
    .select(md5(col("user_id").cast(StringType)).as("hx"))
    .select(
      (conv(substring(col("hx"), 1, 2), 16, 10).cast(LongType) % HLL_M).as("bucket"),
      conv(substring(col("hx"), 3, 12), 16, 10).cast(LongType).as("w"))
    .select(col("bucket"), when(col("w") === 0, lit(49L))
      .otherwise(lit(49L) - length(conv(col("w").cast(StringType), 10, 2)).cast(LongType))
      .as("rho"))
    .groupBy("bucket").agg(max(col("rho")).as("m_j"))

  /** Exact-BIGINT power sum + zero-register count over a register set
    * (absent buckets count as M_j = 0). */
  private def hllSums(r: DataFrame): DataFrame = r.agg(
    count(lit(1)).as("nb"),
    sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - m_j AS INT))")).as("sp"),
    sum(when(col("m_j") === 0, 1L).otherwise(0L)).as("zp"))
    .select((col("sp") + (lit(HLL_M.toLong) - col("nb")) * lit(1L << 49)).as("s_sum"),
      (col("zp") + (lit(HLL_M.toLong) - col("nb"))).as("zeros"))

  /** Finish a register set into (reg_sum, zeros, est_distinct). */
  private def hllFinish(regs: DataFrame): DataFrame = {
    val lnCase = (1 to HLL_M).map(v =>
      s"WHEN $v THEN CAST(${hllLnTab(v - 1)} AS DOUBLE)").mkString(" ")
    hllSums(regs).withColumn("raw",
        expr(s"CAST(0.709 AS DOUBLE) * 4096 * $POW49 / s_sum"))
      .withColumn("est_distinct", round(expr(
        s"CASE WHEN raw <= 160.0 AND zeros > 0 THEN CASE zeros $lnCase END ELSE raw END"), 6))
      .select(col("s_sum").as("reg_sum"), col("zeros"), col("est_distinct"))
  }

  /** GROUPED HLL + UNION MERGE (r12 — the dataset-card "distinct
    * users per segment AND overall" question answered in ONE pass,
    * the way a sharded 100 TB ingest actually does it): one register
    * vector per event_type (a (type, 64-bucket) partial-agg max),
    * finished per type, plus a `__union__` row whose registers are
    * the bucketwise MAX across the per-type sketches — the HLL union
    * law, so the overall cardinality costs a 64·types-row merge
    * instead of a second corpus pass. Register sums are exact BIGINT;
    * the small-range branch reads the shared literal table. */
  def sketchHllGroups: Q = (s, dir) => {
    val lnCase = (1 to HLL_M).map(v =>
      s"WHEN $v THEN CAST(${hllLnTab(v - 1)} AS DOUBLE)").mkString(" ")
    def finishGrouped(regs: DataFrame): DataFrame =
      regs.groupBy("event_type")
        .agg(count(lit(1)).as("nb"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - m_j AS INT))")).as("sp"),
          sum(when(col("m_j") === 0, 1L).otherwise(0L)).as("zp"))
        .select(col("event_type"),
          (col("sp") + (lit(HLL_M.toLong) - col("nb")) * lit(1L << 49)).as("s_sum"),
          (col("zp") + (lit(HLL_M.toLong) - col("nb"))).as("zeros"))
        .withColumn("raw", expr(s"CAST(0.709 AS DOUBLE) * 4096 * $POW49 / s_sum"))
        .withColumn("est_distinct", round(expr(
          s"CASE WHEN raw <= 160.0 AND zeros > 0 THEN CASE zeros $lnCase END ELSE raw END"), 6))
        .select(col("event_type"), col("s_sum").as("reg_sum"), col("zeros"),
          col("est_distinct"))
    val grouped = events(s, dir)
      .select(col("event_type"), md5(col("user_id").cast(StringType)).as("hx"))
      .select(col("event_type"),
        (conv(substring(col("hx"), 1, 2), 16, 10).cast(LongType) % HLL_M).as("bucket"),
        conv(substring(col("hx"), 3, 12), 16, 10).cast(LongType).as("w"))
      .select(col("event_type"), col("bucket"), when(col("w") === 0, lit(49L))
        .otherwise(lit(49L) - length(conv(col("w").cast(StringType), 10, 2)).cast(LongType))
        .as("rho"))
      .groupBy("event_type", "bucket").agg(max(col("rho")).as("m_j"))
      .cache() // per-type finish + the union merge
    finishGrouped(grouped).unionByName(finishGrouped(
      grouped.groupBy("bucket").agg(max(col("m_j")).as("m_j"))
        .withColumn("event_type", lit("__union__"))))
  }

  val sketchHllGroupsSql: String = {
    val lnCase = (1 to HLL_M).map(v =>
      s"WHEN $v THEN CAST(${hllLnTab(v - 1)} AS DOUBLE)").mkString(" ")
    s"""WITH hx AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
       |hb AS (SELECT event_type, CAST('0x' || substr(hx, 1, 2) AS BIGINT) % $HLL_M AS bucket,
       |              CAST('0x' || substr(hx, 3, 12) AS BIGINT) AS w FROM hx),
       |hr AS (SELECT event_type, bucket, CASE WHEN w = 0 THEN 49
       |         ELSE 49 - length(bin(w)) END AS rho FROM hb),
       |regs AS (SELECT event_type, bucket, MAX(rho) AS m_j FROM hr GROUP BY 1, 2),
       |allregs AS (
       |  SELECT event_type, bucket, m_j FROM regs
       |  UNION ALL
       |  SELECT '__union__' AS event_type, bucket, MAX(m_j) AS m_j FROM regs GROUP BY bucket),
       |ag AS (SELECT event_type, COUNT(*) AS nb,
       |  SUM(CAST(1 AS BIGINT) << CAST(49 - m_j AS INT)) AS sp,
       |  SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS zp FROM allregs GROUP BY event_type),
       |f AS (SELECT event_type, sp + ($HLL_M - nb) * (CAST(1 AS BIGINT) << 49) AS s_sum,
       |             zp + ($HLL_M - nb) AS zeros FROM ag),
       |r AS (SELECT event_type, s_sum, zeros,
       |  CAST(0.709 AS DOUBLE) * 4096 * $POW49 / s_sum AS raw FROM f)
       |SELECT event_type, CAST(s_sum AS BIGINT) AS reg_sum, CAST(zeros AS BIGINT) AS zeros,
       |  round(CASE WHEN raw <= 160.0 AND zeros > 0
       |    THEN CASE zeros $lnCase END ELSE raw END, 6) AS est_distinct
       |FROM r""".stripMargin
  }

  /** HLL INTERSECTION by inclusion–exclusion (r13 — the audience-
    * overlap question answered from REGISTER VECTORS alone: |A∩B| ≈
    * est(A) + est(B) − est(A∪B), where the union sketch is the
    * bucketwise MAX of the two register vectors — the HLL union law,
    * so the whole estimate costs 3×64 register rows of math, no
    * rescan): the KMV twin ([[sketchKmvIntersect]]) ships k hashes,
    * this ships 64 registers — the trade every sketch library
    * documents (HLL unions exactly, KMV intersects more accurately).
    * All register sums exact BIGINT; the small-range branch reads the
    * shared literal table; exact intersection rides along. */
  def sketchHllIntersect: Q = (s, dir) => {
    val lnCase = (1 to HLL_M).map(v =>
      s"WHEN $v THEN CAST(${hllLnTab(v - 1)} AS DOUBLE)").mkString(" ")
    val ev = events(s, dir).filter(col("event_type").isin("click", "view"))
    val regs = ev
      .select(col("event_type"), md5(col("user_id").cast(StringType)).as("hx"))
      .select(col("event_type"),
        (conv(substring(col("hx"), 1, 2), 16, 10).cast(LongType) % HLL_M).as("bucket"),
        conv(substring(col("hx"), 3, 12), 16, 10).cast(LongType).as("w"))
      .select(col("event_type"), col("bucket"), when(col("w") === 0, lit(49L))
        .otherwise(lit(49L) - length(conv(col("w").cast(StringType), 10, 2)).cast(LongType))
        .as("rho"))
      .groupBy("event_type", "bucket").agg(max(col("rho")).as("m_j"))
      .cache() // two per-set finishes + the union merge
    val all = regs.unionByName(
      regs.groupBy("bucket").agg(max(col("m_j")).as("m_j"))
        .withColumn("event_type", lit("__union__")))
    val ests = all.groupBy("event_type")
      .agg(count(lit(1)).as("nb"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - m_j AS INT))")).as("sp"),
        sum(when(col("m_j") === 0, 1L).otherwise(0L)).as("zp"))
      .select(col("event_type"),
        (col("sp") + (lit(HLL_M.toLong) - col("nb")) * lit(1L << 49)).as("s_sum"),
        (col("zp") + (lit(HLL_M.toLong) - col("nb"))).as("zeros"))
      .withColumn("raw", expr(s"CAST(0.709 AS DOUBLE) * 4096 * $POW49 / s_sum"))
      .withColumn("est", round(expr(
        s"CASE WHEN raw <= 160.0 AND zeros > 0 THEN CASE zeros $lnCase END ELSE raw END"), 6))
    val exact = ev
      .select("user_id", "event_type").distinct()
      .groupBy("user_id").agg(count(lit(1)).as("nt"))
      .filter(col("nt") === 2)
      .agg(count(lit(1)).as("exact_intersect"))
    ests.agg(
      max(when(col("event_type") === "click", col("est"))).as("est_a"),
      max(when(col("event_type") === "view", col("est"))).as("est_b"),
      max(when(col("event_type") === "__union__", col("est"))).as("est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 6).as("est_intersect"))
      .crossJoin(exact)
  }

  val sketchHllIntersectSql: String = {
    val lnCase = (1 to HLL_M).map(v =>
      s"WHEN $v THEN CAST(${hllLnTab(v - 1)} AS DOUBLE)").mkString(" ")
    s"""WITH ev AS (SELECT user_id, event_type FROM events
       |            WHERE event_type IN ('click', 'view')),
       |hx AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM ev),
       |hb AS (SELECT event_type, CAST('0x' || substr(hx, 1, 2) AS BIGINT) % $HLL_M AS bucket,
       |              CAST('0x' || substr(hx, 3, 12) AS BIGINT) AS w FROM hx),
       |hr AS (SELECT event_type, bucket, CASE WHEN w = 0 THEN 49
       |         ELSE 49 - length(bin(w)) END AS rho FROM hb),
       |regs AS (SELECT event_type, bucket, MAX(rho) AS m_j FROM hr GROUP BY 1, 2),
       |allregs AS (
       |  SELECT event_type, bucket, m_j FROM regs
       |  UNION ALL
       |  SELECT '__union__' AS event_type, bucket, MAX(m_j) AS m_j FROM regs GROUP BY bucket),
       |ag AS (SELECT event_type, COUNT(*) AS nb,
       |  SUM(CAST(1 AS BIGINT) << CAST(49 - m_j AS INT)) AS sp,
       |  SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS zp FROM allregs GROUP BY event_type),
       |f AS (SELECT event_type, sp + ($HLL_M - nb) * (CAST(1 AS BIGINT) << 49) AS s_sum,
       |             zp + ($HLL_M - nb) AS zeros FROM ag),
       |r AS (SELECT event_type, s_sum, zeros,
       |  CAST(0.709 AS DOUBLE) * 4096 * $POW49 / s_sum AS raw FROM f),
       |e2 AS (SELECT event_type,
       |  round(CASE WHEN raw <= 160.0 AND zeros > 0
       |    THEN CASE zeros $lnCase END ELSE raw END, 6) AS est FROM r),
       |p AS (SELECT
       |  MAX(CASE WHEN event_type = 'click' THEN est END) AS est_a,
       |  MAX(CASE WHEN event_type = 'view' THEN est END) AS est_b,
       |  MAX(CASE WHEN event_type = '__union__' THEN est END) AS est_union
       |  FROM e2),
       |ex AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersect FROM (
       |    SELECT user_id FROM (SELECT DISTINCT user_id, event_type FROM ev) t
       |    GROUP BY user_id HAVING COUNT(*) = 2))
       |SELECT est_a, est_b, est_union,
       |  round(est_a + est_b - est_union, 6) AS est_intersect, exact_intersect
       |FROM p CROSS JOIN ex""".stripMargin
  }

  def sketchHll: Q = (s, dir) => {
    val ev = events(s, dir).cache()
    // mergeability: the same register vector must re-derive from
    // per-shard sub-sketches merged by MAX — computed here and pinned
    // equal in the hashed row
    val merged = hllRegsOf(ev.repartition(8, col("event_type")))
      .union(hllRegsOf(ev.filter(col("event_type") === "click")))
      .groupBy("bucket").agg(max(col("m_j")).as("m_j"))
    hllFinish(hllRegsOf(ev))
      .crossJoin(broadcast(hllSums(merged).select(col("s_sum").as("s2"))))
      .select(col("reg_sum"), col("zeros"), col("est_distinct"),
        (col("reg_sum") === col("s2")).as("merge_exact"))
  }

  /** Streaming twin: the register vector IS the streaming state — a
    * plain 64-key max aggregate over the event stream, no distinct
    * shuffle, then the identical finishing arithmetic; shares the
    * batch key's register/estimate math so the oracle differs only by
    * the absent merge column. */
  def streamHll: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/events.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "hll", dir, "events.parquet") { stageDir =>
      val regs = hllRegsOf(s.readStream.schema(sch).parquet(stageDir))
      graft.streaming.StreamStage.drain(s, "hll")(regs.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_hll"))
    }
    hllFinish(s.table("graft_stream_hll"))
  }

  val streamHllSql: String = {
    val lnCase = (1 to HLL_M).map(v =>
      s"WHEN $v THEN CAST(${hllLnTab(v - 1)} AS DOUBLE)").mkString(" ")
    s"""WITH hx AS (SELECT md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
       |hb AS (SELECT CAST('0x' || substr(hx, 1, 2) AS BIGINT) % $HLL_M AS bucket,
       |              CAST('0x' || substr(hx, 3, 12) AS BIGINT) AS w FROM hx),
       |hr AS (SELECT bucket, CASE WHEN w = 0 THEN 49
       |         ELSE 49 - length(bin(w)) END AS rho FROM hb),
       |regs AS (SELECT bucket, MAX(rho) AS m_j FROM hr GROUP BY bucket),
       |ag AS (SELECT COUNT(*) AS nb,
       |  SUM(CAST(1 AS BIGINT) << CAST(49 - m_j AS INT)) AS sp,
       |  SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS zp FROM regs),
       |f AS (SELECT sp + ($HLL_M - nb) * (CAST(1 AS BIGINT) << 49) AS s_sum,
       |             zp + ($HLL_M - nb) AS zeros FROM ag),
       |r AS (SELECT s_sum, zeros,
       |  CAST(0.709 AS DOUBLE) * 4096 * $POW49 / s_sum AS raw FROM f)
       |SELECT CAST(s_sum AS BIGINT) AS reg_sum, CAST(zeros AS BIGINT) AS zeros,
       |  round(CASE WHEN raw <= 160.0 AND zeros > 0
       |    THEN CASE zeros $lnCase END ELSE raw END, 6) AS est_distinct
       |FROM r""".stripMargin
  }

  val sketchHllSql: String = {
    val lnCase = (1 to HLL_M).map(v =>
      s"WHEN $v THEN CAST(${hllLnTab(v - 1)} AS DOUBLE)").mkString(" ")
    s"""WITH hx AS (SELECT md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
       |hb AS (SELECT CAST('0x' || substr(hx, 1, 2) AS BIGINT) % $HLL_M AS bucket,
       |              CAST('0x' || substr(hx, 3, 12) AS BIGINT) AS w FROM hx),
       |hr AS (SELECT bucket, CASE WHEN w = 0 THEN 49
       |         ELSE 49 - length(bin(w)) END AS rho FROM hb),
       |regs AS (SELECT bucket, MAX(rho) AS m_j FROM hr GROUP BY bucket),
       |ag AS (SELECT COUNT(*) AS nb,
       |  SUM(CAST(1 AS BIGINT) << CAST(49 - m_j AS INT)) AS sp,
       |  SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS zp FROM regs),
       |f AS (SELECT sp + ($HLL_M - nb) * (CAST(1 AS BIGINT) << 49) AS s_sum,
       |             zp + ($HLL_M - nb) AS zeros FROM ag),
       |r AS (SELECT s_sum, zeros,
       |  CAST(0.709 AS DOUBLE) * 4096 * $POW49 / s_sum AS raw FROM f)
       |SELECT CAST(s_sum AS BIGINT) AS reg_sum, CAST(zeros AS BIGINT) AS zeros,
       |  round(CASE WHEN raw <= 160.0 AND zeros > 0
       |    THEN CASE zeros $lnCase END ELSE raw END, 6) AS est_distinct,
       |  TRUE AS merge_exact
       |FROM r""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "sketch_hll" -> sketchHll,
    "sketch_hll_groups" -> sketchHllGroups,
    "stream_hll" -> streamHll,
    "stream_quantile_histogram" -> streamQuantileHistogram,
    "sketch_kmv_intersect" -> sketchKmvIntersect,
    "sketch_bucket_min" -> sketchBucketMin,
    "stream_kmv" -> streamKmv,
    "sketch_cms" -> sketchCms,
    "stream_cms" -> streamCms,
    "stream_heavy_hitters" -> streamHeavyHitters,
    "sketch_kmv_distinct" -> sketchKmvDistinct,
    "sketch_kmv_merge" -> sketchKmvMerge,
    "sketch_kmv_diff" -> sketchKmvDiff,
    "sketch_hll_intersect" -> sketchHllIntersect,
    "sketch_quantile" -> sketchQuantile,
    "sketch_histogram_quantile" -> sketchHistogramQuantile)
  val oracles: Map[String, String] = Map(
    "sketch_hll" -> sketchHllSql,
    "sketch_hll_groups" -> sketchHllGroupsSql,
    "stream_hll" -> streamHllSql,
    "stream_quantile_histogram" -> streamQuantileHistogramSql,
    "sketch_kmv_intersect" -> sketchKmvIntersectSql,
    "sketch_bucket_min" -> sketchBucketMinSql,
    "stream_kmv" -> sketchBucketMinSql, // identical output to the batch build
    "sketch_cms" -> sketchCmsSql,
    "stream_cms" -> sketchCmsSql, // identical output to the batch build
    "stream_heavy_hitters" -> streamHeavyHittersSql,

    "sketch_kmv_distinct" -> sketchKmvDistinctSql,
    "sketch_kmv_merge" -> sketchKmvMergeSql,
    "sketch_kmv_diff" -> sketchKmvDiffSql,
    "sketch_hll_intersect" -> sketchHllIntersectSql,
    "sketch_quantile" -> sketchQuantileSql,
    "sketch_histogram_quantile" -> sketchHistogramQuantileSql)
}
