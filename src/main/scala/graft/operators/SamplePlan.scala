package graft.operators

import graft.Tables._
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Write-side quality partitioning and the composed per-source ×
  * per-decile sampling plan (SURVEY.md §2C) — the two operators that
  * turn the quality/mixing SIGNALS (quality deciles, temperature mix
  * weights) into physical ACTIONS: a bucketed file layout and a
  * deterministic sample selection.
  */
object SamplePlan {

  type Q = (SparkSession, String) => DataFrame

  private def scratch(s: SparkSession, dir: String, tag: String): String =
    s"/tmp/graft_plan/${s.sparkContext.applicationId}/" +
      dir.replaceAll("[^A-Za-z0-9.]", "_") + s"/$tag"

  /** Equi-depth quality repartitioner (the WRITE side of
    * pipeline_quality_buckets): documents are bucketed by the
    * histogram-estimated decile boundaries (broadcast 9-element
    * vector, map-side array scan — no global sort, unlike
    * `repartitionByRange` whose sampling pass is nondeterministic),
    * shuffled once on the bucket key, and written
    * `partitionBy("bucket")` so each quality decile lands in its own
    * directory of roughly n/10 docs. Downstream curriculum readers
    * then get partition PRUNING for quality-range scans ("read only
    * deciles ≥ 7") instead of a full-corpus filter — the file-layout
    * analogue of predicate pushdown, and the reason to bucket at
    * write time at 100 TB. The gate re-reads the written layout and
    * aggregates per bucket, proving the roundtrip lossless (oracle =
    * the pure-query decile aggregation). */
  def pipelinePartitionQuality: Q = (s, dir) => {
    val docs = TextOps.qualityDocs(s, dir).cache() // stats + histogram + assignment
    val assigned = docs.crossJoin(broadcast(TextOps.decileBounds(docs)))
      .withColumn("bucket", expr("CAST(size(filter(bs, b -> b <= score)) AS BIGINT)"))
      .select(col("doc_id"), col("source"), col("n_words"), col("score"), col("bucket"))
    val out = scratch(s, dir, "pquality")
    assigned.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(out)
    s.read.parquet(out)
      .groupBy(col("bucket").cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"),
        sum(col("n_words")).as("total_words"))
      .select(col("bucket"), col("n_docs"), col("min_score"), col("max_score"),
        col("total_words"))
  }

  // DuckDB cannot see the partitioned files Spark wrote, so the oracle
  // is the pure-query decile aggregation — byte-identical output proves
  // the write+read roundtrip lost nothing.
  val pipelinePartitionQualitySql: String = TextOps.pipelineQualityBucketsSql

  /** Decimal-exact composed sampling plan: temperature mix weights
    * (per SOURCE, [[PipelineKeepList.pipelineMixWeights]]'s α = 0.5
    * device) × quality-decile keep rates (per DECILE, b/10) → one
    * selection probability per (source, decile) cell, applied with
    * the RNG-free md5-threshold sampler. All arithmetic that decides
    * membership is INTEGER: the source weight is quantized to ppm
    * (wq = sqf ÷ (den ÷ 10⁶), the same floor-quantized α-power terms
    * as mix_weights), and doc_id is kept iff
    * h32·10⁷ < wq·bucket·2³² where h32 is the first 8 md5 hex chars —
    * a BIGINT comparison with no float rounding anywhere, so both
    * engines materialize the identical sample SET (the gate checks
    * selected counts per cell against the integer target
    * n·wq·b ÷ 10⁷). Scale shape: two tiny broadcast aggregates
    * (per-source masses, the ppm weights) and one broadcast boundary
    * vector; everything corpus-sized is map-side until the final
    * (source, bucket) partial agg. */
  def pipelineSamplePlan: Q = (s, dir) => {
    val docs = TextOps.qualityDocs(s, dir).cache()
    val assigned = docs.crossJoin(broadcast(TextOps.decileBounds(docs)))
      .withColumn("bucket", expr("CAST(size(filter(bs, b -> b <= score)) AS BIGINT)"))
    // token masses need only (source, n_words) — derive them from the
    // cached docs base, NOT from `assigned`, so the decile machinery
    // is not replayed inside the broadcast weight branch
    val tok = docs.groupBy("source").agg(sum(col("n_words")).as("n_tokens"))
    val tot = tok.agg(sum(col("n_tokens")).as("tot"))
    val sh = tok.crossJoin(broadcast(tot))
      .withColumn("sqf",
        expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e15) AS BIGINT)"))
    val den = sh.agg(sum(col("sqf")).as("den"))
    val wq = sh.crossJoin(broadcast(den))
      .select(col("source"), expr("sqf div (den div 1000000)").as("wq"))
    assigned.join(broadcast(wq), "source")
      .withColumn("h32",
        graft.functions.HashExpressions.md5_head(concat(lit("sp:"), col("doc_id").cast("string")), 8))
      .withColumn("selected", expr("h32 * 10000000 < wq * bucket * 4294967296"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), max(col("wq")).as("wq"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("selected_n"))
      .select(col("source"), col("bucket"), col("n_docs"), col("wq"),
        expr("(n_docs * wq * bucket) div 10000000").as("target_n"),
        col("selected_n"))
  }

  val pipelineSamplePlanSql: String = {
    val stop = Seq("the", "a", "of", "and", "in", "to", "is", "on")
      .map(w => s"'$w'").mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, source, n_words,
       |    least(n_words / 50.0, 1.0) * 0.4
       |      + (n_stop / n_words) * 0.3
       |      + least(((length(text) - (n_words - 1)) / n_words) / 8.0, 1.0) * 0.3 AS score
       |  FROM (
       |    SELECT doc_id, source, text,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |      CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stop))) AS BIGINT) AS n_stop
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
       |  SELECT docs.doc_id, docs.source, docs.n_words,
       |    CAST(len(list_filter(bs.bs, bb -> bb <= docs.score)) AS BIGINT) AS bucket
       |  FROM docs CROSS JOIN bs),
       |tok AS (SELECT source, CAST(SUM(n_words) AS BIGINT) AS n_tokens
       |        FROM docs GROUP BY source),
       |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM tok),
       |sh AS (SELECT source,
       |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e15) AS BIGINT) AS sqf
       |       FROM tok CROSS JOIN tot),
       |den AS (SELECT CAST(SUM(sqf) AS BIGINT) AS den FROM sh),
       |wq AS (SELECT source, CAST(sqf // (den // 1000000) AS BIGINT) AS wq
       |       FROM sh CROSS JOIN den),
       |seld AS (
       |  SELECT a.source, a.bucket, w.wq,
       |    CAST('0x' || substr(md5('sp:' || CAST(a.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
       |      * 10000000 < w.wq * a.bucket * 4294967296 AS selected
       |  FROM assigned a JOIN wq w USING (source))
       |SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(MAX(wq) AS BIGINT) AS wq,
       |  CAST(COUNT(*) * MAX(wq) * bucket // 10000000 AS BIGINT) AS target_n,
       |  CAST(SUM(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT) AS selected_n
       |FROM seld
       |GROUP BY source, bucket""".stripMargin
  }

  private val SHARDS = 1000L

  /** Largest-remainder token-budget allocation: turn the ppm mix
    * weights into an EXACT integer division of a shard budget
    * (Σ alloc = budget, always — floor-only allocation leaves shards
    * on the table, naive rounding overshoots). base_i =
    * S·wq_i div 10⁶; the leftover L = S − Σ base goes one shard each
    * to the L sources with the largest remainder (ties by source
    * name) — Hamilton's method, all BIGINT. The ranking window runs
    * over n_sources rows (already reduced from the corpus by the
    * token-mass aggregate), so the "global window" is metadata-sized
    * — the corpus itself never sees a window. */
  def pipelineTokenBudget: Q = (s, dir) => {
    val tok = t(s, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast(LongType).as("ntok"))
      .groupBy("source").agg(sum(col("ntok")).as("n_tokens"))
    val tot = tok.agg(sum(col("n_tokens")).as("tot"))
    val sh = tok.crossJoin(broadcast(tot))
      .withColumn("sqf",
        expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e15) AS BIGINT)"))
    val den = sh.agg(sum(col("sqf")).as("den"))
    val wq = sh.crossJoin(broadcast(den))
      .select(col("source"), col("n_tokens"), expr("sqf div (den div 1000000)").as("wq"))
    val alloc = wq
      .withColumn("base", expr(s"($SHARDS * wq) div 1000000"))
      .withColumn("rem", expr(s"($SHARDS * wq) % 1000000"))
    val baseSum = alloc.agg(sum(col("base")).as("base_sum"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source").asc)
    alloc.crossJoin(broadcast(baseSum))
      .withColumn("rk", row_number().over(w))
      .withColumn("extra",
        when(col("rk") <= lit(SHARDS) - col("base_sum"), 1L).otherwise(0L))
      .select(col("source"), col("n_tokens"), col("wq"), col("base"), col("rem"),
        col("extra"), (col("base") + col("extra")).as("alloc_shards"))
  }

  val pipelineTokenBudgetSql: String =
    s"""WITH tok AS (
       |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM tok),
       |sh AS (SELECT source, n_tokens,
       |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e15) AS BIGINT) AS sqf
       |       FROM tok CROSS JOIN tot),
       |den AS (SELECT CAST(SUM(sqf) AS BIGINT) AS den FROM sh),
       |wq AS (SELECT source, n_tokens, CAST(sqf // (den // 1000000) AS BIGINT) AS wq
       |       FROM sh CROSS JOIN den),
       |alloc AS (SELECT source, n_tokens, wq,
       |            CAST(($SHARDS * wq) // 1000000 AS BIGINT) AS base,
       |            CAST(($SHARDS * wq) % 1000000 AS BIGINT) AS rem
       |          FROM wq),
       |bs AS (SELECT CAST(SUM(base) AS BIGINT) AS base_sum FROM alloc),
       |rk AS (SELECT alloc.*, bs.base_sum,
       |         row_number() OVER (ORDER BY rem DESC, source) AS rk
       |       FROM alloc CROSS JOIN bs)
       |SELECT source, n_tokens, wq, base, rem,
       |  CAST(CASE WHEN rk <= $SHARDS - base_sum THEN 1 ELSE 0 END AS BIGINT) AS extra,
       |  CAST(base + CASE WHEN rk <= $SHARDS - base_sum THEN 1 ELSE 0 END AS BIGINT)
       |    AS alloc_shards
       |FROM rk""".stripMargin

  /** Reproducible interleaved training order WITHOUT a global sort
    * (epoch shuffling for pretraining): each doc gets a deterministic
    * per-source ordinal (md5-ordered window, PARTITIONED by source —
    * parallel per shard), and the global position is the round-robin
    * formula pos = (ord−1)·n_sources + src_idx. The total order
    * exists as a computed KEY, so readers range-scan or seek by pos
    * with nothing ever funneled through one task; sources interleave
    * 1:1, which is the α=1 uniform special case of the mix-weight
    * schedule (weighted interleave = repeat a source's slot
    * alloc_shards times — pipeline_token_budget's output plugs in
    * directly). The gate checks the head of the order
    * (TakeOrderedAndProject — bounded) plus per-source position
    * stats, so a single misplaced document moves a gated number. */
  /** The interleaved train-order position computation shared by
    * [[pipelineTrainOrder]] and [[pipelineResume]]: per-source salted-
    * hash rank striped across sources — pos is a COMPUTED key, never a
    * materialized global sort. */
  private def trainOrderPositioned(s: SparkSession, dir: String): DataFrame = {
    val srcIdx = t(s, dir, "documents").select("source").distinct()
      .withColumn("src_idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("source")).cast(LongType))
    val nSrc = srcIdx.agg(count(lit(1)).as("n_sources"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(md5(concat(lit("ord:"), col("doc_id").cast(StringType))), col("doc_id"))
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      .join(broadcast(srcIdx), "source")
      .crossJoin(broadcast(nSrc))
      .withColumn("ord", row_number().over(w).cast(LongType))
      .withColumn("pos", (col("ord") - 1L) * col("n_sources") + col("src_idx") - 1L)
  }

  def pipelineTrainOrder: Q = (s, dir) => {
    val positioned = trainOrderPositioned(s, dir)
    val head = positioned.orderBy("pos").limit(20)
      .select(col("pos"), col("source"), col("doc_id"))
    // summary rows share the head's schema: pos = -1 marks them, and
    // the count/min/max triple is packed into the doc_id column so one
    // gated result covers both the order's head and its global shape
    val stats = positioned.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), min(col("pos")).as("min_pos"),
        max(col("pos")).as("max_pos"))
      .select(lit(-1L).as("pos"), col("source"),
        (col("n_docs") * 1000000L + col("min_pos") * 1000L + col("max_pos") % 1000L)
          .as("doc_id"))
    head.unionByName(stats)
  }

  val pipelineTrainOrderSql: String =
    """WITH srcs AS (
      |  SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS src_idx
      |  FROM (SELECT DISTINCT source FROM documents)),
      |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources FROM srcs),
      |pos AS (
      |  SELECT d.doc_id, d.source,
      |    (CAST(row_number() OVER (PARTITION BY d.source
      |       ORDER BY md5('ord:' || CAST(d.doc_id AS VARCHAR)), d.doc_id) AS BIGINT) - 1)
      |      * ns.n_sources + s.src_idx - 1 AS pos
      |  FROM documents d JOIN srcs s USING (source) CROSS JOIN ns)
      |SELECT pos, source, doc_id FROM (
      |  SELECT pos, source, doc_id FROM pos ORDER BY pos LIMIT 20)
      |UNION ALL
      |SELECT CAST(-1 AS BIGINT) AS pos, source,
      |  CAST(COUNT(*) * 1000000 + MIN(pos) * 1000 + MAX(pos) % 1000 AS BIGINT) AS doc_id
      |FROM pos GROUP BY source""".stripMargin

  /** CHECKPOINT RESUME of the interleaved train order (the "restart at
    * step S" device every long pretraining run needs): because the
    * [[trainOrderPositioned]] position is a computed key, resuming is
    * a pure FILTER `pos >= S` — no state replay, no re-walk of the
    * consumed prefix, and at 100 TB the skipped prefix's documents are
    * never read past their key columns. Output: the next 20 scheduled
    * documents after step 100 plus per-source remaining counts (the
    * progress ledger a resume writes back). */
  def pipelineResume: Q = (s, dir) => {
    val S = 100L
    val rem = trainOrderPositioned(s, dir).filter(col("pos") >= S)
    val head = rem.orderBy("pos").limit(20)
      .select(col("pos"), col("source"), col("doc_id"))
    val stats = rem.groupBy("source")
      .agg(count(lit(1)).as("n_rem"), min(col("pos")).as("min_pos"))
      .select(lit(-1L).as("pos"), col("source"),
        (col("n_rem") * 1000000L + col("min_pos") % 1000000L).as("doc_id"))
    head.unionByName(stats)
  }

  val pipelineResumeSql: String =
    """WITH srcs AS (
      |  SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS src_idx
      |  FROM (SELECT DISTINCT source FROM documents)),
      |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources FROM srcs),
      |pos AS (
      |  SELECT d.doc_id, d.source,
      |    (CAST(row_number() OVER (PARTITION BY d.source
      |       ORDER BY md5('ord:' || CAST(d.doc_id AS VARCHAR)), d.doc_id) AS BIGINT) - 1)
      |      * ns.n_sources + s.src_idx - 1 AS pos
      |  FROM documents d JOIN srcs s USING (source) CROSS JOIN ns),
      |rem AS (SELECT * FROM pos WHERE pos >= 100)
      |SELECT pos, source, doc_id FROM (
      |  SELECT pos, source, doc_id FROM rem ORDER BY pos LIMIT 20)
      |UNION ALL
      |SELECT CAST(-1 AS BIGINT) AS pos, source,
      |  CAST(COUNT(*) * 1000000 + MIN(pos) % 1000000 AS BIGINT) AS doc_id
      |FROM rem GROUP BY source""".stripMargin

  /** PER-EPOCH deterministic reshuffle (the multi-epoch data-order
    * device: each epoch must see the corpus in a different but
    * REPRODUCIBLE order, with no RNG state to checkpoint): epoch e's
    * order key is md5("ep{e}:" ++ doc_id) — pure map-side, so epoch
    * orders cost nothing until consumed, and any shard of any epoch
    * can be regenerated independently (the elastic-training property).
    * Gated output per epoch: the first 10 documents (a bounded
    * TakeOrdered, proving the order itself) plus 256 hash-prefix
    * bucket counts (proving the corpus-wide assignment without a
    * global sort). */
  def pipelineEpochReshuffle: Q = (s, dir) => {
    val docs = t(s, dir, "documents").select(col("doc_id"))
    (0 until 3).map { e =>
      val ekey = md5(concat(lit(s"ep$e:"), col("doc_id").cast(StringType)))
      val head = docs.withColumn("ekey", ekey)
        .orderBy("ekey", "doc_id").limit(10)
        .select(lit(e.toLong).as("epoch"), col("ekey"), col("doc_id"))
      val buckets = docs.withColumn("b", substring(ekey, 1, 2))
        .groupBy("b").agg(count(lit(1)).as("n"))
        .select(lit(e.toLong).as("epoch"),
          concat(lit("bucket:"), col("b")).as("ekey"), col("n").as("doc_id"))
      head.unionByName(buckets)
    }.reduce(_ unionByName _)
  }

  val pipelineEpochReshuffleSql: String = {
    val parts = (0 until 3).map { e =>
      s"""SELECT epoch, ekey, doc_id FROM (
         |  SELECT CAST($e AS BIGINT) AS epoch,
         |    md5('ep$e:' || CAST(doc_id AS VARCHAR)) AS ekey, doc_id
         |  FROM documents ORDER BY ekey, doc_id LIMIT 10)
         |UNION ALL
         |SELECT CAST($e AS BIGINT) AS epoch,
         |  'bucket:' || substr(md5('ep$e:' || CAST(doc_id AS VARCHAR)), 1, 2) AS ekey,
         |  CAST(COUNT(*) AS BIGINT) AS doc_id
         |FROM documents
         |GROUP BY substr(md5('ep$e:' || CAST(doc_id AS VARCHAR)), 1, 2)""".stripMargin
    }
    parts.mkString("\nUNION ALL\n")
  }

  /** WEIGHTED training order — stride scheduling over the
    * [[pipelineTokenBudget]] allocations (the full curriculum
    * scheduler): source s with a_s of the 1000 shards appears a_s/1000
    * of the time, interleaved evenly, via the classic stride key
    * pos_key = (ord·10⁶ div a_s)·1000 + src_idx — a source's k-th doc
    * schedules at pass k/a_s, so twice the allocation means twice the
    * frequency at perfectly regular spacing. Like
    * [[pipelineTrainOrder]], the total order is a map-side computed
    * KEY (all BIGINT — ord·10⁶ before the integer division keeps the
    * stride exact), never a materialized global sort; zero-allocation
    * sources fall to the end of every pass via the greatest(a,1)
    * guard rather than dividing by zero. */
  def pipelineTrainOrderWeighted: Q = (s, dir) => {
    val alloc = pipelineTokenBudget(s, dir).select(col("source"), col("alloc_shards"))
    val srcIdx = t(s, dir, "documents").select("source").distinct()
      .withColumn("src_idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("source")).cast(LongType))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(md5(concat(lit("ord:"), col("doc_id").cast(StringType))), col("doc_id"))
    val positioned = t(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      .join(broadcast(alloc), "source")
      .join(broadcast(srcIdx), "source")
      .withColumn("ord", row_number().over(w).cast(LongType))
      .withColumn("pos_key",
        expr("(ord * 1000000 div greatest(alloc_shards, 1)) * 1000 + src_idx"))
    val head = positioned.orderBy("pos_key").limit(20)
      .select(col("pos_key"), col("source"), col("doc_id"))
    val stats = positioned.groupBy("source")
      .agg(count(lit(1)).as("n")) // summary rows: pos_key = -1, doc_id = count
      .select(lit(-1L).as("pos_key"), col("source"), col("n").as("doc_id"))
    head.unionByName(stats)
  }

  val pipelineTrainOrderWeightedSql: String =
    s"""WITH tb AS ($pipelineTokenBudgetSql),
       |srcs AS (
       |  SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS src_idx
       |  FROM (SELECT DISTINCT source FROM documents)),
       |pk AS (
       |  SELECT d.doc_id, d.source,
       |    (CAST(row_number() OVER (PARTITION BY d.source
       |       ORDER BY md5('ord:' || CAST(d.doc_id AS VARCHAR)), d.doc_id) AS BIGINT)
       |       * 1000000 // greatest(tb.alloc_shards, 1)) * 1000 + s.src_idx AS pos_key
       |  FROM documents d
       |  JOIN tb USING (source)
       |  JOIN srcs s USING (source))
       |SELECT pos_key, source, doc_id FROM (
       |  SELECT pos_key, source, doc_id FROM pk ORDER BY pos_key LIMIT 20)
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT) AS pos_key, source, CAST(COUNT(*) AS BIGINT) AS doc_id
       |FROM pk GROUP BY source""".stripMargin

  private val AES_K = 100

  /** Fixed-size weighted sample without replacement — Efraimidis–
    * Spirakis A-ES (Inf. Proc. Letters 97(5), 2006): each doc gets
    * key u^(1/w) for uniform u and weight w, and the K largest keys
    * are EXACTLY a weighted sample without replacement. Every
    * existing sampler here is RATE-based (md5-threshold → binomial
    * size); release pipelines also need the dual — "exactly K docs,
    * longer docs proportionally more likely" (human-eval draws,
    * seed-corpus picks, dashboard panels). Equivalent ordering:
    * maximize ln(u)/w, i.e. minimize −ln(u)/w, so the decision
    * arithmetic follows the house µnat device — u = (h60+1)/2⁶⁰ from
    * the first 15 md5 hex chars (RNG-free, the same salted-hash
    * uniform as every sampler in this file), lnq = round(1e6·ln u)
    * quantized ONCE, then cost = (−lnq)·10⁶ DIV w in pure BIGINT
    * (w = n_chars: char mass IS the weight). Both engines rank the
    * identical integer, ties broken by doc_id; the kept SET itself is
    * the gated output, row-for-row.
    *
    * Scale shape: one map-side projection (hash, ln, integer div —
    * all codegen'd) and a TakeOrderedAndProject: each partition keeps
    * its local top-K (bounded heap, no sort, no window, no shuffle of
    * corpus payload) and the driver merges 32·K slim rows. At 100 TB
    * this is the textbook distributed-top-K — the ONLY corpus-wide
    * movement is K rows per partition. */
  /** The A-ES decision arithmetic, shared verbatim by the batch key
    * and the streaming reservoir twin (one projection — the two
    * cannot drift). Input needs (doc_id, n_chars > 0). */
  private def aesCost(df: DataFrame): DataFrame =
    df.withColumn("h60",
        graft.functions.HashExpressions.md5_head(concat(lit("aes:"), col("doc_id").cast("string")), 15))
      .withColumn("lnq",
        expr("CAST(round(1e6 * ln(CAST(h60 + 1 AS DOUBLE) / 1152921504606846976.0)) AS BIGINT)"))
      .withColumn("aes_cost", expr("((-lnq) * 1000000) div n_chars"))

  def pipelineSampleWeighted: Q = (s, dir) => {
    aesCost(t(s, dir, "documents")
      .filter(col("n_chars") > 0L)
      .select(col("doc_id"), col("source"), col("n_chars")))
      .select(col("doc_id"), col("source"), col("n_chars"), col("aes_cost"))
      .orderBy(col("aes_cost").asc, col("doc_id").asc)
      .limit(AES_K)
  }

  private val AES_K_SRC = 10

  /** STRATIFIED fixed-size weighted sample — exactly [[AES_K_SRC]]
    * docs PER SOURCE, each source's draw weighted by char mass (the
    * per-domain dual of [[pipelineSampleWeighted]]'s global draw:
    * "10 representative docs from every domain" is the human-eval
    * and dataset-card panel every release cuts). A-ES applies
    * per-stratum unchanged — the K smallest costs WITHIN each source
    * are an exact weighted sample without replacement of that source.
    *
    * Scale shape: where the global key uses TakeOrderedAndProject,
    * the grouped version uses the house [[graft.functions.TopK]]
    * bounded aggregate under groupBy(source): each task folds its
    * docs into a ≤2K-entry buffer PER SOURCE map-side, so the shuffle
    * carries at most K rows per (task, source) — corpus-size-
    * independent — where a row_number window would shuffle EVERY doc
    * to its source's partition before ranking. Cost rides the sort
    * key negated (≤4.2e13 — exact in double); the kept set gates
    * row-for-row against the window-formulated oracle. */
  def pipelineSampleWeightedStratified: Q = (s, dir) => {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    aesCost(t(s, dir, "documents")
      .filter(col("n_chars") > 0L)
      .select(col("doc_id"), col("source"), col("n_chars")))
      .groupBy("source")
      .agg(graft.functions.TopK.topk(AES_K_SRC)(
        -col("aes_cost").cast(DoubleType), col("doc_id"),
        col("n_chars").cast(DoubleType)).as("top"))
      .select(col("source"), explode(col("top")).as("e"))
      .select(col("e._2").as("doc_id"), col("source"),
        col("e._3").cast(LongType).as("n_chars"),
        (-col("e._1")).cast(LongType).as("aes_cost"))
  }

  val pipelineSampleWeightedStratifiedSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, source, n_chars,
       |    CAST(round(1e6 * ln(CAST(CAST('0x' || substr(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1 AS DOUBLE)
       |      / 1152921504606846976.0)) AS BIGINT) AS lnq
       |  FROM documents WHERE n_chars > 0),
       |c AS (
       |  SELECT doc_id, source, n_chars, ((-lnq) * 1000000) // n_chars AS aes_cost,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ((-lnq) * 1000000) // n_chars ASC, doc_id ASC) AS rn
       |  FROM h)
       |SELECT doc_id, source, n_chars, aes_cost
       |FROM c WHERE rn <= $AES_K_SRC""".stripMargin

  /** STREAMING A-ES reservoir — the fixed-size weighted sample
    * maintained INLINE over an arriving doc stream, the posture
    * Efraimidis–Spirakis designed the algorithm for: because the
    * selection is "K smallest cost keys" and the cost is a pure
    * per-doc projection, the running sample is a K-bounded priority
    * buffer, NOT corpus state. Here that buffer is the house
    * [[graft.functions.TopK]] aggregate under a complete-mode global
    * agg: each micro-batch folds its docs into the ≤2K-entry partial
    * buffer map-side, merge keeps the best K — state is K rows
    * forever, regardless of how much stream has passed (contrast a
    * window/rank formulation, whose state would be every doc seen).
    * Drain, then hydrate the K winners' source labels with a
    * broadcast join against the documents table (K rows vs corpus —
    * the K side broadcasts; at 100 TB hydration is a K-row probe).
    * Cost rides the TopK sort key negated (≤4.2e13 — exact in
    * double), so stream == batch == oracle on the identical integer.
    * Gate: the SAME oracle SQL as [[pipelineSampleWeighted]] — the
    * streaming path must reproduce the batch kept SET row-for-row. */
  def streamSampleWeighted: Q = (s, dir) => {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "ssw", dir, "documents.parquet") { stageDir =>
      val costed = aesCost(
        s.readStream.schema(sch).parquet(stageDir)
          .filter(col("n_chars") > 0L)
          .select(col("doc_id"), col("n_chars")))
      val agg = costed.groupBy().agg(
        graft.functions.TopK.topk(AES_K)(
          -col("aes_cost").cast(DoubleType), col("doc_id"),
          col("n_chars").cast(DoubleType)).as("top"))
      graft.streaming.StreamStage.drain(s, "ssw")(agg.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_ssw"))
    }
    val kept = s.table("graft_stream_ssw")
      .select(explode(col("top")).as("e"))
      .select(col("e._2").as("doc_id"),
        col("e._3").cast(LongType).as("n_chars"),
        (-col("e._1")).cast(LongType).as("aes_cost"))
    broadcast(kept)
      .join(t(s, dir, "documents").select("doc_id", "source"), "doc_id")
      .select(col("doc_id"), col("source"), col("n_chars"), col("aes_cost"))
  }

  val pipelineSampleWeightedSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, source, n_chars,
       |    CAST(round(1e6 * ln(CAST(CAST('0x' || substr(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1 AS DOUBLE)
       |      / 1152921504606846976.0)) AS BIGINT) AS lnq
       |  FROM documents WHERE n_chars > 0)
       |SELECT doc_id, source, n_chars, ((-lnq) * 1000000) // n_chars AS aes_cost
       |FROM h
       |ORDER BY aes_cost ASC, doc_id ASC
       |LIMIT $AES_K""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipeline_resume" -> pipelineResume,
    "pipeline_epoch_reshuffle" -> pipelineEpochReshuffle,
    "pipeline_partition_quality" -> pipelinePartitionQuality,
    "pipeline_sample_plan" -> pipelineSamplePlan,
    "pipeline_sample_weighted" -> pipelineSampleWeighted,
    "pipeline_sample_weighted_stratified" -> pipelineSampleWeightedStratified,
    "stream_sample_weighted" -> streamSampleWeighted,
    "pipeline_token_budget" -> pipelineTokenBudget,
    "pipeline_train_order" -> pipelineTrainOrder,
    "pipeline_train_order_weighted" -> pipelineTrainOrderWeighted)
  val oracles: Map[String, String] = Map(
    "pipeline_resume" -> pipelineResumeSql,
    "pipeline_epoch_reshuffle" -> pipelineEpochReshuffleSql,
    "pipeline_partition_quality" -> pipelinePartitionQualitySql,
    "pipeline_sample_plan" -> pipelineSamplePlanSql,
    "pipeline_sample_weighted" -> pipelineSampleWeightedSql,
    "pipeline_sample_weighted_stratified" -> pipelineSampleWeightedStratifiedSql,
    "stream_sample_weighted" -> pipelineSampleWeightedSql,
    "pipeline_token_budget" -> pipelineTokenBudgetSql,
    "pipeline_train_order" -> pipelineTrainOrderSql,
    "pipeline_train_order_weighted" -> pipelineTrainOrderWeightedSql)
}
