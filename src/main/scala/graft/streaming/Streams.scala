package graft.streaming

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators (SURVEY.md §2D).
  *
  * Each operator is defined once against an unbounded DataFrame
  * (`readStream`-compatible: watermark + event-time semantics) and has
  * a batch twin in [[queries]] that the driver's DuckDB oracle checks.
  * StreamingSpec drives the streaming forms through a memory sink with
  * `processAllAvailable()`.
  *
  * Scale posture: all three are keyed-state operators — state is
  * partitioned by the grouping key across executors; watermarks bound
  * the window/dedup state, and the sessionizer's event-time timeout
  * (watermark-driven, so processAllAvailable cannot hang) clears idle
  * users, so it holds one small session buffer per *active* user, not
  * per event or per user ever seen.
  */
object Streams {

  type Q = (SparkSession, String) => DataFrame

  // -------------------------------------------------- streaming forms

  /** Tumbling 1-hour event-time window aggregation with a 10-minute
    * watermark. */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming dedup: first event per (user_id, event_type) within the
    * watermark horizon. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")

  case class Ev(user_id: Long, event_id: Long, us: Long, ts: java.sql.Timestamp)
  case class Session(user_id: Long, session_start_us: Long, n_events: Long)

  /** Gap-based sessionization (30-minute inactivity) via
    * flatMapGroupsWithState: per-user state holds only the open
    * session; closed sessions are emitted as they complete, and an
    * EVENT-TIME timeout flushes (and clears) each user's final open
    * session once the watermark passes last-event + gap — so state
    * stays bounded by the number of *active* users. Event-time (not
    * processing-time) timeouts matter twice over: they are replayable,
    * and they only fire on watermark advancement, so a drained source
    * quiesces instead of scheduling timer batches forever. */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = 1800L * 1000000L
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, evs: Iterator[Ev], state: GroupState[(Long, Long, Long)]) => {
          if (state.hasTimedOut) {
            // watermark passed last-event + gap: close the open session
            val out = state.getOption.map { case (start, _, n) => Session(user, start, n) }
            state.remove()
            out.iterator
          } else {
            // state = (sessionStartUs, lastUs, count)
            var st = state.getOption.getOrElse((-1L, -1L, 0L))
            val closed = Seq.newBuilder[Session]
            evs.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
              st match {
                case (-1L, _, _) => st = (e.us, e.us, 1L)
                case (start, last, n) if e.us - last > gapUs =>
                  closed += Session(user, start, n)
                  st = (e.us, e.us, 1L)
                case (start, _, n) => st = (start, e.us, n + 1L)
              }
            }
            state.update(st)
            val timeoutMs = st._2 / 1000L + 1800L * 1000L
            state.setTimeoutTimestamp(
              math.max(timeoutMs, state.getCurrentWatermarkMs() + 1))
            closed.result().iterator
          }
        })
  }

  /** Watermarked stream-stream interval join (view→click attribution
    * within 1 day): both sides carry watermarks and the join condition
    * bounds event time in BOTH directions, so Spark derives a state
    * eviction horizon for each side — the join buffers ~1 day of keyed
    * state per stream instead of the full history. This is the
    * streaming analogue of [[graft.operators.TemporalJoins]]' range
    * join, and the state-bounding join condition is what makes it
    * runnable forever on an unbounded 100 TB/day firehose. */
  def intervalJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    views.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 1 DAY"))
      .select(col("user_id"), col("view_id"), col("click_id"))
  }

  // ------------------------------------------------------- batch twins

  /** Batch twin of [[windowAgg]] (same window() construct, no
    * watermark needed on bounded input). */
  def streamWindowAgg: Q = (s, dir) => {
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
  }

  val streamWindowAggSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY date_trunc('hour', ts), event_type""".stripMargin

  /** Batch twin of [[dedup]]: deterministic "first" = min event_id. */
  def streamDedup: Q = (s, dir) => {
    events(s, dir)
      .groupBy("user_id", "event_type")
      .agg(min(col("event_id")).as("first_event_id"), count(lit(1)).as("n_events"))
  }

  val streamDedupSql: String =
    """SELECT user_id, event_type, MIN(event_id) AS first_event_id,
      |  COUNT(*) AS n_events
      |FROM events
      |GROUP BY user_id, event_type""".stripMargin

  /** Batch twin of [[sessionize]]: per-user session summary derived
    * from the same 30-minute-gap session definition. */
  def streamSessionize: Q = (s, dir) => {
    graft.queries.Relational.q18Sessionize(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        sum(col("n_events")).as("total_events"))
  }

  val streamSessionizeSql: String =
    """WITH sess AS (
      |  SELECT user_id, session_id, COUNT(*) AS n_events FROM (
      |    SELECT user_id, ts,
      |      CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |    FROM (
      |      SELECT user_id, event_id, ts,
      |        CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |             OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |        THEN 1 ELSE 0 END AS new_sess
      |      FROM events) g) s
      |  GROUP BY user_id, session_id)
      |SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events,
      |  CAST(SUM(n_events) AS BIGINT) AS total_events
      |FROM sess GROUP BY user_id""".stripMargin

  /** Batch twin of [[intervalJoin]]: identical join condition on the
    * bounded table. */
  def streamIntervalJoin: Q = (s, dir) => {
    val ev = events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    views.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 1 DAY"))
      .select(col("user_id"), col("view_id"), col("click_id"))
  }

  val streamIntervalJoinSql: String =
    """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
      |FROM events v JOIN events c ON c.user_id = v.user_id
      | AND v.event_type = 'view' AND c.event_type = 'click'
      | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 DAY""".stripMargin

  /** Streaming mix-weights twin: the per-source token masses are
    * accumulated as a complete-mode Structured Streaming aggregation
    * over a file stream of the corpus (running state = one row per
    * source — bounded however long the stream runs), then the
    * temperature-weight tail math (α-power, ppm floor quantization,
    * integer denominator — [[graft.operators.PipelineKeepList
    * .pipelineMixWeights]]) runs batch-side on the drained totals.
    * Output and oracle are identical to the batch build: the token
    * masses are exactly stream-accumulable, so a 100 TB ingest can
    * maintain its mixing weights incrementally instead of rescanning
    * the corpus per refresh. */
  def streamMixWeights: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    StreamStage.withStaged(s, "smw", dir, "documents.parquet") { stageDir =>
      val agg = s.readStream.schema(sch).parquet(stageDir)
        .select(col("source"), size(split(col("text"), " ")).cast(LongType).as("ntok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
      graft.streaming.StreamStage.drain(s, "mw")(agg.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_mw"))
    }
    val tok = s.table("graft_stream_mw")
    val tot = tok.agg(sum(col("n_tokens")).as("tot"))
    val sh = tok.crossJoin(broadcast(tot))
      .withColumn("share", expr("CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)"))
      .withColumn("sqf", expr("CAST(floor(sqrt(share) * 1e15) AS BIGINT)"))
    val den = sh.agg(sum(col("sqf")).as("den"))
    sh.crossJoin(broadcast(den))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share"),
        expr("CAST(sqf AS DOUBLE) / CAST(den AS DOUBLE)").as("mix_weight"))
  }

  /** Streaming top-terms twin: per-token OCCURRENCE counts accumulated
    * as a complete-mode streaming aggregation over a file stream of
    * the corpus (state = one row per distinct token — vocabulary-
    * sized, sub-linear in corpus length; for UNBOUNDED key domains the
    * bounded-state path is stream_cms / stream_heavy_hitters), then
    * top-20 by (count desc, token asc) batch-side after the drain —
    * a TakeOrderedAndProject over the drained totals, never a global
    * sort. Counts are occurrence-based, complementing the document-
    * frequency ranking of text_topterms. */
  def streamTopTerms: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    StreamStage.withStaged(s, "stt", dir, "documents.parquet") { stageDir =>
      val agg = s.readStream.schema(sch).parquet(stageDir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
      graft.streaming.StreamStage.drain(s, "tt")(agg.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_tt"))
    }
    s.table("graft_stream_tt")
      .orderBy(col("n").desc, col("tok").asc).limit(20)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("tok").asc))
        .cast(LongType))
  }

  val streamTopTermsSql: String =
    """SELECT tok, n, rank FROM (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n,
      |    row_number() OVER (ORDER BY COUNT(*) DESC, tok) AS rank
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok)
      |WHERE rank <= 20""".stripMargin

  /** Streaming curation filter — the STATELESS (append-mode) shape of
    * the pipeline: quality scoring and thresholding run as pure
    * map-side expressions on a file stream, kept docs append to the
    * sink with no aggregation state at all (contrast the complete-
    * mode twins, whose state is the aggregate). This is the form a
    * 100 TB ingest filter actually runs in — per-record decisions at
    * the edge, unbounded throughput, nothing to evict. The drained
    * sink is then rolled up per source; identical keep decisions to
    * the batch scorer, so one oracle covers both engines AND both
    * execution modes. */
  def streamCurationFilter: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    StreamStage.withStaged(s, "scf", dir, "documents.parquet") { stageDir =>
      val kept = graft.functions.TextOps.withQualityScore(
        s.readStream.schema(sch).parquet(stageDir))
        .filter(col("score") >= 0.5)
        .select(col("doc_id"), col("source"), col("n_words"))
      graft.streaming.StreamStage.drain(s, "cf")(kept.writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_cf"))
    }
    s.table("graft_stream_cf")
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_words")).as("kept_words"))
  }

  val streamCurationFilterSql: String =
    """WITH docs AS (
      |  SELECT doc_id, source, n_words,
      |    least(n_words / 50.0, 1.0) * 0.4
      |      + (n_stop / n_words) * 0.3
      |      + least(((length(text) - (n_words - 1)) / n_words) / 8.0, 1.0) * 0.3 AS score
      |  FROM (
      |    SELECT doc_id, source, text,
      |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |      CAST(len(list_filter(string_split(text, ' '),
      |        w -> w IN ('the', 'a', 'of', 'and', 'in', 'to', 'is', 'on'))) AS BIGINT) AS n_stop
      |    FROM documents) sub)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |  CAST(SUM(n_words) AS BIGINT) AS kept_words
      |FROM docs WHERE score >= 0.5
      |GROUP BY source""".stripMargin

  /** Streaming twin of pipeline_dataset_card: the per-(source, lang)
    * release summary maintained INCREMENTALLY as corpus shards land —
    * every aggregate (count, sums incl. the exact quantized quality
    * sum, min/max) is a streaming-combinable partial, so complete-mode
    * state is one row per (source, lang) regardless of corpus size,
    * and a 100 TB ingest keeps its card current without rescans. Same
    * oracle as the batch card — the engine and the execution mode both
    * change, the answer does not. */
  def streamDatasetCard: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    StreamStage.withStaged(s, "sdc", dir, "documents.parquet") { stageDir =>
      val card = graft.functions.TextOps.withQualityScore(
        s.readStream.schema(sch).parquet(stageDir))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_tokens"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(floor(col("score") * 1e6).cast(LongType)).as("quality_micro_sum"))
      graft.streaming.StreamStage.drain(s, "dc")(card.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_dc"))
    }
    s.table("graft_stream_dc")
  }

  /** Streaming twin of text_gopher_rules (r9): the Gopher rule bits
    * are a pure map-side projection, so they apply unchanged to the
    * micro-batched corpus stream; per-doc rows land in the sink and
    * the per-source curation report — how many docs each rule kills —
    * aggregates them. All counts are streaming-combinable partials,
    * so at 100 TB the report stays one row per source with no rescan;
    * the oracle replays the identical rule battery in batch SQL. */
  def streamGopherRules: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    StreamStage.withStaged(s, "sgr", dir, "documents.parquet") { stageDir =>
      val bits = graft.functions.TextOps.gopherRules(
        s.readStream.schema(sch).parquet(stageDir), passthrough = Seq("source"))
      graft.streaming.StreamStage.drain(s, "gopher")(bits.writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_gopher"))
    }
    def kills(c: String) = sum(when(!col(c), 1L).otherwise(0L)).as(s"killed_$c")
    s.table("graft_stream_gopher")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep_doc"), 1L).otherwise(0L)).as("n_kept"),
        kills("r_wordcount"), kills("r_wordlen"), kills("r_symbol"),
        kills("r_bullets"), kills("r_ellipsis"), kills("r_alpha"),
        kills("r_stopwords"))
  }

  val streamGopherRulesSql: String = {
    val g = graft.functions.TextOps.textGopherRulesSql
    def kills(c: String) =
      s"CAST(SUM(CASE WHEN NOT g.$c THEN 1 ELSE 0 END) AS BIGINT) AS killed_$c"
    s"""WITH g AS (
       |$g
       |)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN g.keep_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  ${kills("r_wordcount")}, ${kills("r_wordlen")}, ${kills("r_symbol")},
       |  ${kills("r_bullets")}, ${kills("r_ellipsis")}, ${kills("r_alpha")},
       |  ${kills("r_stopwords")}
       |FROM g JOIN documents d USING (doc_id)
       |GROUP BY d.source""".stripMargin
  }

  // ---------------------------------------------- stateless map twins
  // (r12): four scrub/score/fingerprint passes whose per-doc transform
  // is a pure row-local map — on a stream they run in APPEND mode with
  // ZERO state (no watermark, no state store), the shape that lets a
  // 100 TB ingest scrub/score documents at wire speed forever. Each
  // shares its transform function AND its oracle verbatim with the
  // batch key, so the stream path must produce every row identically.

  /** Streaming PII scrub twin of text_redact. */
  def streamRedact: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    StreamStage.withStaged(s, "srd", dir, "documents.parquet") { stageDir =>
      val out = graft.functions.TextOps.redactOf(
        s.readStream.schema(sch).parquet(stageDir))
      graft.streaming.StreamStage.drain(s, "rdt")(out.writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_rdt"))
    }
    s.table("graft_stream_rdt")
  }

  /** Streaming language-ID twin of text_langid. */
  def streamLangid: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    StreamStage.withStaged(s, "slid", dir, "documents.parquet") { stageDir =>
      val out = graft.functions.TextOps.langIdOf(
        s.readStream.schema(sch).parquet(stageDir))
      graft.streaming.StreamStage.drain(s, "lid")(out.writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_lid"))
    }
    s.table("graft_stream_lid")
  }

  /** Streaming winnowing twin of text_winnow_fingerprint: the whole
    * fingerprint selection runs inside each row's own gram arrays. */
  def streamWinnowFingerprint: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    StreamStage.withStaged(s, "swfp", dir, "documents.parquet") { stageDir =>
      val out = graft.operators.Winnowing.winnowOf(
        s.readStream.schema(sch).parquet(stageDir))
      graft.streaming.StreamStage.drain(s, "wfp")(out.writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_wfp"))
    }
    s.table("graft_stream_wfp")
  }

  /** Streaming feature-hash embedding twin of text_hash_embedding:
    * the batch key's two-groupBy shape would need per-doc state on a
    * stream, so the WHOLE sparse-vector build (distinct buckets,
    * per-bucket counts, L2, fingerprint) fuses into one map-side
    * expression chain over each doc's own token array — stateless
    * append, and the fixed-width embedding of an unbounded firehose
    * costs map work only. Output matches the batch key bit-for-bit
    * (same bucket sort, same count rendering in the fingerprint). */
  def streamHashEmbedding: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    StreamStage.withStaged(s, "she", dir, "documents.parquet") { stageDir =>
      val out = s.readStream.schema(sch).parquet(stageDir)
        .withColumn("bs", graft.functions.NgramExpressions.array_md5_prefix(graft.functions.NgramExpressions.lower_tokens(col("text")), 2))
        .filter(size(col("bs")) > 0) // batch emits no row for token-free docs
        .withColumn("db", expr("array_sort(array_distinct(bs))"))
        // r16 optimization: hash-count expression instead of the
        // quadratic per-row HOF rescan (see CharEntropy / CountsIn)
        .withColumn("cnts",
          graft.functions.CountsIn.counts_in(col("bs"), col("db")))
        .select(col("doc_id"),
          size(col("db")).cast(LongType).as("nnz"),
          expr("aggregate(cnts, cast(0 as bigint), (acc, c) -> acc + c * c)").as("sum_sq"),
          expr("sqrt(cast(aggregate(cnts, cast(0 as bigint), (acc, c) -> acc + c * c) as double))")
            .as("l2"),
          md5(expr("concat_ws(',', zip_with(db, cnts, (b, c) -> concat(b, ':', c)))"))
            .as("vec_fp"))
      graft.streaming.StreamStage.drain(s, "she")(out.writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_she"))
    }
    s.table("graft_stream_she")
  }

  /** STREAMING EXACT MEDIAN (r12): exact percentiles on an unbounded
    * stream are impossible with buffered values but FREE over a
    * bounded value domain — the running state is the (flag, quantity)
    * histogram itself, ≤ 50·flags rows for ANY stream length,
    * maintained as a complete-mode count aggregate. The interpolation
    * walk (shared verbatim with `q38_median`) runs batch-side on the
    * drained histogram; output and oracle identical to the batch key. */
  def streamMedian: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/lineitem.parquet").schema
    StreamStage.withStaged(s, "smed", dir, "lineitem.parquet") { stageDir =>
      val hist = s.readStream.schema(sch).parquet(stageDir)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("c"))
      graft.streaming.StreamStage.drain(s, "med")(hist.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_med"))
    }
    graft.queries.Relational.medianFromHist(s.table("graft_stream_med"))
  }

  /** STREAMING length-distribution maintenance (r12b — the ingest
    * monitor for `pipeline_length_histogram`: a packing stage sizes
    * its bins from the length distribution, and an ingest stream
    * keeps that distribution CURRENT instead of re-scanning): the
    * running state IS the (source, log2-bucket) histogram — bounded
    * at sources × 64 rows for ANY stream length — maintained as a
    * complete-mode aggregate over the same bit-exact
    * length(bin(n))−1 bucket arithmetic; output and oracle shared
    * verbatim with the batch key. */
  def streamLengthHistogram: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    StreamStage.withStaged(s, "slhist", dir, "documents.parquet") { stageDir =>
      val hist = s.readStream.schema(sch).parquet(stageDir)
        .select(col("source"),
          size(graft.functions.NgramExpressions.lower_tokens(col("text"))).cast("long").as("n"))
        .withColumn("bucket",
          expr("CASE WHEN n = 0 THEN -1 ELSE CAST(length(bin(n)) - 1 AS INT) END"))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("sum_tokens"))
      graft.streaming.StreamStage.drain(s, "lhist")(hist.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_lhist"))
    }
    s.table("graft_stream_lhist")
  }

  /** STREAMING corpus unigram entropy (r12): running state = the
    * per-(source, word) count table — vocabulary-sized, sub-linear in
    * corpus length (the stream_topterms bound argument) — maintained
    * as a complete-mode aggregate; the micro-nat entropy rollup runs
    * batch-side on the drained vocabulary. Output and oracle shared
    * verbatim with `text_unigram_entropy`. */
  def streamUnigramEntropy: Q = (s, dir) => {
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    StreamStage.withStaged(s, "suent", dir, "documents.parquet") { stageDir =>
      val counts = s.readStream.schema(sch).parquet(stageDir)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      graft.streaming.StreamStage.drain(s, "uent")(counts.writeStream.outputMode("complete")
        .format("memory").queryName("graft_stream_uent"))
    }
    s.table("graft_stream_uent")
      .groupBy("source")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("vocab"),
        sum(col("c") * expr("CAST(round(1e6 * ln(CAST(c AS DOUBLE))) AS BIGINT)"))
          .as("sum_clnc"))
      .select(col("source"), col("n").as("n_tokens"), col("vocab"),
        expr("(n * CAST(round(1e6 * ln(CAST(n AS DOUBLE))) AS BIGINT) - sum_clnc) DIV n")
          .as("entropy_unats"))
  }

  val queries: Map[String, Q] = Map(
    "stream_median" -> streamMedian,
    "stream_length_histogram" -> streamLengthHistogram,
    "stream_unigram_entropy" -> streamUnigramEntropy,
    "stream_redact" -> streamRedact,
    "stream_langid" -> streamLangid,
    "stream_winnow_fingerprint" -> streamWinnowFingerprint,
    "stream_hash_embedding" -> streamHashEmbedding,
    "stream_gopher_rules" -> streamGopherRules,
    "stream_dataset_card" -> streamDatasetCard,
    "stream_curation_filter" -> streamCurationFilter,
    "stream_topterms" -> streamTopTerms,
    "stream_mix_weights" -> streamMixWeights,
    "stream_window_agg" -> streamWindowAgg,
    "stream_dedup" -> streamDedup,
    "stream_sessionize" -> streamSessionize,
    "stream_interval_join" -> streamIntervalJoin)

  val oracles: Map[String, String] = Map(
    "stream_median" -> graft.queries.Relational.q38Sql,
    "stream_length_histogram" -> graft.operators.CorpusStats.pipelineLengthHistogramSql,
    "stream_unigram_entropy" -> graft.operators.Novelty.textUnigramEntropySql,
    // identical output to the batch scrub/score/fingerprint passes
    "stream_redact" -> graft.functions.TextOps.textRedactSql,
    "stream_langid" -> graft.functions.TextOps.textLangIdSql,
    "stream_winnow_fingerprint" -> graft.operators.Winnowing.textWinnowFingerprintSql,
    "stream_hash_embedding" -> graft.functions.TextOps.textHashEmbeddingSql,
    "stream_gopher_rules" -> streamGopherRulesSql,
    // identical output to the batch dataset-card build
    "stream_dataset_card" -> graft.operators.DatasetCard.pipelineDatasetCardSql,
    // identical output to the batch mix-weights build
    "stream_mix_weights" -> graft.operators.PipelineKeepList.pipelineMixWeightsSql,
    "stream_topterms" -> streamTopTermsSql,
    "stream_curation_filter" -> streamCurationFilterSql,
    "stream_window_agg" -> streamWindowAggSql,
    "stream_dedup" -> streamDedupSql,
    "stream_sessionize" -> streamSessionizeSql,
    "stream_interval_join" -> streamIntervalJoinSql)
}
