package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 laws: the extended unicode fixture (RTL, combining marks,
  * non-BMP emoji — the r14 verdict's remaining java.regex-vs-RE2
  * divergence islands), the fingerprint-family unicode twins' plan
  * parity with their ASCII twins, the bm25 unicode probe-set
  * contract, and foreachBatch scorer-sink idempotence under a
  * crash-between-write-and-commit replay — each pinned independently
  * of the DuckDB oracle gate. Plus the r15 additions: the per-source
  * quota's histogram-cut selection against a brute-force top-K, the
  * streaming quota's drained-histogram parity, and the balance
  * ledger's exact micro-nat arithmetic. */
class Round15Spec extends AnyFunSuite {
  import TestSession._

  // ---- extended fixture: RTL / combining / non-BMP (r14 verdict #3) --

  test("unicode tokenizer: RTL, combining-mark, emoji fixture rows tokenize exactly") {
    import spark.implicits._
    val got = graft.functions.Tokenize.FIXTURE.toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.Tokenize.tokens(col("text")).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // RTL: Arabic/Hebrew letters are run characters in logical order —
    // words split on spaces only, no bidi reordering, no case mapping
    assert(got(-5L) == Seq("نص", "عربي", "rtl", "mixed", "עברית", "וטקסט",
      "direction"), got(-5L))
    // combining marks stay inside runs UNNORMALIZED: cafe+U+0301 and
    // precomposed café are distinct tokens (neither engine normalizes)
    assert(got(-6L) == Seq("café", "combining", "résumé",
      "naïve", "precomposed", "café"), got(-6L))
    assert(got(-6L)(0) != got(-6L)(5), "NFC/NFD forms must stay distinct")
    // non-BMP emoji: each astral codepoint rides whole inside a run
    // (a surrogate-pair split would corrupt these tokens); ZWJ is a
    // run character so the family sequence stays one token
    assert(got(-7L) == Seq("emoji", "👍", "split",
      "🚀🔥", "runs",
      "👨‍👩‍👧", "zwj", "family"),
      got(-7L))
  }

  // ---- fingerprint-family unicode twins (r14 verdict #1) -------------

  /** Physical-plan shape signature: the operator counts that encode
    * the scale posture (join family, exchange count, no cartesian).
    * The uni twin must match its ASCII twin exactly — the fixture
    * union is a LocalRelation and the tokenizer a codegen projection,
    * neither of which may add a join or a shuffle. */
  private def shape(name: String): Map[String, Int] = {
    val p = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    Seq("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
      "ShuffledHashJoin", "BroadcastHashJoin", "Exchange", "Window")
      .map(op => op -> op.r.findAllIn(p).size).toMap
  }

  for ((ascii, uni) <- Seq(
      "dedup_simhash" -> "dedup_simhash_uni",
      "text_winnow_fingerprint" -> "text_winnow_fingerprint_uni",
      "dedup_winnow_pairs" -> "dedup_winnow_pairs_uni",
      "dedup_minhash_lsh" -> "dedup_minhash_lsh_uni")) {
    test(s"$uni plans the same shape as $ascii (df-cap/banding intact)") {
      val (a, u) = (shape(ascii), shape(uni))
      assert(u("CartesianProduct") == 0 && u("BroadcastNestedLoopJoin") == 0,
        s"$uni has an unkeyed join: $u")
      assert(u == a, s"$uni shape $u != $ascii shape $a")
    }
  }

  test("unicode minhash pairs: fixture docs pair ONLY at the deliberate CJK near-dup") {
    // fixture docs are tiny and unlike the corpus; the banded candidate
    // set must not produce fixture-corpus pairs with jaccard >= 0.4 —
    // and it MUST find the r16 deliberate CJK near-dup (-9, -8), the
    // fixture's one true positive (recall, not just no-false-bands)
    val pairs = SparkEntry.queries("dedup_minhash_lsh_uni")(spark, sf)
      .filter((col("id_a") < 0 || col("id_b") < 0) && col("jaccard") >= 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((-9L, -8L)), s"fixture pairs: $pairs")
  }

  // ---- foreachBatch scorer recovery (r14 verdict #2) -----------------

  /** The at-least-once gap, made deterministic: the scorer writes a
    * batch's partial aggregates to the sink, then crashes BEFORE the
    * checkpoint commits that batch's offsets. On restart the batch
    * replays with the same batchId. With the shipped
    * overwrite-by-batchId writer the replay REPLACES its own
    * partition (exactly-once at the sink); with a plain append writer
    * the same scenario double-counts — both legs pinned here. */
  private def foreachBatchCrashReplay(tag: String,
      writer: String => ((org.apache.spark.sql.DataFrame, Long) => Unit)): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_r15_fbrec_$tag"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val stage = s"$root/stage"
    val sink = s"$root/sink"
    graft.Tables.t(spark, sf, "documents").repartition(8).write.parquet(stage)
    val sch = spark.read.parquet(stage).schema
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start(poison: Boolean) = {
      val w = writer(sink)
      spark.readStream.schema(sch).option("maxFilesPerTrigger", "1").parquet(stage)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          w(batch, bid) // the sink write lands...
          if (poison && bid == 2 && crashed.compareAndSet(false, true))
            throw new RuntimeException("crash after write, before offset commit")
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
    }
    val q1 = start(poison = true)
    val failed = try { q1.awaitTermination(); false }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
    assert(failed, "poison did not kill the first drain — replay condition not met")
    assert(spark.read.parquet(sink).count() > 0,
      "crash landed before any batch wrote — nothing at risk of replay")
    // restart from the SAME checkpoint: batch 2 replays with the same id
    val q2 = start(poison = false)
    q2.processAllAvailable(); q2.stop()
    spark.read.parquet(sink)
      .groupBy("doc_id").agg(sum(col("c")).cast("long").as("n_tok"))
  }

  test("foreachBatch scorer: overwrite-by-batchId survives a write-then-crash replay exactly-once") {
    val got = foreachBatchCrashReplay("idem", sink =>
      graft.streaming.StreamStage.idempotentBatchWriter(sink) { batch =>
        batch.groupBy("doc_id").agg(count(lit(1)).as("c"))
      })
    val want = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "recovered foreachBatch sink differs from the batch twin")
  }

  test("foreachBatch counterfactual: a plain append sink double-counts the replayed batch") {
    val got = foreachBatchCrashReplay("append", sink =>
      (batch, _) => batch.groupBy("doc_id").agg(count(lit(1)).as("c"))
        .write.mode("append").parquet(sink))
    val want = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    // the replayed batch's docs count DOUBLE — proving the crash lands
    // in the gap the idempotent writer exists to close
    val doubled = got.join(want.withColumnRenamed("n_tok", "want_tok"), "doc_id")
      .filter(col("n_tok") === col("want_tok") * 2)
    assert(doubled.count() > 0,
      "append-mode replay did not double-count — the test no longer exercises the gap")
  }

  // ---- tar GNU-'L' fallback name degradation (r14 ADVICE) ------------

  test("tar GNU-'L' fallback name truncates at a UTF-8 boundary and NUL-terminates") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val name = "é" * 150 // 300 UTF-8 bytes, no '/': takes the 'L' escape
    val bytes = graft.functions.TarCodec.pack(new GenericArrayData(
      Array[Any](InternalRow(UTF8String.fromString(name), Array[Byte](1)))))
    // member 0 = the 'L' escape (512 header + 301-byte payload padded
    // to 512); the REAL header follows at 1024. A pure-ustar reader
    // that ignores 'L' records sees only this header's name field.
    val hdr = 1024
    var nl = 0
    while (nl < 100 && bytes(hdr + nl) != 0) nl += 1
    assert(nl < 100, "fallback name not NUL-terminated inside the field")
    // byte 99 would split the 50th é mid-sequence; the boundary rule
    // stops at 98 — 49 complete 2-byte chars
    assert(nl == 98, s"expected 98 fallback-name bytes, got $nl")
    assert(new String(bytes, hdr, nl, "UTF-8") == "é" * 49)
    // GNU-aware readers still get the FULL name via the 'L' record
    val ms = graft.functions.TarCodec.members(bytes)
    assert(ms.numElements() == 1 &&
      ms.getStruct(0, 3).getUTF8String(0).toString == name)
  }

  // ---- bm25 unicode probe-set contract (r14 ADVICE) ------------------

  test("text_bm25_topk_uni probes corpus ids 0..7 plus every fixture doc") {
    val qids = SparkEntry.queries("text_bm25_topk_uni")(spark, sf)
      .select("qid").distinct().collect().map(_.getLong(0)).toSet
    val want = (0L until graft.operators.Bm25.N_QUERIES.toLong).toSet ++
      graft.functions.Tokenize.FIXTURE.map(_._1).toSet
    // every intended probe doc that retrieves at least one candidate
    // appears; no OTHER doc ever becomes a probe
    assert(qids.subsetOf(want), s"unexpected probe qids: ${qids -- want}")
    assert(want.count(_ < 0) == graft.functions.Tokenize.FIXTURE.size,
      "fixture contract drifted")
  }

  // ---- per-source quota + balance ledger (r15 additions) -------------

  test("pipeline_source_quota: histogram-cut selection == brute-force top-15 per source") {
    import org.apache.spark.sql.expressions.Window
    val ledger = SparkEntry.queries("pipeline_source_quota")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    // the cap law: kept == min(15, n_docs), kept + dropped == n_docs
    ledger.values.foreach { r =>
      assert(r.getLong(2) == math.min(15L, r.getLong(1)), r.toString)
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1), r.toString)
    }
    // brute force (test-only shape): rank ALL docs per source by
    // (qk desc, doc_id asc) and keep rn <= 15 — the selected SET, and
    // therefore kept_docid_sum and cut_qk, must match exactly
    val w = Window.partitionBy("source").orderBy(col("qk").desc, col("doc_id"))
    val brute = graft.operators.SourceQuota.scored(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 15)
      .groupBy("source").agg(sum(col("doc_id")).as("docsum"), min(col("qk")).as("cut"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(brute.keySet == ledger.keySet)
    brute.foreach { case (src, (docsum, cut)) =>
      assert(ledger(src).getLong(4) == cut, s"$src cut_qk")
      assert(ledger(src).getLong(5) == docsum, s"$src kept_docid_sum")
    }
  }

  test("stream_source_quota ledger == batch quota ledger on the histogram columns") {
    val batch = SparkEntry.queries("pipeline_source_quota")(spark, sf)
      .select("source", "n_docs", "n_kept", "n_dropped", "cut_qk")
    val stream = SparkEntry.queries("stream_source_quota")(spark, sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "drained-histogram cut differs from the batch cut")
  }

  test("pipeline_source_entropy replays exact BigInt micro-nat arithmetic") {
    val got = SparkEntry.queries("pipeline_source_entropy")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val counts = graft.Tables.t(spark, sf, "documents")
      .groupBy("lang", "source").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2) }
    def lam(k: Long): BigInt = BigInt(math.round(1e6 * math.log(k.toDouble)))
    counts.foreach { case (lang, ns) =>
      val n = ns.sum
      val h = (BigInt(n) * lam(n) - ns.map(c => BigInt(c) * lam(c)).sum) / BigInt(n)
      val top = BigInt(1000000) * BigInt(ns.max) / BigInt(n)
      val (gn, gs, ge, gt) = got(lang)
      assert((gn, gs) == (n, ns.size.toLong), lang)
      assert(BigInt(ge) == h, s"$lang entropy: got $ge want $h")
      assert(BigInt(gt) == top, s"$lang top share: got $gt want $top")
      // uniform upper bound: H <= ln(n_sources) on the same grid
      assert(ge <= math.round(1e6 * math.log(ns.size.toDouble)), lang)
    }
  }
}
