package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 laws: the span/CDC/containment/top-m unicode twins' plan
  * parity with their ASCII twins, the CDC boundary scan's
  * codepoint-indexing parity on astral text (the latent
  * UTF-16-vs-codepoint bug the `_uni` fixture exposed), the deliberate
  * CJK near-dup fixture pair's recall through the span/containment/CDC
  * machinery, the doc-level streaming quota's kept-set parity with the
  * batch cut, and the calibration ledger's always-ten-bands grid —
  * each pinned independently of the DuckDB oracle gate. */
class Round16Spec extends AnyFunSuite {
  import TestSession._

  // ---- CDC boundary scan: codepoint parity on astral text ------------

  test("cdc_bounds equals the HOF SQL formulation on multibyte + astral text") {
    import spark.implicits._
    // the HOF formulation IS the oracle's semantics (SQL substring =
    // codepoint windows); the native expression must match it on every
    // script class — ASCII fast path, BMP CJK, RTL, combining marks,
    // and the astral emoji rows where java.lang.String indexing (the
    // pre-r16 multibyte path) would split surrogate pairs
    val texts = graft.functions.Tokenize.FIXTURE.map(_._2) ++ Seq(
      "plain ascii control text with several words",
      "😀😀😀 astral run 🚀 then 中文 mixed ascii tail 😀😀",
      "中文文本没有空格中文文本没有空格中文文本没有空格")
    val df = texts.toDF("text").filter(length(col("text")) >= 2)
    val hof = expr("concat(array(1), " +
      "filter(sequence(2, length(text)), p -> substring(md5(substring(text, p, 8)), 1, 1) = '0'), " +
      "array(length(text) + 1))")
    val rows = df.select(
      graft.functions.CdcExpressions.cdc_bounds(col("text")).as("native"),
      hof.as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"native ${r.getSeq[Int](0)} != hof ${r.getSeq[Int](1)}")
    }
  }

  // ---- the new unicode twins: plan parity with the ASCII twins -------

  /** The Round15Spec shape signature, with the cache cleared first (the
    * r15b PlanAuditSpec lesson: a warm cache collapses subtrees into
    * InMemoryTableScan and exchange counts go run-order-dependent). */
  private def shape(name: String): Map[String, Int] = {
    spark.sharedState.cacheManager.clearCache()
    val p = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    Seq("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
      "ShuffledHashJoin", "BroadcastHashJoin", "Exchange", "Window")
      .map(op => op -> op.r.findAllIn(p).size).toMap
  }

  // spans and CDC have no cache asymmetry between the twins — pin the
  // full shape signature equal
  for ((ascii, uni) <- Seq(
      "dedup_substring_spans" -> "dedup_substring_spans_uni",
      "dedup_cdc" -> "dedup_cdc_uni")) {
    test(s"$uni plans the same shape as $ascii") {
      val (a, u) = (shape(ascii), shape(uni))
      assert(u("CartesianProduct") == 0 && u("BroadcastNestedLoopJoin") == 0,
        s"$uni has an unkeyed join: $u")
      assert(u == a, s"$uni shape $u != $ascii shape $a")
    }
  }

  // containment/top-m: the ASCII twins cache the capped shingle base
  // (3 consumers) while the uni twins ride cappedShingles' internal
  // cache only (the r15 ADVICE posture), so raw exchange counts
  // legitimately differ — pin the scale INVARIANTS instead: no
  // cartesian, no broadcast-nested-loop, and the same window count
  // (the top-m tail's one bounded window; containment's zero)
  for ((ascii, uni) <- Seq(
      "dedup_containment" -> "dedup_containment_uni",
      "dedup_ngram_topm" -> "dedup_ngram_topm_uni")) {
    test(s"$uni keeps $ascii's scale invariants (keyed joins only, same windows)") {
      val (a, u) = (shape(ascii), shape(uni))
      assert(u("CartesianProduct") == 0 && u("BroadcastNestedLoopJoin") == 0,
        s"$uni has an unkeyed join: $u")
      assert(u("Window") == a("Window"), s"$uni windows ${u("Window")} != ${a("Window")}")
    }
  }

  // ---- the deliberate CJK near-dup pair's recall ----------------------

  test("fixture pair (-8,-9): containment catches it near 0.9 both ways") {
    val got = SparkEntry.queries("dedup_containment_uni")(spark, sf)
      .filter(col("id_a") === -9L && col("id_b") === -8L).collect()
    assert(got.length == 1, "the deliberate CJK pair must survive the df-capped index")
    assert(got(0).getAs[Double]("cont_ab") >= 0.8 && got(0).getAs[Double]("cont_ba") >= 0.8)
  }

  test("fixture pair (-8,-9): the shared CJK passage marks duplicated spans in BOTH docs") {
    val got = SparkEntry.queries("dedup_substring_spans_uni")(spark, sf)
      .filter(col("doc_id").isin(-8L, -9L))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("dup_words")).toMap
    assert(got(-8L) > 0 && got(-9L) > 0,
      s"shared unspaced boilerplate must mark spans in both docs: $got")
  }

  test("CDC finds repeated multibyte chunks across the fixture pair") {
    import spark.implicits._
    // fixture-only corpus: the shared passage must yield at least one
    // chunk present in BOTH docs (n_docs = 2) — the multibyte boundary
    // path producing genuinely matching chunk hashes across documents
    val fx = graft.functions.Tokenize.FIXTURE.toDF("doc_id", "text")
    val rep = graft.operators.Dedup.cdcOf(fx).filter(col("n_docs") >= 2)
    assert(rep.count() > 0, "no cross-doc repeated chunk from the shared CJK passage")
  }

  // ---- doc-level streaming quota: kept set == batch cut ---------------

  test("stream_source_quota_docs kept set reconciles with the batch ledger exactly") {
    val kept = SparkEntry.queries("stream_source_quota_docs")(spark, sf)
      .groupBy("source")
      .agg(count(lit(1)).as("k_n"), sum(col("doc_id")).as("k_sd"))
    val batch = SparkEntry.queries("pipeline_source_quota")(spark, sf)
      .select(col("source"), col("n_kept"), col("kept_docid_sum"))
    val joined = batch.join(kept, Seq("source"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_kept") == r.getAs[Long]("k_n"),
        s"${r.getAs[String]("source")}: kept count drifted")
      assert(r.getAs[Long]("kept_docid_sum") == r.getAs[Long]("k_sd"),
        s"${r.getAs[String]("source")}: kept SET drifted (docid sum)")
    }
  }

  // ---- A-ES weighted sampler: exact replay + scale shape --------------

  test("pipeline_sample_weighted equals a local BigInt replay of the A-ES formula") {
    import java.security.MessageDigest
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("n_chars"))))
      .filter(_._2 > 0L)
    val replay = docs.map { case (id, w) =>
      val hex = MessageDigest.getInstance("MD5").digest(s"aes:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h60 = java.lang.Long.parseLong(hex, 16)
      val lnq = Math.round(1e6 * Math.log((h60 + 1).toDouble / 1152921504606846976.0))
      val cost = (BigInt(-lnq) * 1000000 / w).toLong // positive ÷ positive: BigInt / == DIV
      (id, cost)
    }.sortBy(t => (t._2, t._1)).take(100)
    val got = SparkEntry.queries("pipeline_sample_weighted")(spark, sf)
      .select("doc_id", "aes_cost").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == math.min(100, docs.length))
    assert(got.toSeq == replay.toSeq, "engine kept set != local A-ES replay")
  }

  test("pipeline_sample_weighted favors char mass and plans as bounded top-K") {
    val kept = SparkEntry.queries("pipeline_sample_weighted")(spark, sf)
    // weighted-without-replacement must tilt the sample toward heavy
    // docs: kept mean char mass strictly above the corpus mean
    val keptMean = kept.agg(avg(col("n_chars"))).head().getDouble(0)
    val corpusMean = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("n_chars") > 0L).agg(avg(col("n_chars"))).head().getDouble(0)
    assert(keptMean > corpusMean,
      s"A-ES sample mean $keptMean not above corpus mean $corpusMean")
    // scale shape: per-partition bounded heap, zero corpus shuffle
    spark.sharedState.cacheManager.clearCache()
    val p = kept.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected bounded top-K, got:\n$p")
    assert("Exchange".r.findAllIn(p).isEmpty, s"unexpected shuffle in top-K plan:\n$p")
  }

  test("stream_sample_weighted reproduces the batch A-ES kept set row-for-row") {
    val batch = SparkEntry.queries("pipeline_sample_weighted")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val stream = SparkEntry.queries("stream_sample_weighted")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(stream.toSeq == batch.toSeq,
      "streaming reservoir drifted from the batch top-K")
  }

  test("pipeline_sample_weighted_stratified: exactly K per source, grouped TopK == window oracle semantics") {
    val got = SparkEntry.queries("pipeline_sample_weighted_stratified")(spark, sf)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("aes_cost")))
    val perSource = got.groupBy(_._1)
    val nSources = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("n_chars") > 0L).select("source").distinct().count()
    assert(perSource.size.toLong == nSources, "every source must contribute a stratum")
    perSource.foreach { case (src, rows) =>
      assert(rows.length <= 10, s"$src: stratum over K")
    }
    // within each stratum the kept set must be that source's K
    // smallest costs — replay the oracle's window formulation
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("aes_cost").asc, col("doc_id").asc)
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("n_chars") > 0L)
      .withColumn("h60", expr("CAST(conv(substring(md5(concat('aes:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("lnq", expr("CAST(round(1e6 * ln(CAST(h60 + 1 AS DOUBLE) / 1152921504606846976.0)) AS BIGINT)"))
      .withColumn("aes_cost", expr("((-lnq) * 1000000) div n_chars"))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") <= 10)
      .select("source", "doc_id", "aes_cost")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(t => (t._1, t._2)).toSeq == all.sortBy(t => (t._1, t._2)).toSeq,
      "grouped bounded TopK drifted from the window formulation")
  }

  test("stream_source_quota_chars kept set reconciles with the batch chars ledger exactly") {
    val kept = SparkEntry.queries("stream_source_quota_chars")(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "n_chars"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("k_n"), sum(col("doc_id")).as("k_sd"),
        sum(col("n_chars")).as("k_sch"))
    val batch = SparkEntry.queries("pipeline_source_quota_chars")(spark, sf)
      .select(col("source"), col("n_kept"), col("kept_docid_sum"), col("kept_chars"))
    val joined = batch.join(kept, Seq("source"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val nk = r.getAs[Long]("n_kept")
      if (nk == 0L) assert(r.isNullAt(r.fieldIndex("k_n")), s"${r.getAs[String]("source")}: stream kept docs where batch kept none")
      else {
        assert(nk == r.getAs[Long]("k_n"), s"${r.getAs[String]("source")}: kept count drifted")
        assert(r.getAs[Long]("kept_docid_sum") == r.getAs[Long]("k_sd"),
          s"${r.getAs[String]("source")}: kept SET drifted (docid sum)")
        assert(r.getAs[Long]("kept_chars") == r.getAs[Long]("k_sch"),
          s"${r.getAs[String]("source")}: kept MASS drifted")
      }
    }
  }

  test("stream_decontaminate_semantic_docs kept set == ledger accounting") {
    val kept = SparkEntry.queries("stream_decontaminate_semantic_docs")(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("k_n"))
    val led = SparkEntry.queries("pipeline_decontaminate_semantic")(spark, sf)
      .select(col("source"), col("n_kept"))
    val joined = led.join(kept, Seq("source"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_kept") == (if (r.isNullAt(r.fieldIndex("k_n"))) 0L else r.getAs[Long]("k_n")),
        s"${r.getAs[String]("source")}: stream kept set != ledger n_kept")
    }
  }

  test("stream_decontaminate_semantic reproduces the batch ledger row-for-row") {
    val batch = SparkEntry.queries("pipeline_decontaminate_semantic")(spark, sf)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val stream = SparkEntry.queries("stream_decontaminate_semantic")(spark, sf)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(batch.nonEmpty)
    assert(stream.toSeq == batch.toSeq, "streaming ledger drifted from batch")
  }

  test("pipeline_contamination_semantic partitions consistently with the drop ledger") {
    val report = SparkEntry.queries("pipeline_contamination_semantic")(spark, sf)
    val nFlagged = report.filter(col("flagged")).count()
    val led = SparkEntry.queries("pipeline_decontaminate_semantic")(spark, sf)
      .agg(sum(col("n_dropped"))).head().getLong(0)
    assert(nFlagged == led,
      s"measurement flags $nFlagged but the ledger drops $led — shared pass drifted")
    assert(report.filter(col("max_cos").isNull).count() == 0)
  }

  // ---- semantic decontamination: HOF parity + ledger accounting -------

  test("pipeline_decontaminate_semantic matches an independent HOF recomputation") {
    val isBench = (c: String) =>
      s"substring(md5(concat('graft-bench-v1:', CAST($c AS STRING))), 1, 2) < '08'"
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", expr(
        "sqrt(aggregate(v, 0D, (acc, x) -> acc + x * x))"))
      .withColumn("is_bench", expr(isBench("vec_id")))
    val probeRows = e.filter(col("is_bench")).select(col("v"), col("nrm")).collect()
    val corpus = e.filter(!col("is_bench"))
      .select(col("vec_id"), col("v"), col("nrm")).collect()
    val flagged = corpus.filter { r =>
      val v = r.getSeq[Double](1); val n = r.getDouble(2)
      probeRows.exists { p =>
        val pv = p.getSeq[Double](0); val pn = p.getDouble(1)
        val dot = v.indices.map(i => v(i) * pv(i)).sum
        BigDecimal(dot / (n * pn)).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal("0.3")
      }
    }.map(_.getLong(0)).toSet
    val led = SparkEntry.queries("pipeline_decontaminate_semantic")(spark, sf).collect()
    assert(led.nonEmpty)
    led.foreach { r =>
      assert(r.getAs[Long]("n_docs") == r.getAs[Long]("n_dropped") + r.getAs[Long]("n_kept"),
        s"ledger row does not partition: $r")
    }
    assert(led.map(_.getAs[Long]("n_dropped")).sum == flagged.size.toLong,
      "engine dropped count != independent HOF recomputation")
  }

  // ---- calibration ledger: always ten bands ---------------------------

  test("pipeline_nb_calibration always emits bands 1..10, zero-filled when empty") {
    val rows = SparkEntry.queries("pipeline_nb_calibration")(spark, sf).collect()
    assert(rows.length == 10, s"expected 10 band rows, got ${rows.length}")
    assert(rows.map(_.getLong(0)).sorted.toSeq == (1L to 10L), "band grid incomplete")
    rows.filter(_.getAs[Long]("n") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_pos") == 0L && r.getAs[Long]("n_predpos") == 0L
        && r.getAs[Long]("n_tp") == 0L && r.getAs[Long]("pos_ppm") == 0L,
        s"empty band ${r.getLong(0)} not zero-filled: $r")
      assert(r.isNullAt(r.fieldIndex("min_score")) && r.isNullAt(r.fieldIndex("max_score")),
        s"empty band ${r.getLong(0)} must carry NULL score range")
    }
  }
}
