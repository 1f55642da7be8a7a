package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15b laws, independent of the DuckDB oracle gate: the
  * streaming balance twin's exact parity with its batch key, the
  * unicode boilerplate scrub's removal semantics on a constructed
  * shared-segment corpus, the NB calibration ledger's accounting
  * invariants (band partition of the held-out set, disjoint ordered
  * score ranges, confusion-count consistency), and the Heaps curve's
  * monotonicity + endpoint identities against independently computed
  * corpus totals. */
class Round15bSpec extends AnyFunSuite {
  import TestSession._

  // ---- stream_source_entropy == pipeline_source_entropy --------------

  test("stream_source_entropy drains to the batch key's exact rows") {
    val batch = SparkEntry.queries("pipeline_source_entropy")(spark, sf)
    val stream = SparkEntry.queries("stream_source_entropy")(spark, sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "drained-histogram entropy must equal the batch scan's")
  }

  // ---- text_segment_dedup_uni ----------------------------------------

  test("unicode scrub removes a shared CJK segment and keeps unique tails") {
    import spark.implicits._
    // two docs share the same 8 leading CJK chars (= 8 unicode tokens,
    // exactly one segment); tails differ. ASCII mode would see each
    // unspaced doc as ONE token -> one segment per doc, nothing shared.
    val docs = Seq(
      (1L, "一二三四五六七八九十"), // shared 8 + unique tail 九十
      (2L, "一二三四五六七八百千")) // shared 8 + unique tail 百千
      .toDF("doc_id", "text")
    val out = operators.Boilerplate.scrubToks(
      docs.withColumn("toks", functions.Tokenize.tokens(col("text")))
        .filter(size(col("toks")) >= 1))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 10 tokens -> 2 segments each; the first (shared across both docs)
    // is boilerplate, the second (unique 2-char tail) survives
    assert(out(1L) == ((2L, 1L)), out(1L))
    assert(out(2L) == ((2L, 1L)), out(2L))
  }

  test("text_segment_dedup_uni covers the fixture docs and never keeps > total") {
    val out = SparkEntry.queries("text_segment_dedup_uni")(spark, sf).cache()
    assert(out.filter(col("doc_id") < 0).count() ==
      functions.Tokenize.FIXTURE.size, "every fixture doc must be scrubbed too")
    assert(out.filter(col("n_kept") > col("n_segments")).count() == 0)
    out.unpersist()
  }

  // ---- pipeline_nb_calibration ----------------------------------------

  test("nb calibration bands partition the held-out set with consistent counts") {
    val bands = SparkEntry.queries("pipeline_nb_calibration")(spark, sf)
      .orderBy("band").collect()
    // the ledger covers EXACTLY the held-out (md5 split bit 1) half of
    // the two training sources — computed independently from the
    // documents table with the same hash text
    val expect = Tables.t(spark, sf, "documents")
      .filter(col("source").isin("src0", "src1") &&
        expr("CAST(conv(substring(md5(concat('cal:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2") === 1)
      .count()
    assert(bands.map(_.getLong(1)).sum == expect,
      s"band populations must sum to the held-out count $expect")
    // r16 contract: the grid always carries bands 1..10; empty bands
    // are explicit zero rows with NULL score ranges (Round16Spec pins
    // the zero-fill itself; here the per-band accounting laws apply to
    // the POPULATED rows)
    assert(bands.map(_.getLong(0)).toSeq == (1L to 10L), "band grid must be 1..10")
    val populated = bands.filter(_.getLong(1) > 0L)
    for (r <- populated) {
      val (band, n, nPos, posPpm) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (nPredpos, nTp) = (r.getLong(4), r.getLong(5))
      assert(band >= 1 && band <= 10, s"band $band out of range")
      assert(nPos <= n && nPredpos <= n && nTp <= math.min(nPos, nPredpos),
        s"confusion counts inconsistent in band $band")
      assert(posPpm == 1000000L * nPos / n)
      assert(r.getLong(6) <= r.getLong(7), "min_score <= max_score")
    }
    // equal-width bands: populated score ranges are disjoint and ordered
    for (Array(a, b) <- populated.sliding(2) if populated.length >= 2)
      assert(a.getLong(7) < b.getLong(6),
        s"band ${a.getLong(0)} max must precede band ${b.getLong(0)} min")
  }

  test("counterfactual: a doc_id-parity split would train on ZERO negatives") {
    // the reason pipeline_nb_calibration splits by md5 hash bit: the
    // synthetic corpus assigns sources round-robin, so doc_id parity
    // is perfectly confounded with the class label — an even/odd
    // split puts ALL of src0 in one half and ALL of src1 in the
    // other, and the "train" half has no negative class at all
    // (prior = ln(dp/0)). This pins the data property that makes the
    // parity split degenerate, so a future "simplification" back to
    // doc_id % 2 fails loudly here instead of silently in the prior.
    val parity = Tables.t(spark, sf, "documents")
      .filter(col("source").isin("src0", "src1"))
      .groupBy("source")
      .agg(sum((col("doc_id") % 2).cast("long")).as("odd"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(parity("src0")._1 == 0L, "src0 is all-even in this corpus")
    assert(parity("src1")._1 == parity("src1")._2, "src1 is all-odd in this corpus")
    // and the hash split genuinely mixes: both classes present in
    // both halves
    val mixed = Tables.t(spark, sf, "documents")
      .filter(col("source").isin("src0", "src1"))
      .groupBy(col("source"),
        expr("CAST(conv(substring(md5(concat('cal:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2"))
      .count()
    assert(mixed.count() == 4, "md5 split must populate all four (source, bit) cells")
  }

  // ---- text_heaps_fit ---------------------------------------------------

  test("heaps curve is monotone, hits exact corpus totals, and fits in (0,1)") {
    val rows = SparkEntry.queries("text_heaps_fit")(spark, sf)
      .orderBy("k").collect()
    assert(rows.length == 10, s"expected 10 checkpoints, got ${rows.length}")
    for (Array(a, b) <- rows.sliding(2)) {
      assert(a.getLong(1) <= b.getLong(1) && a.getLong(2) <= b.getLong(2) &&
        a.getLong(3) <= b.getLong(3), "cumulative curve must be non-decreasing")
    }
    // endpoint identities, computed independently of the operator
    // (3-gram inventory — the operator's type unit)
    val grams = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), w -> w != '')").as("ws"))
      .select(col("doc_id"), expr(
        "CASE WHEN size(ws) >= 3 THEN transform(sequence(1, size(ws) - 2), " +
          "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END").as("gs"))
    val last = rows.last
    assert(last.getLong(1) == grams.count(), "final n_docs == corpus size")
    assert(last.getLong(2) ==
      grams.select(sum(size(col("gs")).cast("long"))).head().getLong(0),
      "final n_grams == corpus 3-gram token count")
    assert(last.getLong(3) ==
      grams.select(explode(col("gs")).as("g")).select("g").distinct().count(),
      "final vocab == corpus distinct 3-gram types")
    val beta = rows.map(_.getDouble(4)).distinct
    assert(beta.length == 1, "beta must be the same constant on every row")
    assert(beta.head > 0.0 && beta.head < 1.0,
      s"natural-text Heaps exponent expected in (0,1), got ${beta.head}")
  }
}
