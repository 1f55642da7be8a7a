package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality floor for the approximate ANN paths: how much of the exact
  * brute-force top-k do LSH and IVF recover on the sf0.001 embeddings?
  * (Loose floors — the corpus is small random vectors, the point is a
  * regression tripwire, not a tuning target.) */
class RecallSpec extends AnyFunSuite {
  import TestSession._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("neighbor_id"))

  lazy private val exact = pairs(Similarity.simTopKBruteforce(spark, sf)).cache()

  test("sign-LSH results are a subset of scored candidates and overlap the exact top-k") {
    val lsh = pairs(Similarity.simLshBucketed(spark, sf))
    val hits = lsh.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    info(s"LSH hits: $hits of ${lsh.count()} returned")
    assert(lsh.count() > 0)
    // every LSH neighbor that IS in the exact top-5 counts as a hit;
    // with 256 sign buckets on random data expect at least some overlap
    assert(hits >= 1, s"sign-LSH recovered $hits of the exact top-k pairs")
  }

  test("IVF recall sweeps monotonically with nprobe") {
    // recall here = fraction of returned top-3 pairs that sit in the
    // exact top-5 — widening the probe set can only add candidates, so
    // hits must not decrease
    val hitsAt = Seq(1, 2, 4).map { np =>
      val ivf = pairs(Similarity.ivfTopK(spark, sf, np, 3))
      val h = ivf.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      info(s"nprobe=$np: $h hits of ${ivf.count()} returned")
      np -> h
    }.toMap
    assert(hitsAt(2) >= hitsAt(1))
    assert(hitsAt(4) >= hitsAt(2))
    assert(hitsAt(4) >= 20, s"nprobe=4 should be near-exact, got ${hitsAt(4)}")
  }

  test("PQ-ADC re-ranked top-3 overlaps the exact top-k") {
    val pq = pairs(Similarity.simPqAdc(spark, sf))
    val hits = pq.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    info(s"PQ hits: $hits of ${pq.count()} returned")
    assert(pq.count() > 0)
    // 4×16-code product quantization of 64-dim random vectors is a
    // coarse approximation; the ADC top-8 + exact re-rank should still
    // land a meaningful share of the exact top-5
    assert(hits >= 10, s"PQ-ADC recovered $hits of the exact top-k pairs")
  }

  test("IVF-PQ residual coding beats flat-PQ recall and overlaps the exact top-k") {
    val ivfpq = pairs(Similarity.simIvfPq(spark, sf))
    val hits = ivfpq.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    val flatHits = pairs(Similarity.simPqAdc(spark, sf))
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    info(s"IVF-PQ hits: $hits vs flat-PQ $flatHits (exact set: ${exact.count()})")
    assert(ivfpq.count() > 0)
    // residuals center near zero so the same 4×16 codebooks quantize
    // finer; the composition should at least not LOSE recall vs flat
    // PQ even though it scans only nprobe cells
    assert(hits >= 10, s"IVF-PQ recovered $hits of the exact top-k pairs")
    assert(hits >= flatHits - 3, s"IVF-PQ $hits far below flat PQ $flatHits")
  }

  test("IVF nprobe=2 recovers a nontrivial share of the exact top-k") {
    val ivf = pairs(Similarity.simIvf(spark, sf))
    val hits = ivf.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    info(s"IVF hits: $hits of ${ivf.count()} returned (exact set: ${exact.count()})")
    assert(ivf.count() > 0)
    // with the trained (2-Lloyd-iteration) quantizer all 30 returned
    // neighbors sit in the exact top-5 at sf0.001; 20 leaves margin
    // for data regeneration while still catching a recall collapse
    assert(hits >= 20, s"IVF recovered $hits of the exact top-k pairs")
  }

  test("MMR re-rank prefers the diverse candidate over an exact duplicate") {
    import spark.implicits._
    // query 0 = e1; three real candidates all at cos .7071:
    //   id 10 = e1+e2, id 11 = 2*(e1+e2) (exact duplicate direction),
    //   id 12 = e1-e2 (orthogonal to 10/11 in the non-query component)
    // plain top-2 would be (10, 11) by the id tie-break; MMR's rank-2
    // penalty (0.3 * sim-to-selected) zeroes out for 12 and maxes for
    // 11, so the selection order must be 10, 12, then 11.
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = new Array[Float](64)
      parts.foreach { case (i, x) => a(i) = x }
      a
    }
    val rows = (0 until 10).map(i => (i.toLong, vec(i -> 1f), 0)) ++ Seq(
      (10L, vec(0 -> 1f, 32 -> 1f), 0),
      (11L, vec(0 -> 2f, 32 -> 2f), 0),
      (12L, vec(0 -> 1f, 32 -> -1f), 0))
    val dir = "/tmp/graft_mmr_spec"
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.simMmr(spark, dir)
      .filter(col("query_id") === 0).orderBy("mmr_rank")
      .select("neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L, 12L, 11L), s"$got")
  }

  test("sim_label_knn per-label accuracy matches an independent plain-Scala recount") {
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = Similarity.simKnnGraph(spark, sf)
      .select("src", "dst").collect().map(r => r.getLong(0) -> r.getLong(1))
    // independent majority vote: votes DESC, label ASC tie-break
    val pred = edges.groupBy(_._1).map { case (src, es) =>
      val votes = es.map(e => labels(e._2)).groupBy(identity).view.mapValues(_.size)
      src -> votes.toSeq.minBy { case (l, v) => (-v, l) }._1
    }
    val expected = pred.toSeq
      .groupBy { case (v, _) => labels(v) }
      .map { case (l, ps) => l -> (ps.size.toLong, ps.count { case (v, p) => p == labels(v) }.toLong) }
    val got = Similarity.simLabelKnn(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("sim_centroid_purity recounts from dedup_semantic's independent cell ledger") {
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // dedup_semantic publishes the same staged-centroid assignment as
    // (vec_id, cell) — recompute purity from it in plain Scala
    val cells = Similarity.dedupSemantic(spark, sf)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1))
    val expected = cells.groupBy(_._2).map { case (cell, vs) =>
      val byLab = vs.map(v => labels(v._1)).groupBy(identity).view.mapValues(_.size)
      val (topLabel, nTop) = byLab.toSeq.minBy { case (l, c) => (-c, l) }
      cell -> ((vs.size.toLong, topLabel, nTop.toLong, 1000000L * nTop / vs.size))
    }
    val got = Similarity.simCentroidPurity(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, s"got $got expected $expected")
  }
}
