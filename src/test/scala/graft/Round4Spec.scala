package graft

import graft.operators.{Boilerplate, GridOps, SamplePlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic assertions for the round-4 operators (the oracle gate
  * covers their cross-engine equality; these pin the PROPERTIES). */
class Round4Spec extends AnyFunSuite {
  import TestSession._

  test("pipeline_partition_quality buckets are equi-depth-ish and cover all docs") {
    val out = SamplePlan.pipelinePartitionQuality(spark, sf)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n_docs")).toMap
    val total = out.values.sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == docs, "file roundtrip must lose no documents")
    // histogram-estimated deciles: each bucket within 3x of the ideal
    // tenth at this tiny sf (the estimator is exact-rank at sf0.01+)
    val ideal = total.toDouble / 10
    assert(out.values.forall(n => n <= ideal * 3),
      s"no bucket may swallow the corpus: $out")
  }

  test("pipeline_sample_plan selected counts track integer targets") {
    val rows = SamplePlan.pipelineSamplePlan(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val target = r.getAs[Long]("target_n")
      val sel = r.getAs[Long]("selected_n")
      assert(target <= n, "target never exceeds the cell")
      assert(sel <= n)
      // md5 thresholding concentrates around the target (binomial);
      // at tiny cells just require the degenerate cases to be exact
      if (target == 0 && r.getAs[Long]("bucket") == 0) assert(sel == 0,
        "bucket 0 has keep probability 0 — nothing may be selected")
    }
  }

  test("text_segment_dedup drops shared segments, keeps unique ones") {
    import spark.implicits._
    val out = Boilerplate.textSegmentDedup(spark, sf)
    val withDrops = out.filter(col("n_kept") < col("n_segments")).count()
    val total = out.count()
    assert(total == spark.read.parquet(s"$sf/documents.parquet").count(),
      "every document gets a ledger row — boilerplate removal drops no docs")
    // the synthetic corpus shares segments across docs at every sf
    assert(withDrops > 0, "some docs must lose boilerplate segments")
    // residual hash of an untouched doc equals the hash of all segments
    val untouched = out.filter(col("n_kept") === col("n_segments"))
    assert(!untouched.isEmpty,
      "expected at least one doc with no boilerplate segments at this sf")
    assert(untouched.head().getAs[String]("residual_hash").nonEmpty)
  }

  test("stream_heavy_hitters estimates never undercount and clear the threshold") {
    val rows = graft.functions.Sketches.streamHeavyHitters(spark, sf).collect()
    assert(rows.nonEmpty, "the skewed events table has heavy hitters")
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("est_n")
      val n = r.getAs[Long]("n_total")
      assert(est >= exact, "CMS point estimates are upper bounds")
      assert(est * 128 >= n, "reported hitters clear the support threshold")
    }
  }

  test("q32_funnel stages are consistent with their timestamps") {
    val rows = graft.queries.Relational.q32Funnel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getAs[Long]("funnel_stage")
      assert(stage >= 1L && stage <= 3L)
      val v = r.getAs[java.sql.Timestamp]("view_ts")
      val c = r.getAs[java.sql.Timestamp]("click_ts")
      val p = r.getAs[java.sql.Timestamp]("purchase_ts")
      if (stage >= 2) assert(c.after(v), "click strictly after view")
      if (stage == 3) assert(p.after(c), "purchase strictly after click")
      if (stage < 3) assert(p == null)
    }
  }

  test("pipeline_token_budget allocates the whole budget exactly") {
    val rows = SamplePlan.pipelineTokenBudget(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("alloc_shards")).sum == 1000L,
      "largest-remainder allocation must sum to the shard budget")
    rows.foreach(r => assert(r.getAs[Long]("extra") <= 1L))
  }

  test("grid_coarsen_2d tiles cover every element exactly once") {
    val rows = GridOps.gridCoarsen2d(spark, sf).collect()
    val totalElems = rows.map(_.getAs[Long]("n")).sum
    val nvecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(totalElems == nvecs * 64, "coarsening must partition the grid")
  }

  test("grid_climatology anomalies sum to ~zero within each phase") {
    val out = GridOps.gridClimatology(spark, sf)
    val sums = out.groupBy("phase").agg(sum(col("anom")).as("s"))
      .collect().map(_.getAs[Double]("s"))
    // per-phase mean subtraction: residual is rounding noise only
    sums.foreach(s => assert(math.abs(s) < 0.01, s"phase residual $s"))
  }
}
