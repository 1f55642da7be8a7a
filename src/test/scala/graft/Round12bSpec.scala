package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 session-2 operators: semantic invariants beyond the
  * DuckDB oracle gate — distribution laws for the JS drift, the ntile
  * law, funnel conservation, bloom FPR bounds, and stream/batch
  * equivalence for the bloom ingest dedup. */
class Round12bSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  // -----------------------------------------------------------------
  // text_js_drift
  // -----------------------------------------------------------------

  test("text_js_drift: JSD is bounded by [0, ln 2] micro-nats") {
    val rows = operators.Drift.textJsDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val jsd = r.getAs[Long]("jsd_unats")
      assert(jsd >= 0L && jsd <= 693148L, s"JSD out of [0, ln2]: $r")
    }
  }

  /** Stage a tiny documents.parquet in a temp dir so the operator
    * itself (not a re-derivation of its formula) runs on a corpus
    * with a KNOWN closed-form answer. */
  private def stagedCorpus(tag: String, docs: Seq[(Long, String, String)]): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_jsd_$tag"
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("text_js_drift: identical distributions give exactly zero divergence") {
    // two sources with the SAME word multiset → P = Q = M → JSD = 0,
    // and the quantization is exact here: every term is
    // qln2 + qln(x) − qln(2x), whose micro-nat rounding errors cancel
    // to at most 1 unat per side
    val dir = stagedCorpus("same", Seq(
      (1L, "a b c a", "s1"), (2L, "a b c a", "s2")))
    operators.Drift.textJsDrift(spark, dir).collect().foreach { r =>
      assert(math.abs(r.getAs[Long]("jsd_unats")) <= 1L,
        s"identical distributions must read ~0: $r")
    }
  }

  test("text_js_drift: disjoint vocabularies read exactly ln 2") {
    // P and Q share no words → every present word has c2 = 0 (term
    // ln2 per unit mass) and every absent word rides the closed-form
    // ln2 mass → JSD = ln 2 to quantization
    val dir = stagedCorpus("disj", Seq(
      (1L, "a b c a", "s1"), (2L, "x y z w", "s2")))
    val rows = operators.Drift.textJsDrift(spark, dir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("jsd_unats") - 693147L) <= 1L,
        s"disjoint distributions must read ln2: $r")
    }
  }

  test("text_js_drift: real corpus rows sit strictly inside (0, ln 2)") {
    operators.Drift.textJsDrift(spark, sf).collect().foreach { r =>
      val jsd = r.getAs[Long]("jsd_unats")
      assert(jsd > 0L && jsd < 693147L)
    }
  }

  // -----------------------------------------------------------------
  // dedup_editdist
  // -----------------------------------------------------------------

  test("dedup_editdist: distances are symmetric-bounded and flag agrees") {
    val rows = operators.EditDist.dedupEditdist(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("edit_dist")
      assert(d >= 0L && d <= 64L, s"distance outside [0, prefix]: $r")
      assert(r.getAs[Boolean]("is_dup") == (d <= 16L))
    }
  }

  test("dedup_editdist: identical prefixes score zero") {
    val df = Seq(("abcd", "abcd"), ("abcd", "abce"), ("", "xy"))
      .toDF("a", "b")
      .select(levenshtein(col("a"), col("b")).as("d"))
      .collect().map(_.getInt(0))
    assert(df.toSeq == Seq(0, 1, 2))
  }

  // -----------------------------------------------------------------
  // sketch_bloom_fpr
  // -----------------------------------------------------------------

  test("sketch_bloom_fpr: one-row report with sane integer invariants") {
    val r = operators.BloomFpr.sketchBloomFpr(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val nBuild = row.getAs[Long]("n_build")
    val bits = row.getAs[Long]("n_bits_set")
    val probes = row.getAs[Long]("n_probes")
    val fps = row.getAs[Long]("n_false_pos")
    assert(nBuild > 0 && probes > 0)
    assert(bits <= math.min(nBuild * 4L, 65536L)) // ≤ n·k draws, ≤ m bits
    assert(fps <= probes)
    assert(row.getAs[Long]("fpr_ppm") == 1000000L * fps / probes)
    assert(row.getAs[Long]("fill_ppm") == 1000000L * bits / 65536L)
  }

  // -----------------------------------------------------------------
  // stream_bloom_dedup
  // -----------------------------------------------------------------

  test("stream_bloom_dedup: stream output equals the batch anti-join") {
    val streamed = operators.BloomFpr.streamBloomDedup(spark, sf)
      .select("doc_id").as[Long].collect().sorted
    val docs = Tables.t(spark, sf, "documents")
    val hist = docs.filter(col("doc_id") % 2 === 0).select(md5(col("text")).as("fp"))
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .join(hist, Seq("fp"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(streamed.toSeq == batch.toSeq)
  }

  // -----------------------------------------------------------------
  // grid_zonal_stats
  // -----------------------------------------------------------------

  test("grid_zonal_stats: zone partition covers the corpus exactly") {
    val zonal = operators.GridOps.gridZonalStats(spark, sf)
      .agg(sum("n"), sum("vsum")).head()
    val li = Tables.t(spark, sf, "lineitem")
    val direct = li.agg(count(lit(1)),
      sum(expr("CAST(l_extendedprice AS DECIMAL(9,2))")).cast("double")).head()
    assert(zonal.getLong(0) == direct.getLong(0))
    assert(math.abs(zonal.getDouble(1) - direct.getDouble(1)) < 1e-6)
  }

  // -----------------------------------------------------------------
  // q39_ntile
  // -----------------------------------------------------------------

  test("q39_ntile: per-nation decile sizes differ by at most one") {
    val rows = queries.Relational.q39Ntile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Any]("c_nationkey")).foreach { case (_, ds) =>
      val sizes = ds.map(_.getAs[Long]("n_cust"))
      assert(sizes.max - sizes.min <= 1L, s"ntile law broken: ${ds.toSeq}")
    }
  }

  test("q39_ntile: deciles are ordered by spend within a nation") {
    val rows = queries.Relational.q39Ntile(spark, sf).collect()
    rows.groupBy(_.getAs[Any]("c_nationkey")).foreach { case (_, ds) =>
      val byDecile = ds.sortBy(_.getAs[Int]("decile"))
      byDecile.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getAs[Double]("spend_min") >= lo.getAs[Double]("spend_max"),
            s"decile ${hi.getAs[Int]("decile")} overlaps ${lo.getAs[Int]("decile")}")
        case _ =>
      }
    }
  }

  // -----------------------------------------------------------------
  // pipeline_dedup_attrition
  // -----------------------------------------------------------------

  test("pipeline_dedup_attrition: stage kills sum exactly to n_docs") {
    val rows = operators.Attrition.pipelineDedupAttrition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("kill_exact") + r.getAs[Long]("kill_near") +
          r.getAs[Long]("n_kept"), s"funnel leak: $r")
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.t(spark, sf, "documents").count())
  }

  // -----------------------------------------------------------------
  // sim_centroid_shift
  // -----------------------------------------------------------------

  test("sim_centroid_shift: drift non-negative, populations cover corpus") {
    val rows = operators.Similarity.simCentroidShift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("drift_sq") >= 0.0)
      assert(r.getAs[Long]("n_vecs") > 0L)
    }
    val covered = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(covered == Tables.t(spark, sf, "embeddings").count())
  }

  // -----------------------------------------------------------------
  // sim_dedup_sweep
  // -----------------------------------------------------------------

  test("sim_dedup_sweep: kept pairs and coverage are monotone in the cut") {
    val rows = operators.Similarity.simDedupSweep(spark, sf)
      .orderBy("tau_ppm").collect()
    assert(rows.length == 9)
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("n_pairs") >= hi.getAs[Long]("n_pairs"))
        assert(lo.getAs[Long]("n_docs") >= hi.getAs[Long]("n_docs"))
      case _ =>
    }
  }

  // -----------------------------------------------------------------
  // text_hapax_ratio / pipeline_length_histogram
  // -----------------------------------------------------------------

  test("text_hapax_ratio: hapaxes bounded by vocabulary") {
    val rows = operators.CorpusStats.textHapaxRatio(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("vocab")
      val h = r.getAs[Long]("n_hapax")
      assert(h >= 0L && h <= v)
      assert(r.getAs[Long]("hapax_ppm") == 1000000L * h / v)
    }
  }

  test("pipeline_length_histogram: buckets are exact binary magnitudes") {
    val hist = operators.CorpusStats.pipelineLengthHistogram(spark, sf)
    assert(hist.agg(sum("n_docs")).head().getLong(0) ==
      Tables.t(spark, sf, "documents").count())
    // every bucket b must satisfy 2^b <= any contained n < 2^(b+1):
    // recompute doc lengths directly and check the bucket arithmetic
    val direct = Tables.t(spark, sf, "documents")
      .select(expr("CAST(size(filter(split(lower(text), ' '), w -> w != '')) AS BIGINT)").as("n"))
      .filter(col("n") > 0)
      .select(col("n"), expr("CAST(length(bin(n)) - 1 AS INT)").as("bucket"))
      .collect()
    direct.foreach { r =>
      val n = r.getAs[Long]("n"); val b = r.getAs[Int]("bucket")
      assert((1L << b) <= n && n < (1L << (b + 1)), s"n=$n bucket=$b")
    }
  }

  test("pipeline_dedup_attrition: exact-stage kills match dedup_exact") {
    val kills = operators.Attrition.pipelineDedupAttrition(spark, sf)
      .agg(sum("kill_exact")).head().getLong(0)
    val expected = functions.TextOps.dedupExact(spark, sf)
      .agg(sum(col("group_size") - 1)).head().getLong(0)
    assert(kills == expected)
  }
}
