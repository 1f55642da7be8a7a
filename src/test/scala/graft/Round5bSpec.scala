package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 second-session additions: mode-without-window, range
  * search, skew-safe commonness join, grid cumsum/weighted mean,
  * snapshot diff, streaming decontamination. Pins the plan properties
  * each one's 100 TB posture depends on. */
class Round5bSpec extends AnyFunSuite {
  import TestSession._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q37_mode plans two hash aggregates, no window, no range shuffle") {
    val p = planOf("q37_mode")
    assert(!p.contains("Window"), "mode fell back to a window formulation")
    assert(!p.contains("rangepartitioning"), "mode plan range-shuffles")
    assert(p.contains("partial_"), "mode lost map-side partial aggregation")
  }

  test("sim_range_search is map-only: broadcast join, zero shuffle") {
    val p = planOf("sim_range_search")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "query set not broadcast")
    assert(!p.contains("hashpartitioning"),
      s"range search acquired a shuffle:\n${p.take(600)}")
  }

  test("text_commonness joins the hot head broadcast, tail by shuffle") {
    val p = planOf("text_commonness")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 2, s"head/anti joins not broadcast (found $bhj)")
  }

  test("grid_cumsum window is partitioned by cell, not a global sort") {
    val p = planOf("grid_cumsum")
    assert(p.contains("Window"), "cumsum lost its window")
    assert("hashpartitioning\\(cell".r.findFirstIn(p).isDefined,
      "cumsum window not partitioned by cell")
  }

  test("grid_weighted_mean covers every full time step with 24 cells") {
    val out = SparkEntry.queries("grid_weighted_mean")(spark, sf).cache()
    val n = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(out.count() == (n + 23) / 24)
    // all steps but possibly the ragged last one aggregate 24 cells
    assert(out.filter(col("n_cells") =!= 24).count() <= 1)
  }

  test("pipeline_dataset_diff statuses partition both snapshot sides") {
    val by = SparkEntry.queries("pipeline_dataset_diff")(spark, sf)
      .groupBy("status").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val v1 = spark.read.parquet(s"$sf/documents.parquet").count()
    // removed + changed + unchanged = |v1|; added is the clone slice
    assert(by.getOrElse("removed", 0L) + by.getOrElse("changed", 0L)
      + by.getOrElse("unchanged", 0L) == v1)
    assert(by.getOrElse("added", 0L) > 0, "clone slice empty at this sf")
    assert(by.getOrElse("removed", 0L) > 0, "removal slice empty at this sf")
  }

  test("nc_groups: group option scopes the schema and composes with pruning") {
    // run the query once to materialize the grouped dataset
    SparkEntry.queries("nc_groups")(spark, sf).collect()
    val out = "/tmp/graft_nc/" + spark.sparkContext.applicationId +
      s"/${sf.replaceAll("[^A-Za-z0-9.]", "_")}/groups"
    val fc = spark.read.format("graft.sources.netcdf.NetCDF3Source")
      .option("group", "fc").load(out)
    assert(fc.columns.toSet == Set("record", "fc/price", "fc/disc"))
    // projection within the group prunes further (header-level scan schema)
    val p = fc.select(col("fc/price")).queryExecution.executedPlan.toString
    assert(!p.contains("fc/disc") && !p.contains("obs/"),
      "group scan reads variables outside the projection")
  }

  test("pipeline_pack_mask: every non-final bin per source is exactly full") {
    val out = SparkEntry.queries("pipeline_pack_mask")(spark, sf).cache()
    val lastBin = out.groupBy("source").agg(max("bin_id").as("last"))
    val nonFinal = out.join(lastBin, Seq("source"))
      .filter(col("bin_id") =!= col("last"))
    assert(nonFinal.filter(col("n_pad") =!= 0).count() == 0,
      "a non-final bin has padding — packing left a hole")
    assert(out.filter(col("n_segments") < 1).count() == 0)
  }

  test("sketch_bucket_min estimates within 30% of the exact count") {
    val r = SparkEntry.queries("sketch_bucket_min")(spark, sf).head()
    val est = r.getAs[Long]("est_distinct").toDouble
    val exact = r.getAs[Long]("exact_distinct").toDouble
    assert(exact > 0 && math.abs(est - exact) / exact < 0.30,
      s"bucket-min estimate $est too far from exact $exact")
  }

  test("text_char_diversity is map-only with gini in [0, 1]") {
    val p = planOf("text_char_diversity")
    assert(!p.contains("Exchange"), "char diversity acquired a shuffle")
    val out = SparkEntry.queries("text_char_diversity")(spark, sf)
    assert(out.filter(col("gini") < 0 || col("gini") > 1).count() == 0)
  }

  test("stream_contamination equals the batch decontamination pass") {
    val stream = SparkEntry.queries("stream_contamination")(spark, sf)
    val batch = SparkEntry.queries("pipeline_contamination")(spark, sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "streaming twin diverged from the batch pass")
  }
}
