package graft

import graft.operators.{CrossShard, DedupClusters}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CrossShardSpec extends AnyFunSuite {
  import TestSession._

  private lazy val result = CrossShard.dedupCrossShard(spark, sf).cache()

  test("every cluster keeps exactly its canonical doc") {
    val kept = result.filter(col("kept")).count()
    val canon = result.select("canonical_id").distinct().count()
    assert(kept == canon)
    assert(result.filter(col("kept") && col("doc_id") =!= col("canonical_id")).count() == 0)
  }

  test("canonical doc has the cluster's min (shard priority, doc_id)") {
    // sources sort alphabetically = priority order; the canonical's
    // (source, doc_id) must be the lexicographic minimum of its cluster
    val viol = result.groupBy("canonical_id")
      .agg(min(struct(col("source"), col("doc_id"))).as("best"),
        first(col("canonical_source")).as("cs"))
      .join(result.filter(col("kept"))
        .select(col("canonical_id"), struct(col("source"), col("doc_id")).as("own")),
        Seq("canonical_id"))
      .filter(col("best") =!= col("own"))
      .count()
    assert(viol == 0)
  }

  test("partition matches dedup_clusters (only the canonical choice differs)") {
    val byPrio = result.select(col("doc_id"), col("canonical_id").as("p"))
    val byId = DedupClusters.dedupClusters(spark, sf)
      .select(col("doc_id"), col("canonical_id").as("q"))
    // same equivalence classes: every (p-cluster, q-cluster) pairing is 1:1
    val pq = byPrio.join(byId, "doc_id").select("p", "q").distinct()
    assert(pq.groupBy("p").count().filter(col("count") > 1).count() == 0)
    assert(pq.groupBy("q").count().filter(col("count") > 1).count() == 0)
  }

  test("cross-shard clusters exist and report their shard span") {
    assert(result.filter(col("n_sources") > 1).count() > 0,
      "expected at least one cross-shard near-dup cluster at sf0.001")
    assert(result.filter(col("cluster_size") < col("n_sources")).count() == 0)
  }
}
