package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-shard global dedup composition (SURVEY §7 candidate → §2C):
  * a corpus arrives as shards (the `source` column — crawls, curated
  * sets, dumps), and near-duplicates must be resolved GLOBALLY with a
  * shard preference: when a curated shard and a crawl carry copies of
  * the same document, the curated copy must win regardless of which
  * doc_id is smaller.
  *
  * One query composes the oracle-checked stages end to end:
  * corpus-wide MinHash-LSH candidate pairs (already cross-shard — the
  * band buckets ignore shard boundaries) → verified-Jaccard edges →
  * min-label connected components where the initial label packs shard
  * priority above doc_id (`prio · 2⁴⁰ + doc_id`), so the propagated
  * minimum IS the preferred-shard canonical → per-cluster provenance
  * (size, shard span) and the keep decision.
  *
  * Scale: identical shuffle shapes to dedup_clusters (bucketed pair
  * generation, O(diameter) bounded label rounds, doc_id-keyed joins);
  * the priority table is shard-cardinality (broadcast). The label
  * encoding assumes doc_id < 2⁴⁰ (10¹² docs) and #shards < 2²³ —
  * asserted at runtime so a violation fails loudly, never mislabels.
  */
object CrossShard {

  type Q = (SparkSession, String) => DataFrame

  private val ID_SPACE = 1L << 40

  def dedupCrossShard: Q = (s, dir) => {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
    // deterministic shard preference: alphabetical source order (a
    // real pipeline would join a curation-tier table; any total order
    // replays identically in the oracle)
    val prio = docs.select("source").distinct()
      .withColumn("prio", (row_number().over(Window.orderBy("source")) - 1).cast(LongType))
    val nodes = docs.join(broadcast(prio), Seq("source"))
      .select(col("doc_id").as("id"),
        when(col("doc_id") >= ID_SPACE || col("prio") >= (1L << 23),
          raise_error(concat(lit("cross-shard label overflow: doc_id="), col("doc_id"),
            lit(" prio="), col("prio"))))
          .otherwise(col("prio") * ID_SPACE + col("doc_id"))
          .as("label"))
    val edges = Dedup.dedupMinhashLsh(s, dir)
      .filter(col("jaccard") >= 0.2)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val cc = DedupClusters.connectedComponentsLabeled(nodes, edges)
      .select(col("id").as("doc_id"), (col("canonical") % ID_SPACE).as("canonical_id"))
    val clusterStats = cc.join(docs, Seq("doc_id"))
      .groupBy("canonical_id")
      .agg(count(lit(1)).as("cluster_size"),
        countDistinct(col("source")).as("n_sources"))
    val canonSource = docs
      .select(col("doc_id").as("canonical_id"), col("source").as("canonical_source"))
    cc.join(docs, Seq("doc_id"))
      .join(canonSource, Seq("canonical_id"))
      .join(clusterStats, Seq("canonical_id"))
      .select(col("doc_id"), col("source"), col("canonical_id"),
        col("canonical_source"), col("cluster_size"), col("n_sources"),
        (col("doc_id") === col("canonical_id")).as("kept"))
  }

  val dedupCrossShardSql: String = {
    val pairSql = Dedup.dedupMinhashLshSql
    s"""WITH RECURSIVE pairs AS ($pairSql),
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs WHERE jaccard >= 0.2),
       |sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
       |prio AS (
       |  SELECT source, CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS prio
       |  FROM (SELECT DISTINCT source FROM documents)),
       |lab AS (
       |  SELECT d.doc_id, p.prio * $ID_SPACE + d.doc_id AS label
       |  FROM documents d JOIN prio p USING (source)),
       |reach(v, r) AS (
       |  SELECT doc_id, label FROM lab
       |  UNION
       |  SELECT sym.b, reach.r FROM sym JOIN reach ON reach.v = sym.a),
       |cc AS (
       |  SELECT v AS doc_id, MIN(r) % $ID_SPACE AS canonical_id
       |  FROM reach GROUP BY v),
       |stats AS (
       |  SELECT canonical_id, COUNT(*) AS cluster_size,
       |    COUNT(DISTINCT d.source) AS n_sources
       |  FROM cc JOIN documents d USING (doc_id) GROUP BY canonical_id)
       |SELECT cc.doc_id, d.source, cc.canonical_id, cd.source AS canonical_source,
       |  CAST(stats.cluster_size AS BIGINT) AS cluster_size,
       |  CAST(stats.n_sources AS BIGINT) AS n_sources,
       |  cc.doc_id = cc.canonical_id AS kept
       |FROM cc
       |JOIN documents d USING (doc_id)
       |JOIN documents cd ON cd.doc_id = cc.canonical_id
       |JOIN stats USING (canonical_id)""".stripMargin
  }

  val queries: Map[String, Q] = Map("dedup_crossshard" -> dedupCrossShard)
  val oracles: Map[String, String] = Map("dedup_crossshard" -> dedupCrossShardSql)
}
