package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-shard manifest (SURVEY.md §2C): the bookkeeping record a
  * 100 TB shard layout ships alongside the data — per shard: document
  * count, token count, id range, and an order-independent content
  * digest (md5 over the sorted per-doc hashes) that a reader can
  * recompute to detect corruption/drift without trusting file sizes.
  *
  * Shard assignment is a pure computed key (first hex char of a salted
  * doc-id md5 → 16 shards here; widen the prefix for 256/4096/… at
  * scale), so placement is reproducible from the id alone — no
  * coordination, no sort, and the manifest is ONE partial-aggregating
  * groupBy over the corpus. The per-shard digest sorts only the
  * per-doc hashes WITHIN a shard; the hash prefix keys shards
  * uniformly, so per-group state is corpus/n_shards with no skew.
  */
object ShardManifest {

  type Q = (SparkSession, String) => DataFrame

  def pipelineShardManifest: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(
        substring(md5(concat(lit("shard:"), col("doc_id").cast(StringType))), 1, 1).as("shard"),
        col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("ntok"),
        md5(col("text")).as("h"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        md5(concat_ws(",", array_sort(collect_list(col("h"))))).as("content_hash"))

  val pipelineShardManifestSql: String =
    """SELECT substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |  MIN(doc_id) AS min_doc_id,
      |  MAX(doc_id) AS max_doc_id,
      |  md5(string_agg(md5(text), ',' ORDER BY md5(text))) AS content_hash
      |FROM documents
      |GROUP BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "pipeline_shard_manifest" -> pipelineShardManifest)
  val oracles: Map[String, String] = Map(
    "pipeline_shard_manifest" -> pipelineShardManifestSql)
}
