package graft.operators

import graft.Tables._
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Keep-list application with a Bloom-filter pre-prune (SURVEY.md
  * §2C) — the 100 TB shape for "apply a billion-row keep-list to the
  * corpus": a semi-join alone shuffles the FULL corpus on doc_id; with
  * a Bloom pre-filter the corpus side is pruned map-side to
  * |keep| + false positives before any exchange, and the exact
  * semi-join then removes the false positives, so the result is
  * EXACTLY the plain semi-join's (which is what the oracle checks —
  * the sketch changes the plan, never the answer).
  *
  * Spark-first: this is precisely what Catalyst's runtime row-level
  * filtering (InjectRuntimeFilter) does inside one query; here the
  * filter must cross a query boundary (keep-lists are computed once
  * and applied to many corpus reads), so we build the same
  * `BloomFilterAggregate` the optimizer uses and re-attach it with
  * `BloomFilterMightContain`. Collecting the sketch to the driver is
  * constant-size (the filter's bits, not the keys) — the same traffic
  * a broadcast would carry.
  */
object BloomKeep {

  type Q = (SparkSession, String) => DataFrame

  /** Build the optimizer's own Bloom filter over `keyCol` of `keys`. */
  def buildBloom(keys: DataFrame, keyCol: String, estimatedItems: Long): Array[Byte] =
    keys.select(GraftBridge.column(
        new BloomFilterAggregate(
          new XxHash64(Seq(GraftBridge.expression(col(keyCol)))), estimatedItems)
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** might_contain(bloom, xxhash64(keyCol)) as a filter Column. */
  def mightContain(bloom: Array[Byte], keyCol: String): org.apache.spark.sql.Column =
    GraftBridge.column(
      BloomFilterMightContain(Literal(bloom, BinaryType),
        new XxHash64(Seq(GraftBridge.expression(col(keyCol))))))

  def pipelineKeepBloom: Q = (s, dir) => {
    val keep = TextOps.dedupExact(s, dir)
      .select(col("keep_id").as("doc_id")).cache() // bloom build + exact join
    val bloom = buildBloom(keep, "doc_id", estimatedItems = 1000000L)
    t(s, dir, "documents")
      .select("doc_id", "source", "n_chars")
      .filter(mightContain(bloom, "doc_id")) // map-side prune at the scan
      .join(keep, Seq("doc_id"), "left_semi") // exactness: drop false positives
  }

  val pipelineKeepBloomSql: String =
    s"""WITH e AS (${TextOps.dedupExactSql})
       |SELECT d.doc_id, d.source, d.n_chars
       |FROM documents d
       |WHERE d.doc_id IN (SELECT keep_id FROM e)""".stripMargin

  val queries: Map[String, Q] = Map("pipeline_keep_bloom" -> pipelineKeepBloom)
  val oracles: Map[String, String] = Map("pipeline_keep_bloom" -> pipelineKeepBloomSql)
}
