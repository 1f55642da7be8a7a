package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EDIT-DISTANCE VERIFICATION of LSH candidates (SURVEY.md §2C): the
  * near-dup verifier for TEMPLATE edits — two boilerplate variants
  * that differ by a few in-place character substitutions keep high
  * Levenshtein similarity while their shingle Jaccard collapses (every
  * 3-gram crossing an edited word changes), so production dedup
  * stacks (the fuzzy-dedup line descending from Lee et al. 2021)
  * verify candidate pairs with BOTH set overlap and sequence edit
  * distance.
  *
  * Consumes the session-staged [[Dedup.minhashPairs]] index-build
  * artifact — the SAME candidate table every other LSH consumer reads
  * (clusters, cross-shard CC, top-m) — and scores each pair with
  * classic Levenshtein over a fixed 64-char prefix. The PREFIX BOUND
  * is the 100 TB posture: edit distance is O(len²) per pair, so
  * unbounded texts make one long-doc pair a straggler; a fixed prefix
  * caps per-pair cost at a constant (and a prefix edit bound is the
  * standard pre-verify in fuzzy-match cascades — survivors can fund
  * a full-length pass). Both engines implement the identical classic
  * DP, so the integer distances gate bit-for-bit.
  *
  * Scale shape: the pair table is bounded by LSH banding (never
  * all-pairs); texts attach via two doc_id equi-joins in which the
  * pair side is the small one (broadcastable); the distance itself is
  * map-side per-row work. No shuffle beyond the two keyed joins.
  */
object EditDist {

  type Q = (SparkSession, String) => DataFrame

  private val PREFIX = 64 // chars of text per side — bounds the O(len²) DP
  private val MAX_DIST = 16 // ≤ 25% of the prefix edited → near-dup

  def dedupEditdist: Q = (s, dir) => {
    val pre = t(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, PREFIX).as("pre"))
    Dedup.dedupMinhashLsh(s, dir).select("id_a", "id_b")
      .join(pre.toDF("id_a", "pre_a"), "id_a")
      .join(pre.toDF("id_b", "pre_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pre_a"), col("pre_b")).cast("long").as("edit_dist"))
      .withColumn("is_dup", col("edit_dist") <= MAX_DIST)
  }

  val dedupEditdistSql: String =
    s"""WITH pairs AS (
       |${Dedup.dedupMinhashLshSql}
       |),
       |pre AS (SELECT doc_id, substring(text, 1, $PREFIX) AS pre FROM documents)
       |SELECT p.id_a, p.id_b,
       |  CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS edit_dist,
       |  CAST(levenshtein(a.pre, b.pre) AS BIGINT) <= $MAX_DIST AS is_dup
       |FROM pairs p
       |JOIN pre a ON a.doc_id = p.id_a
       |JOIN pre b ON b.doc_id = p.id_b""".stripMargin

  val queries: Map[String, Q] = Map("dedup_editdist" -> dedupEditdist)
  val oracles: Map[String, String] = Map("dedup_editdist" -> dedupEditdistSql)
}
