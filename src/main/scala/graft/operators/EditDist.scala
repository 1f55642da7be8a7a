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

  private val MAX_FULL = 32 // full-length near-dup budget (and band width)

  /** FULL-LENGTH ESCALATION of the prefix pre-verify (r13 — r12
    * verdict #4): docs identical in the first [[PREFIX]] chars but
    * divergent after are mis-flagged by the prefix stage alone, so the
    * production cascade funds a SECOND pass for prefix survivors only.
    * The full pass is BANDED Levenshtein with an Ukkonen cutoff —
    * Spark's built-in `levenshtein(l, r, threshold)` walks only the
    * ±threshold diagonal band, O(len·k) per pair instead of O(len²),
    * and returns −1 once the distance provably exceeds the budget.
    * Both engines cap at [[MAX_FULL]]+1 (the "too far to care" rung),
    * so the integer ledger gates bit-for-bit: edit_full is exact
    * wherever it ≤ MAX_FULL and the sentinel cap elsewhere.
    *
    * Scale shape: the escalation input is the PREFIX-SURVIVOR subset
    * of the LSH pair table (strictly smaller than the staged artifact
    * every other consumer reads); full texts attach via two doc_id
    * equi-joins; the banded DP is map-side with per-pair cost bounded
    * by len·MAX_FULL, so one long-doc pair can no longer straggle a
    * task the way an unbanded full DP would. */
  def dedupEditdistFull: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val survivors = dedupEditdist(s, dir)
      .filter(col("edit_dist") <= MAX_DIST)
      .select(col("id_a"), col("id_b"), col("edit_dist").as("edit_prefix"))
    survivors
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("ta")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("tb")), "id_b")
      .withColumn("d", levenshtein(col("ta"), col("tb"), MAX_FULL))
      .select(col("id_a"), col("id_b"), col("edit_prefix"),
        when(col("d") < 0, MAX_FULL + 1).otherwise(col("d"))
          .cast("long").as("edit_full"),
        (col("d") >= 0).as("is_dup"))
  }

  val dedupEditdistFullSql: String =
    s"""WITH pairs AS (
       |${Dedup.dedupMinhashLshSql}
       |),
       |pre AS (SELECT doc_id, substring(text, 1, $PREFIX) AS pre FROM documents),
       |surv AS (
       |  SELECT p.id_a, p.id_b,
       |    CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS edit_prefix
       |  FROM pairs p
       |  JOIN pre a ON a.doc_id = p.id_a
       |  JOIN pre b ON b.doc_id = p.id_b
       |  WHERE levenshtein(a.pre, b.pre) <= $MAX_DIST)
       |SELECT s.id_a, s.id_b, s.edit_prefix,
       |  CAST(LEAST(levenshtein(da.text, db.text), ${MAX_FULL + 1}) AS BIGINT) AS edit_full,
       |  levenshtein(da.text, db.text) <= $MAX_FULL AS is_dup
       |FROM surv s
       |JOIN documents da ON da.doc_id = s.id_a
       |JOIN documents db ON db.doc_id = s.id_b""".stripMargin

  val queries: Map[String, Q] = Map(
    "dedup_editdist" -> dedupEditdist,
    "dedup_editdist_full" -> dedupEditdistFull)
  val oracles: Map[String, String] = Map(
    "dedup_editdist" -> dedupEditdistSql,
    "dedup_editdist_full" -> dedupEditdistFullSql)
}
