package graft.functions

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed cardinality sketch (SURVEY.md §2C): KMV (k-minimum
  * values). The estimator keeps the k smallest distinct hash values of
  * the key; if h_k is the k-th smallest as a fraction of the hash
  * space, distinct ≈ (k-1)/h_k. Unlike HLL, KMV is an order statistic
  * of md5 values — fully deterministic given the data — so the DuckDB
  * oracle replays the estimate bit-for-bit (cross-engine-checkable
  * sketching; an HLL would diverge by implementation).
  *
  * Scale shape: hash map-side, one distinct shuffle on uniform md5
  * keys, then TakeOrderedAndProject(k) — each task contributes only
  * its local k smallest, the driver merges k·tasks rows. The sketch
  * is mergeable the same way across datasets (union the k-min sets,
  * re-take k).
  */
object Sketches {

  type Q = (SparkSession, String) => DataFrame

  private val K = 256
  /** 15 hex chars = 60 bits; hash space size 2^60 (exact as a double). */
  private val SPACE = "1152921504606846976.0"

  def sketchKmvDistinct: Q = (s, dir) => {
    val hashes = t(s, dir, "lineitem")
      .select(conv(substring(md5(col("l_orderkey").cast(StringType)), 1, 15), 16, 10)
        .cast(LongType).as("h"))
      .distinct()
    val topk = hashes.orderBy("h").limit(K)
    val sk = topk.agg(max(col("h")).as("hk"), count(lit(1)).as("k"))
    val exact = t(s, dir, "lineitem")
      .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
    sk.crossJoin(exact)
      .select(col("k"), col("hk"),
        ((col("k") - 1).cast(DoubleType) * expr(SPACE) / col("hk").cast(DoubleType))
          .as("est_distinct"),
        col("exact_distinct"))
  }

  val sketchKmvDistinctSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM lineitem),
       |topk AS (SELECT h FROM h ORDER BY h LIMIT $K),
       |agg AS (SELECT MAX(h) AS hk, COUNT(*) AS k FROM topk),
       |ex AS (SELECT COUNT(DISTINCT l_orderkey) AS exact_distinct FROM lineitem)
       |SELECT k, hk,
       |  CAST(k - 1 AS DOUBLE) * $SPACE / CAST(hk AS DOUBLE) AS est_distinct,
       |  exact_distinct
       |FROM agg CROSS JOIN ex""".stripMargin

  /** Exact grouped quantiles: p25/p50/p75/p95 of l_quantity per return
    * flag, linear interpolation at rank p·(n-1) — the same definition
    * DuckDB's quantile_cont uses, and l_quantity is integer-valued, so
    * the interpolation arithmetic is bit-identical cross-engine.
    *
    * Scale note: Spark's exact `percentile` buffers a value→count map
    * per group — fine for bounded-cardinality domains like quantities,
    * prices-in-cents, or token counts (the common pipeline cases). For
    * unbounded continuous domains the 100 TB path is
    * `percentile_approx` (t-digest, constant memory); it is not
    * cross-engine replayable, which is why the oracle-checked query
    * uses the exact form. */
  def sketchQuantile: Q = (s, dir) =>
    t(s, dir, "lineitem").groupBy("l_returnflag").agg(
      expr("percentile(l_quantity, 0.25D)").as("p25"),
      expr("percentile(l_quantity, 0.5D)").as("p50"),
      expr("percentile(l_quantity, 0.75D)").as("p75"),
      expr("percentile(l_quantity, 0.95D)").as("p95"))

  val sketchQuantileSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  quantile_cont(l_quantity, 0.95) AS p95
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  val queries: Map[String, Q] = Map(
    "sketch_kmv_distinct" -> sketchKmvDistinct,
    "sketch_quantile" -> sketchQuantile)
  val oracles: Map[String, String] = Map(
    "sketch_kmv_distinct" -> sketchKmvDistinctSql,
    "sketch_quantile" -> sketchQuantileSql)
}
