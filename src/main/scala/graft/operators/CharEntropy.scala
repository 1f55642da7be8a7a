package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-document CHARACTER ENTROPY (SURVEY.md §2C) — the Shannon
  * entropy of the character distribution, a standard cheap quality
  * signal: template spam, padding runs, and encoding garbage all
  * collapse the char distribution (low entropy), while natural text
  * sits in a tight per-language band. Used beside length/punct ratios
  * in published heuristic batteries.
  *
  * Cross-engine-exact form:  H = (1/n) · Σ_c c·(ln n − ln c)  over
  * per-char counts c, with both logarithms quantized PER ROW to
  * integer micro-nats (round(1e6·ln k) of an integer k — the
  * DSIR/Zipf 1e-6-grid posture), so Σ c·(λ(n) − λ(c)) is exact
  * BIGINT and the reported entropy is the integer division
  * `sum DIV n` in micro-nats. Both engines agree bit-for-bit.
  *
  * Scale shape: char counting is MAP-SIDE (explode the doc's own
  * char array — rows never cross), the per-(doc, char) partial agg
  * is the only corpus-sized shuffle, and the per-doc rollup is one
  * more partial agg. Nothing joins, nothing sorts.
  */
object CharEntropy {

  type Q = (SparkSession, String) => DataFrame

  def textCharEntropy: Q = (s, dir) => {
    val counts = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    counts.groupBy("doc_id")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
        sum(col("c") * expr("CAST(round(1e6 * ln(CAST(c AS DOUBLE))) AS BIGINT)"))
          .as("sum_clnc"))
      .select(col("doc_id"), col("n").as("n_chars_counted"), col("n_distinct"),
        expr("(n * CAST(round(1e6 * ln(CAST(n AS DOUBLE))) AS BIGINT) - sum_clnc) DIV n")
          .as("entropy_unats"))
  }

  val textCharEntropySql: String =
    """WITH counts AS (
      |  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
      |  WHERE ch <> ''
      |  GROUP BY doc_id, ch),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |    CAST(SUM(c * CAST(round(1e6 * ln(CAST(c AS DOUBLE))) AS BIGINT)) AS BIGINT)
      |      AS sum_clnc
      |  FROM counts GROUP BY doc_id)
      |SELECT doc_id, n AS n_chars_counted, n_distinct,
      |  (n * CAST(round(1e6 * ln(CAST(n AS DOUBLE))) AS BIGINT) - sum_clnc) // n
      |    AS entropy_unats
      |FROM agg""".stripMargin

  /** STREAMING twin (r12): the batch key's per-(doc,char) groupBy
    * would need per-doc state on a stream, so the whole entropy
    * computation FUSES into one map-side expression chain over each
    * row's own char array (distinct chars, per-char counts, the same
    * micro-nat quantization) — STATELESS append mode, zero state
    * store. Output and oracle shared verbatim with the batch key. */
  def streamCharEntropy: Q = (s, dir) => {
    import org.apache.spark.sql.types.LongType
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    graft.streaming.StreamStage.withStaged(s, "sce", dir, "documents.parquet") { stageDir =>
      val out = s.readStream.schema(sch).parquet(stageDir)
        .withColumn("cs", expr("filter(split(text, ''), ch -> ch != '')"))
        .filter(size(col("cs")) > 0) // batch emits no row for char-free docs
        .withColumn("dc", expr("array_distinct(cs)"))
        // r16 optimization: counts_in is the O(n+k) hash-count twin of
        // `transform(dc, d -> cast(size(filter(cs, x -> x = d)) as
        // bigint))` — the HOF form re-scanned the full char array per
        // distinct char (quadratic per doc) through interpreted lambda
        // dispatch; result equivalence is pinned in Round16OptSpec
        .withColumn("cnts",
          graft.functions.CountsIn.counts_in(col("cs"), col("dc")))
        .select(col("doc_id"),
          size(col("cs")).cast(LongType).as("n_chars_counted"),
          size(col("dc")).cast(LongType).as("n_distinct"),
          expr("(cast(size(cs) as bigint) * CAST(round(1e6 * ln(CAST(size(cs) AS DOUBLE))) AS BIGINT)" +
            " - aggregate(cnts, cast(0 as bigint)," +
            " (acc, c) -> acc + c * CAST(round(1e6 * ln(CAST(c AS DOUBLE))) AS BIGINT)))" +
            " DIV cast(size(cs) as bigint)").as("entropy_unats"))
      graft.streaming.StreamStage.drain(s, "ce")(out.writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_ce"))
    }
    s.table("graft_stream_ce")
  }

  val queries: Map[String, Q] = Map(
    "text_char_entropy" -> textCharEntropy,
    "stream_char_entropy" -> streamCharEntropy)
  val oracles: Map[String, String] = Map(
    "text_char_entropy" -> textCharEntropySql,
    "stream_char_entropy" -> textCharEntropySql)
}
