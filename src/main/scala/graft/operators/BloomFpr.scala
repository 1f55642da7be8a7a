package graft.operators

import graft.Tables._
import graft.streaming.StreamStage
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter INSTRUMENTATION and the streaming ingest-dedup shape
  * built on it (SURVEY.md §2C/§2D).
  *
  * `sketch_bloom_fpr` — MEASURED false-positive rate of a Bloom
  * filter: the number a pipeline must know before trusting a sketch
  * to pre-prune a 100 TB corpus (an undersized filter silently sends
  * the whole corpus through the expensive exact path). Built
  * relationally so both engines materialize the IDENTICAL bit array:
  * k=4 bit positions per key from independent md5 draws
  * (conv(hex,16,10) mod m — the house md5-threshold device), the
  * array itself as the DISTINCT position set (m-bounded: ≤ 65536
  * rows, broadcastable no matter the corpus), and a probe hits iff
  * all k of its positions are set. Probes are restricted to TRUE
  * NEGATIVES (texts absent from the build split) so every hit is by
  * construction a false positive; the report is one row of exact
  * integers — measured fpr_ppm vs the fill ratio that determines it.
  *
  * `stream_bloom_dedup` — STATELESS streaming ingest dedup: the
  * historical corpus' content fingerprints are the offline artifact
  * (staged once per session, the LSH-pair-table discipline), compiled
  * into the optimizer's own Bloom sketch ([[BloomKeep.buildBloom]])
  * and broadcast to the stream as a map-side pre-filter. Arrivals the
  * sketch clears ("definitely new") pass straight through with ZERO
  * join work — at production fill ratios that is almost every row;
  * only "maybe seen" rows take the exact stream-static join against
  * the fingerprint table, and a left-outer + IS NULL keeps exactly
  * the false positives (stream-static left-outer is append-safe —
  * the static side never changes). The sketch changes the PLAN,
  * never the answer: output = the plain anti-join's, which is what
  * the oracle checks. No watermark, no state store — wire-speed
  * ingest dedup forever.
  */
object BloomFpr {

  type Q = (SparkSession, String) => DataFrame

  private val M = 65536 // bits (2^16 — positions are 20-bit draws mod M)
  private val K = 4     // hash functions

  /** k bit positions of a hex-fp key as an exploded (fp, pos) frame.
    * Position j = conv(first 5 hex chars of md5(j || ':' || fp)) mod M
    * — independent uniform draws, exact in both engines. */
  private def positions(keys: DataFrame): DataFrame = {
    val posCols = (0 until K).map(j =>
      graft.functions.HashExpressions.md5_head(concat(lit(s"$j:"), col("fp")), 5) % M)
    keys.select(col("fp"), explode(array(posCols: _*)).as("pos"))
  }

  private def positionsSql(src: String): String = {
    val arr = (0 until K).map(j =>
      s"CAST('0x' || substr(md5('$j:' || fp), 1, 5) AS BIGINT) % $M").mkString(", ")
    s"SELECT fp, unnest([$arr]) AS pos FROM ($src)"
  }

  def sketchBloomFpr: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val build = docs.filter(col("doc_id") % 2 === 0)
      .select(md5(col("text")).as("fp")).distinct()
      .cache() // feeds the bit array, the anti-join, and its own count
    val bits = positions(build).select("pos").distinct()
      .cache() // the bit array (≤ M rows): probe join + fill count
    // true negatives only: probe fps absent from the build split
    val probe = docs.filter(col("doc_id") % 2 === 1)
      .select(md5(col("text")).as("fp")).distinct()
      .join(build, Seq("fp"), "left_anti")
      .cache() // feeds the hit scan and its own count
    val hits = positions(probe)
      .join(broadcast(bits), Seq("pos"), "left_semi")
      .groupBy("fp").agg(count(lit(1)).as("set_k"))
      .filter(col("set_k") === K)
    build.agg(count(lit(1)).as("n_build")).crossJoin(
        bits.agg(count(lit(1)).as("n_bits_set")))
      .crossJoin(probe.agg(count(lit(1)).as("n_probes")))
      .crossJoin(hits.agg(count(lit(1)).as("n_false_pos")))
      .select(col("n_build"), col("n_bits_set"), col("n_probes"), col("n_false_pos"),
        expr("(1000000 * n_false_pos) DIV greatest(n_probes, 1)").as("fpr_ppm"),
        expr(s"(1000000 * n_bits_set) DIV $M").as("fill_ppm"))
  }

  val sketchBloomFprSql: String =
    s"""WITH build AS (
       |  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 2 = 0),
       |bits AS (
       |  SELECT DISTINCT pos FROM (${positionsSql("SELECT fp FROM build")})),
       |probe AS (
       |  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 2 = 1
       |  AND md5(text) NOT IN (SELECT fp FROM build)),
       |hits AS (
       |  SELECT fp FROM (${positionsSql("SELECT fp FROM probe")}) p
       |  WHERE pos IN (SELECT pos FROM bits)
       |  GROUP BY fp HAVING COUNT(*) = $K)
       |SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM build) AS n_build,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM probe) AS n_probes,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_false_pos,
       |  (1000000 * (SELECT COUNT(*) FROM hits))
       |    // GREATEST((SELECT COUNT(*) FROM probe), 1) AS fpr_ppm,
       |  (1000000 * (SELECT COUNT(*) FROM bits)) // $M AS fill_ppm""".stripMargin

  // offline artifacts: historical fingerprints + their Bloom sketch
  private def stagedHist(s: SparkSession, dir: String): DataFrame =
    Staged.table(s, dir, "bloom_hist") {
      t(s, dir, "documents").filter(col("doc_id") % 2 === 0)
        .select(md5(col("text")).as("fp")).distinct()
    }
  Staged.register("bloom_hist")((s, dir) => { stagedHist(s, dir); () })

  def streamBloomDedup: Q = (s, dir) => {
    val hist = stagedHist(s, dir)
    val bloom = BloomKeep.buildBloom(hist, "fp", estimatedItems = 1000000L)
    val sch = s.read.parquet(s"$dir/documents.parquet").schema
    StreamStage.withStaged(s, "sbld", dir, "documents.parquet") { stageDir =>
      val arrivals = s.readStream.schema(sch).parquet(stageDir)
        .filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("source"), md5(col("text")).as("fp"))
      val definitelyNew = arrivals.filter(!BloomKeep.mightContain(bloom, "fp"))
      val verified = arrivals.filter(BloomKeep.mightContain(bloom, "fp"))
        .join(hist.withColumnRenamed("fp", "hist_fp"),
          col("fp") === col("hist_fp"), "left_outer")
        .filter(col("hist_fp").isNull)
        .drop("hist_fp")
      graft.streaming.StreamStage.drain(s, "bld")(definitelyNew.union(verified)
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_bld"))
    }
    s.table("graft_stream_bld")
  }

  val streamBloomDedupSql: String =
    """SELECT doc_id, source, md5(text) AS fp
      |FROM documents
      |WHERE doc_id % 2 = 1
      |  AND md5(text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id % 2 = 0)"""
      .stripMargin

  val queries: Map[String, Q] = Map(
    "sketch_bloom_fpr" -> sketchBloomFpr,
    "stream_bloom_dedup" -> streamBloomDedup)
  val oracles: Map[String, String] = Map(
    "sketch_bloom_fpr" -> sketchBloomFprSql,
    "stream_bloom_dedup" -> streamBloomDedupSql)
}
