package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-key timer for the session workflow: times the named
  * keys N times each at one scale dir in a single warm session,
  * printing every sample (NOT just the min) so staging-vs-steady-state
  * cost splits are visible. Usage:
  *   runMain graft.TimeKeys <sfDir> <n> key1,key2,...
  */
object TimeKeys {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val keys = args(2).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { k =>
      val fn = SparkEntry.queries(k)
      val samples = (1 to n).map { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        t
      }
      println(f"[timekeys] $k%-28s ${samples.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
