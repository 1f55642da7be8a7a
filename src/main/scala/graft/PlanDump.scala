package graft

import org.apache.spark.sql.SparkSession

/** Deliverable tool for the optimization rounds: dump
  * `.explain("formatted")` for named SparkEntry queries into
  * `plans/<round>/<key>_<suffix>.txt` so plan-shape claims in
  * OPTIMIZATION_r*.md are checkable against committed artifacts.
  * Usage:
  *   runMain graft.PlanDump <name[,name...]> [sfDir] [outDir] [suffix]
  *
  * Session config mirrors Bench so the captured plans are the bench's
  * plans. Keys whose builder runs eager staging/drains pay that once
  * here; the dumped plan is the final returned DataFrame's.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "/root/repo/plans/r16"
    val suffix = if (args.length > 3) args(3) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        (s"== $name @ $sfDir (local[$cpus]) ==\n" + txt).getBytes("UTF-8"))
      System.err.println(s"[plandump] wrote $name ($suffix)")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
