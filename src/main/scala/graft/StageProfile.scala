package graft

import org.apache.spark.sql.SparkSession

/** Times Staged.prestage (wall + per-tag own-thread latency) the way
  * Bench runs it. Usage: runMain graft.StageProfile <sfDir>
  * Not part of the driver contract. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // force operator object initializers (registrations), as Bench does
    SparkEntry.queries.size
    val t0 = System.nanoTime()
    val staged = graft.operators.Staged.prestage(spark, dir)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[stageprof] wall=$wall%.1f s over ${staged.size} artifacts")
    println("[stageprof] " + staged.sortBy(-_._2)
      .map { case (t, sec) => f"$t=$sec%.2f" }.mkString(" "))
    spark.stop()
  }
}
