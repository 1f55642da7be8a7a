package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the StreamStage drain partition policy over REAL
  * SparkEntry keys in one warm session (r17 guide §1: session-level
  * ambient noise swamps cross-session comparisons at sf0.1, so the
  * only trustworthy per-key evidence is same-session interleaving).
  * Usage: runMain graft.StreamAb <sfDir> <reps> key1,key2,...
  * Not part of the driver contract.
  */
object StreamAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val keys = args(2).split(",").toSeq
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
    keys.foreach { k =>
      val fn = SparkEntry.queries(k)
      // warm both variants once
      Seq("on", "off").foreach { v =>
        System.setProperty("graft.stream.adapt", v)
        fn(spark, dir).count()
        spark.sharedState.cacheManager.clearCache()
      }
      val res = scala.collection.mutable.Map("on" -> Vector.empty[Double],
        "off" -> Vector.empty[Double])
      (1 to reps).foreach { _ =>
        Seq("on", "off").foreach { v =>
          System.setProperty("graft.stream.adapt", v)
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          res(v) = res(v) :+ (System.nanoTime() - t0) / 1e9
          spark.sharedState.cacheManager.clearCache()
        }
      }
      Seq("on", "off").foreach { v =>
        val ts = res(v).sorted
        println(f"[ab] $k%-28s $v%-3s med=${ts(ts.length / 2)}%.3f  " +
          res(v).map(t => f"$t%.2f").mkString(" "))
      }
    }
    System.clearProperty("graft.stream.adapt")
    spark.stop()
  }
}
