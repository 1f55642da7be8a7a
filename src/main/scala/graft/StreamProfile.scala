package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling tool for the streaming-drain fixed cost (r17 guide §1:
  * measure first): INTERLEAVED A/B of drain variants within ONE warm
  * session, so session-level ambient noise cannot masquerade as a
  * variant effect (the r16 lesson: cross-session comparisons at this
  * SF are ±30%). Variants, round-robin per repetition:
  *   base  — temp checkpoint (disk /tmp), default confs
  *   shm   — checkpoint on /dev/shm
  *   conf  — temp checkpoint + noDataMicroBatches=false +
  *           stateStore.maintenanceInterval=1h
  *   both  — shm checkpoint + the two confs
  * Usage: runMain graft.StreamProfile <sfDir> <reps> [stateful|stateless]
  * Not part of the driver contract.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val stateful = args.length <= 2 || args(2) == "stateful"
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
    val sch = spark.read.parquet(s"$dir/documents.parquet").schema

    val seq = new java.util.concurrent.atomic.AtomicLong(0)
    def drain(ckptRoot: Option[String], confs: Boolean, parts: Int = 0): Double = {
      val conf = spark.conf
      val noData = "spark.sql.streaming.noDataMicroBatches.enabled"
      val maint = "spark.sql.streaming.stateStore.maintenanceInterval"
      val sp = "spark.sql.shuffle.partitions"
      val oldND = conf.getOption(noData); val oldM = conf.getOption(maint)
      val oldSp = conf.get(sp)
      if (confs) { conf.set(noData, "false"); conf.set(maint, "1h") }
      if (parts > 0) conf.set(sp, parts.toString)
      val t0 = System.nanoTime()
      try {
        graft.streaming.StreamStage.withStaged(spark, "p" + seq.incrementAndGet(), dir,
          "documents.parquet") { stageDir =>
          val src = spark.readStream.schema(sch).parquet(stageDir)
          val out =
            if (stateful) src.groupBy("source").agg(count(lit(1)).as("n"))
            else src.select(col("doc_id"), col("source"))
          var w = out.writeStream
            .outputMode(if (stateful) "complete" else "append")
            .format("memory").queryName("graft_sprof")
          ckptRoot.foreach { r =>
            w = w.option("checkpointLocation", s"$r/ck_${seq.get()}")
          }
          val q = w.start()
          try q.processAllAvailable() finally q.stop()
        }
      } finally {
        if (confs) {
          oldND.fold(conf.unset(noData))(conf.set(noData, _))
          oldM.fold(conf.unset(maint))(conf.set(maint, _))
        }
        if (parts > 0) conf.set(sp, oldSp)
      }
      (System.nanoTime() - t0) / 1e9
    }

    val shm = "/dev/shm/graft_sprof"
    val variants: Seq[(String, () => Double)] = Seq(
      "base" -> (() => drain(None, confs = false)),
      "shm " -> (() => drain(Some(shm), confs = false)),
      "p2  " -> (() => drain(None, confs = false, parts = 2)),
      "p2sh" -> (() => drain(Some(shm), confs = false, parts = 2)))
    // warmup once per variant
    variants.foreach(_._2())
    val res = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, f) => res(name) = res(name) :+ f() }
    }
    variants.foreach { case (name, _) =>
      val ts = res(name).sorted
      val med = ts(ts.length / 2)
      println(f"[sprof] $name med=$med%.3f  ${res(name).map(t => f"$t%.2f").mkString(" ")}")
    }
    // one instrumented drain: per-batch duration breakdown
    graft.streaming.StreamStage.withStaged(spark, "pz", dir, "documents.parquet") { stageDir =>
      val src = spark.readStream.schema(sch).parquet(stageDir)
      val out =
        if (stateful) src.groupBy("source").agg(count(lit(1)).as("n"))
        else src.select(col("doc_id"), col("source"))
      val t0 = System.nanoTime()
      val q = out.writeStream
        .outputMode(if (stateful) "complete" else "append")
        .format("memory").queryName("graft_sprof_z").start()
      try q.processAllAvailable() finally {
        val t1 = (System.nanoTime() - t0) / 1e9
        q.recentProgress.foreach { p =>
          println(s"[sprof-batch] id=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
        }
        println(f"[sprof-batch] wall=$t1%.3f")
        q.stop()
      }
    }
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(shm))
    spark.stop()
  }
}
