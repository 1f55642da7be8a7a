package graft.streaming

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** File-stream staging for the streaming twins: Spark's file source
  * needs a DIRECTORY, so the input parquet file is copied into a
  * per-(app, tag, dataset) scratch dir for the duration of the drain.
  * The scratch root honors `java.io.tmpdir` (not a hard-coded /tmp)
  * and the dir is deleted as soon as the drain returns — the
  * memory-sink table carries the drained state, so nothing references
  * the staged files once the streaming query stops. Without the
  * cleanup, corpus-sized copies keyed by applicationId accumulate
  * across sessions. */
private[graft] object StreamStage {

  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** A fresh per-call scratch dir for a foreachBatch parquet sink:
    * repeated calls (bench samples) must each append into their OWN
    * sink or batches from call N would double-count in call N+1. */
  def freshSink(s: SparkSession, dir: String, tag: String): String =
    graft.sources.netcdf.NcQueries.scratch(
      s, dir, tag + "_" + sinkSeq.incrementAndGet())

  /** Stage `dir/fileName` into a scratch dir, run `drain(stageDir)`
    * (which must BLOCK until the stream is done with the files —
    * processAllAvailable + stop), then delete the scratch dir. */
  def withStaged[T](s: SparkSession, tag: String, dir: String, fileName: String)
      (drain: String => T): T = {
    val stageDir = s"${System.getProperty("java.io.tmpdir")}/graft_stage/" +
      s"${s.sparkContext.applicationId}/$tag/${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    val hconf = s.sparkContext.hadoopConfiguration
    val dst = new Path(stageDir, fileName)
    val fs = dst.getFileSystem(hconf)
    fs.mkdirs(new Path(stageDir))
    FileUtil.copy(fs, new Path(s"$dir/$fileName"), fs, dst, false, true, hconf)
    try drain(stageDir)
    finally fs.delete(new Path(stageDir), true)
  }
}
