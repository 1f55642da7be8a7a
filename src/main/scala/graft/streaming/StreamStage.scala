package graft.streaming

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

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

  /** Idempotent foreachBatch parquet writer (r15, r14 verdict #2):
    * foreachBatch is AT-LEAST-ONCE — a crash between the sink write
    * and the checkpoint's offset commit replays the batch on restart,
    * and a plain `mode("append")` sink then double-counts the partial
    * aggregates. The standard remedy is overwrite-by-batchId: each
    * batch's rows land in their own `batch_id=<id>` partition with
    * DYNAMIC partition overwrite, so a replayed batch (same id by the
    * recovery contract) REPLACES its own partition instead of
    * appending a second copy — exactly-once at the sink without a
    * transactional store. Round15Spec pins this with a deterministic
    * crash-after-write-before-commit replay, including the
    * append-mode counterfactual.
    *
    * `f` is the per-batch transform (partial aggregation); readers of
    * the sink must ignore/drop the `batch_id` partition column. */
  def idempotentBatchWriter(sink: String)(f: DataFrame => DataFrame): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      f(batch)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(sink)

  /** Stage `dir/fileName` into a scratch dir, run `drain(stageDir)`
    * (which must BLOCK until the stream is done with the files —
    * processAllAvailable + stop), then delete the scratch dir.
    *
    * A directory-style input (a Spark-written `.parquet` DIRECTORY of
    * part files — the synthesized 10×/100× bench dirs) FLATTENS: its
    * data files copy directly into the scratch root, because the file
    * stream source does not recurse into non-partition subdirectories
    * — staging the directory one level down made the source list ZERO
    * files, and the memory-sink drains of r8–r12 timed an EMPTY
    * stream at 10× without any error (found in r13 when the
    * loud parquet sinks hit PATH_NOT_FOUND instead). */
  def withStaged[T](s: SparkSession, tag: String, dir: String, fileName: String)
      (drain: String => T): T = {
    val stageDir = s"${System.getProperty("java.io.tmpdir")}/graft_stage/" +
      s"${s.sparkContext.applicationId}/$tag/${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    val hconf = s.sparkContext.hadoopConfiguration
    val src = new Path(s"$dir/$fileName")
    val fs = src.getFileSystem(hconf)
    fs.mkdirs(new Path(stageDir))
    if (fs.getFileStatus(src).isDirectory) {
      fs.listStatus(src).filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
        .foreach { st =>
          FileUtil.copy(fs, st.getPath, fs,
            new Path(stageDir, st.getPath.getName), false, true, hconf)
        }
    } else {
      FileUtil.copy(fs, src, fs, new Path(stageDir, fileName), false, true, hconf)
    }
    try drain(stageDir)
    finally fs.delete(new Path(stageDir), true)
  }
}
