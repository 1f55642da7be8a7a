package graft

import graft.sources.netcdf.{NcIO, NetCDF3Util}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** recordsPerPartition autotuner: without the manual option, the scan
  * derives split granularity from file metadata — ≈3× cores partitions
  * for a big corpus, clamped to whole chunks (floor) and to
  * `spark.sql.files.maxPartitionBytes` (ceiling). */
class NcAutotuneSpec extends AnyFunSuite {
  import TestSession._

  private val SRC = "graft.sources.netcdf.NetCDF3Source"
  private def li = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))

  test("pure sizing math") {
    // big corpus, roomy ceiling: lands on ≈ total/(3*par), chunk-rounded
    val p = NetCDF3Util.autotunePerPart(
      totalRecs = 6000, recSize = 24, chunkBytes = 2048,
      maxPartBytes = 128L << 20, parallelism = 4)
    assert(p % (2048 / 24) == 0, s"perPart $p not chunk-aligned")
    assert(p >= 6000 / 12 && p < 6000 / 12 + 2048 / 24)
    // tiny corpus: floor at one chunk
    assert(NetCDF3Util.autotunePerPart(100, 24, 2048, 128L << 20, 4) == 2048 / 24)
    // ceiling binds on a huge corpus
    assert(NetCDF3Util.autotunePerPart(Long.MaxValue / 32, 24, 2048,
      4096, 4) == 4096 / 24)
  }

  test("big corpus splits to ≈3× cores partitions without the option") {
    val dir = "/tmp/graft_nc_spec/autotune_big"
    NcIO.write(li.repartition(1), dir)
    val n = spark.read.format(SRC).option("chunkBytes", "2048").load(dir)
      .rdd.getNumPartitions
    val par = spark.sparkContext.defaultParallelism
    assert(n >= 2 * par && n <= 5 * par, s"expected ≈3×$par partitions, got $n")
  }

  test("tiny corpus yields few partitions; option still overrides") {
    val dir = "/tmp/graft_nc_spec/autotune_small"
    NcIO.write(li.limit(100).repartition(1), dir)
    val n = spark.read.format(SRC).option("chunkBytes", "2048").load(dir)
      .rdd.getNumPartitions
    assert(n <= 2, s"tiny corpus should not over-split, got $n")
    val m = spark.read.format(SRC).option("chunkBytes", "2048")
      .option("recordsPerPartition", "10").load(dir).rdd.getNumPartitions
    assert(m == 10, s"manual option must win, got $m")
  }

  test("maxPartitionBytes caps the split size") {
    val dir = "/tmp/graft_nc_spec/autotune_cap"
    NcIO.write(li.repartition(1), dir)
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      val n = spark.read.format(SRC).option("chunkBytes", "2048").load(dir)
        .rdd.getNumPartitions
      // recSize = 24B → ≤170 records/partition → ≥35 partitions at sf0.001
      assert(n >= 30, s"cap should force many partitions, got $n")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }
}
