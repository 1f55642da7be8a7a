package graft

import graft.sources.netcdf.{NcFormat, NcIO}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Codec edge cases beyond the happy path NcSpec covers. */
class NcFormatSpec extends AnyFunSuite {
  import TestSession._

  private val SRC = "graft.sources.netcdf.NetCDF3Source"
  private def fs = new Path("/tmp").getFileSystem(new Configuration())

  test("all numeric types roundtrip (CDF-5 via long column)") {
    val dir = "/tmp/graft_nc_fmt/types"
    val schema = StructType(Seq(
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("s", ShortType), StructField("b", ByteType)))
    val rows = (0 until 1000).map(k => Row(
      k + 0.5, (k * 2).toFloat, k, k.toLong * 1000000007L,
      (k % 30000).toShort, (k % 100).toByte))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    NcIO.write(df, dir)
    // CDF-5 expected (long column present)
    val meta = NcFormat.readMeta(fs,
      graft.sources.netcdf.NetCDF3Util.listNcFiles(fs, new Path(dir)).head)
    assert(meta.version == 5)
    val back = spark.read.format(SRC).load(dir)
    assert(back.count() == 1000)
    assert(back.schema("l").dataType == LongType)
    assert(back.schema("s").dataType == ShortType)
    assert(back.schema("b").dataType == ByteType)
    val exp = df.agg(sum("d"), sum("l"), sum(col("s").cast("long")), sum(col("b").cast("long"))).head()
    val got = back.agg(sum("d"), sum("l"), sum(col("s").cast("long")), sum(col("b").cast("long"))).head()
    assert(exp == got)
  }

  test("no-long schema writes CDF-2") {
    val dir = "/tmp/graft_nc_fmt/cdf2"
    NcIO.write(spark.range(10).select(col("id").cast("double").as("x")), dir)
    val files = graft.sources.netcdf.NetCDF3Util.listNcFiles(fs, new Path(dir))
    val metas = files.map(NcFormat.readMeta(fs, _))
    assert(metas.forall(_.version == 2))
    assert(metas.map(_.numRecs).sum == 10)
  }

  test("empty partitions produce valid zero-record files") {
    val dir = "/tmp/graft_nc_fmt/empty"
    val df = spark.range(5).select(col("id").cast("double").as("x")).repartition(8)
    NcIO.write(df, dir)
    val back = spark.read.format(SRC).load(dir)
    assert(back.count() == 5)
  }

  test("single small record var uses unpadded slabs (spec special case)") {
    val dir = "/tmp/graft_nc_fmt/shorts"
    val schema = StructType(Seq(StructField("s", ShortType)))
    val rows = (0 until 101).map(k => Row(k.toShort))
    NcIO.write(spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema), dir)
    val p = graft.sources.netcdf.NetCDF3Util.listNcFiles(fs, new Path(dir)).head
    val meta = NcFormat.readMeta(fs, p)
    assert(meta.recSize == 2) // no inter-record padding with 1 record var
    val back = spark.read.format(SRC).load(dir)
    assert(back.agg(sum(col("s").cast("long"))).head().getLong(0) == (0 until 101).sum)
  }

  test("record column is globally consecutive across part files") {
    val dir = "/tmp/graft_nc_fmt/multi"
    NcIO.write(spark.range(1000).select(col("id").cast("double").as("x")).repartition(7), dir)
    val back = spark.read.format(SRC).load(dir)
    val recs = back.select("record")
    assert(recs.distinct().count() == 1000)
    assert(recs.agg(min("record"), max("record")).head() == Row(0L, 999L))
  }
}
