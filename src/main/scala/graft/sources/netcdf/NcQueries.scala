package graft.sources.netcdf

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-contract queries exercising the NetCDF write/read path end
  * to end (SURVEY.md §2A). The oracle runs against the original
  * parquet, so a hash match proves the binary roundtrip through the
  * classic-NetCDF codec is lossless.
  */
object NcQueries {

  type Q = (SparkSession, String) => DataFrame

  private val SRC = "graft.sources.netcdf.NetCDF3Source"

  /** Scratch dir keyed by sf dir so concurrent scales don't collide. */
  private def scratch(dir: String, tag: String): String =
    s"/tmp/graft_nc/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/$tag"

  /** Write 4 lineitem variables to chunked NetCDF part files (4-way
    * parallel), read them back through the DSv2, aggregate. */
  def ncWriteReadRoundtrip: Q = (s, dir) => {
    val out = scratch(dir, "roundtrip")
    NcIO.write(
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .repartition(4),
      out)
    s.read.format(SRC).load(out)
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_orderkey")).as("sum_key"),
        dsum(col("l_quantity")).as("sum_qty"),
        sum(dec(col("l_extendedprice")) * oneMinus(col("l_discount"))).cast(DoubleType)
          .as("sum_disc_price"))
  }

  val ncWriteReadRoundtripSql: String =
    """SELECT COUNT(*) AS n, SUM(l_orderkey) AS sum_key,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS sum_disc_price
      |FROM lineitem""".stripMargin

  /** Variable pruning + record-range pushdown: write sorted, read only
    * records [1000, 2000) of two variables. */
  def ncReadPrune: Q = (s, dir) => {
    val out = scratch(dir, "sorted")
    NcIO.write(
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
          col("l_quantity"))
        .repartition(1)
        .sortWithinPartitions("l_orderkey", "l_linenumber"),
      out)
    s.read.format(SRC).load(out)
      .filter(col("record") >= 1000L && col("record") < 2000L)
      .select("record", "l_orderkey", "l_quantity")
  }

  val ncReadPruneSql: String =
    """SELECT rn - 1 AS record, l_orderkey, l_quantity FROM (
      |  SELECT l_orderkey, l_quantity,
      |    row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
      |  FROM lineitem) sub
      |WHERE rn - 1 >= 1000 AND rn - 1 < 2000""".stripMargin

  val queries: Map[String, Q] = Map(
    "nc_write_read_roundtrip" -> ncWriteReadRoundtrip,
    "nc_read_prune" -> ncReadPrune)

  val oracles: Map[String, String] = Map(
    "nc_write_read_roundtrip" -> ncWriteReadRoundtripSql,
    "nc_read_prune" -> ncReadPruneSql)
}
