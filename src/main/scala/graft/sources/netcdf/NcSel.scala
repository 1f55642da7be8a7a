package graft.sources.netcdf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Value-based coordinate selection over a netcdf3 dir — the xarray
  * `sel()` sugar on top of the source's zone-map pruning. The
  * reference addresses streamed variables by position; real users
  * address them by coordinate VALUE ("the records near t=...") — these
  * helpers turn value addressing into pruned scans.
  *
  * [[range]] is a plain value filter: the pushed predicate is checked
  * against each part file's `actual_range` header attribute, so files
  * wholly outside the range never open (near-partition-pruning when
  * the write was range-bucketed on the coordinate).
  *
  * [[nearest]] needs one fact beyond the filter: `actual_range` stores
  * the ACTUAL per-file min/max (the writer tracks real values), so
  * each endpoint is a value that exists. The nearest record therefore
  * lies within D = min over files of min(|t-min|, |t-max|) of the
  * target, and the search becomes a [t-D, t+D] range scan (zone maps
  * prune everything else) followed by a bounded min_by partial
  * aggregate — no sort, no shuffle beyond one scalar row per
  * partition, regardless of corpus size. The metadata pass is one
  * header read per part file on the driver; above ~metadata scale it
  * would fan out to executors exactly like [[NcIO.readAttrs]].
  */
object NcSel {

  private val SRC = "graft.sources.netcdf.NetCDF3Source"

  /** Inclusive-lo / exclusive-hi value selection on a coordinate
    * variable; pushes the filter so zone maps prune part files. */
  def range(spark: SparkSession, dir: String, coordVar: String,
      lo: Double, hi: Double): DataFrame =
    spark.read.format(SRC).load(dir)
      .filter(col(coordVar).cast(DoubleType) >= lo && col(coordVar).cast(DoubleType) < hi)

  /** Per-file (min, max) of `coordVar` from the part-file headers. */
  private def coordRanges(spark: SparkSession, dir: String,
      coordVar: String): Seq[(Double, Double)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).map(_.getPath).filter { f =>
      val n = f.getName
      n.endsWith(".nc") || n.endsWith(".nc.gz") || n.endsWith(".ncz")
    }
    parts.toSeq.flatMap { f =>
      val meta = NcFormat.readMeta(fs, f)
      if (meta.numRecs == 0L) None
      else meta.vars.find(_.name == coordVar).flatMap(_.range)
    }
  }

  /** The single record whose `coordVar` value is closest to `target`
    * (ties: smaller coordinate value, then smaller record index), as a
    * one-row DataFrame of the full record plus `dist`. */
  def nearest(spark: SparkSession, dir: String, coordVar: String,
      target: Double): DataFrame = {
    val ranges = coordRanges(spark, dir, coordVar)
    require(ranges.nonEmpty, s"no zone-map ranges for $coordVar in $dir")
    // both endpoints are actual values, so every file guarantees a
    // record within min(|t-min|, |t-max|) of the target — NOT 0 when
    // the target merely falls inside the range (containment only says
    // a closer value is possible, not that one exists)
    val d = ranges.map { case (mn, mx) =>
      math.min(math.abs(target - mn), math.abs(target - mx))
    }.min
    val scan = range(spark, dir, coordVar, target - d, math.nextUp(target + d))
      .withColumn("dist", abs(col(coordVar).cast(DoubleType) - target))
    val cols = scan.columns
    val all = struct(cols.map(col): _*)
    val ord = struct(col("dist"), col(coordVar).cast(DoubleType), col("record"))
    scan.agg(min_by(all, ord).as("best")).select(col("best.*"))
  }

  private def selNearestOne(s: SparkSession, out: String, target: Double): DataFrame =
    nearest(s, out, "l_orderkey", target)
      .select(lit(target).as("target"), col("record"), col("l_orderkey"),
        col("l_quantity"), col("dist"))

  /** Driver-contract query: range-bucketed sorted write (disjoint
    * per-file zone maps), then nearest-record selection for three
    * targets — one inside a file's range, one squarely between two
    * integer keys (tie broken toward the smaller coordinate), one far
    * beyond the corpus maximum (nearest = last record of the max key).
    * The oracle replays each selection as an ORDER BY abs-distance
    * LIMIT 1 over the globally sorted rows. */
  def ncSelCoord: (SparkSession, String) => DataFrame = (s, dir) => {
    import graft.Tables.t
    val out = NcQueries.scratch(s, dir, "sel_coord")
    NcIO.write(
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast(org.apache.spark.sql.types.LongType)
          .as("l_linenumber"), col("l_quantity"))
        .repartitionByRange(8, col("l_orderkey"), col("l_linenumber"))
        .sortWithinPartitions("l_orderkey", "l_linenumber"),
      out)
    Seq(1234.0, 1500.5, 1.0e9).map(selNearestOne(s, out, _)).reduce(_.unionAll(_))
  }

  val ncSelCoordSql: String =
    """WITH o AS (SELECT l_orderkey, l_quantity,
      |  row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS record
      |  FROM lineitem),
      |t(target) AS (VALUES (1234.0), (1500.5), (1.0e9))
      |SELECT t.target, b.record, b.l_orderkey, b.l_quantity, b.dist FROM t CROSS JOIN LATERAL (
      |  SELECT record, l_orderkey, l_quantity, abs(l_orderkey - t.target) AS dist
      |  FROM o ORDER BY abs(l_orderkey - t.target), l_orderkey, record LIMIT 1) b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("nc_sel_coord" -> ncSelCoord)
  val oracles: Map[String, String] = Map("nc_sel_coord" -> ncSelCoordSql)
}
