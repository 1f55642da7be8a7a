package graft

import graft.functions.VectorExpressions.{vec_pack, vec_unpack}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 pins: binary embedding ingestion (pack/unpack losslessness
  * + plan shape) and the CF calendar decode's integer arithmetic. */
class Round6Spec extends AnyFunSuite {
  import TestSession._

  test("vec_pack/vec_unpack roundtrip float32 bit-exactly, including specials") {
    import spark.implicits._
    val vals: Seq[Seq[Float]] = Seq(
      Seq(1.5f, -2.25f, 0f, Float.MinPositiveValue),
      Seq(Float.MaxValue, Float.NegativeInfinity, Float.PositiveInfinity, 3.1415927f))
    val df = vals.toDF("a").select(expr("transform(a, x -> cast(x as float))").as("a"))
    val back = df.select(vec_unpack(vec_pack(col("a"))).as("b")).collect()
      .map(_.getSeq[Float](0))
    back.zip(vals).foreach { case (b, a) =>
      assert(b.length == a.length)
      b.zip(a).foreach { case (x, y) =>
        assert(java.lang.Float.floatToIntBits(x) == java.lang.Float.floatToIntBits(y),
          s"$x != $y bitwise")
      }
    }
    // 4-byte little-endian layout (the published wire shape)
    val one = Seq(Seq(1.0f)).toDF("a")
      .select(vec_pack(expr("transform(a, x -> cast(x as float))")).as("b"))
      .head().getAs[Array[Byte]](0)
    assert(one.toSeq == Seq[Byte](0, 0, -128, 63)) // 0x3f800000 LE
  }

  test("binary decode is map-side and leaves the ANN plan shape unchanged") {
    val pBin = SparkEntry.queries("sim_from_binary")(spark, sf)
      .queryExecution.executedPlan.toString
    val pArr = SparkEntry.queries("sim_topk_bruteforce")(spark, sf)
      .queryExecution.executedPlan.toString
    // the decode expression sits in the scan-side projection
    assert(pBin.toLowerCase.contains("floatsfrombinary"), pBin)
    // identical downstream: same exchange count, same bounded TopK
    def exchanges(p: String) = "Exchange".r.findAllIn(p).size
    assert(exchanges(pBin) == exchanges(pArr),
      s"decode variant changed shuffle count: ${exchanges(pBin)} vs ${exchanges(pArr)}")
    Seq(pBin, pArr).foreach { p =>
      assert(p.contains("partial_topk") || p.contains("partial_"), p)
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("noleap and 360_day calendar arithmetic hits known dates") {
    import spark.implicits._
    // 2015-02-28 noleap = 45*365 + 31 + 27 days since 1970-01-01
    val d = Seq(45 * 365 + 31 + 27).toDF("d")
    val cum = Seq(0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)
    val month = (1 to 11).map(m =>
      s"WHEN d % 365 < ${cum(m)} THEN $m").mkString("CASE ", " ", " ELSE 12 END")
    val mstart = (1 to 11).map(m =>
      s"WHEN d % 365 < ${cum(m)} THEN ${cum(m - 1)}").mkString("CASE ", " ", " ELSE 334 END")
    val got = d.selectExpr(
      s"(1970 + d div 365) * 10000 + ($month) * 100 + (d % 365 - ($mstart) + 1) as ymd")
      .head().getLong(0)
    assert(got == 20150228L, got.toString)
    // 360_day: day 360*10 + 30*5 + 17 = 1980-06-18
    val got360 = Seq(360 * 10 + 30 * 5 + 17).toDF("d").selectExpr(
      "(1970 + d div 360) * 10000 + (1 + (d % 360) div 30) * 100 + (1 + (d % 360) % 30) as ymd")
      .head().getLong(0)
    assert(got360 == 19800618L, got360.toString)
  }

  test("grid convolve/detrend/argminmax match direct single-node computation") {
    val sf = "/root/testdata/sf0.001"
    // convolve: interior positions only, [1,2,1]/4 over the ordered stream
    val conv = SparkEntry.queries("grid_convolve")(spark, sf)
      .orderBy("idx").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val vs = spark.read.parquet(s"$sf/lineitem.parquet")
      .orderBy("l_orderkey", "l_linenumber")
      .select(col("l_quantity").cast("double")).collect().map(_.getDouble(0))
    assert(conv.length == vs.length - 2)
    assert(conv.head._1 == 1L && conv.last._1 == vs.length - 2L)
    val i = 57
    val cents = (k: Int) => math.round(vs(k) * 100)
    assert(conv(i - 1)._2 == (cents(i - 1) + 2 * cents(i) + cents(i + 1)) / 400.0)
    // detrend: per-cell residuals sum to ~0 (OLS property) and
    // fitted+resid reconstructs the value
    val det = SparkEntry.queries("grid_detrend")(spark, sf)
    val recon = det.selectExpr("max(abs(value - (fitted + resid)))").head().getDouble(0)
    assert(recon < 2e-6, recon.toString)
    val maxCellResid = det.groupBy("cell").agg(sum("resid").as("s"))
      .selectExpr("max(abs(s))").head().getDouble(0)
    assert(maxCellResid < 1e-3, maxCellResid.toString)
    // argminmax: earliest index achieving each extreme
    val am = SparkEntry.queries("grid_argminmax")(spark, sf)
      .filter(col("variable") === "l_quantity").head()
    val minV = vs.min
    val maxV = vs.max
    assert(am.getDouble(1) == minV && am.getLong(2) == vs.indexOf(minV).toLong)
    assert(am.getDouble(3) == maxV && am.getLong(4) == vs.indexOf(maxV).toLong)
  }
}
