package graft

import graft.functions.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r8 sketch additions: the deterministic cross-engine HyperLogLog. */
class SketchesSpec extends AnyFunSuite {
  import TestSession._

  test("hll estimate lands near the true distinct count; merge is exact") {
    val r = Sketches.sketchHll(spark, sf).head()
    val truth = spark.read.parquet(s"$sf/events.parquet")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    val est = r.getAs[Double]("est_distinct")
    // m=64 registers → standard error ~1.04/√64 = 13%; allow 3σ
    assert(math.abs(est - truth) <= 0.4 * truth,
      s"est $est vs true $truth")
    assert(r.getAs[Boolean]("merge_exact"))
  }

  test("hll small-range branch uses the spliced linear-counting table") {
    import spark.implicits._
    // 5 distinct users → raw estimate far below 2.5m, zeros > 0 →
    // the m·ln(m/V) literal-table branch must fire; its value is
    // exactly 64·ln(64/V) for the observed zero-register count
    val dir = "/tmp/graft_hll_small"
    (1 to 50).map(i => (i % 5).toString).toDF("user_id")
      .withColumn("ts", lit(0L)).withColumn("event_type", lit("click"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Sketches.sketchHll(spark, dir).head()
    val zeros = r.getAs[Long]("zeros")
    assert(zeros >= 59 && zeros < 64, s"zeros $zeros") // 5 hashed buckets at most
    val expected = BigDecimal(64.0 * math.log(64.0 / zeros))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("est_distinct") == expected,
      s"${r.getAs[Double]("est_distinct")} vs $expected")
  }
}
