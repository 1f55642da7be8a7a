package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers vec_dot for SQL") {
    // all suites share one JVM: detach the default session so
    // getOrCreate builds a fresh one with the extensions applied
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = spark.sql(
        "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .head().getDouble(0)
      assert(r == 32.0)
      // r8 registrations: the SQ kernel and the CDC boundary scan
      val dq = spark.sql(
        "SELECT sq_dequant(array(0.5D), array(0.0D), array(1.0D)) AS q")
        .head().getSeq[Double](0)
      assert(dq == Seq(0.0 + (128.0 + 0.5) * 1.0 / 256.0), s"$dq")
      val cb = spark.sql("SELECT cdc_bounds('ab') AS b").head().getSeq[Int](0)
      assert(cb.head == 1 && cb.last == 3, s"$cb")
    } finally {
      prior.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }
}
