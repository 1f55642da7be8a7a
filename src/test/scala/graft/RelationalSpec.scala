package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSession._

  // Queries whose sf0.001 result is legitimately tiny/empty are listed
  // with their minimum expected row count; default expectation is >0.
  private val minRows: Map[String, Long] = Map("q9_anti" -> 0L)

  for ((name, fn) <- queries.Relational.queries) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= minRows.getOrElse(name, 1L))
    }
  }

  test("every relational query has an oracle") {
    assert(queries.Relational.oracles.keySet == queries.Relational.queries.keySet)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
