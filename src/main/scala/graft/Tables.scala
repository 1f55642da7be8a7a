package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders + oracle-deterministic numeric helpers.
  *
  * Float determinism (SURVEY.md §5): Spark's partial aggregation sums
  * doubles in a partition-dependent order, while the DuckDB oracle sums
  * sequentially — the last ulp can differ. Every money/quantity
  * aggregate is therefore computed in DECIMAL (exact, associative, so
  * merge order cannot change the result) and cast to DOUBLE once at the
  * end. The oracle SQL mirrors the same casts, so both engines produce
  * bit-identical doubles.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark 4 only
    * reads as a raw long (spark.sql.legacy.parquet.nanosAsLong=true —
    * set in Verify/Bench/tests). Convert ns → µs timestamp here so
    * every query sees a proper event-time column; the truncation
    * matches DuckDB's epoch_us semantics for positive epochs. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }

  /** DECIMAL(9,2) — wide enough for TPC-H-ish prices (< 1e7), narrow
    * enough that chained products stay under DuckDB's 38-digit cap. */
  val D: DecimalType = DecimalType(9, 2)

  def dec(c: Column): Column = c.cast(D)

  /** Exact decimal sum surfaced as a double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** 1 - discount, in decimal. */
  def oneMinus(c: Column): Column = lit(1).cast(D) - dec(c)

  /** 1 + tax, in decimal. */
  def onePlus(c: Column): Column = lit(1).cast(D) + dec(c)

  /** sum(price * (1 - discount)) as an exact-decimal-derived double. */
  def revenue(price: Column, disc: Column): Column =
    sum(dec(price) * oneMinus(disc)).cast(DoubleType)

  def tstamp(s: String): Column = lit(s).cast(TimestampType)
}
