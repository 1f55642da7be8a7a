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

  /** events.parquet's `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (Spark 4 reads it as a raw long
    * under spark.sql.legacy.parquet.nanosAsLong=true, set in
    * Verify/Bench/tests) and TIMESTAMP(MICROS) without the UTC-adjusted
    * flag (Spark 4 infers TIMESTAMP_NTZ). Normalize both to a session-tz
    * TIMESTAMP here — sessions run UTC, so the NTZ reinterpretation and
    * the ns → µs truncation both yield the exact instants the DuckDB
    * oracle computes from the same parquet. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
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
