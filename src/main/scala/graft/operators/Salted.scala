package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-safe two-phase aggregation (SURVEY.md §4).
  *
  * A groupBy on a low-cardinality key (here: 5 event types over the
  * whole corpus) funnels each key's entire data through one reducer.
  * Salting splits each key into `salts` sub-keys for the first
  * (parallel) aggregation, then combines the partials in a second,
  * tiny aggregation. Because the combined aggregates are decimal
  * (exact, associative), the result is bit-identical to the unsalted
  * plan — the oracle runs the plain GROUP BY.
  *
  * AQE's skew-join handling covers joins; salting is still the tool
  * for skewed *aggregations* with expensive merge state.
  */
object Salted {

  type Q = (SparkSession, String) => DataFrame

  /** Two-phase sum/count by `key` with `salts`-way fan-out. The salt
    * must be derived from data (not rand()) for determinism. */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      value: Column,
      salts: Int): DataFrame =
    df.select(key.as("k"), pmod(hash(saltSource), lit(salts)).as("_salt"), dec(value).as("v"))
      .groupBy("k", "_salt")
      .agg(sum(col("v")).as("pv"), count(lit(1)).as("pn"))
      .groupBy("k")
      .agg(sum(col("pv")).cast(DoubleType).as("total"), sum(col("pn")).as("n"))

  def q20SaltedAgg: Q = (s, dir) =>
    saltedSumCount(events(s, dir), col("event_type"), col("event_id"), col("value"), 64)
      .withColumnRenamed("k", "event_type")

  val q20Sql: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS total,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY event_type""".stripMargin

  val queries: Map[String, Q] = Map("q20_salted_agg" -> q20SaltedAgg)
  val oracles: Map[String, String] = Map("q20_salted_agg" -> q20Sql)
}
