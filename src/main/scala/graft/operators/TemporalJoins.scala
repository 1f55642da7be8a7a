package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal joins Spark has no native operator for (SURVEY.md §2B),
  * composed from built-ins in their scale-correct shapes:
  *
  * - As-of join (backward): instead of a per-probe range scan, union
  *   both sides with a side marker, shuffle ONCE by key, and
  *   forward-fill the reference side's attributes with an
  *   ignore-nulls last_value window — per-key linear work, no
  *   candidate explosion, the classic log-merge formulation. At equal
  *   timestamps the reference row sorts first, giving inclusive
  *   (ts_ref <= ts_probe) semantics, with event_id as the final
  *   deterministic tiebreak.
  *
  * - Range join (probe ts in [t-1h, t)): equi-join on (key,
  *   hour-bucket) with each probe exploded to its two covering
  *   buckets, exact bounds filtered after the hash join — candidate
  *   pairs are bounded by per-key-per-hour density, never |probe|x|build|.
  *   A naive theta-join here plans a cartesian; PlanAuditSpec pins
  *   that this one does not.
  */
object TemporalJoins {

  type Q = (SparkSession, String) => DataFrame

  /** For every error event: the user's most recent click at-or-before
    * it (id, ts, value), NULL when the user never clicked before. */
  def asofJoin: Q = (s, dir) => {
    val ev = events(s, dir)
    val tagged = ev.filter(col("event_type").isin("click", "error"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "click", 0).otherwise(1).as("side"),
        when(col("event_type") === "click", col("event_id")).as("c_id"),
        when(col("event_type") === "click", col("ts")).as("c_ts"),
        when(col("event_type") === "click", col("value")).as("c_value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("click_id", last(col("c_id"), ignoreNulls = true).over(w))
      .withColumn("click_ts", last(col("c_ts"), ignoreNulls = true).over(w))
      .withColumn("click_value", last(col("c_value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts").as("err_ts"),
        col("click_id"), col("click_ts"), col("click_value"))
  }

  val asofJoinSql: String =
    """WITH tagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side,
      |    CASE WHEN event_type = 'click' THEN event_id END AS c_id,
      |    CASE WHEN event_type = 'click' THEN ts END AS c_ts,
      |    CASE WHEN event_type = 'click' THEN value END AS c_value
      |  FROM events WHERE event_type IN ('click', 'error')),
      |filled AS (
      |  SELECT event_id, user_id, ts, side,
      |    last_value(c_id IGNORE NULLS) OVER w AS click_id,
      |    last_value(c_ts IGNORE NULLS) OVER w AS click_ts,
      |    last_value(c_value IGNORE NULLS) OVER w AS click_value
      |  FROM tagged
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, ts AS err_ts, click_id, click_ts, click_value
      |FROM filled WHERE side = 1""".stripMargin

  private val HOUR_US = 3600L * 1000000L

  /** As-of join with a TOLERANCE bound (pandas merge_asof(tolerance=…)
    * semantics): the matched most-recent click is kept only when it
    * falls within 1 hour of the error — older matches null out, while
    * the error row itself survives. A pure map-side post-filter on the
    * [[asofJoin]] composition, so the scale shape is unchanged. */
  def asofTolerance: Q = (s, dir) => {
    val in = asofJoin(s, dir)
      .withColumn("in_tol", col("click_ts").isNotNull &&
        (unix_micros(col("err_ts")) - unix_micros(col("click_ts")) <= HOUR_US))
    in.select(col("event_id"), col("user_id"), col("err_ts"),
      when(col("in_tol"), col("click_id")).as("click_id"),
      when(col("in_tol"), col("click_ts")).as("click_ts"),
      when(col("in_tol"), col("click_value")).as("click_value"))
  }

  val asofToleranceSql: String =
    s"""WITH asof_base AS ($asofJoinSql)
       |SELECT event_id, user_id, err_ts,
       |  CASE WHEN epoch_us(err_ts) - epoch_us(click_ts) <= ${HOUR_US}
       |       THEN click_id END AS click_id,
       |  CASE WHEN epoch_us(err_ts) - epoch_us(click_ts) <= ${HOUR_US}
       |       THEN click_ts END AS click_ts,
       |  CASE WHEN epoch_us(err_ts) - epoch_us(click_ts) <= ${HOUR_US}
       |       THEN click_value END AS click_value
       |FROM asof_base""".stripMargin

  /** For every error event: count + value sum of the user's events in
    * the preceding hour [err_ts - 1h, err_ts). */
  def rangeJoin: Q = (s, dir) => {
    val ev = events(s, dir)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("err_ts"))
    val errBucketed = err.withColumn("b0", floor(unix_micros(col("err_ts")) / HOUR_US))
      .withColumn("bucket", explode(array(col("b0"), col("b0") - 1)))
      .drop("b0")
    val base = ev.select(col("user_id"), col("ts"), col("value"))
      .withColumn("bucket", floor(unix_micros(col("ts")) / HOUR_US))
    val agg = errBucketed.join(base, Seq("user_id", "bucket"))
      .filter(col("ts") >= col("err_ts") - expr("INTERVAL 1 HOUR") && col("ts") < col("err_ts"))
      .groupBy("err_id")
      .agg(count(lit(1)).as("n_prior"), dsum(col("value")).as("sum_value"))
    err.join(agg, Seq("err_id"), "left")
      .select(col("err_id"), col("user_id"), col("err_ts"),
        coalesce(col("n_prior"), lit(0L)).as("n_prior"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  val rangeJoinSql: String =
    """WITH err AS (
      |  SELECT event_id AS err_id, user_id, ts AS err_ts
      |  FROM events WHERE event_type = 'error'),
      |agg AS (
      |  SELECT e.err_id, COUNT(*) AS n_prior,
      |    CAST(SUM(CAST(v.value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value
      |  FROM err e JOIN events v ON v.user_id = e.user_id
      |    AND v.ts >= e.err_ts - INTERVAL 1 HOUR AND v.ts < e.err_ts
      |  GROUP BY e.err_id)
      |SELECT e.err_id, e.user_id, e.err_ts,
      |  COALESCE(a.n_prior, 0) AS n_prior, COALESCE(a.sum_value, 0.0) AS sum_value
      |FROM err e LEFT JOIN agg a USING (err_id)""".stripMargin

  val queries: Map[String, Q] = Map(
    "q23_asof_join" -> asofJoin,
    "q24_range_join" -> rangeJoin,
    "q30_asof_tolerance" -> asofTolerance)

  val oracles: Map[String, String] = Map(
    "q23_asof_join" -> asofJoinSql,
    "q24_range_join" -> rangeJoinSql,
    "q30_asof_tolerance" -> asofToleranceSql)
}
