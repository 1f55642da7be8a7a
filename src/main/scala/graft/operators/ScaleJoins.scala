package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shuffle-elimination devices for big fact-to-fact joins (SURVEY.md
  * §4): bucketing and salting.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is the shuffle of
  * both sides. Two standard answers, both demonstrated here as gated
  * operators with oracle-checked results:
  *
  *  - '''Bucketing''' (q34): write both tables bucketed by the join
  *    key into the catalog; a later sort-merge join reads bucket i of
  *    each side into the same task and needs NO exchange at all — the
  *    shuffle is paid once at layout time and amortized over every
  *    subsequent join/aggregation on that key. This is the layout a
  *    100 TB warehouse keeps its fact tables in. (Round5Spec pins the
  *    exchange-free join plan.)
  *  - '''Salting''' (q35): when a shuffle join is unavoidable and the
  *    key distribution is skewed (5 event types over the whole
  *    corpus), a hash-derived salt splits each hot key across SALTS
  *    reducers; the metadata-sized dim side is replicated SALTS ways.
  *    The decimal arithmetic is exact, so the salted plan is
  *    bit-identical to the unsalted one — the oracle runs the plain
  *    join. Complements q20 (salted AGGREGATION) and AQE's skew-JOIN
  *    splitting, which only kicks in above partition-size thresholds.
  */
object ScaleJoins {

  type Q = (SparkSession, String) => DataFrame

  private val BUCKETS = 8

  /** One-shot JVM-exit cleanup of this app's bucketed scratch root —
    * the layout is a per-session demo artifact, and without the hook
    * corpus-sized copies would accumulate under java.io.tmpdir across
    * sessions (the same leak the stream staging dirs had before r5). */
  private val cleanupArmed = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def armCleanup(root: java.io.File): Unit =
    if (cleanupArmed.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
        }
        rm(root)
      }))
    }

  /** Write orders+lineitem bucketed by orderkey (once per app+dir) and
    * return the exchange-free joined view. The layout lands under
    * java.io.tmpdir as external-table paths, deleted by a JVM-exit
    * hook; table names carry a dir tag so two dirs in one session get
    * distinct catalog entries instead of relying on overwrite-with-
    * new-location semantics. Same-app re-invocations overwrite
    * idempotently. */
  private[graft] def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val appRoot = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_bucketed/${s.sparkContext.applicationId}")
    armCleanup(appRoot)
    val tag = (dir.hashCode & 0x7fffffff).toHexString
    // the tag rides the PATH too: two dirs that sanitize to the same
    // string (/x/a-b vs /x/a_b) must not share bucketed files, or the
    // second write silently replaces the first table's data
    val wh = s"$appRoot/${dir.replaceAll("[^A-Za-z0-9.]", "_")}_$tag"
    // r16 optimization: the layout is paid ONCE per (session, dir) —
    // exactly what the scaladoc above promises ("paid once at layout
    // time and amortized over every subsequent join") and what the
    // NcQueries.stageOnce read-side convention does everywhere else;
    // pre-r16 every invocation re-shuffled and re-wrote both bucketed
    // tables before running the exchange-free join under test
    graft.sources.netcdf.NcQueries.stageOnce(wh) {
      t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
        .write.bucketBy(BUCKETS, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders").mode("overwrite")
        .saveAsTable(s"graft_b_orders_$tag")
      t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        .write.bucketBy(BUCKETS, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem").mode("overwrite")
        .saveAsTable(s"graft_b_lineitem_$tag")
    }
    // merge hint: at bench scale the orders side fits the broadcast
    // threshold, which would hide the exchange-free bucketed SMJ this
    // operator exists to demonstrate (and at 100 TB neither side
    // broadcasts anyway)
    s.table(s"graft_b_lineitem_$tag").hint("merge")
      .join(s.table(s"graft_b_orders_$tag").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
  }

  // the bucketed layout is an index-build artifact: prestage it so the
  // bench charges the one-time shuffle+write to its staging line item
  Staged.register("bucketed_layout")((s, dir) => { bucketedJoin(s, dir); () })

  def q34BucketedJoin: Q = (s, dir) =>
    bucketedJoin(s, dir)
      .groupBy("o_orderpriority")
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("rev"),
        count(lit(1)).as("n_items"))

  val q34Sql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS rev,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  private val SALTS = 32

  /** Per-type above-mean counts via a salted stats join. The
    * above-mean test is cross-multiplied (v·n > Σv, all exact
    * decimal/integer) so no division enters and the salted and plain
    * plans agree bit-for-bit. */
  def q35SkewJoinSalted: Q = (s, dir) => {
    val ev = events(s, dir)
      .select(col("event_type"), col("event_id"), dec(col("value")).as("v"))
    val stats = ev.groupBy("event_type")
      .agg(sum(col("v")).as("tot"), count(lit(1)).as("n"))
    // replicate the (metadata-sized) stats row per salt; the big side
    // derives its salt from data (not rand()) for determinism
    val statsRep = stats.withColumn("_salt",
      explode(array((0 until SALTS).map(lit(_)): _*)))
    ev.withColumn("_salt", pmod(hash(col("event_id")), lit(SALTS)))
      .hint("shuffle_hash")
      .join(statsRep.hint("shuffle_hash"), Seq("event_type", "_salt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("v") * col("n") > col("tot"), 1L).otherwise(0L)).as("n_above"))
  }

  val q35Sql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(value AS DECIMAL(9,2)) AS v FROM events),
      |st AS (
      |  SELECT event_type, SUM(v) AS tot, COUNT(*) AS n
      |  FROM ev GROUP BY event_type)
      |SELECT e.event_type, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN e.v * s.n > s.tot THEN 1 ELSE 0 END) AS BIGINT) AS n_above
      |FROM ev e JOIN st s ON s.event_type = e.event_type
      |GROUP BY e.event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q34_bucketed_join" -> q34BucketedJoin,
    "q35_skew_join_salted" -> q35SkewJoinSalted)
  val oracles: Map[String, String] = Map(
    "q34_bucketed_join" -> q34Sql,
    "q35_skew_join_salted" -> q35Sql)
}
