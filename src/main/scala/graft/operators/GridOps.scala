package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chunked-grid model: the Spark-native analogue of the reference's
  * in-memory streamed variable (SURVEY.md §3). One row per chunk:
  * (variable, chunk_idx, origin, shape, values), streamed dimension
  * chunked at `chunkSize` — the `chunk_dimension`/`chunk_size_mb`
  * pairing of `NetCDF4StreamerVariable`.
  *
  * All grid operators are per-chunk (map-side) or partial-aggregating;
  * no operator ever materializes a whole variable in one task.
  * Chunk construction here derives the stream index with a global
  * row_number for oracle determinism; at 100 TB the index comes from
  * the data itself (timestamps, file offsets — e.g. the netcdf3
  * source's `record` column), which keeps the groupBy fully parallel.
  */
object GridOps {

  type Q = (SparkSession, String) => DataFrame

  /** Tabular → chunked grid (`streamPandasData` analogue).
    *
    * DEFAULT ROUTE (r6): when the input carries a monotone 0-based
    * stream index (`indexCol`), construction is the sort-free
    * `grid_from_source_index` shape — ONE hash shuffle on chunk_idx,
    * per-chunk order restored from the index itself. No global sort,
    * no zipWithIndex count job. This is the path a 100 TB ingest
    * takes: the index exists in the data (the netcdf `record` column,
    * a file offset, an ingest-time ordinal), so grid construction
    * never range-shuffles the variable.
    *
    * FALLBACK: truly unindexed input derives the index from `orderBy`
    * (a parallel range-partitioned sort) + RDD `zipWithIndex` (one
    * extra count job for partition offsets) — NOT a single-partition
    * window, so even the fallback stays distributed at any scale. */
  def tableToGrid(
      df: DataFrame,
      orderCols: Seq[Column],
      valueCol: Column,
      varName: String,
      chunkSize: Int,
      indexCol: Option[Column] = None): DataFrame = indexCol match {
    case Some(idx) => tableToGridIndexed(df, idx, valueCol, varName, chunkSize)
    case None =>
      val spark = df.sparkSession
      import spark.implicits._
      val sorted = df
        .select(orderCols :+ valueCol.cast(DoubleType).as("v"): _*)
        .orderBy(orderCols: _*)
        .select("v")
      val indexed = sorted.as[Double].rdd
        .zipWithIndex()
        .map { case (v, idx) => (idx, v) }
        .toDF("idx", "v")
      tableToGridIndexed(indexed, col("idx"), col("v"), varName, chunkSize)
  }

  /** Sort-free chunked-grid construction from a declared monotone
    * index: one partial-aggregated hash shuffle keyed by chunk_idx
    * (plan-audited rangepartitioning-free). */
  def tableToGridIndexed(
      df: DataFrame,
      indexCol: Column,
      valueCol: Column,
      varName: String,
      chunkSize: Int): DataFrame = {
    df.select(indexCol.cast(LongType).as("idx"), valueCol.cast(DoubleType).as("v"))
      .groupBy(expr(s"idx div $chunkSize").as("chunk_idx"))
      .agg(graft.functions.NgramExpressions.sorted_vals(collect_list(struct(col("idx"), col("v")))).as("values"),
        min(col("idx")).as("origin"))
      .select(lit(varName).as("variable"), col("chunk_idx"), col("origin"),
        size(col("values")).cast(LongType).as("shape"), col("values"))
  }

  /** Chunked grid → tabular (`yieldPandasData` analogue): global
    * stream index + value, reconstructed per chunk (map-side explode). */
  def gridToTable(grid: DataFrame): DataFrame =
    grid.select(col("variable"), col("origin"), posexplode(col("values")).as(Seq("pos", "value")))
      .select(col("variable"), (col("origin") + col("pos")).as("idx"), col("value"))

  /** isel-style slice [lo, hi) along the streamed dimension with chunk
    * pruning: whole chunks outside the range are skipped before any
    * explode. */
  def slice(grid: DataFrame, lo: Long, hi: Long): DataFrame =
    gridToTable(grid.filter(col("origin") < hi && col("origin") + col("shape") > lo))
      .filter(col("idx") >= lo && col("idx") < hi)

  /** Per-variable stats from chunk rows only (partial-aggregating:
    * each chunk contributes its local min/max/sum/count). */
  def stats(grid: DataFrame): DataFrame =
    grid
      .select(col("variable"), col("shape"),
        expr("array_min(values)").as("cmin"),
        expr("array_max(values)").as("cmax"),
        expr("aggregate(values, CAST(0 AS DECIMAL(28,2)), (acc, x) -> CAST(acc + CAST(x AS DECIMAL(9,2)) AS DECIMAL(28,2)))").as("csum"))
      .groupBy("variable")
      .agg(sum(col("shape")).as("n"),
        min(col("cmin")).as("vmin"),
        max(col("cmax")).as("vmax"),
        sum(col("csum")).cast(DoubleType).as("vsum"))

  // ------------------------------------------------------------ queries

  private val CHUNK = 512

  private def liOrdered(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")

  private val orderCols = Seq(col("l_orderkey"), col("l_linenumber"))

  /** The shared grid-query base now routes through the SOURCE-INDEX
    * path (r6): the (idx, v) table is staged to parquet ONCE per
    * session — the sort is paid at "ingest", like a real pipeline pays
    * it once at layout time — and every grid operator afterwards
    * builds its chunks sort-free (one hash shuffle on chunk_idx, no
    * rangepartitioning, no zipWithIndex count job; pinned in
    * PlanAuditSpec). Before r6 every halo operator re-paid the range
    * sort at query time — the verdicts' one standing perf soft spot. */
  private def indexedQty(s: SparkSession, dir: String): DataFrame =
    indexedVar(s, dir, "qty_indexed", col("l_quantity"))

  /** r16 optimization round: the SAME r6 source-index staging for the
    * l_extendedprice variable — pre-r16 five grid keys
    * (grid_chunk_iter, grid_stats, grid_elementwise, grid_argminmax,
    * grid_zonal_stats) re-paid the fallback range sort + zipWithIndex
    * count job on every invocation for their price grid, exactly the
    * "re-paid the range sort at query time" soft spot r6 closed for
    * the quantity grid. Both indexes register with [[Staged]] so the
    * bench charges layout to its staging line. */
  private def indexedPrice(s: SparkSession, dir: String): DataFrame =
    indexedVar(s, dir, "price_indexed", col("l_extendedprice"))

  Staged.register("qty_indexed")((s, dir) => { indexedQty(s, dir); () })
  Staged.register("price_indexed")((s, dir) => { indexedPrice(s, dir); () })

  private def indexedVar(s: SparkSession, dir: String, tag: String,
      v: Column): DataFrame = {
    val out = graft.sources.netcdf.NcQueries.scratch(s, dir, tag)
    // r17 (r16 ADVICE): the write is serialized through stageOnce —
    // the former non-atomic contains/add pair let two concurrent
    // first-touches both run the zipWithIndex write to the same path,
    // a live hazard now that prestage builds artifacts concurrently.
    graft.sources.netcdf.NcQueries.stageOnce(out) {
      import s.implicits._
      val sorted = liOrdered(s, dir)
        .select(orderCols :+ v.cast(DoubleType).as("v"): _*)
        .orderBy(orderCols: _*)
        .select("v")
      sorted.as[Double].rdd
        .zipWithIndex()
        .map { case (vv, idx) => (idx, vv) }
        .toDF("idx", "v")
        .write.mode("overwrite").parquet(out)
    }
    s.read.parquet(out)
  }

  /** Sort-free price grid over the staged source index (chunk size
    * selectable — the staged (idx, v) table is chunk-agnostic). */
  private def priceGrid(s: SparkSession, dir: String, chunkSize: Int = CHUNK): DataFrame =
    tableToGrid(indexedPrice(s, dir), Nil, col("v"), "l_extendedprice", chunkSize,
      indexCol = Some(col("idx")))

  private def qtyGrid(s: SparkSession, dir: String): DataFrame =
    tableToGrid(indexedQty(s, dir), Nil, col("v"), "l_quantity", CHUNK,
      indexCol = Some(col("idx")))

  /** Chunk rows with an order-sensitive content hash (int-cast values
    * joined by ',' then md5) — proves chunk content AND order. */
  def gridTableToGrid: Q = (s, dir) => {
    qtyGrid(s, dir).select(
      col("variable"), col("chunk_idx"), col("origin"), col("shape"),
      md5(concat_ws(",", expr("transform(values, x -> CAST(CAST(x AS INT) AS STRING))")))
        .as("values_hash"),
      expr("CAST(aggregate(values, CAST(0 AS DECIMAL(28,2)), (acc, x) -> CAST(acc + CAST(x AS DECIMAL(9,2)) AS DECIMAL(28,2))) AS DOUBLE)")
        .as("sum_val"))
  }

  private val orderedCte =
    """o AS (SELECT l_quantity AS v,
      |  row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS idx
      |  FROM lineitem)""".stripMargin

  val gridTableToGridSql: String =
    s"""WITH $orderedCte
       |SELECT 'l_quantity' AS variable, idx // $CHUNK AS chunk_idx,
       |  MIN(idx) AS origin, COUNT(*) AS shape,
       |  md5(string_agg(CAST(CAST(v AS INT) AS VARCHAR), ',' ORDER BY idx)) AS values_hash,
       |  CAST(SUM(CAST(v AS DECIMAL(9,2))) AS DOUBLE) AS sum_val
       |FROM o GROUP BY idx // $CHUNK""".stripMargin

  /** Chunk iteration over a second variable at a different chunk size
    * (`yieldNumpyData(single_entity=False)`): one row per chunk with
    * cent-exact content hash. */
  def gridChunkIter: Q = (s, dir) => {
    priceGrid(s, dir, 256) // r16: staged source index, sort-free
      .select(col("variable"), col("chunk_idx"), col("origin"), col("shape"),
        md5(concat_ws(",",
          expr("transform(values, x -> CAST(CAST(round(x * 100) AS BIGINT) AS STRING))")))
          .as("values_hash"))
  }

  val gridChunkIterSql: String =
    """WITH o AS (SELECT l_extendedprice AS v,
      |  row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS idx
      |  FROM lineitem)
      |SELECT 'l_extendedprice' AS variable, idx // 256 AS chunk_idx,
      |  MIN(idx) AS origin, COUNT(*) AS shape,
      |  md5(string_agg(CAST(CAST(round(v * 100) AS BIGINT) AS VARCHAR), ',' ORDER BY idx)) AS values_hash
      |FROM o GROUP BY idx // 256""".stripMargin

  /** Slice [1000, 2500) of the chunked quantity grid. */
  def gridSlice: Q = (s, dir) =>
    slice(qtyGrid(s, dir), 1000L, 2500L).drop("variable")

  val gridSliceSql: String =
    s"""WITH $orderedCte
       |SELECT idx, v AS value FROM o WHERE idx >= 1000 AND idx < 2500""".stripMargin

  /** Full grid → table reconstruction (exact value passthrough). */
  def gridGridToTable: Q = (s, dir) =>
    gridToTable(qtyGrid(s, dir)).drop("variable")

  val gridGridToTableSql: String =
    s"""WITH $orderedCte
       |SELECT idx, v AS value FROM o""".stripMargin

  /** Distributed per-variable stats over two chunked variables. */
  def gridStats: Q = (s, dir) => {
    val g1 = qtyGrid(s, dir)
    val g2 = priceGrid(s, dir) // r16: staged source index, sort-free
    stats(g1.unionAll(g2))
  }

  val gridStatsSql: String =
    """SELECT variable, COUNT(*) AS n, MIN(v) AS vmin, MAX(v) AS vmax,
      |  CAST(SUM(CAST(v AS DECIMAL(9,2))) AS DOUBLE) AS vsum
      |FROM (
      |  SELECT 'l_quantity' AS variable, l_quantity AS v FROM lineitem
      |  UNION ALL
      |  SELECT 'l_extendedprice' AS variable, l_extendedprice AS v FROM lineitem) u
      |GROUP BY variable""".stripMargin

  /** Chunk-dimension selection (the reference's `chunk_dimension`
    * argument): re-chunk a rank-2 (record × N) variable so iteration
    * streams along the SECOND axis instead of the record axis. Chunks
    * tile BOTH axes ([recBlock × dimBlock] cells) with values laid out
    * dim-major — the 100 TB generalization: a single second-axis slab
    * spans every record, so bounded 2-D tiles are the only shape whose
    * rows stay O(recBlock·dimBlock) regardless of corpus size. One
    * shuffle, keyed by (rec_chunk, dim_chunk) — cardinality
    * totalElems / (recBlock·dimBlock), skew-free by construction. */
  def rechunkByDim(
      df: DataFrame,
      recCol: Column,
      arrCol: Column,
      varName: String,
      recBlock: Int,
      dimBlock: Int): DataFrame =
    df.select(recCol.cast(LongType).as("rec"), posexplode(arrCol).as(Seq("pos", "x")))
      .groupBy(floor(col("rec") / recBlock).as("rec_chunk"),
        floor(col("pos") / dimBlock).as("dim_chunk"))
      .agg(
        min(col("rec")).as("rec_origin"),
        min(col("pos").cast(LongType)).as("dim_origin"),
        countDistinct(col("rec")).as("shape_rec"),
        countDistinct(col("pos")).as("shape_dim"),
        // dim-major: struct sort by (pos, rec) = stream along axis 1
        expr("transform(array_sort(collect_list(struct(pos, rec, x))), s -> s.x)")
          .as("values"))
      .withColumn("variable", lit(varName))

  /** Down-sample a chunked variable by factor k: mean of each k-block
    * along the streamed dimension — per-chunk map work because the
    * chunk size is a multiple of k (chunk 512, k 8). */
  def resample(grid: DataFrame, k: Int): DataFrame =
    gridToTable(grid)
      .groupBy(col("variable"), floor(col("idx") / k).as("block"))
      .agg(sum(expr("CAST(value AS DECIMAL(9,2))")).cast(DoubleType).as("blk_sum"),
        count(lit(1)).as("blk_n"))
      .select(col("variable"), col("block"), (col("blk_sum") / col("blk_n")).as("blk_mean"))

  /** Generic halo exchange — THE primitive under every chunk-local
    * sliding-window op ([[rollingMean]], [[interpolate]], [[lagDiff]]):
    * attach the previous chunk's last `tailN` values as `halo_tail`
    * and/or the next chunk's first `headN` values as `halo_head` to
    * each chunk row (empty arrays at the corpus boundaries). Each halo
    * is a self-join whose right side is O(chunks) tiny rows — the ONLY
    * data movement any windowed op over a chunked stream needs, where
    * the naive explode + global ORDER BY window would range-shuffle
    * the entire variable. Halos must not exceed the minimum chunk size
    * (a window reaching past the adjacent chunk would need deeper
    * neighbors). */
  def haloExchange(grid: DataFrame, tailN: Int, headN: Int): DataFrame = {
    val empty = expr("CAST(array() AS ARRAY<DOUBLE>)")
    val withTail =
      if (tailN <= 0) grid.withColumn("halo_tail", empty)
      else {
        val h = grid.select((col("chunk_idx") + 1).as("chunk_idx"),
          expr(s"slice(values, -least($tailN, size(values)), least($tailN, size(values)))")
            .as("halo_tail"))
        grid.join(h, Seq("chunk_idx"), "left")
          .withColumn("halo_tail", coalesce(col("halo_tail"), empty))
      }
    if (headN <= 0) withTail.withColumn("halo_head", empty)
    else {
      val h = grid.select((col("chunk_idx") - 1).as("chunk_idx"),
        expr(s"slice(values, 1, least($headN, size(values)))").as("halo_head"))
      withTail.join(h, Seq("chunk_idx"), "left")
        .withColumn("halo_head", coalesce(col("halo_head"), empty))
    }
  }

  /** Trailing rolling mean (width w) along the streamed dimension,
    * computed CHUNK-LOCALLY via [[haloExchange]] (tail halo of w-1
    * values), then one map-side `transform` per chunk. Sums are
    * decimal-exact so chunk boundaries cannot perturb float
    * association. */
  def rollingMean(grid: DataFrame, w: Int): DataFrame = {
    val h = w - 1
    haloExchange(grid, h, 0)
      .withColumn("full", concat(col("halo_tail"), col("values")))
      .withColumn("hl", size(col("halo_tail")))
      .select(col("variable"), col("origin"),
        posexplode(expr(
          s"""transform(values, (x, i) -> CAST(aggregate(
             |  slice(full, greatest(1, hl + i + 1 - $h), hl + i + 2 - greatest(1, hl + i + 1 - $h)),
             |  CAST(0 AS DECIMAL(28,2)),
             |  (acc, y) -> CAST(acc + CAST(y AS DECIMAL(9,2)) AS DECIMAL(28,2))) AS DOUBLE)
             |  / (hl + i + 2 - greatest(1, hl + i + 1 - $h)))""".stripMargin))
          .as(Seq("pos", "roll_mean")))
      .select((col("origin") + col("pos")).as("idx"), col("roll_mean"))
  }

  /** Linear interpolation upsampling ×k along the streamed dimension,
    * chunk-local with a HEAD halo: each chunk receives the next
    * chunk's first value (one double per chunk), so every in-chunk
    * target — including ones straddling the chunk boundary — is a
    * map-side array lookup. Target j samples position j/k; fractions
    * p%k / k are exact binary doubles, and both engines evaluate the
    * identical v_lo*(1-f) + v_hi*f form, so results are bit-equal. */
  def interpolate(grid: DataFrame, k: Int): DataFrame = {
    haloExchange(grid, 0, 1)
      .withColumn("full", concat(col("values"), col("halo_head")))
      .select(col("origin"),
        posexplode(expr(
          s"""transform(sequence(0, size(values) * $k - 1), p -> named_struct(
             |  'keep', p % $k = 0 OR p div $k + 2 <= size(full),
             |  'ival', try_element_at(full, CAST(p div $k AS INT) + 1)
             |          * (CAST(1 AS DOUBLE) - (p % $k) / CAST($k AS DOUBLE))
             |        + coalesce(try_element_at(full, CAST(p div $k AS INT) + 2),
             |                   try_element_at(full, CAST(p div $k AS INT) + 1))
             |          * ((p % $k) / CAST($k AS DOUBLE))))""".stripMargin))
          .as(Seq("p", "s")))
      .filter(col("s.keep"))
      .select((col("origin") * k + col("p")).as("tidx"), col("s.ival").as("ival"))
  }

  /** First difference along the streamed dimension (delta encoding /
    * d/dt of a time-series variable): chunk-local with a ONE-element
    * tail halo — the minimal case of the [[rollingMean]] halo pattern.
    * idx 0 has no predecessor and is omitted, exactly like SQL's
    * lag()-based formulation (which would range-shuffle the variable;
    * this ships one double per chunk). */
  def lagDiff(grid: DataFrame): DataFrame = {
    haloExchange(grid, 1, 0)
      .withColumn("full", concat(col("halo_tail"), col("values")))
      .withColumn("hl", size(col("halo_tail")))
      .select(col("origin"), col("hl"),
        posexplode(expr(
          """CASE WHEN size(full) < 2 THEN CAST(array() AS ARRAY<DOUBLE>)
            |ELSE transform(sequence(1, size(full) - 1),
            |  j -> try_element_at(full, j + 1) - try_element_at(full, j)) END""".stripMargin))
          .as(Seq("pos", "delta")))
      .select((col("origin") - col("hl") + col("pos") + 1).as("idx"), col("delta"))
  }

  /** Bounded forward-fill along the streamed dimension: missing values
    * (sentinel -1) take the nearest preceding present value within
    * window w, chunk-locally via [[haloExchange]] (tail halo of w-1
    * values) — the standard gap-repair op for sensor/time-series
    * variables, and the third distinct consumer of the halo
    * combinator (mean, diff, fill). A position with no donor in its
    * window stays null. */
  def fillForward(grid: DataFrame, w: Int): DataFrame = {
    val h = w - 1
    haloExchange(grid, h, 0)
      .withColumn("full", concat(col("halo_tail"), col("values")))
      .withColumn("hl", size(col("halo_tail")))
      .select(col("origin"),
        posexplode(expr(
          s"""transform(values, (x, i) -> try_element_at(
             |  filter(slice(full, greatest(1, hl + i + 1 - $h),
             |               hl + i + 2 - greatest(1, hl + i + 1 - $h)),
             |         y -> y >= 0), -1))""".stripMargin))
          .as(Seq("pos", "filled")))
      .select((col("origin") + col("pos")).as("idx"), col("filled"))
  }

  /** Quantity grid with value 49 as the synthetic missing sentinel
    * (-1): exercises fill-forward against the lag-window oracle. */
  def gridFillForward: Q = (s, dir) => {
    val g = qtyGrid(s, dir)
      .withColumn("values",
        expr("transform(values, v -> CASE WHEN CAST(v AS INT) = 49 THEN CAST(-1 AS DOUBLE) ELSE v END)"))
    fillForward(g, 8)
  }

  val gridFillForwardSql: String =
    s"""WITH $orderedCte,
       |m AS (SELECT idx, CASE WHEN CAST(v AS INT) = 49 THEN NULL ELSE v END AS v FROM o)
       |SELECT idx,
       |  last_value(v IGNORE NULLS) OVER (ORDER BY idx
       |    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS filled
       |FROM m""".stripMargin

  def gridLagDiff: Q = (s, dir) =>
    lagDiff(qtyGrid(s, dir))

  val gridLagDiffSql: String =
    s"""WITH $orderedCte
       |SELECT idx, v - prev AS delta FROM (
       |  SELECT idx, v, lag(v) OVER (ORDER BY idx) AS prev FROM o) sub
       |WHERE prev IS NOT NULL""".stripMargin

  private val ROLL_W = 7

  def gridRollingMean: Q = (s, dir) =>
    rollingMean(qtyGrid(s, dir), ROLL_W)

  val gridRollingMeanSql: String =
    s"""WITH $orderedCte
       |SELECT idx,
       |  CAST(SUM(CAST(v AS DECIMAL(9,2))) OVER w AS DOUBLE)
       |    / COUNT(*) OVER w AS roll_mean
       |FROM o
       |WINDOW w AS (ORDER BY idx ROWS BETWEEN ${ROLL_W - 1} PRECEDING AND CURRENT ROW)""".stripMargin

  def gridInterpolate: Q = (s, dir) =>
    interpolate(qtyGrid(s, dir), 4)

  val gridInterpolateSql: String =
    s"""WITH $orderedCte,
       |t AS (SELECT idx * 4 + f.p AS j FROM o CROSS JOIN generate_series(0, 3) f(p)
       |      WHERE idx * 4 + f.p <= (SELECT 4 * (COUNT(*) - 1) FROM o))
       |SELECT t.j AS tidx,
       |  lo.v * (1.0 - (t.j % 4) / 4.0)
       |    + COALESCE(hi.v, lo.v) * ((t.j % 4) / 4.0) AS ival
       |FROM t JOIN o lo ON lo.idx = t.j // 4
       |LEFT JOIN o hi ON hi.idx = t.j // 4 + 1""".stripMargin

  def gridResample: Q = (s, dir) =>
    resample(qtyGrid(s, dir), 8).drop("variable")

  val gridResampleSql: String =
    s"""WITH $orderedCte
       |SELECT idx // 8 AS block,
       |  CAST(SUM(CAST(v AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS blk_mean
       |FROM o GROUP BY idx // 8""".stripMargin

  /** Chunk-dimension selection over the rank-2 embeddings variable
    * (500+ records × 64 dims → [256 × 16] dim-major tiles). The check
    * re-derives each element's tile-local ordinal from the ACTUAL
    * array order (posexplode of the built values) and weights a
    * decimal sum with it, so any misplaced element — wrong tile, wrong
    * dim-major position — changes wsum; the oracle recomputes the
    * ordinal from the closed form (pos - dim0)·nrecs + (rec - rec0). */
  def gridRechunkDim: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    rechunkByDim(emb, col("vec_id"), col("v"), "embedding", 256, 16)
      .select(col("rec_chunk"), col("dim_chunk"), col("rec_origin"), col("dim_origin"),
        col("shape_rec"), col("shape_dim"), posexplode(col("values")).as(Seq("lp", "x")))
      .groupBy("rec_chunk", "dim_chunk", "rec_origin", "dim_origin", "shape_rec", "shape_dim")
      .agg(count(lit(1)).as("n"),
        sum(col("lp").cast(DecimalType(10, 0)) * col("x").cast(DecimalType(12, 8)))
          .cast(DoubleType).as("wsum"))
  }

  val gridRechunkDimSql: String =
    """WITH el AS (
      |  SELECT vec_id AS rec, pos - 1 AS pos, CAST(embedding[pos] AS DOUBLE) AS x
      |  FROM embeddings CROSS JOIN generate_series(1, 64) t(pos)),
      |sz AS (SELECT rec // 256 AS rec_chunk, COUNT(DISTINCT rec) AS nrc
      |       FROM el GROUP BY rec // 256)
      |SELECT e.rec // 256 AS rec_chunk, e.pos // 16 AS dim_chunk,
      |  MIN(e.rec) AS rec_origin, MIN(e.pos) AS dim_origin,
      |  s.nrc AS shape_rec, COUNT(DISTINCT e.pos) AS shape_dim,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST((e.pos - (e.pos // 16) * 16) * s.nrc + (e.rec - (e.rec // 256) * 256) AS DECIMAL(10,0))
      |    * CAST(e.x AS DECIMAL(12,8))) AS DOUBLE) AS wsum
      |FROM el e JOIN sz s ON s.rec_chunk = e.rec // 256
      |GROUP BY e.rec // 256, e.pos // 16, s.nrc""".stripMargin

  /** Climatology anomaly (xarray's `ds.groupby("time.hour") -
    * ds.groupby("time.hour").mean()` — seasonal-cycle removal): each
    * streamed-dim position belongs to a phase (idx mod 24); the
    * per-phase mean over the whole variable is the climatology, and
    * the anomaly is the value minus its phase's mean. Two passes:
    * a 24-row partial-agg climatology (cent-exact DECIMAL sums),
    * BROADCAST back to a map-side join — the corpus never shuffles.
    * The anomaly is computed from integers (value·n − Σ, in cents)
    * and divided once, so both engines agree bit-for-bit at round 6. */
  def gridClimatology: Q = (s, dir) => {
    val tab = gridToTable(qtyGrid(s, dir))
      .withColumn("phase", expr("idx % 24"))
      .withColumn("vc", expr("CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)"))
    val clim = tab.groupBy("phase")
      .agg(sum(col("vc")).as("sum_c"), count(lit(1)).as("n_p"))
    tab.join(broadcast(clim), Seq("phase"))
      .select(col("idx"), col("phase"), col("value"),
        round((col("vc") * col("n_p") - col("sum_c")) / (col("n_p") * lit(100.0)), 6)
          .as("anom"))
  }

  val gridClimatologySql: String =
    s"""WITH $orderedCte,
       |tb AS (SELECT idx, idx % 24 AS phase, v,
       |         CAST(CAST(v AS DECIMAL(9,2)) * 100 AS BIGINT) AS vc FROM o),
       |clim AS (SELECT phase, CAST(SUM(vc) AS BIGINT) AS sum_c,
       |           CAST(COUNT(*) AS BIGINT) AS n_p FROM tb GROUP BY phase)
       |SELECT tb.idx, tb.phase, tb.v AS value,
       |  round((tb.vc * clim.n_p - clim.sum_c) / (clim.n_p * 100.0), 6) AS anom
       |FROM tb JOIN clim USING (phase)""".stripMargin

  /** 2-D tile coarsening over the rank-2 embeddings variable (xarray
    * `coarsen(rec=50, dim=8).mean()`): block means (plus min/max) per
    * [50-record × 8-dim] tile. One partial-agg groupBy on the derived
    * tile key — each task pre-aggregates its elements to ≤ n_tiles
    * rows before the shuffle, and the tile sums are DECIMAL-exact so
    * float association order cannot split the gate. */
  def gridCoarsen2d: Q = (s, dir) => {
    t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(
        col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .withColumn("rec_blk", expr("vec_id div 50"))
      .withColumn("dim_blk", expr("pos div 8"))
      .groupBy("rec_blk", "dim_blk")
      .agg(count(lit(1)).as("n"),
        (sum(col("x").cast(DecimalType(12, 8))).cast(DoubleType) / count(lit(1)))
          .as("blk_mean"),
        min(col("x")).as("blk_min"), max(col("x")).as("blk_max"))
  }

  val gridCoarsen2dSql: String =
    """WITH el AS (
      |  SELECT vec_id, pos - 1 AS pos, CAST(embedding[pos] AS DOUBLE) AS x
      |  FROM embeddings CROSS JOIN generate_series(1, 64) t(pos))
      |SELECT vec_id // 50 AS rec_blk, pos // 8 AS dim_blk,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(x AS DECIMAL(12,8))) AS DOUBLE) / COUNT(*) AS blk_mean,
      |  MIN(x) AS blk_min, MAX(x) AS blk_max
      |FROM el GROUP BY 1, 2""".stripMargin

  /** Cross-variable elementwise algebra (xarray's `a * b` — the core
    * of any derived-variable computation: revenue = qty·price here,
    * anomaly·weight, u²+v² wind speed in the climate case): two
    * variables on the SAME chunking align with ONE equi-join on
    * chunk_idx, and the arithmetic is a map-side `zip_with` over
    * whole chunk arrays — elements never explode into rows, so the
    * shuffle carries one row per chunk regardless of chunk size. The
    * per-chunk product hash is cent×cent-exact (DECIMAL → 1e-4 units
    * as BIGINT), so a single misaligned element anywhere flips a
    * gated value. */
  def gridElementwise: Q = (s, dir) => {
    val a = qtyGrid(s, dir)
    val b = priceGrid(s, dir) // r16: staged source index, sort-free
    a.select(col("chunk_idx"), col("origin"), col("shape"), col("values").as("va"))
      .join(b.select(col("chunk_idx"), col("values").as("vb")), Seq("chunk_idx"))
      .withColumn("prod", expr(
        "zip_with(va, vb, (x, y) -> CAST(x AS DECIMAL(9,2)) * CAST(y AS DECIMAL(9,2)))"))
      .select(lit("qty_x_price").as("variable"), col("chunk_idx"), col("origin"),
        col("shape"),
        md5(concat_ws(",", expr(
          "transform(prod, p -> CAST(CAST(p * 10000 AS BIGINT) AS STRING))")))
          .as("values_hash"),
        expr("CAST(aggregate(prod, CAST(0 AS DECIMAL(28,4)), " +
          "(acc, x) -> CAST(acc + x AS DECIMAL(28,4))) AS DOUBLE)").as("sum_prod"))
  }

  val gridElementwiseSql: String =
    s"""WITH o AS (SELECT l_quantity AS v1, l_extendedprice AS v2,
       |  row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS idx
       |  FROM lineitem),
       |p AS (SELECT idx, CAST(v1 AS DECIMAL(9,2)) * CAST(v2 AS DECIMAL(9,2)) AS prod
       |      FROM o)
       |SELECT 'qty_x_price' AS variable, idx // $CHUNK AS chunk_idx,
       |  MIN(idx) AS origin, COUNT(*) AS shape,
       |  md5(string_agg(CAST(CAST(prod * 10000 AS BIGINT) AS VARCHAR), ',' ORDER BY idx))
       |    AS values_hash,
       |  CAST(SUM(prod) AS DOUBLE) AS sum_prod
       |FROM p GROUP BY idx // $CHUNK""".stripMargin

  /** Per-cell cumulative sum along the streamed dimension (xarray
    * `cumsum(dim='time')` per spatial cell): the grid is viewed as
    * (t = idx/24, cell = idx%24) and the running sum is a window
    * PARTITIONED BY cell — parallelism = number of cells (lat×lon at
    * real scale, so thousands of independent partitions), never a
    * single global sort. Cent-integer accumulation keeps the running
    * sums exact at any length. */
  def gridCumsum: Q = (s, dir) => {
    val tab = gridToTable(qtyGrid(s, dir))
      .withColumn("cell", expr("idx % 24"))
      .withColumn("vc", expr("CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)"))
    val w = Window.partitionBy(col("cell")).orderBy(col("idx"))
    tab.withColumn("csum", round(sum(col("vc")).over(w) / 100.0, 2))
      .select(col("idx"), col("cell"), col("value"), col("csum"))
  }

  val gridCumsumSql: String =
    s"""WITH $orderedCte,
       |tb AS (SELECT idx, idx % 24 AS cell, v,
       |         CAST(CAST(v AS DECIMAL(9,2)) * 100 AS BIGINT) AS vc FROM o)
       |SELECT idx, cell, v AS value,
       |  round(SUM(vc) OVER (PARTITION BY cell ORDER BY idx) / 100.0, 2) AS csum
       |FROM tb""".stripMargin

  /** Area-weighted spatial reduction (xarray `weighted(w).mean(dim=
    * ('lat','lon'))`): per time step t = idx/24, the weighted mean
    * over cells with weight w(cell) = cell+1 — the stand-in for the
    * cos(latitude) area weights that at real scale come from the
    * coordinate variable. One partial-agg'd groupBy keyed by t; the
    * weights ride along map-side (derived from the cell coordinate),
    * so nothing is broadcast and nothing shuffles but the per-t
    * partial sums. Integer-exact: cent values × integer weights. */
  def gridWeightedMean: Q = (s, dir) => {
    val tab = gridToTable(qtyGrid(s, dir))
      .withColumn("t", expr("idx DIV 24"))
      .withColumn("w", expr("idx % 24 + 1"))
      .withColumn("vc", expr("CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)"))
    tab.groupBy("t")
      .agg(sum(col("w") * col("vc")).as("swv"), sum(col("w")).as("sw"),
        count(lit(1)).as("n_cells"))
      .select(col("t"), col("n_cells"),
        round(col("swv") / (col("sw") * 100.0), 6).as("wmean"))
  }

  val gridWeightedMeanSql: String =
    s"""WITH $orderedCte,
       |tb AS (SELECT idx // 24 AS t, idx % 24 + 1 AS w,
       |         CAST(CAST(v AS DECIMAL(9,2)) * 100 AS BIGINT) AS vc FROM o)
       |SELECT t, CAST(COUNT(*) AS BIGINT) AS n_cells,
       |  round(SUM(w * vc) / (SUM(w) * 100.0), 6) AS wmean
       |FROM tb GROUP BY t""".stripMargin

  /** Bilinear 2-D interpolation at fractional grid points (xarray
    * `interp(y=..., x=...)` on a regular y×300 grid over the indexed
    * variable): each target reads its FOUR surrounding cells by exact
    * index key — the corner table (4·N rows, metadata-sized) joins
    * BROADCAST against the indexed variable, so N point
    * interpolations cost one pruned equi-join, never a scan per
    * target and never a window. Corner weights use fractions exact in
    * binary (.25/.5/.75), and the blend is one fixed-association
    * expression, so both engines produce bit-equal results. Corner
    * values ride along in the output — a wrong corner pick breaks the
    * gate even where the blend happens to agree. */
  def gridInterp2d: Q = (s, dir) => {
    import s.implicits._
    val NX = 300
    val targets = Seq((0L, 3.25, 17.5), (1L, 7.0, 42.75), (2L, 12.5, 150.25))
    val corners = targets.flatMap { case (tid, yq, xq) =>
      val y0 = math.floor(yq).toLong
      val x0 = math.floor(xq).toLong
      val fy = yq - y0
      val fx = xq - x0
      for (dy <- 0 to 1; dx <- 0 to 1) yield {
        val w = (if (dy == 0) 1.0 - fy else fy) * (if (dx == 0) 1.0 - fx else fx)
        (tid, yq, xq, (y0 + dy) * NX + (x0 + dx), dy * 2 + dx, w)
      }
    }.toDF("tid", "yq", "xq", "idx", "corner", "w")
    def cv(k: Int) = max(when(col("corner") === k, col("v")))
    def cw(k: Int) = max(when(col("corner") === k, col("w")))
    indexedQty(s, dir).join(broadcast(corners), "idx")
      .groupBy("tid", "yq", "xq")
      .agg(cv(0).as("v00"), cv(1).as("v01"), cv(2).as("v10"), cv(3).as("v11"),
        cw(0).as("w00"), cw(1).as("w01"), cw(2).as("w10"), cw(3).as("w11"))
      .select(col("tid"), col("yq"), col("xq"),
        col("v00"), col("v01"), col("v10"), col("v11"),
        (((col("w00") * col("v00") + col("w01") * col("v01"))
          + col("w10") * col("v10")) + col("w11") * col("v11")).as("ival"))
  }

  val gridInterp2dSql: String =
    s"""WITH $orderedCte,
       |tg(tid, yq, xq) AS (VALUES
       |  (CAST(0 AS BIGINT), CAST(3.25 AS DOUBLE), CAST(17.5 AS DOUBLE)),
       |  (1, CAST(7.0 AS DOUBLE), CAST(42.75 AS DOUBLE)),
       |  (2, CAST(12.5 AS DOUBLE), CAST(150.25 AS DOUBLE))),
       |corners AS (
       |  SELECT tid, yq, xq,
       |    (CAST(FLOOR(yq) AS BIGINT) + dy) * 300 + CAST(FLOOR(xq) AS BIGINT) + dx AS idx,
       |    dy * 2 + dx AS corner,
       |    (CASE WHEN dy = 0 THEN 1.0 - (yq - FLOOR(yq)) ELSE yq - FLOOR(yq) END)
       |      * (CASE WHEN dx = 0 THEN 1.0 - (xq - FLOOR(xq)) ELSE xq - FLOOR(xq) END) AS w
       |  FROM tg CROSS JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) d(dy, dx)),
       |j AS (SELECT c.tid, c.yq, c.xq, c.corner, c.w, o.v
       |      FROM corners c JOIN o ON o.idx = c.idx)
       |SELECT tid, yq, xq,
       |  MAX(CASE WHEN corner = 0 THEN v END) AS v00,
       |  MAX(CASE WHEN corner = 1 THEN v END) AS v01,
       |  MAX(CASE WHEN corner = 2 THEN v END) AS v10,
       |  MAX(CASE WHEN corner = 3 THEN v END) AS v11,
       |  ((MAX(CASE WHEN corner = 0 THEN w END) * MAX(CASE WHEN corner = 0 THEN v END)
       |    + MAX(CASE WHEN corner = 1 THEN w END) * MAX(CASE WHEN corner = 1 THEN v END))
       |    + MAX(CASE WHEN corner = 2 THEN w END) * MAX(CASE WHEN corner = 2 THEN v END))
       |    + MAX(CASE WHEN corner = 3 THEN w END) * MAX(CASE WHEN corner = 3 THEN v END) AS ival
       |FROM j GROUP BY tid, yq, xq""".stripMargin

  /** Conservative REGRIDDING by coordinate binning (xarray-regrid /
    * ESMF "conservative" mode, first order): a CURVILINEAR source
    * grid — lat(y,x) = y + (7x mod 13)/10, lon(y,x) = x + (11y mod
    * 17)/10, jitter > 1 so cells genuinely cross target boundaries —
    * mapped onto a regular 4°×5° target lattice by VALUE (floor of
    * the coordinates, NOT the index: this is what distinguishes
    * regridding from grid_coarsen_2d's index tiling). Target-cell
    * assignment is pure map-side arithmetic, the reduction ONE
    * partial-agg groupBy on (ty, tx) with decimal-exact sums — the
    * shape that regrids a 100 TB variable in a single pass. */
  def gridRegridBin: Q = (s, dir) => {
    indexedQty(s, dir).selectExpr(
      "cast(floor((cast(idx div 300 as double) + cast(((idx % 300) * 7) % 13 as double) / 10.0) / 4.0) as bigint) as ty",
      "cast(floor((cast(idx % 300 as double) + cast(((idx div 300) * 11) % 17 as double) / 10.0) / 5.0) as bigint) as tx",
      "v")
      .groupBy("ty", "tx")
      .agg(count(lit(1)).as("n_cells"),
        expr("cast(sum(cast(v as decimal(9,2))) as double)").as("sum_val"),
        (expr("cast(sum(cast(v as decimal(9,2))) as double)") / count(lit(1)))
          .as("mean_val"))
  }

  val gridRegridBinSql: String =
    s"""WITH $orderedCte,
       |cells AS (
       |  SELECT v,
       |    CAST(idx // 300 AS DOUBLE) + CAST((idx % 300) * 7 % 13 AS DOUBLE) / 10.0 AS lat,
       |    CAST(idx % 300 AS DOUBLE) + CAST((idx // 300) * 11 % 17 AS DOUBLE) / 10.0 AS lon
       |  FROM o)
       |SELECT CAST(FLOOR(lat / 4.0) AS BIGINT) AS ty,
       |  CAST(FLOOR(lon / 5.0) AS BIGINT) AS tx,
       |  COUNT(*) AS n_cells,
       |  CAST(SUM(CAST(v AS DECIMAL(9,2))) AS DOUBLE) AS sum_val,
       |  CAST(SUM(CAST(v AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS mean_val
       |FROM cells GROUP BY 1, 2""".stripMargin

  /** Symmetric stencil convolution along the streamed dimension
    * (kernel [1, 2, 1]/4 — the binomial smoother; scipy/xarray
    * `convolve`/`smooth` over a time axis): the fourth consumer of
    * [[haloExchange]], with BOTH a one-element tail and head halo, so
    * every interior position is a map-side array read — the corpus
    * never shuffles, only one double per chunk edge moves. Boundary
    * positions (no full window) are omitted, like [[lagDiff]]'s idx 0.
    * Cent-integer weighting keeps the result one exact integer
    * divided once, so both engines agree bit-for-bit. */
  def gridConvolve: Q = (s, dir) => {
    haloExchange(qtyGrid(s, dir), 1, 1)
      .withColumn("full", concat(col("halo_tail"), col("values"), col("halo_head")))
      .withColumn("hl", size(col("halo_tail")))
      .select(col("origin"),
        posexplode(expr(
          """transform(values, (x, i) -> named_struct(
            |  'keep', hl + i >= 1 AND hl + i + 2 <= size(full),
            |  'cv', CASE WHEN hl + i >= 1 AND hl + i + 2 <= size(full)
            |    THEN CAST(CAST(try_element_at(full, hl + i) AS DECIMAL(9,2)) * 100 AS BIGINT)
            |      + 2 * CAST(CAST(try_element_at(full, hl + i + 1) AS DECIMAL(9,2)) * 100 AS BIGINT)
            |      + CAST(CAST(try_element_at(full, hl + i + 2) AS DECIMAL(9,2)) * 100 AS BIGINT)
            |    END))""".stripMargin))
          .as(Seq("pos", "st")))
      .filter(col("st.keep"))
      .select((col("origin") + col("pos")).as("idx"),
        (col("st.cv") / 400.0).as("smooth"))
  }

  val gridConvolveSql: String =
    s"""WITH $orderedCte,
       |c AS (SELECT idx, CAST(CAST(v AS DECIMAL(9,2)) * 100 AS BIGINT) AS vc FROM o),
       |w AS (SELECT idx,
       |        lag(vc) OVER (ORDER BY idx) AS lft, vc,
       |        lead(vc) OVER (ORDER BY idx) AS rgt
       |      FROM c)
       |SELECT idx, (lft + 2 * vc + rgt) / 400.0 AS smooth
       |FROM w WHERE lft IS NOT NULL AND rgt IS NOT NULL""".stripMargin

  /** Per-cell linear DETRENDING (xarray/climpred `detrend(dim='time')`
    * — remove each spatial cell's OLS time trend before anomaly
    * analysis): the grid is viewed as (t = idx div 240, cell = idx %
    * 240). Using the centered integer time u = 2t − (n−1) makes
    * Σu = 0 EXACTLY, so the OLS fit decouples into mean + slope with
    * ALL-BIGINT sufficient statistics (Σvc, Σu·vc, Σu² in cents) —
    * no matrix solve, no floats until the single final division:
    * fitted_c = (Σvc·Σu² + u·Σuvc·n) / (n·Σu²). One 240-row
    * partial-agg pass broadcast back map-side — same two-pass
    * zero-corpus-shuffle shape as [[gridClimatology]]. Magnitudes stay
    * under 2^63 through sf0.1 with ~50× headroom (documented bound:
    * n_cell ≤ 3000, vc ≤ 10^4). */
  def gridDetrend: Q = (s, dir) => {
    val tab = gridToTable(qtyGrid(s, dir))
      .withColumn("cell", expr("idx % 240"))
      .withColumn("t", expr("idx div 240"))
      .withColumn("vc", expr("CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)"))
    val stats = tab.groupBy("cell")
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("sv"),
        sum(col("t") * col("vc")).as("stv"),
        sum(col("t")).as("st"), sum(col("t") * col("t")).as("st2"))
      // Σu·vc = 2Σt·vc − (n−1)Σvc ; Σu² = 4Σt² − 4(n−1)Σt + n(n−1)²
      .select(col("cell"), col("n"), col("sv"),
        (col("stv") * 2 - (col("n") - 1) * col("sv")).as("suv"),
        (col("st2") * 4 - (col("n") - 1) * col("st") * 4
          + col("n") * (col("n") - 1) * (col("n") - 1)).as("su2"))
    tab.join(broadcast(stats), Seq("cell"))
      .withColumn("u", col("t") * 2 - (col("n") - 1))
      .select(col("idx"), col("cell"), col("value"),
        round((col("sv") * col("su2") + col("u") * col("suv") * col("n"))
          / (col("n") * col("su2") * lit(100.0)), 6).as("fitted"),
        round(col("value") - (col("sv") * col("su2") + col("u") * col("suv") * col("n"))
          / (col("n") * col("su2") * lit(100.0)), 6).as("resid"))
  }

  val gridDetrendSql: String =
    s"""WITH $orderedCte,
       |tb AS (SELECT idx, idx % 240 AS cell, idx // 240 AS t, v,
       |         CAST(CAST(v AS DECIMAL(9,2)) * 100 AS BIGINT) AS vc FROM o),
       |st AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(SUM(vc) AS BIGINT) AS sv,
       |         CAST(2 * SUM(t * vc) - (COUNT(*) - 1) * SUM(vc) AS BIGINT) AS suv,
       |         CAST(4 * SUM(t * t) - 4 * (COUNT(*) - 1) * SUM(t)
       |           + COUNT(*) * (COUNT(*) - 1) * (COUNT(*) - 1) AS BIGINT) AS su2
       |       FROM tb GROUP BY cell)
       |SELECT tb.idx, tb.cell, tb.v AS value,
       |  round((st.sv * st.su2 + (2 * tb.t - (st.n - 1)) * st.suv * st.n)
       |    / (st.n * st.su2 * 100.0), 6) AS fitted,
       |  round(tb.v - (st.sv * st.su2 + (2 * tb.t - (st.n - 1)) * st.suv * st.n)
       |    / (st.n * st.su2 * 100.0), 6) AS resid
       |FROM tb JOIN st USING (cell)""".stripMargin

  /** Distributed argmin/argmax along the streamed dimension (xarray
    * `argmin('time')`/`argmax` — WHERE the extreme is, not what): one
    * partial-aggregating pass per variable where each task reduces its
    * rows to a single (value, idx) candidate struct — lexicographic
    * struct min gives "extreme value, then earliest index", a total
    * order, so ties break deterministically on BOTH engines. Never a
    * global sort, never a window. */
  def gridArgminmax: Q = (s, dir) => {
    val g1 = qtyGrid(s, dir)
    val g2 = priceGrid(s, dir) // r16: staged source index, sort-free
    gridToTable(g1.unionAll(g2))
      .withColumn("vc", expr("CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)"))
      .groupBy("variable")
      .agg(
        min(struct(col("vc"), col("idx"))).as("mn"),
        min(struct((-col("vc")).as("nvc"), col("idx"))).as("mx"))
      .select(col("variable"),
        (col("mn.vc") / 100.0).as("min_val"), col("mn.idx").as("min_idx"),
        (-col("mx.nvc") / 100.0).as("max_val"), col("mx.idx").as("max_idx"))
  }

  val gridArgminmaxSql: String =
    """WITH o AS (SELECT l_quantity AS q, l_extendedprice AS p,
      |  row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS idx
      |  FROM lineitem),
      |t AS (
      |  SELECT 'l_quantity' AS variable, idx,
      |    CAST(CAST(q AS DECIMAL(9,2)) * 100 AS BIGINT) AS vc FROM o
      |  UNION ALL
      |  SELECT 'l_extendedprice', idx,
      |    CAST(CAST(p AS DECIMAL(9,2)) * 100 AS BIGINT) FROM o),
      |ext AS (SELECT variable, MIN(vc) AS minc, MAX(vc) AS maxc
      |        FROM t GROUP BY variable)
      |SELECT t.variable,
      |  MIN(ext.minc) / 100.0 AS min_val,
      |  CAST(MIN(CASE WHEN t.vc = ext.minc THEN t.idx END) AS BIGINT) AS min_idx,
      |  MIN(ext.maxc) / 100.0 AS max_val,
      |  CAST(MIN(CASE WHEN t.vc = ext.maxc THEN t.idx END) AS BIGINT) AS max_idx
      |FROM t JOIN ext ON ext.variable = t.variable
      |GROUP BY t.variable""".stripMargin

  /** ZONAL STATISTICS (r12 — the raster-analytics staple: aggregate a
    * value grid by the CLASSES of a second, spatially-aligned grid —
    * "mean temperature per land-cover class"): the zone grid here is
    * the quantity variable bucketed to 8 classes, the value grid is
    * extendedprice, and alignment is the chunk-keyed equi-join +
    * zip_with device grid_elementwise established (both grids chunk
    * the SAME index domain at the same size, so the join is
    * co-partitioned by construction — no range shuffle, no fan-out).
    * After the map-side zip/explode, the rollup partial-aggregates to
    * ≤ 8 rows: per-zone count, cent-exact min/max, and a
    * DECIMAL-exact sum — order-free, bit-identical cross-engine. */
  def gridZonalStats: Q = (s, dir) => {
    // zone id floors EXPLICITLY before the int cast (r12 ADVICE):
    // Spark's CAST(DOUBLE AS INT) truncates while DuckDB's
    // CAST(DECIMAL AS INT) rounds half-up — they agree on TPC-H's
    // integral quantities only. floor() on both sides makes the zone
    // law engine-independent for any future non-integral zone grid.
    val zones = qtyGrid(s, dir)
      .select(col("chunk_idx"), expr("transform(values, v -> CAST(floor(v) AS INT) % 8)").as("zs"))
    val vals = priceGrid(s, dir) // r16: staged source index, sort-free
      .select(col("chunk_idx"), col("values").as("vs"))
    zones.join(vals, Seq("chunk_idx"))
      .select(explode(expr("zip_with(zs, vs, (z, v) -> struct(z AS zone, v AS v))")).as("p"))
      .select(col("p.zone").as("zone"), col("p.v").as("v"))
      .groupBy("zone")
      .agg(count(lit(1)).as("n"),
        min(expr("CAST(CAST(v AS DECIMAL(9,2)) * 100 AS BIGINT)")).as("vmin_cents"),
        max(expr("CAST(CAST(v AS DECIMAL(9,2)) * 100 AS BIGINT)")).as("vmax_cents"),
        sum(expr("CAST(v AS DECIMAL(9,2))")).cast(DoubleType).as("vsum"))
  }

  val gridZonalStatsSql: String =
    """SELECT CAST(floor(l_quantity) AS INT) % 8 AS zone, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(CAST(MIN(l_extendedprice) AS DECIMAL(9,2)) * 100 AS BIGINT) AS vmin_cents,
      |  CAST(CAST(MAX(l_extendedprice) AS DECIMAL(9,2)) * 100 AS BIGINT) AS vmax_cents,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS vsum
      |FROM lineitem GROUP BY 1""".stripMargin

  /** MULTI-RESOLUTION PYRAMID (r13 — the raster tile-pyramid build:
    * every zoom level's downsampled grid materialized in ONE pass, the
    * way map/earth-data servers pre-render overviews): levels 2/4/8/16
    * explode map-side per element (4 rows per cell — constant fan-out,
    * no joins), block means per (level, idx div level) via one
    * partial-agg groupBy with DECIMAL-exact cent sums, plus per-block
    * min/max. At 100 TB the pyramid costs one scan + one bounded
    * shuffle (Σ n/level block rows), not one pass per level. */
  def gridPyramid: Q = (s, dir) => {
    gridToTable(qtyGrid(s, dir))
      .withColumn("vc", expr("CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)"))
      .select(col("idx"), col("vc"),
        explode(expr("array(2, 4, 8, 16)")).as("level"))
      .groupBy(col("level"), expr("idx div level").as("blk"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("vc")).cast(DoubleType) / (count(lit(1)) * lit(100.0)), 6)
          .as("blk_mean"),
        min(col("vc")).as("blk_min_cents"),
        max(col("vc")).as("blk_max_cents"))
      .select(col("level").cast(LongType).as("level"), col("blk"),
        col("n"), col("blk_mean"), col("blk_min_cents"), col("blk_max_cents"))
  }

  val gridPyramidSql: String =
    s"""WITH $orderedCte,
       |tb AS (SELECT idx, CAST(CAST(v AS DECIMAL(9,2)) * 100 AS BIGINT) AS vc FROM o),
       |lv AS (SELECT idx, vc, unnest([2, 4, 8, 16]) AS level FROM tb)
       |SELECT CAST(level AS BIGINT) AS level, idx // level AS blk,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  round(CAST(SUM(vc) AS DOUBLE) / (COUNT(*) * 100.0), 6) AS blk_mean,
       |  CAST(MIN(vc) AS BIGINT) AS blk_min_cents,
       |  CAST(MAX(vc) AS BIGINT) AS blk_max_cents
       |FROM lv GROUP BY level, idx // level""".stripMargin

  val queries: Map[String, Q] = Map(
    "grid_pyramid" -> gridPyramid,
    "grid_zonal_stats" -> gridZonalStats,
    "grid_convolve" -> gridConvolve,
    "grid_detrend" -> gridDetrend,
    "grid_argminmax" -> gridArgminmax,
    "grid_regrid_bin" -> gridRegridBin,
    "grid_interp2d" -> gridInterp2d,
    "grid_cumsum" -> gridCumsum,
    "grid_weighted_mean" -> gridWeightedMean,
    "grid_elementwise" -> gridElementwise,
    "grid_coarsen_2d" -> gridCoarsen2d,
    "grid_climatology" -> gridClimatology,
    "grid_fill_forward" -> gridFillForward,
    "grid_lag_diff" -> gridLagDiff,
    "grid_rolling_mean" -> gridRollingMean,
    "grid_interpolate" -> gridInterpolate,
    "grid_rechunk_dim" -> gridRechunkDim,
    "grid_resample" -> gridResample,
    "grid_table_to_grid" -> gridTableToGrid,
    "grid_chunk_iter" -> gridChunkIter,
    "grid_slice" -> gridSlice,
    "grid_grid_to_table" -> gridGridToTable,
    "grid_stats" -> gridStats)

  val oracles: Map[String, String] = Map(
    "grid_pyramid" -> gridPyramidSql,
    "grid_zonal_stats" -> gridZonalStatsSql,
    "grid_convolve" -> gridConvolveSql,
    "grid_detrend" -> gridDetrendSql,
    "grid_argminmax" -> gridArgminmaxSql,
    "grid_regrid_bin" -> gridRegridBinSql,
    "grid_interp2d" -> gridInterp2dSql,
    "grid_cumsum" -> gridCumsumSql,
    "grid_weighted_mean" -> gridWeightedMeanSql,
    "grid_elementwise" -> gridElementwiseSql,
    "grid_coarsen_2d" -> gridCoarsen2dSql,
    "grid_climatology" -> gridClimatologySql,
    "grid_fill_forward" -> gridFillForwardSql,
    "grid_lag_diff" -> gridLagDiffSql,
    "grid_rolling_mean" -> gridRollingMeanSql,
    "grid_interpolate" -> gridInterpolateSql,
    "grid_rechunk_dim" -> gridRechunkDimSql,
    "grid_resample" -> gridResampleSql,
    "grid_table_to_grid" -> gridTableToGridSql,
    "grid_chunk_iter" -> gridChunkIterSql,
    "grid_slice" -> gridSliceSql,
    "grid_grid_to_table" -> gridGridToTableSql,
    "grid_stats" -> gridStatsSql)
}
