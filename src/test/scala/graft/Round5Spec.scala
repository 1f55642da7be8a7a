package graft

import graft.operators.Dedup
import graft.sources.netcdf.{NcFormat, NcIO, NcSel}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-5 additions: per-variable .ncz codecs (v2 layout), the
  * banding-parameter sweep, and multi-target interpolating selection. */
class Round5Spec extends AnyFunSuite {
  import TestSession._

  private val SRC = "graft.sources.netcdf.NetCDF3Source"
  private def li = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))

  test("ncz v2 footer records per-variable rpb and codec, and honors store") {
    val dir = "/tmp/graft_nc_spec/nczv2_footer"
    NcIO.write(li.repartition(1).sortWithinPartitions("l_orderkey"), dir,
      compressChunks = true,
      varChunkBytes = Map("l_orderkey" -> (64 << 10), "l_quantity" -> 4096),
      varCodecs = Map("l_extendedprice" -> "store"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.endsWith(".ncz")).head
    val idx2 = NcFormat.readNczAny(fs, part) match {
      case Right(v2) => v2
      case Left(_) => fail("expected a v2 (per-variable) footer")
    }
    assert(idx2.vars.length == 3)
    val Array(key, qty, price) = idx2.vars
    // per-var block budgets: stride is 8 bytes for each double/long var
    assert(key.recordsPerBlock == (64 << 10) / 8)
    assert(qty.recordsPerBlock == 4096 / 8)
    // the "store" var never deflates: every block stored (negative len)
    assert(price.codec == 0)
    assert(price.blocks.forall(_._2 < 0))
    // the sorted key column deflates (codec byte 1, shrunken blocks)
    assert(key.codec == 1)
    assert(key.blocks.forall(_._2 > 0))
  }

  test("ncz v2 roundtrips every value under mixed codecs and block sizes") {
    val dir = "/tmp/graft_nc_spec/nczv2_roundtrip"
    NcIO.write(li.repartition(3), dir, compressChunks = true,
      varChunkBytes = Map("l_orderkey" -> (32 << 10), "l_quantity" -> 8192),
      varCodecs = Map("l_extendedprice" -> "store", "l_orderkey" -> "deflate"))
    val back = spark.read.format(SRC).load(dir)
    def sums(df: org.apache.spark.sql.DataFrame) = df.agg(
      sum("l_orderkey"),
      sum(col("l_quantity").cast("decimal(20,2)")),
      sum(col("l_extendedprice").cast("decimal(20,2)"))).head()
    assert(back.count() == li.count())
    assert(sums(li) == sums(back))
  }

  test("ncz v2 single-column projection reads only that variable's blocks") {
    val dir = "/tmp/graft_nc_spec/nczv2_prune"
    NcIO.write(li.repartition(1).sortWithinPartitions("l_orderkey"), dir,
      compressChunks = true,
      varChunkBytes = Map("l_quantity" -> 2048, "l_orderkey" -> (16 << 10)))
    // partial assembly: the wanted var's blocks slice into the record
    // buffer while other vars stay untouched (and unread)
    val got = spark.read.format(SRC).load(dir)
      .agg(sum(col("l_quantity").cast("decimal(20,2)"))).head().getDecimal(0)
    val want = li.agg(sum(col("l_quantity").cast("decimal(20,2)"))).head().getDecimal(0)
    assert(got == want)
  }

  test("ncz v2 record-range slice is exact across per-var block boundaries") {
    val dir = "/tmp/graft_nc_spec/nczv2_slice"
    NcIO.write(li.repartition(1).sortWithinPartitions("l_orderkey"), dir,
      chunkBytes = 4096, compressChunks = true,
      varChunkBytes = Map("l_orderkey" -> 2048, "l_extendedprice" -> (16 << 10)))
    val back = spark.read.format(SRC).option("chunkBytes", "4096").load(dir)
    val sliced = back.filter(col("record") >= 100L && col("record") < 2100L)
    assert(sliced.count() == 2000)
    assert(sliced.agg(min("record"), max("record")).head() ==
      org.apache.spark.sql.Row(100L, 2099L))
    val expect = li.repartition(1).sortWithinPartitions("l_orderkey")
      .limit(2100).orderBy(desc("l_orderkey")).limit(2000)
      .agg(sum("l_orderkey")).head()
    assert(sliced.agg(sum("l_orderkey")).head() == expect)
  }

  test("dedup_eval_sweep: recall and candidates are monotone in band count") {
    val rows = Dedup.dedupEvalSweep(spark, sf).orderBy("n_bands").collect()
    assert(rows.length == 8)
    val nCand = rows.map(_.getAs[Long]("n_cand"))
    val recall = rows.map(_.getAs[Double]("lsh_recall"))
    assert(nCand.zip(nCand.tail).forall { case (a, b) => a <= b },
      s"candidates not monotone: ${nCand.mkString(",")}")
    assert(recall.zip(recall.tail).forall { case (a, b) => a <= b },
      s"recall not monotone: ${recall.mkString(",")}")
    // n_true is the sweep-independent ground truth: constant across rows
    assert(rows.map(_.getAs[Long]("n_true")).distinct.length == 1)
  }

  test("dedup_eval_sweep row k=4 reproduces dedup_eval (H=8, 4 bands)") {
    val sweep4 = Dedup.dedupEvalSweep(spark, sf)
      .filter(col("n_bands") === 4L)
      .select("n_cand", "n_true", "n_hits").head()
    val eval = Dedup.dedupEval(spark, sf)
      .select("n_cand", "n_true", "n_hits").head()
    assert(sweep4 == eval)
  }

  test("text_segment_dedup_bloom: map-side bloom prefilter, identical output") {
    val bloom = graft.operators.Boilerplate.textSegmentDedupBloom(spark, sf)
    // the sketch changes the plan, never the answer
    val plain = graft.operators.Boilerplate.textSegmentDedup(spark, sf)
    assert(bloom.orderBy("doc_id").collect().toSeq ==
      plain.orderBy("doc_id").collect().toSeq)
    // and the plan really carries the bloom membership test
    val physical = bloom.queryExecution.executedPlan.toString
    assert(physical.contains("might_contain"),
      "expected a BloomFilterMightContain prefilter in the physical plan")
  }

  test("q34_bucketed_join: bucketed SMJ has no exchange, matches plain join") {
    val joined = graft.operators.ScaleJoins.bucketedJoin(spark, sf)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), "expected a sort-merge join")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n${plan.take(2000)}")
    // layout changes the plan, never the answer
    val plain = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
    val bucketed = graft.operators.ScaleJoins.q34BucketedJoin(spark, sf)
      .select(col("o_orderpriority"), col("n_items").as("count"))
    assert(bucketed.orderBy("o_orderpriority").collect().toSeq ==
      plain.orderBy("o_orderpriority").collect().toSeq)
  }

  test("q35_skew_join_salted: no broadcast join, equals unsalted plan") {
    val salted = graft.operators.ScaleJoins.q35SkewJoinSalted(spark, sf)
    val plan = salted.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      "the salted demo must take the shuffled-join path")
    // unsalted twin computed directly
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast("decimal(9,2)").as("v"))
    val st = ev.groupBy("event_type")
      .agg(sum("v").as("tot"), count(lit(1)).as("n"))
    val plain = ev.join(st, Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("v") * col("n") > col("tot"), 1L).otherwise(0L)).as("n_above"))
    assert(salted.orderBy("event_type").collect().toSeq ==
      plain.orderBy("event_type").collect().toSeq)
  }

  test("pipeline_shard_manifest: covers every doc exactly once") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val m = graft.operators.ShardManifest.pipelineShardManifest(spark, sf).cache()
    val agg = m.agg(sum("n_docs").as("d"), min("min_doc_id"), max("max_doc_id")).head()
    assert(agg.getAs[Long]("d") == docs.count(), "every doc in exactly one shard")
    // digest is deterministic: recompute equals stored
    val again = graft.operators.ShardManifest.pipelineShardManifest(spark, sf)
    assert(m.orderBy("shard").collect().toSeq == again.orderBy("shard").collect().toSeq)
  }

  test("q36_cube: one Expand pass, 4 grouping combinations consistent") {
    val out = graft.queries.Relational.q36Cube(spark, sf).cache()
    assert(out.queryExecution.executedPlan.toString.contains("Expand"),
      "CUBE should plan a single Expand + aggregate, not a union of scans")
    val gids = out.select("gid").distinct().collect().map(_.getLong(0)).toSet
    assert(gids == Set(0L, 1L, 2L, 3L))
    // grand total row equals the sum over the finest grouping
    val fine = out.filter(col("gid") === 0L)
      .agg(sum("n")).head().getLong(0)
    val total = out.filter(col("gid") === 3L).head().getAs[Long]("n")
    assert(fine == total)
  }

  test("winnowing: shared run of W+K-1 words guarantees a shared fingerprint") {
    import spark.implicits._
    // two docs sharing exactly a 6-word run (W+K-1 = 4+3-1 = 6) inside
    // otherwise-disjoint text must select >= 1 common window-min hash
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight nine ten $shared eleven twelve")).toDF("doc_id", "text")
    val dir = "/tmp/graft_winnow_spec"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fps = graft.operators.Winnowing.textWinnowFingerprint(spark, dir)
    // recompute the raw fingerprint SETS (the op emits a digest) via
    // the same expressions, then intersect
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("hs", expr(
        "transform(sequence(1, size(ws) - 2), i -> md5(concat_ws(' ', slice(ws, i, 3))))"))
      .withColumn("fps", expr(
        "array_distinct(transform(sequence(1, greatest(size(hs) - 3, 1)), i -> array_min(slice(hs, i, 4))))"))
      .select("doc_id", "fps").collect()
    val Seq(a, b) = raw.toSeq.sortBy(_.getLong(0))
      .map(_.getAs[scala.collection.Seq[String]]("fps").toSet)
    assert((a & b).nonEmpty, "winnowing coverage guarantee violated")
    // and the gated op's digest is consistent with the raw set size
    val n = fps.filter(col("doc_id") === 1L).head().getAs[Long]("n_fps")
    assert(n == a.size)
  }

  test("dedup_winnow_pairs: long shared run yields a pair, ids ordered") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight nine $shared ten eleven twelve"),
      (3L, "totally different content with no overlap at all here")).toDF("doc_id", "text")
    val dir = "/tmp/graft_winnow_pairs_spec"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = graft.operators.Winnowing.dedupWinnowPairs(spark, dir).collect()
    assert(pairs.length == 1, s"expected exactly the (1,2) pair, got ${pairs.toSeq}")
    val p = pairs.head
    assert(p.getAs[Long]("id_a") == 1L && p.getAs[Long]("id_b") == 2L)
    assert(p.getAs[Long]("n_shared") >= 2, "12 shared words select >= 2 window-mins")
  }

  test("pipeline_dataset_card: totals reconcile with the corpus") {
    val card = graft.operators.DatasetCard.pipelineDatasetCard(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val t = card.agg(sum("n_docs").as("d"), sum("n_tokens").as("tok")).head()
    assert(t.getAs[Long]("d") == docs.count())
    val tokTotal = docs.selectExpr("CAST(sum(size(split(text, ' '))) AS BIGINT) t")
      .head().getAs[Long]("t")
    assert(t.getAs[Long]("tok") == tokTotal)
    // mean quality derivable and in [0, 1]
    val q = card.selectExpr("quality_micro_sum / (n_docs * 1e6) AS mq").collect()
    assert(q.forall(r => { val v = r.getAs[Double]("mq"); v >= 0.0 && v <= 1.0 }))
  }

  test("sim_recall_sweep: recall monotone in nprobe, exhaustive probe = 1.0") {
    val sweep = graft.operators.Similarity.simRecallSweep(spark, sf)
      .orderBy("nprobe").collect()
    assert(sweep.length == 16, "one row per nprobe 1..NCENTS")
    val recalls = sweep.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be nondecreasing in nprobe: ${recalls.toSeq}")
    assert(recalls.last == 1.0,
      "probing every cell is exhaustive search - recall must be exactly 1.0")
  }

  test("sketch_kmv_intersect: estimate tracks the exact overlap") {
    val r = graft.functions.Sketches.sketchKmvIntersect(spark, sf).head()
    val j = r.getAs[Double]("jaccard_est")
    assert(j >= 0.0 && j <= 1.0)
    val est = r.getAs[Double]("est_intersect")
    val exact = r.getAs[Long]("exact_intersect")
    assert(exact > 0, "synthetic events must have click∩view users")
    // k=256 minima over a small domain: the estimate must be in the
    // right ballpark (KMV relative error ~1/sqrt(k) ≈ 6%; allow 3x)
    assert(est > exact / 3.0 && est < exact * 3.0,
      s"est_intersect=$est vs exact=$exact")
  }

  test("interpAll matches per-target interp on every bracket shape") {
    val dir = "/tmp/graft_nc_spec/interp_all"
    NcIO.write(
      li.select(col("l_orderkey"), col("l_quantity"))
        .repartitionByRange(4, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey"),
      dir)
    val targets = Seq(-3.0, 7.0, 1500.5, 5.0e8)
    val batch = NcSel.interpAll(spark, dir, "l_orderkey", "l_quantity", targets)
      .orderBy("target").collect()
    val single = targets
      .map(t => NcSel.interp(spark, dir, "l_orderkey", "l_quantity", t).head())
    assert(batch.toSeq == single)
  }
}
