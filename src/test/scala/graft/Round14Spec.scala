package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 laws: the unicode tokenizer's exact fixture behavior, the
  * widened-before-multiply moment sums on overflow-range lengths,
  * stream checkpoint kill/resume exactly-once on the parquet file
  * sink, and the staged-build failure/retry latch chain — each pinned
  * independently of the DuckDB oracle gate. */
class Round14Spec extends AnyFunSuite {
  import TestSession._

  // ---- unicode tokenizer (r13 verdict punch #4) ----------------------

  test("unicode tokenizer: fixture docs tokenize exactly as specified") {
    import spark.implicits._
    val got = graft.functions.Tokenize.FIXTURE.toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.Tokenize.tokens(col("text")).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // tabs + ASCII punctuation split; case folds
    assert(got(-1L) == Seq("tab", "separated", "tokens", "and", "punctuation",
      "marks", "plus", "parens", "brackets", "braces"), got(-1L))
    // \n, \r\n, vertical tab, form feed, hyphen all separate
    assert(got(-2L) == Seq("line", "breaks", "and", "vertical", "tabs",
      "end", "of", "line", "hyphen", "split"), got(-2L))
    // Han ideographs one token each; ideographic full stop separates;
    // Latin runs stay words
    assert(got(-3L) == Seq("中", "文", "文", "本", "没", "有", "空", "格",
      "english", "words", "mixed", "中", "文", "tokens"), got(-3L))
    // hiragana / katakana / hangul one token each
    assert(got(-4L) == Seq("ひ", "ら", "が", "な", "と", "カ", "タ", "カ", "ナ",
      "가", "나", "다", "mixed", "scripts"), got(-4L))
  }

  test("text_tokens_unicode accounts the fixture rows exactly") {
    val got = SparkEntry.queries("text_tokens_unicode")(spark, sf)
      .filter(col("doc_id") < 0)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(-1L) == ((10L, 10L, 0L)), got(-1L))
    assert(got(-2L) == ((10L, 9L, 0L)), got(-2L)) // "line" repeats
    assert(got(-3L) == ((14L, 11L, 10L)), got(-3L))
    assert(got(-4L) == ((14L, 13L, 12L)), got(-4L))
  }

  test("unicode keys equal their space twins on the space-only corpus rows") {
    // on single-space ASCII text the unicode tokenizer must reduce to
    // the house split — same tf table, so same tfidf rows for corpus
    // docs whose idf context is unchanged... idf DOES change (4 extra
    // docs), so compare the cheap invariant instead: token counts.
    val uni = SparkEntry.queries("text_tokens_unicode")(spark, sf)
      .filter(col("doc_id") >= 0).select("doc_id", "n_tok")
    val house = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        expr("CAST(size(filter(split(lower(text), ' '), w -> w != '')) AS BIGINT)")
          .as("n_tok"))
    assert(uni.exceptAll(house).isEmpty && house.exceptAll(uni).isEmpty)
  }

  // ---- moment sums: widen BEFORE multiplying (r13 ADVICE) ------------

  test("sketch_moments is exact at overflow-range document lengths") {
    import spark.implicits._
    // n_chars up to 3M: x^3 = 2.7e19 wraps a BIGINT (max 9.2e18), x^4
    // far past — the r13 shape computed powers in 64-bit first and
    // would silently wrap here (DuckDB raised instead: divergence)
    val lens = Seq(2_500_000L, 3_000_000L, 55_200L, 120L, 7L)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_r14_moments"
    lens.zipWithIndex.map { case (n, i) => (i.toLong, "x", "en", "srcY", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = SparkEntry.queries("sketch_moments")(spark, dir).collect().head
    // exact replay: BigInt power sums, the identical finishing doubles
    val n = BigInt(lens.length)
    def S(p: Int) = lens.map(x => BigInt(x).pow(p)).sum
    val (nd, s1, s2, s3, s4) =
      (n.toDouble, S(1).toDouble, S(2).toDouble, S(3).toDouble, S(4).toDouble)
    val mean = s1 / nd
    val vari = s2 / nd - (s1 / nd) * (s1 / nd)
    val skew = (s3 / nd - 3 * (s1 / nd) * (s2 / nd) +
      2 * (s1 / nd) * (s1 / nd) * (s1 / nd)) / (vari * math.sqrt(vari))
    val kurt = (s4 / nd - 4 * (s1 / nd) * (s3 / nd) +
      6 * (s1 / nd) * (s1 / nd) * (s2 / nd) -
      3 * (s1 / nd) * (s1 / nd) * (s1 / nd) * (s1 / nd)) / (vari * vari) - 3
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Long]("n_docs") == lens.length.toLong)
    assert(row.getAs[Double]("mean_len") == r6(mean), s"mean ${row.getAs[Double]("mean_len")} != ${r6(mean)}")
    assert(row.getAs[Double]("var_len") == r6(vari))
    assert(row.getAs[Double]("skew") == r6(skew))
    assert(row.getAs[Double]("kurt_excess") == r6(kurt))
  }

  // ---- stream checkpoint recovery (r13 verdict punch #5) -------------

  test("stream kill mid-drain + restart from checkpoint is exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_r14_recovery"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val stage = s"$root/stage"
    val sink = s"$root/sink"
    val ckpt = s"$root/ckpt"
    // stage the corpus as 16 files → 16 one-file micro-batches
    graft.Tables.t(spark, sf, "documents").repartition(16)
      .write.parquet(stage)
    val sch = spark.read.parquet(stage).schema
    def start() = graft.operators.Chunker.chunks(
        spark.readStream.schema(sch).option("maxFilesPerTrigger", "1").parquet(stage))
      .writeStream.outputMode("append").format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    // phase 1: kill the drain after ~2 committed batches, well short
    // of the 16 the full drain needs
    val q1 = start()
    var spins = 0
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 && spins < 600) {
      Thread.sleep(100); spins += 1
    }
    q1.stop()
    val want = graft.operators.Chunker.chunks(spark.read.parquet(stage))
    val partial = spark.read.parquet(sink).count()
    assert(partial > 0, "kill landed before any batch committed — nothing to resume")
    assert(partial < want.count(),
      "drain completed before the kill — mid-stream condition not met")
    // phase 2: restart from the SAME checkpoint into the SAME sink
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // exactly-once: the recovered sink equals the batch twin as a
    // multiset — no lost batches, no replayed duplicates (the parquet
    // FileStreamSink's _spark_metadata commit log is the mechanism)
    val got = spark.read.parquet(sink)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty, "rows in recovered sink not in batch twin")
    assert(want.exceptAll(got).isEmpty, "batch-twin rows missing from recovered sink")
    val dups = got.groupBy("doc_id", "chunk_id").count().filter(col("count") > 1).count()
    assert(dups == 0, s"$dups duplicated (doc_id, chunk_id) chunks after resume")
  }

  test("stateful stream (sessionize) kill/resume equals an uninterrupted drain") {
    // the STATE-STORE recovery law, complementing the stateless file-
    // sink test above: a flatMapGroupsWithState drain killed mid-
    // stream and resumed from its checkpoint must emit exactly the
    // sessions an uninterrupted drain emits (state restored, no epoch
    // double-emitted, no session lost)
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_r14_staterec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"), col("ts"))
    // 8 time-ordered slices (event_id is assigned in ts order in the
    // testdata) → 8 one-file micro-batches, watermark advancing per batch
    val bounds = ev.stat.approxQuantile("event_id",
      (1 until 8).map(_.toDouble / 8).toArray, 0.0)
    val sb = (Array(Double.NegativeInfinity) ++ bounds) :+ Double.PositiveInfinity
    (0 until 8).foreach { i =>
      ev.filter(col("event_id") >= sb(i) && col("event_id") < sb(i + 1))
        .coalesce(1).write.mode("append").parquet(s"$root/stage")
    }
    val sch = spark.read.parquet(s"$root/stage").schema
    def drain(name: String, kill: Boolean): Unit = {
      def start() = graft.streaming.Streams.sessionize(
          spark.readStream.schema(sch).option("maxFilesPerTrigger", "1")
            .parquet(s"$root/stage").as[graft.streaming.Streams.Ev])
        .toDF()
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$root/sink_$name")
        .option("checkpointLocation", s"$root/ck_$name")
        .trigger(Trigger.AvailableNow()).start()
      val q = start()
      if (kill) {
        var spins = 0
        while (q.recentProgress.count(_.numInputRows > 0) < 2 && spins < 600) {
          Thread.sleep(100); spins += 1
        }
        q.stop() // mid-drain kill: state store holds open sessions
        val q2 = start()
        q2.processAllAvailable(); q2.stop()
      } else { q.processAllAvailable(); q.stop() }
    }
    drain("a", kill = false)
    drain("b", kill = true)
    val a = spark.read.parquet(s"$root/sink_a")
    val b = spark.read.parquet(s"$root/sink_b")
    assert(a.count() > 0, "uninterrupted drain emitted no closed sessions")
    assert(b.count() == a.count(),
      s"resumed drain emitted ${b.count()} sessions vs ${a.count()} uninterrupted")
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty,
      "resumed session set differs from the uninterrupted drain")
  }

  // ---- staged-build failure/retry latch chain (r13 ADVICE) -----------

  test("staged builds: waiters survive a failed build and in-flight retry") {
    import spark.implicits._
    import java.util.concurrent.{Callable, Executors, TimeUnit}
    val tag = s"r14race_${System.nanoTime()}"
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def attempt(): Either[String, Long] =
      try Right(graft.operators.Staged.table(spark, sf, tag) {
        if (failOnce.compareAndSet(true, false)) {
          Thread.sleep(50) // let waiters pile onto this latch
          throw new RuntimeException("boom")
        }
        Thread.sleep(100) // slow retry build: waiters must chain to it
        Seq(42L).toDF("v")
      }.count())
      catch { case e: Throwable => Left(e.getMessage) }
    val pool = Executors.newFixedThreadPool(6)
    try {
      val futs = (1 to 6).map(_ => pool.submit(new Callable[Either[String, Long]] {
        override def call(): Either[String, Long] = attempt()
      }))
      val results = futs.map(_.get(120, TimeUnit.SECONDS))
      val (failed, ok) = results.partition(_.isLeft)
      // exactly the one CAS-winning builder observes the failure;
      // every other caller must land on a COMPLETED artifact — never
      // return early on a half-built one (the r13 containsKey race)
      assert(failed == Seq(Left("boom")), s"unexpected failures: $failed")
      assert(ok.size == 5 && ok.forall(_ == Right(1L)), s"bad reads: $ok")
    } finally pool.shutdownNow()
  }
}
