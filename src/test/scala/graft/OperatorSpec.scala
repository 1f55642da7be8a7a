package graft

import graft.functions.TopK
import graft.operators.DedupClusters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case units for the custom aggregation/graph operators (the
  * oracle gate covers their happy paths). */
class OperatorSpec extends AnyFunSuite {
  import TestSession._

  test("TopK returns fewer than k when input is small, ordered correctly") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.9, 10L), (1L, 0.7, 11L), (2L, 0.5, 20L))
      .toDF("key", "score", "id")
    val out = df.groupBy("key")
      .agg(TopK.topk(5)(col("score"), col("id"), col("score")).as("top"))
      .select(col("key"), expr("transform(top, e -> e._2)").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(10L, 11L))
    assert(out(2L) == Seq(20L))
  }

  test("TopK ties break by ascending id") {
    import spark.implicits._
    val df = Seq((1L, 0.5, 7L), (1L, 0.5, 3L), (1L, 0.5, 9L)).toDF("key", "score", "id")
    val ids = df.groupBy("key")
      .agg(TopK.topk(2)(col("score"), col("id"), col("score")).as("top"))
      .select(expr("transform(top, e -> e._2)")).head().getSeq[Long](0)
    assert(ids == Seq(3L, 7L))
  }

  test("connectedComponents handles chains, isolated nodes, and cycles") {
    import spark.implicits._
    val nodes = (1L to 10L).toDF("id")
    // chain 1-2-3-4, cycle 5-6-7-5, isolated 8,9,10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (7L, 5L))
      .toDF("a", "b")
    val cc = DedupClusters.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(cc(_) == 1L))
    assert((5L to 7L).forall(cc(_) == 5L))
    assert((8L to 10L).forall(i => cc(i) == i))
  }

  test("connectedComponents contracts a 200-node chain in O(log n) rounds") {
    import spark.implicits._
    // a path graph is the worst case for min-label propagation
    // (O(diameter) = 199 rounds); the large-star/small-star contraction
    // must finish it within a log-ish bound
    val n = 200L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val cc = DedupClusters.connectedComponents(nodes, edges, maxRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to n).forall(cc(_) == 1L))
  }

  test("connectedComponentsLabeled rejects edge endpoints absent from the " +
      "node frame loudly instead of shrinking the output silently") {
    import spark.implicits._
    val nodes = Seq((1L, 1L), (2L, 2L)).toDF("id", "label")
    // endpoint 3 has no node row: the old left-join contract dropped it
    // from the output; the full-join + raise_error contract fails fast
    val edges = Seq((2L, 3L)).toDF("a", "b")
    val e = intercept[Exception] {
      DedupClusters.connectedComponentsLabeled(nodes, edges).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("edge endpoint absent")), e.toString)
    // and a complete node frame still resolves normally
    val ok = DedupClusters.connectedComponentsLabeled(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "label"),
      Seq((2L, 3L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok == Map(1L -> 10L, 2L -> 20L, 3L -> 20L))
  }

  test("dedup_ngram_topm bounds output to m rows per doc under heavy " +
      "duplication and agrees with the exhaustive key's top ranks") {
    import spark.implicits._
    val dir = "/tmp/graft_op_spec/topm"
    // 20 clones of one template (exhaustive pairs: 190; symmetrized
    // neighbor rows: 380 = 19 per doc) + 2 distinct docs that share a
    // 4-gram run with each other but not with the template
    val template = (1 to 12).map(i => s"tpl$i").mkString(" ")
    val docs =
      (1 to 20).map(i => (i.toLong, s"$template extra$i")) ++
        Seq((100L, "alpha beta gamma delta epsilon"),
          (101L, "alpha beta gamma delta zeta"))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = graft.operators.Dedup.dedupNgramTopm(spark, dir).cache()
    val perDoc = out.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every template clone has 19 true neighbors but emits exactly m=8
    (1 to 20).foreach(i => assert(perDoc(i.toLong) == 8L, s"doc $i"))
    // the two distinct docs emit exactly their one true neighbor
    assert(perDoc(100L) == 1L && perDoc(101L) == 1L)
    // ranks are 1..m with jaccard non-increasing, nbr_id tiebreak asc
    val rows = out.filter(col("doc_id") === 1L)
      .orderBy("rank").collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 8L))
    val jac = rows.map(_.getAs[Double]("jaccard"))
    assert(jac.zip(jac.tail).forall { case (a, b) => a >= b })
    // agreement with the exhaustive key: doc 1's best neighbor must be
    // the best partner among ALL its exhaustive pairs
    val ex = graft.operators.Dedup.dedupNgramJaccard(spark, dir)
      .filter(col("id_a") === 1L || col("id_b") === 1L)
      .select(when(col("id_a") === 1L, col("id_b")).otherwise(col("id_a")).as("nbr"),
        round(col("jaccard"), 9).as("j"))
      .collect().map(r => (r.getAs[Double]("j"), r.getAs[Long]("nbr")))
    val bestExhaustive = ex.minBy { case (j, id) => (-j, id) }
    assert((rows.head.getAs[Double]("jaccard"), rows.head.getAs[Long]("nbr_id"))
      == bestExhaustive)
    // scale shape: the rank comes from the bounded partial aggregator,
    // not a window — no Window node, partial aggregation present
    val plan = graft.operators.Dedup.dedupNgramTopm(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_topkaggregator") || plan.contains("partial_"), plan)
  }

  test("gopherRules anchors each rule bit on crafted documents") {
    import spark.implicits._
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      // passes everything: 50 alphabetic words incl. 2+ stop words
      (1L, s"the and $fifty have to of"),
      // too short (r_wordcount fails; others hold)
      (2L, "the and a few short words here"),
      // symbol-heavy: ### markers push symbol ratio over 0.1
      (3L, s"the and $fifty ${"# " * 12}"),
      // bullet-dominated lines (every line starts '- ')
      (4L, (1 to 10).map(i => s"- the and item $i $fifty").mkString("\n")),
      // numeric soup: alphabetic-word ratio under 80%
      (5L, s"the and ${(1 to 60).map(_.toString).mkString(" ")} $fifty"),
      // no stop words at all
      (6L, fifty)
    ).toDF("doc_id", "text")
    val r = graft.functions.TextOps.gopherRules(docs)
      .collect().map(x => x.getLong(0) -> x).toMap
    def bit(id: Long, name: String): Boolean =
      r(id).getBoolean(r(id).fieldIndex(name))
    assert(bit(1L, "keep_doc"))
    assert(!bit(2L, "r_wordcount") && bit(2L, "r_stopwords") && !bit(2L, "keep_doc"))
    assert(!bit(3L, "r_symbol") && bit(3L, "r_wordcount") && !bit(3L, "keep_doc"))
    assert(!bit(4L, "r_bullets") && !bit(4L, "keep_doc"))
    assert(!bit(5L, "r_alpha") && !bit(5L, "keep_doc"))
    assert(!bit(6L, "r_stopwords") && !bit(6L, "keep_doc"))
  }

  test("piiCounts anchors each pattern on crafted strings") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at jo.doe+x@example.org or admin@test.io thanks"),
      (2L, "server 10.0.0.1 and 192.168.1.254 up; call 555-123-4567"),
      (3L, "no pii here at all")
    ).toDF("doc_id", "text")
    val r = graft.functions.TextOps.piiCounts(docs, Seq("doc_id"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) == ((2L, 0L, 0L)), r(1L).toString) // two emails
    assert(r(2L) == ((0L, 2L, 1L)), r(2L).toString) // two IPs, one phone
    assert(r(3L) == ((0L, 0L, 0L)))
  }

  test("rechunkByDim lays out 2-D tiles dim-major with correct origins") {
    import spark.implicits._
    import graft.operators.GridOps
    // 4 records x 4 dims, value = rec*10 + pos; tiles of [2 x 2]
    val df = (0L until 4L).map(r => (r, (0 until 4).map(p => (r * 10 + p).toDouble).toArray))
      .toDF("rec", "arr")
    val tiles = GridOps.rechunkByDim(df, col("rec"), col("arr"), "t", 2, 2)
      .collect()
      .map(r => (r.getAs[Long]("rec_chunk"), r.getAs[Long]("dim_chunk")) ->
        ((r.getAs[Long]("rec_origin"), r.getAs[Long]("dim_origin")),
          r.getSeq[Double](r.fieldIndex("values"))))
      .toMap
    assert(tiles.size == 4)
    // tile (0,0): recs {0,1} x pos {0,1}, dim-major => (p0,r0),(p0,r1),(p1,r0),(p1,r1)
    assert(tiles((0L, 0L)) == ((0L, 0L), Seq(0.0, 10.0, 1.0, 11.0)))
    // tile (1,1): recs {2,3} x pos {2,3}
    assert(tiles((1L, 1L)) == ((2L, 2L), Seq(22.0, 32.0, 23.0, 33.0)))
  }

  test("rollingMean windows straddle chunk boundaries via the halo") {
    import spark.implicits._
    import graft.operators.GridOps
    // values 1..10 chunked at 4: [1,2,3,4] [5,6,7,8] [9,10]
    val grid = Seq(
      ("v", 0L, 0L, 4L, Seq(1.0, 2.0, 3.0, 4.0)),
      ("v", 1L, 4L, 4L, Seq(5.0, 6.0, 7.0, 8.0)),
      ("v", 2L, 8L, 2L, Seq(9.0, 10.0)))
      .toDF("variable", "chunk_idx", "origin", "shape", "values")
    val out = GridOps.rollingMean(grid, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 10)
    assert(out(0L) == 1.0 && out(1L) == 1.5) // partial windows at stream start
    assert(out(3L) == 3.0)                   // in-chunk full window
    assert(out(4L) == 4.0 && out(5L) == 5.0) // windows reach into previous chunk
    assert(out(8L) == 8.0 && out(9L) == 9.0) // short final chunk
  }

  test("lagDiff differences across chunk boundaries and omits idx 0") {
    import spark.implicits._
    import graft.operators.GridOps
    val grid = Seq(
      ("v", 0L, 0L, 4L, Seq(1.0, 3.0, 6.0, 10.0)),
      ("v", 1L, 4L, 2L, Seq(15.0, 21.0)))
      .toDF("variable", "chunk_idx", "origin", "shape", "values")
    val out = GridOps.lagDiff(grid)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 5 && !out.contains(0L))
    assert(out(1L) == 2.0 && out(3L) == 4.0)
    assert(out(4L) == 5.0) // straddles the chunk boundary via the halo
    assert(out(5L) == 6.0)
  }

  test("interpolate upsamples across chunk boundaries via the head halo") {
    import spark.implicits._
    import graft.operators.GridOps
    val grid = Seq(
      ("v", 0L, 0L, 4L, Seq(1.0, 2.0, 3.0, 4.0)),
      ("v", 1L, 4L, 2L, Seq(5.0, 6.0)))
      .toDF("variable", "chunk_idx", "origin", "shape", "values")
    val out = GridOps.interpolate(grid, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 6 source points -> targets j = 0..10 (2*(6-1))
    assert(out.size == 11)
    assert(out(0L) == 1.0 && out(1L) == 1.5)
    assert(out(7L) == 4.5)  // straddles the chunk-0/chunk-1 boundary
    assert(out(10L) == 6.0) // final source point, no out-of-range target
    assert(!out.contains(11L))
  }

  test("bloom filter has no false negatives over its build keys") {
    import spark.implicits._
    import graft.operators.BloomKeep
    val keys = (1L to 1000L).toDF("doc_id")
    val bloom = BloomKeep.buildBloom(keys, "doc_id", 1000L)
    assert(keys.filter(BloomKeep.mightContain(bloom, "doc_id")).count() == 1000L)
  }

  test("salted aggregation equals plain aggregation") {
    val plain = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(Tables.dsum(col("value")).as("total"), count(lit(1)).as("n"))
    val salted = graft.operators.Salted.q20SaltedAgg(spark, sf)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("native CDC boundary scan equals the SQL filter/sequence formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // mixed lengths incl. the 2-char minimum and a multibyte doc (the
    // non-ASCII fallback path must keep SQL substring CHAR semantics)
    val docs = Seq("ab", "the quick brown fox jumps over the lazy dog " * 40,
      "k\u00e9y v\u00e4lue str\u00f6m " * 30, "zz" * 500).toDF("text")
      .filter(length(col("text")) >= 2)
    val sqlB = docs.withColumn("bnds", expr(
      """concat(array(1),
        |  filter(sequence(2, greatest(length(text), 2)),
        |    p -> substring(md5(substring(text, p, 8)), 1, 1) = '0'),
        |  array(length(text) + 1))""".stripMargin))
      .select("bnds").collect().map(_.getSeq[Int](0))
    val natB = docs.withColumn("bnds",
        graft.functions.CdcExpressions.cdc_bounds(col("text")))
      .select("bnds").collect().map(_.getSeq[Int](0))
    assert(sqlB.length == natB.length)
    sqlB.zip(natB).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }
}
