package graft

import graft.sources.netcdf.Hdf5Format
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 operators: class-7 OBJECT REFERENCE attributes (read +
  * write + name resolution), the held-out LM curation filter and its
  * streaming twin, and tokenizer decode. */
class Round11Spec extends AnyFunSuite {
  import TestSession._

  private def fs = new Path("/tmp").getFileSystem(new Configuration())

  private def writeFile(name: String, bytes: Array[Byte]): Path = {
    val p = new Path(s"/tmp/graft_h5/$name")
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
    p
  }

  // -----------------------------------------------------------------
  // class-7 reference attributes
  // -----------------------------------------------------------------

  test("hand-assembled class-7 attribute parses to raw addresses (isRef)") {
    // v3 attribute framing (unpadded): header, name "refs\0",
    // class-7 v1 datatype (8-byte elements), v2 rank-1 dataspace [2],
    // payload = two LE header addresses
    val bb = java.nio.ByteBuffer.allocate(9 + 5 + 8 + 12 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(3.toByte).put(0.toByte).putShort(5).putShort(8).putShort(12)
      .put(0.toByte)
      .put("refs".getBytes("ASCII")).put(0.toByte)
      .put(0x17.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(8)
      .put(2.toByte).put(1.toByte).put(0.toByte).put(1.toByte).putLong(2L)
      .putLong(0x1234L).putLong(0x99L)
    val a = Hdf5Format.readAttrForTest(bb.array()).get
    assert(a.name == "refs" && a.isRef, a.toString)
    assert(a.nums.toSeq == Seq(0x1234L.toDouble, 0x99L.toDouble), a.nums.toSeq)
  }

  test("refattr writer roundtrip: addresses resolve to dataset names in order") {
    val w = new Hdf5Format.Hdf5Writer(
      StructType(Seq(StructField("a", LongType), StructField("b", DoubleType))),
      chunkRecs = 8, deflate = false, h5ver = 2,
      refAttrs = Map("b" -> ("coordinates", Seq("b", "a"))))
    (0 until 4).foreach(i => w.writeRow(c => if (c == 0) i.toLong else i * 0.5))
    val p = writeFile("refattr_rt.nc4", w.finish())
    val meta = Hdf5Format.readMeta(fs, p)
    val vb = meta.vars.find(_.name == "b").get
    val attr = vb.attrs.find(_.name == "coordinates").get
    // order preserved exactly — a one-byte address error resolves to
    // "?" or the wrong dataset and breaks this
    assert(attr.text.contains("b,a"), attr.toString)
    assert(!attr.isRef && attr.nums.isEmpty, attr.toString) // resolved, not raw
    assert(meta.vars.find(_.name == "a").get.attrs.forall(_.name != "coordinates"))
  }

  test("refattr rejects v0-generation files and unknown targets loudly") {
    val sch = StructType(Seq(StructField("a", LongType)))
    val e0 = intercept[IllegalArgumentException] {
      new Hdf5Format.Hdf5Writer(sch, chunkRecs = 8, h5ver = 0,
        refAttrs = Map("a" -> ("r", Seq("a"))))
    }
    assert(e0.getMessage.contains("h5ver=2"), e0.getMessage)
    val e1 = intercept[IllegalArgumentException] {
      new Hdf5Format.Hdf5Writer(sch, chunkRecs = 8, h5ver = 2,
        refAttrs = Map("a" -> ("r", Seq("missing"))))
    }
    assert(e1.getMessage.contains("missing"), e1.getMessage)
  }

  // -----------------------------------------------------------------
  // user blocks
  // -----------------------------------------------------------------

  test("user-block jam: v2 and v0 files read identically through the shift") {
    def build(h5ver: Int): Array[Byte] = {
      val w = new Hdf5Format.Hdf5Writer(
        StructType(Seq(StructField("a", LongType), StructField("b", DoubleType))),
        chunkRecs = 8, deflate = true, h5ver = h5ver, shuffle = true)
      (0 until 20).foreach(i => w.writeRow(c => if (c == 0) i.toLong else i * 1.5))
      w.finish()
    }
    for ((ver, ub) <- Seq(2 -> 512, 0 -> 1024, 2 -> 4096)) {
      val base = build(ver)
      val p0 = writeFile(s"ublock_base_$ver$ub.nc4", base)
      val pj = writeFile(s"ublock_jam_$ver$ub.nc4", Hdf5Format.jamUserBlock(base, ub))
      val m0 = Hdf5Format.readMeta(fs, p0)
      val mj = Hdf5Format.readMeta(fs, pj)
      assert(mj.vars.map(_.name) == m0.vars.map(_.name), s"v$ver ub$ub")
      assert(mj.numRecs == 20 && m0.numRecs == 20, s"v$ver ub$ub: ${mj.numRecs}")
      assert(mj.vars.map(_.chunks.length) == m0.vars.map(_.chunks.length))
    }
  }

  test("user-block probe rejects garbage and bad block sizes loudly") {
    val garbage = writeFile("ublock_garbage.nc4", Array.fill[Byte](2048)(0x5a))
    val e = intercept[java.io.IOException] { Hdf5Format.readMeta(fs, garbage) }
    assert(e.getMessage.contains("not an HDF5 file"), e.getMessage)
    intercept[IllegalArgumentException] {
      Hdf5Format.jamUserBlock(new Array[Byte](100), 100)
    }
    intercept[IllegalArgumentException] {
      Hdf5Format.jamUserBlock(new Array[Byte](100), 768)
    }
  }

  // -----------------------------------------------------------------
  // held-out LM filter
  // -----------------------------------------------------------------

  test("pipeline_perplexity_filter ledger is complete and consistent at sf0.001") {
    val rows = graft.operators.NgramLm.pipelinePerplexityFilter(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped_lowppl") +
        r.getAs[Long]("n_short") == r.getAs[Long]("n_docs"), r.toString)
      // summed per-doc keep rule: every kept doc satisfies
      // sum_q >= T * n_bigrams, so the sums do too
      assert(r.getAs[Long]("sum_q_kept") >= 30000L * r.getAs[Long]("n_bigrams_kept"),
        r.toString)
    }
    // the filter must SPLIT — all-kept or all-dropped means the
    // threshold is not in the data's range and the gate is vacuous
    assert(rows.map(_.getAs[Long]("n_kept")).sum > 0, "nothing kept")
    assert(rows.map(_.getAs[Long]("n_dropped_lowppl")).sum > 0, "nothing dropped")
  }

  test("stream_perplexity_filter equals the batch twin row-for-row") {
    def key(r: org.apache.spark.sql.Row) =
      (0 until r.length).map(r.get).mkString("|")
    val batch = graft.operators.NgramLm.pipelinePerplexityFilter(spark, sf)
      .collect().map(key).sorted
    val stream = graft.operators.NgramLm.streamPerplexityFilter(spark, sf)
      .collect().map(key).sorted
    assert(batch.sameElements(stream), s"${batch.toSeq} vs ${stream.toSeq}")
  }

  // -----------------------------------------------------------------
  // exact-substring span dedup
  // -----------------------------------------------------------------

  test("dedup_substring_spans: complete per-doc coverage with sane span bounds") {
    val out = graft.operators.Dedup.dedupSubstringSpans(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.length == nDocs) // one row per doc, span-free docs included
    out.foreach { r =>
      val (nw, ns, dw, ppm) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("dup_words"), r.getAs[Long]("dup_ppm"))
      assert(dw <= nw, r.toString) // spans never exceed the doc
      // every span covers at least one full window
      assert(ns == 0 || dw >= 8L * 1, r.toString)
      assert(ppm == (1000000L * dw) / math.max(nw, 1L), r.toString)
    }
    // the corpus genuinely contains repeated 8-grams — a vacuous
    // all-zero result means the window/hash path broke
    assert(out.exists(_.getAs[Long]("n_spans") > 0), "no duplicated spans found")
  }

  test("pipeline_span_removal: keep-first removes strictly less than total dup mass") {
    val rem = graft.operators.Dedup.pipelineSpanRemoval(spark, sf).collect()
    val spans = graft.operators.Dedup.dedupSubstringSpans(spark, sf)
      .agg(sum(col("dup_words"))).head().getLong(0)
    val removed = rem.map(_.getAs[Long]("removed_words")).sum
    // keep-first retains one occurrence per duplicated window, so the
    // removed mass is positive but strictly below the full dup mass
    assert(removed > 0 && removed < spans, s"removed=$removed dup=$spans")
    rem.foreach { r =>
      assert(r.getAs[Long]("n_docs_touched") <= r.getAs[Long]("n_docs"), r.toString)
      assert(r.getAs[Long]("removed_words") <= r.getAs[Long]("total_words"), r.toString)
    }
  }

  // -----------------------------------------------------------------
  // ustar codec
  // -----------------------------------------------------------------

  /** Spec-literal ustar header assembled from the POSIX.1-1988 field
    * table — NOT via TarCodec.pack, so a matched writer/parser bug
    * cannot self-cancel. */
  private def ustarFixture(name: String, payload: Array[Byte]): Array[Byte] = {
    val hdr = new Array[Byte](512)
    name.getBytes("ASCII").copyToArray(hdr)
    def oct(off: Int, width: Int, v: Long): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (width - 1 - s.length)) + s
      padded.getBytes("ASCII").copyToArray(hdr, off)
    }
    oct(100, 8, 0x1a4); oct(108, 8, 0); oct(116, 8, 0)
    oct(124, 12, payload.length.toLong); oct(136, 12, 0)
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    hdr(156) = '0'
    "ustar".getBytes("ASCII").copyToArray(hdr, 257)
    hdr(263) = '0'; hdr(264) = '0'
    val sum = hdr.map(_ & 0xff).sum
    oct(148, 7, sum.toLong)
    hdr(154) = 0 // 6 octal digits, NUL, space — the historical framing
    hdr(155) = ' '
    val padN = ((payload.length + 511) / 512) * 512 - payload.length
    hdr ++ payload ++ new Array[Byte](padN) ++ new Array[Byte](1024)
  }

  test("hand-assembled ustar fixture parses; production pack emits identical bytes") {
    val payload = "hello tar".getBytes("ASCII")
    val fixture = ustarFixture("0000000007.txt", payload)
    val ms = graft.functions.TarCodec.members(fixture)
    assert(ms.numElements() == 1)
    val m = ms.getStruct(0, 3)
    assert(m.getUTF8String(0).toString == "0000000007.txt")
    assert(m.getLong(1) == 512L && m.getLong(2) == payload.length.toLong)
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(fixture, 512, 512 + payload.length), payload))
    // the production writer must render BYTE-IDENTICAL output for the
    // same entry — pinned against the spec-literal assembly above
    val entries = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](
      org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString("0000000007.txt"), payload)))
    assert(java.util.Arrays.equals(graft.functions.TarCodec.pack(entries), fixture))
  }

  test("tar parser rejects corrupt headers loudly") {
    val fixture = ustarFixture("a.txt", "payload!".getBytes("ASCII"))
    val badSum = fixture.clone()
    badSum(124) = '7' // size field byte → checksum no longer matches
    val e1 = intercept[java.io.IOException] { graft.functions.TarCodec.members(badSum) }
    assert(e1.getMessage.contains("checksum mismatch"), e1.getMessage)
    val badMagic = fixture.clone()
    badMagic(257) = 'X'
    val e2 = intercept[java.io.IOException] { graft.functions.TarCodec.members(badMagic) }
    assert(e2.getMessage.contains("bad ustar magic"), e2.getMessage)
    val truncated = java.util.Arrays.copyOfRange(fixture, 0, 600)
    val e3 = intercept[java.io.IOException] { graft.functions.TarCodec.members(truncated) }
    assert(e3.getMessage.contains("truncated") || e3.getMessage.contains("overruns"),
      e3.getMessage)
  }

  // -----------------------------------------------------------------
  // matryoshka retrieval
  // -----------------------------------------------------------------

  test("sim_matryoshka_topk: full-width rerank over a bounded candidate set") {
    // NOTE: the synthetic embeddings are NOT MRL-trained, so the
    // 16-dim prefix is a weak proxy here and recall vs the exact
    // top-5 is data-noise — the DuckDB oracle replays coarse+rerank
    // exactly, and this spec pins the structural contract instead.
    val matRows = graft.operators.Similarity.simMatryoshkaTopk(spark, sf).collect()
    val exactRows = graft.operators.Similarity.simTopKBruteforce(spark, sf).collect()
    assert(matRows.length == exactRows.length) // 10 queries x top-5 each
    def byQ(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getAs[Long]("query_id")).map { case (q, rs) =>
        q -> rs.sortBy(_.getAs[Long]("rank"))
          .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim")))
      }
    val mat = byQ(matRows)
    val exact = byQ(exactRows)
    mat.foreach { case (q, nbrs) =>
      // ranks ordered by full-width cosine, and the reranked winner
      // can never beat the UNRESTRICTED exact winner (subset bound)
      assert(nbrs.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)), s"q$q")
      assert(nbrs.head._2 <= exact(q).head._2 + 1e-9, s"q$q")
      // where the same (query, neighbor) appears in both, the scores
      // MATCH exactly — the rerank is full-width, not a prefix proxy
      val exactScores = exact(q).toMap
      nbrs.foreach { case (id, c) =>
        exactScores.get(id).foreach(e => assert(e == c, s"q$q nbr$id: $c vs $e"))
      }
    }
  }

  test("sim_bq_hamming: integer coarse stage, full-width rerank invariants") {
    val rows = graft.operators.Similarity.simBqHamming(spark, sf).collect()
    val exact = graft.operators.Similarity.simTopKBruteforce(spark, sf).collect()
    assert(rows.length == exact.length) // 10 queries x top-5
    val exactTop = exact.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(r =>
        r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cos_sim")).toMap }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(ordered.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)), s"q$q")
      rs.foreach { r => // shared neighbors score identically (full-width rerank)
        exactTop(q).get(r.getAs[Long]("neighbor_id"))
          .foreach(e => assert(e == r.getAs[Double]("cos_sim"), s"q$q"))
      }
    }
  }

  test("dedup_minhash_topm: per-doc bound holds and lists are LSH-candidate subsets") {
    val topm = graft.operators.Dedup.dedupMinhashTopm(spark, sf).collect()
    val byDoc = topm.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (d, rs) =>
      assert(rs.length <= 8, s"doc $d has ${rs.length} neighbors")
      val ordered = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("jaccard"))
      assert(ordered.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)), s"doc $d")
    }
    // every (doc, nbr) edge must come from a verified LSH candidate pair
    val lsh = graft.operators.Dedup.dedupMinhashLsh(spark, sf).collect()
      .flatMap(r => Seq(
        (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        (r.getAs[Long]("id_b"), r.getAs[Long]("id_a")))).toSet
    topm.foreach { r =>
      assert(lsh.contains((r.getAs[Long]("doc_id"), r.getAs[Long]("nbr_id"))), r.toString)
    }
  }

  // -----------------------------------------------------------------
  // DSIR importance resampling
  // -----------------------------------------------------------------

  /** Plain-Scala DSIR reference: tokenize, hash, smooth, quantize and
    * score entirely in local collections — an anchor independent of
    * every Spark/DuckDB code path the operator uses. */
  private def dsirReference(): Seq[(Long, String, Long, Long)] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(feat: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(feat.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x"
    }
    def feats(text: String): Seq[String] = {
      val ws = text.toLowerCase.split(' ').filter(_.nonEmpty).toSeq
      ws ++ ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }
    val perDoc = docs.map { case (id, src, text) =>
      (id, src, feats(text).groupBy(bucket).map { case (b, fs) => b -> fs.size.toLong })
    }
    val rawB = perDoc.flatMap(_._3).groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val tgtB = perDoc.filter(_._2 == "src0").flatMap(_._3)
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val (rt, tt) = (rawB.values.sum, tgtB.values.sum)
    val lam = rawB.map { case (b, r) =>
      b -> math.round(1e6 * math.log(
        ((tgtB.getOrElse(b, 0L) + 1).toDouble * (rt + 256)) / ((r + 1).toDouble * (tt + 256))))
    }
    perDoc.filter(_._2 != "src0").map { case (id, src, cs) =>
      (id, src, cs.values.sum, cs.map { case (b, c) => c * lam(b) }.sum)
    }.sortBy { case (id, _, _, sc) => (-sc, id) }.take(50).toSeq
  }

  test("pipeline_dsir matches an independent local reference exactly") {
    val got = graft.operators.Dsir.pipelineDsir(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_feats"), r.getAs[Long]("score_unats"))).toSeq
    assert(got.nonEmpty && got.forall(_._2 != "src0"))
    assert(got == dsirReference())
  }

  test("stream_dsir scores identically to the batch path") {
    val batch = graft.operators.Dsir.pipelineDsir(spark, sf).collect()
      .map(_.toSeq).toSet
    val stream = graft.operators.Dsir.streamDsir(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(batch == stream)
  }

  // -----------------------------------------------------------------
  // Naive-Bayes quality classifier
  // -----------------------------------------------------------------

  /** Plain-Scala NB reference: train src0-vs-src1 over hashed
    * features and score the rest entirely in local collections — an
    * anchor independent of every Spark/DuckDB code path. */
  private def nbReference(): Map[Long, (Long, Boolean)] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(feat: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(feat.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x"
    }
    def feats(text: String): Seq[String] = {
      val ws = text.toLowerCase.split(' ').filter(_.nonEmpty).toSeq
      ws ++ ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }
    val perDoc = docs.map { case (id, src, text) =>
      (id, src, feats(text).groupBy(bucket).map { case (b, fs) => b -> fs.size.toLong })
    }
    def classCounts(src: String) = perDoc.filter(_._2 == src).flatMap(_._3)
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val (posB, negB) = (classCounts("src0"), classCounts("src1"))
    val (pt, nt) = (posB.values.sum, negB.values.sum)
    def w(b: String): Long = math.round(1e6 * math.log(
      ((posB.getOrElse(b, 0L) + 1).toDouble * (nt + 256)) /
        ((negB.getOrElse(b, 0L) + 1).toDouble * (pt + 256))))
    val prior = math.round(1e6 * math.log(
      perDoc.count(_._2 == "src0").toDouble / perDoc.count(_._2 == "src1")))
    perDoc.filter(d => d._2 != "src0" && d._2 != "src1").map { case (id, _, cs) =>
      val sc = prior + cs.map { case (b, c) => c * w(b) }.sum
      id -> (sc, sc > 0)
    }.toMap
  }

  test("pipeline_nb_classifier matches an independent local reference exactly") {
    val ref = nbReference()
    val got = graft.operators.NbClassifier.pipelineNbClassifier(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("score_unats"), r.getAs[Boolean]("keep"))).toMap
    assert(got.nonEmpty && got.size == ref.size)
    assert(got == ref)
    // the gate is only meaningful if the threshold actually splits
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
  }

  test("stream_nb_classifier scores identically to the batch path") {
    val batch = graft.operators.NbClassifier.pipelineNbClassifier(spark, sf).collect()
      .map(_.toSeq).toSet
    val stream = graft.operators.NbClassifier.streamNbClassifier(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(batch == stream)
  }

  // -----------------------------------------------------------------
  // Zipf fit
  // -----------------------------------------------------------------

  /** Plain-Scala Zipf reference: count, rank, quantize and fit in
    * local collections — independent of Spark windows and DuckDB. */
  private def zipfReference(): Map[String, (Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).map { case (src, ds) =>
      val freq = ds.flatMap(_._2.toLowerCase.split(' ').filter(_.nonEmpty))
        .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
      val ranked = freq.toSeq.sortBy { case (w, f) => (-f, w) }.zipWithIndex
        .map { case ((_, f), i) =>
          (math.round(1e6 * math.log((i + 1).toDouble)),
            math.round(1e6 * math.log(f.toDouble)))
        }
      val n = ranked.size.toLong
      val (sx, sy) = (ranked.map(_._1).sum, ranked.map(_._2).sum)
      val sxy = ranked.map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val sxx = ranked.map { case (x, _) => BigInt(x) * BigInt(x) }.sum
      val slope = math.round(1e6 * (BigInt(n) * sxy - BigInt(sx) * BigInt(sy)).toDouble /
        (BigInt(n) * sxx - BigInt(sx) * BigInt(sx)).toDouble)
      val intercept = math.round((sy.toDouble - slope.toDouble / 1e6 * sx.toDouble) / n)
      src -> (n, slope, intercept)
    }
  }

  test("text_zipf_fit matches an independent local OLS reference exactly") {
    val ref = zipfReference()
    val got = graft.operators.ZipfFit.textZipfFit(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_vocab"), r.getAs[Long]("slope_ppm"),
          r.getAs[Long]("intercept_unats"))).toMap
    assert(got.size == ref.size)
    assert(got == ref)
    // a Zipf-ish corpus fits with a clearly negative slope everywhere
    assert(got.values.forall(_._2 < -100000), got.values.map(_._2).toSeq.sorted.take(3))
  }

  // -----------------------------------------------------------------
  // quality-aware canonical election + decontamination ledger
  // -----------------------------------------------------------------

  test("dedup_canonical_quality elects argmax(quality, min id) per cluster") {
    val clusters = graft.operators.DedupClusters.dedupClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val quality = graft.functions.TextOps.textQuality(spark, sf)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent local election over the same inputs
    val ref = clusters.groupBy(_._2).map { case (cid, members) =>
      val best = members.map(_._1).minBy(id => (-quality(id), id))
      cid -> (best, members.length.toLong, quality(best))
    }
    val got = graft.operators.CanonicalQuality.dedupCanonicalQuality(spark, sf)
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("best_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Double]("best_quality"))).toMap
    assert(got == ref)
    // the corpus has at least one cluster where quality flips the election
    val gotRows = graft.operators.CanonicalQuality.dedupCanonicalQuality(spark, sf)
      .collect()
    assert(gotRows.exists(_.getAs[Boolean]("differs_from_minid")) ||
      gotRows.forall(r => r.getAs[Long]("cluster_size") == 1L))
  }

  test("pipeline_decontaminate ledger is conservation-exact per source") {
    val led = graft.operators.Decontaminate.pipelineDecontaminate(spark, sf).collect()
    assert(led.nonEmpty)
    led.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_dropped") + r.getAs[Long]("n_kept"), r.toString)
      val ppm = r.getAs[Long]("dropped_ppm")
      assert(ppm >= 0 && ppm <= 1000000, r.toString)
    }
    // total doc count must equal the non-benchmark corpus exactly
    val nonBench = spark.read.parquet(s"$sf/documents.parquet").collect().count { r =>
      val id = r.getAs[Long]("doc_id")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-bench-v1:$id".getBytes("UTF-8"))
      f"${md(0) & 0xff}%02x" >= "08"
    }
    assert(led.map(_.getAs[Long]("n_docs")).sum == nonBench.toLong)
  }

  // -----------------------------------------------------------------
  // CCNet buckets + tokenizer fertility
  // -----------------------------------------------------------------

  test("pipeline_ccnet_buckets splits each lang into thirds by score histogram") {
    // independent local bucketing from the already-anchored per-doc scores
    val scored = graft.operators.NgramLm.heldOutScores(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(d => scored.contains(d._1))
    val ref = docs.groupBy(_._2).flatMap { case (lang, ds) =>
      val keyed = ds.map { case (id, _, nc) =>
        val (nb, sq) = scored(id); (id, nc, 1000000L * sq / nb)
      }
      val n = keyed.length.toLong
      val hist = keyed.groupBy(_._3).map { case (k, xs) => k -> xs.length.toLong }
      val desc = hist.toSeq.sortBy(-_._1)
      val cumBefore = desc.scanLeft(0L)(_ + _._2).dropRight(1)
      val bucketOf = desc.zip(cumBefore).map { case ((k, _), cb) =>
        k -> (if (cb * 3 < n) "head" else if (cb * 3 < 2 * n) "middle" else "tail")
      }.toMap
      keyed.groupBy(d => bucketOf(d._3)).map { case (b, xs) =>
        (lang, b) -> (xs.length.toLong, xs.map(_._2).sum)
      }
    }
    val got = graft.operators.CcnetBuckets.pipelineCcnetBuckets(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_chars"))).toMap
    assert(got == ref)
    // every lang present has a head bucket, and bucket doc counts are
    // near-thirds (within one key-group of n/3 by construction)
    val langs = got.keys.map(_._1).toSet
    assert(langs.forall(l => got.contains((l, "head"))))
  }

  test("text_bpe_fertility is the exact ppm ratio of anchored token counts") {
    val counts = graft.functions.Bpe.docTokenCounts(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_ws"), r.getAs[Long]("n_tokens"))).toMap
    val langOf = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ref = counts.toSeq.groupBy(c => langOf(c._1)).map { case (lang, xs) =>
      val ws = xs.map(_._2._1).sum; val bpe = xs.map(_._2._2).sum
      lang -> (xs.size.toLong, ws, bpe, 1000000L * bpe / ws)
    }
    val got = graft.operators.Fertility.textBpeFertility(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_ws_tokens"),
          r.getAs[Long]("n_bpe_tokens"), r.getAs[Long]("fertility_ppm"))).toMap
    assert(got == ref)
    // BPE always emits at least one token per word → fertility >= 1e6
    assert(got.values.forall(_._4 >= 1000000L))
  }

  // -----------------------------------------------------------------
  // langid confusion + streaming tokenizer counts
  // -----------------------------------------------------------------

  test("text_langid_confusion cross-tabulates exactly and rows sum to 1e6-ish ppm") {
    val preds = graft.functions.TextOps.textLangId(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang")))
    val ref = preds.groupBy(identity).map { case (cell, xs) =>
      cell -> xs.length.toLong
    }
    val got = graft.operators.LangidEval.textLangidConfusion(spark, sf).collect()
    assert(got.map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang")) ->
      r.getAs[Long]("n_docs")).toMap == ref)
    // per-lang row ppm sums to 1e6 within the integer-floor slack
    got.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val s = rows.map(_.getAs[Long]("row_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rows.length, s"$lang: $s")
    }
    assert(got.exists(_.getAs[Boolean]("correct")))
  }

  test("stream_tokencount_bpe equals the batch tokenizer counts row-for-row") {
    val batch = graft.functions.Bpe.textTokencountBpe(spark, sf).collect()
      .map(_.toSeq).toSet
    val stream = graft.operators.StreamBpe.streamTokencountBpe(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(batch == stream && batch.nonEmpty)
  }

  // -----------------------------------------------------------------
  // char entropy
  // -----------------------------------------------------------------

  test("text_char_entropy matches an independent local Shannon reference") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ref = docs.map { case (id, text) =>
      val cs = text.toSeq.groupBy(identity).map { case (_, xs) => xs.length.toLong }
      val n = cs.sum
      def lam(k: Long) = math.round(1e6 * math.log(k.toDouble))
      val sum = cs.map(c => c * lam(c)).sum
      id -> (n, cs.size.toLong, (n * lam(n) - sum) / n)
    }.toMap
    val got = graft.operators.CharEntropy.textCharEntropy(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars_counted"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("entropy_unats"))).toMap
    assert(got == ref)
    // natural-ish text: entropy strictly positive, bounded by ln(n_distinct)
    assert(got.values.forall { case (_, d, h) =>
      h > 0 && h <= math.round(1e6 * math.log(d.toDouble)) })
  }

  // -----------------------------------------------------------------
  // tokenizer decode
  // -----------------------------------------------------------------

  test("text_detokenize roundtrips every word and rebuilds the exact text") {
    val out = graft.functions.Bpe.textDetokenize(spark, sf)
    assert(out.filter(col("n_roundtrip_ok") =!= col("n_words")).count() == 0)
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), md5(lower(col("text"))).as("h"))
    val joined = out.join(expected, "doc_id")
      .filter(col("rebuilt_hash") =!= col("h"))
    assert(joined.count() == 0, joined.take(1).mkString)
  }
}
