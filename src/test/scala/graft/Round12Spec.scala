package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 hardening: the POSIX ustar prefix field (member paths of
  * 101-255 bytes — real WebDataset keys exceed 100 chars routinely),
  * terminator-correct octal field parsing, and the de-skewed
  * span-removal election. */
class Round12Spec extends AnyFunSuite {
  import TestSession._

  // -----------------------------------------------------------------
  // ustar prefix field
  // -----------------------------------------------------------------

  private val PRE = "wds/" + ("p" * 106) // 110 bytes, '/' at index 3
  private val BASE = "0000000042.src" // 14 bytes
  private val FULL = s"$PRE/$BASE" // 125 bytes: needs the prefix field

  /** Spec-literal ustar header WITH the prefix field populated —
    * assembled from the POSIX.1-1988 field table, NOT via
    * TarCodec.pack, so a matched writer/parser bug cannot
    * self-cancel. Split point: the '/' at index 110 (the only cut
    * the writer's leftmost-in-window rule can pick for this path,
    * since the window starts at 125-101=24 and the '/' at 3 is
    * outside it). */
  private def prefixFixture(payload: Array[Byte]): Array[Byte] = {
    val hdr = new Array[Byte](512)
    BASE.getBytes("ASCII").copyToArray(hdr) // name field: basename only
    PRE.getBytes("ASCII").copyToArray(hdr, 345) // prefix field
    def oct(off: Int, width: Int, v: Long): Unit = {
      val s = java.lang.Long.toOctalString(v)
      (("0" * (width - 1 - s.length)) + s).getBytes("ASCII").copyToArray(hdr, off)
    }
    oct(100, 8, 0x1a4); oct(108, 8, 0); oct(116, 8, 0)
    oct(124, 12, payload.length.toLong); oct(136, 12, 0)
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    hdr(156) = '0'
    "ustar".getBytes("ASCII").copyToArray(hdr, 257)
    hdr(263) = '0'; hdr(264) = '0'
    val sum = hdr.map(_ & 0xff).sum
    oct(148, 7, sum.toLong)
    hdr(154) = 0; hdr(155) = ' '
    val padN = ((payload.length + 511) / 512) * 512 - payload.length
    hdr ++ payload ++ new Array[Byte](padN) ++ new Array[Byte](1024)
  }

  test("hand-assembled prefix fixture parses to the full path; pack is byte-identical") {
    val payload = "prefix payload".getBytes("ASCII")
    val fixture = prefixFixture(payload)
    val ms = graft.functions.TarCodec.members(fixture)
    assert(ms.numElements() == 1)
    val m = ms.getStruct(0, 3)
    assert(m.getUTF8String(0).toString == FULL, m.getUTF8String(0).toString)
    assert(m.getLong(1) == 512L && m.getLong(2) == payload.length.toLong)
    val entries = new GenericArrayData(Array[Any](
      InternalRow(UTF8String.fromString(FULL), payload)))
    assert(java.util.Arrays.equals(graft.functions.TarCodec.pack(entries), fixture),
      "production pack diverges from the spec-literal prefix assembly")
  }

  test("octal field with digits after the terminator rejects loudly") {
    // size field "123\0 45\0..." — a scan-all-digits parser reads
    // 0o12345 and walks the archive at the wrong stride; the
    // terminator-correct parser rejects the malformed field instead
    val payload = "x".getBytes("ASCII")
    val fixture = prefixFixture(payload)
    val bad = fixture.clone()
    java.util.Arrays.fill(bad, 124, 136, 0.toByte)
    "123".getBytes("ASCII").copyToArray(bad, 124)
    bad(127) = 0; bad(128) = ' '
    "45".getBytes("ASCII").copyToArray(bad, 129)
    // re-blank + recompute the checksum so ONLY the size field is bad
    java.util.Arrays.fill(bad, 148, 156, ' '.toByte)
    val sum = bad.slice(0, 512).map(_ & 0xff).sum
    val s = java.lang.Long.toOctalString(sum.toLong)
    (("0" * (6 - s.length)) + s).getBytes("ASCII").copyToArray(bad, 148)
    bad(154) = 0; bad(155) = ' '
    val e = intercept[java.io.IOException] { graft.functions.TarCodec.members(bad) }
    assert(e.getMessage.contains("after field terminator"), e.getMessage)
  }

  test("webdataset gates route >100-char member paths through the prefix field") {
    // the .src members carry a 117-char directory key; if the packer
    // or parser mishandled the prefix field the member table (and the
    // md5 payload matches the gate pins) would break
    assert(graft.operators.MmPipeline.LongDir.length > 100 - 15)
    val row = SparkEntry.queries("mm_webdataset_tar")(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_src_match") == row.getAs[Long]("n_txt_match"))
    assert(row.getAs[Long]("n_src_match") > 0)
  }

  // -----------------------------------------------------------------
  // user-block jam: v1 superblock field offset
  // -----------------------------------------------------------------

  test("jamUserBlock patches the v1 base-address field at offset 28, not 24") {
    // v1 superblocks insert indexed-storage K + reserved (4 bytes)
    // before the consistency flags, so the base address sits at 28;
    // patching 24 (the v0 offset) would corrupt the K field
    val img = new Array[Byte](64)
    Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').copyToArray(img)
    img(8) = 1 // superblock version 1
    img(24) = 0x7f; img(25) = 0x7e; img(26) = 0x7d; img(27) = 0x7c // sentinels
    val out = graft.sources.netcdf.Hdf5Format.jamUserBlock(img, 512)
    // little-endian 512 written at ub+28
    assert(out(512 + 28) == 0 && out(512 + 29) == 2)
    (30 until 36).foreach(i => assert(out(512 + i) == 0, s"byte $i"))
    // the v1-only K/reserved bytes right before it stay untouched
    assert(out(512 + 24) == 0x7f && out(512 + 25) == 0x7e &&
      out(512 + 26) == 0x7d && out(512 + 27) == 0x7c)
  }

  // -----------------------------------------------------------------
  // span-removal election (de-skewed r12)
  // -----------------------------------------------------------------

  // -----------------------------------------------------------------
  // r12 operators: novelty, unigram entropy, histogram median
  // -----------------------------------------------------------------

  test("text_novelty: df=1 grams are novel, repeats are not, short docs are zero") {
    import spark.implicits._
    val nine = "a b c d e f g h i" // 9 words → 2 distinct 8-grams
    val docs = Seq(
      (1L, "s1", nine), // shares both 8-grams with doc 2 → novelty 0
      (2L, "s1", nine),
      (3L, "s1", "p q r s t u v w x"), // both 8-grams unique → ppm 1e6
      (4L, "s2", "x y") // too short: 0 grams
    ).toDF("doc_id", "source", "text")
    val tmp = "/tmp/graft_r12_nov"
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("text_novelty")(spark, tmp)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_grams")).toSeq == Seq(2L, 2L, 2L, 0L))
    assert(out.map(_.getAs[Long]("novelty_ppm")).toSeq == Seq(0L, 0L, 1000000L, 0L))
  }

  test("text_unigram_entropy: hand-computed micro-nats on a uniform 2-word source") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "a a b"), (2L, "s1", "b")
    ).toDF("doc_id", "source", "text")
    val tmp = "/tmp/graft_r12_ent"
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("text_unigram_entropy")(spark, tmp).collect()
    assert(out.length == 1)
    val r = out(0)
    // N=4, c_a=c_b=2: H = ln4 − ln2 = ln2 → 693147 micro-nats exactly
    assert(r.getAs[Long]("n_tokens") == 4 && r.getAs[Long]("vocab") == 2)
    assert(r.getAs[Long]("entropy_unats") == 693147L, r.toString)
  }

  test("q38_median histogram device equals the buffering percentile formulation") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q38_median")(spark, sf)
      .orderBy("l_returnflag").collect()
    val want = graft.Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), expr("percentile(l_quantity, 0.5d)").as("m"))
      .orderBy("l_returnflag").collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[Double]("median_qty") == w.getAs[Double]("m"),
        s"${g.getString(0)}: ${g.getAs[Double]("median_qty")} != ${w.getAs[Double]("m")}")
      assert(g.getAs[Long]("n_rows") == w.getAs[Long]("n_rows"))
    }
  }

  test("proto pruning: top quarter per cell pruned under the (cos desc, vec_id) order") {
    // r13: the histogram-threshold rewrite dropped proto_rank from the
    // ledger, so the keep law is re-derived here from first principles:
    // sorting each cell by (proto_cos DESC, vec_id) must put exactly
    // the first floor(n/4) rows in the pruned set.
    val rows = SparkEntry.queries("pipeline_proto_prune")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCell = rows.groupBy(_.getAs[Long]("cell"))
    byCell.foreach { case (cell, rs) =>
      val n = rs.head.getAs[Long]("n_cell")
      assert(rs.length == n, s"cell $cell: n_cell $n != ${rs.length}")
      val sorted = rs.sortBy(r => (-r.getAs[Double]("proto_cos"), r.getAs[Long]("vec_id")))
      val (top, rest) = sorted.splitAt((n / 4).toInt)
      assert(top.forall(!_.getAs[Boolean]("keep")), s"cell $cell: a top-quarter row kept")
      assert(rest.forall(_.getAs[Boolean]("keep")), s"cell $cell: a below-cut row pruned")
    }
  }

  test("wds loader index: parsed offsets equal first-principles layout arithmetic") {
    // independent replay in Scala (not the oracle's SQL, not the codec):
    // name-sorted members, 512-byte headers, 512-padded payloads
    import spark.implicits._
    val docs = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("source")).collect()
    val want = docs.flatMap { r =>
      val id = r.getLong(0)
      Seq((id / 16, f"$id%010d.txt", r.getString(1).getBytes("UTF-8").length.toLong),
        (id / 16, s"${graft.operators.MmPipeline.LongDir}/" + f"$id%010d.src",
          r.getString(2).getBytes("UTF-8").length.toLong))
    }.groupBy(_._1).toSeq.flatMap { case (shard, ms) =>
      var off = 0L
      ms.sortBy(_._2).toSeq.map { case (_, name, sz) =>
        val o = off + 512
        off += 512 + ((sz + 511) / 512) * 512
        (shard, name) -> (o, sz)
      }
    }.toMap
    val got = SparkEntry.queries("mm_wds_index")(spark, sf).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[String]("name")) ->
        (r.getAs[Long]("offset_bytes"), r.getAs[Long]("member_bytes"))).toMap
    assert(got.size == want.size)
    want.foreach { case (k, v) => assert(got(k) == v, s"$k: ${got(k)} != $v") }
  }

  test("chunk manifest: dense ordinals, gap-free spans, full record coverage") {
    val rows = SparkEntry.queries("nc4_chunk_manifest")(spark, sf).collect()
    val n = graft.Tables.t(spark, sf, "lineitem").count()
    rows.groupBy(_.getString(0)).foreach { case (v, cs) =>
      assert(cs.map(_.getAs[Long]("n_recs")).sum == n, s"$v coverage")
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      assert(sorted.map(_.getAs[Long]("chunk_idx")).toSeq == (0L until cs.length), s"$v ordinals")
      // spans tile the record space without gap or overlap
      sorted.foldLeft(0L) { (expect, r) =>
        assert(r.getAs[Long]("start_rec") == expect, s"$v gap at $expect")
        expect + r.getAs[Long]("n_recs")
      }
      assert(cs.forall(_.getAs[Boolean]("has_payload")))
    }
  }

  test("hll groups: union registers dominate per-type, estimates are finite") {
    val rows = SparkEntry.queries("sketch_hll_groups")(spark, sf).collect()
    val union = rows.filter(_.getString(0) == "__union__")
    assert(union.length == 1)
    val types = rows.filter(_.getString(0) != "__union__")
    assert(types.nonEmpty)
    // union registers are the bucketwise max → its power sum (of
    // 2^(49-m_j)) is <= every per-type power sum, and its estimate is
    // >= the largest per-type estimate
    assert(types.forall(_.getAs[Long]("reg_sum") >= union.head.getAs[Long]("reg_sum")))
    assert(union.head.getAs[Double]("est_distinct") >=
      types.map(_.getAs[Double]("est_distinct")).max)
  }

  test("quality ensemble: first-failing-rule attribution sums exactly") {
    val rows = SparkEntry.queries("pipeline_quality_ensemble")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("n_kept") + r.getAs[Long]("killed_length") +
        r.getAs[Long]("killed_entropy") + r.getAs[Long]("killed_novelty")
      assert(total == r.getAs[Long]("n_docs"), r.toString)
    }
  }

  test("stream_char_entropy reproduces text_char_entropy row-for-row") {
    val s0 = SparkEntry.queries("stream_char_entropy")(spark, sf).collect().map(_.toString).sorted
    val b0 = SparkEntry.queries("text_char_entropy")(spark, sf).collect().map(_.toString).sorted
    assert(s0.toSeq == b0.toSeq)
  }

  test("stream_novelty reproduces text_novelty row-for-row") {
    val s0 = SparkEntry.queries("stream_novelty")(spark, sf).collect().map(_.toString).sorted
    val b0 = SparkEntry.queries("text_novelty")(spark, sf).collect().map(_.toString).sorted
    assert(s0.toSeq == b0.toSeq)
  }

  test("stateless stream twins reproduce their batch keys row-for-row") {
    for ((st, ba) <- Seq(
      "stream_redact" -> "text_redact",
      "stream_langid" -> "text_langid",
      "stream_winnow_fingerprint" -> "text_winnow_fingerprint",
      "stream_hash_embedding" -> "text_hash_embedding")) {
      val s0 = SparkEntry.queries(st)(spark, sf).collect().map(_.toString).sorted
      val b0 = SparkEntry.queries(ba)(spark, sf).collect().map(_.toString).sorted
      assert(s0.toSeq == b0.toSeq, s"$st diverges from $ba")
    }
  }

  test("span apply: doc 1 survives whole, clones lose exactly their repeated words") {
    import spark.implicits._
    val span = "a b c d e f g h"
    val docs = Seq(
      (1L, "s1", span), // canonical: survives whole
      (2L, "s1", span), // loses all 8 words
      (3L, "s1", s"x y $span"), // loses the 8-word tail, keeps "x y"
      (4L, "s2", "u v w p q r s t") // unique: untouched
    ).toDF("doc_id", "source", "text")
    val tmp = "/tmp/graft_r12_apply"
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("pipeline_span_apply")(spark, tmp)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_kept")).toSeq == Seq(8L, 0L, 2L, 8L), out.mkString("; "))
    def fp(ws: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(ws.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(out(0).getAs[String]("clean_fp") == fp(span))
    assert(out(1).getAs[String]("clean_fp") == fp(""))
    assert(out(2).getAs[String]("clean_fp") == fp("x y"))
    assert(out(3).getAs[String]("clean_fp") == fp("u v w p q r s t"))
  }

  test("stream_wds_index equals the batch loader manifest row-for-row") {
    val s0 = SparkEntry.queries("stream_wds_index")(spark, sf).collect().map(_.toString).sorted
    val b0 = SparkEntry.queries("mm_wds_index")(spark, sf).collect().map(_.toString).sorted
    assert(s0.toSeq == b0.toSeq)
  }

  test("streaming median and unigram entropy match their batch twins") {
    for ((st, ba) <- Seq("stream_median" -> "q38_median",
      "stream_unigram_entropy" -> "text_unigram_entropy")) {
      val s0 = SparkEntry.queries(st)(spark, sf).collect().map(_.toString).sorted
      val b0 = SparkEntry.queries(ba)(spark, sf).collect().map(_.toString).sorted
      assert(s0.toSeq == b0.toSeq, s"$st diverges from $ba")
    }
  }

  test("span removal keep-first election: min-struct agg elects the same occurrence") {
    // hand-checkable corpus: the 8-word span "a b c d e f g h"
    // appears in docs 1 (pos 1), 2 (pos 1) and 3 (pos 3) — keep-first
    // retains doc 1 and removes the mass from docs 2 and 3 only
    import spark.implicits._
    val span = "a b c d e f g h"
    val docs = Seq(
      (1L, "s1", span),
      (2L, "s1", span),
      (3L, "s1", s"x y $span"),
      (4L, "s2", "u v w p q r s t") // unique: untouched
    ).toDF("doc_id", "source", "text")
    docs.createOrReplaceTempView("documents")
    val tmp = "/tmp/graft_r12_span"
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("pipeline_span_removal")(spark, tmp)
      .orderBy("source").collect()
    val s1 = out(0)
    assert(s1.getAs[Long]("n_docs") == 3)
    assert(s1.getAs[Long]("n_docs_touched") == 2, out.mkString("; "))
    // doc2 loses its whole 8 words; doc3 loses the 8-word tail span
    assert(s1.getAs[Long]("removed_words") == 16, out.mkString("; "))
    val s2 = out(1)
    assert(s2.getAs[Long]("n_docs_touched") == 0 && s2.getAs[Long]("removed_words") == 0)
  }
}
