package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 laws: the full-length edit-distance escalation, the
  * histogram-median bounded-domain guard, and the all-accounts decile
  * ranking — each pinned independently of the DuckDB oracle gate. */
class Round13Spec extends AnyFunSuite {
  import TestSession._

  // ---- dedup_editdist_full ------------------------------------------

  /** Classic full-DP Levenshtein (reference replay for the law test —
    * small fixture strings only). */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("editdist escalation: capped full distances replay the exact DP") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("dedup_editdist_full")(spark, sf).collect()
    assert(rows.nonEmpty, "no prefix survivors at sf0.001")
    rows.foreach { r =>
      val want = math.min(lev(docs(r.getAs[Long]("id_a")), docs(r.getAs[Long]("id_b"))), 33)
      assert(r.getAs[Long]("edit_full") == want,
        s"pair ${r.getAs[Long]("id_a")},${r.getAs[Long]("id_b")}: " +
          s"${r.getAs[Long]("edit_full")} != $want")
      assert(r.getAs[Boolean]("is_dup") == (want <= 32))
    }
  }

  test("editdist escalation: prefix-identical but divergent docs are caught") {
    // the exact failure the prefix stage alone cannot see (r12 verdict
    // #4): two docs identical for well past 64 chars whose tails
    // diverge by far more than the budget, plus one true near-dup
    import spark.implicits._
    val prefix = (1 to 30).map(i => f"pre$i%03d").mkString(" ")
    val shared = (1 to 150).map(i => f"w$i%03d").mkString(" ")
    val tail0 = (1 to 40).map(i => f"a$i%03d").mkString(" ")
    val tail1 = (1 to 40).map(i => f"b$i%03d").mkString(" ")
    val t0 = s"$prefix $shared $tail0"
    val t1 = s"$prefix $shared $tail1"
    val t2 = t0.dropRight(4) + "zzzz" // one word swapped: tiny full edit
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_editfull_fixture"
    Seq((0L, t0, "en", "srcX", t0.length.toLong),
      (1L, t1, "en", "srcX", t1.length.toLong),
      (2L, t2, "en", "srcX", t2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("dedup_editdist_full")(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Long]("edit_full"), r.getAs[Boolean]("is_dup"))).toMap
    // 0-1: prefix edit 0 (survivor), full distance >> 32 → capped, NOT a dup
    assert(out.contains((0L, 1L)), s"LSH must band the 0-1 pair: $out")
    assert(out((0L, 1L)) == (33L, false), s"divergent tail not caught: ${out((0L, 1L))}")
    // 0-2: genuine near-dup survives the full pass
    assert(out.contains((0L, 2L)), s"LSH must band the 0-2 pair: $out")
    assert(out((0L, 2L))._2, "true near-dup rejected by the full pass")
  }

  // ---- histogram-median bounded-domain guard ------------------------

  test("histogram median rejects a continuous (unbounded-domain) column loudly") {
    import spark.implicits._
    val continuous = (1 to 5000)
      .map(i => ("A", i + 0.123456 * i, 1L))
      .toDF("l_returnflag", "l_quantity", "c")
    val ex = intercept[Throwable] {
      queries.Relational.medianFromHist(continuous).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("bounded value domain")),
      s"wrong failure: ${ex.getClass.getName}: ${ex.getMessage}")
  }

  test("histogram median still exact on the bounded domain after the guard") {
    val got = SparkEntry.queries("q38_median")(spark, sf)
      .orderBy("l_returnflag").collect()
    assert(got.nonEmpty)
  }

  // ---- tar long names: GNU 'L' and PAX 'x' on read ------------------

  /** Spec-literal header+payload block (POSIX.1-1988 field table +
    * the GNU/PAX typeflags), assembled by hand so a matched
    * writer/parser bug cannot self-cancel. */
  private def tarBlock(name: String, typeflag: Char, payload: Array[Byte]): Array[Byte] = {
    val hdr = new Array[Byte](512)
    name.getBytes("ASCII").copyToArray(hdr)
    def oct(off: Int, width: Int, v: Long): Unit = {
      val s = java.lang.Long.toOctalString(v)
      (("0" * (width - 1 - s.length)) + s).getBytes("ASCII").copyToArray(hdr, off)
    }
    oct(100, 8, 0x1a4); oct(108, 8, 0); oct(116, 8, 0)
    oct(124, 12, payload.length.toLong); oct(136, 12, 0)
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    hdr(156) = typeflag.toByte
    "ustar".getBytes("ASCII").copyToArray(hdr, 257)
    hdr(263) = '0'; hdr(264) = '0'
    val sum = hdr.map(_ & 0xff).sum
    oct(148, 7, sum.toLong)
    hdr(154) = 0; hdr(155) = ' '
    val padN = ((payload.length + 511) / 512) * 512 - payload.length
    hdr ++ payload ++ new Array[Byte](padN)
  }
  private val eof = new Array[Byte](1024)

  // 150-char basename-only path: NO '/' split point fits ustar's
  // prefix(155)/name(100) rule — exactly what forces 'L'/PAX in wild
  // archives (r12 verdict #8's example)
  private val LONG = "d" * 150 + ".bin"

  test("GNU type-'L' long name reads: next member takes the payload path") {
    val data = "gnu payload".getBytes("ASCII")
    val fixture = tarBlock("././@LongLink", 'L', (LONG + "\u0000").getBytes("ASCII")) ++
      tarBlock(LONG.take(100), '0', data) ++ eof
    val ms = graft.functions.TarCodec.members(fixture)
    assert(ms.numElements() == 1)
    val m = ms.getStruct(0, 3)
    assert(m.getUTF8String(0).toString == LONG, m.getUTF8String(0).toString)
    assert(m.getLong(2) == data.length.toLong)
  }

  test("PAX type-'x' path record reads and wins over the ustar name fields") {
    val data = "pax payload".getBytes("ASCII")
    val rec = {
      // len counts the whole record: digits + space + "path=" + value + \n
      val body = s" path=$LONG\n"
      var len = body.length + 1
      while ((len.toString.length + body.length) != len) len = len.toString.length + body.length
      s"$len$body"
    }
    val fixture = tarBlock("PaxHeaders/x", 'x', rec.getBytes("ASCII")) ++
      tarBlock("wrong_name", '0', data) ++ eof
    val ms = graft.functions.TarCodec.members(fixture)
    assert(ms.numElements() == 1)
    assert(ms.getStruct(0, 3).getUTF8String(0).toString == LONG)
  }

  test("PAX global header with a path override rejects loudly") {
    val rec = "10 path=a\n" // 10 chars, correctly framed
    assert(rec.length == 10)
    val fixture = tarBlock("pax_global", 'g', rec.getBytes("ASCII")) ++
      tarBlock("member", '0', "x".getBytes("ASCII")) ++ eof
    val e = intercept[java.io.IOException] { graft.functions.TarCodec.members(fixture) }
    assert(e.getMessage.contains("global"), e.getMessage)
  }

  test("writer emits GNU 'L' for unsplittable long paths and roundtrips (r14)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val data = "x".getBytes("ASCII")
    val entries = new GenericArrayData(Array[Any](
      InternalRow(UTF8String.fromString(LONG), data)))
    val bytes = graft.functions.TarCodec.pack(entries)
    // wire shape: first member is the GNU long-name escape
    assert(new String(bytes, 0, 13, "ASCII") == "././@LongLink")
    assert(bytes(156) == 'L'.toByte)
    val ms = graft.functions.TarCodec.members(bytes)
    assert(ms.numElements() == 1)
    val m = ms.getStruct(0, 3)
    assert(m.getUTF8String(0).toString == LONG, m.getUTF8String(0).toString)
    assert(m.getLong(2) == data.length.toLong)
  }

  test("reader consumes GNU type-'K' long-linkname records, never as a member") {
    val target = ("t" * 150) + "/link-target"
    val data = "sym payload".getBytes("ASCII")
    val fixture = tarBlock("././@LongLink", 'K', (target + "\u0000").getBytes("ASCII")) ++
      tarBlock("member.bin", '0', data) ++ eof
    val ms = graft.functions.TarCodec.members(fixture)
    assert(ms.numElements() == 1)
    val m = ms.getStruct(0, 3)
    assert(m.getUTF8String(0).toString == "member.bin")
    assert(m.getLong(2) == data.length.toLong)
  }

  // ---- batch-2 laws --------------------------------------------------

  test("ANN cascade emits dense top-3 per query with descending cosine") {
    val rows = SparkEntry.queries("sim_ann_cascade")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L), s"query $q ranks")
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(byRank.sliding(2).forall { case Array(a, b) => a >= b }, s"query $q order")
    }
  }

  test("moment sketch agrees with Spark's own skewness/kurtosis aggregates") {
    val got = SparkEntry.queries("sketch_moments")(spark, sf)
      .orderBy("lang").collect()
    val want = Tables.t(spark, sf, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), avg(col("n_chars")).as("mean"),
        var_pop(col("n_chars")).as("v"),
        skewness(col("n_chars")).as("sk"), kurtosis(col("n_chars")).as("ku"))
      .orderBy("lang").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[Long]("n_docs") == w.getAs[Long]("n"))
      def close(a: Double, b: Double, tol: Double) = math.abs(a - b) <= tol * math.max(1.0, math.abs(b))
      assert(close(g.getAs[Double]("mean_len"), w.getAs[Double]("mean"), 1e-6))
      assert(close(g.getAs[Double]("var_len"), w.getAs[Double]("v"), 1e-6))
      assert(close(g.getAs[Double]("skew"), w.getAs[Double]("sk"), 1e-4))
      assert(close(g.getAs[Double]("kurt_excess"), w.getAs[Double]("ku"), 1e-4))
    }
  }

  test("grid pyramid conserves element counts at every level") {
    val rows = SparkEntry.queries("grid_pyramid")(spark, sf).collect()
    val total = Tables.t(spark, sf, "lineitem").count()
    rows.groupBy(_.getAs[Long]("level")).foreach { case (lvl, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum == total, s"level $lvl loses elements")
      val expectBlocks = (total + lvl - 1) / lvl
      assert(rs.length == expectBlocks, s"level $lvl block count")
    }
  }

  test("chunker covers every token; adjacent chunks overlap by exactly 16") {
    val docs = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "size(filter(split(text, ' '), w -> w != '')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("pipeline_chunk_overlap")(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (d, rs) =>
      val n = docs(d)
      val sorted = rs.sortBy(_.getAs[Long]("chunk_id"))
      // coverage: first starts at 1, last ends at n, steps are the stride
      assert(sorted.head.getAs[Long]("start_tok") == 1L)
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_tokens") - 1 == n.toLong,
        s"doc $d: last chunk does not reach token $n")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_tok") - a.getAs[Long]("start_tok") == 48L)
          // overlap = a_end − b_start + 1 = 64 − 48 = 16 for full windows
          assert(a.getAs[Long]("n_tokens") == 64L, s"doc $d: non-final chunk short")
        case _ =>
      }
    }
  }

  test("HLL intersection estimate lands in a sane band around the exact overlap") {
    val r = SparkEntry.queries("sketch_hll_intersect")(spark, sf).collect().head
    val exact = r.getAs[Long]("exact_intersect")
    assert(r.getAs[Double]("est_a") > 0 && r.getAs[Double]("est_b") > 0)
    assert(r.getAs[Double]("est_union") >=
      math.max(r.getAs[Double]("est_a"), r.getAs[Double]("est_b")) * 0.7)
    if (exact > 50)
      assert(math.abs(r.getAs[Double]("est_intersect") - exact) <= 0.8 * exact,
        s"est ${r.getAs[Double]("est_intersect")} vs exact $exact")
  }

  test("dedup explain: every dropped doc is explained, none self-explains") {
    val rows = SparkEntry.queries("dedup_explain")(spark, sf).collect()
    val dropped = SparkEntry.queries("dedup_clusters")(spark, sf)
      .filter(col("doc_id") =!= col("canonical_id")).count()
    assert(rows.length.toLong == dropped, "explain ledger row count != dropped docs")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") != r.getAs[Long]("best_partner"))
      assert(r.getAs[Long]("n_partners") >= 1L)
      assert(r.getAs[Double]("best_jaccard") >= 0.4 - 1e-9) // LSH verify bar
    }
  }

  test("file-stream staging flattens directory-style inputs (the 10x-shape corpus)") {
    // the synthesized 10x/100x bench dirs hold documents.parquet as a
    // DIRECTORY of part files; the file stream source does not recurse
    // into non-partition subdirectories, so r8-r12's staging listed
    // ZERO files there and the memory-sink drains timed an empty
    // stream without any error. The flatten fix stages the part files
    // into the scratch root; this pins stream == batch on exactly that
    // input shape.
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_dirstage"
    Tables.t(spark, sf, "documents")
      .repartition(3).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def rows(key: String) = SparkEntry.queries(key)(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[String]("chunk"))).sorted.toSeq
    val batch = rows("pipeline_chunk_overlap")
    assert(batch.nonEmpty)
    assert(rows("stream_chunk_docs") == batch,
      "streamed chunks diverge from batch on a directory-style corpus")
  }

  // ---- q39 all-accounts decile ranking ------------------------------

  test("ntile segmentation ranks EVERY customer, zero-spend in the bottom") {
    val grid = SparkEntry.queries("q39_ntile")(spark, sf).collect()
    val nCust = Tables.t(spark, sf, "customer").count()
    assert(grid.map(_.getAs[Long]("n_cust")).sum == nCust,
      "decile grid does not cover every customer")
    // any zero-spend accounts must rank in bottom deciles (sf0.001's
    // customers all happen to purchase, so this arm is conditional —
    // the all-accounts coverage law above is the unconditional one)
    val zeroCells = grid.filter(_.getAs[Double]("spend_min") == 0.0)
    assert(zeroCells.forall(_.getAs[Int]("decile") >= 5),
      "zero-spend accounts ranked in a top decile")
  }
}
