package graft

import graft.functions.{Bpe, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  import TestSession._

  private def countOf(words: String*): Seq[Int] = {
    import spark.implicits._
    words.toDF("w").selectExpr(Bpe.sparkCountExpr("w")).collect().map(_.getInt(0)).toSeq
  }

  test("known merges produce expected token counts") {
    // "the": t h e → th e → the (1 token)
    // "that": t h a t → th a t → th at → 2 tokens ("th at"; no rule merges th+at)
    // "ing": i n g → in g → ing (1)
    // "zzz": no rules apply → 3 char tokens
    // "standing": s t a n d i n g → st an d in g → st and ing? "an d"→and
    //   needs tokens an,d adjacent: st an d ing → "an d"→and fires → st and ing (3)
    assert(countOf("the", "that", "ing", "zzz", "standing") ==
      Seq(1, 2, 1, 3, 3))
  }

  test("merged tokens never re-merge across boundaries") {
    // "abab": a b a b → ab ab via the "a b" rule, needing the 2-pass
    // replace (pass 1 consumes the shared separator) — 2 tokens, not 3
    assert(countOf("abab") == Seq(2))
    // "thethe": t h e t h e → th e th e → the the → 2
    assert(countOf("thethe") == Seq(2))
  }

  test("bpe compresses the corpus vs whitespace-char baseline") {
    val df = Bpe.textTokencountBpe(spark, sf)
    val row = df.agg(sum("n_ws_tokens"), sum("n_bpe_tokens")).head()
    val (ws, bpe) = (row.getLong(0), row.getLong(1))
    assert(bpe > ws, "subword count must exceed word count")
    // and far fewer tokens than characters (merges actually fire)
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .agg(sum(length(col("text")))).head().getLong(0)
    assert(bpe < chars * 3 / 4, s"bpe=$bpe chars=$chars — merges not firing?")
  }

  test("bpe training learns the hand-computed merge sequence") {
    import spark.implicits._
    val dir = "/tmp/graft_bpe_train"
    // vocab: aaab (f=3), ab (f=1)
    // iter 1: pairs (a,a)=6, (a,b)=4         → learn (a,a)
    //   apply: 'a a a b' → 'aa a b' (the two-pass replace leaves the
    //   odd trailing 'a' unmerged — the single-rule fixed point)
    // iter 2: (aa,a)=3, (a,b)=3+1=4          → learn (a,b)
    // iter 3: (aa,ab)=3, 'ab' fully merged   → learn (aa,ab)
    Seq((0L, "aaab aaab aaab ab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Bpe.textBpeTrainK(3)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, "a", "a", 6L), (2L, "a", "b", 4L), (3L, "aa", "ab", 3L)), s"$got")
    // tie-break: equal counts resolve to the lexicographically
    // smallest pair on both engines' binary collation
    Seq((0L, "xy yx")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tie = Bpe.textBpeTrainK(1)(spark, dir)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(tie == Seq(("x", "y")), s"$tie")
  }

  test("loadMerges parses the released merges.txt shape in rank order") {
    val path = "/tmp/graft_bpe/merges_test.txt"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write("#version: 0.2\nt h\nin g\n\nth e\n".getBytes("UTF-8"))
    out.close()
    val loaded = Bpe.loadMerges(spark, path)
    // header and blank lines skipped, LINE ORDER preserved (= rank)
    assert(loaded == Seq("t h" -> "th", "in g" -> "ing", "th e" -> "the"))
    // malformed / injection-shaped rules rejected
    val bad = fs.create(p, true)
    bad.write("a b c\n".getBytes("UTF-8")); bad.close()
    intercept[IllegalArgumentException](Bpe.loadMerges(spark, path))
    val inj = fs.create(p, true)
    inj.write("a', '') -- x\n".getBytes("UTF-8")); inj.close()
    intercept[IllegalArgumentException](Bpe.loadMerges(spark, path))
  }

  test("file-loaded merge table tokenizes identically to the built-in table") {
    import spark.implicits._
    val got = Seq("the", "interesting", "standing").toDF("w")
      .selectExpr(Bpe.sparkTokensExpr("w", Bpe.merges)).collect()
    val builtin = Seq("the", "interesting", "standing").toDF("w")
      .selectExpr(Bpe.sparkTokensExpr("w")).collect()
    assert(got.map(_.toString).toSeq == builtin.map(_.toString).toSeq)
  }

  test("pack bins: every non-final bin is filled to the exact budget") {
    val bins = TextOps.queries("pipeline_pack_bins")(spark, sf)
    val perBin = bins.groupBy("source", "bin_id")
      .agg(sum("slice_len").as("filled"))
    val lastBin = perBin.groupBy("source").agg(max("bin_id").as("last"))
    val nonFinal = perBin.join(lastBin, "source").filter(col("bin_id") < col("last"))
    val bad = nonFinal.filter(col("filled") =!= 2048).count()
    assert(bad == 0, s"$bad non-final bins not exactly at budget")
    assert(nonFinal.count() > 0, "expected multiple bins per source at sf0.001")
  }

  test("pack bins tile each document exactly once") {
    val bins = TextOps.queries("pipeline_pack_bins")(spark, sf)
    val perDoc = bins.groupBy("doc_id").agg(sum("slice_len").as("covered"))
    val toks = Bpe.docTokenCounts(spark, sf).select(col("doc_id"), col("n_tokens"))
    val mismatches = perDoc.join(toks, "doc_id")
      .filter(col("covered") =!= col("n_tokens")).count()
    assert(mismatches == 0)
  }
}
