package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Unicode-aware tokenizer mode (SURVEY.md §2C, r14 — r13 verdict #1
  * residual / punch #4): the house convention tokenizes by
  * `split(lower(text), ' ')`, which is exact cross-engine and right
  * for the synthetic corpus but misassigns mass on a real multilingual
  * crawl — tabs, newlines, punctuation glue words together, and CJK
  * text has no spaces at all. This module is the OPT-IN second mode
  * shared by the `_uni`-suffixed keys: one regex, spliced VERBATIM
  * into both engines, that
  *
  *  - treats an explicit whitespace + punctuation class as separators
  *    (ASCII ws incl. vertical tab, ASCII punctuation, ideographic
  *    space and the common CJK punctuation marks);
  *  - emits every CJK codepoint (Han ideographs, hiragana, katakana,
  *    hangul syllables) as its OWN single-character token — the
  *    standard script-aware fallback when no segmenter is shipped
  *    (and none is: zero-egress classpath), giving character-level
  *    mass assignment instead of whole-sentence "tokens";
  *  - keeps everything else as maximal runs between separators.
  *
  * Cross-engine parity is by CONSTRUCTION, not trust: the pattern
  * avoids every syntax island where java.util.regex and RE2 diverge —
  * no \s (Java includes \x0B, RE2 doesn't), no \p{Punct} (ASCII in
  * Java, unsupported in RE2), no \uXXXX escapes (Java-only; CJK range
  * endpoints are LITERAL characters, identical codepoints to both
  * engines), apostrophe as \x27 so the same text embeds in a SQL
  * string literal unescaped. The two alternation branches are
  * disjoint (the run class excludes CJK), so leftmost-first (Java,
  * RE2 default) and leftmost-longest semantics agree, and no branch
  * can match empty — no empty-token filtering needed.
  */
object Tokenize {

  /** Separator class CONTENT: ASCII whitespace (incl. \x0B vertical
    * tab, spelled out — see \s note above), ASCII punctuation
    * (apostrophe \x27, backslash \x5C, backtick \x60, dash \x2D at
    * the end so no accidental range forms), ideographic space and
    * CJK punctuation as literal characters. */
  private val SEP =
    """ \t\n\r\f\x0B.,;:!?\x27"()\[\]{}<>/\x5C|@#$%^&*_+=~\x60\x2D""" +
      "　。、，．！？：；（）「」『』…—·"

  /** CJK single-token class content: Han ideographs, hiragana,
    * katakana, hangul syllables — literal-character range endpoints. */
  private val CJK = "一-鿿ぁ-ゟ゠-ヿ가-힣"

  /** The one pattern both engines run. Branch 1: one CJK codepoint.
    * Branch 2: a maximal run of non-separator, non-CJK characters. */
  val PAT: String = s"(?:[$CJK])|(?:[^$SEP$CJK]+)"

  /** Spark-side token array (codegen'd native functions, no UDF). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(PAT), lit(0))

  /** Matches exactly one CJK token (for per-script accounting). */
  val CJK_ONE: String = s"^[$CJK]$$"

  /** DuckDB twin: the SAME pattern text, embedded in a single-quoted
    * SQL literal (the pattern contains no single quotes — apostrophe
    * rides as \x27 — and DuckDB's standard string literals don't
    * process backslashes, so the regex arrives verbatim). */
  def duckTokens(textExpr: String): String =
    s"regexp_extract_all(lower($textExpr), '$PAT', 0)"

  // -------------------------------------------------------------------
  // The non-space-separator fixture: four documents with tabs,
  // newlines, CR/LF, vertical tab, form feed, ASCII + CJK punctuation,
  // Han / hiragana / katakana / hangul — unioned into the corpus by
  // every `_uni` key IN BOTH ENGINES, so the correctness gate
  // exercises separators the synthetic corpus (single-space ASCII)
  // never contains. Negative doc_ids cannot collide with the corpus.
  // No single quotes in the text: the same literals splice into SQL.
  // -------------------------------------------------------------------

  val FIXTURE: Seq[(Long, String)] = Seq(
    -1L -> "Tab\tseparated\ttokens,and;punctuation!marks?plus(parens)[brackets]{braces}",
    -2L -> "line\nbreaks\r\nand\u000Bvertical\ftabs end-of-line hyphen-split",
    -3L -> "中文文本没有空格。English words mixed 中文 tokens",
    -4L -> "ひらがなとカタカナ 가나다 mixed scripts",
    // r15 (r14 verdict #3) — the remaining java.regex-vs-RE2
    // divergence islands: java.regex walks UTF-16 with surrogate-pair
    // logic while RE2 walks UTF-8 codepoints, so a class-membership
    // bug would split an astral codepoint in one engine only.
    // RTL: Arabic + Hebrew letters are run characters (non-sep,
    // non-CJK); the regex sees logical order — no bidi reordering
    -5L -> "نص عربي rtl mixed עברית וטקסט direction",
    // combining marks ride inside runs unnormalized: cafe+U+0301 and
    // precomposed café are DISTINCT tokens in both engines
    // (neither normalizes), which this row pins
    -6L -> "café combining résumé naïve precomposed café",
    // non-BMP emoji: one codepoint each (surrogate PAIR in java.regex,
    // one UTF-8 codepoint in RE2) — runs must not split mid-pair; ZWJ
    // (U+200D) is a run character so the family sequence stays whole
    -7L -> ("emoji 👍 split 🚀🔥 runs " +
      "👨‍👩‍👧 zwj family"),
    // r16 (r15 verdict #1) — a DELIBERATE CJK near-dup pair: two docs
    // sharing a long unspaced boilerplate passage, differing only in
    // their tails. Without it every fixture doc is unique, so the
    // unicode dedup twins' oracles gate only the NEGATIVE side (no
    // false pairs); these two make the gates exercise a true CJK
    // positive end-to-end — repeated multibyte CDC chunks, a banded
    // LSH/simhash pair, shared 8-token boilerplate segments, a
    // 2-doc cluster — exactly the recall the `_uni` mode exists for.
    -8L -> ("お知らせ 本サイトの利用規約とプライバシーポリシーは全ページ共通の定型文として" +
      "表示されます。この文章は繰り返し使われる案内文です。記事八の固有内容。"),
    -9L -> ("お知らせ 本サイトの利用規約とプライバシーポリシーは全ページ共通の定型文として" +
      "表示されます。この文章は繰り返し使われる案内文です。記事九の結びの言葉。"))

  /** documents ∪ fixture, Spark side: (doc_id, text) only — the
    * fixture rows are planner literals (LocalRelation), so the union
    * adds zero scan cost and no shuffle. */
  def unionedDocs(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    val fx = s.createDataFrame(
      java.util.Arrays.asList(FIXTURE.map { case (id, tx) =>
        org.apache.spark.sql.Row(id, tx): org.apache.spark.sql.Row }: _*),
      schema)
    graft.Tables.t(s, dir, "documents").select(col("doc_id"), col("text"))
      .unionAll(fx)
  }

  /** The DuckDB twin of [[unionedDocs]] as a CTE body named `udocs`.
    * Tabs/newlines/CJK ride as raw characters inside the SQL string
    * literal — legal SQL, byte-identical to the Spark-side literals. */
  val udocsCte: String = {
    val rows = FIXTURE.map { case (id, tx) =>
      s"(CAST($id AS BIGINT), '$tx')"
    }.mkString(",\n    ")
    s"""udocs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT * FROM (VALUES
       |    $rows) AS fx(doc_id, text))""".stripMargin
  }
}
