package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SftPrep, TextAnalysis}

/** Behavior specs for the twentieth-wave operators (q130–q132):
  * KV-prefix-cache sharing report, opening-intent mixture, and the
  * declared-label vs language-ID-classifier confusion audit. */
class Wave20OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("prefix cache: opener grouping, truncation, savings arithmetic") {
    import spark.implicits._
    val t = Seq(
      // A and B share the first 12 chars of their openers
      ("A", 0, "alpha beta gamma one"),
      ("A", 1, "ignored non-opener turn"),
      ("B", 0, "alpha beta gamma two"),
      // C's opener is shorter than the prefix budget
      ("C", 0, "zeta"))
      .toDF("conv_id", "turn_idx", "text")
    val out = SftPrep.prefixCacheReport(t, prefixChars = 12).collect()
    assert(out.length == 2)
    // "alpha beta g" (12 chars, 3 whitespace tokens), 2 convs → 3 saved
    assert(out(0).getLong(1) == 2L) // n_convs
    assert(out(0).getLong(2) == 3L) // prefix_n_tok
    assert(out(0).getLong(3) == 3L) // saved_tok = (2-1)*3
    // "zeta": single conv → nothing saved
    assert(out(1).getLong(1) == 1L && out(1).getLong(3) == 0L)
  }

  test("intent mix: rules table, no-user fallback, depth/token stats") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "system", "x"),
      ("A", 1, "user", "purchase now please"), // first USER turn wins
      ("B", 0, "user", "click here"),
      ("C", 0, "assistant", "hi there"), // no user turn at all
      ("D", 0, "user", "weird thing")) // unmatched opener
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.intentMix(t).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out.size == 4)
    assert(out("transactional") == (1L, 2.0, 4.0)) // A: 2 turns, 1+3 tok
    assert(out("navigational") == (1L, 1.0, 2.0))
    assert(out("no_user") == (1L, 1.0, 2.0))
    assert(out("other") == (1L, 1.0, 2.0))
  }

  test("lang confusion: class mapping, per-label shares, agreement") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the cat and the dog is to a"), // stopword-dense → en
      (2L, "en", "zzz qqq"), // ascii, no stopwords → latin_other
      (3L, "zh", "你好 world"), // CJK codepoint → cjk
      (4L, "fr", "bonjour xyz"), // ascii → latin_other (agrees)
      (5L, "de", "üöä")) // non-ascii, non-CJK → other
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out.size == 5)
    assert(out(("en", "en")) == (1L, 0.5, true))
    assert(out(("en", "latin_other")) == (1L, 0.5, false))
    assert(out(("zh", "cjk")) == (1L, 1.0, true))
    assert(out(("fr", "latin_other")) == (1L, 1.0, true))
    assert(out(("de", "other")) == (1L, 1.0, false))
  }
}
