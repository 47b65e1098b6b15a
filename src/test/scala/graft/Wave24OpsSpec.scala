package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, TextAnalysis}

/** Behavior specs for the twenty-fourth-wave operators (q142–q144):
  * markup/format router, skip-gram pairs, gate-vs-model calibration. */
class Wave24OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("markup profile: char densities route markup / code / prose") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<a><b></b></a>"), // 8 angle chars of 14
      (2L, "x = 1; y = 2;"), // 2×'=' + 2×';' of 13
      (3L, "just plain prose here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.markupProfile(docs).collect()
    assert(out.map(_.getString(6)).toSeq ==
      Seq("markup", "code", "prose"))
    assert(out(0).getLong(3) == 8L &&
      out(0).getDouble(5) == 0.571429)
    assert(out(1).getLong(2) == 4L &&
      out(1).getDouble(4) == 0.307692)
    assert(out(2).getLong(2) == 0L && out(2).getLong(3) == 0L)
  }

  test("skip-gram pairs: stride-2 extraction, short docs contribute none") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"), // pairs: a a, b b, a a
      (2L, "x y")) // size < 3 → nothing
      .toDF("doc_id", "text")
    val out = CorpusStats.skipgramPairs(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a a", 2L), ("b b", 1L)))
  }

  test("quality calibration: agree cells, shares within source") {
    import spark.implicits._
    val docs = Seq(
      // stopword-rich, 12 tokens, no punctuation → both filters keep
      (1L, "srcA", "the a and of to is the a and of to is"),
      // 1 token, all punctuation → both filters cut
      (2L, "srcA", "hi."))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.qualityCalibration(docs).collect()
    assert(out.length == 2)
    val cut = out(0) // false sorts before true
    assert(!cut.getBoolean(1) && !cut.getBoolean(2))
    assert(cut.getLong(3) == 1L && cut.getDouble(4) < 0.1)
    assert(cut.getDouble(5) == 0.5)
    val kept = out(1)
    assert(kept.getBoolean(1) && kept.getBoolean(2))
    assert(kept.getLong(3) == 1L && kept.getDouble(4) > 0.9)
    assert(kept.getDouble(5) == 0.5)
  }
}
