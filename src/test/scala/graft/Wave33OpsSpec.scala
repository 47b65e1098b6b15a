package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, Dedup, TextAnalysis}

/** Behavior specs for the thirty-third-wave operators (q169–q171):
  * boilerplate-line share, canonicalization dedup sweep, Flesch
  * readability. */
class Wave33OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("boilerplate share: hot lines counted per doc, flag at 0.3") {
    import spark.implicits._
    // footer shared by 4 docs (> maxDocFreq 2); body lines unique
    val docs = (0L to 3L).map(i =>
      (i, s"body line $i\nmore body $i\nshared footer line"))
      .toDF("doc_id", "text")
      .union(Seq((4L, "lonely doc")).toDF("doc_id", "text"))
    val out = CorpusStats.boilerplateShare(docs, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getBoolean(4)))).toMap
    (0L to 3L).foreach { i =>
      assert(out(i) == ((3L, 1L, 0.333333, true)))
    }
    assert(out(4L) == ((1L, 0L, 0.0, false)))
  }

  test("canon dedup sweep: nested levels reclaim nested dup sets") {
    import spark.implicits._
    val docs = Seq(
      (0L, "Hello World."), // case dup of 1
      (1L, "hello world."),
      (2L, "hello   world."), // + whitespace dup
      (3L, "hello world"), // + punctuation dup
      (4L, "something else entirely")).toDF("doc_id", "text")
    val out = Dedup.canonDedupSweep(docs).collect()
      .map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out("raw") == ((5L, 5L, 0L, 0.0)))
    assert(out("lower") == ((5L, 4L, 1L, 0.2)))
    assert(out("lower_ws") == ((5L, 3L, 2L, 0.4)))
    assert(out("lower_ws_alnum") == ((5L, 2L, 3L, 0.6)))
    // nested levels: distinct counts are non-increasing
    val byIdx = Dedup.canonDedupSweep(docs).collect()
      .sortBy(_.getInt(0)).map(_.getLong(3))
    assert(byIdx.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("readability: monosyllabic prose easy, polysyllabic hard") {
    import spark.implicits._
    val docs = Seq(
      (0L, "The cat sat. The dog ran."),
      (1L, "Extraordinary circumstances necessitate comprehensive " +
        "reevaluation")).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0: 6 words, 2 sentences, 6 syllables (all monosyllables)
    val r0 = out(0L)
    assert(r0.getLong(1) == 6L && r0.getLong(2) == 2L &&
      r0.getLong(3) == 6L)
    // FRE = 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    assert(math.abs(r0.getDouble(4) - 119.19) < 1e-9)
    assert(r0.getString(6) == "easy")
    // doc 1: dense polysyllables in one unterminated sentence
    val r1 = out(1L)
    assert(r1.getLong(2) == 1L) // no terminator: clamped to 1
    assert(r1.getLong(3) > 3L * r1.getLong(1)) // >3 syllables/word
    assert(r1.getString(6) == "hard")
  }
}
