package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, SftPrep, TextAnalysis}

/** Behavior specs for the thirty-sixth-wave operators (q178–q180):
  * latency-by-intent, document template mining, stopword stylometry
  * matrix. */
class Wave36OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("latency by intent: gaps attributed to the opening intent") {
    import spark.implicits._
    val t = Seq(
      // troubleshooting conv: two user→assistant gaps of 100 and 300
      ("A", 0, "user", "error on login", 1000L),
      ("A", 1, "assistant", "try again", 1100L),
      ("A", 2, "user", "still broken", 2000L),
      ("A", 3, "assistant", "escalating", 2300L),
      // navigational conv: one gap of 50
      ("B", 0, "user", "view dashboard", 5000L),
      ("B", 1, "assistant", "here", 5050L))
      .toDF("conv_id", "turn_idx", "role", "text", "ts_ms")
    val out = SftPrep.latencyByIntent(t).collect()
      .map(r => r.getString(0) -> r).toMap
    val tr = out("troubleshooting")
    assert(tr.getLong(1) == 2L)
    assert(tr.getDouble(2) == 200.0) // p50 of {100, 300} (R-7 interp)
    assert(tr.getDouble(5) == 200.0) // mean
    val nav = out("navigational")
    assert(nav.getLong(1) == 1L && nav.getDouble(2) == 50.0)
  }

  test("doc templates: digit-varying docs collapse to one skeleton") {
    import spark.implicits._
    val docs = (0L to 5L).map(i =>
      (i, s"build $i completed in ${i * 7} seconds", s"src${i % 2}"))
      .toDF("doc_id", "text", "source")
      .union(Seq((6L, "one-off prose document", "src0"))
        .toDF("doc_id", "text", "source"))
    val out = CorpusStats.docTemplates(docs, minUses = 3, topN = 5)
      .collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "build # completed in # seconds")
    assert(out.head.getLong(2) == 6L) // n_docs
    assert(out.head.getLong(3) == 2L) // n_sources
  }

  test("stopword profile: same register ~1, disjoint registers low") {
    import spark.implicits._
    val enA = "the cat sat on the mat and it was good to be at home"
    val enB = "the dog ran on the rug and it was nice to be at sea"
    val sym = "x1 y2 z3 q9 k7 m4" // no function words at all
    val docs = Seq(
      (0L, enA, "a"), (1L, enB, "b"), (2L, sym, "c"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.stopwordProfileSim(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(out(("a", "b")) == 1.0) // identical function-word profile
    assert(out(("a", "c")) == 0.0) // zero-vector side → 0 by contract
    assert(out(("b", "c")) == 0.0)
  }
}
