package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, Similarity, TextAnalysis}

/** Behavior specs for the twenty-seventh-wave operators (q151–q153):
  * ingestion drift, k-center coreset, score percentiles. */
class Wave27OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ingestion drift: shifted vocabulary in late deciles raises KL") {
    import spark.implicits._
    // first half "alpha beta", second half "gamma delta": with
    // nBuckets=2 the two halves diverge from the 50/50 corpus mix
    val docs = (0L until 20L).map { i =>
      (i, if (i < 10) "alpha beta" else "gamma delta", "s0")
    }.toDF("doc_id", "text", "source")
    val out = CorpusStats.ingestionDrift(docs, nBuckets = 2).collect()
    assert(out.length == 2)
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1))
    // each bucket: 20 tokens, 2 terms, KL = ln(2) (each term is 1/2
    // in-bucket vs 1/4 corpus-wide)
    out.foreach { r =>
      assert(r.getLong(1) == 20L && r.getLong(2) == 2L)
      assert(r.getDouble(3) == 0.693147)
    }
    assert(out(0).isNullAt(4)) // no previous decile
    assert(out(1).getDouble(4) == 0.0) // symmetric halves
  }

  test("coreset: farthest-first picks the spread, radius non-increasing") {
    import spark.implicits._
    // 1-D line embedded in d=2: points at x = 0, 1, 10, 20. Seed 0;
    // farthest is 20 (d²=400), then 10 (min-dist 100), then 1.
    val embs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(10f, 0f)), (3L, Array(20f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.coresetSelect(embs, k = 4).collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 0L), (1, 3L), (2, 2L), (3, 1L)))
    val dists = out.map(_.getDouble(2)).toSeq
    assert(dists == Seq(0.0, 400.0, 100.0, 1.0))
  }

  test("score percentiles: within-source rank, sources independent") {
    import spark.implicits._
    // srcA has two distinct scores (short doc vs longer doc), srcB one
    val docs = Seq(
      (0L, "the and is", "srcA"),
      (1L, "zz", "srcA"),
      (2L, "zz", "srcA"),
      (3L, "the and is", "srcB"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.scorePercentiles(docs).collect()
    assert(out.length == 4)
    val byDoc = out.map(r => r.getLong(0) ->
      (r.getString(1), r.getDouble(2), r.getDouble(3))).toMap
    // within srcA: doc0's stopword-heavy text scores HIGHER than the
    // zz docs, so doc0 is the top of its source (pct 1.0) and the two
    // zz docs share the lower bucket (pct 2/3)
    assert(byDoc(0L)._3 == 1.0)
    assert(byDoc(1L)._3 == 0.666667 && byDoc(2L)._3 == 0.666667)
    // srcB's single doc is trivially its own 100th percentile,
    // regardless of what srcA contains
    assert(byDoc(3L)._3 == 1.0)
    // same text → same score across sources, different percentiles OK
    assert(byDoc(0L)._2 == byDoc(3L)._2)
  }
}
