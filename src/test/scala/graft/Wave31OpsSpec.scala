package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, Similarity, TextAnalysis}

/** Behavior specs for the thirty-first-wave operators (q163–q165):
  * ANN recall curve, shard balance, quality×length MI. */
class Wave31OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ann recall curve: monotone in nProbe, exact at nProbe=nCells") {
    import spark.implicits._
    // two clearly separated blobs in d=4 so 2 Lloyd cells find them
    val embs = (0L until 8L).map { i =>
      val b = if (i % 2 == 0) 1f else -1f
      (i, Array(b * 10f + i * 0.01f, b * 10f, 1f, 0f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.annRecallCurve(embs, nCells = 2, kmIters = 2,
      k = 3, nQueries = 4).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2))
    val recalls = out.map(_.getDouble(2))
    assert(recalls(0) <= recalls(1))
    assert(recalls(1) == 1.0) // probing every cell IS brute force
  }

  test("shard balance: loads sum to corpus tokens, ratio sane") {
    import spark.implicits._
    val docs = (0L until 100L).map(i =>
      (i, "tok " * 10 + "end", "s")).toDF("doc_id", "text", "source")
    val out = CorpusStats.shardBalance(docs, nShards = 8).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getInt(0) == 8)
    assert(r.getLong(2) == 1100L) // 100 docs × 11 tokens
    assert(r.getDouble(5) == 137.5)
    assert(r.getLong(4) >= 138L) // max ≥ ceil(mean)
    assert(r.getDouble(6) >= 1.0)
    assert(r.getLong(3) <= r.getLong(4))
  }

  test("quality-length MI: independent grid ~0, coupled grid positive") {
    import spark.implicits._
    // length varies but text composition (score) is constant per
    // length class → score and length fully coupled → MI ≈ H
    val coupled = (0 until 40).map { i =>
      val t = if (i % 2 == 0) "the and is of to" else ("zz " * 40).trim
      (i.toLong, t, "s")
    }.toDF("doc_id", "text", "source")
    val c = TextAnalysis.qualityLengthMi(coupled).collect()(0)
    assert(c.getLong(0) == 40L && c.getLong(1) == 2L)
    assert(c.getDouble(5) == 1.0) // perfectly coupled → normalized 1
    // one length bucket only → H_length = 0 → normalized guarded to 0
    val flat = (0 until 10).map(i => (i.toLong, "a b c", "s"))
      .toDF("doc_id", "text", "source")
    val f = TextAnalysis.qualityLengthMi(flat).collect()(0)
    assert(f.getDouble(2) == 0.0 && f.getDouble(5) == 0.0)
  }
}
