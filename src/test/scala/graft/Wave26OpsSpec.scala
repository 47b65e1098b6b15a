package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, SftPrep}

/** Behavior specs for the twenty-sixth-wave operators (q148–q150):
  * answer consistency, term burstiness, length-KS drift. */
class Wave26OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("answer consistency: repeated questions, distinct answers") {
    import spark.implicits._
    val t = Seq(
      // "q1" asked 3× (convs A, B, C) with 2 distinct answers
      ("A", 0, "user", "q1"), ("A", 1, "assistant", "ans-x"),
      ("B", 0, "user", "q1"), ("B", 1, "assistant", "ans-x"),
      ("C", 0, "user", "q1"), ("C", 1, "assistant", "ans-y"),
      // "q2" asked twice in ONE conv, same answer → consistent
      ("D", 0, "user", "q2"), ("D", 1, "assistant", "same"),
      ("D", 2, "user", "q2"), ("D", 3, "assistant", "same"),
      // singleton ask → below minAsks, excluded
      ("E", 0, "user", "solo q"), ("E", 1, "assistant", "a"),
      // user turn with no assistant reply → not a pair
      ("F", 0, "user", "q1"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.answerConsistency(t).collect()
    assert(out.length == 2)
    val byAsks = out.map(r => (r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4), r.getBoolean(5)))
    // q1: 3 asks, 3 convs, 2 answers; q2: 2 asks, 1 conv, 1 answer
    assert(byAsks.toSet == Set(
      (3L, 3L, 2L, 0.666667, false),
      (2L, 1L, 1L, 0.5, true)))
  }

  test("term burstiness: clumped terms outrank sprinkled ones") {
    import spark.implicits._
    // "dense" appears 3× in each of 5 docs (burstiness 3); "flat"
    // once in each of 6 docs (burstiness 1); "rare" df=2 < minDf=5.
    val docs = (0 until 6).map { i =>
      val dense = if (i < 5) "dense dense dense " else ""
      val rare = if (i < 2) "rare " else ""
      (i.toLong, s"${dense}${rare}flat", "s0")
    }.toDF("doc_id", "text", "source")
    val out = CorpusStats.termBurstiness(docs, minDf = 5, topN = 10)
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("dense", "flat"))
    val d = out(0)
    assert(d.getLong(1) == 5L && d.getLong(2) == 15L &&
      d.getDouble(3) == 3.0)
    assert(out(1).getDouble(3) == 1.0)
  }

  test("length KS drift: a shifted source is flagged, a matched one not") {
    import spark.implicits._
    // srcA docs are 2 tokens, srcB docs 10 tokens → KS(A vs rest)=1.
    val docs = ((0 until 40).map(i => (i.toLong, "a b", "srcA")) ++
      (40 until 80).map(i => (i.toLong, Seq.fill(10)("w").mkString(" "),
        "srcB"))).toDF("doc_id", "text", "source")
    val out = CorpusStats.lengthKsDrift(docs).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(1) == 40L)
      assert(r.getDouble(2) == 1.0) // sup gap at the step between 2 and 10
      assert(r.getBoolean(5)) // 1.0 > 1.358*sqrt(80/1600)=0.3036
    }
    assert(out(0).getLong(3) == 2L) // gap first attained at len 2
    // identical distributions → ks 0, not drifted
    val same = ((0 until 40).map(i => (i.toLong, "a b", "srcA")) ++
      (40 until 80).map(i => (i.toLong, "c d", "srcB")))
      .toDF("doc_id", "text", "source")
    val out2 = CorpusStats.lengthKsDrift(same).collect()
    assert(out2.forall(r => r.getDouble(2) == 0.0 && !r.getBoolean(5)))
  }
}
