package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, Dedup, SftPrep}

/** Behavior specs for the fortieth-wave operators (q191–q193):
  * packing-efficiency sweep, cross-source exact-dup flow matrix,
  * conversation-volume concentration. */
class Wave40OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("packing sweep: fill ratio and boundary-crossing docs") {
    import spark.implicits._
    // est tokens = ceil(len/4): "aaaa" → 1, "a"*12 → 3
    val docs = Seq(
      (1L, "aaaa", "s"),        // tb 0, est 1: seq 0
      (2L, "a" * 12, "s"),      // tb 1, est 3, end 3: spans seqs 0–1
      (3L, "aaaa", "s"))        // tb 4, est 1: seq 2
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.packingSweep(docs, budgets = Seq(2L))
      .collect().head
    assert(out.getLong(0) == 2L)     // budget
    assert(out.getLong(1) == 3L)     // n_docs
    assert(out.getLong(2) == 5L)     // total tokens
    assert(out.getLong(3) == 3L)     // n_seqs (last end-seq 2 + 1)
    assert(out.getDouble(4) == 0.833333) // 5 / (3·2)
    assert(out.getLong(5) == 1L)     // only doc 2 crosses
    assert(out.getDouble(6) == 0.333333)
  }

  test("cross-source dup flow: verbatim pairs only, a < b") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared text", "a"), (2L, "shared text", "b"),
      (3L, "shared text", "b"), // same-source repeat: no new pair
      (4L, "only in a", "a"), (5L, "only in c", "c"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.crossSourceDupFlow(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 1L))
  }

  test("conv concentration: uniform gini 0, skew raises it") {
    import spark.implicits._
    def t(lens: Seq[Int]) = lens.zipWithIndex.flatMap { case (l, c) =>
      (0 until l).map(i => (s"c$c", i, "user"))
    }.toDF("conv_id", "turn_idx", "role")
    val uni = SftPrep.convConcentration(t(Seq(2, 2))).collect().head
    assert(uni.getLong(0) == 2L && uni.getLong(1) == 4L)
    assert(uni.getDouble(2) == 0.0)
    assert(uni.getDouble(3) == 0.5) // top-1 conv of 2 holds half
    val skew = SftPrep.convConcentration(t(Seq(1, 1, 1, 1, 6)))
      .collect().head
    assert(skew.getLong(0) == 5L && skew.getLong(1) == 10L)
    assert(skew.getDouble(2) == 0.4)  // exact rank-sum gini
    assert(skew.getDouble(3) == 0.6)  // the one mega-conv's share
    assert(skew.getDouble(4) == 0.6)
  }
}
