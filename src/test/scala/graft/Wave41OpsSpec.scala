package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SftPrep

/** Behavior specs for the forty-first-wave operators (q194–q196):
  * duplicate-conversation clusters, conversation language mix,
  * user/assistant token-balance histogram. */
class Wave41OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("duplicate conversations: verbatim replays cluster, order counts") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "hi"), ("A", 1, "there"),
      ("B", 0, "hi"), ("B", 1, "there"),   // verbatim replay of A
      ("C", 0, "hithere"),                 // same bytes, ONE turn: no
      ("D", 0, "there"), ("D", 1, "hi"))   // same turns, other order
      .toDF("conv_id", "turn_idx", "text")
    val out = SftPrep.duplicateConversations(t).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 2L)           // A and B only
    assert(out.head.getString(2) == "A")        // min conv_id
  }

  test("conv lang mix: majority + mixed flag per conversation") {
    import spark.implicits._
    val en = "the cat and the dog went to the house and it is fine"
    val cjk = "こんにちは世界"
    val t = Seq(
      ("A", 0, en), ("A", 1, en),          // pure en
      ("B", 0, en), ("B", 1, cjk), ("B", 2, en), // mixed, majority en
      ("C", 0, cjk))                        // pure cjk
      .toDF("conv_id", "turn_idx", "text")
    val out = SftPrep.convLangMix(t).collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("en", false) -> 1L, ("en", true) -> 1L, ("cjk", false) -> 1L))
  }

  test("role balance: integer decile buckets and shares") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "one two three"), ("A", 1, "assistant", "ok"),
      // A: u=3 a=1 → (30 div 4) = 7
      ("B", 0, "user", "hi"), ("B", 1, "assistant", "a b c d e f g h"),
      // B: u=1 a=8 → (10 div 9) = 1
      ("C", 0, "system", "ignored"), ("C", 1, "tool", "ignored too"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.roleBalanceHistogram(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(1L -> ((1L, 0.5)), 7L -> ((1L, 0.5))))
  }
}
