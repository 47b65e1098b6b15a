package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SftPrep

/** Behavior specs for the eleventh-wave SFT-prep operators (q101–q105):
  * pair extraction, role transitions, context-budget truncation, tool
  * chains and canned-response detection. The DuckDB oracles pin
  * cross-engine parity; these pin the SEMANTICS on crafted fixtures. */
class Wave11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("sft pairs: adjacent user→assistant only, ordered context digest") {
    import spark.implicits._
    val t = Seq(
      // conv A: system, user, assistant, user, user, assistant —
      // pairs at turn 1 (ctx = the system turn) and turn 4 (ctx = all
      // four prior turns); the user→user adjacency at 3→4 is NOT a pair
      ("A", 0, "system", "s0"), ("A", 1, "user", "u1"),
      ("A", 2, "assistant", "a2"), ("A", 3, "user", "u3"),
      ("A", 4, "user", "u4"), ("A", 5, "assistant", "a5"),
      // conv B: user opens — empty context digest is md5("")
      ("B", 0, "user", "u0"), ("B", 1, "assistant", "a1"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.sftPairs(t).orderBy("conv_id", "turn_idx")
      .collect()
    assert(out.length == 3)
    val a1 = out(0)
    assert(a1.getString(2) == "u1" && a1.getString(3) == "a2")
    assert(a1.getLong(4) == 1L)
    assert(a1.getString(5) == md5hex("system: s0"))
    val a4 = out(1)
    assert(a4.getString(2) == "u4" && a4.getString(3) == "a5")
    assert(a4.getLong(4) == 4L)
    assert(a4.getString(5) ==
      md5hex("system: s0\nuser: u1\nassistant: a2\nuser: u3"))
    val b0 = out(2)
    assert(b0.getLong(4) == 0L && b0.getString(5) == md5hex(""))
  }

  test("role transitions: counts and conditional probabilities") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user"), ("A", 1, "assistant"), ("A", 2, "user"),
      ("A", 3, "assistant"),
      ("B", 0, "user"), ("B", 1, "assistant"), ("B", 2, "assistant"))
      .toDF("conv_id", "turn_idx", "role")
    val out = SftPrep.roleTransitions(t).orderBy("from_role", "to_role")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("user", "assistant")) == (3L, 1.0))
    assert(out(("assistant", "user")) == (1L, 0.5))
    assert(out(("assistant", "assistant")) == (1L, 0.5))
    assert(out.size == 3) // conv boundaries never produce a transition
  }

  test("context fit: longest suffix within budget; last turn always kept") {
    import spark.implicits._
    val t = Seq(
      // 4 turns × 3 tokens, budget 7 → keep the last two (6 ≤ 7 < 9)
      ("A", 0, "t0 t0 t0"), ("A", 1, "t1 t1 t1"),
      ("A", 2, "t2 t2 t2"), ("A", 3, "t3 t3 t3"),
      // single overflowing turn: kept anyway (pos_from_end = 1)
      ("B", 0, "w w w w w w w w w w"))
      .toDF("conv_id", "turn_idx", "text")
    val out = SftPrep.contextFit(t, budgetTokens = 7L)
      .orderBy("conv_id").collect()
    val a = out(0)
    assert(a.getLong(1) == 4L && a.getLong(2) == 2L) // n_turns, n_kept
    assert(a.getLong(3) == 6L) // kept_tokens
    assert(a.getString(4) == md5hex("t2 t2 t2\nt3 t3 t3"))
    val b = out(1)
    assert(b.getLong(2) == 1L && b.getLong(3) == 10L)
  }

  test("tool chains: non-tool turns between calls do not break the chain") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", None), ("A", 1, "tool", Some("browser")),
      ("A", 2, "assistant", None), ("A", 3, "tool", Some("python")),
      ("A", 4, "user", None), ("A", 5, "tool", Some("browser")),
      ("B", 0, "tool", Some("python"))) // lone call: no chain
      .toDF("conv_id", "turn_idx", "role", "tool")
    val out = SftPrep.toolChains(t)
      .orderBy("tool_a", "tool_b").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("browser", "python") -> 1L,
      ("python", "browser") -> 1L))
  }

  test("repeat report: adjacent same-role exact repeats and uniqueness") {
    import spark.implicits._
    val t = Seq(
      // A: a→a repeat at turns 1→2 (same role+text); the same text at
      // turn 4 is NOT adjacent; u "x" at turn 3 is same text but
      // different role than turn 2 → not a repeat
      ("A", 0, "user", "q"), ("A", 1, "assistant", "x"),
      ("A", 2, "assistant", "x"), ("A", 3, "user", "x"),
      ("A", 4, "assistant", "x"),
      ("B", 0, "user", "hello")) // single turn: 0 repeats, uniqueness 1
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.repeatReport(t).orderBy("conv_id").collect()
    val a = out(0)
    assert(a.getLong(1) == 5L && a.getLong(2) == 1L) // n_turns, repeats
    assert(a.getLong(3) == 2L) // distinct texts: q, x
    assert(a.getDouble(4) == 0.4)
    val b = out(1)
    assert(b.getLong(2) == 0L && b.getDouble(4) == 1.0)
  }

  test("daily volume: bounded day rollup with cumulative share") {
    import spark.implicits._
    val day = 86400000L
    val t = Seq(
      ("A", 0L), ("A", 1000L), ("B", day + 1), // day 0: 2 turns; day 1: 1
      ("A", 3 * day), ("B", 3 * day + 5), ("C", 3 * day + 9)) // day 3: 3
      .toDF("conv_id", "ts_ms")
    val out = graft.ops.CorpusStats.dailyVolume(t).orderBy("day_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 2L, 0.333333), // two A turns → one conv
      (1L, 1L, 1L, 3L, 0.5),
      (3L, 3L, 3L, 6L, 1.0)))
  }

  test("position curve: exact integer deciles, mean and median tokens") {
    import spark.implicits._
    // one conv, 5 turns → deciles 0,2,4,6,8; tokens 1..5
    val t = Seq(
      ("A", 0, "u", "t"), ("A", 1, "u", "t t"), ("A", 2, "u", "t t t"),
      ("A", 3, "u", "t t t t"), ("A", 4, "u", "t t t t t"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.positionCurve(t).orderBy("pos_decile").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    assert(out.map(_.getDouble(4)).toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
  }

  test("embedding hygiene: zero, NaN and wrong-dim vectors counted") {
    import spark.implicits._
    val e = Seq(
      (0, Array(3.0f, 4.0f)),              // norm 5
      (0, Array(0.0f, 0.0f)),              // zero vector
      (0, Array(1.0f, 0.0f, 0.0f)),        // wrong dim (expected 2)
      (1, Array(Float.NaN, 1.0f)),         // non-finite norm²
      (1, Array(0.6f, 0.8f)))              // norm 1
      .toDF("label", "embedding")
    val out = graft.ops.Similarity.embeddingHygiene(e, expectedDim = 2)
      .orderBy("label").collect()
    val l0 = out(0)
    assert(l0.getLong(1) == 3L && l0.getLong(2) == 1L) // n_vecs, bad dim
    assert(l0.getLong(3) == 1L && l0.getLong(4) == 0L) // zero, nonfinite
    assert(l0.getDouble(5) == 0.0 && l0.getDouble(6) == 5.0)
    val l1 = out(1)
    assert(l1.getLong(3) == 0L && l1.getLong(4) == 1L)
  }

  test("role vocab overlap: flags, shared count and jaccard") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "alpha beta"),
      ("A", 1, "assistant", "beta gamma delta"),
      ("A", 2, "system", "omega"), // excluded role
      ("B", 0, "user", "alpha  epsilon")) // double space → empty token dropped
      .toDF("conv_id", "turn_idx", "role", "text")
    val r = graft.ops.SftPrep
      .roleVocabOverlap(t, "user", "assistant").collect()(0)
    assert(r.getLong(0) == 3L) // user: alpha beta epsilon
    assert(r.getLong(1) == 3L) // assistant: beta gamma delta
    assert(r.getLong(2) == 1L) // shared: beta
    assert(r.getLong(3) == 5L) // union
    assert(r.getDouble(4) == 0.2)
  }

  test("conv dedup: identical ordered turn sequences share a digest") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "hi"), ("A", 1, "assistant", "yo"),
      ("B", 0, "user", "hi"), ("B", 1, "assistant", "yo"), // dup of A
      ("C", 0, "assistant", "hi"), ("C", 1, "user", "yo")) // roles differ
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = graft.ops.SftPrep.convDigestDups(t).orderBy("conv_id")
      .collect()
    assert(out(0).getString(2) == out(1).getString(2))
    assert(out(0).getLong(3) == 2L && out(1).getLong(3) == 2L)
    assert(out(2).getString(2) != out(0).getString(2))
    assert(out(2).getLong(3) == 1L)
    assert(out(0).getString(2) == md5hex("user: hi\nassistant: yo"))
  }

  test("canned responses: repeats ≥ minUses, share of all assistant turns") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "assistant", "ok"), ("A", 1, "assistant", "hi"),
      ("B", 0, "assistant", "ok"), ("B", 1, "assistant", "ok"),
      ("B", 2, "user", "ok")) // non-assistant: excluded from total
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.cannedResponses(t, minUses = 2L, topN = 20)
      .collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == md5hex("ok"))
    assert(out(0).getLong(1) == 3L) // n_uses
    assert(out(0).getLong(2) == 2L) // n_convs
    assert(out(0).getDouble(3) == 0.75) // 3 of 4 assistant turns
  }
}
