package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SftPrep, TextAnalysis}

/** Behavior specs for the twenty-first-wave operators (q133–q135):
  * preference-margin calibration, per-document lexical profile, and
  * the ungrounded-numbers audit. */
class Wave21OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("margin report: bands, gate count, candidate-pool mean") {
    import spark.implicits._
    val t = Seq(
      // conv A: regeneration run of 2, margin 4-2=2 → band b1_1_8
      ("A", 0, "user", "q"),
      ("A", 1, "assistant", "aaaa"),
      ("A", 2, "assistant", "aa"),
      // conv B: margin 20-1=19 → band b2_9_32, survives the ≥9 gate
      ("B", 0, "user", "p"),
      ("B", 1, "assistant", "x" * 20),
      ("B", 2, "assistant", "x"),
      // conv C: single assistant turn → no pair at all
      ("C", 0, "user", "r"),
      ("C", 1, "assistant", "solo"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.marginReport(t).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getLong(6))))
      .toMap
    assert(out.size == 2)
    assert(out("b1_1_8") == (1L, 2.0, 2L, 2L, 2.0, 0L))
    assert(out("b2_9_32") == (1L, 19.0, 19L, 19L, 2.0, 1L))
  }

  test("hapax profile: row-local histogram, ttr, burstiness") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c"), // 4 tokens, 3 types, 2 hapax, max freq 2
      (2L, "x")) // degenerate single-token doc
      .toDF("doc_id", "text")
    val out = TextAnalysis.hapaxProfile(docs).collect()
    assert(out.length == 2)
    val r1 = out(0)
    assert(r1.getLong(1) == 4L && r1.getLong(2) == 3L)
    assert(r1.getLong(3) == 2L && r1.getLong(4) == 2L)
    assert(r1.getDouble(5) == 0.75 && r1.getDouble(6) == 0.666667)
    val r2 = out(1)
    assert(r2.getLong(1) == 1L && r2.getLong(2) == 1L)
    assert(r2.getLong(3) == 1L && r2.getLong(4) == 1L)
    assert(r2.getDouble(5) == 1.0 && r2.getDouble(6) == 1.0)
  }

  test("ungrounded numbers: digit-run set difference on the tool edge") {
    import spark.implicits._
    val t = Seq(
      // 42 grounded, 99 fabricated → share 0.5
      ("A", 0, "tool", "search", "result 42 rows 7"),
      ("A", 1, "assistant", null, "there are 42 items, maybe 99"),
      // numberless assistant reply → clean row, share 0
      ("A", 2, "tool", "calc", "sum is 5"),
      ("A", 3, "assistant", null, "done"),
      // user → assistant is NOT a tool edge
      ("B", 0, "user", null, "give me 1 2 3"),
      ("B", 1, "assistant", null, "4 5 6"))
      .toDF("conv_id", "turn_idx", "role", "tool", "text")
    val out = SftPrep.ungroundedNumbers(t).collect()
    assert(out.length == 2)
    val r1 = out(0)
    assert(r1.getString(2) == "search")
    assert(r1.getLong(3) == 2L && r1.getLong(4) == 1L)
    assert(r1.getDouble(5) == 0.5 && r1.getBoolean(6))
    val r2 = out(1)
    assert(r2.getLong(3) == 0L && r2.getLong(4) == 0L)
    assert(r2.getDouble(5) == 0.0 && !r2.getBoolean(6))
  }
}
