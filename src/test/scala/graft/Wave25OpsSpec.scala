package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SftPrep

/** Behavior specs for the twenty-fifth-wave operators (q145–q147):
  * conversation outcome, topic drift, verbosity slope. */
class Wave25OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("conversation outcome: last role routes the triage class") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "q"), ("A", 1, "assistant", "answer!"),
      ("B", 0, "user", "q"), ("B", 1, "assistant", "a"),
      ("B", 2, "user", "follow-up nobody answered"),
      ("C", 0, "user", "q"), ("C", 1, "tool", "raw result"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.conversationOutcome(t).collect()
    assert(out.map(_.getString(5)).toSeq ==
      Seq("answered", "abandoned", "tool_dangling"))
    val a = out(0)
    assert(a.getLong(1) == 2L && a.getInt(2) == 1 &&
      a.getString(3) == "assistant" && a.getLong(4) == 7L)
  }

  test("topic drift: first-vs-last user token jaccard") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "alpha beta gamma"),
      ("A", 1, "assistant", "x"),
      ("A", 2, "user", "alpha beta gamma"), // same ask → 1.0
      ("B", 0, "user", "alpha beta"),
      ("B", 1, "assistant", "x"),
      ("B", 2, "user", "delta epsilon"), // disjoint → 0.0, drifted
      ("C", 0, "user", "only one user turn")) // excluded
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.topicDrift(t).collect()
    assert(out.length == 2)
    assert(out(0).getDouble(4) == 1.0 && !out(0).getBoolean(5))
    assert(out(0).getInt(2) == 0 && out(0).getInt(3) == 2)
    assert(out(1).getDouble(4) == 0.0 && out(1).getBoolean(5))
  }

  test("verbosity slope: exact two-point regression, short convs out") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "q"),
      ("A", 1, "assistant", "x" * 10),
      ("A", 2, "user", "more"),
      ("A", 3, "assistant", "x" * 30), // slope (30-10)/(3-1) = 10
      ("B", 0, "user", "q"),
      ("B", 1, "assistant", "solo")) // one point → excluded
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.verbositySlope(t).collect()
    assert(out.length == 1)
    val a = out(0)
    assert(a.getString(0) == "A" && a.getLong(1) == 2L)
    assert(a.getDouble(2) == 10.0 && a.getDouble(3) == 20.0)
    assert(a.getBoolean(4))
  }
}
