package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SftPrep

/** Behavior specs for the fifteenth-wave operators (q115–q117):
  * prompt-template mining, refusal/failure-marker incidence, and
  * padding-efficiency bucketing. The DuckDB oracles pin cross-engine
  * parity; these pin the SEMANTICS on crafted fixtures. */
class Wave13OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("prompt templates: skeleton collapse, minUses filter, ordering") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "Click 89 now"),
      ("A", 2, "user", "click   7 NOW"),   // same skeleton as above
      ("B", 0, "user", "click 123 now"),   // same skeleton, new conv
      ("B", 2, "user", "one-off prompt"),  // n_uses 1: filtered
      ("B", 4, "assistant", "click 5 now")) // not user: ignored
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.promptTemplates(t, minUses = 2L, topN = 10).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(1) == "click # now")
    assert(r.getLong(2) == 3L) // n_uses
    assert(r.getLong(3) == 2L) // n_convs distinct
  }

  test("refusal report: EN+JA markers, lang key, exact rate") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "I cannot do this"), // user: ignored
      ("A", 1, "assistant", "the answer is the one of the best and a fine one to share"),
      ("A", 2, "assistant", "I'm sorry, but the request is one the policy and the rules of the site and a law to refuse"),
      ("B", 0, "assistant", "申し訳ありませんが、できません。"),
      ("B", 1, "assistant", "zzz qqq"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.refusalReport(t).orderBy("lang").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("cjk", "en", "latin_other"))
    val cjk = out(0)
    assert(cjk.getLong(1) == 1L && cjk.getLong(2) == 1L &&
      cjk.getDouble(4) == 1.0)
    val en = out(1)
    assert(en.getLong(1) == 2L && en.getLong(2) == 1L &&
      en.getLong(3) == 1L && en.getDouble(4) == 0.5)
    val lo = out(2)
    assert(lo.getLong(2) == 0L && lo.getDouble(4) == 0.0)
  }

  test("padding report: exact power-of-two boundaries and waste math") {
    import spark.implicits._
    // conv A: 16 tokens exactly → bucket 16, zero padding;
    // conv B: 17 tokens → bucket 32, 15 padded;
    // conv C: 1 token → bucket 16.
    val t = Seq(
      ("A", 0, "user", (1 to 16).map(i => s"t$i").mkString(" ")),
      ("B", 0, "user", (1 to 9).map(i => s"t$i").mkString(" ")),
      ("B", 1, "assistant", (1 to 8).map(i => s"t$i").mkString(" ")),
      ("C", 0, "user", "solo"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.paddingReport(t).orderBy("bucket_cap").collect()
    assert(out.length == 2)
    val b16 = out(0)
    assert(b16.getLong(0) == 16L && b16.getLong(1) == 2L &&
      b16.getLong(2) == 17L && b16.getLong(3) == 15L)
    assert(b16.getDouble(4) == math.rint(15.0 / 32.0 * 1e6) / 1e6)
    val b32 = out(1)
    assert(b32.getLong(0) == 32L && b32.getLong(1) == 1L &&
      b32.getLong(2) == 17L && b32.getLong(3) == 15L)
  }
}
