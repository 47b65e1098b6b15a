package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SftPrep

/** Behavior specs for the fourteenth-wave transcript-hygiene operators
  * (q112–q114): truncated-response detection, conversation language
  * consistency and assistant-echo scoring. The DuckDB oracles pin
  * cross-engine parity; these pin the SEMANTICS on crafted fixtures. */
class Wave12OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("truncation: odd fences and missing terminal punctuation flag") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "hi"),                  // not assistant: ignored
      ("A", 1, "assistant", "done."),          // clean
      ("A", 2, "assistant", "let me think"),   // cut mid-sentence
      ("A", 3, "assistant", "```scala\ncode"), // unclosed fence
      ("A", 4, "assistant", "```a``` ok.  "),  // closed fences, '.' after rtrim
      ("B", 0, "assistant", "それです。"))      // CJK terminal: clean
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.truncationReport(t)
      .orderBy("conv_id", "turn_idx").collect()
    assert(out.length == 2)
    val r2 = out(0) // (A, 2)
    assert(r2.getInt(1) == 2 && r2.getLong(2) == 0L)
    assert(!r2.getBoolean(3) && r2.getBoolean(4))
    val r3 = out(1) // (A, 3)
    assert(r3.getInt(1) == 3 && r3.getLong(2) == 1L)
    assert(r3.getBoolean(3) && r3.getBoolean(4))
  }

  test("conv lang: dominant tie-break, mixed flag, q21 lang classes") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "the cat is on the mat and a dog"), // en
      ("A", 1, "assistant", "こんにちは世界"),             // cjk
      ("B", 0, "user", "zzz qqq xxx"))                     // latin_other
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.convLangReport(t).orderBy("conv_id").collect()
    val a = out(0)
    assert(a.getLong(1) == 2L && a.getLong(2) == 2L)
    assert(a.getString(3) == "cjk") // 1-vs-1 tie → lang asc
    assert(a.getBoolean(4))
    val b = out(1)
    assert(b.getLong(2) == 1L && b.getString(3) == "latin_other")
    assert(!b.getBoolean(4))
  }

  test("echo score: distinct-token containment of response in prompt") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "what is the capital of france"),
      ("A", 1, "assistant", "the capital of france is paris"),
      ("A", 2, "user", "thanks"),
      ("A", 3, "assistant", "welcome"),
      ("B", 0, "assistant", "hi"),  // assistant-first: no pair
      ("B", 1, "user", "ok"),       // trailing user: no pair
      ("C", 0, "user", "x"),
      ("C", 1, "assistant", "  "))  // empty response: ratio 0 via guard
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.echoReport(t)
      .orderBy("conv_id", "turn_idx").collect()
    assert(out.length == 3)
    val p0 = out(0) // parroted answer
    assert(p0.getLong(2) == 6L && p0.getLong(3) == 5L)
    assert(p0.getDouble(4) == 0.833333)
    val p1 = out(1) // disjoint
    assert(p1.getLong(2) == 1L && p1.getLong(3) == 0L)
    assert(p1.getDouble(4) == 0.0)
    val p2 = out(2) // empty response
    assert(p2.getLong(2) == 0L && p2.getDouble(4) == 0.0)
  }
}
