package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, SftPrep}

/** Behavior specs for the seventeenth-wave operators (q121–q123):
  * degenerate-loop collapse, the exact-integer mixture planner, and
  * the SFT chat-template render. The DuckDB oracles pin cross-engine
  * parity; these pin the SEMANTICS on crafted fixtures. */
class Wave17OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("loop collapse: run-of-k keeps first, re-pack, collapse count") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "hi"),
      ("A", 1, "assistant", "yes"),
      ("A", 2, "assistant", "yes"), // dup of 1 → dropped
      ("A", 3, "assistant", "yes"), // dup of 2 → dropped (run keeps 1st)
      ("A", 4, "user", "yes"),      // same text, role flips → kept
      ("A", 5, "user", "yes"),      // dup of 4 → dropped
      ("B", 0, "user", "a"),
      ("B", 1, "assistant", "a"))   // role differs → kept
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.loopCollapse(t).collect()
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      .toSeq == Seq(
        ("A", 0, 0), ("A", 1, 1), ("A", 4, 2),
        ("B", 0, 0), ("B", 1, 1)))
    assert(out(2).getString(4) == md5Of("yes"))
    assert(out.filter(_.getString(0) == "A").forall(_.getLong(5) == 3L))
    assert(out.filter(_.getString(0) == "B").forall(_.getLong(5) == 0L))
  }

  test("mixture plan: remainder quota, epochs, exact ppm rates") {
    import spark.implicits._
    val docs = Seq(
      (1L, "src0", "a b c d"),                    // 4 tok
      (2L, "src1", "a b c d e f g h"),            // 8 tok
      (3L, "src1", "a b c d e f g h"),            // 8 tok
      (4L, "src2", "a b c d e f g h"))            // 8 tok
      .toDF("doc_id", "source", "text")
    // budget 25 over 3 sources: base 8, remainder 1 → src0 gets 9
    val out = CorpusStats.mixturePlan(docs, budgetTokens = 25L).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("src0", "src1", "src2"))
    val Seq(s0, s1, s2) = out.toSeq
    // src0: avail 4, quota 9 → oversample: 3 epochs, 2.25e6 ppm
    assert(s0.getLong(2) == 4L && s0.getLong(3) == 9L)
    assert(s0.getLong(4) == 4L && s0.getLong(5) == 5L)
    assert(s0.getLong(6) == 3L && s0.getLong(7) == 2250000L)
    // src1: avail 16, quota 8 → undersample at exactly half
    assert(s1.getLong(2) == 16L && s1.getLong(3) == 8L)
    assert(s1.getLong(4) == 8L && s1.getLong(5) == 0L)
    assert(s1.getLong(6) == 1L && s1.getLong(7) == 500000L)
    // src2: avail 8, quota 8 → exact fit, rate exactly 1e6
    assert(s2.getLong(6) == 1L && s2.getLong(7) == 1000000L)
  }

  test("sft render: template bytes, token count, order independence") {
    import spark.implicits._
    val t = Seq(
      // deliberately out of turn order — the render must not care
      ("A", 1, "assistant", "ok"),
      ("A", 0, "user", "hi there"),
      ("B", 0, "system", "sys"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.sftRender(t).collect()
    assert(out.length == 2)
    val a = out(0)
    assert(a.getString(0) == "A" && a.getLong(1) == 2L)
    // <|user|>\nhi there\n<|assistant|>\nok → 5 whitespace tokens
    assert(a.getLong(2) == 5L)
    assert(a.getString(3) ==
      md5Of("<|user|>\nhi there\n<|assistant|>\nok"))
    val b = out(1)
    assert(b.getLong(1) == 1L && b.getLong(2) == 2L)
    assert(b.getString(3) == md5Of("<|system|>\nsys"))
  }
}
