package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, SftPrep}

/** Behavior specs for the eighteenth-wave operators (q124–q126):
  * loss-mask spans, sliding dialogue windows, and the mixture-plan
  * executor. The DuckDB oracles pin cross-engine parity; these pin
  * the SEMANTICS on crafted fixtures. */
class Wave18OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("loss mask: header+text token spans, contiguity, mask flags") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", "hi there"),      // 1 + 2 = 3 → [0, 3)
      ("A", 1, "assistant", "ok"),       // 1 + 1 = 2 → [3, 5)
      ("A", 2, "tool", "x y z"),         // 1 + 3 = 4 → [5, 9)
      ("B", 0, "assistant", "a"))        // [0, 2)
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.lossMask(t).collect()
    assert(out.map(r => (r.getString(0), r.getLong(4), r.getLong(5)))
      .toSeq == Seq(
        ("A", 0L, 3L), ("A", 3L, 5L), ("A", 5L, 9L), ("B", 0L, 2L)))
    assert(out.map(_.getLong(6)).toSeq == Seq(0L, 1L, 0L, 1L))
    // spans tile the rendered stream: each start = previous end
    val a = out.filter(_.getString(0) == "A")
    assert(a.sliding(2).forall(p => p(0).getLong(5) == p(1).getLong(4)))
  }

  test("dialogue windows: ceil count, overlap, short-conv window") {
    import spark.implicits._
    def conv(id: String, n: Int) =
      (0 until n).map(i => (id, i, "user", "x"))
    val t = (conv("A", 12) ++ conv("B", 3) ++ conv("C", 9))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.dialogueWindows(t, winTurns = 8, stride = 4)
      .collect()
    val rows = out.map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(rows == Seq(
      // n=12: 1 + ceil(4/4) = 2 windows, tail covered, overlap 4
      ("A", 0L, 0L, 8L, 2L), ("A", 1L, 4L, 12L, 2L),
      // n=3 < 8: exactly one window [0, n)
      ("B", 0L, 0L, 3L, 1L),
      // n=9: 1 + ceil(1/4) = 2 windows; last clipped to n
      ("C", 0L, 0L, 8L, 2L), ("C", 1L, 4L, 9L, 2L)))
  }

  test("mixture apply: ppm cap, md5-bucket membership, no oversample") {
    import spark.implicits._
    // budget 25, 3 sources (plan: src0 quota 9/avail 4 → capped 1e6;
    // src1 quota 8/avail 16 → 500000 ppm; src2 quota 8/avail 8 → 1e6)
    val docs = Seq(
      (1L, "src0", "a b c d"),
      (2L, "src1", "a b c d e f g h"),
      (3L, "src1", "a b c d e f g h"),
      (4L, "src2", "a b c d e f g h"))
      .toDF("doc_id", "source", "text")
    val out = CorpusStats.mixturePlanApply(docs, budgetTokens = 25L)
      .collect()
    def bucket(id: Long): Int = Integer.parseInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 3), 16)
    val ppm = Map("src0" -> 1000000L, "src1" -> 500000L,
      "src2" -> 1000000L)
    val expected = Seq((1L, "src0"), (2L, "src1"), (3L, "src1"),
      (4L, "src2")).filter { case (id, src) =>
        bucket(id) < ppm(src) * 4096 / 1000000 }
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq == expected)
    assert(out.forall(r => r.getLong(2) == ppm(r.getString(1))))
    // rate-1e6 sources keep EVERY doc (threshold 4096 > any bucket)
    assert(out.count(_.getString(1) == "src0") == 1)
    assert(out.count(_.getString(1) == "src2") == 1)
  }
}
