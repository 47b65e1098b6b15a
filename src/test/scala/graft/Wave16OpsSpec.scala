package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SftPrep

/** Behavior specs for the sixteenth-wave operators (q118–q120):
  * preference-pair mining, context-window trimming, and
  * tool-reliability attribution. The DuckDB oracles pin cross-engine
  * parity; these pin the SEMANTICS on crafted fixtures. */
class Wave16OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("preference pairs: run detection, chosen/rejected, filters") {
    import spark.implicits._
    val t = Seq(
      // conv A: user-prompted regeneration run of 2 → one pair
      ("A", 0, "user", "ask one"),
      ("A", 1, "assistant", "short"),
      ("A", 2, "assistant", "a much longer answer"),
      ("A", 3, "user", "next"),
      ("A", 4, "assistant", "solo"), // run of 1: filtered
      // conv B: assistant run at conversation start (no prompt) and a
      // system-prompted run — both filtered
      ("B", 0, "assistant", "cold open"),
      ("B", 1, "assistant", "cold open 2"),
      ("B", 2, "system", "sys"),
      ("B", 3, "assistant", "after sys"),
      ("B", 4, "assistant", "after sys 2"),
      // conv C: equal-length candidates → chosen = earliest,
      // rejected = latest
      ("C", 0, "user", "tie"),
      ("C", 1, "assistant", "aaaa"),
      ("C", 2, "assistant", "bbbb"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.preferencePairs(t).collect()
    assert(out.length == 2)
    val a = out(0)
    assert(a.getString(0) == "A" && a.getInt(1) == 0)
    assert(a.getString(2) == md5Of("ask one"))
    assert(a.getLong(3) == 2L)
    assert(a.getString(4) == md5Of("a much longer answer"))
    assert(a.getLong(5) == 20L)
    assert(a.getString(6) == md5Of("short") && a.getLong(7) == 5L)
    val c = out(1)
    assert(c.getString(0) == "C")
    assert(c.getString(4) == md5Of("aaaa")) // tie → earliest chosen
    assert(c.getString(6) == md5Of("bbbb")) // tie → latest rejected
  }

  test("context trim: suffix keep, drop count, nothing-fits conv") {
    import spark.implicits._
    val t = Seq(
      // cum from end: t3=1, t2=3, t1=5, t0=8 → budget 5 keeps t1..t3
      ("A", 0, "user", "w w w"),
      ("A", 1, "assistant", "x x"),
      ("A", 2, "user", "y y"),
      ("A", 3, "assistant", "z"),
      // final turn alone exceeds the budget → conv vanishes
      ("B", 0, "user", "a a a a a a"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.contextTrim(t, budget = 5L).collect()
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("A", 1), ("A", 2), ("A", 3)))
    val first = out(0)
    assert(first.getLong(3) == 2L)            // n_tok
    assert(first.getLong(4) == 5L)            // cum_from_end
    assert(first.getString(5) == md5Of("x x"))
    assert(out.forall(_.getLong(6) == 1L))    // n_dropped = 1 (t0)
  }

  test("tool reliability: error attribution, gap mean, last-turn call") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "tool", "python", "ran", 1000L),
      ("A", 1, "assistant", null, "ERROR in cell", 1600L), // err, gap 600
      ("A", 2, "tool", "python", "ran again", 2000L),
      ("A", 3, "assistant", null, "all good", 2400L),      // ok, gap 400
      ("B", 0, "tool", "browser", "fetched", 10L))         // no next turn
      .toDF("conv_id", "turn_idx", "role", "tool", "text", "ts_ms")
    val out = SftPrep.toolReliability(t).orderBy("tool").collect()
    assert(out.length == 2)
    val br = out(0)
    assert(br.getString(0) == "browser" && br.getLong(1) == 1L)
    assert(br.getLong(2) == 0L && br.getLong(4) == 0L)
    assert(br.isNullAt(5)) // mean gap undefined with no next turn
    val py = out(1)
    assert(py.getString(0) == "python" && py.getLong(1) == 2L)
    assert(py.getLong(2) == 1L)              // one error-follow
    assert(py.getDouble(3) == 0.5)           // error_follow_rate
    assert(py.getLong(4) == 2L)              // n_with_next
    assert(py.getDouble(5) == 500.0)         // (600+400)/2
  }
}
