package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, SftPrep, TextAnalysis}

/** Behavior specs for the twenty-eighth-wave operators (q154–q156):
  * refusal-by-intent, selection curve, bigram entropy rate. */
class Wave28OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("refusal by intent: conv-grain attribution through the router") {
    import spark.implicits._
    val t = Seq(
      // troubleshooting conv WITH a refusal
      ("A", 0, "user", "error in my job"),
      ("A", 1, "assistant", "I cannot help with that"),
      // troubleshooting conv WITHOUT
      ("B", 0, "user", "error again"),
      ("B", 1, "assistant", "here is the fix"),
      // navigational conv, no refusal (refusing USER text must not count)
      ("C", 0, "user", "view the failed page"),
      ("C", 1, "assistant", "sure"),
      // no user turn at all
      ("D", 0, "assistant", "hello"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.refusalByIntent(t).collect()
    val m = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m("troubleshooting") == ((2L, 1L, 0.5)))
    assert(m("navigational") == ((1L, 0L, 0.0)))
    assert(m("no_user") == ((1L, 0L, 0.0)))
    assert(out.map(_.getString(0)).toSeq == m.keys.toSeq.sorted)
  }

  test("selection curve: descending cut, cumulative doc/token mass") {
    import spark.implicits._
    // "the and is" scores high (stopword-rich), "zz" low
    val docs = Seq(
      (0L, "the and is", "s0"),
      (1L, "zz", "s0"),
      (2L, "zz", "s0"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.selectionCurve(docs).collect()
    assert(out.length == 2)
    // top bucket: 1 doc, 3 tokens; cutting deeper adds the 2 zz docs
    val top = out(0); val bot = out(1)
    assert(top.getDouble(0) > bot.getDouble(0))
    assert(top.getLong(1) == 1L && top.getLong(2) == 3L)
    assert(top.getLong(3) == 1L && top.getLong(4) == 3L)
    assert(top.getDouble(5) == 0.333333 && top.getDouble(6) == 0.6)
    assert(bot.getLong(3) == 3L && bot.getLong(4) == 5L)
    assert(bot.getDouble(5) == 1.0 && bot.getDouble(6) == 1.0)
  }

  test("bigram entropy: deterministic source 0, uniform source ln 2") {
    import spark.implicits._
    val docs = Seq(
      // every "a" is followed by "b": H = 0, perplexity 1
      (0L, "a b a b a b", "det"),
      // "x" followed by "y" or "z" equally: H = ln 2
      (1L, "x y x z x y x z", "mix"))
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.bigramEntropyRate(docs).collect()
    val m = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val det = m("det") // pairs: (a,b)x3, (b,a)x2 — all deterministic
    assert(det._1 == 2L && det._2 == 5L)
    assert(det._3 == 0.0 && det._4 == 1.0)
    val mix = m("mix") // (x,y)2 (x,z)2 (y,x)2 (z,x)1: H = 4/7·ln2
    assert(mix._1 == 4L && mix._2 == 7L)
    assert(mix._3 == 0.396084) // round(4.0/7*ln(2), 6)
  }
}
