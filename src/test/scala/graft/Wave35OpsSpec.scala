package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, Dedup, SftPrep}

/** Behavior specs for the thirty-fifth-wave operators (q175–q177):
  * correction-by-intent, consecutive-line collapse, cluster-size
  * histogram. */
class Wave35OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("correction by intent: only post-assistant user openers count") {
    import spark.implicits._
    val t = Seq(
      // conv A: user opens with 'error ...' as the FIRST turn — an
      // intent signal, NOT a correction (nothing precedes it)
      ("A", 0, "user", "error during signup"),
      ("A", 1, "assistant", "try clearing the cache"),
      ("A", 2, "user", "wrong, that did nothing"), // correction
      // conv B: same opener, but the follow-up is polite
      ("B", 0, "user", "error during signup"),
      ("B", 1, "assistant", "try clearing the cache"),
      ("B", 2, "user", "view settings worked, thanks"),
      // conv C: 'actually' mid-sentence must NOT fire (startsWith)
      ("C", 0, "user", "purchase a plan"),
      ("C", 1, "assistant", "done"),
      ("C", 2, "user", "it is actually fine"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.correctionByIntent(t).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("troubleshooting") == ((2L, 1L, 0.5)))
    assert(out("transactional") == ((1L, 0L, 0.0)))
  }

  test("line run collapse: runs collapse, non-adjacent dups survive") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a\na\na\nb\na"), // run of 3 collapses; final 'a' survives
      (1L, "x\ny\nz")) // nothing adjacent-equal
      .toDF("doc_id", "text")
    val out = CorpusStats.lineRunCollapse(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(out(0L)._1 == 5L && out(0L)._2 == 3L)
    assert(out(1L) == ((3L, 3L,
      java.security.MessageDigest.getInstance("MD5")
        .digest("x\ny\nz".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)))
    // collapsed doc 0 equals the uniq'd text
    val expect0 = java.security.MessageDigest.getInstance("MD5")
      .digest("a\nb\na".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0L)._3 == expect0)
  }

  test("cluster size histogram: sizes + singleton mass sum to total") {
    import spark.implicits._
    val dup = "the quick brown fox jumps over the lazy dog " * 3
    val docs = Seq(
      (0L, dup), (1L, dup), (2L, dup), // one 3-cluster
      (3L, "completely different text about sbt builds and jvm flags"),
      (4L, "yet another unrelated document mentioning parquet files"))
      .toDF("doc_id", "text")
    val out = Dedup.clusterSizeHistogram(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out(3L) == ((1L, 3L, 0.6)))
    assert(out(1L) == ((2L, 2L, 0.4)))
    assert(out.values.map(_._2).sum == 5L) // doc mass conserved
  }
}
