package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, TextAnalysis}

/** Behavior specs for the thirtieth-wave operators (q160–q162):
  * cosine sweep, hamming sweep, k-anonymity cells. */
class Wave30OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cosine sweep: cumulative counts decrease as threshold rises") {
    import spark.implicits._
    // two identical vectors (cos 1.0) and one orthogonal-ish
    val embs = Seq(
      (0L, Array.fill(64)(1f)),
      (1L, Array.fill(64)(1f)),
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.cosineThresholdSweep(embs).collect()
    assert(out.length == 9)
    assert(out.map(_.getDouble(0)).toSeq == (1 to 9).map(_ / 10.0))
    // the identical pair survives every threshold
    assert(out.forall(_.getLong(1) >= 1L))
    val counts = out.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(out.last.getLong(1) == 1L && out.last.getDouble(2) == 1.0)
  }

  test("hamming sweep: identical docs at h=0, cumulative monotone") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"), // identical → hamming 0
      (2L, "alpha beta gamma epsilon zeta"))
      .toDF("doc_id", "text")
    val out = Dedup.hammingThresholdSweep(docs).collect()
    assert(out.length == 8)
    assert(out.map(_.getInt(0)).toSeq == (0 to 7))
    assert(out.head.getLong(1) >= 1L) // the identical pair at h=0
    val counts = out.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a <= b })
    assert(out.last.getDouble(2) == 1.0)
  }

  test("k-anonymity: small cells flagged, buckets are integer div") {
    import spark.implicits._
    val docs = (0 until 6).map(i =>
      (i.toLong, "t", "en", "srcA", 120L)) ++ Seq(
      (6L, "t", "ja", "srcA", 120L), // lone ja doc → at risk
      (7L, "t", "en", "srcA", 170L)) // different bucket → at risk
    val out = TextAnalysis.kAnonymityCells(
      docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect()
    assert(out.length == 3)
    val m = out.map(r => (r.getString(0), r.getString(1),
      r.getLong(2)) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(m(("srcA", "en", 2L)) == ((6L, false)))
    assert(m(("srcA", "ja", 2L)) == ((1L, true)))
    assert(m(("srcA", "en", 3L)) == ((1L, true)))
  }
}
