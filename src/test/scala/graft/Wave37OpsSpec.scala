package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Similarity, TextAnalysis}

/** Behavior specs for the thirty-seventh-wave operators (q181–q183):
  * PQ distortion sweep, numeric-token profile, URL-domain scan. */
class Wave37OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pq distortion: non-increasing in m; zero for k >= n") {
    import spark.implicits._
    val embs = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        math.sin(i * 1.9 + d * 0.7).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.pqDistortionSweep(embs,
      ms = Seq(1, 2, 4), codeK = 4, pqIters = 2)
      .collect().sortBy(_.getInt(0))
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 4))
    assert(out.forall(_.getLong(2) == 12L))
    val d = out.map(_.getDouble(3))
    assert(d.forall(_ >= 0.0))
    assert(d(0) >= d(1) && d(1) >= d(2)) // finer sub-spaces, less error
    // codebook as large as the corpus: every vector is its own
    // codeword after enough iterations → near-zero distortion
    val tiny = (0 until 4).map(i =>
      (i.toLong, Array.tabulate(4)(d => (i * 4 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val z = Similarity.pqDistortionSweep(tiny, ms = Seq(1),
      codeK = 4, pqIters = 2).collect().head.getDouble(3)
    assert(z == 0.0)
  }

  test("numeric profile: shares and digit widths per source") {
    import spark.implicits._
    val docs = Seq(
      (0L, "price 100 and 2500 total", "shop"), // 2 numeric of 5
      (1L, "just words here", "prose"),
      (2L, "7 9 11", "shop")) // 3 of 3
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.numericProfile(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // shop: 8 tokens, 5 numeric (digits 3+4+1+1+2 = 11) → 2.2 mean
    assert(out("shop") == ((8L, 5L, 0.625, 2.2)))
    assert(out("prose") == ((3L, 0L, 0.0, 0.0)))
  }

  test("domain scan: hosts extracted, ranked, doc-spread counted") {
    import spark.implicits._
    val docs = Seq(
      (0L, "read https://a.example.com/x and https://b.example.org/y"),
      (1L, "again https://a.example.com/z here"),
      (2L, "no links at all")).toDF("doc_id", "text")
    val out = TextAnalysis.domainScan(docs, topN = 10).collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "a.example.com")
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 2L)
    assert(out(1).getString(0) == "b.example.org")
  }
}
