package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, Dedup, Similarity}

/** Behavior specs for the twenty-ninth-wave operators (q157–q159):
  * cross-corpus leak, top principal component, vocabulary churn. */
class Wave29OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cross-corpus leak: planted conv span found, boilerplate capped") {
    import spark.implicits._
    val turns = Seq(
      ("c1", 0, "one two three four five six"),
      ("c1", 1, "seven eight nine"),
      ("c2", 0, "totally different words here entirely"))
      .toDF("conv_id", "turn_idx", "text")
    val docs = Seq(
      // doc 0 contains c1's cross-turn span verbatim (leak)
      (0L, "prefix one two three four five six seven eight nine tail"),
      // doc 1 shares nothing
      (1L, "unrelated corpus text about spark jobs running fast"))
      .toDF("doc_id", "text")
    val out = Dedup.crossCorpusLeak(docs, turns, k = 3, minShared = 2,
      dfCap = 50).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(0) == 0L && r.getString(1) == "c1")
    // doc0 has 9 distinct trigrams; 7 come from c1's rendered text
    // (cross-turn trigrams included: "five six seven", "six seven
    // eight")
    assert(r.getLong(2) == 7L && r.getLong(3) == 9L)
    assert(r.getDouble(4) == 0.777778)
  }

  test("top PC: a dominant axis is recovered with its variance share") {
    import spark.implicits._
    // variance 4 on dim 1, tiny on dim 0 → v ≈ e1, share ≈ 1
    val embs = Seq(
      (0L, Array(0.01f, 2f)), (1L, Array(-0.01f, -2f)),
      (2L, Array(0.01f, 2f)), (3L, Array(-0.01f, -2f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.topPrincipalComponent(embs).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(0) == 4L)
    assert(r.getInt(4) == 1) // dominant dim
    assert(math.abs(r.getDouble(1) - 4.0001) < 1e-4) // λ₁ ≈ 4 + ε
    assert(r.getDouble(3) > 0.999) // var share ~ 1
  }

  test("vocab churn: new types only where first seen, cum monotone") {
    import spark.implicits._
    // deciles (nBuckets=2): docs 0-1 → bucket 0, docs 2-3 → bucket 1
    val docs = Seq(
      (0L, "a b", "s"), (1L, "a c", "s"),
      (2L, "a b d", "s"), (3L, "d e", "s"))
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.vocabChurn(docs, nBuckets = 2).collect()
    assert(out.length == 2)
    val d0 = out(0); val d1 = out(1)
    assert(d0.getLong(1) == 3L && d0.getLong(2) == 3L) // a b c all new
    assert(d0.getDouble(3) == 1.0 && d0.getLong(4) == 3L)
    assert(d1.getLong(1) == 4L && d1.getLong(2) == 2L) // d e new
    assert(d1.getDouble(3) == 0.5 && d1.getLong(4) == 5L)
  }
}
