package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, Retrieval, Temporal, TextAnalysis}

/** Behavior specs for the ninth-wave operators (q86–q92): funnel
  * ordering semantics, BM25 / log-odds ranking, n-gram novelty,
  * Efraimidis–Spirakis sampling determinism, mojibake detection. The
  * DuckDB oracles pin cross-engine parity; these pin the SEMANTICS on
  * crafted fixtures the synthetic corpus can't isolate. */
class Wave9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("funnel counts strict-after progression only") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full ordered funnel (plus an ignored noise event)
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      (1L, 150L, "error"),
      // user 2: purchase BEFORE any view — never progresses past view
      (2L, 100L, "purchase"), (2L, 200L, "view"),
      // user 3: click at the SAME ts as view — strict > excludes it
      (3L, 100L, "view"), (3L, 100L, "click"),
      // user 4: view then click, no purchase
      (4L, 50L, "view"), (4L, 60L, "click"))
      .toDF("user_id", "ts_ms", "event_type")
    val out = Temporal.funnel(ev, "user_id", "ts_ms", "event_type",
      Seq("view", "click", "purchase")).orderBy("step_idx").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 2L, 1L))
    assert(out(0).getDouble(3) == 1.0) // first step conv_from_prev
    assert(out(1).getDouble(3) == 0.5) // 2 of 4 clicked after view
    assert(out(2).getDouble(4) == 0.25) // 1 of 4 completed the funnel
  }

  test("bm25 ranks higher-tf docs first; query terms are top-df") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple apple banana"),
      (2L, "apple banana banana banana"),
      (3L, "apple banana cherry cherry"),
      (4L, "apple banana cherry dates"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, nQueryTerms = 2, k = 4,
      minTermLen = 5).collect()
    // df: apple=4, banana=4, cherry=2, dates=1 → queries {apple,banana}
    val terms = out.map(_.getString(0)).toSet
    assert(terms == Set("apple", "banana"))
    val top = out.filter(_.getInt(2) == 1)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top("apple") == 1L)  // tf 3 beats tf 1 at equal doc length
    assert(top("banana") == 2L)
    // scores within a term strictly decrease down the ranking
    val appleScores = out.filter(_.getString(0) == "apple")
      .sortBy(_.getInt(2)).map(_.getDouble(3))
    assert(appleScores.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("log-odds ranks a source-exclusive term most distinctive") {
    import spark.implicits._
    val docs = Seq(
      ("src0", "alpha beta gamma delta"),
      ("src0", "alpha beta gamma zzonly"),
      ("src1", "alpha beta gamma delta"),
      ("src1", "alpha beta gamma delta"))
      .toDF("source", "text")
    val out = Retrieval.logOddsTerms(docs, topN = 1).collect()
    val top = out.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(top("src0") == "zzonly") // occurs ONLY in src0
    // and distinctive terms always score above zero
    assert(out.forall(_.getDouble(3) > 0.0))
  }

  test("ngram novelty: duplicated doc scores 0, unique doc scores 1") {
    import spark.implicits._
    val eight = "a b c d e f g h"
    val docs = Seq(
      (1L, eight), (2L, eight), // exact pair → every window df=2
      (3L, "p q r s t u v w"))  // unique → every window df=1
      .toDF("doc_id", "text")
    val out = CorpusStats.ngramNovelty(docs, k = 8).orderBy("doc_id")
      .collect()
    assert(out.length == 3)
    assert(out(0).getDouble(3) == 0.0)
    assert(out(1).getDouble(3) == 0.0)
    assert(out(2).getDouble(3) == 1.0)
  }

  test("weighted sample reproduces the ES order statistic exactly") {
    import spark.implicits._
    def esKey(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 12), 16)
      math.log((h + 1).toDouble / 281474976710656.0) / w.toDouble
    }
    val docs = (1L to 20L).map(i => (i, i * 10L))
      .toDF("doc_id", "n_chars")
    val out = CorpusStats.weightedSample(docs, "n_chars", n = 5)
      .collect()
    assert(out.length == 5)
    val expected = (1L to 20L).map(i => i -> esKey(i, i * 10L))
      .sortBy { case (id, k) => (-k, id) }.take(5).map(_._1).toSet
    assert(out.map(_.getLong(0)).toSet == expected)
    // zero/negative weights are excluded, deterministically
    val withZero = docs.withColumn("n_chars",
      when(col("doc_id") === 1L, 0L).otherwise(col("n_chars")))
    val out2 = CorpusStats.weightedSample(withZero, "n_chars", n = 20)
      .collect()
    assert(!out2.map(_.getLong(0)).contains(1L))
  }

  test("encoding artifacts: clean text silent, mojibake counted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "perfectly clean ascii text"),
      (2L, "broken caf\u00c3\u00a9 and \u00c2\u00bd and \ufffd\ufffd"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.encodingArtifacts(docs).orderBy("doc_id")
      .collect()
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 0L &&
      out(0).getLong(3) == 0L && !out(0).getBoolean(4))
    assert(out(1).getLong(1) == 1L) // one 'Ã'
    assert(out(1).getLong(2) == 1L) // one 'Â'
    assert(out(1).getLong(3) == 2L) // two replacement chars
    assert(out(1).getBoolean(4))
  }

  test("conv structure invariants hold on the sf corpus") {
    val out = graft.queries.PipelineQueries
      .convStructure(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nTurns = r.getLong(1)
      assert(nTurns > 0)
      assert(r.getString(2) != null && r.getString(3) != null)
      assert(r.getLong(4) <= nTurns - 1)
      if (r.getBoolean(5)) {
        assert(r.getString(2) == "user" && r.getLong(4) == 0L)
      }
    }
  }
}
