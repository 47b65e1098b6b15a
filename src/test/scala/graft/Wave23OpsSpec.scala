package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, Dedup}

/** Behavior specs for the twenty-third-wave operators (q139–q141):
  * PMI collocations, Jaccard threshold sweep, dedup-aware planner. */
class Wave23OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pmi collocations: minCount gate, exact PMI value") {
    import spark.implicits._
    val docs = Seq(
      (1L, "new york new york new york new york new york"),
      (2L, "a b"))
      .toDF("doc_id", "text")
    // totals: 12 unigrams, 10 bigrams; "new york"×5 passes minCount,
    // "york new"×4 and "a b"×1 do not
    val out = CorpusStats.pmiCollocations(docs).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "new york")
    assert(r.getLong(1) == 5L && r.getLong(2) == 5L && r.getLong(3) == 5L)
    val expected = BigDecimal(
      math.log((5.0 / 10) / ((5.0 / 12) * (5.0 / 12))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == expected)
  }

  test("jaccard sweep: suffix counts over exact micro-buckets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"), // {abc,bcd} vs {abc,bce}: jaccard 1/3 → band 3
      (2L, "a b c e"),
      (3L, "p q r s t u"), // identical pair: jaccard 1.0 → band 10
      (4L, "p q r s t u"))
      .toDF("doc_id", "text")
    val out = Dedup.jaccardThresholdSweep(docs).collect()
    assert(out.length == 9)
    val byT = out.map(r =>
      (math.round(r.getDouble(0) * 10).toInt,
        (r.getLong(1), r.getDouble(2)))).toMap
    (1 to 3).foreach(t => assert(byT(t) == (2L, 1.0)))
    (4 to 9).foreach(t => assert(byT(t) == (1L, 0.5)))
  }

  test("dedup-aware plan: dup-heavy source needs more effective epochs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "src0", "w x y z"), // near-dup pair → cluster of 2
      (2L, "src0", "w x y z"),
      (3L, "src1", "m n o p q r"))
      .toDF("doc_id", "source", "text")
    val out = CorpusStats.dedupAwarePlan(docs, budgetTokens = 20L)
      .collect()
    assert(out.length == 2)
    val s0 = out(0)
    assert(s0.getString(0) == "src0" && s0.getLong(1) == 2L)
    assert(s0.getLong(2) == 8L) // raw supply
    assert(s0.getLong(3) == 4000000L) // micro effective: 2×(4e6 / 2)
    assert(s0.getLong(4) == 10L) // uniform quota of 20
    assert(s0.getLong(5) == 2L && s0.getLong(6) == 3L) // raw vs eff
    assert(s0.getBoolean(7)) // the dup penalty bit
    val s1 = out(1)
    assert(s1.getLong(2) == 6L && s1.getLong(3) == 6000000L)
    assert(s1.getLong(5) == 2L && s1.getLong(6) == 2L)
    assert(!s1.getBoolean(7))
  }
}
