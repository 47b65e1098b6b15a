package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, TextAnalysis}

/** Behavior specs for the thirty-second-wave operators (q166–q168):
  * source MinHash similarity, filter-agreement Venn, dup-growth
  * curve. */
class Wave32OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("source minhash: identical sources 1.0, disjoint sources low") {
    import spark.implicits._
    val same = "the quick brown fox jumps over the lazy dog today"
    val other = "zebra quartz vexing jumbo flock white pangram style"
    val docs = Seq(
      (0L, same, "a"), (1L, same, "b"),
      (2L, other, "c")).toDF("doc_id", "text", "source")
    val out = Dedup.sourceMinhashSim(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getInt(2), r.getDouble(3)))).toMap
    assert(out.size == 3) // 3 unordered source pairs
    assert(out(("a", "b")) == ((8, 1.0))) // identical shingle sets
    assert(out(("a", "c"))._2 < 1.0) // disjoint sets: mins differ
    assert(out(("b", "c"))._1 == out(("a", "c"))._1)
  }

  test("filter agreement: cells match the shipped filters' verdicts") {
    import spark.implicits._
    // mix: a long clean doc (passes gopher+clf), short junk, brace doc
    val clean = Array.fill(20)("the story continues and it is good " +
      "to be here with all of that done.").mkString("\n")
    val docs = Seq(
      (0L, clean, "s"), (1L, clean, "s"),
      (2L, "x { y", "s"), (3L, "!!! ... #", "s"))
      .toDF("doc_id", "text", "source")
    val cells = TextAnalysis.filterAgreement(docs).collect()
    assert(cells.map(_.getLong(3)).sum == 4L) // every doc in one cell
    val shares = cells.map(_.getDouble(4)).sum
    assert(math.abs(shares - 1.0) < 1e-9)
    // cross-check each cell against the three SHIPPED filter outputs
    val c4 = TextAnalysis.c4Filter(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val gp = TextAnalysis.gopherFilter(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(8)).toMap
    val clf = TextAnalysis.qualityClassifier(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val expected = (0L to 3L).groupBy(i => (c4(i), gp(i), clf(i)))
      .view.mapValues(_.size.toLong).toMap
    val got = cells.map(r => ((r.getBoolean(0), r.getBoolean(1),
      r.getBoolean(2)), r.getLong(3))).toMap
    assert(got == expected)
    // n_filters_pass is the popcount of the three booleans
    cells.foreach { r =>
      val n = Seq(r.getBoolean(0), r.getBoolean(1), r.getBoolean(2))
        .count(identity)
      assert(r.getInt(5) == n)
    }
    // the clean doc passes gopher (50+ words, stopwords, no symbols)
    assert(gp(0L))
  }

  test("dup growth: unique prefix flat at 0, dup suffix rises") {
    import spark.implicits._
    // ids 0..49 unique text; 50..99 all the same text
    val docs = (0L until 100L).map { i =>
      val t = if (i < 50) s"unique text number $i" else "the same text"
      (i, t, "s")
    }.toDF("doc_id", "text", "source")
    val out = Dedup.dupGrowthCurve(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.map(_._1).toSeq == (0 until 10))
    assert(out.forall(_._2 == 10L)) // 10 docs per decile
    // deciles 0-4: all unique → dup rate exactly 0
    assert(out.take(5).forall(r => r._3 == 10L && r._6 == 0.0))
    // decile 5 introduces ONE new hash (the shared text)
    assert(out(5)._3 == 1L)
    // deciles 6-9: zero new hashes, rate strictly increasing
    assert(out.drop(6).forall(_._3 == 0L))
    assert(out(9)._4 == 100L && out(9)._5 == 51L)
    assert(out(9)._6 == 0.49)
    assert(out.drop(4).map(_._6).sliding(2).forall(p => p(0) < p(1)))
  }
}
