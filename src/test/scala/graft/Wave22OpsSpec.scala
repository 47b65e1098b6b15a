package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, Dedup, Similarity}

/** Behavior specs for the twenty-second-wave operators (q136–q138):
  * embedding-batch centroid drift, Heaps'-law vocabulary-growth fit,
  * and dedup-aware effective token mass. */
class Wave22OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("batch centroid drift: known centroids, adjacent cosine") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)), // batch 0 → [1, 0]
      (2L, Array(0f, 1f)), (3L, Array(0f, 1f)), // batch 1 → [0, 1]
      (4L, Array(1f, 1f)), (5L, Array(1f, 1f))) // batch 2 → [1, 1]
      .toDF("vec_id", "embedding")
    val out = Similarity.batchCentroidDrift(e, batchSize = 2).collect()
    assert(out.length == 2) // batch 0 has no predecessor
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
    assert(out(0).getDouble(2) == 0.0) // orthogonal flip
    assert(out(1).getLong(0) == 2L)
    assert(out(1).getDouble(2) == 0.707107) // cos([0,1],[1,1])
  }

  test("heaps fit: exact two-point power law; degenerate source → 0") {
    import spark.implicits._
    // s1: (4 tokens, 4 types) and (16 tokens, 8 types) →
    // β = ln2/ln4 = 0.5, K = 2, r² = 1 (two points are collinear)
    val docs = Seq(
      (1L, "s1", "a b c d"),
      (2L, "s1", "a a b b c c d d e e f f g g h h"),
      // s2: zero token-count variance → all-zero row, not null
      (3L, "s2", "a b"),
      (4L, "s2", "c d"))
      .toDF("doc_id", "source", "text")
    val out = CorpusStats.heapsFit(docs).collect()
    assert(out.length == 2)
    val s1 = out(0)
    assert(s1.getString(0) == "s1" && s1.getLong(1) == 2L)
    assert(s1.getDouble(2) == 0.5 && s1.getDouble(3) == 2.0)
    assert(s1.getDouble(4) == 1.0)
    val s2 = out(1)
    assert(s2.getLong(1) == 2L)
    assert(s2.getDouble(2) == 0.0 && s2.getDouble(3) == 0.0 &&
      s2.getDouble(4) == 0.0)
  }

  test("effective tokens: dup pair halves its mass, singleton whole") {
    import spark.implicits._
    val dup = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, "s1", dup),
      (2L, "s1", dup), // exact near-dup of doc 1 → cluster of 2
      (3L, "s2", "completely different words here now"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.effectiveTokens(docs).collect()
    assert(out.length == 2)
    val s1 = out(0)
    assert(s1.getString(0) == "s1")
    assert(s1.getLong(1) == 2L && s1.getLong(2) == 2L)
    assert(s1.getLong(3) == 18L) // 9 + 9 raw tokens
    assert(s1.getDouble(4) == 9.0) // 4.5 + 4.5 effective
    assert(s1.getDouble(5) == 2.0) // inflation = raw / effective
    val s2 = out(1)
    assert(s2.getLong(1) == 1L && s2.getLong(2) == 0L)
    assert(s2.getLong(3) == 5L)
    assert(s2.getDouble(4) == 5.0 && s2.getDouble(5) == 1.0)
  }
}
