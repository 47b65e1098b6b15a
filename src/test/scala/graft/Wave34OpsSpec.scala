package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Behavior specs for the thirty-fourth-wave operators (q172–q174):
  * prefix-duplicate clusters, TwoNN intrinsic dimension, license
  * marker scan. */
class Wave34OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("prefix dups: truncation pair found, exact dups excluded") {
    import spark.implicits._
    val base = "x" * 80
    val docs = Seq(
      (0L, base + " full version with a long tail"),
      (1L, base), // truncated twin: same 64-char prefix, new hash
      (2L, "identical short doc"),
      (3L, "identical short doc"), // exact dup: q30's job, excluded
      (4L, "something else entirely")).toDF("doc_id", "text")
    val out = Dedup.prefixDupReport(docs, prefixLen = 64).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L) // n_docs
    assert(r.getLong(2) == 2L) // n_full_distinct
    assert(r.getLong(3) == 0L) // representative = min doc_id
  }

  test("twonn: colinear corpus is fully discarded (d1 = 0 rule)") {
    import spark.implicits._
    // all vectors on one ray: every cosine rounds to 1.0 → every
    // point hits the discard rule → n_used 0, dim 0
    val embs = (0 until 6).map(i =>
      (i.toLong, Array.tabulate(8)(d => (d + 1f) * (i + 1f))))
      .toDF("vec_id", "embedding")
    val out = Similarity.twoNnDimension(embs, nPlanes = 1, dim = 8)
      .collect().head
    assert(out.getLong(0) == 6L)
    assert(out.getLong(1) == 0L)
    assert(out.getDouble(3) == 0.0)
  }

  test("twonn: spread corpus yields a positive finite estimate") {
    import spark.implicits._
    val embs = (0 until 24).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        math.sin(i * 2.7 + d * 1.3).toFloat +
          (if (d == i % 8) 2f else 0f)))
    }.toDF("vec_id", "embedding")
    val out = Similarity.twoNnDimension(embs, nPlanes = 1, dim = 8)
      .collect().head
    assert(out.getLong(0) == 24L)
    assert(out.getLong(1) > 0L) // some points survive
    assert(out.getDouble(2) > 0.0) // sum ln mu positive
    assert(out.getDouble(3) > 0.0) // MLE dimension positive
  }

  test("license scan: marker counts and share per source") {
    import spark.implicits._
    val docs = Seq(
      (0L, "plain prose with nothing special", "a"),
      (1L, "footer: (c) acme corp - all rights reserved", "a"),
      (2L, "licensed under creative commons attribution", "a"),
      (3L, "Copyright 2024 Example Media", "b"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.licenseScan(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    // source a: 3 docs; doc1 has (c)+rights, doc2 has cc → 2 flagged
    assert(out("a") == ((3L, 1L, 1L, 1L, 2L, 0.666667)))
    // source b: "Copyright" matches case-insensitively
    assert(out("b") == ((1L, 0L, 1L, 0L, 1L, 1.0)))
  }
}
