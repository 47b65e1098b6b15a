package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SftPrep, Similarity}

/** Behavior specs for the thirty-ninth-wave operators (q188–q190):
  * hour-of-week load profile, label-centroid similarity matrix,
  * label-separability (silhouette-lite) audit. */
class Wave39OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hour of week: epoch-ms arithmetic lands in the right cell") {
    import spark.implicits._
    // epoch 0 = Thursday 00:00 UTC → dow (0+4)%7 = 4; one turn one
    // hour later same day; one turn exactly 3 days later (Sunday = 0)
    val t = Seq(
      ("A", 0, "user", 0L),
      ("A", 1, "tool", 3600000L),
      ("B", 0, "assistant", 3L * 86400000L))
      .toDF("conv_id", "turn_idx", "role", "ts_ms")
    val out = SftPrep.hourOfWeekLoad(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out((4L, 0L)) == ((1L, 1L, 0L, 0.333333))) // Thu 00: start
    assert(out((4L, 1L)) == ((1L, 0L, 1L, 0.333333))) // Thu 01: tool
    assert(out((0L, 0L)) == ((1L, 1L, 0L, 0.333333))) // Sun 00: start
    assert(out.size == 3)
  }

  test("label centroid matrix: orthogonal 0, colinear 1") {
    import spark.implicits._
    // label 0 along e1, label 1 along e2 (orthogonal), label 2 a
    // scaled copy of label 0's direction (colinear)
    val e = Seq(
      (1L, Seq(1f, 0f, 0f, 0f), 0), (2L, Seq(1f, 0f, 0f, 0f), 0),
      (3L, Seq(0f, 1f, 0f, 0f), 1), (4L, Seq(0f, 1f, 0f, 0f), 1),
      (5L, Seq(3f, 0f, 0f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidMatrix(e).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out((0, 1)) == 0.0)
    assert(out((0, 2)) == 1.0)
    assert(out((1, 2)) == 0.0)
    assert(out.size == 3) // strictly label_a < label_b, no diagonal
  }

  test("label silhouette: separated labels score margin 1") {
    import spark.implicits._
    val e = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0f), 0),
      (3L, Seq(0f, 1f), 1), (4L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelSilhouette(e).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    assert(out(0) == ((2L, 1.0, 0.0, 1.0)))
    assert(out(1) == ((2L, 1.0, 0.0, 1.0)))
  }

  test("label silhouette: a stray vector drags its label's margin") {
    import spark.implicits._
    // label 0's second vector actually lives in label 1's direction —
    // its own-cosine < other-cosine pulls label 0's mean margin below
    // the clean case while label 1 stays clean
    val e = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.1f, 1f), 0),
      (3L, Seq(0f, 1f), 1), (4L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelSilhouette(e).collect()
      .map(r => r.getInt(0) -> r.getDouble(4)).toMap
    assert(out(0) < 1.0)
    assert(out(1) > 0.0)
  }
}
