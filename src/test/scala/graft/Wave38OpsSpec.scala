package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, Dedup, SftPrep}

/** Behavior specs for the thirty-eighth-wave operators (q184–q187):
  * conversation hazard curve, tool latency, source length profile,
  * dedup-family agreement Venn. */
class Wave38OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("conv hazard: at-risk decreases, survival ends at zero") {
    import spark.implicits._
    // 3 convs of len 1, 2 of len 2, 1 of len 4
    val t = (Seq(("A", 0), ("B", 0), ("C", 0)) ++
      Seq(("D", 0), ("D", 1), ("E", 0), ("E", 1)) ++
      (0 to 3).map(i => ("F", i)))
      .map { case (c, i) => (c, i, "user", "x") }
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.convHazard(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((3L, 6L, 0.5, 0.5))) // 3 of 6 end at depth 1
    assert(out(2L) == ((2L, 3L, 0.666667, 0.166667)))
    assert(out(4L) == ((1L, 1L, 1.0, 0.0))) // deepest: hazard 1
  }

  test("tool latency: gaps keyed by the invoked tool") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "user", null, 1000L),
      ("A", 1, "tool", "browser", 1200L), // 200
      ("A", 2, "assistant", null, 1500L),
      ("A", 3, "tool", "python", 1900L), // 400
      ("B", 0, "tool", "browser", 9999L)) // no prev turn: excluded
      .toDF("conv_id", "turn_idx", "role", "tool", "ts_ms")
    val out = SftPrep.toolLatency(t).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out("browser") == ((1L, 200.0)))
    assert(out("python") == ((1L, 400.0)))
  }

  test("dedup venn: rollup equals independently computed family sets") {
    import spark.implicits._
    // deterministic corpus: identical twins, heavy-overlap pair,
    // and unrelated filler — enough to populate several Venn cells
    val base = "the quick brown fox jumps over the lazy dog " +
      "pack my box with five dozen liquor jugs"
    val docs = Seq(
      (1L, base),
      (2L, base), // exact twin of 1
      (3L, base + " extra tail tokens here"),
      (4L, "completely different words about spark catalyst tungsten " +
        "codegen shuffle partitions broadcast join"),
      (5L, "unrelated corpus text mentioning parquet columnar storage " +
        "predicate pushdown and column pruning"))
      .toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val j = pairSet(Dedup.ngramJaccardPairs(docs, k = 3,
      minJaccard = 0.1))
    val m = pairSet(Dedup.minhashLshCandidates(docs, numHashes = 8,
      minEstSim = 0.25))
    val sh = pairSet(Dedup.simhashPairs(docs, maxHamming = 7))
    val expected = (j ++ m ++ sh).toSeq
      .map(p => (j(p), m(p), sh(p)))
      .groupBy(identity).map { case (cell, ps) => cell -> ps.size.toLong }
    val out = Dedup.dedupFamilyVenn(docs).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) ->
        r.getLong(3)).toMap
    assert(out == expected)
    assert(out.keys.forall { case (a, b, c) => a || b || c })
    assert(j((1L, 2L)) && m((1L, 2L)) && sh((1L, 2L))) // twins: all 3
  }

  test("source length profile: exact percentiles per source") {
    import spark.implicits._
    // lengths 1..5 in one source: p10=1.4, p50=3, p90=4.6 (R-7)
    val docs = (1 to 5).map(n =>
      (n.toLong, Seq.fill(n)("w").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.sourceLengthProfile(docs).collect().head
    assert(out.getLong(1) == 5L)
    assert(out.getDouble(2) == 1.4)
    assert(out.getDouble(3) == 3.0)
    assert(out.getDouble(4) == 4.6)
    assert(out.getDouble(5) == 3.0)
  }
}
