package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusStats, Dedup, TextAnalysis}

/** Behavior specs for the tenth-wave operators (q93–q99): cross-source
  * duplication rollup, lexical diversity, blocklist gate, leakage-safe
  * splitting, content-defined chunking, script-mix detection and the
  * LSH self-audit. The DuckDB oracles pin cross-engine parity; these
  * pin the SEMANTICS on crafted fixtures. */
class Wave10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val filler =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("cross-source dup matrix rolls up LSH pairs per source pair") {
    import spark.implicits._
    // one exact dup across srcA/srcB, one within srcA; doc 5 unrelated
    val docs = Seq(
      (1L, "srcA", filler),
      (2L, "srcB", filler),
      (3L, "srcA", filler + " omega"),
      (5L, "srcC", "completely different words entirely here now"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.crossSourceDupMatrix(docs, minEstSim = 0.25)
      .orderBy("src_lo", "src_hi").collect()
    val cells = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(cells.contains(("srcA", "srcB"))) // the cross-source pair
    assert(cells.contains(("srcA", "srcA"))) // the within-source pair
    assert(!cells.exists(c => c._1 == "srcC" || c._2 == "srcC"))
    val ab = out.find(r =>
      r.getString(0) == "srcA" && r.getString(1) == "srcB").get
    assert(ab.getLong(2) >= 1L) // n_pairs
    assert(ab.getDouble(3) == 1.0) // exact dup → est_sim 1
  }

  test("lexical diversity: repeated-token source scores lower TTR") {
    import spark.implicits._
    val docs = Seq(
      ("rich", "one two three four five six"),
      ("poor", "spam spam spam spam spam spam"))
      .toDF("source", "text")
    val out = CorpusStats.lexicalDiversity(docs).orderBy("source")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("rich").getLong(1) == 6L && out("rich").getLong(2) == 6L)
    assert(out("rich").getDouble(3) == 1.0)
    assert(out("poor").getLong(1) == 6L && out("poor").getLong(2) == 1L)
    assert(out("poor").getDouble(3) < 0.2)
    // bigrams: "spam spam" ×5 → 1 type of 5
    assert(out("poor").getLong(4) == 5L && out("poor").getLong(5) == 1L)
  }

  test("blocklist filter counts and gates on the listed terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text with no bad words at all here today"), // 10 tok
      (2L, "slow query dup row slow merge leak crash dup x"))  // 10 tok
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFilter(docs, maxBadFrac = 0.05)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 0L && out(0).getBoolean(4))
    assert(out(1).getLong(2) == 6L) // slow×2, dup×2, leak, crash
    assert(out(1).getDouble(3) == 0.6 && !out(1).getBoolean(4))
  }

  test("leakage-safe split keeps every dup cluster in ONE split") {
    val out = graft.queries.TrainingDataQueries
      .leakageSplitQ(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // cluster coherence: all members of a cluster share the split
    val byCluster = out.groupBy(_.getLong(1))
    assert(byCluster.forall(_._2.map(_.getString(2)).distinct.size == 1))
    // the split is genuinely two-sided on the sf corpus
    assert(out.map(_.getString(2)).distinct.toSet == Set("train", "val"))
    // multi-doc clusters exist (else the test proves nothing)
    assert(byCluster.exists(_._2.length > 1))
  }

  test("cdc chunks: boundaries content-defined, order preserved") {
    import spark.implicits._
    // find a token whose md5-derived 16-bit hash ≡ 0 (mod 8), and two
    // that are not boundaries, so the fixture is self-checking
    def h16(t: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16)
    }
    val vocab = (1 to 200).map(i => s"tok$i")
    val bnd = vocab.find(h16(_) % 8 == 0).get
    val plain = vocab.filter(h16(_) % 8 != 0).take(3)
    // doc: p0 p1 BND p2  → chunks [p0 p1 BND] [p2]
    val text = Seq(plain(0), plain(1), bnd, plain(2)).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = CorpusStats.cdcChunks(docs).orderBy("chunk_idx").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 3L)
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 1L)
    // chunk hash = md5 of the space-joined tokens in document order
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(
      s"${plain(0)} ${plain(1)} $bnd".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0).getString(3) == expect)
    // edit-locality: prepending a token shifts chunk 0 but chunk
    // boundaries after BND are unchanged (the CDC property)
    val edited = Seq((1L, s"${plain(2)} $text")).toDF("doc_id", "text")
    val out2 = CorpusStats.cdcChunks(edited).orderBy("chunk_idx")
      .collect()
    assert(out2.last.getString(3) == out.last.getString(3))
  }

  test("script mix: pure-latin silent, mixed-script flagged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "pure latin text 42"),
      (2L, "mixed with кириллица here"),
      (3L, "且 全 中文 无 拉丁"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.scriptMix(docs).orderBy("doc_id").collect()
    assert(out(0).getString(6) == "latin" && !out(0).getBoolean(7))
    assert(out(0).getLong(4) == 2L) // "42"
    assert(out(1).getLong(2) == 9L) // кириллица
    assert(out(1).getString(6) == "latin" && out(1).getBoolean(7))
    assert(out(2).getLong(1) == 0L && out(2).getString(6) == "cjk")
    assert(!out(2).getBoolean(7))
  }

  test("hot-key report flags only keys above saltFactor x mean size") {
    import spark.implicits._
    // one hot key holding 50 of 59 rows across 10 keys: mean 5.9,
    // verdict n*n_keys > 2*total ⇔ n > 11.8 → only "hot" salts
    val rows = Seq.fill(50)("hot") ++ (1 to 9).map(i => s"cold$i")
    val df = rows.toDF("conv_id")
    val out = CorpusStats.hotKeyReport(df, "conv_id", saltFactor = 2,
      topN = 5).collect()
    assert(out.length == 5)
    assert(out(0).getString(0) == "hot" && out(0).getLong(1) == 50L)
    assert(out(0).getBoolean(3))
    assert(out(0).getDouble(2) == BigDecimal(50.0 / 59)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.drop(1).forall(!_.getBoolean(3)))
    // ties broken by key: the four cold keys present are cold1..cold4
    assert(out.drop(1).map(_.getString(0)).toSeq ==
      Seq("cold1", "cold2", "cold3", "cold4"))
  }

  test("lsh audit: counts consistent, exact dups always recalled") {
    import spark.implicits._
    // 3 identical docs → 3 truth pairs, all LSH-recoverable (identical
    // signatures collide in every band); 1 unrelated doc
    val docs = Seq(
      (1L, filler), (2L, filler), (3L, filler),
      (4L, "nothing shared with the others at all whatsoever"))
      .toDF("doc_id", "text")
    val r = Dedup.lshRecallAudit(docs, tau = 0.25).collect()(0)
    val (nT, nC, nH) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nT == 3L && nH == 3L)
    assert(r.getDouble(3) == 1.0) // recall
    assert(nH <= math.min(nT, nC))
    assert(r.getDouble(4) == BigDecimal(nH.toDouble / nC)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
