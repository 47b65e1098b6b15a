package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), word-shingle Jaccard, MinHash+LSH banding, SimHash,
  * embedding-cosine near-dup.
  *
  * Scale design:
  *  - Exact dedup: groupBy(md5) — map-side partial agg, one shuffle of
  *    (hash, id) pairs only, never text.
  *  - Shingle/MinHash paths: explode shingles → shuffle keyed by
  *    shingle/band signature. At 100 TB the shingle join is THE cost
  *    center: band-bucket join (LSH) touches only docs sharing a band
  *    signature instead of the all-pairs product; hot shingles (stop
  *    phrases) are the skew risk — the candidate join filters
  *    `doc_a < doc_b` early and verification joins are on (doc_a,
  *    doc_b), both AQE-skew-splittable.
  *  - MinHash uses md5-derived hashes so the DuckDB oracle reproduces
  *    signatures bit-for-bit (xxhash64/murmur differ across engines).
  */
object Dedup {

  /** Distinct word k-shingles per doc (k=3). Codegen'd expression
    * (graft.functions.WordShingles) — the HOF equivalent measured ~8 s
    * per evaluation over 5000 docs, and join plans evaluate this on
    * several branches. */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame =
    docs.select(
      col("doc_id"),
      explode(graft.functions.word_shingles(col("text"), k)).as("shingle"))

  /** Exact duplicate clusters over a hash of raw text. */
  def exactClusters(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical"))

  /** All-pairs word-shingle Jaccard ≥ minJaccard. Exact (no sketch):
    * inverted-index self-join on shingle.
    *
    * maxDocFreq drops stop-shingles (present in > maxDocFreq docs)
    * BEFORE the join — standard df-filtering in dedup pipelines; a
    * shingle shared by d docs contributes d² join rows, so the filter
    * bounds the self-join fanout at maxDocFreq² per shingle (the
    * difference between quadratic blowup and linear scan at corpus
    * scale). Jaccard is over the FILTERED shingle sets. */
  def ngramJaccardPairs(
      docs: DataFrame, k: Int = 3, minJaccard: Double = 0.1,
      maxDocFreq: Int = 100): DataFrame = {
    val all = shingles(docs, k)
    val rare = all.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
      .select("shingle")
    val sh = all.join(rare, Seq("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.withColumnRenamed("doc_id", "doc_a")
    val b = sh.withColumnRenamed("doc_id", "doc_b")
    val inter = a.join(b,
        a("shingle") === b("shingle") && a("doc_a") < b("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Wide MinHash signatures: one row per doc with numHashes minhash
    * columns mh0..mhN-1, hash_i = md5(i ':' shingle) (engine-portable).
    * ONE aggregation = ONE shuffle; the long-format
    * (doc_id, seed, minhash) variant shuffled numHashes× the rows and
    * forced three recomputations of the shingle explode downstream.
    */
  def minhashSignaturesWide(
      docs: DataFrame, numHashes: Int = 8): DataFrame = {
    val sh = shingles(docs)
    sh.groupBy(col("doc_id"))
      .agg(
        min(md5(concat(lit("0:"), col("shingle")).cast("binary")))
          .as("mh0"),
        (1 until numHashes).map(i =>
          min(md5(concat(lit(s"$i:"), col("shingle")).cast("binary")))
            .as(s"mh$i")): _*)
  }

  /** LSH banding with r=2 rows/band over the wide signatures: docs
    * sharing one full band signature become candidate pairs, verified
    * by estimated similarity = fraction of equal minhashes. Per-band
    * self-joins run on the tiny one-row-per-doc signature table. */
  def minhashLshCandidates(
      docs: DataFrame, numHashes: Int = 8,
      minEstSim: Double = 0.25): DataFrame = {
    require(numHashes % 2 == 0, "r=2 banding needs even numHashes")
    val sig = minhashSignaturesWide(docs, numHashes)
    val nBands = numHashes / 2
    val cand = (0 until nBands).map { b =>
      val l = sig.select(col("doc_id").as("doc_a"),
        col(s"mh${2 * b}").as("b0"), col(s"mh${2 * b + 1}").as("b1"))
      val r = sig.select(col("doc_id").as("doc_b"),
        col(s"mh${2 * b}").as("b0"), col(s"mh${2 * b + 1}").as("b1"))
      l.join(r, Seq("b0", "b1")).filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
    }.reduce(_ unionByName _).distinct()
    val sa = sig.toDF(sig.columns.map(c =>
      if (c == "doc_id") "doc_a" else s"a_$c"): _*)
    val sb = sig.toDF(sig.columns.map(c =>
      if (c == "doc_id") "doc_b" else s"b_$c"): _*)
    val matches = (0 until numHashes).map(i =>
      when(col(s"a_mh$i") === col(s"b_mh$i"), 1d).otherwise(0d))
      .reduce(_ + _)
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(matches / numHashes, 6).as("est_sim"))
      .filter(col("est_sim") >= minEstSim)
  }

  /** SimHash-based near-dup candidates: 64-bit simhash over word
    * tokens (graft.functions.SimHash64, codegen'd), banded into 4×16
    * bit chunks — docs equal on any chunk are candidates, verified by
    * hamming distance ≤ maxHamming. Spark-side only (no SQL oracle:
    * bit-level hashing is not portably expressible in DuckDB).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 12): DataFrame = {
    val withSig = docs.select(col("doc_id"),
      graft.functions.simhash64(split(trim(col("text")), "\\s+"))
        .as("sig"))
    val chunks = withSig.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk"),
          shiftright(col("sig"), i * 16).bitwiseAND(lit(0xffffL))
            .as("bits"))): _*)).as("c"))
      .select(col("doc_id"), col("sig"), col("c.chunk"), col("c.bits"))
    val l = chunks.select(col("doc_id").as("doc_a"),
      col("sig").as("sig_a"), col("chunk"), col("bits"))
    val r = chunks.select(col("doc_id").as("doc_b"),
      col("sig").as("sig_b"), col("chunk"), col("bits"))
    l.join(r, Seq("chunk", "bits"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicates: exact double-precision cosine
    * with a deterministic op order (sequential widening fold — see
    * graft.functions.VectorKernels) so the DuckDB oracle produces
    * bit-identical doubles. Codegen'd kernel, not a HOF fold (~6×). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.vec_dot(a, b) /
      (sqrt(graft.functions.vec_norm2(a)) *
        sqrt(graft.functions.vec_norm2(b)))

  def embeddingNearDups(
      embeddings: DataFrame, minCosine: Double = 0.4): DataFrame = {
    // norms are per-VECTOR: compute them once per side, not per pair
    val a = embeddings.select(col("vec_id").as("vec_a"),
      col("embedding").as("ea"),
      sqrt(graft.functions.vec_norm2(col("embedding"))).as("na"))
    val b = embeddings.select(col("vec_id").as("vec_b"),
      col("embedding").as("eb"),
      sqrt(graft.functions.vec_norm2(col("embedding"))).as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(graft.functions.vec_dot(col("ea"), col("eb")) /
          (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
  }
}
