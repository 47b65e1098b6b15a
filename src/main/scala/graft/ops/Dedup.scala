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

  /** Distinct word k-shingles per doc (k=3). */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame = {
    val w = split(trim(col("text")), "\\s+")
    docs.select(
      col("doc_id"),
      explode(when(size(w) >= k,
        array_distinct(transform(
          sequence(lit(0), size(w) - k),
          i => concat_ws(" ",
            (0 until k).map(j => element_at(w, i + j + 1)): _*))))
        .otherwise(array())).as("shingle"))
  }

  /** Exact duplicate clusters over a hash of raw text. */
  def exactClusters(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical"))

  /** All-pairs word-shingle Jaccard ≥ minJaccard. Exact (no sketch):
    * inverted-index self-join on shingle. */
  def ngramJaccardPairs(
      docs: DataFrame, k: Int = 3, minJaccard: Double = 0.1): DataFrame = {
    val sh = shingles(docs, k).cache()
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

  /** MinHash signatures: k independent min-hashes per doc, hash_i =
    * md5(i ':' shingle) (engine-portable). Output long format
    * (doc_id, seed, minhash). */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 8): DataFrame = {
    val sh = shingles(docs)
    sh.crossJoin(
        spark_seeds(sh, numHashes))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"),
        col("shingle")).cast("binary"))).as("minhash"))
  }

  private def spark_seeds(df: DataFrame, n: Int): DataFrame =
    df.sparkSession.range(n.toLong).select(col("id").cast("int").as("seed"))

  /** LSH banding with r=2 rows/band: docs sharing one full band
    * signature become candidate pairs; candidates are then verified by
    * the estimated similarity = fraction of equal minhashes. */
  def minhashLshCandidates(
      docs: DataFrame, numHashes: Int = 8,
      minEstSim: Double = 0.25): DataFrame = {
    val sig = minhashSignatures(docs, numHashes).cache()
    val bands = sig
      .groupBy(col("doc_id"), (col("seed") / 2).cast("int").as("band"))
      .agg(
        max(when(pmod(col("seed"), lit(2)) === 0, col("minhash")))
          .as("mh0"),
        max(when(pmod(col("seed"), lit(2)) === 1, col("minhash")))
          .as("mh1"))
    val ba = bands.select(col("doc_id").as("doc_a"), col("band"),
      col("mh0"), col("mh1"))
    val bb = bands.select(col("doc_id").as("doc_b"), col("band"),
      col("mh0"), col("mh1"))
    val cand = ba.join(bb, Seq("band", "mh0", "mh1"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sa = sig.select(col("doc_id").as("doc_a"), col("seed"),
      col("minhash").as("ha"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("seed"),
      col("minhash").as("hb"))
    cand.join(sa, "doc_a").join(sb, Seq("doc_b", "seed"))
      .groupBy("doc_a", "doc_b")
      .agg(round(avg(when(col("ha") === col("hb"), 1d).otherwise(0d)), 6)
        .as("est_sim"))
      .filter(col("est_sim") >= minEstSim)
  }

  /** SimHash-based near-dup candidates: 64-bit simhash over word
    * tokens (graft.functions.SimHash64, codegen'd), banded into 4×16
    * bit chunks — docs equal on any chunk are candidates, verified by
    * hamming distance ≤ maxHamming. Spark-side only (no SQL oracle:
    * bit-level hashing is not portably expressible in DuckDB).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 12): DataFrame = {
    graft.functions.SimHash64.register(docs.sparkSession)
    val withSig = docs.select(col("doc_id"),
      call_function("simhash64", split(trim(col("text")), "\\s+"))
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
    * with a deterministic op order (fold left over zipped arrays) so
    * the DuckDB oracle produces bit-identical doubles. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b,
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, v) => acc + v)
    val na = aggregate(transform(a,
        x => x.cast("double") * x.cast("double")),
      lit(0d), (acc, v) => acc + v)
    val nb = aggregate(transform(b,
        x => x.cast("double") * x.cast("double")),
      lit(0d), (acc, v) => acc + v)
    dot / (sqrt(na) * sqrt(nb))
  }

  def embeddingNearDups(
      embeddings: DataFrame, minCosine: Double = 0.4): DataFrame = {
    val a = embeddings.select(col("vec_id").as("vec_a"),
      col("embedding").as("ea"))
    val b = embeddings.select(col("vec_id").as("vec_b"),
      col("embedding").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("ea"), col("eb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
  }
}
