package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-retrieval and corpus-contrast operators over the documents
  * table — the term-statistics family (BM25 ranking, log-odds
  * distinctive terms) that complements the dense/ANN family in
  * [[Similarity]].
  *
  * Scale posture shared by both operators: the corpus tokenizes and
  * shuffles ONCE into the (doc, term) frequency table; every
  * subsequent side (query terms, per-term document frequencies,
  * per-source totals) is either vocabulary-bounded or a broadcast
  * scalar, so no second corpus-wide exchange exists. Cross-engine
  * determinism: whitespace tokens, integer counts, and a fixed
  * floating expression tree (the DuckDB oracle states the identical
  * tree, so IEEE evaluation matches bit-for-bit up to the documented
  * ~1-ulp `ln` tolerance absorbed by round-6 output).
  */
object Retrieval {

  /** Okapi BM25 top-k retrieval. The query workload is derived from
    * the corpus itself so the whole lifecycle is oracle-checkable:
    * the `nQueryTerms` most document-frequent terms of length ≥
    * `minTermLen` (ties broken by term) each act as a single-term
    * query, and the result is the top `k` documents per query term by
    * BM25 (k1/b are the classic Robertson defaults).
    *
    * Plan shape (the 100-TB story):
    *  1. ONE corpus tokenize+shuffle into tf(doc_id, dl, term, tf) —
    *     persisted, since both the df aggregate and the scoring join
    *     read it (the q19 vocabulary posture).
    *  2. df(term) is a vocabulary-bounded aggregate of tf; the query
    *     side is a TakeOrdered of it (driver-bounded at nQueryTerms)
    *     broadcast back into the scoring join, so scoring touches
    *     only postings of query terms — the inverted-index access
    *     pattern, expressed relationally.
    *  3. N and avgdl are eager single-row scalar aggregates inlined
    *     as literals (never a partition-less window / 1-row cross
    *     join — registry guards forbid both).
    *  4. top-k per query is a rank window PARTITIONED BY term — one
    *     partition per query term, parallelism = query count, never a
    *     global sort. At a 10^6-query production workload the same
    *     plan holds (queries stay the broadcast side until they stop
    *     fitting, then the join flips to shuffle on term — both
    *     AQE-reachable from this shape).
    */
  def bm25TopK(docs: DataFrame, nQueryTerms: Int = 10, k: Int = 5,
      minTermLen: Int = 5, k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    // tokenize ONCE below the Generate: co-projecting size(split(..))
    // with explode(split(..)) puts the size's regex split in the
    // projection ABOVE the Generate, re-splitting the document once
    // per emitted token (measured ~14× on this stage)
    val toks = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
    val tf = Dedup.persistOnce(
      toks.groupBy("doc_id", "dl", "term")
        .agg(count(lit(1)).cast("long").as("tf")))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val queryTerms = df
      .filter(length(col("term")) >= minTermLen)
      .orderBy(col("df").desc, col("term").asc)
      .limit(nQueryTerms)
    // corpus scalars, inlined as literals (the q19 single-row-agg
    // pattern; empty corpus → score join is empty, NaN never observed)
    val statsRow = docs
      .agg(count(lit(1)).as("n"),
        avg(size(split(trim(col("text")), "\\s+"))).as("avgdl"))
      .head()
    val nDocs = lit(statsRow.getLong(0).toDouble)
    val avgdl = lit(
      if (statsRow.isNullAt(1)) Double.NaN else statsRow.getDouble(1))
    // expression tree mirrored verbatim in the oracle SQL: idf *
    // (tf*(k1+1)) / (tf + k1*((1-b) + b*dl/avgdl)). The derived
    // constants (k1+1, 1-b) stay UNFOLDED sums of primitive literals
    // so both engines fold them with the same IEEE operands — a
    // pre-folded Scala `lit(k1 + 1.0)` can differ from the SQL
    // parse of its shortest decimal rendering by 1 ulp.
    val idf = log(lit(1.0) +
      (nDocs - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val score = idf *
      (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
      (col("tf").cast("double") + lit(k1) *
        ((lit(1.0) - lit(b)) +
          lit(b) * col("dl").cast("double") / avgdl))
    val scored = tf
      .join(broadcast(queryTerms), Seq("term"))
      .select(col("term"), col("doc_id"), score.as("score"))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("term"), col("doc_id"), col("rank"),
        round(col("score"), 6).as("score"))
  }

  /** Distinctive terms per source by log-odds ratio with an
    * uninformative Dirichlet prior (Monroe, Colaresi & Quinn 2008,
    * "Fightin' Words"): for each source, the `topN` terms whose usage
    * rate most exceeds the REST of the corpus, scored by the
    * prior-smoothed log-odds z-statistic. The TF-IDF / q55 contrast:
    * log-odds compares a source against its complement with proper
    * variance normalization, so high-frequency terms can still rank
    * when their imbalance is extreme — the standard corpus-drift /
    * subcorpus-characterization diagnostic.
    *
    * Plan: ONE corpus tokenize+shuffle into (source, term) counts;
    * term totals are a vocabulary-bounded re-aggregate joined back on
    * term (vocab-keyed, AQE-broadcastable when vocab is small);
    * per-source totals and the corpus total are a source-bounded agg
    * inlined via broadcast join / literal. Final top-N is a rank
    * window PARTITIONED BY source — parallelism = source count, which
    * is bounded in any provenance-tracked corpus.
    */
  def logOddsTerms(docs: DataFrame, alpha: Double = 0.01,
      topN: Int = 3): DataFrame = {
    val toks = docs.select(col("source"),
      explode(split(trim(col("text")), "\\s+")).as("term"))
    val ySi = Dedup.persistOnce(
      toks.groupBy("source", "term")
        .agg(count(lit(1)).cast("double").as("y_si")))
    val yI = ySi.groupBy("term")
      .agg(sum(col("y_si")).as("y_i"))
    val nS = ySi.groupBy("source")
      .agg(sum(col("y_si")).as("n_s"))
    // scalars: corpus token total and vocabulary size (for A = α·V)
    val totRow = yI.agg(sum(col("y_i")), count(lit(1))).head()
    val nTotal = lit(
      if (totRow.isNullAt(0)) Double.NaN else totRow.getDouble(0))
    val bigA = lit(alpha) * lit(totRow.getLong(1).toDouble)
    val yRest = col("y_i") - col("y_si")
    val nRest = nTotal - col("n_s")
    // delta = ln((y_si+α)/(n_s+A−y_si−α)) − ln((y_rest+α)/(n_rest+A−y_rest−α))
    val delta =
      log((col("y_si") + lit(alpha)) /
        (col("n_s") + bigA - col("y_si") - lit(alpha))) -
      log((yRest + lit(alpha)) / (nRest + bigA - yRest - lit(alpha)))
    val z = delta / sqrt(
      lit(1.0) / (col("y_si") + lit(alpha)) +
      lit(1.0) / (yRest + lit(alpha)))
    val scored = ySi
      .join(yI, Seq("term"))
      .join(broadcast(nS), Seq("source"))
      .select(col("source"), col("term"), z.as("z"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("z").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("source"), col("term"), col("rank"),
        round(col("z"), 6).as("z"))
  }
}
