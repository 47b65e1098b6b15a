package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{CorpusStats, Dedup, GraphOps, Similarity, TextAnalysis}

/** Training-data pipeline queries over documents/embeddings, each with
  * a bit-exact DuckDB oracle — including the hash/LSH operators: the
  * SimHash token hash is md5-derived and the hyperplanes are literal
  * matrices, so DuckDB reproduces signatures and buckets exactly.
  */
object TrainingDataQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  def tokenCount(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(docs(s, dir)).orderBy("doc_id")

  def langId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(docs(s, dir)).orderBy("doc_id")

  /** q132: declared-label vs classifier confusion audit
    * ([[graft.ops.TextAnalysis.langConfusion]]). */
  def langConfusionQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langConfusion(docs(s, dir))

  /** q134: per-document lexical profile (TTR / hapax / burstiness)
    * ([[graft.ops.TextAnalysis.hapaxProfile]]). */
  def hapaxProfileQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.hapaxProfile(docs(s, dir))

  /** q136: embedding-batch centroid drift
    * ([[graft.ops.Similarity.batchCentroidDrift]]). */
  def batchDriftQ(s: SparkSession, dir: String): DataFrame =
    Similarity.batchCentroidDrift(embs(s, dir), batchSize = 100)

  /** q137: Heaps'-law vocabulary-growth fit per source
    * ([[graft.ops.CorpusStats.heapsFit]]). */
  def heapsFitQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.heapsFit(docs(s, dir))

  /** q138: dedup-aware effective token mass per source
    * ([[graft.ops.Dedup.effectiveTokens]]). */
  def effectiveTokensQ(s: SparkSession, dir: String): DataFrame =
    Dedup.effectiveTokens(docs(s, dir))

  /** q139: top-PMI collocations
    * ([[graft.ops.CorpusStats.pmiCollocations]]). */
  def pmiCollocationsQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.pmiCollocations(docs(s, dir))

  /** q140: Jaccard threshold-sensitivity sweep
    * ([[graft.ops.Dedup.jaccardThresholdSweep]]). */
  def jaccardSweepQ(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardThresholdSweep(docs(s, dir))

  /** q141: dedup-aware mixture planner at q122's budget
    * ([[graft.ops.CorpusStats.dedupAwarePlan]]). */
  def dedupAwarePlanQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.dedupAwarePlan(docs(s, dir), budgetTokens = 30010L)

  /** q142: format/markup router profile
    * ([[graft.ops.TextAnalysis.markupProfile]]). */
  def markupProfileQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.markupProfile(docs(s, dir))

  /** q143: distance-2 skip-gram co-occurrence top list
    * ([[graft.ops.CorpusStats.skipgramPairs]]). */
  def skipgramPairsQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.skipgramPairs(docs(s, dir))

  /** q144: heuristic-gate vs classifier calibration audit
    * ([[graft.ops.TextAnalysis.qualityCalibration]]). */
  def qualityCalibrationQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityCalibration(docs(s, dir))

  /** q149: per-term burstiness, Church & Gale's tf/df dispersion
    * ([[graft.ops.CorpusStats.termBurstiness]]). */
  def termBurstinessQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.termBurstiness(docs(s, dir))

  /** q150: per-source KS drift on the token-length distribution
    * ([[graft.ops.CorpusStats.lengthKsDrift]]). */
  def lengthKsDriftQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.lengthKsDrift(docs(s, dir))

  /** q151: ingestion-order (doc_id decile) KL composition drift
    * ([[graft.ops.CorpusStats.ingestionDrift]]). */
  def ingestionDriftQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.ingestionDrift(docs(s, dir))

  /** q152: k-center greedy coreset selection at k=6
    * ([[graft.ops.Similarity.coresetSelect]]). */
  def coresetSelectQ(s: SparkSession, dir: String): DataFrame =
    Similarity.coresetSelect(embs(s, dir), k = 6)

  /** q153: within-source percentile normalization of the q58 score
    * ([[graft.ops.TextAnalysis.scorePercentiles]]). */
  def scorePercentilesQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.scorePercentiles(docs(s, dir))

  /** q155: quality-selection token curve
    * ([[graft.ops.TextAnalysis.selectionCurve]]). */
  def selectionCurveQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.selectionCurve(docs(s, dir))

  /** q156: per-source bigram conditional entropy rate
    * ([[graft.ops.CorpusStats.bigramEntropyRate]]). */
  def bigramEntropyRateQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.bigramEntropyRate(docs(s, dir))

  /** q157: cross-corpus leak audit over a deterministic injection —
    * every 31st conversation's rendered text is planted as a
    * pretraining document (the q37/q26 injected-stripe convention) so
    * the detector has real leaks to find
    * ([[graft.ops.Dedup.crossCorpusLeak]]). */
  def crossCorpusLeakQ(s: SparkSession, dir: String): DataFrame = {
    // NOT persisted although three legs re-derive the transcripts (a
    // wrapper persist would leak an InMemoryRelation into every later
    // query's plan — see duplicateConvs); the heavy legs inside
    // crossCorpusLeak persist their own shingle tables already
    val t = PipelineQueries.transcriptsUnordered(s, dir)
    val convNum = substring(col("conv_id"), 6, 10).cast("long")
    val leaked = t.groupBy(col("conv_id")).agg(
        array_join(transform(
          array_sort(collect_list(struct(col("turn_idx"),
            col("text")))),
          x => x.getField("text")), " ").as("text"))
      .withColumn("n", convNum)
      .filter(pmod(col("n"), lit(31)) === 0)
      .select((col("n") + lit(2000000000000L)).as("doc_id"),
        col("text"))
    Dedup.crossCorpusLeak(
      docs(s, dir).select("doc_id", "text").unionByName(leaked), t)
  }

  /** q158: top principal component / anisotropy diagnostic
    * ([[graft.ops.Similarity.topPrincipalComponent]]). */
  def topPcQ(s: SparkSession, dir: String): DataFrame =
    Similarity.topPrincipalComponent(embs(s, dir))

  /** q159: vocabulary churn across ingestion deciles
    * ([[graft.ops.CorpusStats.vocabChurn]]). */
  def vocabChurnQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.vocabChurn(docs(s, dir))

  /** q160: cosine threshold sweep over q35's LSH candidates
    * ([[graft.ops.Dedup.cosineThresholdSweep]]). */
  def cosineSweepQ(s: SparkSession, dir: String): DataFrame =
    Dedup.cosineThresholdSweep(embs(s, dir))

  /** q161: SimHash hamming sweep over q33's candidates
    * ([[graft.ops.Dedup.hammingThresholdSweep]]). */
  def hammingSweepQ(s: SparkSession, dir: String): DataFrame =
    Dedup.hammingThresholdSweep(docs(s, dir))

  /** q162: k-anonymity quasi-identifier cell audit
    * ([[graft.ops.TextAnalysis.kAnonymityCells]]). */
  def kAnonymityQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.kAnonymityCells(docs(s, dir))

  /** q163: IVF recall-vs-nProbe curve at 4 cells
    * ([[graft.ops.Similarity.annRecallCurve]]). */
  def annRecallCurveQ(s: SparkSession, dir: String): DataFrame =
    Similarity.annRecallCurve(embs(s, dir))

  /** q164: shard-balance audit over q60's md5 key
    * ([[graft.ops.CorpusStats.shardBalance]]). */
  def shardBalanceQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.shardBalance(docs(s, dir))

  /** q165: quality×length mutual information
    * ([[graft.ops.TextAnalysis.qualityLengthMi]]). */
  def qualityLengthMiQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityLengthMi(docs(s, dir))

  /** q166: source-level MinHash similarity matrix
    * ([[graft.ops.Dedup.sourceMinhashSim]]). */
  def sourceMinhashSimQ(s: SparkSession, dir: String): DataFrame =
    Dedup.sourceMinhashSim(docs(s, dir))

  /** q167: three-gate filter-agreement Venn audit
    * ([[graft.ops.TextAnalysis.filterAgreement]]). */
  def filterAgreementQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.filterAgreement(docs(s, dir))

  /** q168: duplicate-growth curve across ingestion deciles
    * ([[graft.ops.Dedup.dupGrowthCurve]]). */
  def dupGrowthCurveQ(s: SparkSession, dir: String): DataFrame =
    Dedup.dupGrowthCurve(docs(s, dir))

  /** q169: per-doc boilerplate-line share over q52's injected-footer
    * corpus (every 5th doc gains the shared footer line — the same
    * stripe q52 strips, here measured per doc;
    * [[graft.ops.CorpusStats.boilerplateShare]]). */
  def boilerplateShareQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val corpus = d.withColumn("text",
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(col("text"),
          lit("\nfooter: (c) acme corp - all rights reserved")))
        .otherwise(col("text")))
    CorpusStats.boilerplateShare(corpus, maxDocFreq = 50)
      .orderBy("doc_id")
  }

  /** q170: canonicalization dedup sweep
    * ([[graft.ops.Dedup.canonDedupSweep]]). */
  def canonDedupSweepQ(s: SparkSession, dir: String): DataFrame =
    Dedup.canonDedupSweep(docs(s, dir))

  /** q171: Flesch readability report
    * ([[graft.ops.TextAnalysis.readability]]). */
  def readabilityQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.readability(docs(s, dir)).orderBy("doc_id")

  /** q172: prefix-duplicate clusters over an injected truncation
    * stripe — every 9th doc re-enters at +10^12 truncated to 104
    * chars, the same-page-different-byte-limit crawl artifact
    * ([[graft.ops.Dedup.prefixDupReport]]). */
  def prefixDupQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val inj = d.filter(pmod(col("doc_id"), lit(9)) === 0)
      .select((col("doc_id") + lit(1000000000000L)).as("doc_id"),
        substring(col("text"), 1, 104).as("text"))
    Dedup.prefixDupReport(d.union(inj), prefixLen = 64)
  }

  /** q173: TwoNN intrinsic-dimension estimate
    * ([[graft.ops.Similarity.twoNnDimension]]). */
  def twoNnDimensionQ(s: SparkSession, dir: String): DataFrame =
    Similarity.twoNnDimension(embs(s, dir))

  /** q179: document template-skeleton mining over an injected
    * generator stripe — every 6th doc is REPLACED by a build-log line
    * whose digits vary per doc (one skeleton after normalization;
    * [[graft.ops.CorpusStats.docTemplates]]). */
  def docTemplatesQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text", "source")
    val corpus = d.withColumn("text",
      when(pmod(col("doc_id"), lit(6)) === 0,
        concat(lit("build "), col("doc_id").cast("string"),
          lit(" completed in "),
          pmod(col("doc_id"), lit(97)).cast("string"),
          lit(" seconds")))
        .otherwise(col("text")))
    CorpusStats.docTemplates(corpus, minUses = 3, topN = 20)
  }

  /** q180: source stylometry similarity matrix
    * ([[graft.ops.TextAnalysis.stopwordProfileSim]]). */
  def stopwordProfileSimQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stopwordProfileSim(docs(s, dir))

  /** q181: PQ distortion sweep at m ∈ {1,2,4}, codeK 8
    * ([[graft.ops.Similarity.pqDistortionSweep]]). */
  def pqDistortionQ(s: SparkSession, dir: String): DataFrame =
    Similarity.pqDistortionSweep(embs(s, dir))

  /** q182: numeric-token profile per source
    * ([[graft.ops.TextAnalysis.numericProfile]]). */
  def numericProfileQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.numericProfile(docs(s, dir))

  /** q186: per-source document-length percentile profile
    * ([[graft.ops.CorpusStats.sourceLengthProfile]]). */
  def sourceLengthProfileQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.sourceLengthProfile(docs(s, dir))

  /** q183: URL-domain scan over an injected link stripe — every 8th
    * doc gains a CDN link whose host rotates over 5 domains
    * ([[graft.ops.TextAnalysis.domainScan]]). */
  def domainScanQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val corpus = d.withColumn("text",
      when(pmod(col("doc_id"), lit(8)) === 0,
        concat(col("text"), lit(" see https://cdn"),
          pmod(col("doc_id"), lit(5)).cast("string"),
          lit(".example.com/page for details")))
        .otherwise(col("text")))
    TextAnalysis.domainScan(corpus, topN = 20)
  }

  /** q176: consecutive-duplicate-line collapse over an injected
    * stutter stripe — every 4th doc gains a line repeated 3× back to
    * back, the scraped-progress-bar artifact
    * ([[graft.ops.CorpusStats.lineRunCollapse]]). */
  def lineRunCollapseQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val corpus = d.withColumn("text",
      when(pmod(col("doc_id"), lit(4)) === 0,
        concat(col("text"),
          lit("\nprogress: 42%\nprogress: 42%\nprogress: 42%")))
        .otherwise(col("text")))
    CorpusStats.lineRunCollapse(corpus).orderBy("doc_id")
  }

  /** q177: near-dup cluster-size histogram over q36's components
    * ([[graft.ops.Dedup.clusterSizeHistogram]]). */
  def clusterSizeHistQ(s: SparkSession, dir: String): DataFrame =
    Dedup.clusterSizeHistogram(docs(s, dir))

  /** q174: license/copyright marker scan over q52's footer stripe
    * plus a Creative-Commons stripe (every 7th doc)
    * ([[graft.ops.TextAnalysis.licenseScan]]). */
  def licenseScanQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text", "source")
    val corpus = d
      .withColumn("text",
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"),
            lit("\nfooter: (c) acme corp - all rights reserved")))
          .otherwise(col("text")))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(col("text"),
            lit("\nlicensed under creative commons attribution")))
          .otherwise(col("text")))
    TextAnalysis.licenseScan(corpus)
  }

  def quality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(docs(s, dir)).orderBy("doc_id")

  def fingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(docs(s, dir)).orderBy("doc_id")

  def repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(docs(s, dir)).orderBy("doc_id")

  def corpusFilter(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.corpusFilter(docs(s, dir)).orderBy("doc_id")

  def topNgrams(s: SparkSession, dir: String): DataFrame =
    CorpusStats.topNgrams(docs(s, dir), k = 2, topN = 20)

  /** Stratified corpus sampling / mixing: per-source keep rates (the
    * source index mod 4 picks 10% / 25% / 50% / 100%), realized as a
    * deterministic md5-bucket filter so the exact sample reproduces in
    * DuckDB and across task retries. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val srcIdx = substring(col("source"), 4, 10).cast("int")
    val rate = when(pmod(srcIdx, lit(4)) === 0, 0.1)
      .when(pmod(srcIdx, lit(4)) === 1, 0.25)
      .when(pmod(srcIdx, lit(4)) === 2, 0.5)
      .otherwise(1.0)
    CorpusStats.hashSample(
        docs(s, dir).select("doc_id", "source"), col("doc_id"), rate)
      .orderBy("doc_id")
  }

  def seqPack(s: SparkSession, dir: String): DataFrame =
    CorpusStats.packSequences(docs(s, dir), budgetTokens = 2048)
      .orderBy("doc_id")

  /** PII scrub over a corpus with a deterministic injected-PII stripe
    * (every 7th doc gains an email + phone) so redaction counts are
    * non-trivial — same pattern as q30's duplicate stripe. */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val injected = concat(
      col("text"), lit(" Contact user"), col("doc_id").cast("string"),
      lit("@example.com or 555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
      lit("."))
    val corpus = d.withColumn("text",
      when(pmod(col("doc_id"), lit(7)) === 0, injected)
        .otherwise(col("text")))
    TextAnalysis.piiScrub(corpus).orderBy("doc_id")
  }

  /** Decontamination demo: eval set = every 97th doc CAPPED at id <
    * 100000 (the cap keeps the broadcast eval side bounded regardless
    * of scale factor, like a real benchmark set); training corpus =
    * the rest plus a contaminated stripe (each eval doc re-keyed with
    * a 10^12 offset — far above any generated doc_id, so re-keyed ids
    * can never collide with real train ids at any sf — guaranteed
    * overlap 1.0), flagging train docs with ≥5% 3-shingle overlap
    * against any eval doc. */
  def decontamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val eval = d.filter(
      pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 100000L)
    val train = d.filter(
        pmod(col("doc_id"), lit(97)) =!= 0 || col("doc_id") >= 100000L)
      .unionByName(
        eval.withColumn("doc_id", col("doc_id") + 1000000000000L))
    CorpusStats.decontaminate(train, eval, k = 3, minOverlapFrac = 0.05)
      .orderBy("doc_id", "eval_id")
  }

  /** q83: SEMANTIC decontamination over the q37 injection convention —
    * eval vectors = every 97th embedding (capped like q37's eval set);
    * corpus = the rest plus each eval vector re-keyed at +10^12 (an
    * embedding-identical "paraphrase" stand-in: cosine exactly 1, so
    * the contaminated stripe is flagged at any τ and any sf). Banded
    * sign-LSH probe (r=3, b=12 — high recall down to the synthetic
    * corpus's ~0.4 cross-pair cosines), τ = 0.4. q37 catches none of
    * the re-keyed stripe BY STRING at shingle level when paraphrased —
    * the OpsSpec paraphrase fixture pins the q37-misses/q83-catches
    * split explicitly. */
  def semanticDecontamQ(s: SparkSession, dir: String): DataFrame = {
    val em = embs(s, dir).select("vec_id", "embedding")
    val eval = em.filter(
      pmod(col("vec_id"), lit(97)) === 0 && col("vec_id") < 100000L)
    val corpus = em.filter(
        pmod(col("vec_id"), lit(97)) =!= 0 || col("vec_id") >= 100000L)
      .unionByName(
        eval.withColumn("vec_id", col("vec_id") + 1000000000000L))
    Dedup.semanticDecontaminate(corpus, eval, minCosine = 0.4,
      rowsPerBand = 3, nBands = 12, dim = 64).orderBy("vec_id")
  }

  /** q84: duplicated-span REMOVAL (q45's detector turned into the
    * Lee et al. intervention) — the full corpus with every token
    * covered by a corpus-duplicated 8-token window excised. */
  def dupSpanRemovalQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.dupSpanRemoval(docs(s, dir).select("doc_id", "text"),
      k = 8).orderBy("doc_id")

  /** q87: BM25 top-5 retrieval for the 10 most document-frequent
    * terms of length ≥ 5 (graft.ops.Retrieval.bm25TopK — inverted-
    * index access pattern: one corpus tokenize, broadcast query side,
    * per-query rank windows). */
  def bm25Q(s: SparkSession, dir: String): DataFrame =
    graft.ops.Retrieval.bm25TopK(docs(s, dir).select("doc_id", "text"))
      .orderBy("term", "rank")

  /** q88: per-source distinctive terms by prior-smoothed log-odds
    * z-score (Monroe et al. "Fightin' Words" — the subcorpus-drift
    * diagnostic; graft.ops.Retrieval.logOddsTerms). */
  def logOddsQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Retrieval.logOddsTerms(
        docs(s, dir).select("source", "text"))
      .orderBy("source", "rank")

  /** q89: per-doc 8-gram novelty (fraction of distinct fingerprints
    * unique to the doc corpus-wide) — the memorization-risk dual of
    * q45's duplicated-span detector. */
  def ngramNoveltyQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.ngramNovelty(docs(s, dir).select("doc_id", "text"))
      .orderBy("doc_id")

  /** q90: Efraimidis–Spirakis weighted sampling without replacement —
    * 100 docs drawn proportional to n_chars via the deterministic
    * md5-uniform, ln(u)/w order statistic (task-retry-safe, exact
    * DuckDB reproduction; TakeOrdered top-n, zero shuffle). */
  def weightedSampleQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.weightedSample(
        docs(s, dir).select("doc_id", "n_chars"),
        weightCol = "n_chars", n = 100)
      .orderBy("doc_id")

  /** q91: encoding-artifact (mojibake) scan over a corpus with a
    * deterministic injected stripe — every 13th doc gains the classic
    * UTF-8-as-Latin-1 artifacts ("cafÃ©", "Â½") plus a U+FFFD — so
    * detection counts are non-trivial (the q26 injection pattern). */
  def mojibakeQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val corpus = d.withColumn("text",
      when(pmod(col("doc_id"), lit(13)) === 0,
        concat(col("text"),
          lit(" caf\u00c3\u00a9 \u00c2\u00bd \ufffd")))
        .otherwise(col("text")))
    TextAnalysis.encodingArtifacts(corpus).orderBy("doc_id")
  }

  /** q93: cross-source near-duplicate matrix — which source pairs
    * share near-dup content (syndication/mirror detection), rolled up
    * from q32's LSH candidates. */
  def crossSourceDupsQ(s: SparkSession, dir: String): DataFrame =
    Dedup.crossSourceDupMatrix(docs(s, dir), numHashes = 8,
      minEstSim = 0.25).orderBy("src_lo", "src_hi")

  /** q94: per-source lexical diversity (type-token + distinct-bigram
    * ratios) — the template-farm / boilerplate detector. */
  def lexicalDiversityQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.lexicalDiversity(docs(s, dir)).orderBy("source")

  /** q95: blocklist (bad-word) gate with the default inlined list. */
  def blocklistQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.blocklistFilter(docs(s, dir)).orderBy("doc_id")

  /** q96: leakage-safe train/val split — split unit = dup cluster
    * (q31 pairs → q36 components), singletons their own cluster,
    * ~10% val by the md5-bucket of the cluster id. */
  def leakageSplitQ(s: SparkSession, dir: String): DataFrame =
    Dedup.leakageSafeSplit(docs(s, dir)).orderBy("doc_id")

  /** q97: content-defined chunking (token-level FastCDC posture). */
  def cdcChunksQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.cdcChunks(docs(s, dir).select("doc_id", "text"))
      .orderBy("doc_id", "chunk_idx")

  /** q98: Unicode-script composition over a corpus with deterministic
    * injected Cyrillic (every 11th doc) and CJK (every 17th doc)
    * stripes — the q91 injection pattern, so mixed-script detection
    * is non-trivial. */
  def scriptMixQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val corpus = d.withColumn("text",
      when(pmod(col("doc_id"), lit(11)) === 0,
        concat(col("text"), lit(" данные запрос")))
        .when(pmod(col("doc_id"), lit(17)) === 0,
          concat(col("text"), lit(" 数据 查询")))
        .otherwise(col("text")))
    TextAnalysis.scriptMix(corpus).orderBy("doc_id")
  }

  /** q99: LSH recall/precision audit — exact Jaccard truth vs q32's
    * MinHash-LSH candidates at the same τ = 0.25; the 1-row report
    * that qualifies a sketch config to replace the exact path. */
  def lshAuditQ(s: SparkSession, dir: String): DataFrame =
    Dedup.lshRecallAudit(docs(s, dir), tau = 0.25)

  /** q109: per-label embedding-hygiene audit
    * ([[graft.ops.Similarity.embeddingHygiene]]). */
  def embeddingHygieneQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.embeddingHygiene(embs(s, dir), expectedDim = 64)
      .orderBy("label")

  /** q122: exact-integer uniform-target mixture plan at a 30,010-token
    * budget ([[graft.ops.CorpusStats.mixturePlan]] — the remainder-10
    * budget exercises the largest-remainder +1 branch). */
  def mixturePlanQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.mixturePlan(docs(s, dir), budgetTokens = 30010L)

  /** q126: mixture-plan execution at the q122 budget
    * ([[graft.ops.CorpusStats.mixturePlanApply]]). */
  def mixturePlanApplyQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.mixturePlanApply(docs(s, dir), budgetTokens = 30010L)

  /** q191: packing-efficiency frontier at budgets {256, 1024, 4096}
    * ([[graft.ops.CorpusStats.packingSweep]]). */
  def packingSweepQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.packingSweep(docs(s, dir))

  /** q192: cross-source exact-duplicate flow matrix over a corpus with
    * a synthetic syndication stripe — every 7th doc is republished
    * verbatim under doc_id+500007 in the source named by the new id
    * mod 20 ([[graft.ops.Dedup.crossSourceDupFlow]]). */
  def crossSourceDupFlowQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text", "source")
    val corpus = d.unionByName(
      d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .withColumn("doc_id", col("doc_id") + 500007L)
        .withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(20)))))
    Dedup.crossSourceDupFlow(corpus)
  }

  /** Exact dedup demo over a corpus with a synthetic duplicate stripe
    * (every 10th doc duplicated under doc_id+100000). */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val corpus = d.unionByName(
      d.filter(pmod(col("doc_id"), lit(10)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
    Dedup.exactClusters(corpus)
      .filter(col("n_docs") > 1)
      .orderBy("text_hash")
  }

  /** Incremental-dedup demo: history = every doc_id % 3 == 0 doc
    * (distilled to fingerprints, as a production pipeline stores it);
    * the arriving batch = the other docs, plus a re-keyed stripe of
    * history texts (doc_id % 9 == 0, +300000 — cross-run duplicates)
    * and a re-keyed stripe of its own texts (doc_id % 14 == 0,
    * +400000 — within-batch duplicates). Output: what to ingest. */
  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val (batch, historyFps) = incrementalParts(s, dir)
    Dedup.incrementalNew(batch, historyFps).orderBy("doc_id")
  }

  /** Shared corpus construction for q38/q48 (see [[incrementalDedup]]
    * doc): history fps = every doc_id % 3 == 0; batch = the rest plus
    * re-keyed cross-run and within-batch duplicate stripes. */
  private def incrementalParts(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = docs(s, dir).select("doc_id", "text")
    val history = d.filter(pmod(col("doc_id"), lit(3)) === 0)
    val b0 = d.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val batch = b0
      .unionByName(history.filter(pmod(col("doc_id"), lit(9)) === 0)
        .withColumn("doc_id", col("doc_id") + 300000L))
      .unionByName(b0.filter(pmod(col("doc_id"), lit(14)) === 0)
        .withColumn("doc_id", col("doc_id") + 400000L))
    (batch, history.select(md5(col("text").cast("binary")).as("fp")))
  }

  /** q48: the SAME logical contract as q38 through the Bloom-probed
    * physical path — the variant that survives a billion-fp history.
    * Sharing q38's input construction is the point: the oracle (and
    * OpsSpec) pin bit-equality of the two paths, certifying the
    * pre-filter drops nothing. */
  def incrementalDedupBloom(s: SparkSession, dir: String): DataFrame = {
    val (batch, historyFps) = incrementalParts(s, dir)
    Dedup.incrementalNewBloom(batch, historyFps).orderBy("doc_id")
  }

  /** q45: exact-substring duplicated-span stats (8-token windows)
    * over the corpus's organic window collisions. */
  def dupSpansQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.dupSpans(docs(s, dir).select("doc_id", "text"), k = 8)
      .orderBy("doc_id")

  /** q46: CCNet-style perplexity bucketing at the quartiles of the
    * q19 unigram-LM score distribution. */
  def perplexityBucketsQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.perplexityBuckets(docs(s, dir).select("doc_id", "text"))
      .orderBy("doc_id")

  /** q47: canonical-representative selection over the q36 clusters —
    * keep the longest member per near-dup cluster (tie → min id). */
  def dedupRepresentativesQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val clusters = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(d, k = 3, minJaccard = 0.1)
        .select("doc_a", "doc_b"))
    Dedup.clusterRepresentatives(clusters, d).orderBy("cluster_id")
  }

  /** q49: one BPE merge iteration — adjacent char-pair counts over
    * the word-frequency vocabulary, top 30. */
  def bpePairsQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.bpePairCounts(docs(s, dir).select("text"), topN = 30)

  /** q50: per-source corpus card — docs, token totals, keep share. */
  def sourceReportQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.sourceReport(docs(s, dir)).orderBy("source")

  /** q51: SemDeDup keep-list over the q35 LSH near-dup pipeline
    * (same bands/threshold so the cluster structure is non-trivial
    * on the synthetic embeddings). */
  def semanticDedupQ(s: SparkSession, dir: String): DataFrame =
    Dedup.semanticDedupKeep(embs(s, dir), minCosine = 0.45,
      rowsPerBand = 4, nBands = 8).orderBy("vec_id")

  /** q52: line-level boilerplate dedup over a corpus with an injected
    * shared-footer stripe (every 5th doc gains the same second line —
    * the cross-document boilerplate the operator exists to strip;
    * sf0.01's stripe is 100 docs, comfortably past maxDocFreq 50). */
  def lineDedupQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val corpus = d.withColumn("text",
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(col("text"),
          lit("\nfooter: (c) acme corp - all rights reserved")))
        .otherwise(col("text")))
    CorpusStats.lineDedup(corpus, maxDocFreq = 50).orderBy("doc_id")
  }

  /** Temperature mixing at alpha = 0.5, half the corpus: rare sources
    * gain share, hot sources shed it; membership is the deterministic
    * md5 bucket, so DuckDB reproduces the exact sample. */
  def temperatureMixQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.temperatureMix(
        docs(s, dir).select("doc_id", "source"),
        alpha = 0.5, targetFraction = 0.5)
      .select("doc_id", "source", "keep_rate")
      .orderBy("doc_id")

  /** Unicode canonicalization before fingerprinting: every 11th doc
    * gains a decomposed-form suffix (e + combining acute, A +
    * combining ring — NOT byte-equal to their precomposed forms), and
    * the query emits the NFC fingerprint plus whether normalization
    * changed the text. DuckDB's nfc_normalize evaluates the identical
    * function, so the custom codegen'd expression is bit-exact
    * oracle-checked. */
  def unicodeNfc(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val withStripe = d.withColumn("text",
      when(pmod(col("doc_id"), lit(11)) === 0,
        // DECOMPOSED codepoints written as escapes so no editor or
        // toolchain can silently precompose them: e + U+0301 combining
        // acute, A + U+030A combining ring
        concat(col("text"), lit(" cafe\u0301 A\u030A")))
        .otherwise(col("text")))
    val nfc = graft.functions.unicode_normalize(col("text"), "NFC")
    withStripe
      .select(col("doc_id"),
        md5(nfc.cast("binary")).as("nfc_md5"),
        (nfc =!= col("text")).as("changed"))
      .orderBy("doc_id")
  }

  /** One-pass column profile of the documents table, with an injected
    * null stripe (every 13th doc's lang nulled) so null counting is
    * non-trivial. */
  def profileQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("lang",
      when(pmod(col("doc_id"), lit(13)) === 0, lit(null: String))
        .otherwise(col("lang")))
    CorpusStats.profile(d,
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      .orderBy("column")
  }

  /** Approx (HyperLogLog) column profile with the q14-style in-query
    * accuracy verdict: same null stripe as q43, `distinct_ok` instead
    * of the engine-specific estimate, so DuckDB's own
    * approx_count_distinct pins the row. */
  def profileApproxQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("lang",
      when(pmod(col("doc_id"), lit(13)) === 0, lit(null: String))
        .otherwise(col("lang")))
    CorpusStats.profileApprox(d,
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      .orderBy("column")
  }

  /** LM-style quality scoring: mean unigram negative log-prob per
    * doc, frequencies trained on the corpus itself. */
  def unigramLogProbQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.unigramLogProb(docs(s, dir).select("doc_id", "text"))
      .orderBy("doc_id")

  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, dir), k = 3, minJaccard = 0.1)
      .orderBy("doc_a", "doc_b")

  /** q80: directed shingle containment — the asymmetric near-dup
    * measure (quotation/subset duplication) Jaccard misses. */
  def containmentQ(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(docs(s, dir), k = 3, minContainment = 0.25)
      .orderBy("doc_a", "doc_b")

  def minhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshCandidates(docs(s, dir), numHashes = 8,
      minEstSim = 0.25).orderBy("doc_a", "doc_b")

  /** maxHamming = nChunks-1 = 7: the banding's pigeonhole guarantee
    * makes the result EXACT (every hamming ≤ 7 pair shares a chunk) —
    * not a recall-probabilistic candidate set. */
  def simhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(s, dir), maxHamming = 7)
      .orderBy("doc_a", "doc_b")

  /** q187: dedup-family pair-agreement Venn at the q31/q32/q33
    * registry configurations ([[graft.ops.Dedup.dedupFamilyVenn]]). */
  def dedupFamilyVennQ(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupFamilyVenn(docs(s, dir))

  def embeddingNearDup(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDups(embs(s, dir), minCosine = 0.4)
      .orderBy("vec_a", "vec_b")

  /** Sign-LSH banded near-dup (the approximate 100-TB path). The
    * oracle mirrors the LSH algorithm itself — deterministic literal
    * hyperplanes make the buckets engine-portable — so this checks the
    * banding + verify pipeline, while OpsSpec asserts measured recall
    * against the exact operator. */
  def embeddingNearDupLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupsLsh(embs(s, dir), minCosine = 0.45,
      rowsPerBand = 4, nBands = 8).orderBy("vec_a", "vec_b")

  /** Near-dup clusters: connected components over the q31 jaccard
    * pairs — the canonical-selection step after pair generation. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(docs(s, dir), k = 3, minJaccard = 0.1)
        .select("doc_a", "doc_b"))
      .orderBy("doc_id")

  def annBruteForce(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(embs(s, dir), k = 5, nQueries = 10)

  def annIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(embs(s, dir), cellCol = "label", k = 5,
      nQueries = 10)

  def annLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(embs(s, dir), nPlanes = 8, k = 5, nQueries = 10)

  /** q53: hard-negative mining for contrastive training — top-5
    * nearest different-label vectors per anchor, LSH-bucketed (coarse
    * 4-plane partition so cross-label candidates stay in-bucket). */
  def hardNegativesQ(s: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(embs(s, dir), nPlanes = 4, k = 5,
      nQueries = 10)

  /** q54: per-source quality pruning — each source keeps documents at
    * or above its own 25th-percentile stopword-ratio bar. */
  def sourcePruneQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.sourceQuantilePrune(docs(s, dir), q = 0.25)
      .orderBy("doc_id")

  /** q55: per-document TF-IDF top-3 terms over the q49 vocabulary
    * definition. */
  def tfidfTermsQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.tfidfTopTerms(docs(s, dir).select("doc_id", "text"),
      topN = 3).orderBy("doc_id", "rank")

  /** q56: sliding-window chunking, 128-token windows advancing 96
    * (32-token overlap). */
  def chunkDocsQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.chunkDocs(docs(s, dir).select("doc_id", "text"),
      chunkTokens = 128, overlap = 32).orderBy("doc_id", "chunk_idx")

  /** q57: corpus snapshot diff — new version drops every 23rd doc,
    * edits every 17th (" v2" suffix), and adds a re-keyed +500000
    * stripe of every 19th; emits the non-unchanged delta. */
  def corpusDiffQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val newC = d.filter(pmod(col("doc_id"), lit(23)) =!= 0)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(17)) === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      .unionByName(d.filter(pmod(col("doc_id"), lit(19)) === 0)
        .withColumn("doc_id", col("doc_id") + 500000L))
    CorpusStats.corpusDiff(d, newC)
      .filter(col("status") =!= "unchanged").orderBy("doc_id")
  }

  /** q58: model-based quality classifier (literal-weight logistic
    * model over the q22 feature vector). */
  def qualityClfQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityClassifier(docs(s, dir)).orderBy("doc_id")

  /** q59: whole-corpus approximate kNN graph (bucket self-join,
    * k=3). */
  def knnGraphQ(s: SparkSession, dir: String): DataFrame =
    Similarity.knnGraph(embs(s, dir), nPlanes = 4, k = 3)
      .orderBy("src", "rank")

  /** q60: deterministic training-order shuffle into 16 shards. */
  def shardAssignQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.shardAssign(docs(s, dir).select("doc_id"), nShards = 16)
      .orderBy("doc_id")

  /** q61: winnowing fingerprints, 4-token shingles, window 5. */
  def winnowQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.winnowFingerprints(docs(s, dir).select("doc_id", "text"),
      k = 4, w = 5).orderBy("doc_id", "fp")

  /** q62: overlap-candidate pairs sharing ≥2 rare winnow prints. */
  def winnowOverlapQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.winnowOverlapPairs(
        docs(s, dir).select("doc_id", "text"),
        k = 4, w = 5, maxDf = 100, minShared = 2)
      .orderBy("doc_a", "doc_b")

  /** q63: C4-style line+document rule filter with cleaned-text md5. */
  def c4FilterQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.c4Filter(docs(s, dir).select("doc_id", "text"))
      .orderBy("doc_id")

  /** q64: Gopher-style whole-document rule set. */
  def gopherFilterQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherFilter(docs(s, dir).select("doc_id", "text"))
      .orderBy("doc_id")

  /** q65: DSIR importance weights, target = English subset, 64
    * hashed-unigram buckets. */
  def dsirWeightsQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.dsirWeights(docs(s, dir).select("doc_id", "text", "lang"),
      targetPred = col("lang") === "en", nBuckets = 64)
      .orderBy("doc_id")

  /** q66: code-fence extraction. The sf corpus is fence-free prose, so
    * (q57-style) the wrapper deterministically injects fenced blocks —
    * a `lang`-tagged one on every 7th doc, a second js one on every
    * 14th — and extracts them back. */
  def codeBlocksQ(s: SparkSession, dir: String): DataFrame = {
    val injected = docs(s, dir).select(col("doc_id"), col("lang"), col("text"))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(col("text"), lit("\n```"), col("lang"),
            lit("\ndef f():\n    return "),
            col("doc_id").cast("string"), lit("\n```")))
          .otherwise(col("text")))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(14)) === 0,
          concat(col("text"), lit("\n```js\nconsole.log("),
            col("doc_id").cast("string"), lit(");\n```")))
          .otherwise(col("text")))
    TextAnalysis.codeBlocks(injected.select("doc_id", "text"))
      .orderBy("doc_id", "block_idx")
  }

  /** q67: per-label centroid + 2σ cosine outlier flag. */
  def centroidOutliersQ(s: SparkSession, dir: String): DataFrame =
    Similarity.centroidOutliers(embs(s, dir)).orderBy("vec_id")

  /** q189: label-centroid cosine-similarity matrix
    * ([[graft.ops.Similarity.labelCentroidMatrix]]). */
  def labelCentroidMatrixQ(s: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroidMatrix(embs(s, dir))

  /** q190: label-separability audit (silhouette-lite)
    * ([[graft.ops.Similarity.labelSilhouette]]). */
  def labelSilhouetteQ(s: SparkSession, dir: String): DataFrame =
    Similarity.labelSilhouette(embs(s, dir))

  /** q198: per-dimension mean/variance (dead-dimension audit)
    * ([[graft.ops.Similarity.dimVariance]]). */
  def dimVarianceQ(s: SparkSession, dir: String): DataFrame =
    Similarity.dimVariance(embs(s, dir))

  /** q200: one-row corpus card across all three modalities — the
    * headline numbers every downstream query parameterizes against:
    * document count / source vocabulary / estimated BPE token budget,
    * embedding count / label vocabulary / dimensionality, and
    * conversation / turn totals. Three bounded scalar aggs run
    * EAGERLY (each a partial+final reduce over its own table — never
    * a 1-row×1-row join, which would plan BNLJ); the returned
    * single-row literal plans zero exchanges. */
  def corpusCardQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).agg(
      count(lit(1)).as("n"),
      countDistinct(col("source")).as("ns"),
      sum(TextAnalysis.estBpeTokens(col("text"))).as("bt")).head()
    val e = embs(s, dir).agg(
      count(lit(1)), countDistinct(col("label")),
      max(size(col("embedding")))).head()
    val t = graft.queries.PipelineQueries.transcriptsUnordered(s, dir).agg(
      countDistinct(col("conv_id")), count(lit(1))).head()
    import s.implicits._
    Seq((d.getLong(0), d.getLong(1), d.getLong(2),
      e.getLong(0), e.getLong(1), e.getInt(2),
      t.getLong(0), t.getLong(1)))
      .toDF("n_docs", "n_sources", "est_bpe_tokens", "n_vectors",
        "n_labels", "dim", "n_convs", "n_turns")
  }

  /** q68: ROC-AUC of the q58 quality classifier against the corpus
    * language label (score separates en from non-en?). */
  def qualityAucQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.rocAuc(
      docs(s, dir).select(
        (col("lang") === "en").as("is_en"),
        TextAnalysis.clfScoreExpr(col("text")).as("clf_score")),
      scoreCol = "clf_score", labelCol = "is_en")

  /** q69: full BPE tokenizer training, 6 merge rounds. */
  def bpeTrainQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.bpeTrain(docs(s, dir).select("text"), nMerges = 6)
      .orderBy("iter")

  /** q70: bigram LM scoring (Laplace-smoothed conditional logprobs). */
  def bigramLogProbQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.bigramLogProb(docs(s, dir).select("doc_id", "text"))
      .orderBy("doc_id")

  /** q71: deterministic Lloyd's k-means (k=4, 3 rounds) — the coarse
    * quantizer / SemDeDup-bucket primitive, oracle-checked end to end
    * (init, every assignment round, every centroid update). */
  def kmeansQ(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansLloyd(embs(s, dir), k = 4, iters = 3)
      .orderBy("vec_id")

  /** q72: cluster-balanced downsampling on top of the q71 model. */
  def clusterSampleQ(s: SparkSession, dir: String): DataFrame =
    Similarity.clusterBalancedSample(embs(s, dir), k = 4, iters = 3,
      perCluster = 100).orderBy("vec_id")

  /** q73: encode the corpus with the q69-trained BPE merges — the
    * tokenizer's apply half (per-doc token budgets). */
  def bpeEncodeQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.bpeEncode(docs(s, dir).select("doc_id", "text"),
      nMerges = 6).orderBy("doc_id")

  /** q85: tokenizer fertility per language — the q69/q73 BPE
    * lifecycle composed with q21's language ID into the multilingual
    * fairness report (tokens/word and tokens/byte per language
    * bucket). */
  def tokenizerFertilityQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.tokenizerFertility(docs(s, dir).select("doc_id", "text"),
      nMerges = 6).orderBy("lang_guess")

  /** q74: IVF ANN with the q71 Lloyd quantizer (8 cells, 2 rounds,
    * probe 2) — the trained-IVF lifecycle, oracle-checked end to end. */
  def ivfKmeansQ(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfKmeansTopK(embs(s, dir), nCells = 8, kmIters = 2,
      nProbe = 2, k = 5, nQueries = 10)

  /** q75: IVF-PQ ANN — coarse Lloyd cells + product-quantization
    * codes with ADC lookup-table scoring (the memory-compression
    * scale path: codes, not floats, inside each probed cell). */
  def ivfPqQ(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopK(embs(s, dir), nCells = 8, coarseIters = 2,
      m = 4, codeK = 8, pqIters = 2, nProbe = 2, k = 5, nQueries = 10)

  /** q82: residual-encoded IVF-PQ — q75 at the same m/codeK budget but
    * with PQ codebooks trained on and codes indexing the within-cell
    * residual `e − coarseCentroid(cell)`, the FAISS `by_residual=true`
    * production default (absolute-coordinate codebooks waste precision
    * re-describing inter-cell structure the coarse quantizer already
    * captured). */
  def ivfPqResidualQ(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopK(embs(s, dir), nCells = 8, coarseIters = 2,
      m = 4, codeK = 8, pqIters = 2, nProbe = 2, k = 5, nQueries = 10,
      byResidual = true)

  /** q78: Zipf-law fit over the top-100 token frequencies — the
    * vocabulary health diagnostic (slope ≈ -1 for natural language). */
  def zipfFitQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.zipfFit(docs(s, dir).select("text"), topN = 100)

  /** q79: per-source unigram KL divergence vs the corpus
    * distribution — the data-mixing drift diagnostic. */
  def sourceKlQ(s: SparkSession, dir: String): DataFrame =
    CorpusStats.sourceKlDivergence(docs(s, dir)
      .select("source", "text")).orderBy("source")

  /** q76: edit-distance verification of the q33 SimHash candidates —
    * sketch proposes, Levenshtein disposes (per-pair verdicts). */
  def editDistVerifyQ(s: SparkSession, dir: String): DataFrame =
    Dedup.editDistanceVerify(docs(s, dir).select("doc_id", "text"),
      maxHamming = 7, nChunks = 8, minSim = 0.5)
      .orderBy("doc_a", "doc_b")

  /** q77: PageRank over the q59 kNN graph (3 rounds, damping 85/100,
    * dangling mass redistributed, fixed-point picos) — document
    * centrality scoring. */
  def pageRankQ(s: SparkSession, dir: String): DataFrame = {
    val em = embs(s, dir)
    GraphOps.pageRank(em.select("vec_id"),
      Similarity.knnGraph(em, nPlanes = 4, k = 3).select("src", "dst"),
      alphaPct = 85L, iters = 3).orderBy("vec_id")
  }

  // -----------------------------------------------------------------
  // DuckDB oracles
  // -----------------------------------------------------------------

  /** Shared CTE fragments. */
  private val SH =
    """w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |      FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |       FROM w, UNNEST(generate_series(1, greatest(len(w)-2, 0)))
      |         AS t(i))""".stripMargin

  private val STOPS =
    Seq(" the ", " a ", " and ", " of ", " to ", " is ")

  private[queries] def stopHitsSql(padded: String): String =
    STOPS.map(w =>
      s"(length($padded) - length(replace($padded, '$w', ''))) / ${w.length}")
      .mkString(" + ")

  private val COS =
    """round(
      |  list_sum(list_transform(list_zip(q.qe, c.embedding),
      |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
      |  (sqrt(list_sum(list_transform(q.qe,
      |     v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) *
      |   sqrt(list_sum(list_transform(c.embedding,
      |     v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 6)""".stripMargin

  /** Cosine between two aliased embedding columns. */
  private def cosSql(a: String, b: String): String =
    s"""round(
       |  list_sum(list_transform(list_zip($a, $b),
       |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
       |  (sqrt(list_sum(list_transform($a,
       |     v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) *
       |   sqrt(list_sum(list_transform($b,
       |     v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 6)""".stripMargin

  /** q33: the md5-derived 64-bit token hash (SimHash64.hash64) is
    * expressed as CAST('0x' || substr(md5(tok), 1, 16) AS UBIGINT);
    * signature bits, 4×16-bit banding and hamming verify mirror
    * Dedup.simhashPairs exactly. */
  private val simhashOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, CAST('0x' || substr(md5(t.tok), 1, 16) AS UBIGINT) AS h
      |  FROM documents, UNNEST(string_split_regex(trim(text), '\s+')) AS t(tok)),
      |bits AS (
      |  SELECT doc_id, b.b AS b,
      |    CASE WHEN sum(CASE WHEN ((h >> b.b) & 1) = 1 THEN 1 ELSE -1 END) > 0
      |      THEN (CAST(1 AS UBIGINT) << b.b) ELSE CAST(0 AS UBIGINT) END AS bit
      |  FROM tok, UNNEST(generate_series(0, 63)) AS b(b)
      |  GROUP BY doc_id, b.b),
      |sig AS (SELECT doc_id, bit_or(bit) AS sig FROM bits GROUP BY 1),
      |chunks AS (
      |  SELECT doc_id, sig, c.c AS chunk, (sig >> (c.c * 8)) & 255 AS cb
      |  FROM sig, UNNEST(generate_series(0, 7)) AS c(c)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
      |  FROM chunks a JOIN chunks b
      |    ON a.chunk = b.chunk AND a.cb = b.cb AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 7
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q42: deterministic literal-hyperplane buckets (see
    * graft.ops.Hyperplanes float-parity note) + in-bucket exact
    * cosine re-rank — mirrors Similarity.lshTopK. */
  private def annLshOracle(nPlanes: Int, k: Int, nQueries: Int,
      dim: Int): String = {
    val bucket = graft.ops.Hyperplanes.bucketSql("embedding", nPlanes, dim)
    s"""WITH s AS (SELECT vec_id, embedding, $bucket AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket
       |  FROM s WHERE vec_id < $nQueries),
       |p AS (SELECT q.query_id, c.vec_id AS neighbor_id, $COS AS cos_sim
       |  FROM s c JOIN q USING (bucket) WHERE c.vec_id <> q.query_id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM p)
       |SELECT query_id, neighbor_id, rank, cos_sim FROM r
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** q53: the annLshOracle shape with the label-mismatch predicate
    * fused into the bucket join — mirrors Similarity.hardNegatives. */
  private def hardNegOracle(nPlanes: Int, k: Int, nQueries: Int,
      dim: Int): String = {
    val bucket = graft.ops.Hyperplanes.bucketSql("embedding", nPlanes, dim)
    s"""WITH s AS (SELECT vec_id, embedding, label, $bucket AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, label AS ql,
       |    bucket
       |  FROM s WHERE vec_id < $nQueries),
       |p AS (SELECT q.query_id, q.ql AS query_label,
       |    c.vec_id AS neighbor_id, c.label AS neighbor_label,
       |    $COS AS cos_sim
       |  FROM s c JOIN q USING (bucket)
       |  WHERE c.vec_id <> q.query_id AND c.label <> q.ql),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM p)
       |SELECT query_id, query_label, neighbor_id, neighbor_label,
       |  rank, cos_sim
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** q35: banded sign-LSH candidates + exact cosine verify — mirrors
    * Dedup.embeddingNearDupsLsh (band b uses planes b·r … b·r+r-1). */
  private def nearDupLshOracle(minCos: Double, rowsPerBand: Int,
      nBands: Int, dim: Int): String = {
    val bandSelects = (0 until nBands).map { b =>
      val bits = graft.ops.Hyperplanes.bucketSql("embedding", rowsPerBand,
        dim, firstPlane = b * rowsPerBand)
      s"SELECT vec_id, $b AS band, $bits AS bits FROM embeddings"
    }.mkString("\nUNION ALL\n")
    val cos = cosSql("ea.embedding", "eb.embedding")
    s"""WITH bkt AS (
       |$bandSelects),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bkt a JOIN bkt b
       |    ON a.band = b.band AND a.bits = b.bits AND a.vec_id < b.vec_id)
       |SELECT c.vec_a, c.vec_b, $cos AS cos_sim
       |FROM cand c
       |JOIN embeddings ea ON ea.vec_id = c.vec_a
       |JOIN embeddings eb ON eb.vec_id = c.vec_b
       |WHERE $cos >= $minCos
       |ORDER BY c.vec_a, c.vec_b""".stripMargin
  }

  /** q19 body (no ORDER BY — composed by q46). */
  private val unigramLogProbOracle: String =
    """WITH toks AS (SELECT doc_id,
      |    unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents),
      |freqs AS (SELECT tok, CAST(count(*) AS DOUBLE) AS tf
      |  FROM toks GROUP BY 1),
      |tot AS (SELECT sum(tf) AS n FROM freqs)
      |SELECT doc_id,
      |  round(avg(-ln(tf / (SELECT n FROM tot))), 6) AS avg_neg_logp,
      |  count(*) AS n_tokens
      |FROM toks JOIN freqs USING (tok)
      |GROUP BY doc_id""".stripMargin

  /** q46: quartile thresholds over the q19 scores (quantile_cont ==
    * Spark's exact `percentile`, the q13-established R-7 parity),
    * rounded to 1e-6 exactly like the Spark side's inlined literals. */
  private val perplexityBucketsOracle: String =
    s"""WITH scored AS ($unigramLogProbOracle),
       |t AS (SELECT round(quantile_cont(avg_neg_logp, 0.25), 6) AS t25,
       |             round(quantile_cont(avg_neg_logp, 0.75), 6) AS t75
       |      FROM scored)
       |SELECT doc_id, avg_neg_logp,
       |  CASE WHEN avg_neg_logp <= (SELECT t25 FROM t) THEN 'head'
       |       WHEN avg_neg_logp <= (SELECT t75 FROM t) THEN 'middle'
       |       ELSE 'tail' END AS ppl_bucket
       |FROM scored ORDER BY doc_id""".stripMargin

  /** q45: 8-token sliding windows, md5-hashed; a window is duplicated
    * iff its hash occurs more than once corpus-wide — mirrors
    * CorpusStats.dupSpans. */
  private val dupSpansOracle: String =
    """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |  FROM documents),
      |g AS (SELECT doc_id, len(w) - 7 AS n_windows,
      |    md5(list_aggregate(w[i:i+7], 'string_agg', ' ')) AS h
      |  FROM w, UNNEST(generate_series(1, greatest(len(w)-7, 0))) AS t(i)),
      |d AS (SELECT h FROM g GROUP BY h HAVING count(*) > 1),
      |a AS (SELECT doc_id, n_windows, count(*) AS n_dup_windows
      |  FROM g JOIN d USING (h) GROUP BY 1, 2)
      |SELECT doc_id, CAST(n_windows AS BIGINT) AS n_windows,
      |  n_dup_windows,
      |  round(CAST(n_dup_windows AS DOUBLE) / n_windows, 6) AS dup_frac
      |FROM a ORDER BY doc_id""".stripMargin

  /** q84 oracle: q45's duplicated-window derivation with positions
    * kept, reduced to per-doc sorted start lists, then the identical
    * excision rule as a DuckDB indexed list_filter (1-based j on both
    * engines: token j survives iff no dup start in [j-7, j]) and
    * single-space rejoin; md5-equality of clean_text is implied by the
    * driver's value hash. */
  private val dupSpanRemovalOracle: String =
    """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |  FROM documents),
      |g AS (SELECT doc_id, i,
      |    md5(list_aggregate(w[i:i+7], 'string_agg', ' ')) AS h
      |  FROM w, UNNEST(generate_series(1, greatest(len(w)-7, 0))) AS t(i)),
      |d AS (SELECT h FROM g GROUP BY h HAVING count(*) > 1),
      |di AS (SELECT doc_id, list_sort(list(i)) AS idxs
      |  FROM g JOIN d USING (h) GROUP BY doc_id),
      |sel AS (SELECT w.doc_id, w.w AS toks,
      |    list_filter(w.w, (tk, j) -> len(list_filter(
      |      coalesce(di.idxs, CAST([] AS BIGINT[])),
      |      i -> i >= greatest(1, j - 7) AND i <= j)) = 0) AS kept
      |  FROM w LEFT JOIN di USING (doc_id))
      |SELECT doc_id, coalesce(array_to_string(kept, ' '), '')
      |    AS clean_text,
      |  CAST(len(toks) - len(kept) AS BIGINT) AS n_removed_tokens
      |FROM sel ORDER BY doc_id""".stripMargin

  /** q49: word-frequency vocabulary → adjacent char pairs weighted by
    * frequency (ASCII-only words, so substr semantics are portable). */
  private val bpePairsOracle: String =
    """WITH wd AS (SELECT unnest(
      |    string_split_regex(lower(trim(text)), '\s+')) AS word
      |  FROM documents),
      |v AS (SELECT word, count(*) AS n_w FROM wd
      |  WHERE regexp_matches(word, '^[a-z]+$') AND length(word) >= 2
      |  GROUP BY 1),
      |p AS (SELECT substr(word, CAST(i AS INT), 2) AS pair, n_w
      |  FROM v, UNNEST(generate_series(1, length(word)-1)) AS t(i))
      |SELECT pair, CAST(sum(n_w) AS BIGINT) AS n_occurrences
      |FROM p GROUP BY 1
      |ORDER BY n_occurrences DESC, pair LIMIT 30""".stripMargin

  private val incrementalDedupOracle: String =
    """WITH hist AS (SELECT md5(text) AS fp FROM documents
      |    WHERE doc_id % 3 = 0),
      |b0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
      |batch AS (
      |  SELECT doc_id, text FROM b0
      |  UNION ALL SELECT doc_id + 300000, text FROM documents
      |    WHERE doc_id % 3 = 0 AND doc_id % 9 = 0
      |  UNION ALL SELECT doc_id + 400000, text FROM b0
      |    WHERE doc_id % 14 = 0),
      |firsts AS (SELECT md5(text) AS fp, min(doc_id) AS doc_id
      |  FROM batch GROUP BY 1)
      |SELECT doc_id, fp FROM firsts
      |WHERE fp NOT IN (SELECT fp FROM hist)
      |ORDER BY doc_id""".stripMargin

  private val ngramJaccardOracle: String =
    s"""WITH $SH,
       |rare AS (SELECT shingle FROM
       |  (SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
       |  WHERE df <= 100),
       |shf AS (SELECT sh.doc_id, sh.shingle
       |  FROM sh JOIN rare USING (shingle)),
       |sz AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    count(*) AS i
       |  FROM shf a JOIN shf b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
       |FROM inter
       |JOIN sz sa ON sa.doc_id = doc_a
       |JOIN sz sb ON sb.doc_id = doc_b
       |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.1
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q32 oracle (shared by q93/q99): the full MinHash-LSH chain —
    * md5 minhash per (seed, shingle), r=2 banding, bucket self-join,
    * signature-agreement estimate — mirroring
    * Dedup.minhashLshCandidates bit-for-bit. */
  private val minhashLshOracle: String =
    s"""WITH $SH,
       |sig AS (SELECT doc_id, seed,
       |    min(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS minhash
       |  FROM sh, UNNEST(generate_series(0, 7)) AS q(seed)
       |  GROUP BY 1, 2),
       |bands AS (SELECT doc_id, CAST(seed // 2 AS INTEGER) AS band,
       |    max(CASE WHEN seed % 2 = 0 THEN minhash END) AS mh0,
       |    max(CASE WHEN seed % 2 = 1 THEN minhash END) AS mh1
       |  FROM sig GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.mh0 = b.mh0 AND a.mh1 = b.mh1
       |    AND a.doc_id < b.doc_id),
       |est AS (SELECT c.doc_a, c.doc_b,
       |    round(avg(CASE WHEN sa.minhash = sb.minhash
       |      THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END), 6)
       |      AS est_sim
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.doc_a
       |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, est_sim FROM est
       |WHERE est_sim >= 0.25 ORDER BY doc_a, doc_b""".stripMargin

  /** q93 oracle: q32's pairs annotated with each side's source and
    * rolled up per unordered source pair; the mean runs over the
    * EXACT integers est_sim·10⁶ (order-immune, see
    * Dedup.crossSourceDupMatrix). */
  private lazy val crossSourceDupsOracle: String =
    s"""WITH pairs AS ($minhashLshOracle),
       |j AS (SELECT least(da.source, db.source) AS src_lo,
       |    greatest(da.source, db.source) AS src_hi,
       |    CAST(round(p.est_sim * 1000000) AS BIGINT) AS sim6
       |  FROM pairs p
       |  JOIN documents da ON da.doc_id = p.doc_a
       |  JOIN documents db ON db.doc_id = p.doc_b)
       |SELECT src_lo, src_hi, count(*) AS n_pairs,
       |  round((CAST(sum(sim6) AS DOUBLE) / CAST(1000000 AS DOUBLE)) /
       |    CAST(count(*) AS DOUBLE), 6) AS avg_est_sim
       |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q94 oracle: two-level (source, gram) aggregation for unigrams
    * and bigrams — distinct counts from the same agg, no
    * COUNT(DISTINCT) expansion (mirrors CorpusStats.lexicalDiversity). */
  private val lexicalDiversityOracle: String =
    """WITH w AS (SELECT source, string_split_regex(trim(text), '\s+')
      |    AS w FROM documents),
      |uni AS (SELECT source, t.g AS gram
      |  FROM w, UNNEST(w.w) AS t(g)),
      |u AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_types
      |  FROM (SELECT source, gram, count(*) AS c FROM uni GROUP BY 1, 2)
      |  GROUP BY 1),
      |bi AS (SELECT source, w.w[i] || ' ' || w.w[i+1] AS gram
      |  FROM w, UNNEST(generate_series(1, greatest(len(w.w)-1, 0)))
      |    AS t(i)),
      |b AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |    CAST(count(*) AS BIGINT) AS n_bigram_types
      |  FROM (SELECT source, gram, count(*) AS c FROM bi GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT source, n_tokens, n_types,
      |  round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
      |    AS ttr,
      |  n_bigrams, n_bigram_types,
      |  round(CAST(n_bigram_types AS DOUBLE) / CAST(n_bigrams AS DOUBLE),
      |    6) AS bigram_ttr
      |FROM u JOIN b USING (source) ORDER BY source""".stripMargin

  /** q95 oracle: list_filter membership count over the same token
    * array + keep verdict on the ROUNDED fraction. */
  private lazy val blocklistOracle: String = {
    val inList = graft.ops.TextAnalysis.DefaultBlocklist
      .map(t => s"'$t'").mkString(", ")
    s"""WITH w AS (SELECT doc_id,
       |    string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |c AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
       |    CAST(len(list_filter(w, t -> t IN ($inList))) AS BIGINT)
       |      AS n_bad
       |  FROM w),
       |f AS (SELECT doc_id, n_tokens, n_bad,
       |    round(CAST(n_bad AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
       |      AS bad_frac
       |  FROM c)
       |SELECT doc_id, n_tokens, n_bad, bad_frac,
       |  (bad_frac <= 0.05) AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** q96 oracle: q36's recursive-CTE components, singletons defaulting
    * to their own doc_id, split by the portable md5-bucket of the
    * cluster id (mirrors Dedup.leakageSafeSplit; 409 = 100‰·4096/1000). */
  private lazy val leakageSplitOracle: String =
    s"""WITH RECURSIVE
       |p AS (SELECT doc_a, doc_b FROM ($ngramJaccardOracle) t),
       |edges AS (SELECT doc_a AS s, doc_b AS d FROM p
       |  UNION ALL SELECT doc_b, doc_a FROM p),
       |reach(node, lab) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, r.lab FROM edges e JOIN reach r ON e.d = r.node),
       |cl AS (SELECT node AS doc_id, min(lab) AS cluster_id
       |  FROM reach GROUP BY node)
       |SELECT d.doc_id,
       |  coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
       |  CASE WHEN CAST('0x' || substr(md5(CAST(
       |      coalesce(cl.cluster_id, d.doc_id) AS VARCHAR)), 1, 3)
       |      AS INT) < 409
       |    THEN 'val' ELSE 'train' END AS split
       |FROM documents d LEFT JOIN cl USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** q97 oracle: same md5-derived 16-bit boundary rule, running
    * prior-boundary count as the chunk id, ordered string_agg rebuild
    * (mirrors CorpusStats.cdcChunks). */
  private val cdcChunksOracle: String =
    """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+')
      |    AS w FROM documents),
      |tok AS (SELECT doc_id, w.w[i] AS tok, i
      |  FROM w, UNNEST(generate_series(1, len(w.w))) AS t(i)),
      |b AS (SELECT doc_id, tok, i,
      |    CASE WHEN CAST('0x' || substr(md5(tok), 1, 4) AS INT) % 8 = 0
      |      THEN 1 ELSE 0 END AS bnd
      |  FROM tok),
      |c AS (SELECT doc_id, tok, i,
      |    coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS chunk_idx
      |  FROM b)
      |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      |  CAST(count(*) AS BIGINT) AS n_tokens,
      |  md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_hash
      |FROM c GROUP BY 1, 2 ORDER BY doc_id, chunk_idx""".stripMargin

  /** q98 oracle: identical injected Cyrillic/CJK stripes (chr()-built,
    * no literal-encoding risk), then the SAME split-to-chars +
    * codepoint range counts (DuckDB string_split(text,'')+unicode ≡
    * Spark split(text,'')+ascii on BMP input — verified empirically). */
  private lazy val scriptMixOracle: String = {
    def chrs(s: String): String =
      s.codePoints().toArray.map(cp => s"chr($cp)").mkString(" || ")
    val cyr = chrs(" данные" +
      " запрос")
    val cjk = chrs(" 数据 查询")
    s"""WITH c AS (SELECT doc_id,
       |    CASE WHEN doc_id % 11 = 0 THEN text || $cyr
       |      WHEN doc_id % 17 = 0 THEN text || $cjk
       |      ELSE text END AS text
       |  FROM documents),
       |cp AS (SELECT doc_id,
       |    list_transform(string_split(text, ''), ch -> unicode(ch))
       |      AS cps
       |  FROM c),
       |m AS (SELECT doc_id,
       |    CAST(len(list_filter(cps, p -> (p >= 65 AND p <= 90) OR
       |      (p >= 97 AND p <= 122))) AS BIGINT) AS n_latin,
       |    CAST(len(list_filter(cps, p -> p >= 1024 AND p <= 1279))
       |      AS BIGINT) AS n_cyrillic,
       |    CAST(len(list_filter(cps, p -> p >= 19968 AND p <= 40959))
       |      AS BIGINT) AS n_cjk,
       |    CAST(len(list_filter(cps, p -> p >= 48 AND p <= 57))
       |      AS BIGINT) AS n_digit
       |  FROM cp)
       |SELECT doc_id, n_latin, n_cyrillic, n_cjk, n_digit,
       |  CAST(CAST(n_latin > 0 AS INT) + CAST(n_cyrillic > 0 AS INT) +
       |    CAST(n_cjk > 0 AS INT) AS INT) AS n_scripts,
       |  CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk
       |      THEN 'latin'
       |    WHEN n_cyrillic >= n_cjk THEN 'cyrillic'
       |    ELSE 'cjk' END AS main_script,
       |  (CAST(n_latin > 0 AS INT) + CAST(n_cyrillic > 0 AS INT) +
       |    CAST(n_cjk > 0 AS INT) >= 2) AS is_mixed
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** q99 oracle: exact-Jaccard truth at τ (q31's chain, outer filter
    * on the ROUNDED value like the Spark side) FULL OUTER JOINed with
    * q32's LSH candidates, bucketed into hit/miss/spurious. */
  private lazy val lshAuditOracle: String =
    s"""WITH truth AS (SELECT doc_a, doc_b
       |  FROM ($ngramJaccardOracle) t WHERE jaccard >= 0.25),
       |cand AS (SELECT doc_a, doc_b FROM ($minhashLshOracle) c),
       |j AS (SELECT t.doc_a IS NOT NULL AS in_t,
       |    c.doc_a IS NOT NULL AS in_c
       |  FROM truth t FULL OUTER JOIN cand c
       |    ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
       |agg AS (SELECT
       |    CAST(sum(CASE WHEN in_t THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_truth,
       |    CAST(sum(CASE WHEN in_c THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_cand,
       |    CAST(sum(CASE WHEN in_t AND in_c THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_hit
       |  FROM j)
       |SELECT n_truth, n_cand, n_hit,
       |  round(CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE), 6)
       |    AS recall,
       |  round(CAST(n_hit AS DOUBLE) / CAST(n_cand AS DOUBLE), 6)
       |    AS precision
       |FROM agg""".stripMargin

  /** q80 oracle: the q31 intersection chain, containment both ways,
    * verdict threshold on the ROUNDED values (mirrors
    * Dedup.containmentPairs' filter-after-round). */
  private val containmentOracle: String =
    s"""WITH $SH,
       |rare AS (SELECT shingle FROM
       |  (SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
       |  WHERE df <= 100),
       |shf AS (SELECT sh.doc_id, sh.shingle
       |  FROM sh JOIN rare USING (shingle)),
       |sz AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    count(*) AS i
       |  FROM shf a JOIN shf b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(CAST(i AS DOUBLE) / sa.n, 6) AS containment_a,
       |  round(CAST(i AS DOUBLE) / sb.n, 6) AS containment_b
       |FROM inter
       |JOIN sz sa ON sa.doc_id = doc_a
       |JOIN sz sb ON sb.doc_id = doc_b
       |WHERE greatest(round(CAST(i AS DOUBLE) / sa.n, 6),
       |  round(CAST(i AS DOUBLE) / sb.n, 6)) >= 0.25
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q47: q36's recursive-CTE components + token counts + the
    * deterministic argmax (longest member, ties to min doc_id) —
    * mirrors Dedup.clusterRepresentatives. */
  private lazy val clusterRepsOracle: String =
    s"""WITH RECURSIVE
       |p AS (SELECT doc_a, doc_b FROM ($ngramJaccardOracle) t),
       |edges AS (SELECT doc_a AS s, doc_b AS d FROM p
       |  UNION ALL SELECT doc_b, doc_a FROM p),
       |reach(node, lab) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, r.lab FROM edges e JOIN reach r ON e.d = r.node),
       |cl AS (SELECT node AS doc_id, min(lab) AS cluster_id
       |  FROM reach GROUP BY node),
       |tok AS (SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |j AS (SELECT cl.cluster_id, cl.doc_id, tok.n_tokens
       |  FROM cl JOIN tok USING (doc_id)),
       |r AS (SELECT *,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY n_tokens DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY cluster_id) AS n_members
       |  FROM j)
       |SELECT cluster_id, doc_id AS rep_doc_id,
       |  CAST(n_members AS BIGINT) AS n_members, n_tokens AS rep_tokens
       |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  /** q51: the q35-parameter LSH near-dup pairs → min-label components
    * (q36's recursive CTE) → keep everything except non-representative
    * members — mirrors Dedup.semanticDedupKeep. */
  private lazy val semanticDedupOracle: String =
    s"""WITH RECURSIVE
       |pr AS (SELECT vec_a AS doc_a, vec_b AS doc_b
       |  FROM (${nearDupLshOracle(minCos = 0.45, rowsPerBand = 4,
           nBands = 8, dim = 64)}) t),
       |edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
       |  UNION ALL SELECT doc_b, doc_a FROM pr),
       |reach(node, lab) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, r.lab FROM edges e JOIN reach r ON e.d = r.node),
       |cl AS (SELECT node AS doc_id, min(lab) AS cluster_id
       |  FROM reach GROUP BY node),
       |drops AS (SELECT doc_id FROM cl WHERE doc_id <> cluster_id)
       |SELECT vec_id FROM embeddings
       |WHERE vec_id NOT IN (SELECT doc_id FROM drops)
       |ORDER BY vec_id""".stripMargin

  /** q26's injected corpus + the exact regexes from TextAnalysis
    * (RE2-compatible subset — same pattern strings run in both
    * engines). */
  private val piiScrubOracle: String = {
    val email = TextAnalysis.EmailRe
    val phone = TextAnalysis.PhoneRe
    s"""WITH corpus AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN
       |      text || ' Contact user' || CAST(doc_id AS VARCHAR) ||
       |      '@example.com or 555-' ||
       |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
       |    ELSE text END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT)
       |    AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT)
       |    AS n_phones,
       |  md5(regexp_replace(regexp_replace(text, '$email', '[EMAIL]', 'g'),
       |    '$phone', '[PHONE]', 'g')) AS scrubbed_hash
       |FROM corpus ORDER BY doc_id""".stripMargin
  }

  /** q37: mirrors CorpusStats.decontaminate over the injected corpus —
    * distinct 3-shingles, per-train-doc shingle counts, overlap frac.
    * Same eval cap (id < 100000) and collision-proof 10^12 re-key
    * offset as the Spark side; the final filter compares the ROUNDED
    * frac, matching Spark's round(...,6)-then-filter order. */
  private val decontaminationOracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE doc_id % 97 <> 0 OR doc_id >= 100000
      |  UNION ALL
      |  SELECT doc_id + 1000000000000, text FROM documents
      |  WHERE doc_id % 97 = 0 AND doc_id < 100000),
      |tw AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |  FROM corpus),
      |tsh AS (SELECT DISTINCT doc_id,
      |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM tw, UNNEST(generate_series(1, greatest(len(w)-2, 0))) AS t(i)),
      |ew AS (SELECT doc_id AS eval_id,
      |    string_split_regex(trim(text), '\s+') AS w
      |  FROM documents WHERE doc_id % 97 = 0 AND doc_id < 100000),
      |esh AS (SELECT DISTINCT eval_id,
      |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM ew, UNNEST(generate_series(1, greatest(len(w)-2, 0))) AS t(i)),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM tsh GROUP BY 1),
      |ov AS (SELECT t.doc_id, e.eval_id, count(*) AS n_shared
      |  FROM tsh t JOIN esh e USING (shingle) GROUP BY 1, 2)
      |SELECT ov.doc_id, ov.eval_id,
      |  round(CAST(n_shared AS DOUBLE) / n_sh, 6) AS overlap_frac
      |FROM ov JOIN sz ON sz.doc_id = ov.doc_id
      |WHERE round(CAST(n_shared AS DOUBLE) / n_sh, 6) >= 0.05
      |ORDER BY ov.doc_id, ov.eval_id""".stripMargin

  private val repetitionOracle: String =
    """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |g AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS ng
        |  FROM w, UNNEST(generate_series(1, greatest(len(w)-1, 0))) AS t(i)),
        |c AS (SELECT doc_id, ng, count(*) AS c FROM g GROUP BY 1, 2),
        |s AS (SELECT doc_id, sum(c) AS n, max(c) AS mx,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
        |  FROM c GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(s.n, 0) AS BIGINT) AS n_ngrams,
        |  round(CAST(coalesce(s.mx, 0) AS DOUBLE) /
        |    greatest(coalesce(s.n, 0), 1), 4) AS top_ngram_frac,
        |  round(CAST(coalesce(s.dup, 0) AS DOUBLE) /
        |    greatest(coalesce(s.n, 0), 1), 4) AS dup_ngram_frac,
        |  -- keep gate evaluates the ROUNDED fracs (same as the Spark side)
        |  (round(CAST(coalesce(s.mx, 0) AS DOUBLE) /
        |     greatest(coalesce(s.n, 0), 1), 4) < 0.10 AND
        |   round(CAST(coalesce(s.dup, 0) AS DOUBLE) /
        |     greatest(coalesce(s.n, 0), 1), 4) < 0.15) AS keep_rep
        |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin

  private val langIdOracle: String =
    s"""WITH f AS (SELECT doc_id, text,
       |  ' ' || lower(text) || ' ' AS p,
       |  greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS nt
       |  FROM documents)
       |SELECT doc_id,
       |  CASE
       |    WHEN regexp_matches(text, '[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}]') THEN 'cjk'
       |    WHEN (${stopHitsSql("p")}) / nt >= 0.03 THEN 'en'
       |    WHEN length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) /
       |         CAST(greatest(length(text), 1) AS DOUBLE) >= 0.9 THEN 'latin_other'
       |    ELSE 'other' END AS lang_guess
       |FROM f ORDER BY doc_id""".stripMargin

  private val qualityOracle: String =
    s"""WITH f AS (SELECT doc_id, text,
       |  ' ' || lower(text) || ' ' AS p,
       |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS nt,
       |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS np
       |  FROM documents)
       |SELECT doc_id, nt AS n_tokens, np AS n_punct,
       |  CAST(${stopHitsSql("p")} AS BIGINT) AS n_stopwords,
       |  round(CAST(length(text) AS DOUBLE) / greatest(nt, 1), 4)
       |    AS mean_token_len,
       |  round(CAST(CAST(${stopHitsSql("p")} AS BIGINT) AS DOUBLE) /
       |    greatest(nt, 1), 4) AS stopword_ratio,
       |  (nt BETWEEN 10 AND 2000 AND
       |   CAST(np AS DOUBLE) / greatest(nt, 1) < 0.5) AS keep
       |FROM f ORDER BY doc_id""".stripMargin

  /** q27: composed verbatim from the component oracles (q22 keep, q24
    * keep_rep, q21 lang) — the composite cannot drift from them. */
  private val corpusFilterOracle: String =
    s"""SELECT q.doc_id,
       |  q.keep AS keep_quality,
       |  r.keep_rep AS keep_rep,
       |  (l.lang_guess = 'en') AS keep_lang,
       |  (q.keep AND r.keep_rep AND l.lang_guess = 'en') AS keep
       |FROM ($qualityOracle) q
       |JOIN ($repetitionOracle) r ON r.doc_id = q.doc_id
       |JOIN ($langIdOracle) l ON l.doc_id = q.doc_id
       |ORDER BY q.doc_id""".stripMargin

  /** q50: composed from q27's oracle (the keep gate) + the q20 token
    * expressions, aggregated by source — the composite cannot drift
    * from its components. */
  private lazy val sourceReportOracle: String =
    s"""WITH cf AS ($corpusFilterOracle),
       |tk AS (SELECT doc_id, source,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
       |      AS nt,
       |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS bt
       |  FROM documents)
       |SELECT tk.source,
       |  count(*) AS n_docs,
       |  CAST(sum(nt) AS BIGINT) AS total_tokens,
       |  round(avg(nt), 4) AS avg_tokens,
       |  CAST(sum(bt) AS BIGINT) AS total_est_bpe,
       |  CAST(count(*) FILTER (WHERE cf.keep) AS BIGINT) AS n_keep,
       |  round(CAST(count(*) FILTER (WHERE cf.keep) AS DOUBLE) /
       |    count(*), 6) AS keep_frac
       |FROM tk JOIN cf USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q52: same injected footer stripe; hot = lines in > 50 distinct
    * docs; rebuilt text md5 over kept lines in order — mirrors
    * CorpusStats.lineDedup. */
  private val lineDedupOracle: String =
    """WITH c AS (SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || chr(10) ||
      |      'footer: (c) acme corp - all rights reserved'
      |    ELSE text END AS text
      |  FROM documents),
      |l AS (SELECT doc_id, len(ln) AS n_lines, i AS idx, ln[i] AS line
      |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ln FROM c),
      |    UNNEST(generate_series(1, len(ln))) AS t(i)),
      |hot AS (SELECT md5(line) AS lh FROM l GROUP BY 1
      |  HAVING count(DISTINCT doc_id) > 50),
      |k AS (SELECT doc_id, n_lines, idx, line FROM l
      |  WHERE md5(line) NOT IN (SELECT lh FROM hot))
      |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
      |  count(*) AS n_kept,
      |  md5(string_agg(line, chr(10) ORDER BY idx)) AS clean_md5
      |FROM k GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  /** q54: same stopword-ratio formula as q22's oracle, per-source
    * quantile_cont threshold (the q13-established R-7 parity with
    * Spark's exact percentile) — mirrors
    * CorpusStats.sourceQuantilePrune. */
  private lazy val sourcePruneOracle: String =
    s"""WITH f AS (SELECT doc_id, source,
       |    ' ' || lower(text) || ' ' AS p,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
       |      AS nt
       |  FROM documents),
       |s AS (SELECT doc_id, source,
       |    round(CAST(CAST(${stopHitsSql("p")} AS BIGINT) AS DOUBLE) /
       |      greatest(nt, 1), 4) AS stopword_ratio
       |  FROM f),
       |t AS (SELECT source,
       |    round(quantile_cont(stopword_ratio, 0.25), 6)
       |      AS src_threshold
       |  FROM s GROUP BY 1)
       |SELECT s.doc_id, s.source, s.stopword_ratio, t.src_threshold,
       |  s.stopword_ratio >= t.src_threshold AS keep
       |FROM s JOIN t USING (source) ORDER BY s.doc_id""".stripMargin

  /** q55: tf per (doc, term) over the q49 word definition, df from the
    * same aggregate, N = corpus document count; rank on the ROUNDED
    * score with term tie-break — mirrors CorpusStats.tfidfTopTerms. */
  private val tfidfTermsOracle: String =
    """WITH wd AS (SELECT doc_id, unnest(
      |    string_split_regex(lower(trim(text)), '\s+')) AS term
      |  FROM documents),
      |f AS (SELECT doc_id, term, count(*) AS tf FROM wd
      |  WHERE regexp_matches(term, '^[a-z]+$') AND length(term) >= 2
      |  GROUP BY 1, 2),
      |d AS (SELECT term, count(*) AS df FROM f GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |sc AS (SELECT f.doc_id, f.term, f.tf,
      |    round(f.tf * ln(CAST((SELECT n FROM n) AS DOUBLE) / d.df), 6)
      |      AS tfidf
      |  FROM f JOIN d USING (term)),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
      |    ORDER BY tfidf DESC, term) AS INTEGER) AS rank
      |  FROM sc)
      |SELECT doc_id, term, tf, tfidf, rank FROM r
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** q56: same 1-based inclusive slicing as Spark's `slice`; explicit
    * integer `//` on the chunk index (DuckDB CAST(double AS INT)
    * rounds, it doesn't truncate) — mirrors CorpusStats.chunkDocs at
    * chunkTokens=128, overlap=32 (stride 96). */
  private val chunkDocsOracle: String =
    """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+')
      |    AS toks
      |  FROM documents),
      |c AS (SELECT doc_id, CAST((s - 1) // 96 AS INT) AS chunk_idx,
      |    toks[s:s+127] AS ch
      |  FROM w, UNNEST(generate_series(1, greatest(len(toks), 1), 96))
      |    AS t(s))
      |SELECT doc_id, chunk_idx, CAST(len(ch) AS BIGINT)
      |    AS n_chunk_tokens,
      |  md5(list_aggregate(ch, 'string_agg', ' ')) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** q57: the same stripe edits, full-outer hash compare — mirrors
    * CorpusStats.corpusDiff over corpusDiffQ's versions. */
  private val corpusDiffOracle: String =
    """WITH oldc AS (SELECT doc_id, md5(text) AS h FROM documents),
      |newc AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 17 = 0 THEN text || ' v2'
      |        ELSE text END) AS h
      |  FROM documents WHERE doc_id % 23 <> 0
      |  UNION ALL
      |  SELECT doc_id + 500000, md5(text) FROM documents
      |  WHERE doc_id % 19 = 0),
      |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |    CASE WHEN o.doc_id IS NULL THEN 'added'
      |         WHEN n.doc_id IS NULL THEN 'removed'
      |         WHEN o.h = n.h THEN 'unchanged'
      |         ELSE 'changed' END AS status
      |  FROM oldc o FULL OUTER JOIN newc n ON o.doc_id = n.doc_id)
      |SELECT doc_id, status FROM j WHERE status <> 'unchanged'
      |ORDER BY doc_id""".stripMargin

  /** q58: identical literal weights and rounded features — mirrors
    * TextAnalysis.qualityClassifier. */
  private lazy val qualityClfOracle: String =
    s"""WITH f AS (SELECT doc_id, text,
       |    ' ' || lower(text) || ' ' AS p,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
       |      AS nt
       |  FROM documents),
       |s AS (SELECT doc_id, nt,
       |    round(CAST(CAST(${stopHitsSql("p")} AS BIGINT) AS DOUBLE) /
       |      greatest(nt, 1), 4) AS stopword_ratio,
       |    round(CAST(length(text) AS DOUBLE) / greatest(nt, 1), 4)
       |      AS mean_token_len,
       |    round(CAST(len(regexp_extract_all(text, '[.,!?;:]'))
       |        AS DOUBLE) / greatest(nt, 1), 4) AS punct_ratio
       |  FROM f),
       |sc AS (SELECT doc_id, stopword_ratio, mean_token_len,
       |    punct_ratio,
       |    round(1.0 / (1.0 + exp(-(-2.0 + 6.0 * stopword_ratio +
       |      0.3 * mean_token_len - 4.0 * punct_ratio +
       |      0.2 * ln(nt + 1)))), 6) AS clf_score
       |  FROM s)
       |SELECT doc_id, stopword_ratio, mean_token_len, punct_ratio,
       |  clf_score, clf_score >= 0.5 AS keep_clf
       |FROM sc ORDER BY doc_id""".stripMargin

  /** Shared s/p/r chain of the whole-corpus in-bucket kNN graph —
    * mirrors Similarity.knnGraph; consumed by q59 and q77. */
  private def knnCtes(nPlanes: Int, dim: Int): String = {
    val bucket = graft.ops.Hyperplanes.bucketSql("embedding", nPlanes, dim)
    val cos = cosSql("a.embedding", "b.embedding")
    s"""s AS (SELECT vec_id, embedding, $bucket AS bucket
       |  FROM embeddings),
       |p AS (SELECT a.vec_id AS src, b.vec_id AS dst, $cos AS cos_sim
       |  FROM s a JOIN s b
       |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY src
       |    ORDER BY cos_sim DESC, dst) AS INTEGER) AS rank
       |  FROM p)""".stripMargin
  }

  /** q59: whole-corpus in-bucket all-pairs top-k — mirrors
    * Similarity.knnGraph. */
  private def knnGraphOracle(nPlanes: Int, k: Int, dim: Int): String =
    s"""WITH ${knnCtes(nPlanes, dim)}
       |SELECT src, dst, rank, cos_sim FROM r WHERE rank <= $k
       |ORDER BY src, rank""".stripMargin

  /** q181 oracle: per sub-space count m, the q71 kmeansCtes chains
    * over the embedding slices, per-vector min squared distance per
    * sub-space (the PQ reconstruction error), summed row-locally and
    * rounded to 1e-6 micro-units before the corpus sum — mirrors
    * Similarity.pqDistortionSweep fold-for-fold. */
  private def pqDistortionOracle(ms: Seq[Int], codeK: Int,
      pqIters: Int, dim: Int): String = {
    def sliceExpr(subDim: Int, s: Int) =
      s"list_transform(embedding[${s * subDim + 1}:${(s + 1) * subDim}]," +
        " v -> CAST(v AS DOUBLE))"
    val blocks = ms.map { m =>
      val subDim = dim / m
      val chains = (0 until m).map(s =>
        kmeansCtes(codeK, pqIters, s"x${m}s$s", sliceExpr(subDim, s)))
        .mkString(",\n")
      val mins = (0 until m).map { s =>
        s"""x${m}md$s AS MATERIALIZED (SELECT v.vec_id,
           |    min(list_reduce(list_transform(list_zip(v.e, cc.cent),
           |        x -> (x[1] - x[2]) * (x[1] - x[2])),
           |      (acc, t2) -> acc + t2)) AS md
           |  FROM x${m}s${s}e v CROSS JOIN x${m}s${s}c$pqIters cc
           |  GROUP BY v.vec_id)""".stripMargin
      }.mkString(",\n")
      val joins = (1 until m)
        .map(s => s"JOIN x${m}md$s j$s USING (vec_id)").mkString(" ")
      val sumMd = (0 until m).map(s => s"j$s.md").mkString(" + ")
      val tail =
        s"""x${m}dist AS MATERIALIZED (SELECT
           |    CAST(round(round($sumMd, 6) * 1000000, 0) AS BIGINT)
           |      AS ppm
           |  FROM x${m}md0 j0 $joins),
           |x${m}agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(coalesce(sum(ppm), 0) AS BIGINT) AS s
           |  FROM x${m}dist)""".stripMargin
      s"$chains,\n$mins,\n$tail"
    }.mkString(",\n")
    val rows = ms.map(m =>
      s"""SELECT $m AS m, $codeK AS code_k, n AS n_vectors,
         |  round(CAST(s AS DOUBLE) / 1000000.0 / n, 6)
         |    AS mean_sq_dist
         |FROM x${m}agg""".stripMargin).mkString("\nUNION ALL\n")
    s"WITH $blocks\n$rows\nORDER BY m"
  }

  /** q180 oracle: per-source function-word counts via the replace-
    * length trick (exact integers), pairwise cosine with the same
    * na·nb association as the driver arithmetic — mirrors
    * TextAnalysis.stopwordProfileSim, generated from the SAME
    * FunctionWords list. */
  private lazy val stopwordProfileOracle: String = {
    val ws = graft.ops.TextAnalysis.FunctionWords
    val cols = ws.zipWithIndex.map { case (w, i) =>
      val pw = s" $w "
      s"CAST(sum(CAST((length(p) - length(replace(p, '$pw', ''))) " +
        s"/ ${pw.length} AS BIGINT)) AS BIGINT) AS c$i"
    }.mkString(",\n    ")
    val dot = ws.indices.map(i => s"a.c$i * b.c$i").mkString(" + ")
    val na = ws.indices.map(i => s"a.c$i * a.c$i").mkString(" + ")
    val nb = ws.indices.map(i => s"b.c$i * b.c$i").mkString(" + ")
    s"""WITH p0 AS (SELECT source, ' ' || lower(text) || ' ' AS p
       |  FROM documents),
       |prof AS (SELECT source,
       |    $cols
       |  FROM p0 GROUP BY source),
       |pairs AS (SELECT a.source AS source_a, b.source AS source_b,
       |    CAST($dot AS BIGINT) AS dot,
       |    CAST($na AS BIGINT) AS na2,
       |    CAST($nb AS BIGINT) AS nb2
       |  FROM prof a JOIN prof b ON a.source < b.source)
       |SELECT source_a, source_b,
       |  CASE WHEN na2 = 0 OR nb2 = 0 THEN 0.0
       |    ELSE round(CAST(dot AS DOUBLE) /
       |      (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))),
       |      6) END AS profile_cos
       |FROM pairs ORDER BY source_a, source_b""".stripMargin
  }

  /** q173 oracle: the q59 kNN chain at k=2, the TwoNN discard rule
    * (d₁ = 0 or missing second neighbor), per-point ln μ rounded to
    * 1e-6 and summed as exact integer micro-units — mirrors
    * Similarity.twoNnDimension. */
  private def twoNnOracle(nPlanes: Int, dim: Int): String =
    s"""WITH ${knnCtes(nPlanes, dim)},
       |two AS (SELECT src,
       |    max(CASE WHEN rank = 1 THEN cos_sim END) AS cos1,
       |    max(CASE WHEN rank = 2 THEN cos_sim END) AS cos2
       |  FROM r WHERE rank <= 2 GROUP BY src),
       |u AS (SELECT src,
       |    CAST(round(round(ln((1.0 - cos2) / (1.0 - cos1)), 6)
       |      * 1000000, 0) AS BIGINT) AS ln_ppm
       |  FROM two
       |  WHERE cos2 IS NOT NULL AND cos1 < 1.0),
       |a AS (SELECT
       |    (SELECT CAST(count(*) AS BIGINT) FROM embeddings)
       |      AS n_vectors,
       |    CAST(count(*) AS BIGINT) AS n_used,
       |    CAST(coalesce(sum(ln_ppm), 0) AS BIGINT) AS s FROM u)
       |SELECT n_vectors, n_used,
       |  round(CAST(s AS DOUBLE) / 1000000.0, 6) AS sum_ln_mu,
       |  CASE WHEN s > 0
       |    THEN round(CAST(n_used AS DOUBLE) * 1000000.0 / s, 6)
       |    ELSE 0.0 END AS intrinsic_dim
       |FROM a""".stripMargin

  /** q77 oracle: the q59 kNN edge chain, then fixed-point PageRank
    * unrolled (3 rounds, damping 85/100) — all rank mass in integer
    * picos (1e12 = 1.0), shares via `//` integer division, exact
    * integer contribution sums (summation-order-immune, no float
    * rounding anywhere; mirrors GraphOps.pageRank); the one double,
    * pagerank = pico / 1e12, is a single exact-input IEEE division. */
  private def pageRankOracle(nPlanes: Int, k: Int, dim: Int,
      alphaPct: Long, iters: Int): String = {
    val s = "1000000000000"
    val rounds = (1 to iters).map { t =>
      val prev = s"pr${t - 1}"
      s"""d$t AS (SELECT coalesce(sum(pr), 0) AS dang
         |  FROM $prev LEFT JOIN deg ON $prev.vec_id = deg.src
         |  WHERE deg.src IS NULL),
         |c$t AS (SELECT e.dst AS vec_id,
         |    sum($prev.pr // deg.outdeg) AS c
         |  FROM e2 e JOIN $prev ON e.src = $prev.vec_id
         |    JOIN deg ON e.src = deg.src
         |  GROUP BY e.dst),
         |pr$t AS MATERIALIZED (SELECT nn.vec_id,
         |    (($s * ${100 - alphaPct} // 100) // (SELECT nN FROM cnt)
         |      + ((SELECT dang FROM d$t) * $alphaPct // 100)
         |          // (SELECT nN FROM cnt)
         |      + coalesce(c$t.c, 0) * $alphaPct // 100) AS pr
         |  FROM nn LEFT JOIN c$t USING (vec_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${knnCtes(nPlanes, dim)},
       |e2 AS MATERIALIZED (SELECT src, dst FROM r WHERE rank <= $k),
       |nn AS MATERIALIZED (SELECT vec_id FROM embeddings),
       |cnt AS MATERIALIZED (SELECT count(*) AS nN FROM nn),
       |deg AS MATERIALIZED (SELECT src, count(*) AS outdeg
       |  FROM e2 GROUP BY src),
       |pr0 AS MATERIALIZED (SELECT vec_id,
       |    $s // (SELECT nN FROM cnt) AS pr FROM nn),
       |$rounds
       |SELECT vec_id, CAST(pr AS BIGINT) AS pagerank_pico,
       |  pr / 1000000000000.0 AS pagerank
       |FROM pr$iters ORDER BY vec_id""".stripMargin
  }

  /** q76 oracle: the q33 SimHash banding chain proposes candidate
    * pairs; DuckDB's levenshtein (same unit-cost character metric as
    * Spark's codegen'd kernel) disposes — integer lev, fixed-order
    * ratio, round 1e-6, verdict on the rounded value. */
  private def editDistVerifyOracle(maxHamming: Int,
      minSim: Double): String =
    s"""WITH tok AS (
       |  SELECT doc_id, CAST('0x' || substr(md5(t.tok), 1, 16) AS UBIGINT) AS h
       |  FROM documents, UNNEST(string_split_regex(trim(text), '\\s+')) AS t(tok)),
       |bits AS (
       |  SELECT doc_id, b.b AS b,
       |    CASE WHEN sum(CASE WHEN ((h >> b.b) & 1) = 1 THEN 1 ELSE -1 END) > 0
       |      THEN (CAST(1 AS UBIGINT) << b.b) ELSE CAST(0 AS UBIGINT) END AS bit
       |  FROM tok, UNNEST(generate_series(0, 63)) AS b(b)
       |  GROUP BY doc_id, b.b),
       |sig AS (SELECT doc_id, bit_or(bit) AS sig FROM bits GROUP BY 1),
       |chunks AS (
       |  SELECT doc_id, sig, c.c AS chunk, (sig >> (c.c * 8)) & 255 AS cb
       |  FROM sig, UNNEST(generate_series(0, 7)) AS c(c)),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |  FROM chunks a JOIN chunks b
       |    ON a.chunk = b.chunk AND a.cb = b.cb AND a.doc_id < b.doc_id),
       |cand AS (SELECT doc_a, doc_b, hamming FROM pairs
       |  WHERE hamming <= $maxHamming),
       |v AS (SELECT c.doc_a, c.doc_b, c.hamming,
       |    CAST(levenshtein(da.text, db.text) AS INTEGER) AS lev,
       |    round(1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE) /
       |      CAST(greatest(length(da.text), length(db.text)) AS DOUBLE),
       |      6) AS edit_sim
       |  FROM cand c JOIN documents da ON c.doc_a = da.doc_id
       |    JOIN documents db ON c.doc_b = db.doc_id)
       |SELECT doc_a, doc_b, hamming, lev, edit_sim,
       |  edit_sim >= $minSim AS is_dup
       |FROM v ORDER BY doc_a, doc_b""".stripMargin

  /** q60: same 48-bit md5-prefix permutation key and per-shard
    * row_number — mirrors CorpusStats.shardAssign at nShards=16. */
  private val shardAssignOracle: String =
    """WITH k AS (SELECT doc_id,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
      |      AS BIGINT) AS h
      |  FROM documents),
      |s AS (SELECT doc_id, h, CAST(h % 16 AS INT) AS shard FROM k)
      |SELECT doc_id, shard,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
      |    AS BIGINT) AS pos
      |FROM s ORDER BY doc_id""".stripMargin

  /** Shared winnowing CTE body (k=4, w=5): identical shingle hashing
    * (space-joined 4-grams → md5 hex) and lexicographic window minima
    * — mirrors CorpusStats.winnowFingerprints. */
  private val winnowFpsCte: String =
    """t AS (SELECT doc_id,
      |    string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (SELECT doc_id,
      |    CASE WHEN len(toks) >= 4 THEN
      |      list_transform(generate_series(1, len(toks) - 3),
      |        i -> md5(list_aggregate(toks[i:i+3], 'string_agg', ' ')))
      |    ELSE CAST([] AS VARCHAR[]) END AS grams
      |  FROM t),
      |m AS (SELECT doc_id,
      |    CASE WHEN len(grams) >= 5 THEN
      |      list_distinct(list_transform(generate_series(1, len(grams) - 4),
      |        j -> list_min(grams[j:j+4])))
      |    ELSE CAST([] AS VARCHAR[]) END AS fps
      |  FROM g),
      |f AS (SELECT doc_id, unnest(fps) AS fp FROM m)""".stripMargin

  /** q61 — the fingerprint table itself. */
  private lazy val winnowOracle: String =
    s"""WITH $winnowFpsCte
       |SELECT doc_id, fp FROM f ORDER BY doc_id, fp""".stripMargin

  /** q62: hot-fingerprint df-filter then shared-count self-join —
    * mirrors CorpusStats.winnowOverlapPairs (maxDf=100, minShared=2),
    * composed from the q61 CTE so it cannot drift. */
  private lazy val winnowOverlapOracle: String =
    s"""WITH $winnowFpsCte,
       |hot AS (SELECT fp FROM f GROUP BY fp HAVING count(*) > 100),
       |ff AS (SELECT doc_id, fp FROM f
       |  WHERE fp NOT IN (SELECT fp FROM hot)),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    count(*) AS n_shared
       |  FROM ff a JOIN ff b
       |    ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_shared FROM p WHERE n_shared >= 2
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q63: same line predicates as TextAnalysis.c4Filter — terminal
    * punctuation, ≥5 whitespace words, no "javascript"; doc gate
    * ≥3 kept lines AND no "lorem ipsum" AND no brace. The cleaned-text
    * md5 re-joins kept lines with \n (coalesce covers DuckDB's
    * NULL-on-empty string_agg where Spark's concat_ws yields ''). */
  private val c4FilterOracle: String =
    """WITH l AS (SELECT doc_id, string_split(text, chr(10)) AS lines,
      |    contains(lower(text), 'lorem ipsum') AS has_lorem,
      |    contains(text, '{') AS has_brace
      |  FROM documents),
      |k AS (SELECT doc_id, len(lines) AS n_lines,
      |    list_filter(lines, ln ->
      |      regexp_matches(trim(ln), '[.!?"]$') AND
      |      len(string_split_regex(trim(ln), '\s+')) >= 5 AND
      |      NOT contains(lower(ln), 'javascript')) AS kept,
      |    has_lorem, has_brace
      |  FROM l)
      |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
      |  CAST(len(kept) AS BIGINT) AS n_kept, has_lorem, has_brace,
      |  (len(kept) >= 3 AND NOT has_lorem AND NOT has_brace) AS keep_c4,
      |  md5(coalesce(list_aggregate(kept, 'string_agg', chr(10)), ''))
      |    AS clean_md5
      |FROM k ORDER BY doc_id""".stripMargin

  /** q64: mirrors TextAnalysis.gopherFilter — replace-delta symbol
    * counts, per-doc list HOFs for line/word fractions, ratios rounded
    * 1e-4 before the gate. */
  private val gopherFilterOracle: String =
    """WITH t AS (SELECT doc_id, text,
      |    string_split_regex(trim(text), '\s+') AS toks,
      |    string_split(text, chr(10)) AS lines
      |  FROM documents),
      |s AS (SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    round(CAST(list_sum(list_transform(toks, w -> length(w)))
      |        AS DOUBLE) / greatest(len(toks), 1), 4) AS mean_word_len,
      |    round((
      |      (length(text) - length(replace(text, '#', ''))) +
      |      (length(text) - length(replace(text, '...', ''))) / 3 +
      |      (length(text) - length(replace(text, '…', '')))
      |    ) / CAST(greatest(len(toks), 1) AS DOUBLE), 4) AS symbol_ratio,
      |    round(CAST(len(list_filter(lines,
      |        ln -> regexp_matches(ltrim(ln), '^[-*•]'))) AS DOUBLE) /
      |      greatest(len(lines), 1), 4) AS bullet_frac,
      |    round(CAST(len(list_filter(lines,
      |        ln -> regexp_matches(rtrim(ln), '(\.\.\.|…)$'))) AS DOUBLE) /
      |      greatest(len(lines), 1), 4) AS ellipsis_frac,
      |    round(CAST(len(list_filter(toks,
      |        w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) /
      |      greatest(len(toks), 1), 4) AS alpha_frac,
      |    CAST((CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'the') THEN 1 ELSE 0 END +
      |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'be') THEN 1 ELSE 0 END +
      |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'to') THEN 1 ELSE 0 END +
      |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'of') THEN 1 ELSE 0 END +
      |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'and') THEN 1 ELSE 0 END +
      |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'that') THEN 1 ELSE 0 END +
      |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'have') THEN 1 ELSE 0 END +
      |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'with') THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_stop_present
      |  FROM t)
      |SELECT *,
      |  (n_words BETWEEN 50 AND 100000 AND
      |   mean_word_len BETWEEN 3.0 AND 10.0 AND
      |   symbol_ratio < 0.1 AND bullet_frac < 0.1 AND
      |   ellipsis_frac < 0.3 AND alpha_frac > 0.8 AND
      |   n_stop_present >= 2) AS keep_gopher
      |FROM s ORDER BY doc_id""".stripMargin

  /** q65: mirrors CorpusStats.dsirWeights — same md5-bucket hash,
    * Laplace smoothing, 1e-6-rounded per-bucket log-ratios (rebuilt
    * over range(64) so empty buckets get the same smoothed default),
    * token-order fold, md5-uniform Gumbel perturbation. Two parity
    * rules learned at sf0.1: the fold is list_reduce, not list_sum
    * (strict left fold ≡ Spark's aggregate(), while list_sum's
    * accumulation order drifts ~1e-13), and every rounding is 1e-6 —
    * sums of 1e-6-rounded terms are near-exact 6-decimal values, so a
    * coarser 1e-4 rounding lands ON half-boundaries where the engines
    * tie-break differently. */
  private val dsirOracle: String =
    """WITH tok AS (SELECT (lang = 'en') AS is_t,
      |    unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents),
      |c AS (SELECT CAST('0x' || substr(md5(tok), 1, 3) AS INT) % 64 AS b,
      |    count(*) AS raw,
      |    sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tgt
      |  FROM tok GROUP BY 1),
      |fb AS (SELECT r.range AS b, coalesce(c.raw, 0) AS raw,
      |    coalesce(c.tgt, 0) AS tgt
      |  FROM range(64) r LEFT JOIN c ON c.b = r.range),
      |tot AS (SELECT CAST(sum(raw) AS DOUBLE) AS rawt,
      |    CAST(sum(tgt) AS DOUBLE) AS tgtt FROM fb),
      |rv AS (SELECT list(round(
      |    ln((tgt + 1.0) / (tgtt + 64)) - ln((raw + 1.0) / (rawt + 64)),
      |    6) ORDER BY b) AS ratios
      |  FROM fb, tot),
      |d AS (SELECT doc_id,
      |    string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |    round(list_reduce(list_transform(toks, t ->
      |      ratios[(CAST('0x' || substr(md5(t), 1, 3) AS INT) % 64) + 1]
      |    ), (a, b) -> a + b), 6) AS log_weight,
      |    round(-ln(-ln(
      |      (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)
      |         AS INT) + 0.5) / 4096.0)), 6) AS gumbel
      |  FROM d, rv)
      |SELECT doc_id, n_tokens, log_weight, gumbel,
      |  round(log_weight + gumbel, 6) AS score
      |FROM s ORDER BY doc_id""".stripMargin

  /** q66: mirrors TextAnalysis.codeBlocks over the same injected
    * corpus — 1-based fence positions via generate_series + list
    * indexing, first-open/next-close pairing, inclusive list slices. */
  private val codeBlocksOracle: String =
    """WITH m AS (SELECT doc_id,
      |    text ||
      |    CASE WHEN doc_id % 7 = 0 THEN
      |      chr(10) || '```' || lang || chr(10) || 'def f():' ||
      |      chr(10) || '    return ' || CAST(doc_id AS VARCHAR) ||
      |      chr(10) || '```' ELSE '' END ||
      |    CASE WHEN doc_id % 14 = 0 THEN
      |      chr(10) || '```js' || chr(10) || 'console.log(' ||
      |      CAST(doc_id AS VARCHAR) || ');' || chr(10) || '```'
      |      ELSE '' END AS text
      |  FROM documents),
      |l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM m),
      |f AS (SELECT doc_id, lines,
      |    list_filter(generate_series(1, len(lines)),
      |      i -> starts_with(ltrim(lines[i]), '```')) AS fpos
      |  FROM l),
      |b AS (SELECT doc_id, lines, fpos,
      |    unnest(generate_series(1, CAST(len(fpos) // 2 AS INT))) AS j
      |  FROM f WHERE len(fpos) >= 2),
      |c AS (SELECT doc_id, CAST(j - 1 AS INT) AS block_idx,
      |    trim(substr(ltrim(lines[fpos[2*j - 1]]), 4)) AS lang_hint,
      |    lines[fpos[2*j - 1] + 1 : fpos[2*j] - 1] AS content
      |  FROM b)
      |SELECT doc_id, block_idx, lang_hint,
      |  CAST(len(content) AS BIGINT) AS n_lines,
      |  md5(coalesce(list_aggregate(content, 'string_agg', chr(10)), ''))
      |    AS code_md5
      |FROM c ORDER BY doc_id, block_idx""".stripMargin

  /** q67: mirrors Similarity.centroidOutliers — 1e-6-rounded centroid
    * components (so both engines score against identical centroids),
    * index-order dot products, per-label mean − 2·stddev_samp
    * thresholds rounded 1e-6. */
  private val centroidOutliersOracle: String =
    """WITH d AS (SELECT label, i AS dim,
      |    CAST(embedding[i] AS DOUBLE) AS v
      |  FROM embeddings, UNNEST(generate_series(1, len(embedding)))
      |    AS t(i)),
      |c AS (SELECT label, dim, round(avg(v), 6) AS cv
      |  FROM d GROUP BY 1, 2),
      |cent AS (SELECT label, list(cv ORDER BY dim) AS centroid
      |  FROM c GROUP BY label),
      |s AS (SELECT e.vec_id, e.label,
      |    round(
      |      list_sum(list_transform(list_zip(e.embedding, cent.centroid),
      |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
      |      (sqrt(list_sum(list_transform(e.embedding,
      |         a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE)))) *
      |       sqrt(list_sum(list_transform(cent.centroid, a -> a * a)))),
      |      6) AS cos_centroid
      |  FROM embeddings e JOIN cent ON e.label = cent.label),
      |t AS (SELECT label,
      |    round(avg(cos_centroid) - 2.0 * stddev_samp(cos_centroid), 6)
      |      AS thr
      |  FROM s GROUP BY label)
      |SELECT s.vec_id, s.label, s.cos_centroid,
      |  (s.cos_centroid < t.thr) AS is_outlier
      |FROM s JOIN t ON s.label = t.label
      |ORDER BY s.vec_id""".stripMargin

  /** q189: mirrors Similarity.labelCentroidMatrix — q67's 1e-6-rounded
    * centroid CTE, then pairwise centroid cosine for label_a < label_b
    * (dim-ordered list_sum ≡ the driver's index-order fold). */
  private val labelCentroidMatrixOracle: String =
    """WITH d AS (SELECT label, i AS dim,
      |    CAST(embedding[i] AS DOUBLE) AS v
      |  FROM embeddings, UNNEST(generate_series(1, len(embedding)))
      |    AS t(i)),
      |c AS (SELECT label, dim, round(avg(v), 6) AS cv
      |  FROM d GROUP BY 1, 2),
      |cent AS (SELECT label, list(cv ORDER BY dim) AS centroid
      |  FROM c GROUP BY label)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  round(
      |    list_sum(list_transform(list_zip(a.centroid, b.centroid),
      |      x -> x[1] * x[2])) /
      |    (sqrt(list_sum(list_transform(a.centroid, v -> v * v))) *
      |     sqrt(list_sum(list_transform(b.centroid, v -> v * v)))),
      |    6) AS cosine
      |FROM cent a JOIN cent b ON a.label < b.label
      |ORDER BY label_a, label_b""".stripMargin

  /** q190: mirrors Similarity.labelSilhouette — per-vector cosine to
    * every centroid (k rows per vector against the bounded centroid
    * table), own/best-other split, per-label rollup. */
  private val labelSilhouetteOracle: String =
    """WITH d AS (SELECT label, i AS dim,
      |    CAST(embedding[i] AS DOUBLE) AS v
      |  FROM embeddings, UNNEST(generate_series(1, len(embedding)))
      |    AS t(i)),
      |c AS (SELECT label, dim, round(avg(v), 6) AS cv
      |  FROM d GROUP BY 1, 2),
      |cent AS (SELECT label, list(cv ORDER BY dim) AS centroid
      |  FROM c GROUP BY label),
      |s AS (SELECT e.vec_id, e.label AS vlabel, cent.label AS clabel,
      |    round(
      |      list_sum(list_transform(list_zip(e.embedding, cent.centroid),
      |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
      |      (sqrt(list_sum(list_transform(e.embedding,
      |         a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE)))) *
      |       sqrt(list_sum(list_transform(cent.centroid, a -> a * a)))),
      |      6) AS cos
      |  FROM embeddings e CROSS JOIN cent),
      |p AS (SELECT vec_id, vlabel,
      |    CAST(round(max(CASE WHEN clabel = vlabel THEN cos END)
      |      * 1e6) AS BIGINT) AS own_u,
      |    CAST(round(max(CASE WHEN clabel <> vlabel THEN cos END)
      |      * 1e6) AS BIGINT) AS other_u
      |  FROM s GROUP BY 1, 2),
      |g AS (SELECT vlabel, CAST(count(*) AS BIGINT) AS n_vecs,
      |    sum(own_u) AS so, sum(other_u) AS st
      |  FROM p GROUP BY 1)
      |SELECT vlabel AS label, n_vecs,
      |  round(CAST(so AS DOUBLE) / (n_vecs * 1e6), 6) AS mean_cos_own,
      |  round(CAST(st AS DOUBLE) / (n_vecs * 1e6), 6)
      |    AS mean_cos_other,
      |  round(CAST(so - st AS DOUBLE) / (n_vecs * 1e6), 6)
      |    AS mean_margin
      |FROM g ORDER BY 1""".stripMargin

  /** q68: mirrors TextAnalysis.rocAuc ∘ clfScoreExpr — the q58 score
    * formula inlined, decimal-exact floor(d·1000) bucketing (never a
    * double round at 1e-3 — q65 boundary lesson), tie-aware
    * U-statistic via a cumulative window over the BOUNDED histogram. */
  private lazy val qualityAucOracle: String =
    s"""WITH f AS (SELECT lang, text,
       |    ' ' || lower(text) || ' ' AS p,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
       |      AS nt
       |  FROM documents),
       |s AS (SELECT lang,
       |    round(1.0 / (1.0 + exp(-(-2.0 +
       |      6.0 * round(CAST(CAST(${stopHitsSql("p")} AS BIGINT)
       |        AS DOUBLE) / greatest(nt, 1), 4) +
       |      0.3 * round(CAST(length(text) AS DOUBLE) /
       |        greatest(nt, 1), 4) -
       |      4.0 * round(CAST(len(regexp_extract_all(text, '[.,!?;:]'))
       |        AS DOUBLE) / greatest(nt, 1), 4) +
       |      0.2 * ln(nt + 1)))), 6) AS clf_score
       |  FROM f),
       |b AS (SELECT
       |    CAST(floor(CAST(clf_score AS DECIMAL(9,6)) * 1000) AS INT)
       |      AS b,
       |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np,
       |    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS nn
       |  FROM s GROUP BY 1),
       |w AS (SELECT b, np, nn,
       |    coalesce(sum(nn) OVER (ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS cumneg
       |  FROM b)
       |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       |  CAST(sum(nn) AS BIGINT) AS n_neg,
       |  round(CAST(sum(np * (2 * cumneg + nn)) AS DOUBLE) /
       |    (2.0 * sum(np) * sum(nn)), 6) AS auc
       |FROM w""".stripMargin

  /** q69: mirrors CorpusStats.bpeTrain — the N merge rounds unroll
    * into chained CTEs (pK pair counts → mK argmax → vK+1 merged
    * vocab), with the identical double-space replace trick so
    * consecutive pair occurrences merge on both engines. Every CTE is
    * MATERIALIZED: vK+1 references mK three times and the chain is N
    * deep, so DuckDB's default inlining re-evaluates the whole prefix
    * per reference — exponential at N=6 (minutes at sf0.1);
    * materialization makes each round run once. */
  /** BPE training CTE chain (v0 + per-round p/m/v tables) — shared by
    * the q69 (train) and q73 (encode) oracles. */
  private def bpeCtes(n: Int): String = {
    val v0 =
      """v0 AS MATERIALIZED (SELECT
        |    concat(regexp_replace(word, '(.)', '\1 ', 'g'), '</w>')
        |      AS syms, n_w
        |  FROM (SELECT word, count(*) AS n_w
        |    FROM (SELECT unnest(
        |        string_split_regex(trim(lower(text)), '\s+')) AS word
        |      FROM documents)
        |    WHERE regexp_matches(word, '^[a-z]+$') AND
        |      length(word) >= 2
        |    GROUP BY word))""".stripMargin
    val iters = (0 until n).map { k =>
      s"""p$k AS MATERIALIZED (SELECT s[i] AS l, s[i+1] AS r,
         |    sum(n_w) AS cnt
         |  FROM (SELECT string_split(syms, ' ') AS s, n_w FROM v$k),
         |    UNNEST(generate_series(1, len(s) - 1)) AS t(i)
         |  GROUP BY 1, 2),
         |m$k AS MATERIALIZED (SELECT l, r, cnt FROM p$k
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |v${k + 1} AS MATERIALIZED (SELECT trim(replace(replace(
         |    ' ' || replace(syms, ' ', '  ') || ' ',
         |    ' ' || (SELECT l FROM m$k) || '  ' ||
         |      (SELECT r FROM m$k) || ' ',
         |    ' ' || (SELECT l FROM m$k) || (SELECT r FROM m$k) || ' '),
         |    '  ', ' ')) AS syms, n_w FROM v$k)""".stripMargin
    }
    s"$v0,\n${iters.mkString(",\n")}"
  }

  private def bpeTrainOracle(n: Int): String = {
    val union = (0 until n).map(k =>
      s"SELECT CAST($k AS INT) AS iter, l AS lhs, r AS rhs, " +
        s"CAST(cnt AS BIGINT) AS pair_count FROM m$k")
      .mkString("\n  UNION ALL ")
    s"WITH ${bpeCtes(n)}\n$union\nORDER BY iter"
  }

  /** q73 oracle: re-derives the merge table via [[bpeCtes]], then
    * applies the identical symbolize + double-space replace chain per
    * word (merges referenced as scalar subqueries on the m-tables). */
  private def bpeEncodeOracle(n: Int): String = {
    val chain = (0 until n).foldLeft(
      """concat(regexp_replace(w, '(.)', '\1 ', 'g'), '</w>')""") {
      case (acc, k) =>
        s"trim(replace(replace(concat(' ', replace($acc, ' ', '  ')," +
          s" ' '), ' ' || (SELECT l FROM m$k) || '  ' || " +
          s"(SELECT r FROM m$k) || ' ', ' ' || (SELECT l FROM m$k) || " +
          s"(SELECT r FROM m$k) || ' '), '  ', ' '))"
    }
    s"""WITH ${bpeCtes(n)},
       |dw AS (SELECT doc_id,
       |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
       |  FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(CASE WHEN regexp_matches(w, '^[a-z]+$$') AND
       |        length(w) >= 2
       |      THEN len(string_split($chain, ' ')) ELSE 1 END)
       |    AS BIGINT) AS n_bpe_tokens
       |FROM dw GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** q85 oracle: bpeEncodeOracle's per-doc token counts joined with
    * langIdOracle's buckets, aggregated per language — sums are exact
    * BIGINTs, the two ratios are single same-operand divisions rounded
    * 1e-6 (engine-identical IEEE doubles). */
  private def tokenizerFertilityOracle(n: Int): String = {
    val chain = (0 until n).foldLeft(
      """concat(regexp_replace(w, '(.)', '\1 ', 'g'), '</w>')""") {
      case (acc, k) =>
        s"trim(replace(replace(concat(' ', replace($acc, ' ', '  ')," +
          s" ' '), ' ' || (SELECT l FROM m$k) || '  ' || " +
          s"(SELECT r FROM m$k) || ' ', ' ' || (SELECT l FROM m$k) || " +
          s"(SELECT r FROM m$k) || ' '), '  ', ' '))"
    }
    s"""WITH ${bpeCtes(n)},
       |dw AS (SELECT doc_id,
       |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
       |  FROM documents),
       |tok AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw,
       |    CAST(sum(CASE WHEN regexp_matches(w, '^[a-z]+$$') AND
       |          length(w) >= 2
       |        THEN len(string_split($chain, ' ')) ELSE 1 END)
       |      AS BIGINT) AS ntok
       |  FROM dw GROUP BY doc_id),
       |pd AS (SELECT l.lang_guess,
       |    CAST(octet_length(encode(d.text)) AS BIGINT) AS nb,
       |    tok.nw, tok.ntok
       |  FROM documents d
       |  JOIN ($langIdOracle) l ON l.doc_id = d.doc_id
       |  JOIN tok ON tok.doc_id = d.doc_id)
       |SELECT lang_guess, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
       |  CAST(sum(nw) AS BIGINT) AS n_words,
       |  CAST(sum(nb) AS BIGINT) AS n_bytes,
       |  round(CAST(sum(ntok) AS DOUBLE) /
       |    greatest(CAST(sum(nw) AS DOUBLE), 1), 6) AS fertility,
       |  round(CAST(sum(ntok) AS DOUBLE) /
       |    greatest(CAST(sum(nb) AS DOUBLE), 1), 6) AS tokens_per_byte
       |FROM pd GROUP BY lang_guess ORDER BY lang_guess""".stripMargin
  }

  /** q70: mirrors CorpusStats.bigramLogProb — same tokenization,
    * Laplace smoothing, V = distinct unigram count. */
  private val bigramLogProbOracle: String =
    """WITH t AS (SELECT doc_id,
      |    string_split_regex(trim(text), '\s+') AS w
      |  FROM documents),
      |u AS (SELECT unnest(w) AS tok FROM t),
      |c1 AS (SELECT tok, CAST(count(*) AS DOUBLE) AS c1
      |  FROM u GROUP BY tok),
      |vv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM c1),
      |bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      |  FROM t, UNNEST(generate_series(1, len(w) - 1)) AS s(i)),
      |c2 AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c2
      |  FROM bg GROUP BY 1, 2)
      |SELECT bg.doc_id,
      |  round(avg(-ln((c2.c2 + 1.0) / (c1.c1 + vv.v))), 6)
      |    AS avg_neg_logp2,
      |  CAST(count(*) AS BIGINT) AS n_bigrams
      |FROM bg JOIN c2 USING (w1, w2) JOIN c1 ON bg.w1 = c1.tok, vv
      |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin

  /** q71/q72 shared CTE chain: deterministic Lloyd unrolled —
    * mirrors Similarity.kmeansLloyd round for round. a{t} assigns
    * against c{t-1} (strict left-fold squared-diff distance via
    * list_reduce — NOT list_sum, which is not a left fold; first-min
    * tie-break via ORDER BY d, c); m{t}/c{t} rebuild centroids as
    * round(avg, 6) per dim with empty clusters retaining their
    * previous centroid (the LEFT JOIN coalesce). Every stage
    * MATERIALIZED: DuckDB re-inlines multiply-referenced CTEs
    * otherwise (the q69 lesson). */
  private def kmeansCtes(k: Int, iters: Int, p: String = "",
      eExpr: String = "list_transform(embedding, v -> CAST(v AS DOUBLE))",
      from: String = "embeddings")
      : String = {
    val head =
      s"""${p}e AS MATERIALIZED (SELECT vec_id,
         |    $eExpr AS e
         |  FROM $from),
         |${p}c0 AS MATERIALIZED (SELECT
         |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c,
         |    e AS cent
         |  FROM ${p}e ORDER BY vec_id LIMIT $k)""".stripMargin
    def assign(t: Int) =
      s"""${p}a$t AS MATERIALIZED (SELECT vec_id, e, c AS cluster, d FROM (
         |    SELECT vec_id, e, c, d, row_number()
         |        OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |    FROM (SELECT v.vec_id, v.e, cc.c,
         |        list_reduce(list_transform(list_zip(v.e, cc.cent),
         |            x -> (x[1] - x[2]) * (x[1] - x[2])),
         |          (acc, t2) -> acc + t2) AS d
         |      FROM ${p}e v CROSS JOIN ${p}c${t - 1} cc))
         |  WHERE rn = 1)""".stripMargin
    def update(t: Int) =
      s"""${p}m$t AS MATERIALIZED (SELECT cluster, i,
         |    round(avg(e[i]), 6) AS cv
         |  FROM ${p}a$t, UNNEST(generate_series(1, len(e))) AS s(i)
         |  GROUP BY cluster, i),
         |${p}c$t AS MATERIALIZED (SELECT p.c, coalesce(n.cent, p.cent)
         |    AS cent
         |  FROM ${p}c${t - 1} p LEFT JOIN (SELECT cluster AS c,
         |      list(cv ORDER BY i) AS cent FROM ${p}m$t GROUP BY cluster) n
         |    ON p.c = n.c)""".stripMargin
    val rounds = (1 to iters).map(t => s"${assign(t)},\n${update(t)}")
    (head +: rounds :+ assign(iters + 1)).mkString(",\n")
  }

  /** q152 oracle: the farthest-first traversal unrolled — pick r is
    * an ORDER BY md DESC, vec_id LIMIT 1 over d_r, and d_{r+1} folds
    * the new pick into the running min-distance (same strict
    * index-order fold as every embedding oracle). */
  private def coresetOracle(k: Int): String = {
    def fold(b: String) =
      s"""list_reduce(list_transform(list_zip(v.e, $b),
         |      x -> (x[1] - x[2]) * (x[1] - x[2])),
         |      (acc, t2) -> acc + t2)""".stripMargin
    val head =
      s"""e AS MATERIALIZED (SELECT vec_id,
         |    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
         |  FROM embeddings),
         |p0 AS MATERIALIZED (SELECT vec_id, e FROM e
         |  ORDER BY vec_id LIMIT 1),
         |d1 AS MATERIALIZED (SELECT v.vec_id, v.e,
         |    ${fold("(SELECT e FROM p0)")} AS md
         |  FROM e v)""".stripMargin
    val rounds = (1 until k).map { r =>
      val pick =
        s"""p$r AS MATERIALIZED (SELECT vec_id, e, md FROM d$r
           |  ORDER BY md DESC, vec_id LIMIT 1)""".stripMargin
      val next =
        if (r == k - 1) ""
        else s""",
           |d${r + 1} AS MATERIALIZED (SELECT v.vec_id, v.e,
           |    least(v.md, ${fold(s"(SELECT e FROM p$r)")}) AS md
           |  FROM d$r v)""".stripMargin
      pick + next
    }
    val sel = (1 until k).map(r =>
      s"""UNION ALL SELECT CAST($r AS INTEGER), vec_id, round(md, 6)
         |FROM p$r""".stripMargin).mkString("\n")
    s"""WITH ${(head +: rounds).mkString(",\n")}
       |SELECT CAST(0 AS INTEGER) AS round,
       |  (SELECT vec_id FROM p0) AS vec_id,
       |  CAST(0.0 AS DOUBLE) AS min_dist
       |$sel
       |ORDER BY round""".stripMargin
  }

  private def kmeansOracle(k: Int, iters: Int): String =
    s"""WITH ${kmeansCtes(k, iters)}
       |SELECT vec_id, cluster, round(d, 6) AS dist_sq
       |FROM a${iters + 1} ORDER BY vec_id""".stripMargin

  /** q74 oracle: kmeans chain at (nCells, kmIters), then probe + exact
    * cosine re-rank — folds order-pinned via list_reduce, cosine
    * rounded 1e-6, ties on neighbor_id (mirrors Similarity.ranked). */
  private def ivfKmeansOracle(nCells: Int, kmIters: Int, nProbe: Int,
      k: Int, nQueries: Int): String = {
    val aF = s"a${kmIters + 1}" // final assignment CTE
    val cF = s"c$kmIters"       // final centroid CTE
    def fold(zipped: String) =
      s"list_reduce(list_transform($zipped, x -> x[1] * x[2])," +
        " (acc, t2) -> acc + t2)"
    def norm2(e: String) =
      s"list_reduce(list_transform($e, v -> v * v)," +
        " (acc, t2) -> acc + t2)"
    s"""WITH ${kmeansCtes(nCells, kmIters)},
       |q AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe
       |  FROM e WHERE vec_id < $nQueries),
       |pd AS MATERIALIZED (SELECT q.query_id, q.qe, cc.c,
       |    list_reduce(list_transform(list_zip(q.qe, cc.cent),
       |        x -> (x[1] - x[2]) * (x[1] - x[2])),
       |      (acc, t2) -> acc + t2) AS d
       |  FROM q CROSS JOIN $cF cc),
       |pr AS MATERIALIZED (SELECT query_id, qe, c AS cell FROM (
       |    SELECT query_id, qe, c, row_number()
       |        OVER (PARTITION BY query_id ORDER BY d, c) AS rn
       |    FROM pd) WHERE rn <= $nProbe),
       |pairs AS MATERIALIZED (SELECT pr.query_id,
       |    a.vec_id AS neighbor_id,
       |    round(${fold("list_zip(pr.qe, a.e)")} /
       |      (sqrt(${norm2("pr.qe")}) * sqrt(${norm2("a.e")})), 6)
       |      AS cos_sim
       |  FROM pr JOIN $aF a
       |    ON pr.cell = a.cluster AND pr.query_id <> a.vec_id)
       |SELECT query_id, neighbor_id, rank, cos_sim FROM (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM pairs) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** q75 oracle: the q74 coarse chain plus m prefixed sub-space Lloyd
    * chains (sliced embeddings), PQ encode via the final sub-space
    * assignments, per-query ADC lookup tables against the final
    * codebooks, and the probe join — every distance the same
    * order-pinned list_reduce fold, ADC summed in sub-space order
    * (left-assoc, = Spark's fold from 0.0), rounded 1e-6, rank ties
    * on neighbor_id. */
  private def ivfPqOracle(nCells: Int, coarseIters: Int, m: Int,
      codeK: Int, pqIters: Int, nProbe: Int, k: Int, nQueries: Int,
      subDim: Int): String = {
    val gaF = s"ga${coarseIters + 1}" // final coarse assignment
    val gcF = s"gc$coarseIters"       // final coarse centroids
    def saF(s: Int) = s"s${s}a${pqIters + 1}"
    def scF(s: Int) = s"s${s}c$pqIters"
    def sliceExpr(s: Int) =
      s"list_transform(embedding[${s * subDim + 1}:${(s + 1) * subDim}]," +
        " v -> CAST(v AS DOUBLE))"
    val subChains = (0 until m)
      .map(s => kmeansCtes(codeK, pqIters, s"s$s", sliceExpr(s)))
      .mkString(",\n")
    val encJoins = (0 until m)
      .map(s => s"JOIN ${saF(s)} s$s USING (vec_id)").mkString(" ")
    val codesList = (0 until m).map(s => s"s$s.cluster").mkString(", ")
    def sqFold(a: String, b: String) =
      s"""list_reduce(list_transform(list_zip($a, $b),
         |        x -> (x[1] - x[2]) * (x[1] - x[2])),
         |      (acc, t2) -> acc + t2)""".stripMargin
    val lutBranches = (0 until m).map { s =>
      s"""SELECT q.query_id, $s AS s, cc.c AS j,
         |    ${sqFold(s"q.qe[${s * subDim + 1}:${(s + 1) * subDim}]",
        "cc.cent")} AS dist
         |  FROM q CROSS JOIN ${scF(s)} cc""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    val adcSum = (0 until m)
      .map(s => s"l.lut[${s * codeK} + e2.codes[${s + 1}] + 1]")
      .mkString(" + ")
    s"""WITH ${kmeansCtes(nCells, coarseIters, "g")},
       |$subChains,
       |enc AS MATERIALIZED (SELECT g.vec_id AS neighbor_id,
       |    g.cluster AS cell, [$codesList] AS codes
       |  FROM $gaF g $encJoins),
       |q AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe
       |  FROM ge WHERE vec_id < $nQueries),
       |pd AS MATERIALIZED (SELECT q.query_id, cc.c,
       |    ${sqFold("q.qe", "cc.cent")} AS d
       |  FROM q CROSS JOIN $gcF cc),
       |pr AS MATERIALIZED (SELECT query_id, c AS cell FROM (
       |    SELECT query_id, c, row_number()
       |        OVER (PARTITION BY query_id ORDER BY d, c) AS rn
       |    FROM pd) WHERE rn <= $nProbe),
       |lutent AS MATERIALIZED (
       |  $lutBranches),
       |lut AS MATERIALIZED (SELECT query_id,
       |    list(dist ORDER BY s, j) AS lut
       |  FROM lutent GROUP BY query_id),
       |pairs AS MATERIALIZED (SELECT pr.query_id, e2.neighbor_id,
       |    round($adcSum, 6) AS adc_dist
       |  FROM pr JOIN enc e2 ON pr.cell = e2.cell
       |    AND pr.query_id <> e2.neighbor_id
       |  JOIN lut l ON l.query_id = pr.query_id)
       |SELECT query_id, neighbor_id, rank, adc_dist FROM (
       |  SELECT query_id, neighbor_id, adc_dist,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_dist, neighbor_id) AS INT) AS rank
       |  FROM pairs) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** q82 oracle: [[ivfPqOracle]] with the residual subtraction — a
    * `res` CTE materializes e − assigned-cell centroid once, the m
    * sub-space Lloyd chains train FROM res (slices of `r`), encode
    * joins the residual-trained assignments, and the per-query LUT is
    * computed per PROBED cell from q − that cell's centroid (the LUT
    * depends on the cell under residual encoding, so lut/pairs key on
    * (query_id, cell)). Folds, rounding and tie-breaks identical to
    * q75. */
  private def ivfPqResidualOracle(nCells: Int, coarseIters: Int,
      m: Int, codeK: Int, pqIters: Int, nProbe: Int, k: Int,
      nQueries: Int, subDim: Int): String = {
    val gaF = s"ga${coarseIters + 1}" // final coarse assignment
    val gcF = s"gc$coarseIters"       // final coarse centroids
    def saF(s: Int) = s"s${s}a${pqIters + 1}"
    def scF(s: Int) = s"s${s}c$pqIters"
    def sliceExpr(s: Int) =
      s"r[${s * subDim + 1}:${(s + 1) * subDim}]"
    val subChains = (0 until m)
      .map(s => kmeansCtes(codeK, pqIters, s"s$s", sliceExpr(s), "res"))
      .mkString(",\n")
    val encJoins = (0 until m)
      .map(s => s"JOIN ${saF(s)} s$s USING (vec_id)").mkString(" ")
    val codesList = (0 until m).map(s => s"s$s.cluster").mkString(", ")
    def sqFold(a: String, b: String) =
      s"""list_reduce(list_transform(list_zip($a, $b),
         |        x -> (x[1] - x[2]) * (x[1] - x[2])),
         |      (acc, t2) -> acc + t2)""".stripMargin
    val qres =
      "list_transform(list_zip(q.qe, gc.cent), x -> x[1] - x[2])"
    val lutBranches = (0 until m).map { s =>
      s"""SELECT q.query_id, pr.cell, $s AS s, cc.c AS j,
         |    ${sqFold(
        s"($qres)[${s * subDim + 1}:${(s + 1) * subDim}]",
        "cc.cent")} AS dist
         |  FROM q JOIN pr USING (query_id)
         |  JOIN $gcF gc ON gc.c = pr.cell
         |  CROSS JOIN ${scF(s)} cc""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    val adcSum = (0 until m)
      .map(s => s"l.lut[${s * codeK} + e2.codes[${s + 1}] + 1]")
      .mkString(" + ")
    s"""WITH ${kmeansCtes(nCells, coarseIters, "g")},
       |res AS MATERIALIZED (SELECT a.vec_id,
       |    list_transform(list_zip(a.e, cc.cent), x -> x[1] - x[2])
       |      AS r,
       |    a.cluster AS cell
       |  FROM $gaF a JOIN $gcF cc ON a.cluster = cc.c),
       |$subChains,
       |enc AS MATERIALIZED (SELECT g.vec_id AS neighbor_id,
       |    g.cell, [$codesList] AS codes
       |  FROM res g $encJoins),
       |q AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe
       |  FROM ge WHERE vec_id < $nQueries),
       |pd AS MATERIALIZED (SELECT q.query_id, cc.c,
       |    ${sqFold("q.qe", "cc.cent")} AS d
       |  FROM q CROSS JOIN $gcF cc),
       |pr AS MATERIALIZED (SELECT query_id, c AS cell FROM (
       |    SELECT query_id, c, row_number()
       |        OVER (PARTITION BY query_id ORDER BY d, c) AS rn
       |    FROM pd) WHERE rn <= $nProbe),
       |lutent AS MATERIALIZED (
       |  $lutBranches),
       |lut AS MATERIALIZED (SELECT query_id, cell,
       |    list(dist ORDER BY s, j) AS lut
       |  FROM lutent GROUP BY query_id, cell),
       |pairs AS MATERIALIZED (SELECT pr.query_id, e2.neighbor_id,
       |    round($adcSum, 6) AS adc_dist
       |  FROM pr JOIN enc e2 ON pr.cell = e2.cell
       |    AND pr.query_id <> e2.neighbor_id
       |  JOIN lut l ON l.query_id = pr.query_id AND l.cell = pr.cell)
       |SELECT query_id, neighbor_id, rank, adc_dist FROM (
       |  SELECT query_id, neighbor_id, adc_dist,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_dist, neighbor_id) AS INT) AS rank
       |  FROM pairs) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** q83 oracle: the q37 injection convention over embeddings, then
    * the q35 banded-LSH candidate machinery (same Hyperplanes matrix
    * as literal SQL) restricted to corpus×eval, exact cosine on bucket
    * collisions, τ filter on the ROUNDED cosine, and the per-doc
    * verdict via rn=1 on (cos DESC, eval_id) — the SQL twin of Spark's
    * struct-max with count() OVER as n_eval_hits. */
  private def semanticDecontamOracle(minCos: Double, rowsPerBand: Int,
      nBands: Int, dim: Int): String = {
    def bandSelects(src: String, idCol: String) =
      (0 until nBands).map { b =>
        val bits = graft.ops.Hyperplanes.bucketSql("embedding",
          rowsPerBand, dim, firstPlane = b * rowsPerBand)
        s"SELECT $idCol, $b AS band, $bits AS bits FROM $src"
      }.mkString("\nUNION ALL\n")
    val cos = cosSql("co.embedding", "ev.ee")
    s"""WITH evs AS (SELECT vec_id AS eval_id, embedding AS ee,
       |    embedding FROM embeddings
       |  WHERE vec_id % 97 = 0 AND vec_id < 100000),
       |co AS (SELECT vec_id, embedding FROM embeddings
       |    WHERE vec_id % 97 <> 0 OR vec_id >= 100000
       |  UNION ALL
       |  SELECT vec_id + 1000000000000, embedding FROM embeddings
       |    WHERE vec_id % 97 = 0 AND vec_id < 100000),
       |cb AS (
       |${bandSelects("co", "vec_id")}),
       |eb AS (
       |${bandSelects("evs", "eval_id")}),
       |cand AS (SELECT DISTINCT cb.vec_id, eb.eval_id
       |  FROM cb JOIN eb ON cb.band = eb.band AND cb.bits = eb.bits),
       |hits AS (SELECT c.vec_id, c.eval_id, $cos AS cos_sim
       |  FROM cand c
       |  JOIN co ON co.vec_id = c.vec_id
       |  JOIN evs ev ON ev.eval_id = c.eval_id
       |  WHERE $cos >= $minCos)
       |SELECT vec_id, eval_id, max_cos, n_eval_hits FROM (
       |  SELECT vec_id, eval_id, cos_sim AS max_cos,
       |    CAST(count(*) OVER (PARTITION BY vec_id) AS BIGINT)
       |      AS n_eval_hits,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos_sim DESC, eval_id) AS rn
       |  FROM hits) WHERE rn = 1
       |ORDER BY vec_id""".stripMargin
  }

  /** q78 oracle: same vocabulary, rank ties on token, least-squares
    * sums over the top-topN points; slope/intercept round 1e-6
    * (absorbs the Spark side's rank-ordered strict-fold vs SQL's
    * arbitrary summation order, ~1e-13). */
  private def zipfFitOracle(topN: Int): String =
    s"""WITH w AS (SELECT unnest(string_split_regex(trim(text), '\\s+'))
       |    AS tok FROM documents),
       |v AS (SELECT tok, count(*) AS cnt FROM w GROUP BY tok),
       |t AS (SELECT cnt, row_number()
       |    OVER (ORDER BY cnt DESC, tok) AS rnk FROM v),
       |f AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x,
       |    ln(CAST(cnt AS DOUBLE)) AS y FROM t WHERE rnk <= $topN),
       |a AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
       |    sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx FROM f)
       |SELECT CAST(n AS BIGINT) AS n_fit,
       |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
       |    AS zipf_slope,
       |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
       |    / n, 6) AS zipf_intercept
       |FROM a""".stripMargin

  /** q79 oracle: per-source counts re-aggregate to source totals and
    * corpus token counts (one token scan), grand total as a scalar
    * subquery; per-term p_s ln(p_s/p_c) is deterministic, the
    * per-source sum rounds 1e-6. */
  private val sourceKlOracle: String =
    """WITH w AS (SELECT source,
      |    unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents),
      |st AS (SELECT source, tok, count(*) AS n_st FROM w GROUP BY 1, 2),
      |s AS (SELECT source, sum(n_st) AS n_s FROM st GROUP BY 1),
      |ct AS (SELECT tok, sum(n_st) AS n_t FROM st GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_t) AS DOUBLE) AS n FROM ct)
      |SELECT st.source,
      |  round(sum((CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE)) *
      |    ln((CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE)) /
      |       (CAST(n_t AS DOUBLE) / (SELECT n FROM tot)))), 6)
      |    AS kl_div,
      |  CAST(count(*) AS BIGINT) AS n_terms
      |FROM st JOIN s USING (source) JOIN ct USING (tok)
      |GROUP BY st.source ORDER BY st.source""".stripMargin

  private def clusterSampleOracle(k: Int, iters: Int, m: Int): String =
    s"""WITH ${kmeansCtes(k, iters)},
       |r AS MATERIALIZED (SELECT cluster, round(least(
       |      CAST(1 AS DOUBLE), CAST($m AS DOUBLE) / count(*)), 6)
       |    AS keep_rate
       |  FROM a${iters + 1} GROUP BY cluster)
       |SELECT a.vec_id, a.cluster, r.keep_rate,
       |  CAST('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 3)
       |      AS INT) <
       |    CAST(floor(r.keep_rate * 4096) AS INT) AS kept
       |FROM a${iters + 1} a JOIN r ON a.cluster = r.cluster
       |ORDER BY a.vec_id""".stripMargin

  /** q87 oracle — BM25 with the exact Spark expression tree: every
    * fractional literal is CAST AS DOUBLE (a bare DuckDB decimal
    * literal is DECIMAL-typed and would fold (k1+1) in exact decimal
    * instead of IEEE), every add/multiply association mirrors
    * Retrieval.bm25TopK, and the per-term idf is a common factor so a 1-ulp
    * `ln` divergence cannot reorder docs within a term. */
  private def bm25Oracle(nQueryTerms: Int, k: Int,
      minTermLen: Int, k1: Double, b: Double): String =
    s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |tok AS (SELECT doc_id, len(w) AS dl, t.term
       |  FROM w, UNNEST(w) AS t(term)),
       |tf AS (SELECT doc_id, dl, term, count(*) AS tf
       |  FROM tok GROUP BY 1, 2, 3),
       |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |qt AS (SELECT term, df FROM dfr WHERE length(term) >= $minTermLen
       |  ORDER BY df DESC, term LIMIT $nQueryTerms),
       |st AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n,
       |  (SELECT avg(len(w)) FROM w) AS avgdl),
       |sc AS (SELECT q.term, t.doc_id,
       |    ln(CAST(1.0 AS DOUBLE) +
       |        ((SELECT n FROM st) - q.df + CAST(0.5 AS DOUBLE)) /
       |        (q.df + CAST(0.5 AS DOUBLE))) *
       |      (CAST(t.tf AS DOUBLE) *
       |        (CAST($k1 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
       |      (CAST(t.tf AS DOUBLE) + CAST($k1 AS DOUBLE) *
       |        ((CAST(1.0 AS DOUBLE) - CAST($b AS DOUBLE)) +
       |          CAST($b AS DOUBLE) * CAST(t.dl AS DOUBLE) /
       |            (SELECT avgdl FROM st))) AS score
       |  FROM tf t JOIN qt q USING (term)),
       |r AS (SELECT term, doc_id,
       |    CAST(row_number() OVER (PARTITION BY term
       |      ORDER BY score DESC, doc_id) AS INTEGER) AS rank, score
       |  FROM sc)
       |SELECT term, doc_id, rank, round(score, 6) AS score
       |FROM r WHERE rank <= $k ORDER BY term, rank""".stripMargin

  /** q88 oracle — Monroe et al. log-odds z with the exact Spark tree
    * (same CAST-AS-DOUBLE discipline as q87; counts are integer-valued
    * doubles so every sum is order-immune). */
  private def logOddsOracle(alpha: Double, topN: Int): String =
    s"""WITH tok AS (SELECT source, t.term FROM
       |    (SELECT source, string_split_regex(trim(text), '\\s+') AS w
       |     FROM documents) x, UNNEST(w) AS t(term)),
       |ysi AS (SELECT source, term, CAST(count(*) AS DOUBLE) AS y_si
       |  FROM tok GROUP BY 1, 2),
       |yi AS (SELECT term, sum(y_si) AS y_i FROM ysi GROUP BY 1),
       |ns AS (SELECT source, sum(y_si) AS n_s FROM ysi GROUP BY 1),
       |st AS (SELECT sum(y_i) AS n_total,
       |    CAST($alpha AS DOUBLE) *
       |      CAST((SELECT count(*) FROM yi) AS DOUBLE) AS big_a
       |  FROM yi),
       |sc AS (SELECT s.source, s.term,
       |    (ln((s.y_si + CAST($alpha AS DOUBLE)) /
       |        (n.n_s + (SELECT big_a FROM st) - s.y_si -
       |          CAST($alpha AS DOUBLE))) -
       |     ln(((i.y_i - s.y_si) + CAST($alpha AS DOUBLE)) /
       |        ((SELECT n_total FROM st) - n.n_s +
       |          (SELECT big_a FROM st) - (i.y_i - s.y_si) -
       |          CAST($alpha AS DOUBLE)))) /
       |    sqrt(CAST(1.0 AS DOUBLE) / (s.y_si + CAST($alpha AS DOUBLE)) +
       |      CAST(1.0 AS DOUBLE) / ((i.y_i - s.y_si) +
       |        CAST($alpha AS DOUBLE))) AS z
       |  FROM ysi s JOIN yi i USING (term) JOIN ns n USING (source)),
       |r AS (SELECT source, term,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY z DESC, term) AS INTEGER) AS rank, z
       |  FROM sc)
       |SELECT source, term, rank, round(z, 6) AS z
       |FROM r WHERE rank <= $topN ORDER BY source, rank""".stripMargin

  /** q89 oracle — distinct 8-gram fingerprints, corpus df, per-doc
    * novel fraction (q45's window derivation, DISTINCT per doc). */
  private val ngramNoveltyOracle: String =
    """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |  FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |    md5(list_aggregate(w[i:i+7], 'string_agg', ' ')) AS h
      |  FROM w, UNNEST(generate_series(1, greatest(len(w)-7, 0))) AS t(i)),
      |dfr AS (SELECT h, count(*) AS df FROM g GROUP BY 1)
      |SELECT doc_id, count(*) AS n_distinct,
      |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_novel,
      |  round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
      |    CAST(count(*) AS DOUBLE), 6) AS novelty_frac
      |FROM g JOIN dfr USING (h) GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q90 oracle — the Efraimidis–Spirakis key from the identical
    * md5-derived dyadic uniform ((h+1)/2^48 is exact on both engines;
    * ln sees bit-identical input). */
  private val weightedSampleOracle: String =
    """WITH s AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
      |    ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
      |          AS BIGINT) + 1) / CAST(281474976710656.0 AS DOUBLE)) /
      |      CAST(n_chars AS DOUBLE) AS es_key
      |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      |r AS (SELECT * FROM s ORDER BY es_key DESC, doc_id LIMIT 100)
      |SELECT doc_id, weight, round(es_key, 9) AS es_key
      |FROM r ORDER BY doc_id""".stripMargin

  /** q91 oracle — same injected stripe, same length-difference count
    * (length/replace are CHARACTER-semantics on both engines). */
  private val mojibakeOracle: String =
    """WITH c AS (SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0
      |      THEN text || ' caf' || chr(195) || chr(169) || ' ' ||
      |        chr(194) || chr(189) || ' ' || chr(65533)
      |      ELSE text END AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(text) - length(replace(text, chr(195), ''))
      |    AS BIGINT) AS n_c3,
      |  CAST(length(text) - length(replace(text, chr(194), ''))
      |    AS BIGINT) AS n_c2,
      |  CAST(length(text) - length(replace(text, chr(65533), ''))
      |    AS BIGINT) AS n_fffd,
      |  (CAST(length(text) - length(replace(text, chr(195), ''))
      |      AS BIGINT) +
      |    CAST(length(text) - length(replace(text, chr(194), ''))
      |      AS BIGINT) +
      |    CAST(length(text) - length(replace(text, chr(65533), ''))
      |      AS BIGINT) > 0) AS is_suspect
      |FROM c ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q87_bm25" -> bm25Oracle(10, 5, 5, 1.2, 0.75),
    "q88_log_odds" -> logOddsOracle(0.01, 3),
    "q89_ngram_novelty" -> ngramNoveltyOracle,
    "q90_weighted_sample" -> weightedSampleOracle,
    "q91_mojibake" -> mojibakeOracle,
    "q71_kmeans" -> kmeansOracle(4, 3),
    "q72_cluster_sample" -> clusterSampleOracle(4, 3, 100),
    "q73_bpe_encode" -> bpeEncodeOracle(6),
    "q85_tokenizer_fertility" -> tokenizerFertilityOracle(6),
    "q74_ann_ivf_kmeans" -> ivfKmeansOracle(8, 2, 2, 5, 10),
    "q75_ann_ivf_pq" -> ivfPqOracle(8, 2, 4, 8, 2, 2, 5, 10, 16),
    "q82_ann_ivf_pq_residual" ->
      ivfPqResidualOracle(8, 2, 4, 8, 2, 2, 5, 10, 16),
    "q83_semantic_decontam" ->
      semanticDecontamOracle(0.4, 3, 12, 64),
    "q84_dup_span_removal" -> dupSpanRemovalOracle,
    "q76_edit_dist_verify" -> editDistVerifyOracle(7, 0.5),
    "q77_pagerank" -> pageRankOracle(4, 3, 64, 85L, 3),
    "q78_zipf_fit" -> zipfFitOracle(100),
    "q79_source_kl" -> sourceKlOracle,
    "q80_containment" -> containmentOracle,
    "q70_bigram_logprob" -> bigramLogProbOracle,
    "q69_bpe_train" -> bpeTrainOracle(6),
    "q68_quality_auc" -> qualityAucOracle,
    "q67_centroid_outliers" -> centroidOutliersOracle,
    "q189_label_centroid_matrix" -> labelCentroidMatrixOracle,
    "q190_label_silhouette" -> labelSilhouetteOracle,
    // q200: three scalar-agg subqueries composed in one literal row;
    // the transcripts CTE is the shared q01 derivation
    "q200_corpus_card" ->
      s"""WITH t AS (${graft.gen.TranscriptGen.fromEventsOracleSql})
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         |  (SELECT CAST(count(DISTINCT source) AS BIGINT)
         |    FROM documents) AS n_sources,
         |  (SELECT CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT))
         |    AS BIGINT) FROM documents) AS est_bpe_tokens,
         |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings)
         |    AS n_vectors,
         |  (SELECT CAST(count(DISTINCT label) AS BIGINT)
         |    FROM embeddings) AS n_labels,
         |  (SELECT max(len(embedding)) FROM embeddings) AS dim,
         |  (SELECT CAST(count(DISTINCT conv_id) AS BIGINT) FROM t)
         |    AS n_convs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_turns""".stripMargin,
    // q198: micro-unit quantized per-dim sums (exact integers), then
    // a FIXED double-op sequence for mean/variance mirrored
    // token-for-token against the Spark select
    "q198_dim_variance" ->
      """WITH d AS (SELECT i - 1 AS dim,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)
        |      AS u
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding)))
        |    AS t(i)),
        |g AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(u) AS BIGINT) AS su,
        |    CAST(sum(u * u) AS BIGINT) AS ss
        |  FROM d GROUP BY 1)
        |SELECT dim, n,
        |  round(CAST(su AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6)
        |    AS mean,
        |  round(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) / 1e12 -
        |    (CAST(su AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6)) *
        |    (CAST(su AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6)), 6)
        |    AS variance
        |FROM g ORDER BY dim""".stripMargin,
    // q191: q29's cumsum CTE (budget-independent) × unnested budgets;
    // n_seqs per source = last end-seq + 1; a doc splits when its
    // [tb, tb+max(est,1)-1] token span crosses a budget multiple
    "q191_packing_sweep" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
        |  FROM documents),
        |c AS (SELECT source, est_tokens,
        |    coalesce(sum(est_tokens) OVER (PARTITION BY source
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS tb
        |  FROM d),
        |e AS (SELECT source, est_tokens, tb,
        |    tb + greatest(est_tokens, 1) - 1 AS endtok FROM c),
        |x AS (SELECT b.budget, e.source,
        |    CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(est_tokens) AS BIGINT) AS tt,
        |    CAST(max(floor(endtok / CAST(budget AS DOUBLE))) + 1
        |      AS BIGINT) AS n_seqs_src,
        |    CAST(sum(CASE WHEN floor(tb / CAST(budget AS DOUBLE)) <>
        |        floor(endtok / CAST(budget AS DOUBLE))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nsplit
        |  FROM e CROSS JOIN (SELECT CAST(unnest([256, 1024, 4096])
        |    AS BIGINT) AS budget) b
        |  GROUP BY 1, 2),
        |g AS (SELECT budget,
        |    CAST(sum(nd) AS BIGINT) AS n_docs,
        |    CAST(sum(tt) AS BIGINT) AS total_tokens,
        |    CAST(sum(n_seqs_src) AS BIGINT) AS n_seqs,
        |    CAST(sum(nsplit) AS BIGINT) AS n_split_docs
        |  FROM x GROUP BY 1)
        |SELECT budget, n_docs, total_tokens, n_seqs,
        |  round(CAST(total_tokens AS DOUBLE) / (n_seqs * budget), 6)
        |    AS fill_ratio,
        |  n_split_docs,
        |  round(CAST(n_split_docs AS DOUBLE) / n_docs, 6)
        |    AS split_share
        |FROM g ORDER BY budget""".stripMargin,
    // q192: the syndication-stripe corpus; distinct (md5, source) then
    // hash-keyed self-join with source_a < source_b
    "q192_cross_source_dups" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 500007, text,
        |    'src' || CAST((doc_id + 500007) % 20 AS VARCHAR)
        |  FROM documents WHERE doc_id % 7 = 0),
        |d AS (SELECT DISTINCT md5(text) AS h, source FROM corpus)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(count(*) AS BIGINT) AS n_shared_texts
        |FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q66_code_blocks" -> codeBlocksOracle,
    "q65_dsir_weights" -> dsirOracle,
    "q64_gopher_filter" -> gopherFilterOracle,
    "q63_c4_filter" -> c4FilterOracle,
    "q60_shard_assign" -> shardAssignOracle,
    "q61_winnow" -> winnowOracle,
    "q62_winnow_overlap" -> winnowOverlapOracle,
    "q56_chunking" -> chunkDocsOracle,
    "q57_corpus_diff" -> corpusDiffOracle,
    "q58_quality_clf" -> qualityClfOracle,
    "q59_knn_graph" -> knnGraphOracle(nPlanes = 4, k = 3, dim = 64),
    "q53_hard_negatives" -> hardNegOracle(nPlanes = 4, k = 5,
      nQueries = 10, dim = 64),
    "q54_source_prune" -> sourcePruneOracle,
    "q55_tfidf_terms" -> tfidfTermsOracle,
    "q50_source_report" -> sourceReportOracle,
    "q51_semantic_dedup" -> semanticDedupOracle,
    "q52_line_dedup" -> lineDedupOracle,
    "q24_repetition" -> repetitionOracle,
    "q27_corpus_filter" -> corpusFilterOracle,
    "q25_top_ngrams" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |g AS (SELECT w[i] || ' ' || w[i+1] AS ngram
        |  FROM w, UNNEST(generate_series(1, greatest(len(w)-1, 0))) AS t(i))
        |SELECT ngram, count(*) AS n_occurrences FROM g GROUP BY 1
        |ORDER BY n_occurrences DESC, ngram LIMIT 20""".stripMargin,
    "q26_pii_scrub" -> piiScrubOracle,
    "q29_seq_pack" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, est_tokens,
        |    coalesce(sum(est_tokens) OVER (PARTITION BY source
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS tokens_before
        |  FROM d)
        |SELECT doc_id, source, est_tokens,
        |  CAST(floor(tokens_before / 2048.0) AS BIGINT) AS seq_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "q28_stratified_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)
        |        AS INT) <
        |  CAST(floor((CASE CAST(substr(source, 4) AS INT) % 4
        |    WHEN 0 THEN 0.1 WHEN 1 THEN 0.25 WHEN 2 THEN 0.5
        |    ELSE 1.0 END) * 4096) AS INT)
        |ORDER BY doc_id""".stripMargin,
    "q37_decontamination" -> decontaminationOracle,
    "q43_profile" -> {
      val profCols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val branches = profCols.map(c =>
        s"""SELECT '$c' AS "column",
           |  (SELECT n_rows FROM n) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  min(CAST($c AS VARCHAR)) AS min_str,
           |  max(CAST($c AS VARCHAR)) AS max_str FROM d""".stripMargin)
      s"""WITH d AS (SELECT doc_id, text,
         |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END AS lang,
         |    source, n_chars FROM documents),
         |n AS (SELECT count(*) AS n_rows FROM d)
         |${branches.mkString("\nUNION ALL\n")}
         |ORDER BY "column"""".stripMargin
    },
    "q44_profile_approx" -> {
      val profCols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val branches = profCols.map(c =>
        s"""SELECT '$c' AS "column",
           |  (SELECT n_rows FROM n) - count($c) AS n_nulls,
           |  abs(approx_count_distinct($c) - count(DISTINCT $c))
           |    <= count(DISTINCT $c) * 0.15 AS distinct_ok,
           |  min(CAST($c AS VARCHAR)) AS min_str,
           |  max(CAST($c AS VARCHAR)) AS max_str FROM d""".stripMargin)
      s"""WITH d AS (SELECT doc_id, text,
         |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END AS lang,
         |    source, n_chars FROM documents),
         |n AS (SELECT count(*) AS n_rows FROM d)
         |${branches.mkString("\nUNION ALL\n")}
         |ORDER BY "column"""".stripMargin
    },
    "q19_unigram_logprob" -> (unigramLogProbOracle + " ORDER BY doc_id"),
    "q18_unicode_nfc" ->
      """WITH c AS (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0
        |      THEN text || ' cafe' || chr(769) || ' A' || chr(778)
        |      ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id, md5(nfc_normalize(text)) AS nfc_md5,
        |  nfc_normalize(text) <> text AS changed
        |FROM c ORDER BY doc_id""".stripMargin,
    "q38_incremental_dedup" -> incrementalDedupOracle,
    // q48 executes the Bloom-probed physical path over q38's exact
    // logical contract — one oracle pins both (no false negatives)
    "q48_bloom_dedup" -> incrementalDedupOracle,
    "q45_dup_spans" -> dupSpansOracle,
    "q46_ppl_buckets" -> perplexityBucketsOracle,
    "q47_cluster_reps" -> clusterRepsOracle,
    "q49_bpe_pairs" -> bpePairsOracle,
    "q39_temperature_mix" ->
      """WITH counts AS (SELECT source, CAST(count(*) AS DOUBLE) AS n_s
        |    FROM documents GROUP BY 1),
        |tot AS (SELECT sum(pow(n_s, 0.5)) AS z, sum(n_s) AS n
        |    FROM counts),
        |rates AS (SELECT source,
        |    round(least(1.0, pow(n_s, 0.5) / (SELECT z FROM tot) * 0.5 *
        |      (SELECT n FROM tot) / n_s), 6) AS keep_rate
        |  FROM counts)
        |SELECT d.doc_id, d.source, r.keep_rate
        |FROM documents d JOIN rates r USING (source)
        |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 3)
        |    AS INT) < floor(keep_rate * 4096)
        |ORDER BY d.doc_id""".stripMargin,
    "q20_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_meas,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q21_lang_id" -> langIdOracle,
    "q22_quality" -> qualityOracle,
    "q23_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q30_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT md5(text) AS text_hash, count(*) AS n_docs,
        |  min(doc_id) AS canonical
        |FROM corpus GROUP BY 1 HAVING count(*) > 1 ORDER BY text_hash""".stripMargin,
    "q31_ngram_jaccard" -> ngramJaccardOracle,
    "q93_cross_source_dups" -> crossSourceDupsOracle,
    "q94_lexical_diversity" -> lexicalDiversityOracle,
    "q95_blocklist" -> blocklistOracle,
    "q96_leakage_split" -> leakageSplitOracle,
    "q97_cdc_chunks" -> cdcChunksOracle,
    "q98_script_mix" -> scriptMixOracle,
    "q99_lsh_audit" -> lshAuditOracle,
    // q109: norm² is the pinned-order list_sum fold (the cosine
    // contract), so the zero / non-finite compares run on
    // bit-identical doubles; only min/max norms are rounded
    "q109_embedding_hygiene" ->
      """WITH n AS (SELECT label, len(embedding) AS dim,
        |    list_sum(list_transform(embedding,
        |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS norm2
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs,
        |  CAST(sum(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bad_dim,
        |  CAST(sum(CASE WHEN norm2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero,
        |  CAST(sum(CASE WHEN isnan(norm2) OR isinf(norm2)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
        |  round(sqrt(min(norm2)), 6) AS min_norm,
        |  round(sqrt(max(norm2)), 6) AS max_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin,
    // q122: the whole plan is 64-bit integer arithmetic — DuckDB's
    // // floor-division equals Spark's `div` for the non-negative
    // operands here, so quotas / epochs / ppm rates match bit-for-bit;
    // n_sources enters as a scalar subquery (the Spark side inlines
    // the same bounded count as a literal)
    "q122_mixture_plan" ->
      """WITH d AS (SELECT source,
        |    CAST(substr(source, 4) AS INT) AS src_idx,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tok
        |  FROM documents),
        |s AS (SELECT source, min(src_idx) AS src_idx,
        |    count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS avail_tok
        |  FROM d GROUP BY 1),
        |n AS (SELECT count(*) AS n_src FROM s),
        |q AS (SELECT source, n_docs, avail_tok,
        |    CAST(30010 // (SELECT n_src FROM n) +
        |      CASE WHEN src_idx < 30010 % (SELECT n_src FROM n)
        |        THEN 1 ELSE 0 END AS BIGINT) AS quota_tok
        |  FROM s)
        |SELECT source, n_docs, avail_tok, quota_tok,
        |  least(quota_tok, avail_tok) AS kept_tok,
        |  greatest(quota_tok - avail_tok, 0) AS deficit_tok,
        |  CAST((quota_tok + avail_tok - 1) // avail_tok AS BIGINT)
        |    AS epochs,
        |  CAST((quota_tok * 1000000) // avail_tok AS BIGINT) AS rate_ppm
        |FROM q ORDER BY source""".stripMargin,
    // q126: q122's plan CTEs verbatim, rates capped at 1e6 ppm, then
    // the md5-bucket keep test in exact integer arithmetic (the q38
    // hashSample spelling with a ppm threshold)
    "q126_mixture_apply" ->
      """WITH d AS (SELECT source,
        |    CAST(substr(source, 4) AS INT) AS src_idx,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tok
        |  FROM documents),
        |s AS (SELECT source, min(src_idx) AS src_idx,
        |    CAST(sum(n_tok) AS BIGINT) AS avail_tok
        |  FROM d GROUP BY 1),
        |n AS (SELECT count(*) AS n_src FROM s),
        |q AS (SELECT source,
        |    CAST(30010 // (SELECT n_src FROM n) +
        |      CASE WHEN src_idx < 30010 % (SELECT n_src FROM n)
        |        THEN 1 ELSE 0 END AS BIGINT) AS quota_tok, avail_tok
        |  FROM s),
        |r AS (SELECT source,
        |    least(CAST((quota_tok * 1000000) // avail_tok AS BIGINT),
        |      1000000) AS capped_ppm
        |  FROM q)
        |SELECT doc_id, d2.source, capped_ppm
        |FROM documents d2 JOIN r USING (source)
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)
        |    AS INT) < (capped_ppm * 4096) // 1000000
        |ORDER BY doc_id""".stripMargin,
    "q36_dedup_clusters" ->
      s"""WITH RECURSIVE
         |p AS (SELECT doc_a, doc_b FROM ($ngramJaccardOracle) t),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |reach(node, lab) AS (
         |  SELECT s, s FROM edges
         |  UNION
         |  SELECT e.s, r.lab FROM edges e JOIN reach r ON e.d = r.node)
         |SELECT node AS doc_id, min(lab) AS cluster_id
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    "q32_minhash_lsh" -> minhashLshOracle,
    "q33_simhash_pairs" -> simhashOracle,
    "q35_embedding_neardup_lsh" ->
      nearDupLshOracle(minCos = 0.45, rowsPerBand = 4, nBands = 8, dim = 64),
    "q42_ann_lsh" ->
      annLshOracle(nPlanes = 8, k = 5, nQueries = 10, dim = 64),
    "q34_embedding_neardup" ->
      s"""SELECT q.query_id AS vec_a, c.vec_id AS vec_b, $COS AS cos_sim
         |FROM (SELECT vec_id AS query_id, embedding AS qe
         |      FROM embeddings) q
         |JOIN embeddings c ON q.query_id < c.vec_id
         |WHERE $COS >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,
    "q40_ann_brute" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
         |  FROM embeddings WHERE vec_id < 10),
         |p AS (SELECT q.query_id, c.vec_id AS neighbor_id, $COS AS cos_sim
         |  FROM embeddings c, q WHERE c.vec_id <> q.query_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
         |  FROM p)
         |SELECT query_id, neighbor_id, rank, cos_sim FROM r
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q41_ann_ivf" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label
         |  FROM embeddings WHERE vec_id < 10),
         |p AS (SELECT q.query_id, c.vec_id AS neighbor_id, $COS AS cos_sim
         |  FROM embeddings c JOIN q ON c.label = q.label
         |  WHERE c.vec_id <> q.query_id),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
         |  FROM p)
         |SELECT query_id, neighbor_id, rank, cos_sim FROM r
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // q132: composed from q21's oracle (the classifier mirror) joined
    // back to the declared label — the confusion matrix cannot drift
    // from the classifier it audits; shares are integer-count ratios
    "q132_langid_confusion" ->
      s"""WITH l AS ($langIdOracle),
         |j AS (SELECT d.lang,
         |    CASE WHEN d.lang = 'zh' THEN 'cjk'
         |         WHEN d.lang = 'en' THEN 'en'
         |         ELSE 'latin_other' END AS declared_class,
         |    l.lang_guess
         |  FROM documents d JOIN l ON l.doc_id = d.doc_id),
         |g AS (SELECT lang, declared_class, lang_guess,
         |    count(*) AS n_docs
         |  FROM j GROUP BY 1, 2, 3)
         |SELECT lang, lang_guess, n_docs,
         |  round(CAST(n_docs AS DOUBLE) /
         |    sum(n_docs) OVER (PARTITION BY lang), 6) AS share_of_lang,
         |  declared_class = lang_guess AS agree
         |FROM g ORDER BY lang, lang_guess""".stripMargin,
    // q134: the row-local histogram spelled with the same lambda
    // pipeline (distinct → per-type counts) — every output is an
    // integer count or an integer-ratio round, no float sums
    "q134_hapax_profile" ->
      s"""WITH f AS (SELECT doc_id,
         |    string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents),
         |g AS (SELECT doc_id, toks, list_distinct(toks) AS dts FROM f),
         |h AS (SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(len(dts) AS BIGINT) AS n_types,
         |    list_transform(dts,
         |      t -> len(list_filter(toks, x -> x = t))) AS counts
         |  FROM g)
         |SELECT doc_id, n_tokens, n_types,
         |  CAST(len(list_filter(counts, c -> c = 1)) AS BIGINT)
         |    AS n_hapax,
         |  CAST(list_max(counts) AS BIGINT) AS max_token_freq,
         |  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
         |  round(CAST(len(list_filter(counts, c -> c = 1)) AS DOUBLE) /
         |    greatest(n_types, 1), 6) AS hapax_share
         |FROM h ORDER BY doc_id""".stripMargin,
    // q136: centroid means round 1e-6 (both engines then fold the SAME
    // grid doubles), cosine the order-pinned list_reduce fold (≡ the
    // kernel's left fold from 0.0), drift rounded 1e-6
    "q136_embedding_drift" ->
      """WITH b AS (SELECT vec_id // 100 AS batch,
        |    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
        |  FROM embeddings),
        |m AS (SELECT batch, i, round(avg(e[i]), 6) AS cv,
        |    count(*) AS cnt
        |  FROM b, UNNEST(generate_series(1, len(e))) AS s(i)
        |  GROUP BY batch, i),
        |c AS (SELECT batch, list(cv ORDER BY i) AS cent,
        |    CAST(max(cnt) AS BIGINT) AS n_vecs
        |  FROM m GROUP BY batch),
        |d AS (SELECT c.batch, c.n_vecs, c.cent, p.cent AS prev
        |  FROM c JOIN c p ON p.batch = c.batch - 1)
        |SELECT batch, n_vecs,
        |  round(list_reduce(list_transform(list_zip(prev, cent),
        |      x -> x[1] * x[2]), (acc, t2) -> acc + t2) /
        |    (sqrt(list_reduce(list_transform(prev, v -> v * v),
        |        (acc, t2) -> acc + t2)) *
        |     sqrt(list_reduce(list_transform(cent, v -> v * v),
        |        (acc, t2) -> acc + t2))), 6) AS drift_cos
        |FROM d ORDER BY batch""".stripMargin,
    // q137: the same six raw moment sums and the same textbook
    // n·Σxy−ΣxΣy algebra as the Spark side — doubles agree to ~1e-12
    // against the 1e-6 output grid; degenerate variance → 0.0 in both
    "q137_heaps_fit" ->
      """WITH f AS (SELECT source,
        |    ln(CAST(len(string_split_regex(trim(text), '\s+'))
        |      AS DOUBLE)) AS x,
        |    ln(CAST(len(list_distinct(
        |      string_split_regex(trim(text), '\s+'))) AS DOUBLE)) AS y
        |  FROM documents),
        |a AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
        |    sum(y * y) AS syy, sum(x * y) AS sxy
        |  FROM f GROUP BY source)
        |SELECT source, CAST(n AS BIGINT) AS n_docs,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
        |    ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        |    END AS heaps_beta,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
        |    ELSE round(exp((sy - ((n * sxy - sx * sy) /
        |      (n * sxx - sx * sx)) * sx) / n), 6) END AS heaps_k,
        |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
        |    THEN 0.0
        |    ELSE round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
        |      ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        |    END AS r2
        |FROM a ORDER BY source""".stripMargin,
    // q138: q36's recursive-CTE components with singleton coalesce,
    // per-doc quotients rounded 1e-6 BEFORE the source sum (both
    // engines sum the same grid values), rollup re-rounded at output
    "q138_effective_tokens" ->
      s"""WITH RECURSIVE
         |p AS (SELECT doc_a, doc_b FROM ($ngramJaccardOracle) t),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |reach(node, lab) AS (
         |  SELECT s, s FROM edges
         |  UNION
         |  SELECT e.s, r.lab FROM edges e JOIN reach r ON e.d = r.node),
         |cl AS (SELECT node AS doc_id, min(lab) AS cluster_id
         |  FROM reach GROUP BY node),
         |tok AS (SELECT doc_id, source,
         |    CAST(len(string_split_regex(trim(text), '\\s+'))
         |      AS BIGINT) AS n_tokens
         |  FROM documents),
         |j AS (SELECT tok.doc_id, tok.source, tok.n_tokens,
         |    coalesce(cl.cluster_id, tok.doc_id) AS cluster_id
         |  FROM tok LEFT JOIN cl USING (doc_id)),
         |sz AS (SELECT cluster_id, count(*) AS csize
         |  FROM j GROUP BY cluster_id),
         |e AS (SELECT j.source, j.n_tokens, sz.csize,
         |    round(CAST(j.n_tokens AS DOUBLE) /
         |      CAST(sz.csize AS DOUBLE), 6) AS eff
         |  FROM j JOIN sz USING (cluster_id))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_in_clusters,
         |  CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
         |  round(sum(eff), 6) AS eff_tokens,
         |  round(CAST(sum(n_tokens) AS DOUBLE) / round(sum(eff), 6), 6)
         |    AS dup_inflation
         |FROM e GROUP BY source ORDER BY source""".stripMargin,
    // q139: the same two gram tables, scalar totals, and the same
    // divide-divide-multiply-ln-round float path as the Spark side;
    // ties on the bigram string
    "q139_pmi_collocations" ->
      """WITH w AS (SELECT string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |tot AS (SELECT CAST(sum(len(w)) AS DOUBLE) AS nu,
        |    CAST(sum(greatest(len(w) - 1, 0)) AS DOUBLE) AS nb
        |  FROM w),
        |uc AS (SELECT tok, count(*) AS n
        |  FROM (SELECT unnest(w) AS tok FROM w) GROUP BY tok),
        |g AS (SELECT w[i] AS w1, w[i+1] AS w2,
        |    w[i] || ' ' || w[i+1] AS ngram
        |  FROM w, UNNEST(generate_series(1, greatest(len(w) - 1, 0)))
        |    AS t(i)),
        |bc AS (SELECT ngram, min(w1) AS w1, min(w2) AS w2,
        |    count(*) AS n_pair
        |  FROM g GROUP BY ngram HAVING count(*) >= 5),
        |j AS (SELECT bc.ngram, bc.n_pair, a.n AS n_w1, b.n AS n_w2
        |  FROM bc JOIN uc a ON a.tok = bc.w1
        |  JOIN uc b ON b.tok = bc.w2)
        |SELECT ngram, CAST(n_pair AS BIGINT) AS n_pair,
        |  CAST(n_w1 AS BIGINT) AS n_w1, CAST(n_w2 AS BIGINT) AS n_w2,
        |  round(ln((CAST(n_pair AS DOUBLE) / (SELECT nb FROM tot)) /
        |    ((CAST(n_w1 AS DOUBLE) / (SELECT nu FROM tot)) *
        |     (CAST(n_w2 AS DOUBLE) / (SELECT nu FROM tot)))), 6) AS pmi
        |FROM j ORDER BY pmi DESC, ngram LIMIT 20""".stripMargin,
    // q140: q31's pair CTE once, exact micro-integer bucketing of the
    // rounded jaccard, suffix sums via correlated scalars over the
    // bounded histogram
    "q140_jaccard_sweep" ->
      s"""WITH b AS (SELECT
         |    CAST(round(jaccard * 1000000) AS BIGINT) // 100000
         |      AS bucket
         |  FROM ($ngramJaccardOracle) t),
         |c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
         |th AS (SELECT unnest(generate_series(1, 9)) AS tb)
         |SELECT CAST(tb AS DOUBLE) / 10.0 AS threshold,
         |  CAST(coalesce((SELECT sum(n) FROM c WHERE bucket >= tb), 0)
         |    AS BIGINT) AS n_pairs_ge,
         |  CASE WHEN coalesce((SELECT sum(n) FROM c WHERE bucket >= 1),
         |      0) = 0 THEN 0.0
         |    ELSE round(CAST(coalesce((SELECT sum(n) FROM c
         |        WHERE bucket >= tb), 0) AS DOUBLE) /
         |      CAST((SELECT sum(n) FROM c WHERE bucket >= 1)
         |        AS DOUBLE), 6) END AS share_of_base
         |FROM th ORDER BY threshold""".stripMargin,
    // q141: q138's component CTEs + q122's integer quota arithmetic
    // on micro-token effective supply — every output integer/boolean
    "q141_dedup_aware_plan" ->
      s"""WITH RECURSIVE
         |p AS (SELECT doc_a, doc_b FROM ($ngramJaccardOracle) t),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |reach(node, lab) AS (
         |  SELECT s, s FROM edges
         |  UNION
         |  SELECT e.s, r.lab FROM edges e JOIN reach r ON e.d = r.node),
         |cl AS (SELECT node AS doc_id, min(lab) AS cluster_id
         |  FROM reach GROUP BY node),
         |d AS (SELECT doc_id, source,
         |    CAST(substr(source, 4) AS INT) AS src_idx,
         |    CAST(len(string_split_regex(trim(text), '\\s+'))
         |      AS BIGINT) AS n_tok
         |  FROM documents),
         |j AS (SELECT d.source, d.src_idx, d.n_tok,
         |    coalesce(cl.cluster_id, d.doc_id) AS cluster_id
         |  FROM d LEFT JOIN cl USING (doc_id)),
         |sz AS (SELECT cluster_id, count(*) AS csize
         |  FROM j GROUP BY cluster_id),
         |e AS (SELECT j.source, j.src_idx, j.n_tok,
         |    (j.n_tok * 1000000) // sz.csize AS eff_utok
         |  FROM j JOIN sz USING (cluster_id)),
         |s AS (SELECT source, min(src_idx) AS src_idx,
         |    count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS avail_tok,
         |    CAST(sum(eff_utok) AS BIGINT) AS eff_utok
         |  FROM e GROUP BY source),
         |n AS (SELECT count(*) AS n_src FROM s),
         |q AS (SELECT source, n_docs, avail_tok, eff_utok,
         |    CAST(30010 // (SELECT n_src FROM n) +
         |      CASE WHEN src_idx < 30010 % (SELECT n_src FROM n)
         |        THEN 1 ELSE 0 END AS BIGINT) AS quota_tok
         |  FROM s),
         |f AS (SELECT source, n_docs, avail_tok, eff_utok, quota_tok,
         |    CAST((quota_tok + avail_tok - 1) // avail_tok AS BIGINT)
         |      AS epochs_raw,
         |    CAST((quota_tok * 1000000 + eff_utok - 1) // eff_utok
         |      AS BIGINT) AS epochs_eff
         |  FROM q)
         |SELECT source, n_docs, avail_tok, eff_utok, quota_tok,
         |  epochs_raw, epochs_eff, epochs_eff > epochs_raw
         |    AS dup_penalty
         |FROM f ORDER BY source""".stripMargin,
    // q142: regex-free character counts (length-of-replace), densities
    // rounded 1e-6 before the class CASE — identical in both engines
    "q142_markup_profile" ->
      """WITH f AS (SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(text) - length(replace(text, '{', '')) +
        |      length(text) - length(replace(text, '}', '')) +
        |      length(text) - length(replace(text, ';', '')) +
        |      length(text) - length(replace(text, '=', ''))
        |      AS BIGINT) AS n_code_chars,
        |    CAST(length(text) - length(replace(text, '<', '')) +
        |      length(text) - length(replace(text, '>', ''))
        |      AS BIGINT) AS n_markup_chars
        |  FROM documents),
        |g AS (SELECT doc_id, n_chars, n_code_chars, n_markup_chars,
        |    round(CAST(n_code_chars AS DOUBLE) /
        |      greatest(n_chars, 1), 6) AS code_density,
        |    round(CAST(n_markup_chars AS DOUBLE) /
        |      greatest(n_chars, 1), 6) AS markup_density
        |  FROM f)
        |SELECT doc_id, n_chars, n_code_chars, n_markup_chars,
        |  code_density, markup_density,
        |  CASE WHEN markup_density >= 0.005 AND
        |      markup_density >= code_density THEN 'markup'
        |    WHEN code_density >= 0.01 THEN 'code'
        |    ELSE 'prose' END AS doc_class
        |FROM g ORDER BY doc_id""".stripMargin,
    // q143: the q25 bigram oracle at stride 2 — pair strings join on
    // ' ', ties on the pair string
    "q143_skipgram_pairs" ->
      """WITH w AS (SELECT string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |g AS (SELECT w[i] || ' ' || w[i+2] AS pair
        |  FROM w, UNNEST(generate_series(1, greatest(len(w) - 2, 0)))
        |    AS t(i))
        |SELECT pair, count(*) AS n_occurrences FROM g GROUP BY 1
        |ORDER BY n_occurrences DESC, pair LIMIT 20""".stripMargin,
    // q144: q22's keep gate and q58's classifier score composed
    // verbatim (rounded-1e-4 features inside the logit, score rounded
    // 1e-6 before the threshold), bounded cell rollup + share window
    "q144_quality_calibration" ->
      s"""WITH f AS (SELECT source, text,
         |    ' ' || lower(text) || ' ' AS p,
         |    CAST(len(string_split_regex(trim(text), '\\s+'))
         |      AS BIGINT) AS nt,
         |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT)
         |      AS np
         |  FROM documents),
         |s AS (SELECT source,
         |    (nt BETWEEN 10 AND 2000 AND
         |     CAST(np AS DOUBLE) / greatest(nt, 1) < 0.5)
         |      AS heuristic_keep,
         |    round(1.0 / (1.0 + exp(-(-2.0 +
         |      6.0 * round(CAST(CAST(${stopHitsSql("p")} AS BIGINT)
         |        AS DOUBLE) / greatest(nt, 1), 4) +
         |      0.3 * round(CAST(length(text) AS DOUBLE) /
         |        greatest(nt, 1), 4) -
         |      4.0 * round(CAST(np AS DOUBLE) / greatest(nt, 1), 4) +
         |      0.2 * ln(nt + 1)))), 6) AS pr
         |  FROM f),
         |h AS (SELECT source, heuristic_keep, pr >= 0.5 AS clf_keep,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    round(avg(pr), 6) AS mean_clf_prob
         |  FROM s GROUP BY 1, 2, 3)
         |SELECT source, heuristic_keep, clf_keep, n_docs,
         |  mean_clf_prob,
         |  round(CAST(n_docs AS DOUBLE) /
         |    sum(n_docs) OVER (PARTITION BY source), 6)
         |    AS share_of_source
         |FROM h ORDER BY source, heuristic_keep, clf_keep""".stripMargin,
    // q149: the q134 row-local distinct→count lambda pipeline feeding
    // one term-keyed agg; ORDER BY the ROUNDED score (same grid the
    // Spark side sorts on) with the term tie-break
    "q149_term_burstiness" ->
      """WITH f AS (SELECT string_split_regex(trim(text), '\s+')
        |    AS toks FROM documents),
        |e AS (SELECT unnest(list_transform(list_distinct(toks),
        |    t -> {'term': t,
        |          'tf': len(list_filter(toks, x -> x = t))})) AS e
        |  FROM f),
        |g AS (SELECT e.term AS term, CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(e.tf) AS BIGINT) AS tf_total
        |  FROM e GROUP BY 1 HAVING count(*) >= 5)
        |SELECT term, df, tf_total,
        |  round(CAST(tf_total AS DOUBLE) / df, 6) AS burstiness
        |FROM g ORDER BY burstiness DESC, term LIMIT 100""".stripMargin,
    // q150: the full sources×lengths CDF grid in SQL (the Spark side
    // sweeps the same bounded histogram on the driver); every ratio
    // is an IEEE division of the same exact longs, so gap/ks/crit are
    // bit-identical before their 1e-6 output rounds
    "q150_length_ks_drift" ->
      """WITH l AS (SELECT source,
        |    CAST(least(len(string_split_regex(trim(text), '\s+')),
        |      4096) AS BIGINT) AS len
        |  FROM documents),
        |c AS (SELECT source, len, CAST(count(*) AS BIGINT) AS cnt
        |  FROM l GROUP BY 1, 2),
        |s AS (SELECT source, sum(cnt) AS n_s FROM c GROUP BY 1),
        |t AS (SELECT len, sum(cnt) AS cnt_all FROM c GROUP BY 1),
        |n AS (SELECT sum(cnt_all) AS n_all FROM t),
        |g AS (SELECT s.source, t.len, s.n_s, t.cnt_all
        |  FROM s CROSS JOIN t),
        |j AS (SELECT g.source, g.len, g.n_s, g.cnt_all,
        |    coalesce(c.cnt, 0) AS cnt
        |  FROM g LEFT JOIN c ON c.source = g.source AND c.len = g.len),
        |k AS (SELECT source, len, n_s,
        |    sum(cnt) OVER (PARTITION BY source ORDER BY len) AS cum_s,
        |    sum(cnt_all) OVER (PARTITION BY source ORDER BY len)
        |      AS cum_all
        |  FROM j),
        |d AS (SELECT source, len, n_s,
        |    greatest((SELECT n_all FROM n) - n_s, 1) AS n_r,
        |    abs(CAST(cum_s AS DOUBLE) / n_s -
        |      CAST(cum_all - cum_s AS DOUBLE) /
        |        greatest((SELECT n_all FROM n) - n_s, 1)) AS gap
        |  FROM k),
        |m AS (SELECT source, max(n_s) AS n_s, max(n_r) AS n_r,
        |    max(gap) AS ks FROM d GROUP BY 1),
        |a AS (SELECT m.source, m.n_s, m.n_r, m.ks,
        |    min(d.len) AS ks_len
        |  FROM m JOIN d ON d.source = m.source AND d.gap = m.ks
        |  GROUP BY 1, 2, 3, 4)
        |SELECT source, CAST(n_s AS BIGINT) AS n_docs,
        |  round(ks, 6) AS ks_stat, ks_len,
        |  round(1.358 * sqrt(CAST(n_s + n_r AS DOUBLE) /
        |    (CAST(n_s AS DOUBLE) * n_r)), 6) AS crit_005,
        |  round(ks, 6) >
        |    round(1.358 * sqrt(CAST(n_s + n_r AS DOUBLE) /
        |      (CAST(n_s AS DOUBLE) * n_r)), 6) AS drifted
        |FROM a ORDER BY source""".stripMargin,
    // q151: q79's KL machinery keyed by the exact-integer-div decile
    // of doc_id against max(doc_id)+1 (the Spark side inlines the
    // same value as an eager literal); the delta is a self-join on
    // decile−1 of already-rounded values
    "q151_ingestion_drift" ->
      """WITH nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
        |w AS (SELECT CAST(least(doc_id * 10 // (SELECT n FROM nn), 9)
        |      AS INTEGER) AS decile,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |st AS (SELECT decile, tok, count(*) AS n_dt FROM w
        |  GROUP BY 1, 2),
        |d AS (SELECT decile, sum(n_dt) AS n_d FROM st GROUP BY 1),
        |ct AS (SELECT tok, sum(n_dt) AS n_t FROM st GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_t) AS DOUBLE) AS n FROM ct),
        |kl AS (SELECT st.decile,
        |    CAST(max(n_d) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_terms,
        |    round(sum((CAST(n_dt AS DOUBLE) / CAST(n_d AS DOUBLE)) *
        |      ln((CAST(n_dt AS DOUBLE) / CAST(n_d AS DOUBLE)) /
        |         (CAST(n_t AS DOUBLE) / (SELECT n FROM tot)))), 6)
        |      AS kl_vs_corpus
        |  FROM st JOIN d USING (decile) JOIN ct USING (tok)
        |  GROUP BY 1)
        |SELECT k.decile, k.n_tokens, k.n_terms, k.kl_vs_corpus,
        |  round(k.kl_vs_corpus - p.kl_vs_corpus, 6) AS delta_kl
        |FROM kl k LEFT JOIN kl p ON p.decile = k.decile - 1
        |ORDER BY k.decile""".stripMargin,
    "q152_coreset" -> coresetOracle(6),
    // q153: q58's score chain with source carried through; inclusive
    // CDF over the bounded (source × 1e-3-bucket) histogram, joined
    // back on the same decimal-exact bucket
    "q153_score_percentiles" ->
      s"""WITH f AS (SELECT doc_id, source, text,
         |    ' ' || lower(text) || ' ' AS p,
         |    CAST(len(string_split_regex(trim(text), '\\s+'))
         |      AS BIGINT) AS nt
         |  FROM documents),
         |sc AS (SELECT doc_id, source,
         |    round(1.0 / (1.0 + exp(-(-2.0 +
         |      6.0 * round(CAST(CAST(${stopHitsSql("p")} AS BIGINT)
         |        AS DOUBLE) / greatest(nt, 1), 4) +
         |      0.3 * round(CAST(length(text) AS DOUBLE) /
         |        greatest(nt, 1), 4) -
         |      4.0 * round(CAST(len(regexp_extract_all(text,
         |        '[.,!?;:]')) AS DOUBLE) / greatest(nt, 1), 4) +
         |      0.2 * ln(nt + 1)))), 6) AS clf_score
         |  FROM f),
         |h AS (SELECT source,
         |    CAST(floor(CAST(clf_score AS DECIMAL(9,6)) * 1000)
         |      AS INTEGER) AS b,
         |    count(*) AS cnt
         |  FROM sc GROUP BY 1, 2),
         |c AS (SELECT source, b,
         |    sum(cnt) OVER (PARTITION BY source ORDER BY b) AS cum,
         |    sum(cnt) OVER (PARTITION BY source) AS n_s
         |  FROM h),
         |pc AS (SELECT source, b,
         |    round(CAST(cum AS DOUBLE) / n_s, 6) AS pct_in_source
         |  FROM c)
         |SELECT sc.doc_id, sc.source, sc.clf_score, pc.pct_in_source
         |FROM sc JOIN pc ON pc.source = sc.source AND
         |  pc.b = CAST(floor(CAST(sc.clf_score AS DECIMAL(9,6)) * 1000)
         |    AS INTEGER)
         |ORDER BY sc.doc_id""".stripMargin,
    // q155: the same score chain at the 1e-2 grid; top-down
    // cumulative over the bounded histogram (window in SQL, driver
    // sweep in Spark — same exact longs either way)
    "q155_selection_curve" ->
      s"""WITH f AS (SELECT doc_id, text,
         |    ' ' || lower(text) || ' ' AS p,
         |    CAST(len(string_split_regex(trim(text), '\\s+'))
         |      AS BIGINT) AS nt
         |  FROM documents),
         |sc AS (SELECT nt,
         |    round(1.0 / (1.0 + exp(-(-2.0 +
         |      6.0 * round(CAST(CAST(${stopHitsSql("p")} AS BIGINT)
         |        AS DOUBLE) / greatest(nt, 1), 4) +
         |      0.3 * round(CAST(length(text) AS DOUBLE) /
         |        greatest(nt, 1), 4) -
         |      4.0 * round(CAST(len(regexp_extract_all(text,
         |        '[.,!?;:]')) AS DOUBLE) / greatest(nt, 1), 4) +
         |      0.2 * ln(nt + 1)))), 6) AS s
         |  FROM f),
         |h AS (SELECT CAST(floor(CAST(s AS DECIMAL(9,6)) * 100)
         |      AS INTEGER) AS b,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens
         |  FROM sc GROUP BY 1),
         |c AS (SELECT b, n_docs, n_tokens,
         |    CAST(sum(n_docs) OVER (ORDER BY b DESC) AS BIGINT)
         |      AS cum_docs,
         |    CAST(sum(n_tokens) OVER (ORDER BY b DESC) AS BIGINT)
         |      AS cum_tokens,
         |    CAST(sum(n_docs) OVER () AS BIGINT) AS tot_d,
         |    CAST(sum(n_tokens) OVER () AS BIGINT) AS tot_t
         |  FROM h)
         |SELECT CAST(b AS DOUBLE) / 100 AS score_floor, n_docs,
         |  n_tokens, cum_docs, cum_tokens,
         |  round(CAST(cum_docs AS DOUBLE) / tot_d, 6) AS doc_share,
         |  round(CAST(cum_tokens AS DOUBLE) / tot_t, 6) AS token_share
         |FROM c ORDER BY score_floor DESC""".stripMargin,
    // q156: q70's pair extraction keyed by source; entropy written as
    // 0.0 − sum (the −0.0 guard) over the same IEEE divisions;
    // perplexity = exp of the already-rounded rate
    "q156_bigram_entropy" ->
      """WITH t AS (SELECT source,
        |    string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |bg AS (SELECT source, w[i] AS w1, w[i+1] AS w2
        |  FROM t, UNNEST(generate_series(1, len(w) - 1)) AS s(i)),
        |bi AS (SELECT source, w1, w2, count(*) AS n_ab
        |  FROM bg GROUP BY 1, 2, 3),
        |ma AS (SELECT source, w1, sum(n_ab) AS n_a
        |  FROM bi GROUP BY 1, 2),
        |tt AS (SELECT source, sum(n_ab) AS t_s FROM bi GROUP BY 1),
        |e AS (SELECT bi.source,
        |    CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
        |    CAST(max(t_s) AS BIGINT) AS n_bigrams,
        |    round(0.0 - sum(
        |      (CAST(n_ab AS DOUBLE) / CAST(t_s AS DOUBLE)) *
        |      ln(CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE))), 6)
        |      AS entropy_rate
        |  FROM bi JOIN ma USING (source, w1) JOIN tt USING (source)
        |  GROUP BY bi.source)
        |SELECT source, n_distinct_bigrams, n_bigrams, entropy_rate,
        |  round(exp(entropy_rate), 6) AS perplexity
        |FROM e ORDER BY source""".stripMargin,
    // q157: the q37 shingle fragment on BOTH corpora; the leak stripe
    // (every 31st conversation's ordered render planted at +2·10^12)
    // and both df-caps mirrored exactly
    "q157_cross_corpus_leak" ->
      s"""WITH t AS (${graft.gen.TranscriptGen.fromEventsOracleSql}),
         |tr AS (SELECT conv_id,
         |    CAST(row_number() OVER (PARTITION BY conv_id
         |      ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
         |    text FROM t),
         |ct AS (SELECT conv_id,
         |    string_agg(text, ' ' ORDER BY turn_idx) AS ctext
         |  FROM tr GROUP BY conv_id),
         |leak AS (SELECT CAST(substr(conv_id, 6) AS BIGINT)
         |      + 2000000000000 AS doc_id, ctext AS text
         |  FROM ct WHERE CAST(substr(conv_id, 6) AS BIGINT) % 31 = 0),
         |d AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id, text FROM leak),
         |dw AS (SELECT doc_id,
         |    string_split_regex(trim(text), '\\s+') AS w FROM d),
         |ds AS (SELECT DISTINCT doc_id,
         |    md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS h
         |  FROM dw, UNNEST(generate_series(1, greatest(len(w) - 2, 0)))
         |    AS s(i)),
         |hotd AS (SELECT h FROM ds GROUP BY h HAVING count(*) > 50),
         |cw AS (SELECT conv_id,
         |    string_split_regex(trim(ctext), '\\s+') AS w FROM ct),
         |cs AS (SELECT DISTINCT conv_id,
         |    md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS h
         |  FROM cw, UNNEST(generate_series(1, greatest(len(w) - 2, 0)))
         |    AS s(i)),
         |hotc AS (SELECT h FROM cs GROUP BY h HAVING count(*) > 50),
         |dn AS (SELECT doc_id, count(*) AS doc_shingles
         |  FROM ds GROUP BY 1),
         |j AS (SELECT ds.doc_id, cs.conv_id,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM ds JOIN cs USING (h)
         |  WHERE ds.h NOT IN (SELECT h FROM hotd)
         |    AND ds.h NOT IN (SELECT h FROM hotc)
         |  GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT j.doc_id, j.conv_id, j.n_shared, dn.doc_shingles,
         |  round(CAST(n_shared AS DOUBLE) / doc_shingles, 6)
         |    AS leak_frac
         |FROM j JOIN dn USING (doc_id)
         |ORDER BY doc_id, conv_id""".stripMargin,
    "q158_top_pc" -> topPcOracle(3),
    // q160: q35's LSH candidate oracle at the sweep's high-recall
    // banding (r=3, b=12, base 0.1) inside q140's cumulative shell
    "q160_cosine_sweep" ->
      s"""WITH b AS (SELECT
         |    CAST(round(cos_sim * 1000000) AS BIGINT) // 100000
         |      AS bucket
         |  FROM (${nearDupLshOracle(0.1, 3, 12, 64)}) t),
         |c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
         |th AS (SELECT unnest(generate_series(1, 9)) AS tb)
         |SELECT CAST(tb AS DOUBLE) / 10.0 AS threshold,
         |  CAST(coalesce((SELECT sum(n) FROM c WHERE bucket >= tb), 0)
         |    AS BIGINT) AS n_pairs_ge,
         |  CASE WHEN coalesce((SELECT sum(n) FROM c WHERE bucket >= 1),
         |      0) = 0 THEN 0.0
         |    ELSE round(CAST(coalesce((SELECT sum(n) FROM c
         |        WHERE bucket >= tb), 0) AS DOUBLE) /
         |      CAST((SELECT sum(n) FROM c WHERE bucket >= 1)
         |        AS DOUBLE), 6) END AS share_of_base
         |FROM th ORDER BY threshold""".stripMargin,
    // q161: q33's candidate oracle, cumulative ≤h counts over the
    // ≤8-row hamming histogram
    "q161_hamming_sweep" ->
      s"""WITH c AS (SELECT hamming, count(*) AS n
         |  FROM ($simhashOracle) t GROUP BY hamming),
         |tot AS (SELECT coalesce(sum(n), 0) AS tn FROM c),
         |th AS (SELECT unnest(generate_series(0, 7)) AS h)
         |SELECT CAST(h AS INTEGER) AS max_hamming,
         |  CAST(coalesce((SELECT sum(n) FROM c WHERE hamming <= h), 0)
         |    AS BIGINT) AS n_pairs_le,
         |  CASE WHEN (SELECT tn FROM tot) = 0 THEN 0.0
         |    ELSE round(CAST(coalesce((SELECT sum(n) FROM c
         |        WHERE hamming <= h), 0) AS DOUBLE) /
         |      CAST((SELECT tn FROM tot) AS DOUBLE), 6) END
         |    AS share_of_candidates
         |FROM th ORDER BY max_hamming""".stripMargin,
    // q162: one bounded cell rollup; the length bucket is integer div
    "q162_k_anonymity" ->
      """SELECT source, lang, n_chars // 50 AS chars_bucket,
        |  count(*) AS n_docs, count(*) < 5 AS at_risk
        |FROM documents
        |GROUP BY 1, 2, 3
        |ORDER BY source, lang, chars_bucket""".stripMargin,
    "q163_ann_recall_curve" -> annRecallCurveOracle(4, 2, 5, 10),
    // q164: q60's md5 shard key verbatim; min over PRESENT shards,
    // mean over the full nShards denominator — both as the Spark side
    "q164_shard_balance" ->
      """WITH l AS (SELECT
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |      1, 12) AS BIGINT) % 64 AS INTEGER) AS shard,
        |    CAST(len(string_split_regex(trim(text), '\s+'))
        |      AS BIGINT) AS nt
        |  FROM documents),
        |g AS (SELECT shard, sum(nt) AS load FROM l GROUP BY 1),
        |a AS (SELECT CAST(sum(load) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS used,
        |    CAST(min(load) AS BIGINT) AS mn,
        |    CAST(max(load) AS BIGINT) AS mx FROM g)
        |SELECT CAST(64 AS INTEGER) AS n_shards, used AS n_shards_used,
        |  total AS total_tokens, mn AS min_load, mx AS max_load,
        |  round(CAST(total AS DOUBLE) / 64, 6) AS mean_load,
        |  CASE WHEN total = 0 THEN 0.0
        |    ELSE round(CAST(mx AS DOUBLE) /
        |      (CAST(total AS DOUBLE) / 64), 6) END AS max_over_mean
        |FROM a""".stripMargin,
    // q165: q58's score chain at the 1e-1 grid × exact-div length
    // bucket; MI / entropies over the bounded cell table (driver
    // sweep in Spark, plain aggregates here — same exact longs)
    "q165_quality_length_mi" ->
      s"""WITH f AS (SELECT doc_id, text,
         |    ' ' || lower(text) || ' ' AS p,
         |    CAST(len(string_split_regex(trim(text), '\\s+'))
         |      AS BIGINT) AS nt
         |  FROM documents),
         |sc AS (SELECT nt,
         |    round(1.0 / (1.0 + exp(-(-2.0 +
         |      6.0 * round(CAST(CAST(${stopHitsSql("p")} AS BIGINT)
         |        AS DOUBLE) / greatest(nt, 1), 4) +
         |      0.3 * round(CAST(length(text) AS DOUBLE) /
         |        greatest(nt, 1), 4) -
         |      4.0 * round(CAST(len(regexp_extract_all(text,
         |        '[.,!?;:]')) AS DOUBLE) / greatest(nt, 1), 4) +
         |      0.2 * ln(nt + 1)))), 6) AS s
         |  FROM f),
         |cells AS (SELECT
         |    CAST(floor(CAST(s AS DECIMAL(9,6)) * 10) AS INTEGER)
         |      AS sb,
         |    CAST(nt // 16 AS INTEGER) AS lb, count(*) AS n
         |  FROM sc GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t,
         |    CAST(sum(n) AS BIGINT) AS nd,
         |    CAST(count(*) AS BIGINT) AS nc FROM cells),
         |px AS (SELECT sb, sum(n) AS nx FROM cells GROUP BY 1),
         |py AS (SELECT lb, sum(n) AS ny FROM cells GROUP BY 1),
         |mi AS (SELECT sum((c.n / t.t) * ln((c.n / t.t) /
         |      ((px.nx / t.t) * (py.ny / t.t)))) AS v
         |  FROM cells c JOIN px USING (sb) JOIN py USING (lb), tot t),
         |hx AS (SELECT 0.0 - sum((nx / t.t) * ln(nx / t.t)) AS v
         |  FROM px, tot t),
         |hy AS (SELECT 0.0 - sum((ny / t.t) * ln(ny / t.t)) AS v
         |  FROM py, tot t)
         |SELECT t.nd AS n_docs, t.nc AS n_cells,
         |  round(mi.v, 6) AS mi_nats, round(hx.v, 6) AS h_score,
         |  round(hy.v, 6) AS h_length,
         |  CASE WHEN least(hx.v, hy.v) = 0.0 THEN 0.0
         |    ELSE round(mi.v / least(hx.v, hy.v), 6) END
         |    AS normalized_mi
         |FROM tot t, mi, hx, hy""".stripMargin,
    // q166: q32's seed:shingle md5 family keyed by SOURCE; min is
    // duplicate-immune so the per-doc-distinct shingle nuance drops out
    "q166_source_minhash" -> {
      val mins = (0 until 8).map(i =>
        s"min(md5('$i:' || shingle)) AS mh$i").mkString(",\n|    ")
      val eq = (0 until 8).map(i =>
        s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END")
        .mkString(" +\n|    ")
      s"""WITH w AS (SELECT source,
         |    string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |sh AS (SELECT source,
         |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
         |  FROM w, UNNEST(generate_series(1, greatest(len(w)-2, 0)))
         |    AS t(i)),
         |m AS (SELECT source,
         |    $mins
         |  FROM sh GROUP BY 1)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(($eq) AS INTEGER) AS n_matching,
         |  round(CAST(($eq) AS DOUBLE) / 8, 6) AS est_jaccard
         |FROM m a JOIN m b ON a.source < b.source
         |ORDER BY source_a, source_b""".stripMargin
    },
    // q167: the q63 gate, the q64 gate and the q58/q165 score chain
    // composed per doc, rolled into the ≤8-cell Venn with shares
    "q167_filter_agreement" ->
      s"""WITH f AS (SELECT doc_id, text,
         |    string_split(text, chr(10)) AS lines,
         |    string_split_regex(trim(text), '\\s+') AS toks,
         |    ' ' || lower(text) || ' ' AS p
         |  FROM documents),
         |g AS (SELECT
         |    (len(list_filter(lines, ln ->
         |        regexp_matches(trim(ln), '[.!?"]$$') AND
         |        len(string_split_regex(trim(ln), '\\s+')) >= 5 AND
         |        NOT contains(lower(ln), 'javascript'))) >= 3
         |      AND NOT contains(lower(text), 'lorem ipsum')
         |      AND NOT contains(text, '{')) AS keep_c4,
         |    (len(toks) BETWEEN 50 AND 100000 AND
         |     round(CAST(list_sum(list_transform(toks,
         |         w -> length(w))) AS DOUBLE) /
         |       greatest(len(toks), 1), 4) BETWEEN 3.0 AND 10.0 AND
         |     round((
         |       (length(text) - length(replace(text, '#', ''))) +
         |       (length(text) - length(replace(text, '...', ''))) / 3 +
         |       (length(text) - length(replace(text, '…', '')))
         |     ) / CAST(greatest(len(toks), 1) AS DOUBLE), 4) < 0.1 AND
         |     round(CAST(len(list_filter(lines,
         |         ln -> regexp_matches(ltrim(ln), '^[-*•]')))
         |       AS DOUBLE) / greatest(len(lines), 1), 4) < 0.1 AND
         |     round(CAST(len(list_filter(lines,
         |         ln -> regexp_matches(rtrim(ln), '(\\.\\.\\.|…)$$')))
         |       AS DOUBLE) / greatest(len(lines), 1), 4) < 0.3 AND
         |     round(CAST(len(list_filter(toks,
         |         w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) /
         |       greatest(len(toks), 1), 4) > 0.8 AND
         |     (CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'the') THEN 1 ELSE 0 END +
         |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'be') THEN 1 ELSE 0 END +
         |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'to') THEN 1 ELSE 0 END +
         |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'of') THEN 1 ELSE 0 END +
         |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'and') THEN 1 ELSE 0 END +
         |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'that') THEN 1 ELSE 0 END +
         |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'have') THEN 1 ELSE 0 END +
         |      CASE WHEN list_contains(list_transform(toks, x -> lower(x)), 'with') THEN 1 ELSE 0 END)
         |       >= 2) AS keep_gopher,
         |    (round(1.0 / (1.0 + exp(-(-2.0 +
         |      6.0 * round(CAST(CAST(${stopHitsSql("p")} AS BIGINT)
         |        AS DOUBLE) / greatest(len(toks), 1), 4) +
         |      0.3 * round(CAST(length(text) AS DOUBLE) /
         |        greatest(len(toks), 1), 4) -
         |      4.0 * round(CAST(len(regexp_extract_all(text,
         |        '[.,!?;:]')) AS DOUBLE) / greatest(len(toks), 1), 4) +
         |      0.2 * ln(len(toks) + 1)))), 6) >= 0.5) AS keep_clf
         |  FROM f),
         |c AS (SELECT keep_c4, keep_gopher, keep_clf,
         |    CAST(count(*) AS BIGINT) AS n_docs
         |  FROM g GROUP BY 1, 2, 3),
         |t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tot FROM c)
         |SELECT keep_c4, keep_gopher, keep_clf, n_docs,
         |  round(n_docs / t.tot, 6) AS share,
         |  CAST((CASE WHEN keep_c4 THEN 1 ELSE 0 END +
         |        CASE WHEN keep_gopher THEN 1 ELSE 0 END +
         |        CASE WHEN keep_clf THEN 1 ELSE 0 END) AS INTEGER)
         |    AS n_filters_pass
         |FROM c, t
         |ORDER BY keep_c4, keep_gopher, keep_clf""".stripMargin,
    // q168: q151's exact-integer decile key over q30's md5(text);
    // first-seen = min(decile) per hash, cumulative via window over
    // the ≤10-row rollup
    "q168_dup_growth" ->
      """WITH nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
        |k AS (SELECT CAST(least(doc_id * 10 // (SELECT n FROM nn), 9)
        |      AS INTEGER) AS decile,
        |    md5(text) AS h
        |  FROM documents),
        |d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM k GROUP BY 1),
        |fs AS (SELECT h, min(decile) AS first_decile FROM k GROUP BY 1),
        |nw AS (SELECT first_decile AS decile,
        |    CAST(count(*) AS BIGINT) AS n_new
        |  FROM fs GROUP BY 1),
        |j AS (SELECT d.decile, d.n_docs,
        |    CAST(coalesce(nw.n_new, 0) AS BIGINT) AS n_new_hashes
        |  FROM d LEFT JOIN nw USING (decile)),
        |c AS (SELECT decile, n_docs, n_new_hashes,
        |    CAST(sum(n_docs) OVER (ORDER BY decile) AS BIGINT)
        |      AS cum_docs,
        |    CAST(sum(n_new_hashes) OVER (ORDER BY decile) AS BIGINT)
        |      AS cum_distinct
        |  FROM j)
        |SELECT decile, n_docs, n_new_hashes, cum_docs, cum_distinct,
        |  round(1.0 - CAST(cum_distinct AS DOUBLE) / cum_docs, 6)
        |    AS cum_dup_rate
        |FROM c ORDER BY decile""".stripMargin,
    // q169: q52's injected-footer corpus and hot-line derivation, but
    // MEASURED per doc instead of stripped; flag on the ROUNDED ratio
    "q169_boilerplate_share" ->
      """WITH c AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || chr(10) ||
        |      'footer: (c) acme corp - all rights reserved'
        |    ELSE text END AS text
        |  FROM documents),
        |l AS (SELECT doc_id, md5(ln[i]) AS lh
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ln
        |      FROM c),
        |    UNNEST(generate_series(1, len(ln))) AS t(i)),
        |hot AS (SELECT lh FROM l GROUP BY 1
        |  HAVING count(DISTINCT doc_id) > 50),
        |g AS (SELECT doc_id, count(*) AS n_lines,
        |    CAST(sum(CASE WHEN lh IN (SELECT lh FROM hot)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
        |  FROM l GROUP BY 1),
        |r AS (SELECT doc_id, n_lines, n_boiler,
        |    round(CAST(n_boiler AS DOUBLE) / n_lines, 6) AS boiler_ratio
        |  FROM g)
        |SELECT doc_id, n_lines, n_boiler, boiler_ratio,
        |  boiler_ratio >= 0.3 AS boiler_heavy
        |FROM r ORDER BY doc_id""".stripMargin,
    // q170: the four nested canonical md5s in one scan, four
    // COUNT(DISTINCT)s in one agg, unpivoted over a 4-row VALUES table
    "q170_canon_dedup_sweep" ->
      """WITH h AS (SELECT md5(text) AS h0,
        |    md5(lower(text)) AS h1,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |      AS h2,
        |    md5(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS h3
        |  FROM documents),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT h0) AS BIGINT) AS d0,
        |    CAST(count(DISTINCT h1) AS BIGINT) AS d1,
        |    CAST(count(DISTINCT h2) AS BIGINT) AS d2,
        |    CAST(count(DISTINCT h3) AS BIGINT) AS d3
        |  FROM h),
        |lv AS (SELECT * FROM (VALUES (0, 'raw'), (1, 'lower'),
        |    (2, 'lower_ws'), (3, 'lower_ws_alnum'))
        |    AS v(level_idx, level)),
        |u AS (SELECT level_idx, level, n,
        |    CASE level_idx WHEN 0 THEN d0 WHEN 1 THEN d1
        |      WHEN 2 THEN d2 ELSE d3 END AS d
        |  FROM lv, a)
        |SELECT level_idx, level, n AS n_docs, d AS n_distinct,
        |  n - d AS n_dup,
        |  round(CAST(n - d AS DOUBLE) / n, 6) AS dup_rate
        |FROM u ORDER BY level_idx""".stripMargin,
    // q171: words/sentence-groups/vowel-group syllables as row-local
    // list folds; band thresholds compare the ROUNDED score
    // q179: q115's skeleton normalizer over the %6 generator stripe;
    // min(template) folds into the winner agg (the q115 oracle shape)
    "q179_doc_templates" ->
      """WITH c AS (SELECT source,
        |    CASE WHEN doc_id % 6 = 0 THEN 'build ' ||
        |      CAST(doc_id AS VARCHAR) || ' completed in ' ||
        |      CAST(doc_id % 97 AS VARCHAR) || ' seconds'
        |    ELSE text END AS text
        |  FROM documents),
        |u AS (SELECT source, trim(regexp_replace(regexp_replace(
        |    lower(text), '[0-9]+', '#', 'g'), '[ \t\n\r]+', ' ', 'g'))
        |    AS template
        |  FROM c),
        |w AS (SELECT md5(template) AS template_md5,
        |    count(*) AS n_docs,
        |    count(DISTINCT source) AS n_sources,
        |    min(template) AS template
        |  FROM u GROUP BY 1 HAVING count(*) >= 3
        |  ORDER BY n_docs DESC, template_md5 LIMIT 20)
        |SELECT template_md5, template, n_docs, n_sources FROM w
        |ORDER BY n_docs DESC, template_md5""".stripMargin,
    // q180: the function-word replace-length counts per source,
    // pairwise integer cosine — generated from the SAME FunctionWords
    // list the operator ships
    "q180_stopword_profile" -> stopwordProfileOracle,
    // q181: the q75-family unrolled Lloyd chains per (m, sub-space);
    // per-vector min-dist sums row-locally, micro-unit corpus sum
    "q181_pq_distortion" ->
      pqDistortionOracle(ms = Seq(1, 2, 4), codeK = 8, pqIters = 2,
        dim = 64),
    // q182: row-local numeric filter + digit-width fold, ONE bounded
    // source rollup; empty-list sum coalesces to 0 (Spark's fold init)
    "q182_numeric_profile" ->
      """WITH w AS (SELECT source,
        |    string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |t AS (SELECT source,
        |    CAST(len(ws) AS BIGINT) AS nt,
        |    CAST(len(list_filter(ws,
        |      x -> regexp_matches(x, '^[0-9]+$'))) AS BIGINT) AS nn,
        |    CAST(coalesce(list_sum(list_transform(list_filter(ws,
        |      x -> regexp_matches(x, '^[0-9]+$')),
        |      x -> length(x))), 0) AS BIGINT) AS nd
        |  FROM w),
        |g AS (SELECT source,
        |    CAST(sum(nt) AS BIGINT) AS n_tokens,
        |    CAST(sum(nn) AS BIGINT) AS n_numeric,
        |    CAST(sum(nd) AS BIGINT) AS n_digits
        |  FROM t GROUP BY source)
        |SELECT source, n_tokens, n_numeric,
        |  round(CAST(n_numeric AS DOUBLE) / greatest(n_tokens, 1), 6)
        |    AS numeric_share,
        |  round(CAST(n_digits AS DOUBLE) / greatest(n_numeric, 1), 6)
        |    AS mean_digits
        |FROM g ORDER BY source""".stripMargin,
    // q183: the %8 rotating-CDN link stripe; host extraction is one
    // regexp pass, (domain, doc) pairs only on the wire
    "q183_domain_scan" ->
      """WITH c AS (SELECT doc_id,
        |    CASE WHEN doc_id % 8 = 0 THEN text || ' see https://cdn'
        |      || CAST(doc_id % 5 AS VARCHAR)
        |      || '.example.com/page for details'
        |    ELSE text END AS text
        |  FROM documents),
        |d AS (SELECT doc_id, unnest(regexp_extract_all(text,
        |    'https?://([a-z0-9.-]+)', 1)) AS domain FROM c),
        |g AS (SELECT domain,
        |    CAST(count(*) AS BIGINT) AS n_occurrences,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM d GROUP BY 1)
        |SELECT domain, n_occurrences, n_docs FROM g
        |ORDER BY n_occurrences DESC, domain LIMIT 20""".stripMargin,
    // q186: exact per-source length percentiles; quantile_cont is the
    // q13-established R-7 parity with Spark's exact percentile
    "q186_source_length_profile" ->
      """WITH d AS (SELECT source,
        |    CAST(len(string_split_regex(trim(text), '\s+'))
        |      AS BIGINT) AS nt
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(quantile_cont(CAST(nt AS DOUBLE), 0.1), 4)
        |    AS p10_tokens,
        |  round(quantile_cont(CAST(nt AS DOUBLE), 0.5), 4)
        |    AS p50_tokens,
        |  round(quantile_cont(CAST(nt AS DOUBLE), 0.9), 4)
        |    AS p90_tokens,
        |  round(avg(nt), 4) AS mean_tokens
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    // q187: the three family oracles (q31/q32/q33, verbatim at their
    // registry configs) composed — pair union, membership flags per
    // family, ≤7-cell rollup
    "q187_dedup_venn" ->
      s"""WITH j AS ($ngramJaccardOracle),
         |m AS ($minhashLshOracle),
         |sh3 AS ($simhashOracle),
         |u AS (SELECT doc_a, doc_b FROM j
         |  UNION SELECT doc_a, doc_b FROM m
         |  UNION SELECT doc_a, doc_b FROM sh3),
         |f AS (SELECT
         |    (j.doc_a IS NOT NULL) AS in_jaccard,
         |    (m.doc_a IS NOT NULL) AS in_minhash,
         |    (sh3.doc_a IS NOT NULL) AS in_simhash
         |  FROM u
         |  LEFT JOIN j ON j.doc_a = u.doc_a AND j.doc_b = u.doc_b
         |  LEFT JOIN m ON m.doc_a = u.doc_a AND m.doc_b = u.doc_b
         |  LEFT JOIN sh3 ON sh3.doc_a = u.doc_a
         |    AND sh3.doc_b = u.doc_b)
         |SELECT in_jaccard, in_minhash, in_simhash,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM f GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // q176: the %4 stutter stripe; the run collapse is the q52 line
    // derivation + a per-doc lag filter, cleaned text leaves as md5
    "q176_line_run_collapse" ->
      """WITH c AS (SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN text || chr(10) ||
        |      'progress: 42%' || chr(10) || 'progress: 42%' ||
        |      chr(10) || 'progress: 42%'
        |    ELSE text END AS text
        |  FROM documents),
        |l AS (SELECT doc_id, len(ln) AS n_lines, i AS idx, ln[i] AS line
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ln
        |      FROM c),
        |    UNNEST(generate_series(1, len(ln))) AS t(i)),
        |k AS (SELECT doc_id, n_lines, idx, line,
        |    lag(line) OVER (PARTITION BY doc_id ORDER BY idx) AS prev
        |  FROM l),
        |f AS (SELECT * FROM k WHERE prev IS NULL OR line <> prev)
        |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  md5(string_agg(line, chr(10) ORDER BY idx)) AS clean_md5
        |FROM f GROUP BY doc_id, n_lines ORDER BY doc_id""".stripMargin,
    // q177: q36's recursive-CTE components → size histogram + the
    // singleton mass row (total − docs-in-components)
    "q177_cluster_size_hist" ->
      s"""WITH RECURSIVE
         |p AS (SELECT doc_a, doc_b FROM ($ngramJaccardOracle) t),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |reach(node, lab) AS (
         |  SELECT s, s FROM edges
         |  UNION
         |  SELECT e.s, r.lab FROM edges e JOIN reach r ON e.d = r.node),
         |cc AS (SELECT node, min(lab) AS cid FROM reach GROUP BY node),
         |sz AS (SELECT cid, CAST(count(*) AS BIGINT) AS csize
         |  FROM cc GROUP BY cid),
         |h AS (SELECT csize, CAST(count(*) AS BIGINT) AS n_clusters
         |  FROM sz GROUP BY csize),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |ins AS (SELECT CAST(coalesce(sum(csize * n_clusters), 0)
         |    AS BIGINT) AS m FROM h),
         |u AS (SELECT csize, n_clusters FROM h
         |  UNION ALL SELECT CAST(1 AS BIGINT),
         |    (SELECT n FROM tot) - (SELECT m FROM ins))
         |SELECT csize, n_clusters, csize * n_clusters AS n_docs,
         |  round(CAST(csize * n_clusters AS DOUBLE) /
         |    (SELECT n FROM tot), 6) AS doc_share
         |FROM u ORDER BY csize""".stripMargin,
    // q172: the +10^12 truncation stripe (q157's injection convention);
    // both hashes from one scan, one prefix-keyed agg, pure-exact-dup
    // clusters excluded
    "q172_prefix_dups" ->
      """WITH inj AS (SELECT doc_id + 1000000000000 AS doc_id,
        |    substr(text, 1, 104) AS text
        |  FROM documents WHERE doc_id % 9 = 0),
        |d AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM inj),
        |k AS (SELECT md5(substr(text, 1, 64)) AS prefix_hash,
        |    md5(text) AS fh, doc_id FROM d),
        |g AS (SELECT prefix_hash, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(DISTINCT fh) AS BIGINT) AS n_full_distinct,
        |    min(doc_id) AS rep_doc_id
        |  FROM k GROUP BY 1)
        |SELECT prefix_hash, n_docs, n_full_distinct, rep_doc_id
        |FROM g WHERE n_docs > 1 AND n_full_distinct > 1
        |ORDER BY n_docs DESC, prefix_hash""".stripMargin,
    // q173: q59's kNN CTEs at k=2; per-point ln(d2/d1) rounds to 1e-6
    // and sums as exact integer micro-units (q77's fixed-point
    // discipline) before the single MLE division
    "q173_twonn_dim" -> twoNnOracle(nPlanes = 4, dim = 64),
    // q174: q52's footer stripe + the %7 CC stripe; three substring
    // gates per row, ONE bounded source rollup
    "q174_license_scan" ->
      """WITH c AS (SELECT source,
        |    lower(CASE WHEN doc_id % 5 = 0 THEN text || chr(10) ||
        |        'footer: (c) acme corp - all rights reserved'
        |      ELSE text END ||
        |      CASE WHEN doc_id % 7 = 0 THEN chr(10) ||
        |        'licensed under creative commons attribution'
        |      ELSE '' END) AS p
        |  FROM documents),
        |m AS (SELECT source,
        |    CASE WHEN position('all rights reserved' IN p) > 0
        |      THEN 1 ELSE 0 END AS ar,
        |    CASE WHEN position('(c) ' IN p) > 0
        |        OR position('copyright' IN p) > 0
        |      THEN 1 ELSE 0 END AS cm,
        |    CASE WHEN position('creative commons' IN p) > 0
        |      THEN 1 ELSE 0 END AS cc
        |  FROM c),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(ar) AS BIGINT) AS n_all_rights,
        |    CAST(sum(cm) AS BIGINT) AS n_copyright,
        |    CAST(sum(cc) AS BIGINT) AS n_creative_commons,
        |    CAST(sum(CASE WHEN ar + cm + cc > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_any_marker
        |  FROM m GROUP BY source)
        |SELECT source, n_docs, n_all_rights, n_copyright,
        |  n_creative_commons, n_any_marker,
        |  round(CAST(n_any_marker AS DOUBLE) / n_docs, 6)
        |    AS marker_share
        |FROM g ORDER BY source""".stripMargin,
    "q171_readability" ->
      """WITH w AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS ws, text
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    greatest(CAST(len(ws) AS BIGINT), 1) AS n_words,
        |    greatest(CAST(len(string_split_regex(text, '[.!?]+')) - 1
        |      AS BIGINT), 1) AS n_sentences,
        |    CAST(list_sum(list_transform(ws, x ->
        |      greatest(len(string_split_regex(lower(x),
        |        '[aeiouy]+')) - 1, 1))) AS BIGINT) AS n_syllables
        |  FROM w),
        |r AS (SELECT doc_id, n_words, n_sentences, n_syllables,
        |    round(206.835
        |      - 1.015 * CAST(n_words AS DOUBLE) / n_sentences
        |      - 84.6 * CAST(n_syllables AS DOUBLE) / n_words, 6)
        |      AS fre,
        |    round(0.39 * CAST(n_words AS DOUBLE) / n_sentences
        |      + 11.8 * CAST(n_syllables AS DOUBLE) / n_words
        |      - 15.59, 6) AS fk_grade
        |  FROM s)
        |SELECT doc_id, n_words, n_sentences, n_syllables, fre,
        |  fk_grade,
        |  CASE WHEN fre >= 60.0 THEN 'easy'
        |       WHEN fre >= 30.0 THEN 'medium'
        |       ELSE 'hard' END AS band
        |FROM r ORDER BY doc_id""".stripMargin,
    // q159: the q151 decile key; DISTINCT (decile, tok) once,
    // first-seen = min(decile) per type, cumulative via window over
    // the bounded rollup
    "q159_vocab_churn" ->
      """WITH nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
        |st AS (SELECT DISTINCT
        |    CAST(least(doc_id * 10 // (SELECT n FROM nn), 9)
        |      AS INTEGER) AS decile,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |pd AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_types
        |  FROM st GROUP BY 1),
        |fd AS (SELECT tok, min(decile) AS fd FROM st GROUP BY 1),
        |np AS (SELECT fd AS decile, CAST(count(*) AS BIGINT) AS n_new
        |  FROM fd GROUP BY 1)
        |SELECT pd.decile, pd.n_types,
        |  coalesce(np.n_new, 0) AS n_new,
        |  round(CAST(coalesce(np.n_new, 0) AS DOUBLE) / pd.n_types, 6)
        |    AS new_share,
        |  CAST(sum(coalesce(np.n_new, 0))
        |    OVER (ORDER BY pd.decile) AS BIGINT) AS cum_vocab
        |FROM pd LEFT JOIN np USING (decile)
        |ORDER BY pd.decile""".stripMargin)

  /** q163 oracle: the q74 chain trained once, probed at every nProbe
    * 1..nCells, each level's top-k intersected with the brute-force
    * truth (q40's shape over the same fold cosines). */
  private def annRecallCurveOracle(nCells: Int, kmIters: Int, k: Int,
      nQueries: Int): String = {
    val aF = s"a${kmIters + 1}"
    val cF = s"c$kmIters"
    def fold(zipped: String) =
      s"list_reduce(list_transform($zipped, x -> x[1] * x[2])," +
        " (acc, t2) -> acc + t2)"
    def norm2(e: String) =
      s"list_reduce(list_transform($e, v -> v * v)," +
        " (acc, t2) -> acc + t2)"
    val cos = s"round(${fold("list_zip(q.qe, a.e)")} /" +
      s" (sqrt(${norm2("q.qe")}) * sqrt(${norm2("a.e")})), 6)"
    val perNp = (1 to nCells).map { np =>
      s"""pr$np AS (SELECT query_id, qe, c AS cell FROM (
         |    SELECT query_id, qe, c, row_number()
         |        OVER (PARTITION BY query_id ORDER BY d, c) AS rn
         |    FROM pd) WHERE rn <= $np),
         |tk$np AS (SELECT query_id, neighbor_id FROM (
         |    SELECT q.query_id, a.vec_id AS neighbor_id, $cos AS cs,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY $cos DESC, a.vec_id) AS rank
         |    FROM pr$np q JOIN $aF a
         |      ON q.cell = a.cluster AND q.query_id <> a.vec_id)
         |  WHERE rank <= $k),
         |r$np AS (SELECT $np AS n_probe, CAST(count(*) AS BIGINT)
         |    AS n_hits
         |  FROM tk$np JOIN bt USING (query_id, neighbor_id))"""
        .stripMargin
    }
    val union = (1 to nCells).map(np => s"SELECT * FROM r$np")
      .mkString("\nUNION ALL ")
    s"""WITH ${kmeansCtes(nCells, kmIters)},
       |q AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe
       |  FROM e WHERE vec_id < $nQueries),
       |bt AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
       |    SELECT q.query_id, a.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY $cos DESC, a.vec_id) AS rank
       |    FROM q JOIN e a ON q.query_id <> a.vec_id)
       |  WHERE rank <= $k),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM bt),
       |pd AS MATERIALIZED (SELECT q.query_id, q.qe, cc.c,
       |    list_reduce(list_transform(list_zip(q.qe, cc.cent),
       |        x -> (x[1] - x[2]) * (x[1] - x[2])),
       |      (acc, t2) -> acc + t2) AS d
       |  FROM q CROSS JOIN $cF cc),
       |${perNp.mkString(",\n")}
       |SELECT n_probe, n_hits,
       |  round(n_hits / (SELECT t FROM tot), 6) AS recall_at_k
       |FROM ($union) ORDER BY n_probe""".stripMargin
  }

  /** q158 oracle: power iteration unrolled — per-dim means round 1e-6
    * (the Spark side inlines the same values), v₀ = 1/√64 = 0.125
    * exactly, every round re-rounds v to the 1e-6 grid, and the final
    * Rayleigh/trace ratios divide the same float sums the Spark agg
    * produces. */
  private def topPcOracle(iters: Int): String = {
    def foldDot(a: String, b: String) =
      s"""list_reduce(list_transform(list_zip($a, $b),
         |      x -> x[1] * x[2]), (acc, t2) -> acc + t2)""".stripMargin
    val head =
      s"""e AS MATERIALIZED (SELECT vec_id,
         |    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
         |  FROM embeddings),
         |mm AS (SELECT i, round(avg(e[i]), 6) AS mv
         |  FROM e, UNNEST(generate_series(1, len(e))) s(i) GROUP BY i),
         |ml AS (SELECT list(mv ORDER BY i) AS m FROM mm),
         |cent AS MATERIALIZED (SELECT vec_id,
         |    list_transform(list_zip(e, (SELECT m FROM ml)),
         |      x -> x[1] - x[2]) AS c
         |  FROM e),
         |v0 AS (SELECT list_transform(generate_series(1, 64),
         |    x -> CAST(0.125 AS DOUBLE)) AS v)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""s$r AS (SELECT vec_id, c,
         |    ${foldDot("c", s"(SELECT v FROM v${r - 1})")} AS s
         |  FROM cent),
         |w$r AS (SELECT i, round(sum(c[i] * s), 6) AS wv
         |  FROM s$r, UNNEST(generate_series(1, 64)) t(i) GROUP BY i),
         |n$r AS (SELECT sqrt(sum(wv * wv)) AS nm FROM w$r),
         |v$r AS (SELECT list(round(wv / (SELECT nm FROM n$r), 6)
         |    ORDER BY i) AS v FROM w$r)""".stripMargin
    }
    s"""WITH ${(head +: rounds).mkString(",\n")},
       |sf AS (SELECT
       |    ${foldDot("c", s"(SELECT v FROM v$iters)")} AS s,
       |    ${foldDot("c", "c")} AS cc
       |  FROM cent),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(s * s) AS ss,
       |    sum(cc) AS tr FROM sf),
       |dd AS (SELECT CAST(i - 1 AS INTEGER) AS dim
       |  FROM v$iters, UNNEST(generate_series(1, 64)) t(i)
       |  ORDER BY abs(v[i]) DESC, i LIMIT 1)
       |SELECT a.n AS n_vecs, round(a.ss / a.n, 6) AS lambda1,
       |  round(a.tr / a.n, 6) AS trace_var,
       |  round(round(a.ss / a.n, 6) / round(a.tr / a.n, 6), 6)
       |    AS var_share,
       |  dd.dim AS dominant_dim
       |FROM a, dd""".stripMargin
  }
}
