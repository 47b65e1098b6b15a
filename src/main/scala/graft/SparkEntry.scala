package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries => A, PipelineQueries => P,
  TrainingDataQueries => T, Oracles}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full parse→normalize→order→route→aggregate pipeline —
    * synthesize a small raw-export corpus, parse it with the fast-path
    * codegen scanner (zero-shuffle parse+order), aggregate per-sink
    * routed counts. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val raw = graft.gen.TranscriptGen
      .renderRawJsonl(graft.gen.TranscriptGen.synthesize(spark, 200))
      .toDF("line")
    val turns = graft.parse.FastTranscriptParser.parseLines(raw)
    graft.agg.Aggregates.routedCounts(turns)
      .orderBy(org.apache.spark.sql.functions.col("role"),
        org.apache.spark.sql.functions.col("tool"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_transcripts" -> (P.transcripts(_, _)),
    "q02_route_counts" -> (P.routeCounts(_, _)),
    "q03_thread_stats" -> (P.threadStats(_, _)),
    "q04_enrich_tool_category" -> (P.enrichToolCategory(_, _)),
    "q05_event_windows" -> (P.eventWindows(_, _)),
    "q06_text_checksum" -> (P.textChecksum(_, _)),
    "q07_asof_rates" -> (P.asofRates(_, _)),
    "q08_routed_rollup" -> (P.routedRollup(_, _)),
    "q09_role_pivot" -> (P.rolePivot(_, _)),
    "q10_tpch_q1" -> (A.tpchQ1(_, _)),
    "q11_orders_by_segment" -> (A.ordersBySegment(_, _)),
    "q12_top_brands" -> (A.topBrands(_, _)),
    "q13_price_percentiles" -> (A.pricePercentiles(_, _)),
    "q14_price_percentiles_approx" -> (A.pricePercentilesApprox(_, _)),
    "q15_sessions" -> (P.sessions(_, _)),
    "q16_asof_rates_merge" -> (P.asofRatesMerge(_, _)),
    "q17_grok_parse" -> (P.grokParse(_, _)),
    "q18_unicode_nfc" -> (T.unicodeNfc(_, _)),
    "q19_unigram_logprob" -> (T.unigramLogProbQ(_, _)),
    "q20_token_count" -> (T.tokenCount(_, _)),
    "q21_lang_id" -> (T.langId(_, _)),
    "q22_quality" -> (T.quality(_, _)),
    "q23_fingerprint" -> (T.fingerprint(_, _)),
    "q24_repetition" -> (T.repetition(_, _)),
    "q25_top_ngrams" -> (T.topNgrams(_, _)),
    "q26_pii_scrub" -> (T.piiScrub(_, _)),
    "q27_corpus_filter" -> (T.corpusFilter(_, _)),
    "q28_stratified_sample" -> (T.stratifiedSample(_, _)),
    "q29_seq_pack" -> (T.seqPack(_, _)),
    "q30_dedup_exact" -> (T.dedupExact(_, _)),
    "q31_ngram_jaccard" -> (T.ngramJaccard(_, _)),
    "q32_minhash_lsh" -> (T.minhashLsh(_, _)),
    "q33_simhash_pairs" -> (T.simhashPairs(_, _)),
    "q34_embedding_neardup" -> (T.embeddingNearDup(_, _)),
    "q35_embedding_neardup_lsh" -> (T.embeddingNearDupLsh(_, _)),
    "q36_dedup_clusters" -> (T.dedupClusters(_, _)),
    "q37_decontamination" -> (T.decontamination(_, _)),
    "q38_incremental_dedup" -> (T.incrementalDedup(_, _)),
    "q39_temperature_mix" -> (T.temperatureMixQ(_, _)),
    "q40_ann_brute" -> (T.annBruteForce(_, _)),
    "q41_ann_ivf" -> (T.annIvf(_, _)),
    "q42_ann_lsh" -> (T.annLsh(_, _)),
    "q43_profile" -> (T.profileQ(_, _)),
    "q44_profile_approx" -> (T.profileApproxQ(_, _)),
    "q45_dup_spans" -> (T.dupSpansQ(_, _)),
    "q46_ppl_buckets" -> (T.perplexityBucketsQ(_, _)),
    "q47_cluster_reps" -> (T.dedupRepresentativesQ(_, _)),
    "q48_bloom_dedup" -> (T.incrementalDedupBloom(_, _)),
    "q49_bpe_pairs" -> (T.bpePairsQ(_, _)),
    "q50_source_report" -> (T.sourceReportQ(_, _)),
    "q51_semantic_dedup" -> (T.semanticDedupQ(_, _)),
    "q52_line_dedup" -> (T.lineDedupQ(_, _)),
    "q53_hard_negatives" -> (T.hardNegativesQ(_, _)),
    "q54_source_prune" -> (T.sourcePruneQ(_, _)),
    "q55_tfidf_terms" -> (T.tfidfTermsQ(_, _)),
    "q56_chunking" -> (T.chunkDocsQ(_, _)),
    "q57_corpus_diff" -> (T.corpusDiffQ(_, _)),
    "q58_quality_clf" -> (T.qualityClfQ(_, _)),
    "q59_knn_graph" -> (T.knnGraphQ(_, _)),
    "q60_shard_assign" -> (T.shardAssignQ(_, _)),
    "q61_winnow" -> (T.winnowQ(_, _)),
    "q62_winnow_overlap" -> (T.winnowOverlapQ(_, _)),
    "q63_c4_filter" -> (T.c4FilterQ(_, _)),
    "q64_gopher_filter" -> (T.gopherFilterQ(_, _)),
    "q65_dsir_weights" -> (T.dsirWeightsQ(_, _)),
    "q66_code_blocks" -> (T.codeBlocksQ(_, _)),
    "q67_centroid_outliers" -> (T.centroidOutliersQ(_, _)),
    "q68_quality_auc" -> (T.qualityAucQ(_, _)),
    "q69_bpe_train" -> (T.bpeTrainQ(_, _)),
    "q70_bigram_logprob" -> (T.bigramLogProbQ(_, _)),
    "q71_kmeans" -> (T.kmeansQ(_, _)),
    "q72_cluster_sample" -> (T.clusterSampleQ(_, _)),
    "q73_bpe_encode" -> (T.bpeEncodeQ(_, _)),
    "q74_ann_ivf_kmeans" -> (T.ivfKmeansQ(_, _)),
    "q75_ann_ivf_pq" -> (T.ivfPqQ(_, _)),
    "q76_edit_dist_verify" -> (T.editDistVerifyQ(_, _)),
    "q77_pagerank" -> (T.pageRankQ(_, _)),
    "q78_zipf_fit" -> (T.zipfFitQ(_, _)),
    "q79_source_kl" -> (T.sourceKlQ(_, _)),
    "q80_containment" -> (T.containmentQ(_, _)),
    "q81_turn_latency" -> (P.turnLatency(_, _)),
    "q82_ann_ivf_pq_residual" -> (T.ivfPqResidualQ(_, _)),
    "q83_semantic_decontam" -> (T.semanticDecontamQ(_, _)),
    "q84_dup_span_removal" -> (T.dupSpanRemovalQ(_, _)),
    "q85_tokenizer_fertility" -> (T.tokenizerFertilityQ(_, _)),
    "q86_funnel" -> (P.funnelQ(_, _)),
    "q87_bm25" -> (T.bm25Q(_, _)),
    "q88_log_odds" -> (T.logOddsQ(_, _)),
    "q89_ngram_novelty" -> (T.ngramNoveltyQ(_, _)),
    "q90_weighted_sample" -> (T.weightedSampleQ(_, _)),
    "q91_mojibake" -> (T.mojibakeQ(_, _)),
    "q92_conv_structure" -> (P.convStructure(_, _)),
    "q93_cross_source_dups" -> (T.crossSourceDupsQ(_, _)),
    "q94_lexical_diversity" -> (T.lexicalDiversityQ(_, _)),
    "q95_blocklist" -> (T.blocklistQ(_, _)),
    "q96_leakage_split" -> (T.leakageSplitQ(_, _)),
    "q97_cdc_chunks" -> (T.cdcChunksQ(_, _)),
    "q98_script_mix" -> (T.scriptMixQ(_, _)),
    "q99_lsh_audit" -> (T.lshAuditQ(_, _)),
    "q100_hot_keys" -> (P.hotKeys(_, _)),
    "q101_sft_pairs" -> (P.sftPairs(_, _)),
    "q102_role_transitions" -> (P.roleTransitions(_, _)),
    "q103_context_fit" -> (P.contextFit(_, _)),
    "q104_tool_chains" -> (P.toolChains(_, _)),
    "q105_canned_responses" -> (P.cannedResponses(_, _)),
    "q106_repeat_report" -> (P.repeatReport(_, _)),
    "q107_daily_volume" -> (P.dailyVolume(_, _)),
    "q108_position_curve" -> (P.positionCurve(_, _)),
    "q109_embedding_hygiene" -> (T.embeddingHygieneQ(_, _)),
    "q110_role_vocab" -> (P.roleVocabOverlap(_, _)),
    "q111_conv_dedup" -> (P.convDigestDups(_, _)),
    "q112_truncation" -> (P.truncationReport(_, _)),
    "q113_conv_lang" -> (P.convLangReport(_, _)),
    "q114_echo_score" -> (P.echoReport(_, _)),
    "q115_prompt_templates" -> (P.promptTemplates(_, _)),
    "q116_refusal_report" -> (P.refusalReport(_, _)),
    "q117_padding_report" -> (P.paddingReport(_, _)),
    "q118_preference_pairs" -> (P.preferencePairs(_, _)),
    "q119_context_trim" -> (P.contextTrim(_, _)),
    "q120_tool_reliability" -> (P.toolReliability(_, _)),
    "q121_loop_collapse" -> (P.loopCollapse(_, _)),
    "q122_mixture_plan" -> (T.mixturePlanQ(_, _)),
    "q123_sft_render" -> (P.sftRender(_, _)),
    "q124_loss_mask" -> (P.lossMask(_, _)),
    "q125_dialogue_windows" -> (P.dialogueWindows(_, _)),
    "q126_mixture_apply" -> (T.mixturePlanApplyQ(_, _)),
    "q127_tool_grounding" -> (P.toolGrounding(_, _)),
    "q128_special_tokens" -> (P.specialTokenScan(_, _)),
    "q129_ts_anomalies" -> (P.tsAnomalies(_, _)),
    "q130_prefix_cache" -> (P.prefixCache(_, _)),
    "q131_intent_mix" -> (P.intentMix(_, _)),
    "q132_langid_confusion" -> (T.langConfusionQ(_, _)),
    "q133_margin_report" -> (P.marginReport(_, _)),
    "q134_hapax_profile" -> (T.hapaxProfileQ(_, _)),
    "q135_ungrounded_numbers" -> (P.ungroundedNumbers(_, _)),
    "q136_embedding_drift" -> (T.batchDriftQ(_, _)),
    "q137_heaps_fit" -> (T.heapsFitQ(_, _)),
    "q138_effective_tokens" -> (T.effectiveTokensQ(_, _)),
    "q139_pmi_collocations" -> (T.pmiCollocationsQ(_, _)),
    "q140_jaccard_sweep" -> (T.jaccardSweepQ(_, _)),
    "q141_dedup_aware_plan" -> (T.dedupAwarePlanQ(_, _)))

  /** DuckDB-runnable oracle SQL per query key (same column names/order
    * as the Spark results — the driver sorts columns by name and hashes
    * values). Every query is oracle-checked: the simhash token hash is
    * md5-derived and the LSH hyperplanes are driver-inlined literal
    * matrices, so q33/q35/q42's bit-level machinery is reproduced
    * bit-for-bit in DuckDB SQL. */
  def oracleSql: Map[String, String] =
    Oracles.all ++ graft.queries.TrainingDataQueries.oracles
}
