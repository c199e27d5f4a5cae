package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each key in `queries` is one operator slug from SURVEY §2's inventory;
  * each ✓-oracle slug also has an entry in `oracleSql` with semantically
  * identical ANSI SQL for DuckDB. Column names and types are aligned on
  * both sides (the driver's compare hashes by column name and checks
  * schema). Cross-engine determinism rules (FIXTURES.md §3): money
  * aggregates sum as DECIMAL then cast to double; timestamps are reduced
  * to epoch seconds; every query ends in a total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped hash aggregation (SURVEY §7 M1). */
  def entry(spark: SparkSession): DataFrame =
    Aggs.hashGroup(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scans / ingestion ---
    "scan_project" -> ((s, d) => Scans.scanProject(Tables.lineitem(s, d))),
    "scan_count" -> ((s, d) => Scans.scanCount(Tables.lineitem(s, d))),
    "fn_split_part" -> ((s, d) => ScalarFns.fnSplitPart(Tables.part(s, d))),
    "scan_json_lines" -> ((s, d) => Scans.scanJsonLines(Tables.events(s, d))),
    // --- filter / project / predicates ---
    "filter_pred" -> ((s, d) => Filters.filterPred(Tables.lineitem(s, d))),
    "project_compute" -> ((s, d) => Filters.projectCompute(Tables.lineitem(s, d))),
    "filter_null_safe" -> ((s, d) => Filters.filterNullSafe(Tables.customer(s, d))),
    "fn_case_cond" -> ((s, d) => Filters.fnCaseCond(Tables.customer(s, d))),
    // --- joins ---
    "join_inner" -> ((s, d) => Joins.inner(Tables.orders(s, d), Tables.customer(s, d))),
    "join_broadcast" -> ((s, d) => Joins.broadcastDim(Tables.nation(s, d), Tables.region(s, d))),
    "join_multiway" -> ((s, d) =>
      Joins.multiway(Tables.region(s, d), Tables.nation(s, d),
        Tables.customer(s, d), Tables.orders(s, d))),
    "join_left_outer" -> ((s, d) => Joins.leftOuter(Tables.customer(s, d), Tables.orders(s, d))),
    "join_semi" -> ((s, d) => Joins.semi(Tables.customer(s, d), Tables.orders(s, d))),
    "join_anti" -> ((s, d) => Joins.anti(Tables.customer(s, d), Tables.orders(s, d))),
    "join_full_outer" -> ((s, d) => Joins.fullOuter(Tables.customer(s, d), Tables.supplier(s, d))),
    "join_cross" -> ((s, d) => Joins.crossDims(Tables.region(s, d), Tables.customer(s, d))),
    "join_theta_range" -> ((s, d) => Joins.thetaRange(Tables.part(s, d), Tables.supplier(s, d))),
    "join_range_bucket" -> ((s, d) =>
      Joins.rangeBucketJoin(Tables.part(s, d), Tables.supplier(s, d))),
    "join_interval_overlap" -> ((s, d) =>
      Joins.intervalOverlap(Tables.events(s, d))),
    "join_asof_event" -> ((s, d) => Joins.asofEvent(Tables.events(s, d), Tables.orders(s, d))),
    "join_asof_salted" -> ((s, d) =>
      Skew.saltedAsof(Tables.events(s, d), Tables.orders(s, d))),
    "join_asof_forward" -> ((s, d) =>
      Joins.asofOrderForward(Tables.orders(s, d), Tables.events(s, d))),
    "join_asof_tolerance" -> ((s, d) =>
      Joins.asofEventTolerance(Tables.events(s, d), Tables.orders(s, d))),
    "join_asof_nearest" -> ((s, d) =>
      Joins.asofNearest(Tables.events(s, d), Tables.orders(s, d))),
    // --- composed TPC-H-shaped analytics ---
    "q3_shipping_priority" -> ((s, d) =>
      ComposedOps.q3ShippingPriority(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d))),
    "q5_local_supplier" -> ((s, d) =>
      ComposedOps.q5LocalSupplier(Tables.region(s, d), Tables.nation(s, d),
        Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.supplier(s, d))),
    "q10_returned_items" -> ((s, d) =>
      ComposedOps.q10ReturnedItems(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.nation(s, d))),
    // --- aggregations ---
    "agg_hash_group" -> ((s, d) => Aggs.hashGroup(Tables.lineitem(s, d))),
    "agg_distinct" -> ((s, d) => Aggs.distinctCounts(Tables.lineitem(s, d))),
    // bound-verdict forms (r16): each engine verifies its OWN sketch
    // against exact statistics it computes independently — flips the
    // three sketch slugs from no-oracle to hash-compared (VERDICT r15 #1)
    "agg_approx_distinct" -> ((s, d) => Aggs.approxDistinctVerified(Tables.events(s, d))),
    "agg_rollup" -> ((s, d) =>
      Aggs.rollupRegionNation(Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))),
    "agg_cube" -> ((s, d) => Aggs.cubeStatusPriority(Tables.orders(s, d))),
    "agg_grouping_sets" -> ((s, d) =>
      Aggs.groupingSetsRegionNation(Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))),
    "agg_pivot" -> ((s, d) => Aggs.pivotStatus(Tables.orders(s, d))),
    "agg_unpivot" -> ((s, d) => Aggs.unpivotMetrics(Tables.documents(s, d))),
    "agg_mode" -> ((s, d) => Aggs.modePerGroup(Tables.orders(s, d))),
    "text_quality_rank" -> ((s, d) => CorpusOps.qualityRank(Tables.documents(s, d))),
    "agg_stats" -> ((s, d) => Aggs.stats(Tables.orders(s, d))),
    // bound-verdict form (r14): raw approx percentiles are
    // engine-specific, so the registry emits exact min/max/cnt plus a
    // per-percentile "my sketch's rank error is within 1%" verdict that
    // BOTH engines compute against their own sketch — hash-comparable,
    // and a real sketch regression flips it
    "agg_stats_approx" -> ((s, d) =>
      Aggs.statsApproxVerified(Tables.orders(s, d))),
    "sample_bottomk" -> ((s, d) => Aggs.sampleBottomK(Tables.lineitem(s, d))),
    // --- windows ---
    "window_rank" -> ((s, d) => Windows.rankInCustomer(Tables.orders(s, d))),
    "window_running_sum" -> ((s, d) => Windows.runningSum(Tables.lineitem(s, d))),
    "window_running_distinct" -> ((s, d) => Windows.runningDistinct(Tables.events(s, d))),
    "graph_pagerank" -> ((s, d) =>
      GraphOps.pagerank(Tables.orders(s, d), Tables.lineitem(s, d))),
    "graph_hits" -> ((s, d) =>
      GraphOps.hits(Tables.orders(s, d), Tables.lineitem(s, d))),
    "window_lag_lead" -> ((s, d) => Windows.lagLead(Tables.events(s, d))),
    "window_ntile_dense" -> ((s, d) => Windows.ntileDense(Tables.customer(s, d))),
    "window_percent_cume" -> ((s, d) => Windows.percentCume(Tables.orders(s, d))),
    "window_first_last" -> ((s, d) => Windows.firstLast(Tables.orders(s, d))),
    "agg_string_concat" -> ((s, d) => Aggs.stringConcat(Tables.nation(s, d))),
    "agg_conditional" -> ((s, d) => Aggs.conditional(Tables.orders(s, d))),
    "fn_greatest_least" -> ((s, d) => ScalarFns.fnGreatestLeast(Tables.part(s, d))),
    "window_nth_value" -> ((s, d) => Windows.nthValue(Tables.orders(s, d))),
    "window_range_frame" -> ((s, d) => Windows.rangeFrame(Tables.lineitem(s, d))),
    "fn_trim_pad" -> ((s, d) => ScalarFns.fnTrimPad(Tables.part(s, d))),
    "set_intersect_all" -> ((s, d) =>
      SortsSets.intersectAllNations(Tables.customer(s, d), Tables.supplier(s, d))),
    "set_except_all" -> ((s, d) =>
      SortsSets.exceptAllNations(Tables.customer(s, d), Tables.supplier(s, d))),
    // --- sorts / limits / set ops ---
    "sort_limit_topk" -> ((s, d) => SortsSets.topk(Tables.orders(s, d))),
    "topk_per_group" -> ((s, d) => Windows.topkPerGroup(Tables.orders(s, d))),
    "set_union" -> ((s, d) => SortsSets.unionNations(Tables.customer(s, d), Tables.supplier(s, d))),
    "set_union_all" -> ((s, d) => SortsSets.unionAllNations(Tables.customer(s, d), Tables.supplier(s, d))),
    "set_union_byname" -> ((s, d) => SortsSets.unionByNameDrift(Tables.part(s, d))),
    "set_intersect" -> ((s, d) => SortsSets.intersectNations(Tables.customer(s, d), Tables.supplier(s, d))),
    "set_except" -> ((s, d) => SortsSets.exceptNations(Tables.customer(s, d), Tables.supplier(s, d))),
    // --- scalar functions ---
    "fn_string" -> ((s, d) => ScalarFns.fnString(Tables.part(s, d))),
    "fn_regexp" -> ((s, d) => ScalarFns.fnRegexp(Tables.part(s, d))),
    "fn_date" -> ((s, d) => ScalarFns.fnDate(Tables.orders(s, d))),
    "fn_math" -> ((s, d) => ScalarFns.fnMath(Tables.part(s, d))),
    "fn_array" -> ((s, d) => VectorOps.fnArray(Tables.embeddings(s, d))),
    "fn_vector_norm" -> ((s, d) => VectorOps.vectorNorm(Tables.embeddings(s, d))),
    "fn_map" -> ((s, d) => ScalarFns.fnMap(Tables.events(s, d))),
    "fn_json" -> ((s, d) => ScalarFns.fnJson(Tables.events(s, d))),
    "fn_bitwise" -> ((s, d) => ScalarFns.fnBitwise(Tables.part(s, d))),
    "fn_levenshtein" -> ((s, d) => ScalarFns.fnLevenshtein(Tables.part(s, d))),
    "fn_hash" -> ((s, d) => ScalarFns.fnHash(Tables.part(s, d))),
    "fn_date_arith" -> ((s, d) => ScalarFns.fnDateArith(Tables.orders(s, d))),
    "split_train_test" -> ((s, d) => Aggs.splitTrainTest(Tables.part(s, d))),
    "agg_histogram" -> ((s, d) => Aggs.histogram(Tables.orders(s, d))),
    // --- dedup (LLM-pipeline) ---
    "dedup_exact" -> ((s, d) => DedupOps.exact(Tables.documents(s, d))),
    "dedup_exact_hash" -> ((s, d) => DedupOps.exactByHash(Tables.documents(s, d))),
    "dedup_exact_normalized" -> ((s, d) => DedupOps.exactNormalized(Tables.documents(s, d))),
    "dedup_near_minhash" -> ((s, d) => DedupOps.nearMinhash(Tables.documents(s, d))),
    // r17 (VERDICT r16 #1): the pair table built by incremental
    // maintenance — 4 document appends fold into the signature store;
    // the oracle is the FULL-PIPELINE REBUILD, so hash equality proves
    // append ≡ rebuild
    "dedup_minhash_incr" -> ((s, d) =>
      DedupOps.nearMinhashIncremental(Tables.documents(s, d))),
    "dedup_simhash" -> ((s, d) => DedupOps.simhash(Tables.documents(s, d))),
    "dedup_simhash_pairs" -> ((s, d) => DedupOps.simhashPairs(Tables.documents(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) => DedupOps.ngramJaccard(Tables.documents(s, d))),
    "dedup_ngram_containment" -> ((s, d) =>
      DedupOps.ngramContainment(Tables.documents(s, d))),
    "dedup_ngram_jaccard_capped" -> ((s, d) =>
      DedupOps.ngramJaccard(Tables.documents(s, d), maxDf = 3)),
    "corpus_dup_hist" -> ((s, d) => DedupOps.clusterSizeHist(Tables.documents(s, d))),
    "dedup_jaccard_clusters" -> ((s, d) =>
      DedupOps.clusters(DedupOps.ngramJaccard(Tables.documents(s, d)))),
    "dedup_minhash_clusters" -> ((s, d) =>
      DedupOps.clusters(DedupOps.nearMinhash(Tables.documents(s, d)))),
    "pipeline_dedup_full" -> ((s, d) => DedupOps.dedupFull(Tables.documents(s, d))),
    // explicit (nBands, bitsPerBand) so the generated oracle SQL is
    // corpus-independent; the API default autoscales bits from the count
    // corpus = embeddings + planted re-ingested copies (withReingested):
    // the generated vectors are near-orthogonal, so the unplanted pair
    // set is empty at any honest tau and the oracle match was vacuous
    "dedup_near_embedding" -> ((s, d) =>
      VectorOps.nearDupEmbedding(
        VectorOps.withReingested(Tables.embeddings(s, d)),
        nBands = 4, bitsPerBand = 6)),
    // semantic near-dup clusters: connected components over the verified
    // embedding pair graph — the "keep one per embedding-duplicate
    // group" decision for a semantically-deduped corpus
    "dedup_embedding_clusters" -> ((s, d) =>
      DedupOps.clusters(
        VectorOps.nearDupEmbedding(
          VectorOps.withReingested(Tables.embeddings(s, d)),
          nBands = 4, bitsPerBand = 6))),
    // --- similarity search (LLM-pipeline) ---
    "sim_cosine_topk" -> ((s, d) => VectorOps.cosineTopK(Tables.embeddings(s, d))),
    "sim_batch_topk" -> ((s, d) => VectorOps.batchCosineTopK(Tables.embeddings(s, d))),
    "sim_ann_lsh" -> ((s, d) => VectorOps.annLsh(Tables.embeddings(s, d))),
    "sim_ann_lsh_batch" -> ((s, d) => VectorOps.annLshBatch(Tables.embeddings(s, d))),
    "sim_ann_ivf" -> ((s, d) => VectorOps.annIvf(Tables.embeddings(s, d))),
    "sim_ann_ivf_batch" -> ((s, d) => VectorOps.annIvfBatch(Tables.embeddings(s, d))),
    // SemDeDup semantic dedup over the cached IVF cells of the
    // RE-INGESTED corpus (r15: the planted exact copies make the pair +
    // closure path nonvacuous, the dedup_near_embedding precedent); the
    // fit stays unoracled but the whole downstream pass is hash-checked
    // via dynamicOracleSql's centroid-literal replay
    "dedup_semantic_ivf" -> ((s, d) => DedupOps.semanticIvf(
      VectorOps.withReingested(Tables.embeddings(s, d)))),
    "vec_quantize_int8" -> ((s, d) => VectorOps.quantizeInt8(Tables.embeddings(s, d))),
    // r15: the PQ tier of the ANN ladder — 8-byte packed codes +
    // ADC scoring; fitted codebook oracled via dynamicOracleSql
    "emb_pq_encode" -> ((s, d) => VectorOps.pqEncode(Tables.embeddings(s, d))),
    "sim_pq_topk" -> ((s, d) => VectorOps.pqTopK(Tables.embeddings(s, d))),
    // r16: the production two-tier retrieval composition + its recall
    // audit (VERDICT r15 #6b)
    "sim_pq_rerank" -> ((s, d) => VectorOps.pqRerank(Tables.embeddings(s, d))),
    "retrieval_pq_recall" -> ((s, d) => RetrievalOps.pqRecall(Tables.embeddings(s, d))),
    // r17 (VERDICT r16 #2): the ANN ladder's top tier — IVF cell routing
    // + per-cell ADC + exact rerank (the FAISS-IVFPQ production plan),
    // plus its recall audit vs exact
    "sim_ann_ivfpq" -> ((s, d) => VectorOps.annIvfPq(Tables.embeddings(s, d))),
    "sim_ann_ivfpq_batch" -> ((s, d) =>
      VectorOps.annIvfPqBatch(Tables.embeddings(s, d))),
    "retrieval_ivfpq_recall" -> ((s, d) =>
      RetrievalOps.ivfPqRecall(Tables.embeddings(s, d))),
    "emb_centroid_drift" -> ((s, d) => VectorOps.centroidDrift(Tables.embeddings(s, d))),
    "emb_dim_stats" -> ((s, d) => VectorOps.dimStats(Tables.embeddings(s, d))),
    "sample_hardneg" -> ((s, d) => VectorOps.hardNegatives(Tables.embeddings(s, d))),
    // --- text analysis (LLM-pipeline) ---
    "text_wordcount" -> ((s, d) => TextOps.wordcount(Tables.documents(s, d))),
    "text_ngram_stats" -> ((s, d) => TextOps.ngramStats(Tables.documents(s, d))),
    "text_lang_stats" -> ((s, d) => TextOps.langStats(Tables.documents(s, d))),
    "text_tokens" -> ((s, d) => TextOps.tokens(Tables.documents(s, d))),
    "text_tokens_bpe" -> ((s, d) => TextOps.tokensBpe(Tables.documents(s, d))),
    "text_quality" -> ((s, d) => TextOps.quality(Tables.documents(s, d))),
    "text_langid" -> ((s, d) => TextOps.langId(Tables.documents(s, d))),
    "text_fingerprint" -> ((s, d) => TextOps.fingerprint(Tables.documents(s, d))),
    "text_pii_scrub" -> ((s, d) => TextOps.scrubPii(Tables.documents(s, d))),
    "text_quality_model" -> ((s, d) => TextOps.qualityModel(Tables.documents(s, d))),
    "text_gopher_quality" -> ((s, d) => TextOps.gopherQuality(Tables.documents(s, d))),
    // r10 fix: this round-9 operator registered under "text_repetition",
    // which the r3 trigram dup-ratio op ALREADY owned — Scala Map
    // literals keep the LAST duplicate key, so the Gopher diagnostic was
    // silently shadowed out of the whole r9 gate (its own slug now;
    // ContractSpec guards the duplicate-key class)
    "text_repetition_bigram" -> ((s, d) => TextOps.repetitionStats(Tables.documents(s, d))),
    "text_entropy" -> ((s, d) => TextOps.entropy(Tables.documents(s, d))),
    "text_html_strip" -> ((s, d) => TextOps.htmlStrip(Tables.documents(s, d))),
    "pipeline_enrich" -> ((s, d) => TextOps.enrich(Tables.documents(s, d))),
    // --- multimodal columns (LLM-pipeline; real JDK ImageIO codec — see
    // MultimodalOps; stats keeps the column-expressible exact-oracle path) ---
    "multimodal_features" -> ((s, d) => MultimodalOps.features(Tables.documents(s, d))),
    "multimodal_frames" -> ((s, d) => MultimodalOps.frames(Tables.documents(s, d))),
    "multimodal_resize" -> ((s, d) => MultimodalOps.resized(Tables.documents(s, d))),
    "multimodal_stats" -> ((s, d) => MultimodalOps.mediaStats(Tables.documents(s, d))),
    "dedup_phash_images" -> ((s, d) => MultimodalOps.phashPairs(Tables.documents(s, d))),
    // --- corpus-preparation passes (LLM-pipeline) ---
    "pipeline_decontaminate" -> ((s, d) => CorpusOps.decontaminate(Tables.documents(s, d))),
    "pipeline_pack_chunks" -> ((s, d) => CorpusOps.packChunks(Tables.documents(s, d))),
    "pipeline_pack_text" -> ((s, d) => CorpusOps.packText(Tables.documents(s, d))),
    "pipeline_pack_sequences" -> ((s, d) =>
      CorpusOps.packSequences(Tables.documents(s, d))),
    "corpus_stats" -> ((s, d) => CorpusOps.corpusStats(Tables.documents(s, d))),
    "sample_stratified" -> ((s, d) => CorpusOps.sampleStratified(Tables.documents(s, d))),
    "sample_neyman" -> ((s, d) => CorpusOps.sampleNeyman(Tables.documents(s, d))),
    "sample_rejection" -> ((s, d) => CorpusOps.sampleRejection(Tables.documents(s, d))),
    "text_tfidf_keywords" -> ((s, d) => TextOps.tfidfKeywords(Tables.documents(s, d))),
    "text_kn_bigram" -> ((s, d) => TextOps.knBigram(Tables.documents(s, d))),
    "agg_heavy_hitters" -> ((s, d) => TextOps.heavyHittersVerified(Tables.documents(s, d))),
    "text_lm_score" -> ((s, d) => CorpusOps.lmScore(Tables.documents(s, d))),
    "text_repetition" -> ((s, d) => CorpusOps.repetition(Tables.documents(s, d))),
    "sample_mixture" -> ((s, d) => CorpusOps.sampleMixture(Tables.documents(s, d))),
    "text_vocab" -> ((s, d) => CorpusOps.vocab(Tables.documents(s, d))),
    "dedup_bloom_shard" -> ((s, d) => DedupOps.bloomShardFlags(Tables.documents(s, d))),
    "dedup_soft_weights" -> ((s, d) => DedupOps.softDedupWeights(Tables.documents(s, d))),
    "corpus_dsir_weights" -> ((s, d) => CorpusOps.dsirWeights(Tables.documents(s, d))),
    "agg_hll_shards" -> ((s, d) => CorpusOps.hllShardDistinctVerified(Tables.documents(s, d))),
    "dedup_incremental" -> ((s, d) => CorpusOps.incrementalDedup(Tables.documents(s, d))),
    "filter_quality_quantile" -> ((s, d) =>
      CorpusOps.qualityQuantileFilter(Tables.documents(s, d))),
    "join_skew_salted" -> ((s, d) =>
      Joins.skewSalted(Tables.lineitem(s, d), Tables.orders(s, d))),
    "pipeline_corpus_full" -> ((s, d) => CorpusOps.corpusFull(Tables.documents(s, d))),
    "text_dup_spans" -> ((s, d) => CorpusOps.dupSpans(Tables.documents(s, d))),
    "filter_dup_spans" -> ((s, d) => CorpusOps.filterDupSpans(Tables.documents(s, d))),
    "sample_temperature" -> ((s, d) => CorpusOps.sampleTemperature(Tables.documents(s, d))),
    "text_ppl_buckets" -> ((s, d) => CorpusOps.pplBuckets(Tables.documents(s, d))),
    "corpus_funnel" -> ((s, d) => CorpusOps.corpusFunnel(Tables.documents(s, d))),
    "corpus_overlap_matrix" -> ((s, d) => CorpusOps.overlapMatrix(Tables.documents(s, d))),
    "corpus_source_profile" -> ((s, d) => CorpusOps.sourceProfile(Tables.documents(s, d))),
    // --- round-7 additions ---
    "corpus_eval_coverage" -> ((s, d) => CorpusOps.evalCoverage(Tables.documents(s, d))),
    "corpus_lang_drift" -> ((s, d) => CorpusOps.langDrift(Tables.documents(s, d))),
    "pipeline_curriculum" -> ((s, d) => CorpusOps.curriculum(Tables.documents(s, d))),
    "pipeline_shard_output" -> ((s, d) => CorpusOps.shardOutput(Tables.documents(s, d))),
    "text_zipf" -> ((s, d) => CorpusOps.zipfFit(Tables.documents(s, d))),
    "sample_pps" -> ((s, d) => CorpusOps.samplePps(Tables.documents(s, d))),
    "sample_reservoir_group" -> ((s, d) =>
      CorpusOps.sampleReservoir(Tables.documents(s, d))),
    "text_ngram_novelty" -> ((s, d) => CorpusOps.ngramNovelty(Tables.documents(s, d))),
    "pipeline_quota_cap" -> ((s, d) => CorpusOps.quotaCap(Tables.documents(s, d))),
    "pipeline_repeat_epochs" -> ((s, d) => CorpusOps.repeatEpochs(Tables.documents(s, d))),
    "pipeline_bpe_merges" -> ((s, d) => CorpusOps.bpeMerges(Tables.documents(s, d))),
    "text_cooccur_pmi" -> ((s, d) => CorpusOps.cooccurPmi(Tables.documents(s, d))),
    // --- retrieval (LLM-pipeline) ---
    "retrieval_bm25" -> ((s, d) => RetrievalOps.bm25(Tables.documents(s, d))),
    "retrieval_hybrid_rrf" -> ((s, d) =>
      RetrievalOps.hybridRrf(Tables.documents(s, d), Tables.embeddings(s, d))),
    "pipeline_chunk_overlap" -> ((s, d) => RetrievalOps.chunkOverlap(Tables.documents(s, d))),
    // --- streaming batch-equivalents ---
    "stream_tumbling_batch" -> ((s, d) => StreamBatchOps.tumbling(Tables.events(s, d))),
    "stream_sliding_batch" -> ((s, d) => StreamBatchOps.sliding(Tables.events(s, d))),
    "stream_session_batch" -> ((s, d) => StreamBatchOps.sessions(Tables.events(s, d))),
    "ts_gapfill" -> ((s, d) => StreamBatchOps.gapfill(Tables.events(s, d))),
    "ts_rolling" -> ((s, d) => StreamBatchOps.rolling(Tables.events(s, d))),
    "ts_sessionize" -> ((s, d) => StreamBatchOps.sessionize(Tables.events(s, d))),
    "ts_concurrency" -> ((s, d) => StreamBatchOps.intervalConcurrency(Tables.events(s, d))),
    "ts_anomaly" -> ((s, d) => StreamBatchOps.anomaly(Tables.events(s, d))),
    "ts_seasonality" -> ((s, d) => StreamBatchOps.seasonality(Tables.events(s, d))),
    "ts_autocorr" -> ((s, d) => StreamBatchOps.autocorr(Tables.events(s, d))),
    "ts_changepoint" -> ((s, d) => StreamBatchOps.changepoint(Tables.events(s, d))),
    "ts_retention" -> ((s, d) => StreamBatchOps.retention(Tables.events(s, d))),
    "ts_mad_outliers" -> ((s, d) => StreamBatchOps.madOutliers(Tables.events(s, d))),
    "ts_moments" -> ((s, d) => StreamBatchOps.moments(Tables.events(s, d))),
    "ts_funnel_steps" -> ((s, d) => StreamBatchOps.funnelSteps(Tables.events(s, d))),
    // --- round-10 wave ---
    "graph_degree_stats" -> ((s, d) =>
      GraphOps.degreeStats(Tables.orders(s, d), Tables.lineitem(s, d))),
    "graph_triangles" -> ((s, d) => GraphOps.triangles(Tables.lineitem(s, d))),
    "agg_percentiles_exact" -> ((s, d) => Aggs.percentilesExact(Tables.events(s, d))),
    "ts_cross_corr" -> ((s, d) => StreamBatchOps.crossCorr(Tables.events(s, d))),
    "emb_covariance" -> ((s, d) => VectorOps.covariance(Tables.embeddings(s, d))),
    // real-WAV ingest + decode stats (✗: codec payload bytes, the
    // image-tier rule; MultimodalSpec proves the decode round-trip)
    "multimodal_audio_wav" -> ((s, d) => MultimodalOps.audioWav(Tables.documents(s, d))),
    "retrieval_recall_at_k" -> ((s, d) => RetrievalOps.recallAtK(Tables.embeddings(s, d))),
    "ts_ewma" -> ((s, d) => StreamBatchOps.ewma(Tables.events(s, d))),
    "corpus_seqlen_hist" -> ((s, d) => CorpusOps.seqlenHist(Tables.documents(s, d))),
    "corpus_langid_confusion" -> ((s, d) => TextOps.langIdConfusion(Tables.documents(s, d))),
    // tokenizer APPLICATION with the learned merges baked in as fold
    // literals (✗: chained array folds, the bpe-trainer rule)
    "pipeline_bpe_apply" -> ((s, d) => CorpusOps.bpeApply(Tables.documents(s, d))),
    // --- round-11 wave ---
    "graph_components" -> ((s, d) => GraphOps.components(Tables.lineitem(s, d))),
    "ts_interp_linear" -> ((s, d) => StreamBatchOps.interpLinear(Tables.events(s, d))),
    "ts_ohlc_bars" -> ((s, d) => StreamBatchOps.ohlcBars(Tables.events(s, d))),
    "agg_linreg" -> ((s, d) => Aggs.linreg(Tables.events(s, d))),
    "agg_weighted_median" -> ((s, d) => Aggs.weightedMedian(Tables.lineitem(s, d))),
    "scan_csv" -> ((s, d) => Scans.scanCsv(Tables.events(s, d))),
    "fn_url" -> ((s, d) => ScalarFns.fnUrl(Tables.documents(s, d))),
    "pipeline_interleave_sources" -> ((s, d) =>
      CorpusOps.interleaveSources(Tables.documents(s, d))),
    // top-PC outlier list (✗: iterative eigensolve, the KMeans driver
    // pattern; PcaSpec recovers a planted dominant axis)
    "emb_pca_top" -> ((s, d) => VectorOps.pcaTop(Tables.embeddings(s, d))),
    "ts_rolling_slope" -> ((s, d) => StreamBatchOps.rollingSlope(Tables.events(s, d))),
    "graph_jaccard_links" -> ((s, d) => GraphOps.jaccardLinks(Tables.lineitem(s, d))),
    "emb_dim_quantiles" -> ((s, d) => VectorOps.dimQuantiles(Tables.embeddings(s, d))),
    "ts_streaks" -> ((s, d) => StreamBatchOps.streaks(Tables.events(s, d))),
    "sink_partitioned" -> ((s, d) => Scans.sinkPartitioned(Tables.documents(s, d))),
    "pipeline_sft_format" -> ((s, d) => CorpusOps.sftFormat(Tables.documents(s, d))),
    "agg_gini" -> ((s, d) => Aggs.gini(Tables.events(s, d))),
    "ts_cusum" -> ((s, d) => StreamBatchOps.cusum(Tables.events(s, d))),
    "ts_shape_topk" -> ((s, d) => StreamBatchOps.shapeTopK(Tables.events(s, d))),
    "pipeline_span_corrupt" -> ((s, d) => CorpusOps.spanCorrupt(Tables.documents(s, d))),
    // --- round-12 wave ---
    "retrieval_ndcg" -> ((s, d) => RetrievalOps.ndcgAtK(Tables.embeddings(s, d))),
    "retrieval_mrr" -> ((s, d) => RetrievalOps.mrrAtK(Tables.embeddings(s, d))),
    "pipeline_dpo_format" -> ((s, d) => CorpusOps.dpoFormat(Tables.documents(s, d))),
    "pipeline_length_buckets" -> ((s, d) => CorpusOps.lengthBuckets(Tables.documents(s, d))),
    "join_bucketed_colocated" -> ((s, d) =>
      Joins.bucketedColocated(Tables.customer(s, d), Tables.orders(s, d))),
    // --- round-13 wave ---
    "graph_bfs_depths" -> ((s, d) => GraphOps.bfsDepths(Tables.lineitem(s, d))),
    "ts_local_extrema" -> ((s, d) => StreamBatchOps.localExtrema(Tables.events(s, d))),
    "text_readability" -> ((s, d) => TextOps.readability(Tables.documents(s, d))),
    "dedup_url_canonical" -> ((s, d) => DedupOps.urlCanonical(Tables.documents(s, d))),
    "scan_merge_schema" -> ((s, d) => Scans.scanMergeSchema(Tables.documents(s, d))),
    "pipeline_anneal_mix" -> ((s, d) => CorpusOps.annealMix(Tables.documents(s, d))),
    "corpus_snapshot_diff" -> ((s, d) => CorpusOps.snapshotDiff(Tables.documents(s, d))),
    // --- round-13 wave 2 ---
    "dedup_span_rewrite" -> ((s, d) => DedupOps.spanRewrite(Tables.documents(s, d))),
    "corpus_quality_reliability" -> ((s, d) => TextOps.qualityReliability(Tables.documents(s, d))),
    "ts_gap_islands" -> ((s, d) => StreamBatchOps.gapIslands(Tables.events(s, d))),
    // --- round-14 wave 2 ---
    "graph_label_prop" -> ((s, d) => GraphOps.labelProp(Tables.lineitem(s, d))),
    "emb_matryoshka_recall" -> ((s, d) =>
      VectorOps.matryoshkaRecall(Tables.embeddings(s, d))),
    "ts_holt" -> ((s, d) => StreamBatchOps.holtForecast(Tables.events(s, d))),
    "pipeline_token_budget" -> ((s, d) =>
      CorpusOps.tokenBudgetMix(Tables.documents(s, d))),
    // --- round-14 wave 3 ---
    "graph_kcore" -> ((s, d) => GraphOps.kcorePeel(Tables.lineitem(s, d))),
    "agg_chi2" -> ((s, d) => Aggs.chi2(Tables.documents(s, d))),
    "agg_mutual_info" -> ((s, d) => Aggs.mutualInfo(Tables.documents(s, d))),
    "stream_dedup_batch" -> ((s, d) =>
      StreamBatchOps.dedupBatch(Tables.events(s, d))),
    "sim_range_search" -> ((s, d) =>
      VectorOps.rangeSearch(Tables.embeddings(s, d))),
    // --- round-14 wave 4 ---
    "emb_mutual_knn" -> ((s, d) =>
      VectorOps.mutualKnn(Tables.embeddings(s, d))),
    "pipeline_pack_waste" -> ((s, d) =>
      CorpusOps.packWaste(Tables.documents(s, d))),
    "corpus_pareto_sources" -> ((s, d) =>
      CorpusOps.paretoSources(Tables.documents(s, d))),
    "agg_benford" -> ((s, d) => Aggs.benford(Tables.events(s, d))),
    // --- round-14 wave 5 ---
    "text_vocab_growth" -> ((s, d) =>
      TextOps.vocabGrowth(Tables.documents(s, d))),
    "agg_hhi" -> ((s, d) => Aggs.hhi(Tables.events(s, d))),
    "ts_mk_trend" -> ((s, d) => StreamBatchOps.mkTrend(Tables.events(s, d))),
    // --- round-14 wave 6 ---
    "graph_modularity" -> ((s, d) =>
      GraphOps.modularity(Tables.lineitem(s, d))),
    "agg_ks_test" -> ((s, d) => Aggs.ksTest(Tables.events(s, d))),
    "dedup_minhash_calibration" -> ((s, d) =>
      DedupOps.minhashCalibration(Tables.documents(s, d))),
    "ts_theilsen" -> ((s, d) => StreamBatchOps.theilSen(Tables.events(s, d))),
    // --- round-14 wave 7 ---
    "agg_mannwhitney" -> ((s, d) => Aggs.mannWhitney(Tables.events(s, d))),
    "corpus_simpson_diversity" -> ((s, d) =>
      TextOps.simpsonDiversity(Tables.documents(s, d))),
    "scan_partition_prune" -> ((s, d) =>
      Scans.scanPartitionPrune(Tables.documents(s, d))),
    "pipeline_cdc_apply" -> ((s, d) =>
      CorpusOps.cdcApply(Tables.documents(s, d))),
    "sim_hamming_topk" -> ((s, d) =>
      VectorOps.hammingTopK(Tables.embeddings(s, d))),
    // incremental maintenance: the co-purchase projection folded from
    // whole-order appends; the oracle is the FULL REBUILD, so the hash
    // match is the append ≡ rebuild proof (VERDICT r15 #6a)
    "graph_copurchase_incr" -> ((s, d) =>
      GraphOps.coPurchaseIncremental(Tables.lineitem(s, d))),
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible / approximate
    * ops (driver records a weaker rows-only check). */
  /** `sim_batch_topk` oracle body — a val so `retrieval_recall_at_k`'s
    * oracle can compose it as the exact-ground-truth subquery. */
  private val simBatchTopkSql: String =
    """WITH p AS (
      |  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS probe
      |  FROM embeddings WHERE vec_id < 5),
      |c AS (
      |  SELECT probe_id, e.vec_id,
      |    list_dot_product(CAST(e.embedding AS DOUBLE[]), probe)
      |      / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
      |         * sqrt(list_dot_product(probe, probe))) AS rawcos
      |  FROM embeddings e CROSS JOIN p),
      |r AS (
      |  SELECT probe_id, vec_id, rawcos,
      |    CAST(row_number() OVER (PARTITION BY probe_id
      |      ORDER BY rawcos DESC, vec_id) AS INTEGER) AS rn
      |  FROM c)
      |SELECT probe_id, vec_id, round(rawcos, 6) AS cos, rn
      |FROM r WHERE rn <= 10 ORDER BY probe_id, rn""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount""".stripMargin,

    "scan_json_lines" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "scan_count" -> "SELECT COUNT(*) AS n FROM lineitem",

    "fn_split_part" ->
      """SELECT p_partkey,
        |  split_part(p_name, ' ', 2) AS second,
        |  split_part(p_name, ' ', 9) AS missing
        |FROM part ORDER BY p_partkey""".stripMargin,

    "filter_pred" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.06
        |  AND l_quantity < 24""".stripMargin,

    "project_compute" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS net_price,
        |  CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6)) AS DOUBLE) AS gross_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price, gross_price""".stripMargin,

    "filter_null_safe" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS seg,
        |  ((CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END) IS NOT DISTINCT FROM 'BUILDING') AS is_building,
        |  ((CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END) IS NULL) AS seg_null
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_case_cond" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal >= 7500 THEN 'platinum'
        |       WHEN c_acctbal >= 5000 THEN 'gold'
        |       WHEN c_acctbal >= 0 THEN 'standard'
        |       ELSE 'debt' END AS tier,
        |  (c_acctbal >= 0) AS solvent
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "join_multiway" ->
      """SELECT r_name, n_name, COUNT(*) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,

    "join_full_outer" ->
      """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |  COALESCE(c.c_cnt, 0) AS c_cnt, COALESCE(s.s_cnt, 0) AS s_cnt
        |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS c_cnt
        |      FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS s_cnt
        |      FROM supplier GROUP BY 1) s
        |  ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin,

    "join_cross" ->
      """SELECT r_name, c_mktsegment
        |FROM (SELECT r_name FROM region) r
        |CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) c
        |ORDER BY r_name, c_mktsegment""".stripMargin,

    "join_theta_range" ->
      """SELECT s_suppkey, COUNT(*) AS n_parts
        |FROM part JOIN supplier
        |  ON p_retailprice > s_acctbal * 0.1 AND p_retailprice < s_acctbal * 0.11
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,

    // identical result to join_theta_range — the oracle verifies the
    // interval-bucket rewrite is semantics-preserving
    "join_range_bucket" ->
      """SELECT s_suppkey, COUNT(*) AS n_parts
        |FROM part JOIN supplier
        |  ON p_retailprice > s_acctbal * 0.1 AND p_retailprice < s_acctbal * 0.11
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,

    // overlap counted directly (DuckDB plans the range join natively);
    // the Spark side's bucket explode + dedup + residual produces the
    // same pair set by construction
    "join_interval_overlap" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s
        |  FROM events)
        |SELECT a.event_type AS et_a, b.event_type AS et_b,
        |  COUNT(*) AS n_pairs
        |FROM e a JOIN e b
        |  ON a.event_id < b.event_id
        | AND a.s < b.s + 600 AND b.s < a.s + 600
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "join_asof_event" ->
      """SELECT e.event_id, e.user_id,
        |  CAST(epoch(date_trunc('second',
        |    (SELECT max(o.o_orderdate) FROM orders o
        |     WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts))) AS BIGINT) AS last_order_s
        |FROM events e ORDER BY e.event_id""".stripMargin,

    // result-identical to join_asof_event by design: the salted variant
    // splits each user's timeline into day sub-ranges and stitches
    // boundaries — the oracle proves the rewrite is semantics-preserving
    "join_asof_salted" ->
      """SELECT e.event_id, e.user_id,
        |  CAST(epoch(date_trunc('second',
        |    (SELECT max(o.o_orderdate) FROM orders o
        |     WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts))) AS BIGINT) AS last_order_s
        |FROM events e ORDER BY e.event_id""".stripMargin,

    "join_asof_forward" ->
      """SELECT o.o_orderkey, o.o_custkey AS user_id,
        |  CAST(epoch(date_trunc('second',
        |    (SELECT min(e.ts) FROM events e
        |     WHERE e.user_id = o.o_custkey AND e.ts >= o.o_orderdate))) AS BIGINT) AS next_event_s
        |FROM orders o ORDER BY o.o_orderkey, user_id, next_event_s""".stripMargin,

    // distances compare at second resolution (matching Spark's
    // unix_timestamp truncation); ties prefer the earlier order
    "join_asof_nearest" ->
      """SELECT e.event_id, e.user_id,
        |  CASE WHEN e.ts IS NULL THEN NULL ELSE
        |    (SELECT CAST(epoch(date_trunc('second', o.o_orderdate)) AS BIGINT)
        |     FROM orders o WHERE o.o_custkey = e.user_id
        |     ORDER BY abs(epoch(date_trunc('second', o.o_orderdate))
        |                - epoch(date_trunc('second', e.ts))), o.o_orderdate
        |     LIMIT 1) END AS nearest_order_s
        |FROM events e ORDER BY e.event_id""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) AS order_date_s
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON n_nationkey = c_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "join_asof_tolerance" ->
      """SELECT e.event_id, e.user_id,
        |  CAST(epoch(date_trunc('second',
        |    (SELECT max(o.o_orderdate) FROM orders o
        |     WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |       AND o.o_orderdate >= date_trunc('second', e.ts) - INTERVAL '30 days'))) AS BIGINT) AS last_order_s
        |FROM events e ORDER BY e.event_id""".stripMargin,

    "agg_hash_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-06-30 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS supp_cnt,
        |  COUNT(DISTINCT l_partkey) AS part_cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_rollup" ->
      """SELECT COALESCE(r_name, '_ALL_') AS r_name, COALESCE(n_name, '_ALL_') AS n_name,
        |  COUNT(*) AS cust_cnt,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name, n_name""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT COALESCE(r_name, '_ALL_') AS r_name, COALESCE(n_name, '_ALL_') AS n_name,
        |  COUNT(*) AS cust_cnt,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())
        |ORDER BY r_name, n_name""".stripMargin,

    "agg_cube" ->
      """SELECT COALESCE(o_orderstatus, '_ALL_') AS o_orderstatus,
        |  COALESCE(o_orderpriority, '_ALL_') AS o_orderpriority,
        |  COUNT(*) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "agg_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // UNPIVOT melt; UNION ALL form keeps the oracle portable and makes
    // the row multiset explicit
    "agg_unpivot" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_words
        |  FROM documents)
        |SELECT doc_id, metric, value FROM (
        |  SELECT doc_id, 'n_chars' AS metric, n_chars AS value FROM t
        |  UNION ALL
        |  SELECT doc_id, 'n_words' AS metric, n_words AS value FROM t)
        |ORDER BY doc_id, metric""".stripMargin,

    // tie-broken mode: neither engine's mode() builtin defines ties
    "agg_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |r AS (
        |  SELECT o_orderstatus, o_orderpriority, cnt,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY cnt DESC, o_orderpriority) AS rn
        |  FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_count
        |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    // rank-unique percent_rank: the doc_id tie-break makes the division
    // operands identical in both engines
    "text_quality_rank" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INTEGER) AS n_words
        |  FROM documents)
        |SELECT doc_id, lang, n_words,
        |  percent_rank() OVER (PARTITION BY lang ORDER BY n_words, doc_id) AS q_rank
        |FROM t ORDER BY doc_id""".stripMargin,

    // discrete (not interpolated) percentiles: both engines return the
    // same actual data value — interpolated midpoints differ in the last
    // ulp and can round differently at half-cent boundaries
    "agg_stats" ->
      """SELECT min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  round(stddev_samp(o_totalprice), 2) AS stddev_price,
        |  quantile_disc(o_totalprice, 0.5) AS p50,
        |  quantile_disc(o_totalprice, 0.9) AS p90,
        |  COUNT(*) AS cnt
        |FROM orders""".stripMargin,

    // bound-verdict oracle (r13 stretch #8): DuckDB verifies ITS OWN
    // t-digest approx_quantile against the exact rank, Spark its own
    // percentile_approx — both emit true iff their sketch's rank error
    // is within 1% of n on the same rows, and the hash compares exact
    // fields + verdicts (raw approx values can never hash-match across
    // two different sketch algorithms)
    "agg_stats_approx" ->
      """WITH ap AS (
        |  SELECT min(o_totalprice) AS min_price,
        |         max(o_totalprice) AS max_price,
        |         approx_quantile(o_totalprice, 0.5) AS p50,
        |         approx_quantile(o_totalprice, 0.9) AS p90,
        |         count(*) AS cnt
        |  FROM orders),
        |r AS (
        |  SELECT ap.min_price, ap.max_price, ap.cnt,
        |         sum(CASE WHEN o.o_totalprice <= ap.p50 THEN 1 ELSE 0 END) AS r50,
        |         sum(CASE WHEN o.o_totalprice <= ap.p90 THEN 1 ELSE 0 END) AS r90
        |  FROM orders o CROSS JOIN ap
        |  GROUP BY 1, 2, 3)
        |SELECT min_price, max_price, cnt,
        |  abs(r50 * 1000000 - 500000 * cnt) <= 10000 * cnt AS p50_in_bound,
        |  abs(r90 * 1000000 - 900000 * cnt) <= 10000 * cnt AS p90_in_bound
        |FROM r ORDER BY cnt""".stripMargin,

    // bound-verdict sketch oracles (r16, VERDICT r15 #1 — the
    // agg_stats_approx device): DuckDB verifies ITS OWN HLL against the
    // exact distincts it recomputes; both engines emit true iff their
    // sketch is within 5% (integer-exact ppm compare), and the hash
    // compares exact counts + verdicts
    "agg_approx_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id)) * 1000000
        |    <= 50000 * count(DISTINCT user_id) AS est_in_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_hll_shards" ->
      """WITH w AS (
        |  SELECT lang,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
        |  FROM documents),
        |shards AS (
        |  SELECT lang, count(DISTINCT word) AS exact_distinct,
        |         approx_count_distinct(word) AS est
        |  FROM w GROUP BY lang
        |  UNION ALL
        |  SELECT '__all__' AS lang, count(DISTINCT word) AS exact_distinct,
        |         approx_count_distinct(word) AS est
        |  FROM w)
        |SELECT lang, exact_distinct,
        |  abs(est - exact_distinct) * 1000000 <= 50000 * exact_distinct AS est_in_bound
        |FROM shards ORDER BY lang""".stripMargin,

    // DuckDB 1.0 has no top-k sketch, so the verdict columns assert the
    // Space-Saving THEOREM as constants while the exact top-k half is
    // recomputed independently — a Spark sketch regression flips a
    // Spark-computed verdict against the constant and hash-fails (see
    // TextOps.heavyHittersVerified)
    "agg_heavy_hitters" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
        |  FROM documents),
        |c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
        |r AS (SELECT word, cnt,
        |        CAST(row_number() OVER (ORDER BY cnt DESC, word) AS INTEGER) AS rnk
        |      FROM c)
        |SELECT rnk, word, cnt, TRUE AS in_sketch, TRUE AS err_in_bound
        |FROM r WHERE rnk <= 10 ORDER BY rnk""".stripMargin,

    "window_rank" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INTEGER) AS rnk
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // presentation order IS the window order (r19: lets the Spark plan
    // emit its one-exchange one-sort output with no terminal sort —
    // partitions are suppkey-contiguous and rows sorted within, so the
    // written row order equals this ORDER BY; spec-pinned)
    "window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |    OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey,
        |                   l_quantity, l_extendedprice, l_discount, l_tax,
        |                   l_returnflag, l_linestatus
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM lineitem
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_partkey,
        |         l_quantity, l_extendedprice, l_discount, l_tax,
        |         l_returnflag, l_linestatus""".stripMargin,

    // unrolled power iterations in exact integer micro-units: every
    // division is an integer DIV, every aggregate a BIGINT sum —
    // order-free, so both engines agree bit-for-bit
    "graph_pagerank" ->
      """WITH co AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT a, b FROM co UNION ALL SELECT b, a FROM co),
        |deg AS (SELECT a AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
        |nn AS (SELECT COUNT(*) AS n FROM deg),
        |r0 AS (SELECT node, deg, 1000000000000 // n AS rank
        |       FROM deg CROSS JOIN nn),
        |c1 AS (SELECT e.b AS node, SUM(r.rank // r.deg) AS s
        |       FROM r0 r JOIN edges e ON e.a = r.node GROUP BY 1),
        |r1 AS (SELECT d.node, d.deg,
        |         (1000000000000 * 15) // (100 * n)
        |           + (85 * coalesce(c.s, 0)) // 100 AS rank
        |       FROM deg d LEFT JOIN c1 c USING (node) CROSS JOIN nn),
        |c2 AS (SELECT e.b AS node, SUM(r.rank // r.deg) AS s
        |       FROM r1 r JOIN edges e ON e.a = r.node GROUP BY 1),
        |r2 AS (SELECT d.node, d.deg,
        |         (1000000000000 * 15) // (100 * n)
        |           + (85 * coalesce(c.s, 0)) // 100 AS rank
        |       FROM deg d LEFT JOIN c2 c USING (node) CROSS JOIN nn),
        |c3 AS (SELECT e.b AS node, SUM(r.rank // r.deg) AS s
        |       FROM r2 r JOIN edges e ON e.a = r.node GROUP BY 1),
        |r3 AS (SELECT d.node, d.deg,
        |         (1000000000000 * 15) // (100 * n)
        |           + (85 * coalesce(c.s, 0)) // 100 AS rank
        |       FROM deg d LEFT JOIN c3 c USING (node) CROSS JOIN nn)
        |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |    AS node_type,
        |  CAST(node // 2 AS BIGINT) AS key, deg,
        |  CAST(rank AS BIGINT) AS rank_micro
        |FROM r3
        |ORDER BY rank_micro DESC, node_type, key LIMIT 20""".stripMargin,

    // r15: HITS unrolled like graph_pagerank — 2 mutual iterations,
    // L∞ (max) normalization in integer micro-units; max and sums are
    // order-free, every division an integer DIV
    "graph_hits" ->
      """WITH co AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h0 AS (SELECT DISTINCT cust, CAST(1000000 AS BIGINT) AS h FROM co),
        |ar1 AS (SELECT supp, SUM(h) AS raw FROM co JOIN h0 USING (cust) GROUP BY 1),
        |a1 AS (SELECT supp, raw * 1000000 // (SELECT MAX(raw) FROM ar1) AS a FROM ar1),
        |hr1 AS (SELECT cust, SUM(a) AS raw FROM co JOIN a1 USING (supp) GROUP BY 1),
        |h1 AS (SELECT cust, raw * 1000000 // (SELECT MAX(raw) FROM hr1) AS h FROM hr1),
        |ar2 AS (SELECT supp, SUM(h) AS raw FROM co JOIN h1 USING (cust) GROUP BY 1),
        |a2 AS (SELECT supp, raw * 1000000 // (SELECT MAX(raw) FROM ar2) AS a FROM ar2),
        |hr2 AS (SELECT cust, SUM(a) AS raw FROM co JOIN a2 USING (supp) GROUP BY 1),
        |h2 AS (SELECT cust, raw * 1000000 // (SELECT MAX(raw) FROM hr2) AS h FROM hr2),
        |ta AS (SELECT 'authority' AS node_type, supp AS key,
        |         CAST(a AS BIGINT) AS score_micro
        |       FROM a2 ORDER BY a DESC, supp LIMIT 10),
        |th AS (SELECT 'hub' AS node_type, cust AS key,
        |         CAST(h AS BIGINT) AS score_micro
        |       FROM h2 ORDER BY h DESC, cust LIMIT 10)
        |SELECT * FROM (SELECT * FROM ta UNION ALL SELECT * FROM th) u
        |ORDER BY node_type, score_micro DESC, key""".stripMargin,

    // count(DISTINCT) OVER is unsupported in both engines; the rewrite
    // (first-occurrence flag + running sum) is deterministic because
    // (s, event_id) totally orders each partition
    "window_running_distinct" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |f AS (
        |  SELECT *, CASE WHEN row_number() OVER (
        |      PARTITION BY user_id, event_type ORDER BY s, event_id) = 1
        |    THEN 1 ELSE 0 END AS fs
        |  FROM e)
        |SELECT user_id, event_id, s, event_type,
        |  CAST(SUM(fs) OVER (PARTITION BY user_id ORDER BY s, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_types
        |FROM f ORDER BY user_id, s, event_id""".stripMargin,

    "window_lag_lead" ->
      """SELECT event_id, user_id,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |    - CAST(epoch(date_trunc('second', lag(ts, 1) OVER w)) AS BIGINT) AS gap_sec,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "agg_string_concat" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "agg_conditional" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_f
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "fn_greatest_least" ->
      """SELECT p_partkey,
        |  greatest(p_retailprice, p_size * 100.0) AS g,
        |  least(p_retailprice, p_size * 100.0) AS l
        |FROM part ORDER BY p_partkey""".stripMargin,

    // presentation order IS the window order (r19, the running_sum
    // device): partitions are suppkey-contiguous range partitions with
    // rows sorted within, so the written row order equals this ORDER BY
    // and the Spark plan needs no terminal sort. Rows equal on the key
    // are identical output tuples (peers share the value-based frame).
    "window_range_frame" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_extendedprice
        |    RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_near
        |FROM lineitem
        |ORDER BY l_suppkey, l_extendedprice, l_orderkey, l_linenumber""".stripMargin,

    "fn_trim_pad" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS padded,
        |  rpad(p_type, 14, '.') AS rpadded,
        |  translate(p_name, 'aeiou', 'AEIOU') AS tr
        |FROM part ORDER BY p_partkey""".stripMargin,

    "window_nth_value" ->
      """SELECT o_orderkey,
        |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS second_best
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "set_intersect_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT ALL SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_except_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT ALL SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "window_first_last" ->
      """SELECT o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    // presentation order IS the window order (r19, the running_sum
    // device — no pin, no terminal sort in the Spark plan; o_orderkey
    // is unique so the key is total)
    "window_percent_cume" ->
      """SELECT o_orderkey, o_orderpriority,
        |  round(percent_rank() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey), 6) AS pr,
        |  round(cume_dist() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey), 6) AS cd
        |FROM orders
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin,

    "fn_bitwise" ->
      """SELECT p_partkey,
        |  CAST(bit_count(p_partkey) AS INTEGER) AS bits,
        |  p_partkey << 3 AS shifted,
        |  xor(p_partkey, CAST(p_size AS BIGINT)) AS xored,
        |  p_partkey & 255 AS low_byte
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_levenshtein" ->
      """SELECT p_partkey,
        |  CAST(levenshtein(p_name, regexp_replace(p_name, '[aeiou]', '', 'g')) AS INTEGER) AS dist_devowel,
        |  CAST(levenshtein(p_brand, p_type) AS INTEGER) AS dist_bt
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_hash" ->
      """SELECT p_partkey,
        |  md5(p_name) AS md5_hex,
        |  sha256(p_name) AS sha256_hex
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
        |  CAST(isodow(o_orderdate) AS INTEGER) AS dow_iso,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  CAST(weekofyear(o_orderdate) AS INTEGER) AS woy
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "split_train_test" ->
      """SELECT CASE WHEN p_partkey % 10 < 8 THEN 'train' ELSE 'test' END AS split,
        |  COUNT(*) AS n,
        |  CAST(SUM(p_partkey) AS BIGINT) AS key_sum
        |FROM part GROUP BY 1 ORDER BY split""".stripMargin,

    // count/min/max only: a double SUM would be addition-order-dependent
    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n,
        |  MIN(o_totalprice) AS lo,
        |  MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "window_ntile_dense" ->
      """SELECT c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS tile,
        |  CAST(dense_rank() OVER (ORDER BY c_acctbal DESC) AS INTEGER) AS drank
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // exact KMV replay: distinct md5-60bit hashes, k smallest per group,
    // reduced to the same scalar checksums as the Spark Aggregator output
    "sample_bottomk" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag,
        |    CAST(('0x' || substring(md5(CAST(l_suppkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM lineitem
        |), r AS (
        |  SELECT l_returnflag, hv,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
        |  FROM h)
        |SELECT l_returnflag,
        |  CAST(COUNT(*) AS INT) AS n_sampled,
        |  MIN(hv) AS min_hash,
        |  MAX(hv) AS kth_hash,
        |  bit_xor(hv) AS xor_checksum
        |FROM r WHERE rn <= 8
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "sort_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "set_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_union_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION ALL SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    // name-resolved union with NULL back-fill for drifted shard schemas
    "set_union_byname" ->
      """SELECT p_partkey, p_name, p_size, NULL::DOUBLE AS p_retailprice
        |FROM part WHERE p_size <= 10
        |UNION ALL
        |SELECT p_partkey, NULL, NULL, p_retailprice
        |FROM part WHERE p_size >= 45
        |ORDER BY p_partkey""".stripMargin,

    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
        |ORDER BY nationkey""".stripMargin,

    "fn_string" ->
      """SELECT p_partkey,
        |  upper(p_name) AS u_name,
        |  substring(p_name, 1, 8) AS pfx,
        |  p_brand || ':' || p_type AS brand_type,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  trim(p_name) AS trimmed,
        |  (p_type LIKE 'S%') AS is_s_type
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_regexp" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |  regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        |  regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS two_words
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT p_partkey,
        |  round(p_retailprice * 0.8, 2) AS disc_price,
        |  abs(p_retailprice - 950.0) AS absdev,
        |  pow(p_size, 2) AS size_sq,
        |  round(ln(p_retailprice), 6) AS ln_price,
        |  sqrt(p_retailprice) AS sqrt_price,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
        |  CAST(floor(p_retailprice) AS BIGINT) AS floor_price
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_array" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_elem,
        |  CAST(embedding[-1] AS DOUBLE) AS last_elem,
        |  round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), 4) AS norm_sq
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "fn_vector_norm" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings)
        |SELECT vec_id,
        |  round(nrm, 6) AS l2norm,
        |  round(list_dot_product(emb, list_transform(emb, x -> CAST(1.0 AS DOUBLE))) / nullif(nrm, 0), 6) AS unit_sum,
        |  round(emb[1] / nullif(nrm, 0), 6) AS unit_first
        |FROM e ORDER BY vec_id""".stripMargin,

    // float→double widening is exact and round() is half-away-from-zero
    // on both engines, so the codes agree bit-for-bit; per-vector list
    // sums reduce in index order (no order-sensitive float reduction)
    "vec_quantize_int8" ->
      """WITH t AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    CAST(len(embedding) AS INT) AS n_dims,
        |    list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS max_abs
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id, n_dims, max_abs,
        |    CASE WHEN max_abs > 0 THEN
        |      list_transform(emb, x -> CAST(round(x / (max_abs / 127.0)) AS BIGINT))
        |    END AS codes
        |  FROM t)
        |SELECT vec_id, n_dims,
        |  round(max_abs / 127.0, 9) AS scale,
        |  COALESCE(CAST(list_sum(codes) AS BIGINT), 0) AS code_sum,
        |  COALESCE(CAST(list_sum(list_transform(codes, x -> abs(x))) AS BIGINT), 0) AS code_abs_sum,
        |  COALESCE(CAST(list_max(codes) AS BIGINT), 0) AS code_max
        |FROM q ORDER BY vec_id""".stripMargin,

    // per-label centroid cosine vs the global centroid: 7dp-quantized
    // components summed as DECIMAL (exact, order-independent); dots stay
    // DECIMAL; only the final cosine division runs in double
    "emb_centroid_drift" ->
      """WITH e AS (
        |  SELECT label,
        |    unnest(CAST(embedding AS DOUBLE[])) AS v,
        |    unnest(range(1, len(embedding) + 1)) AS pos
        |  FROM embeddings),
        |s AS (
        |  SELECT label, pos,
        |    CAST(SUM(CAST(round(v, 7) AS DECIMAL(18,7))) AS DECIMAL(18,7)) AS s
        |  FROM e GROUP BY label, pos),
        |g AS (SELECT pos, CAST(SUM(s) AS DECIMAL(18,7)) AS g FROM s GROUP BY pos),
        |d AS (
        |  SELECT label, SUM(s * g) AS sg, SUM(s * s) AS ss, SUM(g * g) AS gg
        |  FROM s JOIN g USING (pos) GROUP BY label),
        |n AS (SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY label)
        |SELECT label, n_vecs,
        |  round(CAST(sg AS DOUBLE)
        |    / (sqrt(CAST(ss AS DOUBLE)) * sqrt(CAST(gg AS DOUBLE))), 6) AS centroid_cos
        |FROM d JOIN n USING (label) ORDER BY label""".stripMargin,

    // per-dim Σv and Σv² as exact 7dp decimals (the centroid_drift
    // device); mean/variance convert to double in ONE mirrored
    // expression (q2/n − (s/n)²); dim is 0-based on both sides
    "emb_dim_stats" ->
      """WITH e AS (
        |  SELECT unnest(range(0, len(embedding))) AS dim,
        |    CAST(round(unnest(CAST(embedding AS DOUBLE[])), 7)
        |      AS DECIMAL(18,7)) AS v
        |  FROM embeddings),
        |s AS (
        |  SELECT dim, COUNT(*) AS n,
        |    SUM(v) AS s, SUM(v * v) AS q2
        |  FROM e GROUP BY dim)
        |SELECT CAST(dim AS INT) AS dim, n,
        |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
        |  round(CAST(q2 AS DOUBLE) / CAST(n AS DOUBLE)
        |    - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS variance
        |FROM s ORDER BY dim""".stripMargin,

    // ordered adjacent bigrams; every count exact integer, d = 0.75 an
    // exact binary double, and the scoring dag mirrored token-for-token
    // (/, * left-associative in both engines) → identical IEEE doubles
    "text_kn_bigram" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents),
        |bi AS (
        |  SELECT w[i] AS w1, w[i + 1] AS w2
        |  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM toks) a),
        |bc AS (SELECT w1, w2, COUNT(*) AS cnt FROM bi GROUP BY 1, 2),
        |fw AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS ctx_total,
        |         COUNT(*) AS n1_fw FROM bc GROUP BY 1),
        |bw AS (SELECT w2, COUNT(*) AS n1_bw FROM bc GROUP BY 1),
        |tt AS (SELECT COUNT(*) AS t FROM bc),
        |top AS (SELECT w1, w2, cnt FROM bc
        |        ORDER BY cnt DESC, w1, w2 LIMIT 50)
        |SELECT top.w1, top.w2, top.cnt, fw.ctx_total,
        |  round(
        |    GREATEST(CAST(top.cnt AS DOUBLE) - 0.75, 0.0)
        |      / CAST(fw.ctx_total AS DOUBLE)
        |    + (0.75 * CAST(fw.n1_fw AS DOUBLE))
        |      / CAST(fw.ctx_total AS DOUBLE)
        |      * (CAST(bw.n1_bw AS DOUBLE) / CAST(tt.t AS DOUBLE)),
        |    6) AS p_kn
        |FROM top
        |JOIN fw USING (w1) JOIN bw USING (w2) CROSS JOIN tt
        |ORDER BY cnt DESC, w1, w2""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  '{"k":' || CAST(json_extract_string(props, '$.k') AS BIGINT) || '}' AS rebuilt
        |FROM events ORDER BY event_id""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // identical result to dedup_exact — the oracle proves the
    // hash-group + collision-settle rewrite is semantics-preserving
    "dedup_exact_hash" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // default df-cap (512) mirrored exactly: shingles with df > 512 are
    // dropped from BOTH candidate generation and the per-doc sizes —
    // semantics identical to DedupOps.ngramJaccard's finite default (a
    // no-op at sf0.01's 500 docs, where df can never exceed 500).
    // keeper = lowest doc_id per NORMALIZED text (lower + whitespace
    // collapse + trim), mirroring DedupOps.exactNormalized
    "dedup_exact_normalized" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (
        |      PARTITION BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |      ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 3) u
        |),
        |df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
        |kept AS (SELECT s.doc_id, s.sh FROM sh s JOIN df USING (sh) WHERE df.df <= 512),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM kept a JOIN kept b USING (sh)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b,
        |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
        |FROM pairs
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin,

    // same inverted index as the jaccard oracle; only the scoring
    // denominator changes (min set size instead of union size) — the
    // subset-duplicate detector
    "dedup_ngram_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 3) u
        |),
        |df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
        |kept AS (SELECT s.doc_id, s.sh FROM sh s JOIN df USING (sh) WHERE df.df <= 512),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM kept a JOIN kept b USING (sh)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b,
        |  round(CAST(inter AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
        |FROM pairs
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / least(sa.n, sb.n) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin,

    // connected components over the (deterministic, oracled) jaccard
    // pairs: transitive closure via recursive CTE on the DuckDB side,
    // min-label propagation on the Spark side — same fixpoint.
    "dedup_jaccard_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 3) u
        |),
        |dfc AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
        |keptsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN dfc USING (sh) WHERE dfc.df <= 512),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM keptsh GROUP BY doc_id),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM keptsh a JOIN keptsh b USING (sh)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2
        |),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |)
        |SELECT a AS doc_id, least(a, min(b)) AS cluster
        |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,

    // the flagship composition: quality gate → exact dedup → near-dup
    // clusters → keeper selection, one oracle end to end
    "pipeline_dedup_full" ->
      """WITH RECURSIVE quality AS (
        |  SELECT doc_id, text, lang, n_chars
        |  FROM documents
        |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20
        |),
        |kept AS (
        |  SELECT doc_id, text, lang, n_chars FROM (
        |    SELECT doc_id, text, lang, n_chars,
        |      row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM quality) t
        |  WHERE rn = 1
        |),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM kept
        |),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 3) u
        |),
        |dfc AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
        |keptsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN dfc USING (sh) WHERE dfc.df <= 512),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM keptsh GROUP BY doc_id),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM keptsh a JOIN keptsh b USING (sh)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2
        |),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |),
        |clusters AS (
        |  SELECT a AS doc_id, least(a, min(b)) AS cluster FROM reach GROUP BY a
        |)
        |SELECT k.doc_id, k.lang, k.n_chars
        |FROM kept k LEFT JOIN clusters c ON k.doc_id = c.doc_id
        |WHERE c.cluster IS NULL OR c.cluster = k.doc_id
        |ORDER BY k.doc_id""".stripMargin,

    // maxDf skew knob, oracle-checked: shingles with df > 3 are dropped
    // from BOTH candidate generation and the per-doc sizes, so jaccard is
    // exact within the reduced universe (matches DedupOps.ngramJaccard
    // maxDf semantics).
    "dedup_ngram_jaccard_capped" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 3) u
        |),
        |df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
        |kept AS (SELECT s.doc_id, s.sh FROM sh s JOIN df USING (sh) WHERE df.df <= 3),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM kept a JOIN kept b USING (sh)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b,
        |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
        |FROM pairs
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin,

    "sim_cosine_topk" ->
      """WITH p AS (SELECT CAST(embedding AS DOUBLE[]) AS probe FROM embeddings WHERE vec_id = 0),
        |c AS (
        |  SELECT vec_id,
        |    list_dot_product(CAST(embedding AS DOUBLE[]), probe)
        |      / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(probe, probe))) AS rawcos
        |  FROM embeddings, p
        |)
        |SELECT vec_id, round(rawcos, 6) AS cos FROM c
        |ORDER BY rawcos DESC, vec_id LIMIT 10""".stripMargin,

    "sim_batch_topk" -> simBatchTopkSql,

    // batch-topk oracle body + the label-inequality filter — negatives
    // rank within the anchor's different-label universe
    "sample_hardneg" ->
      """WITH a AS (
        |  SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS probe,
        |    label AS anchor_label
        |  FROM embeddings WHERE vec_id < 5),
        |c AS (
        |  SELECT anchor_id, e.vec_id, e.label,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), probe)
        |      / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(probe, probe))) AS rawcos
        |  FROM embeddings e CROSS JOIN a
        |  WHERE e.label <> a.anchor_label),
        |r AS (
        |  SELECT anchor_id, vec_id, label, rawcos,
        |    CAST(row_number() OVER (PARTITION BY anchor_id
        |      ORDER BY rawcos DESC, vec_id) AS INTEGER) AS rn
        |  FROM c)
        |SELECT anchor_id, vec_id, label, round(rawcos, 6) AS cos, rn
        |FROM r WHERE rn <= 10 ORDER BY anchor_id, rn""".stripMargin,

    "text_ngram_stats" ->
      """SELECT gram, COUNT(*) AS cnt FROM (
        |  SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM (SELECT w, unnest(range(1, len(w) - 1)) AS i
        |        FROM (SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |              FROM documents) t
        |        WHERE len(w) >= 3) u) g
        |GROUP BY gram ORDER BY cnt DESC, gram LIMIT 50""".stripMargin,

    "text_wordcount" ->
      """SELECT word, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> ''
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 100""".stripMargin,

    "text_lang_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS INTEGER) AS n_distinct_tokens,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INTEGER) AS n_words,
        |  CAST(n_chars AS DOUBLE) / NULLIF(len(list_filter(string_split(text, ' '), x -> x <> '')), 0) AS chars_per_word,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> x IN ('the','a','of','and','in','to','is','it'))) AS DOUBLE)
        |    / NULLIF(len(list_filter(string_split(text, ' '), x -> x <> '')), 0) AS stopword_ratio,
        |  CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
        |    / greatest(n_chars, 1) AS alpha_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "pipeline_enrich" ->
      """SELECT doc_id, lang, n_words,
        |  CAST(n_chars AS DOUBLE) / n_words AS chars_per_word
        |FROM (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INTEGER) AS n_words,
        |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents
        |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "text_pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\d{9,}', '<NUM>', 'g'),
        |    '\+?\d{0,3}[-. ]*\(?\d{3}\)?[-. ]*\d{3}[-. ]*\d{4}', '<PHONE>', 'g') AS text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // soft dedup: exact group size via the text-partition window; the
    // micro weight is integer floor division - exact both engines
    "dedup_soft_weights" ->
      """SELECT doc_id,
        |  COUNT(*) OVER (PARTITION BY text) AS dup_n,
        |  1000000 // COUNT(*) OVER (PARTITION BY text) AS weight_micro
        |FROM documents ORDER BY doc_id""".stripMargin,

    // DSIR: md5-60bit bucketing (the KMV/pps device, replayed verbatim);
    // per-bucket log-ratios rounded 6dp and cast DECIMAL BEFORE the
    // per-doc sum (the text_entropy per-term-round pattern), so the
    // reduction is an exact decimal total on both engines
    // r15: bucket hash switched md5-hex+conv → the packed double-poly
    // word hash (ShingleKernels.wordHashes; the hex-string parse per
    // token dominated the sf10 tokenization pass) — same poly DuckDB
    // replay the minhash family uses
    "corpus_dsir_weights" ->
      """WITH w AS (
        |  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS word
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, lang,
        |    (list_reduce(list_prepend(CAST(7 AS BIGINT),
        |        list_transform(string_split_regex(word, ''), c -> CAST(ord(c) AS BIGINT))),
        |        (a, c) -> (a * 31 + c) % 2147483647) * 2147483648
        |     + list_reduce(list_prepend(CAST(11 AS BIGINT),
        |        list_transform(string_split_regex(word, ''), c -> CAST(ord(c) AS BIGINT))),
        |        (a, c) -> (a * 131 + c) % 2147483647)) % 64 AS b
        |  FROM w WHERE word <> ''),
        |db AS (SELECT doc_id, lang, b, COUNT(*) AS c FROM toks GROUP BY doc_id, lang, b),
        |src AS (SELECT b, SUM(c) AS s_b FROM db GROUP BY b),
        |tgt AS (SELECT b, SUM(c) AS t_b FROM db WHERE lang = 'en' GROUP BY b),
        |tot AS (SELECT (SELECT SUM(s_b) FROM src) AS s_tot,
        |               (SELECT coalesce(SUM(t_b), 0) FROM tgt) AS t_tot),
        |lam AS (
        |  SELECT src.b,
        |    CAST(round(ln((coalesce(t_b, 0) + 1.0) / (t_tot + 64.0))
        |             - ln((s_b + 1.0) / (s_tot + 64.0)), 6) AS DECIMAL(18,6)) AS lambda
        |  FROM src LEFT JOIN tgt USING (b) CROSS JOIN tot)
        |SELECT doc_id,
        |  CAST(CAST(SUM(c * lambda) AS DECIMAL(38,6)) AS DOUBLE) AS logweight
        |FROM db JOIN lam USING (b) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // every Gopher rule is an exact-integer comparison (ratios become
    // cross-multiplied bounds), so the gate is bit-identical cross-engine
    "text_gopher_quality" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS wc,
        |    CAST(coalesce(list_sum(list_transform(
        |      list_filter(string_split(text, ' '), x -> x <> ''),
        |      x -> length(x))), 0) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x <> '' AND regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
        |    CAST(len(regexp_extract_all(text, '#'))
        |      + len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS symbols,
        |    CAST(len(list_intersect(
        |      list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')),
        |      ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_distinct
        |  FROM documents)
        |SELECT doc_id, wc, word_chars, alpha_words, symbols, stop_distinct,
        |  CAST(wc >= 50 AND wc <= 100000 AS INTEGER) AS r_wordcount,
        |  CAST(word_chars >= wc * 3 AND word_chars <= wc * 10 AS INTEGER) AS r_meanwordlen,
        |  CAST(symbols * 10 <= wc AS INTEGER) AS r_symbolratio,
        |  CAST(alpha_words * 5 >= wc * 4 AS INTEGER) AS r_alphafrac,
        |  CAST(stop_distinct >= 2 AS INTEGER) AS r_stopwords,
        |  CAST((wc >= 50 AND wc <= 100000) AND (word_chars >= wc * 3 AND word_chars <= wc * 10)
        |    AND (symbols * 10 <= wc) AND (alpha_words * 5 >= wc * 4)
        |    AND (stop_distinct >= 2) AS INTEGER) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    // top-bigram coverage in MICRO units via floor division (agrees
    // cross-engine for non-negative operands); ties break on the bigram
    "text_repetition_bigram" ->
      """WITH ws AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |tot AS (
        |  SELECT doc_id, CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS BIGINT) AS word_chars
        |  FROM ws),
        |idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM ws),
        |cnt AS (
        |  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg, COUNT(*) AS cnt
        |  FROM idx GROUP BY doc_id, bg),
        |top AS (
        |  SELECT doc_id, bg AS top_bigram, cnt FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY cnt DESC, bg) AS rn FROM cnt)
        |  WHERE rn = 1)
        |SELECT t.doc_id, top_bigram, cnt,
        |  (cnt * (length(top_bigram) - 1) * 1000000) // word_chars AS cover_micro,
        |  CAST((cnt * (length(top_bigram) - 1) * 1000000) // word_chars > 200000 AS INTEGER) AS repetitive
        |FROM top t JOIN tot USING (doc_id) ORDER BY doc_id""".stripMargin,

    // batched model inference with an integer-exact logit: the linear
    // form over integer feature counts is bit-identical cross-engine
    // (no libm), and thresholding the logit == thresholding the sigmoid
    "text_quality_model" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS f_words,
        |    len(list_filter(string_split(lower(text), ' '),
        |        x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'to')) AS f_stop,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS f_digits,
        |    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |      + len(regexp_extract_all(text, '\d{9,}')) AS f_pii
        |  FROM documents),
        |l AS (
        |  SELECT doc_id,
        |    2*f_words + 5*f_stop - 30*f_digits - 1000*f_pii - 127 AS logit
        |  FROM f)
        |SELECT doc_id, logit,
        |  CASE WHEN logit > 0 THEN 'keep' ELSE 'drop' END AS label
        |FROM l ORDER BY doc_id""".stripMargin,

    // the order-sensitive float reduction (Σ cnt·ln cnt) is rounded per
    // term and summed as DECIMAL on BOTH engines, so the sum is exact and
    // partitioning-independent; ln(2) is the same literal on both sides
    "text_entropy" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), c AS (
        |  SELECT doc_id, word, COUNT(*) AS cnt FROM w WHERE word <> ''
        |  GROUP BY doc_id, word
        |), d AS (
        |  SELECT doc_id, COUNT(*) AS n_distinct,
        |    CAST(SUM(cnt) AS BIGINT) AS n_words,
        |    SUM(CAST(round(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE)), 6)
        |        AS DECIMAL(28,6))) AS s
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, n_words, n_distinct,
        |  round((ln(CAST(n_words AS DOUBLE)) - CAST(s AS DOUBLE) / n_words)
        |        / 0.6931471805599453, 4) AS entropy_bits,
        |  round(CAST(n_distinct AS DOUBLE) / n_words, 6) AS ttr
        |FROM d ORDER BY doc_id""".stripMargin,

    // same wrap + strip chain as the Spark side; DuckDB regexp_replace
    // needs the explicit 'g' flag (Spark replaces all matches by default)
    "text_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><body><h1>' || source || '</h1>' || chr(10) || '<p>' || text ||
        |    '</p><script>var x = 1 &amp; 2;</script><!-- nav --></body></html>' AS html
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, trim(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html, '<script>[^<]*</script>|<!--[^>]*-->', ' ', 'g'),
        |            '<[^>]*>', ' ', 'g'),
        |          '&lt;', '<', 'g'),
        |        '&gt;', '>', 'g'),
        |      '&amp;', '&', 'g'),
        |    '[ \n\t]+', ' ', 'g')) AS clean_text
        |  FROM h)
        |SELECT doc_id, clean_text, CAST(length(clean_text) AS INT) AS clean_len
        |FROM s ORDER BY doc_id""".stripMargin,

    // the Spark side splits on lookaround boundaries (not expressible in
    // RE2); the resulting piece count equals |alnum runs| + |non-alnum
    // non-space chars|, which RE2 can count directly
    "text_tokens_bpe" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[\p{L}\p{N}]+')) +
        |       len(regexp_extract_all(text, '[^\p{L}\p{N} ]')) AS INTEGER) AS n_pieces
        |FROM documents ORDER BY doc_id""".stripMargin,

    // generated from TextOps.langProfiles: same word lists, same argmax,
    // same reverse-lexicographic tie-break as the Spark struct sort
    "text_langid" -> langIdOracleSql,

    // eval set = doc_id % 50 == 0; a train doc survives iff it shares NO
    // word trigram with any eval doc (Spark joins xxhash64(gram), the
    // oracle joins the gram strings — identical modulo hash collisions)
    "pipeline_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |sh AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 3) u
        |),
        |eval_grams AS (
        |  SELECT DISTINCT gram FROM sh WHERE doc_id % 50 = 0
        |),
        |contaminated AS (
        |  SELECT DISTINCT doc_id FROM sh
        |  WHERE doc_id % 50 <> 0 AND gram IN (SELECT gram FROM eval_grams)
        |)
        |SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id % 50 <> 0
        |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        |ORDER BY doc_id""".stripMargin,

    // concat-and-chunk packing: a doc belongs to the chunk its FIRST
    // token lands in ((cum - n) // budget over the doc_id order)
    "pipeline_pack_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n,
        |    CAST(SUM(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM t)
        |SELECT (cum - n) // 512 AS chunk,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS chunk_tokens
        |FROM c GROUP BY 1 ORDER BY chunk""".stripMargin,

    // next-fit-decreasing bin packing (r14): the recursive CTE replays
    // the SAME two-level algorithm — rank by (n DESC, doc_id), split
    // into 32 rank-defined ranges, per-range sequential next-fit (one
    // row per iteration per range), O(ranges) prefix renumber. Must
    // track packSequences' defaults (budget 256, 32 ranges).
    "pipeline_pack_sequences" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |fit AS (
        |  SELECT doc_id, n_tokens,
        |    row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn,
        |    count(*) OVER () AS n
        |  FROM toks WHERE n_tokens <= 256),
        |r AS (
        |  SELECT doc_id, n_tokens, rn,
        |    (rn - 1) // ((n + 31) // 32) AS range_id,
        |    row_number() OVER (PARTITION BY (rn - 1) // ((n + 31) // 32)
        |                       ORDER BY rn) AS idx
        |  FROM fit),
        |scan AS (
        |  SELECT range_id, idx, doc_id, n_tokens,
        |    CAST(0 AS BIGINT) AS bin, n_tokens AS fill
        |  FROM r WHERE idx = 1
        |  UNION ALL
        |  SELECT r.range_id, r.idx, r.doc_id, r.n_tokens,
        |    CASE WHEN s.fill + r.n_tokens > 256 THEN s.bin + 1 ELSE s.bin END,
        |    CASE WHEN s.fill + r.n_tokens > 256 THEN r.n_tokens
        |         ELSE s.fill + r.n_tokens END
        |  FROM scan s JOIN r ON r.range_id = s.range_id AND r.idx = s.idx + 1),
        |bins AS (SELECT range_id, max(bin) + 1 AS bins_used FROM scan GROUP BY 1),
        |offs AS (
        |  SELECT range_id,
        |    CAST(COALESCE(SUM(bins_used) OVER (ORDER BY range_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |  FROM bins)
        |SELECT s.doc_id, s.n_tokens, s.range_id,
        |  CAST(s.bin + o.off AS BIGINT) AS bin_id, 0 AS oversize
        |FROM scan s JOIN offs o USING (range_id)
        |UNION ALL
        |SELECT doc_id, n_tokens, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), 1
        |FROM toks WHERE n_tokens > 256
        |ORDER BY doc_id""".stripMargin,

    // md5-prefix stratified sampling: 25% for en, 50% otherwise
    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5(text), 1, 2) <=
        |  CASE WHEN lang = 'en' THEN '3f' ELSE '7f' END
        |ORDER BY doc_id""".stripMargin,

    // Neyman allocation from EXACT integer moments (never streaming
    // stddev — partition-order-dependent); 6dp-rounded weights summed as
    // DECIMAL; membership = rank by md5(text) per stratum
    "sample_neyman" ->
      """WITH stats AS (
        |  SELECT lang, COUNT(*) AS nh,
        |    SUM(CAST(n_chars AS HUGEINT)) AS sx,
        |    SUM(CAST(n_chars AS HUGEINT) * n_chars) AS sxx
        |  FROM documents GROUP BY lang),
        |sig AS (
        |  SELECT lang, nh,
        |    CASE WHEN nh > 1 THEN
        |      sqrt((CAST(nh AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |           / (CAST(nh AS DOUBLE) * (CAST(nh AS DOUBLE) - 1.0)))
        |    ELSE 0.0 END AS sigma
        |  FROM stats),
        |wts AS (SELECT lang, nh,
        |          CAST(round(CAST(nh AS DOUBLE) * sigma, 6) AS DECIMAL(38,6)) AS w6
        |        FROM sig),
        |tot AS (SELECT SUM(w6) AS tw FROM wts),
        |alloc AS (
        |  SELECT lang, LEAST(CAST(nh AS DOUBLE), GREATEST(1.0,
        |    round(200.0 * CAST(w6 AS DOUBLE) / CAST(tw AS DOUBLE)))) AS na
        |  FROM wts CROSS JOIN tot),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, CAST(rn AS INTEGER) AS rnk
        |FROM r JOIN alloc USING (lang)
        |WHERE rn <= na ORDER BY doc_id""".stripMargin,

    // rejection sampling to a uniform length-bucket target: exact
    // integer acceptance (u16 * cnt_b < 65536 * min_cnt), the samplePps
    // md5 coin — replayed verbatim
    "sample_rejection" ->
      """WITH b AS (
        |  SELECT doc_id, n_chars, text, n_chars // 500 AS bucket FROM documents),
        |c AS (SELECT bucket, COUNT(*) AS cnt FROM b GROUP BY bucket),
        |m AS (SELECT MIN(cnt) AS minc FROM c)
        |SELECT doc_id, bucket, n_chars
        |FROM b JOIN c USING (bucket) CROSS JOIN m
        |WHERE ((instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 4096
        |     + (instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1) * 256
        |     + (instr('0123456789abcdef', substring(md5(text), 3, 1)) - 1) * 16
        |     + (instr('0123456789abcdef', substring(md5(text), 4, 1)) - 1)) * cnt
        |      < 65536 * minc
        |ORDER BY doc_id""".stripMargin,

    // integer tf/df/N feed ln() on both engines, but ln is not correctly
    // rounded in either libm — so BOTH engines rank on the 6dp-quantized
    // score (last-ulp divergence cannot flip near-ties); remaining ties
    // break on the word string
    "text_tfidf_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks
        |       WHERE word <> '' GROUP BY doc_id, word),
        |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT doc_id, word,
        |    CAST(tf AS DOUBLE) * ln((CAST(n_docs AS DOUBLE) + 1.0)
        |      / (CAST(df AS DOUBLE) + 1.0)) AS score
        |  FROM tf JOIN df USING (word) CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, word, round(score, 6) AS tfidf,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY round(score, 6) DESC, word) AS INTEGER) AS rnk
        |  FROM s)
        |SELECT doc_id, rnk, word, tfidf
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    // all-integer bigram-frequency scoring; the single division is the
    // only floating-point op (deterministic operands on both engines)
    "text_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |grams AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        |        FROM toks WHERE len(w) >= 2) u
        |),
        |counts AS (SELECT gram, COUNT(*) AS cnt FROM grams GROUP BY gram)
        |SELECT doc_id,
        |  COUNT(*) AS n_bigrams,
        |  CAST(SUM(cnt) AS BIGINT) AS freq_sum,
        |  CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_freq
        |FROM grams JOIN counts USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // inter-document duplicated-span profile; distinct trigram STRINGS
    // mirror the Spark side's distinct trigram hashes (collision-free at
    // any realistic span-set size)
    "text_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 3) u
        |),
        |df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh)
        |SELECT s.doc_id, COUNT(*) AS n_spans,
        |  CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
        |  CAST(CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
        |    / COUNT(*) AS dup_frac
        |FROM sh s JOIN df USING (sh)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    "filter_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 3) u
        |),
        |df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
        |per AS (
        |  SELECT s.doc_id,
        |    CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS f
        |  FROM sh s JOIN df USING (sh) GROUP BY s.doc_id
        |)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM per WHERE f > 0.5)
        |ORDER BY d.doc_id""".stripMargin,

    // byte-weighted temperature rebalancing: sqrt is IEEE-correctly
    // rounded in both engines and 65536 is a power of two, so the hex
    // threshold string is cross-engine exact; the min-bytes source
    // compares against 'zzzz' (keep-all)
    "sample_temperature" ->
      """WITH c AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS b_s
        |  FROM documents GROUP BY source
        |),
        |m AS (SELECT MIN(b_s) AS b_min FROM c),
        |r AS (
        |  SELECT source,
        |    CASE WHEN b_s = (SELECT b_min FROM m) THEN 'zzzz'
        |         ELSE printf('%04x', CAST(floor(
        |           sqrt(CAST((SELECT b_min FROM m) AS DOUBLE) / b_s) * 65536)
        |           AS INTEGER)) END AS thr
        |  FROM c
        |)
        |SELECT d.doc_id, d.source FROM documents d JOIN r USING (source)
        |WHERE substring(md5(d.text), 1, 4) < r.thr
        |ORDER BY d.doc_id""".stripMargin,

    // CCNet-style head/middle/tail split over the bigram LM score;
    // (score DESC, doc_id) order makes ntile ties cross-engine stable
    "text_ppl_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |grams AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        |        FROM toks WHERE len(w) >= 2) u
        |),
        |counts AS (SELECT gram, COUNT(*) AS cnt FROM grams GROUP BY gram),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_freq
        |  FROM grams JOIN counts USING (gram) GROUP BY doc_id
        |)
        |SELECT s.doc_id, d.lang, s.avg_freq,
        |  CAST(ntile(3) OVER (PARTITION BY d.lang ORDER BY s.avg_freq DESC, s.doc_id)
        |    AS INTEGER) AS ppl_bucket
        |FROM scored s JOIN documents d USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin,

    // Spark joins xxhash64 gram hashes, the oracle joins gram strings
    // (decontaminate's documented collision rule); the source-df cap
    // (<= 64 sources per gram) is mirrored even though it cannot bind
    // on the 20-source gate corpus; sizes are over the SAME capped
    // universe as the intersection
    "corpus_overlap_matrix" ->
      """WITH toks AS (
        |  SELECT source, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |sh AS (
        |  SELECT DISTINCT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM (SELECT source, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 3) u
        |),
        |rare AS (SELECT gram FROM sh GROUP BY gram HAVING COUNT(*) <= 64),
        |kept AS (SELECT sh.* FROM sh JOIN rare USING (gram)),
        |sz AS (SELECT source, COUNT(*) AS n FROM kept GROUP BY source)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  COUNT(*) AS shared_grams,
        |  round(COUNT(*)::DOUBLE / (za.n + zb.n - COUNT(*)), 6) AS gram_jaccard
        |FROM kept a
        |JOIN kept b USING (gram)
        |JOIN sz za ON za.source = a.source
        |JOIN sz zb ON zb.source = b.source
        |WHERE a.source < b.source
        |GROUP BY a.source, b.source, za.n, zb.n
        |ORDER BY src_a, src_b""".stripMargin,

    // sequential quality-rule attrition report; rule booleans mirror the
    // Spark expressions term for term
    "corpus_funnel" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS wl
        |  FROM documents
        |),
        |g AS (
        |  SELECT doc_id, wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2] AS g
        |  FROM (SELECT doc_id, wl, unnest(range(1, len(wl) - 1)) AS i
        |        FROM toks WHERE len(wl) >= 3) u
        |),
        |rep AS (SELECT doc_id, COUNT(*) > COUNT(DISTINCT g) AS r FROM g GROUP BY doc_id),
        |t AS (
        |  SELECT
        |    len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS nw,
        |    d.n_chars AS nc,
        |    CAST(length(replace(d.text, ' ', '')) AS DOUBLE) AS nsp,
        |    COALESCE(rep.r, FALSE) AS r
        |  FROM documents d LEFT JOIN rep USING (doc_id)
        |),
        |f AS (
        |  SELECT COUNT(*) AS total,
        |    CAST(SUM(CASE WHEN NOT (nw >= 15) THEN 1 ELSE 0 END) AS BIGINT) AS rm1,
        |    CAST(SUM(CASE WHEN nw >= 15 AND NOT (nc >= 100) THEN 1 ELSE 0 END) AS BIGINT) AS rm2,
        |    CAST(SUM(CASE WHEN nw >= 15 AND nc >= 100 AND NOT (nsp / nw < 4.75)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS rm3,
        |    CAST(SUM(CASE WHEN nw >= 15 AND nc >= 100 AND nsp / nw < 4.75 AND r
        |      THEN 1 ELSE 0 END) AS BIGINT) AS rm4
        |  FROM t
        |)
        |SELECT 0 AS stage, 'input' AS rule, CAST(0 AS BIGINT) AS removed, total AS remaining FROM f
        |UNION ALL SELECT 1, 'min_words', rm1, total - rm1 FROM f
        |UNION ALL SELECT 2, 'min_chars', rm2, total - rm1 - rm2 FROM f
        |UNION ALL SELECT 3, 'avg_word_len', rm3, total - rm1 - rm2 - rm3 FROM f
        |UNION ALL SELECT 4, 'no_repetition', rm4, total - rm1 - rm2 - rm3 - rm4 FROM f
        |ORDER BY stage""".stripMargin,

    // shard = md5 first two hex digits mod 8 (instr haystack-first on
    // both engines); order checksum pins the (shard, hash, id) sequence
    // the Spark side computes via Skew.distributedRowNumber. The sum is
    // reduced mod P once more and emitted BIGINT — DECIMAL(38,0) output
    // hashes representation-sensitively across engines (round-5 lesson).
    "pipeline_shard_output" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars, md5(text) AS h,
        |    CAST(((instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16
        |       + (instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1)) % 8 AS INT)
        |      AS shard_id
        |  FROM documents
        |), r AS (
        |  SELECT *, row_number() OVER (ORDER BY shard_id, h, doc_id) AS rn FROM t)
        |SELECT shard_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
        |  CAST(SUM(CAST(((rn % 2147483647) * (doc_id % 2147483647)) % 2147483647
        |    AS DECIMAL(38,0))) % 2147483647 AS BIGINT) AS order_checksum
        |FROM r GROUP BY shard_id ORDER BY shard_id""".stripMargin,

    // Spark joins xxhash64 gram hashes, the oracle joins gram strings —
    // identical modulo hash collisions (decontaminate's documented rule)
    "text_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 3) u
        |),
        |dfc AS (SELECT gram, COUNT(*) AS df FROM sh GROUP BY gram)
        |SELECT s.doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  round(CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 6) AS novelty
        |FROM sh s JOIN dfc d USING (gram)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // eval coverage: gram construction mirrors pipeline_decontaminate's
    // (same tokenizer, same k=3 window, same doc_id % 50 eval split);
    // counts integer, the one division rounded to 6dp on both engines
    "corpus_eval_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |sh AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 3) u
        |),
        |eg AS (SELECT DISTINCT doc_id, gram FROM sh WHERE doc_id % 50 = 0),
        |tg AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 50 <> 0),
        |cov AS (
        |  SELECT eg.doc_id, COUNT(*) AS n_covered
        |  FROM eg JOIN tg USING (gram) GROUP BY 1),
        |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM eg GROUP BY 1)
        |SELECT tot.doc_id, tot.n_grams,
        |  COALESCE(cov.n_covered, 0) AS n_covered,
        |  round(CAST(COALESCE(cov.n_covered, 0) AS DOUBLE) / tot.n_grams, 6) AS coverage
        |FROM tot LEFT JOIN cov ON tot.doc_id = cov.doc_id
        |ORDER BY tot.doc_id""".stripMargin,

    // KL terms: identical integer operands through identical IEEE double
    // divisions on both engines; per-term 6dp round, DECIMAL sum
    "corpus_lang_drift" ->
      """WITH sl AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
        |src AS (SELECT source, SUM(n) AS ns FROM sl GROUP BY 1),
        |lg AS (SELECT lang, SUM(n) AS nl FROM sl GROUP BY 1),
        |tot AS (SELECT SUM(n) AS nn FROM sl),
        |terms AS (
        |  SELECT sl.source, src.ns,
        |    round((CAST(sl.n AS DOUBLE) / src.ns) *
        |      ln((CAST(sl.n AS DOUBLE) * tot.nn) / (CAST(src.ns AS DOUBLE) * lg.nl)), 6) AS t
        |  FROM sl JOIN src USING (source) JOIN lg USING (lang) CROSS JOIN tot)
        |SELECT source, CAST(MAX(ns) AS BIGINT) AS n_docs,
        |  COUNT(*) AS n_langs,
        |  CAST(SUM(CAST(t AS DECIMAL(38,6))) AS DOUBLE) AS kl_nats
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,

    // curriculum stages: same ntile ordering contract as window_ntile_dense
    "pipeline_curriculum" ->
      """WITH t AS (
        |  SELECT CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS INTEGER) AS stage,
        |    n_chars
        |  FROM documents)
        |SELECT stage, COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
        |  MAX(n_chars) AS max_chars, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM t GROUP BY stage ORDER BY stage""".stripMargin,

    // per-source governance: counts are exact integers; avg_words is the
    // one division, over exact integer sums on both engines
    "corpus_source_profile" ->
      """WITH perdoc AS (
        |  SELECT source, n_chars, lang,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
        |    md5(text) AS h
        |  FROM documents),
        |dup AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS dup_docs FROM (
        |    SELECT source, h, COUNT(*) AS c FROM perdoc GROUP BY 1, 2) t
        |  WHERE c > 1 GROUP BY source),
        |base AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |    COUNT(DISTINCT lang) AS n_langs,
        |    round(avg(n_words), 6) AS avg_words
        |  FROM perdoc GROUP BY source)
        |SELECT b.source, b.n_docs, b.total_chars, b.n_langs, b.avg_words,
        |  COALESCE(d.dup_docs, 0) AS dup_docs
        |FROM base b LEFT JOIN dup d USING (source)
        |ORDER BY source""".stripMargin,

    // one plain per-source window on the oracle side; the Spark plan's
    // over-quota/under-quota split is semantics-preserving because an
    // under-quota source's rows ALL satisfy rn <= quota
    "pipeline_quota_cap" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 20 ORDER BY doc_id""".stripMargin,

    // repeat factor = min(4, ceil(max-source-tokens / source-tokens)),
    // all exact integer arithmetic; generate_series/sequence are both
    // inclusive of the upper bound
    "pipeline_repeat_epochs" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |bys AS (SELECT source, SUM(n_tok) AS toks FROM tok GROUP BY 1),
        |mx AS (SELECT MAX(toks) AS max_toks FROM bys),
        |f AS (
        |  SELECT source,
        |    GREATEST(1, CAST(LEAST(4, (max_toks + GREATEST(toks, 1) - 1)
        |      // GREATEST(toks, 1)) AS BIGINT)) AS n_epochs
        |  FROM bys CROSS JOIN mx)
        |SELECT t.doc_id, t.source, t.n_tok, f.n_epochs,
        |  CAST(unnest(generate_series(1, f.n_epochs)) AS BIGINT) AS epoch
        |FROM tok t JOIN f USING (source)
        |ORDER BY doc_id, epoch""".stripMargin,

    // skip-gram pairs within 2 positions, unordered key "lesser greater";
    // counts stay integer, the single per-row ln is rounded to 6 dp on
    // both engines (text_zipf's float rule); LIMIT under a total order
    // picks the identical top-50 set
    "text_cooccur_pmi" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents),
        |prs AS (
        |  SELECT CASE WHEN w[i] <= w[j] THEN w[i] || ' ' || w[j]
        |              ELSE w[j] || ' ' || w[i] END AS pr
        |  FROM (SELECT doc_id, w, i,
        |          unnest(range(i + 1, least(i + 2, len(w)) + 1)) AS j
        |        FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i
        |              FROM toks) a) b),
        |pc AS (SELECT pr, COUNT(*) AS cnt FROM prs GROUP BY pr),
        |wc AS (SELECT word, COUNT(*) AS wc
        |       FROM (SELECT unnest(w) AS word FROM toks) GROUP BY word),
        |tp AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tp FROM pc),
        |top AS (SELECT pr, cnt FROM pc ORDER BY cnt DESC, pr LIMIT 50)
        |SELECT string_split(pr, ' ')[1] AS w1, string_split(pr, ' ')[2] AS w2,
        |  cnt,
        |  round(ln(CAST(cnt AS DOUBLE) * CAST(tp.tp AS DOUBLE)
        |    / (CAST(c1.wc AS DOUBLE) * CAST(c2.wc AS DOUBLE))), 6) AS pmi
        |FROM top CROSS JOIN tp
        |JOIN wc c1 ON c1.word = string_split(pr, ' ')[1]
        |JOIN wc c2 ON c2.word = string_split(pr, ' ')[2]
        |ORDER BY cnt DESC, w1, w2""".stripMargin,

    // ln terms rounded to 6 dp FIRST, then all products/sums in exact
    // DECIMAL — same order-free float rule as text_entropy
    "text_zipf" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
        |  FROM documents),
        |counts AS (SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word),
        |top AS (SELECT word, cnt FROM counts ORDER BY cnt DESC, word LIMIT 200),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rk FROM top),
        |t AS (SELECT
        |  CAST(round(ln(CAST(rk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |  CAST(round(ln(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
        |  FROM r),
        |s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |  CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
        |  FROM t)
        |SELECT CAST(n AS INT) AS top_n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
        |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4)
        |    AS intercept
        |FROM s""".stripMargin,

    // r15: A-ES weighted reservoir — u from the first 8 md5 hex digits
    // (never 0 via +1), one 6dp-rounded ln re-anchored to integer micro
    // (text_zipf rule), weight division in exact integer nano, NULLS
    // FIRST pinned on the lang order (Spark asc default)
    "sample_reservoir_group" ->
      """WITH s AS (
        |  SELECT lang, doc_id, n_chars,
        |    CAST(CAST(round(ln((CAST(
        |      (instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 268435456
        |      + (instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1) * 16777216
        |      + (instr('0123456789abcdef', substring(md5(text), 3, 1)) - 1) * 1048576
        |      + (instr('0123456789abcdef', substring(md5(text), 4, 1)) - 1) * 65536
        |      + (instr('0123456789abcdef', substring(md5(text), 5, 1)) - 1) * 4096
        |      + (instr('0123456789abcdef', substring(md5(text), 6, 1)) - 1) * 256
        |      + (instr('0123456789abcdef', substring(md5(text), 7, 1)) - 1) * 16
        |      + (instr('0123456789abcdef', substring(md5(text), 8, 1)) - 1)
        |      AS DOUBLE) + 1.0) / 4294967296.0), 6) AS DECIMAL(18,6)) * 1000000
        |      AS BIGINT) AS ln_micro
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, n_chars,
        |    (ln_micro * 1000) // n_chars AS score_nano,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY (ln_micro * 1000) // n_chars DESC, doc_id) AS rk
        |  FROM s)
        |SELECT lang, CAST(rk AS INTEGER) AS rk, doc_id, n_chars,
        |  CAST(score_nano AS BIGINT) AS score_nano
        |FROM r WHERE rk <= 10
        |ORDER BY lang ASC NULLS FIRST, rk""".stripMargin,

    // exact integer inclusion test on the md5 prefix: keep iff
    // u * charBudget < n_chars * 65536 (u = first 4 hex digits)
    "sample_pps" ->
      """SELECT doc_id, n_chars,
        |  round(greatest(CAST(1.0 AS DOUBLE),
        |    2000.0 / CAST(n_chars AS DOUBLE)), 6) AS ht_weight
        |FROM documents
        |WHERE ((instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 4096
        |     + (instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1) * 256
        |     + (instr('0123456789abcdef', substring(md5(text), 3, 1)) - 1) * 16
        |     + (instr('0123456789abcdef', substring(md5(text), 4, 1)) - 1)) * 2000
        |    < n_chars * 65536
        |ORDER BY doc_id""".stripMargin,

    // duplicate-trigram ratio; trigram multiset matches the ngrams expr
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents
        |),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS grams
        |  FROM toks WHERE len(w) >= 3)
        |SELECT doc_id,
        |  CAST(len(grams) AS INTEGER) AS n_grams,
        |  CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct,
        |  1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) AS dup_ratio
        |FROM g ORDER BY doc_id""".stripMargin,

    // top-N vocabulary; the cumsum window runs over the LIMITed rows
    "text_vocab" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
        |  FROM documents),
        |counts AS (SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word),
        |total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts),
        |top AS (SELECT word, cnt FROM counts ORDER BY cnt DESC, word LIMIT 200)
        |SELECT word, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, word) AS INTEGER) AS rank,
        |  CAST(SUM(cnt) OVER (ORDER BY cnt DESC, word
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt,
        |  total
        |FROM top, total ORDER BY rank""".stripMargin,

    // snapshot membership by text equality (engine side: xxhash64 keys)
    "dedup_incremental" ->
      """SELECT doc_id, lang, n_chars FROM documents d
        |WHERE doc_id % 10 >= 7
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents s
        |    WHERE s.doc_id % 10 < 7 AND s.text = d.text)
        |ORDER BY doc_id""".stripMargin,

    // mixture tiers: src0-4 at 75%, src5-9 at 50%, tail at 25%; 4-char
    // lower-hex comparison is numeric comparison
    "sample_mixture" ->
      """SELECT doc_id, source FROM documents
        |WHERE substring(md5(text), 1, 4) <
        |  CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'c000'
        |       WHEN source IN ('src5','src6','src7','src8','src9') THEN '8000'
        |       ELSE '4000' END
        |ORDER BY doc_id""".stripMargin,

    // the corpus-preparation flagship: quality -> exact dedup ->
    // decontaminate (eval grams from the RAW corpus) -> pack, one oracle
    "pipeline_corpus_full" ->
      """WITH q AS (
        |  SELECT doc_id, text
        |  FROM documents
        |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 20
        |),
        |kept AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text,
        |      row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM q) t
        |  WHERE rn = 1
        |),
        |eval_toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents WHERE doc_id % 50 = 0
        |),
        |eval_grams AS (
        |  SELECT DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM (SELECT w, unnest(range(1, len(w) - 1)) AS i
        |        FROM eval_toks WHERE len(w) >= 3) u
        |),
        |train_toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM kept WHERE doc_id % 50 <> 0
        |),
        |train_grams AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM train_toks WHERE len(w) >= 3) u
        |),
        |contaminated AS (
        |  SELECT DISTINCT doc_id FROM train_grams
        |  WHERE gram IN (SELECT gram FROM eval_grams)
        |),
        |survivors AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
        |  FROM kept
        |  WHERE doc_id % 50 <> 0
        |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        |),
        |c AS (
        |  SELECT doc_id, n,
        |    CAST(SUM(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM survivors)
        |SELECT (cum - n) // 512 AS chunk,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS chunk_tokens
        |FROM c GROUP BY 1 ORDER BY chunk""".stripMargin,

    // materializing pack: md5 pins the packed BYTES (in-doc_id-order,
    // EOS-joined), so the oracle checks the real trainer payload
    "pipeline_pack_text" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, n,
        |    CAST(SUM(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM t),
        |p AS (
        |  SELECT (cum - n) // 512 AS chunk,
        |    COUNT(*) AS n_docs,
        |    CAST(SUM(n) AS BIGINT) AS chunk_tokens,
        |    string_agg(text, '<|eos|>' ORDER BY doc_id) AS packed
        |  FROM c GROUP BY 1)
        |SELECT chunk, n_docs, chunk_tokens,
        |  CAST(length(packed) AS INTEGER) AS packed_len,
        |  md5(packed) AS packed_md5
        |FROM p ORDER BY chunk""".stripMargin,

    "corpus_stats" ->
      """SELECT COUNT(*) AS n_docs,
        |  COUNT(DISTINCT text) AS n_unique_texts,
        |  COUNT(*) - COUNT(DISTINCT text) AS n_exact_dups,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  COUNT(DISTINCT source) AS n_sources,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS total_tokens,
        |  CAST(MIN(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS INTEGER) AS min_tokens,
        |  CAST(MAX(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS INTEGER) AS max_tokens,
        |  CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
        |FROM documents""".stripMargin,

    // the gate: strictly above the exact interpolated median word count
    "filter_quality_quantile" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INTEGER) AS n_words
        |  FROM documents),
        |m AS (SELECT quantile_cont(n_words, 0.5) AS med FROM t)
        |SELECT doc_id, n_words FROM t, m
        |WHERE n_words > med ORDER BY doc_id""".stripMargin,

    // BM25: identical literal constants + expression tree in both
    // engines; per-term contribution rounds to integer micro-units
    // before the per-doc sum (order-free), ln behind the 1e-6 rounding
    // per the fn_math precedent
    "retrieval_bm25" ->
      """WITH dls AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS dl
        |  FROM documents),
        |stats AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        |  FROM dls),
        |toks AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS dl,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, dl, COUNT(*) AS tf FROM toks
        |  WHERE term IN ('spark', 'join', 'vector', 'stream', 'window')
        |  GROUP BY 1, 2, 3),
        |dfs AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |contrib AS (
        |  SELECT tf.doc_id,
        |    CAST(round(ln(1.0 + ((n - df) + 0.5) / (df + 0.5)) *
        |      ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))) *
        |      1000000.0) AS BIGINT) AS contrib_u
        |  FROM tf JOIN dfs USING (term) CROSS JOIN stats)
        |SELECT doc_id, COUNT(*) AS n_terms,
        |  CAST(SUM(contrib_u) AS BIGINT) AS score_micro
        |FROM contrib GROUP BY doc_id
        |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,

    // both retriever CTEs are the audited bm25/cosine oracle bodies at
    // kEach=20; ranks assigned over the k-row retrieval outputs, each
    // RRF term an explicit DOUBLE division (DuckDB's bare 1.0 literal
    // is DECIMAL — cast, or the fusion arithmetic diverges)
    "retrieval_hybrid_rrf" ->
      """WITH dls AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS dl
        |  FROM documents),
        |stats AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        |  FROM dls),
        |toks AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS dl,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, dl, COUNT(*) AS tf FROM toks
        |  WHERE term IN ('spark', 'join', 'vector', 'stream', 'window')
        |  GROUP BY 1, 2, 3),
        |dfs AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |contrib AS (
        |  SELECT tf.doc_id,
        |    CAST(round(ln(1.0 + ((n - df) + 0.5) / (df + 0.5)) *
        |      ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))) *
        |      1000000.0) AS BIGINT) AS contrib_u
        |  FROM tf JOIN dfs USING (term) CROSS JOIN stats),
        |bm AS (
        |  SELECT doc_id, CAST(SUM(contrib_u) AS BIGINT) AS score_micro
        |  FROM contrib GROUP BY doc_id
        |  ORDER BY score_micro DESC, doc_id LIMIT 20),
        |sparse AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id)
        |    AS bm25_rank FROM bm),
        |p AS (SELECT CAST(embedding AS DOUBLE[]) AS probe
        |      FROM embeddings WHERE vec_id = 0),
        |c AS (
        |  SELECT vec_id,
        |    list_dot_product(CAST(embedding AS DOUBLE[]), probe)
        |      / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(probe, probe))) AS rawcos
        |  FROM embeddings, p),
        |dn AS (
        |  SELECT vec_id, round(rawcos, 6) AS cos FROM c
        |  ORDER BY rawcos DESC, vec_id LIMIT 20),
        |dense AS (
        |  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY cos DESC, vec_id)
        |    AS dense_rank FROM dn),
        |f AS (
        |  SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
        |    CAST(s.bm25_rank AS BIGINT) AS bm25_rank,
        |    CAST(d.dense_rank AS BIGINT) AS dense_rank,
        |    COALESCE(CAST(1.0 AS DOUBLE) / (60 + s.bm25_rank), CAST(0.0 AS DOUBLE))
        |      + COALESCE(CAST(1.0 AS DOUBLE) / (60 + d.dense_rank), CAST(0.0 AS DOUBLE))
        |      AS rrf_raw
        |  FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id)
        |SELECT doc_id, bm25_rank, dense_rank, round(rrf_raw, 6) AS rrf
        |FROM f ORDER BY rrf_raw DESC, doc_id LIMIT 10""".stripMargin,

    // sliding-window chunker: md5 content-addresses each chunk's joined
    // text, so the oracle checks chunk CONTENT, not just counts
    "pipeline_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks, len(toks) AS n, unnest(range(0, len(toks), 48)) AS start
        |  FROM t WHERE len(toks) > 0)
        |SELECT doc_id,
        |  start // 48 AS chunk_id,
        |  start,
        |  least(64, n - start) AS chunk_tokens,
        |  md5(array_to_string(list_slice(toks, start + 1, start + 64), ' ')) AS chunk_md5
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    // Rabin-Karp fingerprints are plain codepoint arithmetic: the SQL
    // fold (ord + list_reduce, same 31/33/P constants) replays the
    // compiled kernel exactly
    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(5381 AS BIGINT),
        |    list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
        |      wd -> list_reduce(list_prepend(CAST(7 AS BIGINT),
        |              list_transform(string_split_regex(wd, ''), c -> CAST(ord(c) AS BIGINT))),
        |            (a, c) -> (a * 31 + c) % 2147483647))),
        |    (h, wh) -> (h * 33 + wh) % 2147483647) AS fingerprint,
        |  list_reduce(list_prepend(CAST(7 AS BIGINT),
        |    list_transform(string_split_regex(text, ''), c2 -> CAST(ord(c2) AS BIGINT))),
        |    (a2, c3) -> (a2 * 31 + c3) % 2147483647) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Bloom shard pre-filter (r14 flip from no-oracle): the key is the
    // packed 62-bit Rabin pair (chars·2³¹ + words — the same codepoint
    // polynomials text_fingerprint replays), so the oracle rebuilds the
    // corpus's Kirsch–Mitzenmacher bit-position set and replays every
    // probe: maybe_dup = all k=5 positions present. Must track
    // bloomShardFlags' defaults (bitsLog2=20 → mask 1048575, k=5).
    "dedup_bloom_shard" ->
      """WITH keys AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(7 AS BIGINT),
        |      list_transform(string_split_regex(text, ''), c2 -> CAST(ord(c2) AS BIGINT))),
        |      (a2, c3) -> (a2 * 31 + c3) % 2147483647) * 2147483648
        |    + list_reduce(list_prepend(CAST(5381 AS BIGINT),
        |        list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
        |          wd -> list_reduce(list_prepend(CAST(7 AS BIGINT),
        |                  list_transform(string_split_regex(wd, ''), c -> CAST(ord(c) AS BIGINT))),
        |                (a, c) -> (a * 31 + c) % 2147483647))),
        |        (h, wh) -> (h * 33 + wh) % 2147483647) AS key
        |  FROM documents),
        |probes AS (
        |  SELECT k.doc_id,
        |    ((k.key & 4611686018427387903) + i.i * ((k.key >> 32) | 1)) & 1048575 AS pos
        |  FROM keys k CROSS JOIN (SELECT unnest(range(5)) AS i) i),
        |cpos AS (SELECT DISTINCT pos FROM probes WHERE doc_id % 2 = 0)
        |SELECT p.doc_id, CAST(count(c.pos) = 5 AS INT) AS maybe_dup
        |FROM probes p LEFT JOIN cpos c ON p.pos = c.pos
        |WHERE p.doc_id % 2 = 1
        |GROUP BY p.doc_id
        |ORDER BY p.doc_id""".stripMargin,

    // sign-LSH queries: "approximate" only in recall — results are fully
    // deterministic (pure-function hyperplanes), so the generated SQL
    // (same inlined coefficients, OracleGen) checks them exactly
    // simhash queries: the token hash is a codepoint polynomial chosen so
    // the generated SQL (same pinned mixer constants, OracleGen) checks
    // fingerprints and banded Hamming pairs exactly
    "dedup_simhash" -> OracleGen.simhashSql(),
    // minhash queries: shingle hash, lane mixes, and band keys are all
    // mod-P integer arithmetic with pinned constants — generated SQL
    // replays the full LSH pipeline exactly (round 5: 2 more of the
    // no-oracle family flip to hash-oracled)
    "dedup_near_minhash" -> OracleGen.nearMinhashSql(),
    // r17: the incremental fold is checked against the FULL-PIPELINE
    // REBUILD — the same generated SQL as dedup_near_minhash — so the
    // driver's hash match IS the append ≡ rebuild proof
    "dedup_minhash_incr" -> OracleGen.nearMinhashSql(),
    "dedup_minhash_calibration" -> OracleGen.minhashCalibrationSql(),
    "dedup_minhash_clusters" -> OracleGen.minhashClustersSql(),
    "corpus_dup_hist" -> OracleGen.clusterSizeHistSql(),
    "dedup_simhash_pairs" -> OracleGen.simhashPairsSql(),
    "sim_ann_lsh" -> OracleGen.simAnnLshSql(),
    "sim_ann_lsh_batch" -> OracleGen.simAnnLshBatchSql(),
    "dedup_near_embedding" -> OracleGen.nearDupEmbeddingSql(),
    "dedup_embedding_clusters" -> OracleGen.embeddingClustersSql(),
    // r12: the BPE trainer/apply pair unrolled into plain SQL — each
    // iteration's winning pair is COMPUTED by DuckDB (argmax + the
    // replace()-as-leftmost-merge device), not baked in as a learned
    // literal, so the tokenizer family is cross-engine checked
    "pipeline_bpe_merges" -> OracleGen.bpeMergesSql(),
    "pipeline_bpe_apply" -> OracleGen.bpeApplySql(),

    // the oracle is the PLAIN join: salting must not change the result
    "join_skew_salted" ->
      """SELECT o_orderstatus, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // the synthetic payload ("IMG0" + text, UTF-8) is column-expressible,
    // so the byte accounting oracles exactly; strlen = UTF-8 bytes
    "multimodal_stats" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  COUNT(*) AS n,
        |  CAST(SUM(4 + strlen(text)) AS BIGINT) AS total_bytes,
        |  CAST(SUM(n_chars % 640 + 32) AS BIGINT) AS sum_width,
        |  CAST(SUM(n_chars % 480 + 32) AS BIGINT) AS sum_height
        |FROM documents GROUP BY 1 ORDER BY format""".stripMargin,

    "fn_map" ->
      """WITH m AS (
        |  SELECT event_id,
        |    MAP(['type','k'], [event_type, json_extract_string(props, '$.k')]) AS m
        |  FROM events)
        |SELECT event_id,
        |  m['type'][1] AS m_type,
        |  CAST(m['k'][1] AS BIGINT) AS m_k,
        |  CAST(cardinality(m) AS INTEGER) AS n_keys
        |FROM m ORDER BY event_id""".stripMargin,

    // dense hour spine per type + LOCF; casts to µs TIMESTAMP so
    // generate_series and epoch agree with Spark's truncation
    "ts_gapfill" ->
      """WITH hourly AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT event_type, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1),
        |spine AS (
        |  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |  FROM r),
        |j AS (
        |  SELECT s.event_type, s.h, hourly.n
        |  FROM spine s LEFT JOIN hourly ON s.event_type = hourly.event_type AND s.h = hourly.h)
        |SELECT event_type, CAST(epoch(h) AS BIGINT) AS hour_s, n,
        |  last_value(n IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_filled
        |FROM j ORDER BY event_type, hour_s""".stripMargin,

    // the single global sweep window — proves the Spark side's
    // slice-and-stitch rewrite is semantics-preserving. −1 sorts before
    // +1 at equal t (end-exclusive windows); DuckDB integer window sums
    // are HUGEINT, hence the final BIGINT cast.
    "ts_concurrency" ->
      """WITH d AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t, 1 AS dd
        |  FROM events WHERE ts IS NOT NULL
        |  UNION ALL
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) + 600, -1
        |  FROM events WHERE ts IS NOT NULL
        |), c AS (
        |  SELECT event_type,
        |    SUM(dd) OVER (PARTITION BY event_type ORDER BY t, dd
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
        |  FROM d
        |), p AS (
        |  SELECT event_type, CAST(MAX(cur) AS BIGINT) AS peak_concurrency
        |  FROM c GROUP BY event_type
        |), n AS (
        |  SELECT event_type, COUNT(*) AS n_intervals
        |  FROM events WHERE ts IS NOT NULL GROUP BY event_type
        |)
        |SELECT n.event_type, n.n_intervals, p.peak_concurrency
        |FROM n JOIN p USING (event_type) ORDER BY event_type""".stripMargin,

    // the z-test replayed as the same exact integer inequality —
    // (n·H − S)² > k²·(H·Q − S²) — in HUGEINT (DuckDB's BIGINT products
    // would overflow-error exactly where Spark's longs would wrap; both
    // sides use wide integers instead)
    "ts_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type,
        |    CAST(COUNT(*) AS HUGEINT) AS hrs,
        |    CAST(SUM(n) AS HUGEINT) AS sm,
        |    CAST(SUM(n * n) AS HUGEINT) AS q
        |  FROM hourly GROUP BY 1)
        |SELECT h.event_type, CAST(epoch(h.h) AS BIGINT) AS hour_s, h.n
        |FROM hourly h JOIN s USING (event_type)
        |WHERE (CAST(h.n AS HUGEINT) * s.hrs - s.sm)
        |      * (CAST(h.n AS HUGEINT) * s.hrs - s.sm)
        |      > 9 * (s.hrs * s.q - s.sm * s.sm)
        |ORDER BY event_type, hour_s""".stripMargin,

    // H-scaled deviations keep numerator and denominator exact integers
    // (HUGEINT here, DECIMAL(38,0) on the Spark side); lag partners
    // align on h + 24 HOURS so gaps drop pairs, never misalign
    "ts_autocorr" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS hh,
        |    CAST(SUM(n) AS HUGEINT) AS s
        |  FROM hourly GROUP BY 1),
        |dev AS (
        |  SELECT h.event_type, h.h, CAST(h.n AS HUGEINT) * st.hh - st.s AS d
        |  FROM hourly h JOIN st USING (event_type)),
        |den AS (SELECT event_type, SUM(d * d) AS den FROM dev GROUP BY 1),
        |num AS (
        |  SELECT a.event_type, COUNT(*) AS n_pairs, SUM(a.d * b.d) AS num
        |  FROM dev a JOIN dev b
        |    ON a.event_type = b.event_type AND b.h = a.h + INTERVAL 24 HOURS
        |  GROUP BY 1)
        |SELECT n.event_type, n.n_pairs,
        |  round(CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE), 6) AS autocorr
        |FROM num n JOIN den d USING (event_type)
        |WHERE d.den > 0 ORDER BY event_type""".stripMargin,

    // hour() on both engines is the UTC clock hour (session TZ pinned)
    "ts_seasonality" ->
      """WITH byhod AS (
        |  SELECT event_type, CAST(hour(ts) AS INT) AS hod, COUNT(*) AS n_events
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS tot
        |        FROM byhod GROUP BY 1)
        |SELECT b.event_type, b.hod, b.n_events,
        |  round(CAST(b.n_events AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share
        |FROM byhod b JOIN tot t USING (event_type)
        |ORDER BY event_type, hod""".stripMargin,

    // argmax over |s/i − (tot−s)/(H−i)|: exact-integer operands through
    // identical IEEE double divisions on both engines, so the unrounded
    // ordering (ties → earliest hour) is cross-engine stable; output
    // means are rounded for display only
    "ts_changepoint" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |pos AS (
        |  SELECT event_type, h, n,
        |    row_number() OVER w AS i,
        |    CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY h)),
        |st AS (SELECT event_type, COUNT(*) AS hh, CAST(SUM(n) AS BIGINT) AS tot
        |       FROM hourly GROUP BY 1),
        |scored AS (
        |  SELECT p.event_type, p.h, p.i, st.hh, p.s, st.tot,
        |    abs(CAST(p.s AS DOUBLE) / CAST(p.i AS DOUBLE)
        |      - CAST(st.tot - p.s AS DOUBLE) / CAST(st.hh - p.i AS DOUBLE)) AS shift_raw
        |  FROM pos p JOIN st USING (event_type)
        |  WHERE p.i < st.hh),
        |best AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY shift_raw DESC, h) AS rk
        |  FROM scored)
        |SELECT event_type,
        |  CAST(epoch(h) AS BIGINT) AS split_hour_s,
        |  CAST(i AS BIGINT) AS hours_before,
        |  CAST(hh - i AS BIGINT) AS hours_after,
        |  round(CAST(s AS DOUBLE) / CAST(i AS DOUBLE), 6) AS mean_before,
        |  round(CAST(tot - s AS DOUBLE) / CAST(hh - i AS DOUBLE), 6) AS mean_after,
        |  round(shift_raw, 6) AS shift
        |FROM best WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // gap cut + running sum share one (user, s, event_id) window sort;
    // epoch-second integers end to end
    "ts_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |m AS (
        |  SELECT *, CASE WHEN lag(s) OVER w IS NULL
        |    OR s - lag(s) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id))
        |SELECT user_id, event_id, s,
        |  CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY s, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM m ORDER BY user_id, s, event_id""".stripMargin,

    // trailing 24h RANGE frame on epoch seconds over the hourly pre-agg
    "ts_rolling" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
        |    COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, hour_s, n,
        |  CAST(SUM(n) OVER w AS BIGINT) AS n_24h,
        |  COUNT(n) OVER w AS hours_present_24h
        |FROM hourly
        |WINDOW w AS (PARTITION BY event_type ORDER BY hour_s
        |  RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, hour_s""".stripMargin,

    // raw power sums in HUGEINT (DECIMAL(38,0) Spark-side), then ONE
    // mirrored double expression for the central moments, 6dp
    "ts_moments" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, COUNT(*) AS hrs,
        |    SUM(CAST(n AS HUGEINT)) AS s1,
        |    SUM(CAST(n AS HUGEINT) * n) AS s2,
        |    SUM(CAST(n AS HUGEINT) * n * n) AS s3,
        |    SUM(CAST(n AS HUGEINT) * n * n * n) AS s4
        |  FROM hourly GROUP BY 1),
        |d AS (
        |  SELECT event_type, hrs,
        |    CAST(s1 AS DOUBLE) / CAST(hrs AS DOUBLE) AS p1,
        |    CAST(s2 AS DOUBLE) / CAST(hrs AS DOUBLE) AS p2,
        |    CAST(s3 AS DOUBLE) / CAST(hrs AS DOUBLE) AS p3,
        |    CAST(s4 AS DOUBLE) / CAST(hrs AS DOUBLE) AS p4
        |  FROM s),
        |m AS (
        |  SELECT event_type, hrs, p1,
        |    p2 - p1 * p1 AS m2,
        |    p3 - 3.0 * p1 * p2 + 2.0 * p1 * p1 * p1 AS m3,
        |    p4 - 4.0 * p1 * p3 + 6.0 * p1 * p1 * p2
        |      - 3.0 * p1 * p1 * p1 * p1 AS m4
        |  FROM d)
        |SELECT event_type, hrs,
        |  round(p1, 6) AS mean_n,
        |  round(m2, 6) AS var_n,
        |  round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
        |  round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis_excess
        |FROM m WHERE m2 > 0.0 ORDER BY event_type""".stripMargin,

    // lower medians of integers at row ceil(H/2) — the whole flag
    // inequality |n − med| > 3·MAD stays in integer arithmetic; median
    // sorts tie-break on hour_s so both engines pick the same element
    "ts_mad_outliers" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
        |    COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, n AS med FROM (
        |    SELECT event_type, n,
        |      row_number() OVER (PARTITION BY event_type ORDER BY n, hour_s) AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS hh
        |    FROM hourly) t
        |  WHERE rn = (hh + 1) // 2),
        |dev AS (
        |  SELECT h.event_type, h.hour_s, h.n, m.med,
        |    abs(h.n - m.med) AS adev
        |  FROM hourly h JOIN m USING (event_type)),
        |mad AS (
        |  SELECT event_type, adev AS mad FROM (
        |    SELECT event_type, adev,
        |      row_number() OVER (PARTITION BY event_type ORDER BY adev, hour_s) AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS hh
        |    FROM dev) t
        |  WHERE rn = (hh + 1) // 2)
        |SELECT d.event_type, d.hour_s, d.n, d.med, d.mad
        |FROM (SELECT dev.*, mad.mad FROM dev JOIN mad USING (event_type)) d
        |WHERE d.adev > 3 * d.mad
        |ORDER BY event_type, hour_s""".stripMargin,

    // cohort day = exact integer floor-division of epoch seconds; cohort
    // size read from the offset-0 cell via a window (no extra join)
    "ts_retention" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1),
        |cells AS (
        |  SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
        |    COUNT(*) AS n_active
        |  FROM e JOIN c USING (user_id) GROUP BY 1, 2),
        |sized AS (
        |  SELECT *, MAX(CASE WHEN day_offset = 0 THEN n_active END)
        |    OVER (PARTITION BY cohort_day) AS cohort_size
        |  FROM cells)
        |SELECT cohort_day, day_offset, n_active, cohort_size,
        |  round(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE), 6)
        |    AS retained_share
        |FROM sized ORDER BY cohort_day, day_offset""".stripMargin,

    // each step = first qualifying event at-or-after the previous step's
    // time within the 24h budget; epoch-second integers end to end
    "ts_funnel_steps" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |s1 AS (SELECT user_id, MIN(s) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.s) AS t
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click'
        |         AND e.s >= s1.t AND e.s <= s1.t + 86400 GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.s) AS t
        |       FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase'
        |         AND e.s >= s2.t AND e.s <= s2.t + 86400 GROUP BY 1),
        |u AS (
        |  SELECT 1 AS step, 'view' AS step_name, user_id FROM s1
        |  UNION ALL SELECT 2, 'click', user_id FROM s2
        |  UNION ALL SELECT 3, 'purchase', user_id FROM s3),
        |counts AS (SELECT step, step_name, COUNT(*) AS n_users
        |           FROM u GROUP BY 1, 2),
        |sized AS (SELECT *, MAX(CASE WHEN step = 1 THEN n_users END)
        |            OVER () AS entered FROM counts)
        |SELECT CAST(step AS BIGINT) AS step, step_name, n_users,
        |  round(CAST(n_users AS DOUBLE) / CAST(entered AS DOUBLE), 6)
        |    AS conversion
        |FROM sized ORDER BY step""".stripMargin,

    "stream_tumbling_batch" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start_s,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events WHERE ts IS NOT NULL GROUP BY 1 ORDER BY hour_start_s""".stripMargin,

    "stream_sliding_batch" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes') AS BIGINT) AS slot_s,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events, (SELECT unnest(range(0, 4)) AS k) k
        |WHERE ts IS NOT NULL
        |GROUP BY 1 ORDER BY slot_s""".stripMargin,

    "stream_session_batch" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts, 1) OVER w IS NULL
        |           OR (CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |               - CAST(epoch(date_trunc('second', lag(ts, 1) OVER w)) AS BIGINT)) > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM flagged
        |)
        |SELECT user_id, sess_id,
        |  CAST(min(epoch(date_trunc('second', ts))) AS BIGINT) AS session_start_s,
        |  COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,

    // --- round-10 wave ---

    // degree histogram of the bipartite purchase graph; share in exact
    // integer micro-units (BIGINT both engines)
    "graph_degree_stats" ->
      """WITH co AS (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |deg AS (
        |  SELECT node_type, node, COUNT(*) AS degree FROM (
        |    SELECT 'customer' AS node_type, cust AS node FROM co
        |    UNION ALL SELECT 'supplier', supp FROM co) t GROUP BY 1, 2),
        |hist AS (SELECT node_type, degree, COUNT(*) AS n_nodes
        |         FROM deg GROUP BY 1, 2),
        |tot AS (SELECT node_type,
        |          CAST(SUM(degree * n_nodes) AS BIGINT) AS side_endpoints
        |        FROM hist GROUP BY 1)
        |SELECT h.node_type, h.degree, h.n_nodes,
        |  h.degree * h.n_nodes * 1000000 // t.side_endpoints
        |    AS endpoint_share_micro
        |FROM hist h JOIN tot t USING (node_type)
        |ORDER BY node_type, degree""".stripMargin,

    // degree-ordered oriented triangle census on the support>=2 part
    // co-purchase (market-basket) graph; every quantity an exact integer
    "graph_triangles" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS a, b.l_partkey AS b
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2),
        |deg AS (SELECT n, COUNT(*) AS d FROM (
        |    SELECT a AS n FROM e UNION ALL SELECT b FROM e) t GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
        |              THEN e.a ELSE e.b END AS u,
        |         CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
        |              THEN e.b ELSE e.a END AS v
        |  FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b),
        |wed AS (SELECT o1.u, o1.v AS v, o2.v AS w
        |        FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.v < o2.v),
        |canon AS (SELECT LEAST(u, v) AS v, GREATEST(u, v) AS w FROM o),
        |tri AS (SELECT COUNT(*) AS t FROM wed
        |        WHERE EXISTS (SELECT 1 FROM canon c
        |                      WHERE c.v = wed.v AND c.w = wed.w)),
        |nw AS (SELECT CAST(COALESCE(SUM(d * (d - 1) // 2), 0) AS BIGINT)
        |         AS n_wedges FROM deg)
        |SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
        |  (SELECT COUNT(*) FROM o) AS n_edges,
        |  (SELECT n_wedges FROM nw) AS n_wedges,
        |  (SELECT t FROM tri) AS n_triangles,
        |  3 * (SELECT t FROM tri) * 1000000
        |    // GREATEST((SELECT n_wedges FROM nw), 1) AS clustering_micro""".stripMargin,

    // exact disc percentiles: integer-exact target ranks, unique
    // (value, event_id) order, so both engines select the same element
    "agg_percentiles_exact" ->
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn
        |  FROM events),
        |n AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1)
        |SELECT r.event_type, n.n,
        |  MAX(CASE WHEN rn = (n + 1) // 2 THEN ROUND(value, 6) END) AS p50,
        |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN ROUND(value, 6) END) AS p90,
        |  MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN ROUND(value, 6) END) AS p99
        |FROM r JOIN n USING (event_type)
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // lagged Pearson over the dense hourly spine; integer sufficient
    // statistics, one mirrored double quotient
    "ts_cross_corr" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS BIGINT) AS hs,
        |    COUNT(*) AS n
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IN ('view', 'click')
        |  GROUP BY 1, 2),
        |b AS (SELECT MIN(hs) AS lo, MAX(hs) AS hi FROM hourly),
        |spine AS (SELECT CAST(unnest(generate_series(lo, hi, 3600)) AS BIGINT) AS hs
        |          FROM b),
        |x AS (SELECT s.hs, COALESCE(h.n, 0) AS cx FROM spine s
        |      LEFT JOIN hourly h ON h.event_type = 'view' AND h.hs = s.hs),
        |y AS (SELECT s.hs, COALESCE(h.n, 0) AS cy FROM spine s
        |      LEFT JOIN hourly h ON h.event_type = 'click' AND h.hs = s.hs),
        |lags AS (SELECT CAST(unnest(generate_series(0, 12)) AS INTEGER) AS lag),
        |agg AS (
        |  SELECT lag, COUNT(*) AS n,
        |    CAST(SUM(cx) AS BIGINT) AS sx, CAST(SUM(cy) AS BIGINT) AS sy,
        |    CAST(SUM(cx * cy) AS BIGINT) AS sxy,
        |    CAST(SUM(cx * cx) AS BIGINT) AS sxx,
        |    CAST(SUM(cy * cy) AS BIGINT) AS syy
        |  FROM x CROSS JOIN lags JOIN y ON x.hs + lag * 3600 = y.hs
        |  GROUP BY 1)
        |SELECT lag, n,
        |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |           sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0), 6) AS corr
        |FROM agg ORDER BY lag""".stripMargin,

    // augmented-vector pair sums in exact integer units: elements
    // quantized ONCE to BIGINT 10^-7 units, pair products exact BIGINT
    // (HUGEINT sums), cov_micro = exact integer floor-division — no
    // doubles anywhere, so no -0.0/representation divergence (the r10
    // driver hash fail). Mirrors VectorOps.covariance value-for-value;
    // DuckDB's native HUGEINT replaces the Spark side's hi/lo split.
    "emb_covariance" ->
      """WITH q AS (
        |  SELECT list_concat([CAST(10000000 AS BIGINT)],
        |    list_transform(embedding, x ->
        |      CAST(CAST(ROUND(CAST(x AS DOUBLE), 7) AS DECIMAL(18,7))
        |           * 10000000 AS BIGINT))) AS q
        |  FROM embeddings),
        |idx AS (SELECT CAST(unnest(generate_series(0, 64)) AS INTEGER) AS k),
        |sums AS (
        |  SELECT ia.k AS ia, ib.k AS ib,
        |    SUM(CAST(q[ia.k + 1] * q[ib.k + 1] AS HUGEINT)) AS sp,
        |    COUNT(*) AS n
        |  FROM q CROSS JOIN idx ia CROSS JOIN idx ib
        |  WHERE ib.k >= ia.k
        |  GROUP BY 1, 2),
        |d AS (SELECT ib - 1 AS d, sp // 10000000 AS s7
        |      FROM sums WHERE ia = 0 AND ib > 0),
        |nd AS (
        |  SELECT s.ia - 1 AS i, s.ib - 1 AS j,
        |    CAST(s.n AS HUGEINT) * s.sp
        |      - CAST(di.s7 AS HUGEINT) * dj.s7 AS num,
        |    CAST(s.n AS HUGEINT) * s.n * 100000000 AS den
        |  FROM sums s
        |  JOIN d di ON di.d = s.ia - 1
        |  JOIN d dj ON dj.d = s.ib - 1
        |  WHERE s.ia > 0)
        |SELECT i, j,
        |  CAST((num - ((num % den + den) % den)) // den AS BIGINT)
        |    AS cov_micro
        |FROM nd ORDER BY i, j""".stripMargin,

    // pure composition of the two deterministic retrievers' own oracles
    "retrieval_recall_at_k" ->
      (s"""WITH exact AS (SELECT * FROM (
          |${simBatchTopkSql}
          |) t),
          |ann AS (SELECT * FROM (
          |${OracleGen.simAnnLshBatchSql()}
          |) t)
          |SELECT e.probe_id,
          |  COUNT(*) AS n_exact,
          |  COUNT(a.vec_id) AS n_hit,
          |  COUNT(a.vec_id) * 1000000 // COUNT(*) AS recall_micro
          |FROM exact e LEFT JOIN ann a
          |  ON a.probe_id = e.probe_id AND a.vec_id = e.vec_id
          |GROUP BY 1 ORDER BY 1""".stripMargin),

    // same composition device as recall_at_k; the discount weights are
    // the SAME integer literals the Spark plan ships (ndcgDiscountMicro)
    "retrieval_ndcg" -> {
      val wts = operators.RetrievalOps.ndcgDiscountMicro(10)
        .map { case (i, w) => s"($i, $w)" }
        .mkString(", ")
      val idcg = operators.RetrievalOps.idcgMicro(10)
      s"""WITH exact AS (SELECT * FROM (
         |${simBatchTopkSql}
         |) t),
         |ann AS (SELECT * FROM (
         |${OracleGen.simAnnLshBatchSql()}
         |) t),
         |wts(rn, w) AS (VALUES $wts),
         |rel AS (
         |  SELECT a.probe_id, a.rn, COALESCE(11 - e.rn, 0) AS rel
         |  FROM ann a LEFT JOIN exact e
         |    ON a.probe_id = e.probe_id AND a.vec_id = e.vec_id)
         |SELECT probe_id,
         |  CAST(SUM(rel * w) AS BIGINT) AS dcg_units,
         |  CAST($idcg AS BIGINT) AS idcg_units,
         |  CAST(SUM(rel * w) * 1000000 // $idcg AS BIGINT) AS ndcg_micro
         |FROM rel JOIN wts USING (rn)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "retrieval_mrr" ->
      (s"""WITH exact AS (SELECT * FROM (
          |${simBatchTopkSql}
          |) t),
          |ann AS (SELECT * FROM (
          |${OracleGen.simAnnLshBatchSql()}
          |) t),
          |fh AS (
          |  SELECT a.probe_id, MIN(CASE WHEN e.vec_id IS NOT NULL
          |    THEN a.rn END) AS fh
          |  FROM ann a LEFT JOIN exact e
          |    ON a.probe_id = e.probe_id AND a.vec_id = e.vec_id
          |  GROUP BY 1)
          |SELECT probe_id,
          |  CAST(COALESCE(fh, 0) AS BIGINT) AS first_hit_rank,
          |  CAST(COALESCE(1000000 // fh, 0) AS BIGINT) AS rr_micro
          |FROM fh ORDER BY 1""".stripMargin),

    // truncated EWMA over the dense per-type spine; the weight literals
    // come from the SAME ewmaWeights call the Spark plan uses (pow
    // differs across libm in the last ulp — shipping identical decimal
    // strings to both engines removes the only cross-engine float)
    "ts_ewma" -> {
      val wvals = operators.StreamBatchOps.ewmaWeights(24, 0.25)
        .map { case (k, w) => s"($k, CAST('$w' AS DECIMAL(18,7)))" }
        .mkString(", ")
      s"""WITH hourly AS (
         |  SELECT event_type,
         |    CAST(epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS BIGINT) AS hs,
         |    COUNT(*) AS n
         |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
         |r AS (SELECT event_type, MIN(hs) AS lo, MAX(hs) AS hi
         |      FROM hourly GROUP BY 1),
         |spine AS (SELECT event_type,
         |            CAST(unnest(generate_series(lo, hi, 3600)) AS BIGINT) AS hs
         |          FROM r),
         |f AS (SELECT s.event_type, s.hs, COALESCE(h.n, 0) AS c
         |      FROM spine s LEFT JOIN hourly h USING (event_type, hs)),
         |wt(k, w) AS (VALUES $wvals),
         |agg AS (
         |  SELECT event_type, f.hs + k * 3600 AS hs,
         |    CAST(SUM(w * CAST(c AS DECIMAL(12,0))) AS DECIMAL(28,7)) AS s,
         |    COUNT(*) AS terms
         |  FROM f CROSS JOIN wt GROUP BY 1, 2)
         |SELECT event_type, hs AS hour_s,
         |  CAST(FLOOR(s * 1000000) AS BIGINT) AS ewma_micro
         |FROM agg WHERE terms = 24 ORDER BY event_type, hour_s""".stripMargin
    },

    // 64-token bucket histogram + cumulative shares in micro units
    "corpus_seqlen_hist" ->
      """WITH tok AS (
        |  SELECT CAST(len(list_filter(string_split(lower(text), ' '),
        |    x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |b AS (SELECT n_tok // 64 AS bucket, COUNT(*) AS n_docs,
        |        CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |      FROM tok GROUP BY 1),
        |c AS (SELECT bucket, n_docs, n_tokens,
        |  CAST(SUM(n_docs) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cd,
        |  CAST(SUM(n_tokens) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ct
        |  FROM b),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS td,
        |        CAST(SUM(n_tokens) AS BIGINT) AS tt FROM b)
        |SELECT bucket, n_docs, n_tokens,
        |  cd * 1000000 // td AS cum_doc_share_micro,
        |  ct * 1000000 // tt AS cum_token_share_micro
        |FROM c CROSS JOIN t ORDER BY bucket""".stripMargin,

    // composes the langid oracle + a doc_id join (the Spark side scores
    // inline to keep one corpus scan; same result)
    "corpus_langid_confusion" ->
      (s"""WITH pred AS (SELECT * FROM (
          |$langIdOracleSql
          |) t),
          |cell AS (
          |  SELECT d.lang, p.pred_lang, COUNT(*) AS n
          |  FROM pred p JOIN documents d USING (doc_id)
          |  GROUP BY 1, 2),
          |tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS lang_total
          |        FROM cell GROUP BY 1)
          |SELECT c.lang, c.pred_lang, c.n,
          |  c.n * 1000000 // t.lang_total AS lang_share_micro
          |FROM cell c JOIN tot t USING (lang)
          |ORDER BY 1, 2""".stripMargin),

    // ---- round-11 wave ----

    // the same min-reachable-node labels the Spark pointer-jump loop
    // converges to, replayed as a recursive reachability CTE over the
    // support-thresholded co-purchase projection (the triangles graph)
    "graph_components" ->
      """WITH RECURSIVE li AS (
        |  SELECT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |pairs AS (
        |  SELECT a.s AS a, b.s AS b
        |  FROM li a JOIN li b USING (ok)
        |  WHERE a.s < b.s
        |  GROUP BY 1, 2
        |  HAVING COUNT(DISTINCT ok) >= 2),
        |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |labels AS (
        |  SELECT a AS node, least(a, MIN(b)) AS cluster
        |  FROM reach GROUP BY a),
        |sizes AS (SELECT cluster, COUNT(*) AS n_nodes
        |          FROM labels GROUP BY cluster)
        |SELECT n_nodes, COUNT(*) AS n_components,
        |  MIN(cluster) AS min_component
        |FROM sizes GROUP BY n_nodes ORDER BY n_nodes""".stripMargin,

    // gap rows take the straight line between their observed neighbors;
    // both engines truncate integer division toward zero (DuckDB `//`
    // ≡ Spark `DIV`, measured: -7//2 = -3 in both) so down-slope gaps
    // agree with NO adjustment — do not "fix" either side with
    // pmod/floor, that is what would break cross-engine agreement
    // (FIXTURES.md convention note, StreamBatchOps.interpLinear doc)
    "ts_interp_linear" ->
      """WITH hourly AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
        |    COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT event_type, min(h) AS lo, max(h) AS hi
        |      FROM hourly GROUP BY 1),
        |spine AS (
        |  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |  FROM r),
        |j AS (
        |  SELECT s.event_type, CAST(epoch(s.h) AS BIGINT) AS hour_s, hourly.n
        |  FROM spine s LEFT JOIN hourly
        |    ON s.event_type = hourly.event_type AND s.h = hourly.h),
        |k AS (
        |  SELECT event_type, hour_s, n,
        |    last_value(n IGNORE NULLS) OVER wp AS pn,
        |    last_value(CASE WHEN n IS NOT NULL THEN hour_s END IGNORE NULLS)
        |      OVER wp AS ph,
        |    first_value(n IGNORE NULLS) OVER wn AS nn,
        |    first_value(CASE WHEN n IS NOT NULL THEN hour_s END IGNORE NULLS)
        |      OVER wn AS nh
        |  FROM j
        |  WINDOW wp AS (PARTITION BY event_type ORDER BY hour_s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY event_type ORDER BY hour_s
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, hour_s, n,
        |  CAST(CASE WHEN n IS NOT NULL THEN n * 1000000
        |    ELSE pn * 1000000
        |      + ((nn - pn) * (hour_s - ph) * 1000000) // (nh - ph)
        |  END AS BIGINT) AS n_interp_micro
        |FROM k ORDER BY event_type, hour_s""".stripMargin,

    // open/close via arg_min/arg_max on the unique event_id — the same
    // deterministic selection as Spark's min_by/max_by
    "ts_ohlc_bars" ->
      """WITH t AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
        |    event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
        |SELECT event_type, hour_s, COUNT(*) AS n_ticks,
        |  arg_min(cents, event_id) AS open_cents,
        |  MAX(cents) AS high_cents,
        |  MIN(cents) AS low_cents,
        |  arg_max(cents, event_id) AS close_cents
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // sufficient statistics in HUGEINT (the Spark side's DECIMAL(38,0));
    // DuckDB's // and Spark's DIV both TRUNCATE toward zero (measured:
    // -7//2 = -3 on both engines), so negative slopes agree without any
    // adjustment — do not "fix" either side to floor semantics
    "agg_linreg" ->
      """WITH t AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS HUGEINT) - 1704067200 AS x,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS y
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |s AS (
        |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
        |  FROM t GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_events,
        |  CAST(((n * sxy - sx * sy) * 1000000000) // (n * sxx - sx * sx)
        |    AS BIGINT) AS slope_nano,
        |  CAST((sy * sxx - sx * sxy) // (n * sxx - sx * sx)
        |    AS BIGINT) AS intercept_cents
        |FROM s ORDER BY event_type""".stripMargin,

    // cumulative weight crosses half the total at the weighted median;
    // equal-price runs collapse to the same selected price either way
    "agg_weighted_median" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    SUM(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    SUM(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag) AS totw
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(MAX(totw) AS BIGINT) AS total_weight,
        |  MIN(CASE WHEN cumw * 2 >= totw THEN l_extendedprice END)
        |    AS wmedian_price
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // the round-trip is lossless (shortest-round-trip double formatting
    // re-parses exactly), so the oracle is the source projection
    "scan_csv" ->
      """SELECT event_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    // the synthesized URL decomposes into known substrings — the oracle
    // rebuilds each part with string concatenation
    "fn_url" ->
      """SELECT doc_id,
        |  'https://' || source || '.example.org/' || lang || '/doc/'
        |    || CAST(doc_id AS VARCHAR) || '?id=' || CAST(doc_id AS VARCHAR)
        |    || '&lang=' || lang AS url,
        |  source || '.example.org' AS host,
        |  '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path,
        |  'id=' || CAST(doc_id AS VARCHAR) || '&lang=' || lang AS query,
        |  lang AS lang_param
        |FROM documents ORDER BY doc_id""".stripMargin,

    // pos = r·S + s is a bijection over (source rank, in-source rank) —
    // md5 of the doc_id string is the shared cross-engine shuffle key
    // windowed sufficient statistics in HUGEINT; den = 0 (single-point
    // window) is NULL on both engines via NULLIF / when
    "ts_rolling_slope" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) - 1704067200 AS x,
        |    COUNT(*) AS y
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3),
        |s AS (
        |  SELECT event_type, hour_s,
        |    CAST(COUNT(*) OVER w AS HUGEINT) AS k,
        |    CAST(SUM(x) OVER w AS HUGEINT) AS sx,
        |    CAST(SUM(y) OVER w AS HUGEINT) AS sy,
        |    CAST(SUM(x * y) OVER w AS HUGEINT) AS sxy,
        |    CAST(SUM(x * x) OVER w AS HUGEINT) AS sxx
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY x
        |    RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW))
        |SELECT event_type, hour_s, CAST(k AS BIGINT) AS n_hours,
        |  CAST(((k * sxy - sx * sy) * 1000000000)
        |    // NULLIF(k * sxx - sx * sx, 0) AS BIGINT) AS slope_nano
        |FROM s ORDER BY event_type, hour_s""".stripMargin,

    // the oracle affords the direct rank-window selection at sf0.01;
    // both pick the element at rank ceil(p·n/100) of the SAME exact
    // 10^-7-unit quantization (the emb_covariance device), so the
    // Spark side's two-pass bucket selection must land on it
    "emb_dim_quantiles" ->
      """WITH idx AS (
        |  SELECT CAST(unnest(generate_series(0, 63)) AS INTEGER) AS k),
        |el AS (
        |  SELECT idx.k AS d,
        |    CAST(CAST(ROUND(CAST(embedding[idx.k + 1] AS DOUBLE), 7)
        |      AS DECIMAL(18,7)) * 10000000 AS BIGINT) AS q7
        |  FROM embeddings CROSS JOIN idx),
        |r AS (
        |  SELECT d, q7,
        |    row_number() OVER (PARTITION BY d ORDER BY q7) AS rn,
        |    COUNT(*) OVER (PARTITION BY d) AS n
        |  FROM el)
        |SELECT d, CAST(MAX(n) AS BIGINT) AS n,
        |  MAX(CASE WHEN rn = (1 * n + 99) // 100 THEN q7 END) AS p01_e7,
        |  MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN q7 END) AS p50_e7,
        |  MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN q7 END) AS p99_e7
        |FROM r GROUP BY d ORDER BY d""".stripMargin,

    // candidate pairs from the wedge join (common-neighbor pairs only);
    // existing edges drop via the null-extended left join
    "graph_jaccard_links" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |pairs AS (
        |  SELECT a.s AS a, b.s AS b FROM li a JOIN li b USING (ok)
        |  WHERE a.s < b.s GROUP BY 1, 2
        |  HAVING COUNT(DISTINCT ok) >= 2),
        |adj AS (SELECT a AS u, b AS v FROM pairs
        |        UNION ALL SELECT b, a FROM pairs),
        |deg AS (SELECT u, COUNT(*) AS d FROM adj GROUP BY 1),
        |cand AS (
        |  SELECT x.u AS a, y.u AS b, COUNT(*) AS inter
        |  FROM adj x JOIN adj y ON x.v = y.v
        |  WHERE x.u < y.u GROUP BY 1, 2),
        |ne AS (
        |  SELECT c.a, c.b, c.inter FROM cand c
        |  LEFT JOIN pairs p ON c.a = p.a AND c.b = p.b
        |  WHERE p.a IS NULL)
        |SELECT ne.a, ne.b, ne.inter, da.d AS da, db.d AS db,
        |  ne.inter * 1000000 // (da.d + db.d - ne.inter) AS jaccard_micro
        |FROM ne JOIN deg da ON da.u = ne.a JOIN deg db ON db.u = ne.b
        |ORDER BY jaccard_micro DESC, ne.a, ne.b LIMIT 50""".stripMargin,

    // the elevation test replays n·H > S exactly (HUGEINT there,
    // DECIMAL(38,0) on the Spark side); islands = hour index − rank
    "ts_streaks" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
        |    COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS hh,
        |         CAST(SUM(n) AS HUGEINT) AS s
        |       FROM hourly GROUP BY 1),
        |el AS (
        |  SELECT h.event_type, h.hour_s,
        |    (h.hour_s // 3600) - row_number() OVER (
        |      PARTITION BY h.event_type ORDER BY h.hour_s) AS isl
        |  FROM hourly h JOIN st USING (event_type)
        |  WHERE CAST(h.n AS HUGEINT) * st.hh > st.s),
        |isl AS (
        |  SELECT event_type, isl, COUNT(*) AS len, MIN(hour_s) AS start_s
        |  FROM el GROUP BY 1, 2),
        |rk AS (
        |  SELECT event_type, len, start_s,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY len DESC, start_s ASC) AS rk
        |  FROM isl)
        |SELECT event_type, CAST(SUM(len) AS BIGINT) AS elevated_hours,
        |  COUNT(*) AS n_streaks,
        |  CAST(MAX(CASE WHEN rk = 1 THEN len END) AS BIGINT) AS longest_len,
        |  MAX(CASE WHEN rk = 1 THEN start_s END) AS longest_start_s
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,

    // equality proves the partitioned write/read round-trip lost and
    // duplicated nothing: the oracle aggregates the SOURCE directly
    "sink_partitioned" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(CAST(SUM(doc_id % 2147483647) AS HUGEINT) % 2147483647
        |    AS BIGINT) AS id_checksum
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // exact Gini from the bounded-domain value histogram: run ranks
    // r..r+c−1 contribute x·(c·r + c(c−1)/2); both quotient terms
    // replay with the shared truncating-division convention
    "agg_gini" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    COUNT(*) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, cents, c,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - c + 1 AS r
        |  FROM h),
        |a AS (
        |  SELECT event_type,
        |    CAST(SUM(c) AS HUGEINT) AS n,
        |    SUM(CAST(c AS HUGEINT) * cents) AS sx,
        |    SUM(CAST(cents AS HUGEINT) * (CAST(c AS HUGEINT) * r
        |      + (CAST(c AS HUGEINT) * (c - 1)) // 2)) AS t2
        |  FROM r GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST((2 * t2 * 1000000) // (n * sx)
        |    - ((n + 1) * 1000000) // n AS BIGINT) AS gini_micro
        |FROM a ORDER BY event_type""".stripMargin,

    // CUSUM closed form: S_t = P_t − min(min_{j≤t} P_j, 0) over the
    // H-scaled deviations; alarm when S_t² > k²·(H·Q − S²), k = 4
    "ts_cusum" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
        |    COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS hh,
        |    CAST(SUM(n) AS HUGEINT) AS s,
        |    SUM(CAST(n AS HUGEINT) * n) AS q
        |  FROM hourly GROUP BY 1),
        |d AS (
        |  SELECT h.event_type, h.hour_s, h.n,
        |    CAST(h.n AS HUGEINT) * st.hh - st.s AS d, st.hh, st.s, st.q
        |  FROM hourly h JOIN st USING (event_type)),
        |p AS (
        |  SELECT *, SUM(d) OVER (PARTITION BY event_type ORDER BY hour_s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM d),
        |cz AS (
        |  SELECT *, p - least(MIN(p) OVER (
        |    PARTITION BY event_type ORDER BY hour_s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cusum
        |  FROM p)
        |SELECT event_type, hour_s, n, CAST(cusum AS BIGINT) AS cusum_h
        |FROM cz WHERE cusum * cusum > 16 * (hh * q - s * s)
        |ORDER BY event_type, hour_s""".stripMargin,

    // exact integer squared distance between dense 24-hour day vectors;
    // absent hours are 0 on both engines via the hod spine
    "ts_shape_topk" ->
      """WITH pre AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    EXTRACT(hour FROM ts) AS hod, COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3),
        |days AS (SELECT DISTINCT event_type, day FROM pre),
        |hods AS (SELECT unnest(generate_series(0, 23)) AS hod),
        |dense AS (
        |  SELECT d.event_type, d.day, h.hod, coalesce(p.n, 0) AS n
        |  FROM days d CROSS JOIN hods h
        |  LEFT JOIN pre p ON p.event_type = d.event_type
        |    AND p.day = d.day AND p.hod = h.hod),
        |dist AS (
        |  SELECT a.event_type, a.day AS day_a, b.day AS day_b,
        |    SUM((a.n - b.n) * (a.n - b.n)) AS dist
        |  FROM dense a JOIN dense b
        |    ON a.event_type = b.event_type AND a.hod = b.hod
        |  WHERE a.day <> b.day
        |  GROUP BY 1, 2, 3),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type, day_a
        |    ORDER BY dist, day_b) AS rn
        |  FROM dist)
        |SELECT event_type, strftime(day_a, '%Y-%m-%d') AS day_a,
        |  strftime(day_b, '%Y-%m-%d') AS day_b,
        |  CAST(dist AS BIGINT) AS dist, rn
        |FROM rk WHERE rn <= 3
        |ORDER BY event_type, day_a, rn""".stripMargin,

    "pipeline_sft_format" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    array_to_string(w[1:8], ' ') AS p,
        |    array_to_string(w[9:len(w)], ' ') AS c,
        |    len(w) AS n
        |  FROM t WHERE len(w) > 8)
        |SELECT doc_id, md5(p) AS prompt_md5, md5(c) AS completion_md5,
        |  CAST(8 AS BIGINT) AS prompt_tokens,
        |  CAST(n - 8 AS BIGINT) AS completion_tokens,
        |  n <= 64 AS fits_budget
        |FROM s ORDER BY doc_id""".stripMargin,

    // DuckDB's index lambda is 1-based where Spark's is 0-based — the
    // (i − 1) below aligns the phases exactly
    "pipeline_span_corrupt" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |s AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) > 0),
        |m AS (
        |  SELECT doc_id, n,
        |    array_to_string(list_filter(
        |      list_transform(w, (x, i) -> CASE
        |        WHEN (i - 1) % 21 = 0 THEN '<X>'
        |        WHEN (i - 1) % 21 < 3 THEN NULL
        |        ELSE x END), x -> x IS NOT NULL), ' ') AS corrupted,
        |    array_to_string(list_filter(
        |      list_transform(w, (x, i) ->
        |        CASE WHEN (i - 1) % 21 < 3 THEN x END),
        |      x -> x IS NOT NULL), ' ') AS targets
        |  FROM s)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST((n - 1) // 21 + 1 AS BIGINT) AS n_spans,
        |  md5(corrupted) AS corrupted_md5, md5(targets) AS targets_md5
        |FROM m ORDER BY doc_id""".stripMargin,

    "pipeline_interleave_sources" ->
      """WITH src AS (
        |  SELECT source,
        |    CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS si
        |  FROM (SELECT DISTINCT source FROM documents) s),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_src FROM src),
        |r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
        |      AS r
        |  FROM documents)
        |SELECT r.doc_id, r.source, r.r * n.n_src + src.si AS pos
        |FROM r JOIN src USING (source) CROSS JOIN n
        |ORDER BY pos""".stripMargin,

    // --- round-12 wave ---
    "pipeline_dpo_format" ->
      """WITH scored AS (
        |  SELECT doc_id, lang, md5(text) AS content_md5,
        |    len(list_distinct(ls)) * 1000000 // len(ls) AS score_micro
        |  FROM (SELECT doc_id, lang, text,
        |          list_filter(string_split(lower(text), ' '), x -> x <> '') AS ls
        |        FROM documents)
        |  WHERE len(ls) > 0),
        |ranked AS (
        |  SELECT *,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rnk,
        |    CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM scored),
        |chosen AS (
        |  SELECT lang, rnk AS pair_id, doc_id AS chosen_doc,
        |    content_md5 AS chosen_md5, score_micro AS chosen_score
        |  FROM ranked WHERE rnk <= n // 2),
        |rejected AS (
        |  SELECT lang, rnk - n // 2 AS pair_id, doc_id AS rejected_doc,
        |    content_md5 AS rejected_md5, score_micro AS rejected_score
        |  FROM ranked WHERE rnk > n // 2)
        |SELECT lang, pair_id, chosen_doc, chosen_md5,
        |  CAST(chosen_score AS BIGINT) AS chosen_score,
        |  rejected_doc, rejected_md5,
        |  CAST(rejected_score AS BIGINT) AS rejected_score,
        |  CAST(chosen_score - rejected_score AS BIGINT) AS margin_micro
        |FROM chosen JOIN rejected USING (lang, pair_id)
        |ORDER BY lang, pair_id""".stripMargin,

    "pipeline_length_buckets" ->
      """WITH t AS (
        |  SELECT CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
        |    WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
        |    WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
        |    WHEN n <= 1024 THEN 1024 WHEN n <= 2048 THEN 2048
        |    WHEN n <= 4096 THEN 4096 ELSE -1 END AS bucket_cap, n
        |  FROM (SELECT CAST(len(list_filter(string_split(text, ' '),
        |          x -> x <> '')) AS BIGINT) AS n
        |        FROM documents))
        |SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS total_tokens,
        |  CAST(CASE WHEN bucket_cap > 0
        |    THEN bucket_cap * COUNT(*) - SUM(n) ELSE 0 END AS BIGINT)
        |    AS pad_tokens,
        |  CAST(CASE WHEN bucket_cap > 0
        |    THEN SUM(n) * 1000000 // (bucket_cap * COUNT(*))
        |    ELSE 1000000 END AS BIGINT) AS util_micro
        |FROM t GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin,

    // the oracle is the PLAIN join+agg: bucketed storage must not
    // change the result, only the plan (the join_skew_salted device)
    "join_bucketed_colocated" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // ---- round-13 wave ----

    // the depth-capped walk (w.d < 32) is part of the semantics: both
    // engines stop at 32 hops, so MIN(d) is the BFS depth for every
    // node within the cap and -1 marks disconnected-or-beyond
    "graph_bfs_depths" ->
      """WITH RECURSIVE li AS (
        |  SELECT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |pairs AS (
        |  SELECT a.s AS a, b.s AS b
        |  FROM li a JOIN li b USING (ok)
        |  WHERE a.s < b.s
        |  GROUP BY 1, 2
        |  HAVING COUNT(DISTINCT ok) >= 2),
        |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |nodes AS (SELECT DISTINCT a AS node FROM edges),
        |seeds AS (SELECT node FROM nodes ORDER BY node LIMIT 8),
        |walk(node, d) AS (
        |  SELECT node, 0 FROM seeds
        |  UNION
        |  SELECT e.b, w.d + 1 FROM walk w JOIN edges e ON e.a = w.node
        |  WHERE w.d < 32),
        |dep AS (SELECT node, MIN(d) AS depth FROM walk GROUP BY node)
        |SELECT CAST(COALESCE(dep.depth, -1) AS BIGINT) AS depth,
        |  COUNT(*) AS n_nodes, MIN(n.node) AS min_node
        |FROM nodes n LEFT JOIN dep ON n.node = dep.node
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // events nanos are µs-aligned (generator invariant), so epoch_us
    // ordering here equals Spark's µs-truncated ts ordering exactly
    "ts_local_extrema" ->
      """WITH t AS (
        |  SELECT event_type, epoch_us(ts) AS us, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |w AS (
        |  SELECT event_type, event_id, cents,
        |    lag(cents) OVER win AS p, lead(cents) OVER win AS n
        |  FROM t WINDOW win AS (PARTITION BY event_type ORDER BY us, event_id)),
        |f AS (
        |  SELECT event_type, event_id, cents,
        |    CASE WHEN p IS NOT NULL AND n IS NOT NULL
        |      AND cents > p AND cents > n THEN 1 ELSE 0 END AS is_max,
        |    CASE WHEN p IS NOT NULL AND n IS NOT NULL
        |      AND cents < p AND cents < n THEN 1 ELSE 0 END AS is_min
        |  FROM w)
        |SELECT event_type, COUNT(*) AS n_points,
        |  CAST(SUM(is_max) AS BIGINT) AS n_maxima,
        |  CAST(SUM(is_min) AS BIGINT) AS n_minima,
        |  COALESCE(MAX(CASE WHEN is_max = 1 THEN cents END), -1) AS peak_cents,
        |  COALESCE(MIN(CASE WHEN is_min = 1 THEN cents END), -1) AS trough_cents,
        |  COALESCE(MIN(CASE WHEN is_max = 1 THEN event_id END), -1)
        |    AS first_peak_event,
        |  COALESCE(MIN(CASE WHEN is_min = 1 THEN event_id END), -1)
        |    AS first_trough_event
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    // * and // share precedence (left-assoc) in BOTH engines, so
    // a*b//c parses as (a*b)//c on each side; operands non-negative
    "text_readability" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS n_words,
        |    GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
        |      1) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |      AS n_syllables
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_words, n_sentences, n_syllables,
        |    206835000 - 1015000 * n_words // n_sentences
        |      - 84600000 * n_syllables // n_words AS fre_micro
        |  FROM t WHERE n_words > 0)
        |SELECT doc_id, n_words, n_sentences, n_syllables, fre_micro,
        |  CASE WHEN fre_micro >= 90000000 THEN 'very_easy'
        |       WHEN fre_micro >= 60000000 THEN 'standard'
        |       WHEN fre_micro >= 30000000 THEN 'difficult'
        |       ELSE 'very_difficult' END AS band
        |FROM s ORDER BY doc_id""".stripMargin,

    // independent derivation, not a regex mirror: the synthesis makes
    // "canonical page" ≡ (lang, doc_id DIV 4), so the oracle counts
    // quartets directly — any canonicalization step Spark gets wrong
    // (unstripped fragment, case-sensitive host, surviving utm param)
    // inflates n_canonical and mismatches
    "dedup_url_canonical" ->
      """SELECT lang, COUNT(*) AS n_urls,
        |  COUNT(DISTINCT doc_id // 4) AS n_canonical,
        |  COUNT(*) - COUNT(DISTINCT doc_id // 4) AS n_dup_urls
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // the sink_partitioned device: aggregate the SOURCE directly —
    // equality proves the two-generation write + mergeSchema read
    // invented and lost nothing
    "scan_merge_schema" ->
      """SELECT lang, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_with_quality,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars % 100 ELSE 0 END)
        |    AS BIGINT) AS total_quality
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "pipeline_anneal_mix" ->
      """WITH perdoc AS (
        |  SELECT source, CAST(len(w) AS BIGINT) AS nt,
        |    CAST(len(list_distinct(w)) AS BIGINT) * 1000000 // len(w) AS q
        |  FROM (SELECT source,
        |          list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |        FROM documents)
        |  WHERE len(w) > 0),
        |persrc AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(nt) AS HUGEINT) AS tokens,
        |    CAST(SUM(q) AS HUGEINT) // COUNT(*) AS q_micro
        |  FROM perdoc GROUP BY 1),
        |tot AS (SELECT SUM(tokens) AS tot_tokens,
        |          SUM(tokens * q_micro) AS tot_tq FROM persrc)
        |SELECT source, n_docs, CAST(tokens AS BIGINT) AS tokens,
        |  CAST(q_micro AS BIGINT) AS q_micro,
        |  CAST(tokens * 1000000 // tot_tokens AS BIGINT) AS w1_micro,
        |  CAST(tokens * q_micro * 1000000 // tot_tq AS BIGINT) AS w2_micro,
        |  CAST(tokens * q_micro * (tot_tokens * 10 // 100) // tot_tq AS BIGINT)
        |    AS anneal_tokens
        |FROM persrc, tot ORDER BY source""".stripMargin,

    "corpus_snapshot_diff" ->
      """WITH snap_a AS (
        |  SELECT doc_id, lang, md5(text) AS h FROM documents
        |  WHERE doc_id % 3 <> 0),
        |snap_b AS (
        |  SELECT doc_id, lang,
        |    md5(CASE WHEN doc_id % 6 = 2 THEN text || ' v2' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 3 <> 1)
        |SELECT COALESCE(a.lang, b.lang) AS lang,
        |  CAST(SUM(CASE WHEN a.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_added,
        |  CAST(SUM(CASE WHEN b.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
        |    AND a.h <> b.h THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unchanged
        |FROM snap_a a FULL OUTER JOIN snap_b b ON a.doc_id = b.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // round-13 wave 2. The oracle decides first-occurrence with a
    // ROW_NUMBER window where Spark uses the skew-proof min-struct
    // aggregate — different plans, same deterministic keeper set
    "dedup_span_rewrite" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |spans AS (
        |  SELECT doc_id, lang, CAST(i AS BIGINT) AS block_idx,
        |    (len(ws) + 4) // 5 AS n_spans,
        |    array_to_string(ws[(i*5+1):(i*5+5)], ' ') AS span
        |  FROM w, UNNEST(range((len(ws) + 4) // 5)) AS t(i)
        |  WHERE len(ws) > 0),
        |marked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(span)
        |    ORDER BY doc_id, block_idx) AS occ
        |  FROM spans)
        |SELECT doc_id, MAX(lang) AS lang,
        |  CAST(MAX(n_spans) AS BIGINT) AS n_spans,
        |  COUNT(*) AS n_kept,
        |  CAST(SUM(len(string_split(span, ' '))) AS BIGINT) AS kept_words,
        |  md5(string_agg(span, ' ' ORDER BY block_idx)) AS rewrite_md5
        |FROM marked WHERE occ = 1
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // gold bit by cross-multiplication (2·distinct ≥ n) — no division,
    // no rounding anywhere; decile from ROW_NUMBER, not ntile, so the
    // bucket formula is the same literal arithmetic on both engines
    "corpus_quality_reliability" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS f_words,
        |    len(list_filter(string_split(lower(text), ' '),
        |        x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'to')) AS f_stop,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |      AS f_digits,
        |    len(regexp_extract_all(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |      + len(regexp_extract_all(text, '\d{9,}')) AS f_pii,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
        |  FROM documents),
        |l AS (
        |  SELECT doc_id,
        |    2*f_words + 5*f_stop - 30*f_digits - 1000*f_pii - 127 AS logit,
        |    CASE WHEN len(w) > 0 AND 2*len(list_distinct(w)) >= len(w)
        |      THEN 1 ELSE 0 END AS gold
        |  FROM f),
        |r AS (
        |  SELECT logit, gold,
        |    ROW_NUMBER() OVER (ORDER BY logit, doc_id) AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM l)
        |SELECT (rn-1)*10//n AS decile, COUNT(*) AS n_docs,
        |  CAST(SUM(gold) AS BIGINT) AS n_gold,
        |  CAST(SUM(gold) AS BIGINT)*1000000//COUNT(*) AS gold_micro,
        |  MIN(logit) AS lo_logit, MAX(logit) AS hi_logit
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "ts_gap_islands" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |r AS (
        |  SELECT user_id, day,
        |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
        |      AS grp
        |  FROM d),
        |i AS (
        |  SELECT user_id, grp, COUNT(*) AS len, MIN(day) AS start_day
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  COUNT(*) AS n_islands, MAX(len) AS longest_island,
        |  MIN(start_day) AS first_day,
        |  MAX(start_day + len - 1) AS last_day,
        |  MAX(start_day + len - 1) - MIN(start_day) + 1
        |    - CAST(SUM(len) AS BIGINT) AS gap_days
        |FROM i GROUP BY 1 ORDER BY 1""".stripMargin,

    // synchronous LPA, 3 unrolled rounds (no recursion: each round is a
    // fresh aggregation over the PREVIOUS round's labels, which a
    // recursive CTE's single self-reference can't express cleanly);
    // plurality vote with ties to the smallest label = Spark's
    // min(struct(-count, label)) argmax
    "graph_label_prop" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |pairs AS (
        |  SELECT a.s AS a, b.s AS b
        |  FROM li a JOIN li b USING (ok)
        |  WHERE a.s < b.s
        |  GROUP BY 1, 2
        |  HAVING COUNT(DISTINCT ok) >= 2),
        |adj AS (SELECT a AS u, b AS v FROM pairs
        |        UNION ALL SELECT b, a FROM pairs),
        |l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM adj),
        |v1 AS (SELECT a.u AS node, l.lbl, COUNT(*) AS c
        |       FROM adj a JOIN l0 l ON a.v = l.node GROUP BY 1, 2),
        |l1 AS (SELECT node, lbl FROM (
        |  SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
        |    ORDER BY c DESC, lbl) AS rn FROM v1) WHERE rn = 1),
        |v2 AS (SELECT a.u AS node, l.lbl, COUNT(*) AS c
        |       FROM adj a JOIN l1 l ON a.v = l.node GROUP BY 1, 2),
        |l2 AS (SELECT node, lbl FROM (
        |  SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
        |    ORDER BY c DESC, lbl) AS rn FROM v2) WHERE rn = 1),
        |v3 AS (SELECT a.u AS node, l.lbl, COUNT(*) AS c
        |       FROM adj a JOIN l2 l ON a.v = l.node GROUP BY 1, 2),
        |l3 AS (SELECT node, lbl FROM (
        |  SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
        |    ORDER BY c DESC, lbl) AS rn FROM v3) WHERE rn = 1)
        |SELECT lbl AS community, COUNT(*) AS n_members,
        |  MIN(node) AS min_node
        |FROM l3 GROUP BY lbl
        |ORDER BY n_members DESC, community""".stripMargin,

    // prefix-truncated cosine rankings vs the full-dim ranking; DuckDB
    // list slice l[1:d] ≡ Spark slice(e, 1, d); integer outputs only
    "emb_matryoshka_recall" ->
      """WITH probes AS (
        |  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS probe
        |  FROM embeddings WHERE vec_id < 16),
        |dims AS (SELECT * FROM (VALUES (8), (16), (32), (64)) AS t(d)),
        |scored AS (
        |  SELECT p.probe_id, e.vec_id, dims.d,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[])[1:dims.d],
        |                     probe[1:dims.d])
        |      / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[])[1:dims.d],
        |                               CAST(e.embedding AS DOUBLE[])[1:dims.d]))
        |         * sqrt(list_dot_product(probe[1:dims.d], probe[1:dims.d])))
        |      AS rawcos
        |  FROM embeddings e CROSS JOIN probes p CROSS JOIN dims
        |  WHERE e.vec_id <> p.probe_id),
        |ranked AS (
        |  SELECT probe_id, vec_id, d,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id, d
        |      ORDER BY rawcos DESC, vec_id) AS rn
        |  FROM scored),
        |top AS (SELECT probe_id, vec_id, d FROM ranked WHERE rn <= 10),
        |full_top AS (SELECT probe_id, vec_id FROM top WHERE d = 64)
        |SELECT t.d, COUNT(*) AS hits,
        |  CAST(COUNT(*) * 1000000 // 160 AS BIGINT) AS recall_micro
        |FROM top t JOIN full_top f USING (probe_id, vec_id)
        |WHERE t.d < 64 GROUP BY t.d ORDER BY t.d""".stripMargin,

    // Holt recurrence replayed by a recursive CTE walking each user's
    // day index; all arithmetic in BIGINT micro with // (truncation
    // toward zero, = Scala Long division — measured -7//2 = -3 both)
    "ts_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS x
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1, 2),
        |idx AS (
        |  SELECT user_id, x,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS t,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM daily),
        |state(user_id, t, n, l, b) AS (
        |  SELECT user_id, t, n, x, CAST(0 AS BIGINT) FROM idx WHERE t = 1
        |  UNION ALL
        |  SELECT s.user_id, i.t, s.n,
        |    (i.x + 3 * (s.l + s.b)) // 4,
        |    (((i.x + 3 * (s.l + s.b)) // 4 - s.l) + s.b) // 2
        |  FROM state s JOIN idx i
        |    ON i.user_id = s.user_id AND i.t = s.t + 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n_days, l AS level_micro,
        |  b AS trend_micro, l + 7 * b AS forecast7_micro
        |FROM state WHERE t = n ORDER BY user_id""".stripMargin,

    // per-source token-budget cap, longest-first; the window form is the
    // oracle's prerogative — the Spark plan uses the distributed prefix
    // sum, same totals by the contiguous-runs argument
    "pipeline_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY n_tokens DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS src_cum
        |  FROM t)
        |SELECT doc_id, source, n_tokens, src_cum
        |FROM c WHERE src_cum <= 800 ORDER BY doc_id""".stripMargin,

    // 3 unrolled peel passes (fixed-round semantics — full-convergence
    // k-core is a fixpoint a bag-semantics recursive CTE can't state);
    // each pass: degree census, filter < k, edge semi-restriction
    "graph_kcore" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |pairs AS (
        |  SELECT a.s AS a, b.s AS b
        |  FROM li a JOIN li b USING (ok)
        |  WHERE a.s < b.s
        |  GROUP BY 1, 2
        |  HAVING COUNT(DISTINCT ok) >= 2),
        |adj0 AS (SELECT a AS u, b AS v FROM pairs
        |         UNION ALL SELECT b, a FROM pairs),
        |k1 AS (SELECT u FROM adj0 GROUP BY u HAVING COUNT(*) >= 3),
        |adj1 AS (SELECT a.u, a.v FROM adj0 a
        |  JOIN k1 x ON a.u = x.u JOIN k1 y ON a.v = y.u),
        |k2 AS (SELECT u FROM adj1 GROUP BY u HAVING COUNT(*) >= 3),
        |adj2 AS (SELECT a.u, a.v FROM adj1 a
        |  JOIN k2 x ON a.u = x.u JOIN k2 y ON a.v = y.u),
        |k3 AS (SELECT u FROM adj2 GROUP BY u HAVING COUNT(*) >= 3),
        |adj3 AS (SELECT a.u, a.v FROM adj2 a
        |  JOIN k3 x ON a.u = x.u JOIN k3 y ON a.v = y.u)
        |SELECT u AS node, COUNT(*) AS degree
        |FROM adj3 GROUP BY u ORDER BY node""".stripMargin,

    // integer micro chi-square; HUGEINT mirrors Spark's DECIMAL(38,0)
    // for the squared deviation (the util_micro overflow rule); // is
    // truncating division = Spark DIV
    // r15: the chi2 sibling in nats — one 6dp-rounded ln per CELL
    // (text_zipf float rule) re-anchored to integer micro, then exact
    // DECIMAL arithmetic with truncating DIV
    "agg_mutual_info" ->
      """WITH cells AS (
        |  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
        |tot AS (
        |  SELECT lang, source, o,
        |    SUM(o) OVER (PARTITION BY lang) AS r,
        |    SUM(o) OVER (PARTITION BY source) AS c,
        |    SUM(o) OVER () AS n
        |  FROM cells),
        |p AS (
        |  SELECT lang, source, o, n,
        |    CAST(CAST(round(ln((CAST(o AS DOUBLE) * n) /
        |        (CAST(r AS DOUBLE) * c)), 6) AS DECIMAL(18,6)) * 1000000
        |      AS BIGINT) AS pmi_micro
        |  FROM tot)
        |SELECT lang, source, o AS observed,
        |  CAST((CAST(o AS HUGEINT) * 1000000) // n AS BIGINT) AS joint_micro,
        |  pmi_micro,
        |  CAST((CAST(pmi_micro AS HUGEINT) * o) // n AS BIGINT)
        |    AS mi_contrib_micro
        |FROM p ORDER BY lang, source""".stripMargin,

    "agg_chi2" ->
      """WITH cells AS (
        |  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
        |tot AS (
        |  SELECT lang, source, o,
        |    SUM(o) OVER (PARTITION BY lang) AS r,
        |    SUM(o) OVER (PARTITION BY source) AS c,
        |    SUM(o) OVER () AS n
        |  FROM cells),
        |e AS (
        |  SELECT lang, source, o,
        |    CAST((CAST(r AS HUGEINT) * c * 1000000) // n AS BIGINT)
        |      AS e_micro
        |  FROM tot)
        |SELECT lang, source, o AS observed, e_micro AS expected_micro,
        |  CAST((CAST(o * 1000000 - e_micro AS HUGEINT)
        |      * (o * 1000000 - e_micro) * 1000000)
        |    // (CAST(e_micro AS HUGEINT) * 1000000) AS BIGINT)
        |    AS chi2_micro
        |FROM e ORDER BY lang, source""".stripMargin,

    // the window form is the oracle's prerogative — Spark keeps via a
    // map-side-combined min-struct argmin, same keeper by (ts,
    // event_id) total order; hour bucket = floor(epoch/3600)·3600 ≡
    // window(ts, '1 hour').start in the UTC session
    "stream_dedup_batch" ->
      """WITH e AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_s
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |r AS (
        |  SELECT hour_s, user_id, event_type, event_id, cents,
        |    ROW_NUMBER() OVER (PARTITION BY hour_s, user_id, event_type
        |      ORDER BY ts, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY hour_s, user_id, event_type) AS n
        |  FROM e)
        |SELECT hour_s, user_id, event_type, event_id AS kept_event_id,
        |  cents AS kept_cents, n - 1 AS n_suppressed
        |FROM r WHERE rn = 1
        |ORDER BY hour_s, user_id, event_type""".stripMargin,

    // inclusion decided on floor(cos·10⁶) in BOTH engines — integer
    // compare, no float boundary; cosine arithmetic double-widened,
    // same fold order (list_dot_product ≡ the compiled sequential dot)
    "sim_range_search" ->
      """WITH p AS (
        |  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS probe
        |  FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT p.probe_id, e.vec_id,
        |    CAST(floor(
        |      list_dot_product(CAST(e.embedding AS DOUBLE[]), probe)
        |        / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                                 CAST(e.embedding AS DOUBLE[])))
        |           * sqrt(list_dot_product(probe, probe)))
        |      * 1000000) AS BIGINT) AS cos_micro
        |  FROM embeddings e CROSS JOIN p
        |  WHERE e.vec_id <> p.probe_id)
        |SELECT probe_id, vec_id, cos_micro FROM s
        |WHERE cos_micro >= 250000
        |ORDER BY probe_id, vec_id""".stripMargin,

    // mutual = both directions in each other's top-k; cosine is
    // bit-symmetric so the equated scores are identical doubles
    "emb_mutual_knn" ->
      """WITH nodes AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < 256),
        |scored AS (
        |  SELECT a.vec_id, b.vec_id AS nbr_id,
        |    list_dot_product(a.emb, b.emb)
        |      / (sqrt(list_dot_product(a.emb, a.emb))
        |         * sqrt(list_dot_product(b.emb, b.emb))) AS rawcos
        |  FROM nodes a CROSS JOIN nodes b WHERE a.vec_id <> b.vec_id),
        |d AS (
        |  SELECT vec_id, nbr_id, rawcos,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY rawcos DESC, nbr_id) AS rn
        |  FROM scored),
        |topk AS (SELECT vec_id, nbr_id, rawcos FROM d WHERE rn <= 5)
        |SELECT t.vec_id AS id_a, t.nbr_id AS id_b,
        |  CAST(floor(t.rawcos * 1000000) AS BIGINT) AS cos_micro
        |FROM topk t JOIN topk u
        |  ON u.vec_id = t.nbr_id AND u.nbr_id = t.vec_id
        |WHERE t.vec_id < t.nbr_id
        |ORDER BY id_a, id_b""".stripMargin,

    // the pack_sequences recursive replay, rolled up to bin fill then
    // fill-percent decile; oversize docs are that slug's own row class
    "pipeline_pack_waste" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |fit AS (
        |  SELECT doc_id, n_tokens,
        |    row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn,
        |    count(*) OVER () AS n
        |  FROM toks WHERE n_tokens <= 256),
        |r AS (
        |  SELECT doc_id, n_tokens, rn,
        |    (rn - 1) // ((n + 31) // 32) AS range_id,
        |    row_number() OVER (PARTITION BY (rn - 1) // ((n + 31) // 32)
        |                       ORDER BY rn) AS idx
        |  FROM fit),
        |scan AS (
        |  SELECT range_id, idx, doc_id, n_tokens,
        |    CAST(0 AS BIGINT) AS bin, n_tokens AS fill
        |  FROM r WHERE idx = 1
        |  UNION ALL
        |  SELECT r.range_id, r.idx, r.doc_id, r.n_tokens,
        |    CASE WHEN s.fill + r.n_tokens > 256 THEN s.bin + 1 ELSE s.bin END,
        |    CASE WHEN s.fill + r.n_tokens > 256 THEN r.n_tokens
        |         ELSE s.fill + r.n_tokens END
        |  FROM scan s JOIN r ON r.range_id = s.range_id AND r.idx = s.idx + 1),
        |bins AS (SELECT range_id, max(bin) + 1 AS bins_used FROM scan GROUP BY 1),
        |offs AS (
        |  SELECT range_id,
        |    CAST(COALESCE(SUM(bins_used) OVER (ORDER BY range_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |  FROM bins),
        |binfill AS (
        |  SELECT s.bin + o.off AS bin_id,
        |    CAST(SUM(s.n_tokens) AS BIGINT) AS fill,
        |    COUNT(*) AS n_docs
        |  FROM scan s JOIN offs o USING (range_id)
        |  GROUP BY 1)
        |SELECT (fill * 10) // 256 AS fill_decile, COUNT(*) AS n_bins,
        |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        |  CAST(SUM(fill) AS BIGINT) AS total_fill,
        |  CAST(SUM(256 - fill) AS BIGINT) AS total_waste
        |FROM binfill GROUP BY 1 ORDER BY 1""".stripMargin,

    // NULLS FIRST pinned: Spark asc defaults nulls-first, DuckDB last
    "corpus_pareto_sources" ->
      """WITH s AS (
        |  SELECT source,
        |    CAST(COALESCE(SUM(CAST(len(list_filter(string_split(text, ' '),
        |      x -> x <> '')) AS BIGINT)), 0) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |r AS (
        |  SELECT source, n_tokens,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_tokens DESC,
        |      source ASC NULLS FIRST) AS INTEGER) AS rank,
        |    SUM(n_tokens) OVER (ORDER BY n_tokens DESC,
        |      source ASC NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens,
        |    SUM(n_tokens) OVER () AS total
        |  FROM s)
        |SELECT source, rank, n_tokens,
        |  CAST((CAST(cum_tokens AS HUGEINT) * 1000000) // total AS BIGINT)
        |    AS cum_micro
        |FROM r ORDER BY rank""".stripMargin,

    // nine compile-time Benford literals (floor(log10(1+1/d)*1e6)) —
    // no runtime log in either engine; digit by string head, never
    // log10 (last-ulp digit flips)
    "agg_benford" ->
      """WITH c AS (
        |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |d AS (
        |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM c WHERE cents > 0),
        |g AS (SELECT digit, COUNT(*) AS observed FROM d GROUP BY 1),
        |t AS (SELECT digit, observed, SUM(observed) OVER () AS n FROM g),
        |e AS (
        |  SELECT digit, observed,
        |    CAST((CAST(observed AS HUGEINT) * 1000000) // n AS BIGINT)
        |      AS observed_micro,
        |    CAST(CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
        |      WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |      WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
        |      ELSE 45757 END AS BIGINT) AS expected_micro
        |  FROM t)
        |SELECT digit, observed, observed_micro, expected_micro,
        |  observed_micro - expected_micro AS dev_micro
        |FROM e ORDER BY digit""".stripMargin,

    // decile = (rn−1)·10 // n, never ntile (the qualityReliability rule);
    // first occurrence per word type at word grain
    "text_vocab_growth" ->
      """WITH ranked AS (
        |  SELECT doc_id, text, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM documents),
        |wd AS (SELECT *, (rn - 1) * 10 // n AS decile FROM ranked),
        |docstats AS (
        |  SELECT decile, COUNT(*) AS n_docs,
        |    CAST(COALESCE(SUM(CAST(len(list_filter(string_split(text, ' '),
        |      x -> x <> '')) AS BIGINT)), 0) AS BIGINT) AS n_tokens
        |  FROM wd GROUP BY 1),
        |fs AS (
        |  SELECT word, MIN(decile) AS decile FROM (
        |    SELECT decile,
        |      UNNEST(list_filter(string_split(text, ' '), x -> x <> ''))
        |        AS word
        |    FROM wd) GROUP BY 1),
        |nt AS (SELECT decile, COUNT(*) AS new_types FROM fs GROUP BY 1)
        |SELECT d.decile, d.n_docs, d.n_tokens,
        |  COALESCE(t.new_types, 0) AS new_types,
        |  CAST(SUM(COALESCE(t.new_types, 0)) OVER (ORDER BY d.decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_types
        |FROM docstats d LEFT JOIN nt t USING (decile)
        |ORDER BY d.decile""".stripMargin,

    // squares in HUGEINT ≡ Spark DECIMAL(38,0); NULL user is one
    // ordinary cell in both engines
    "agg_hhi" ->
      """WITH c AS (
        |  SELECT event_type, user_id, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, COUNT(*) AS n_users,
        |    CAST(SUM(c) AS BIGINT) AS total_events,
        |    SUM(CAST(c AS HUGEINT) * c) AS ss
        |  FROM c GROUP BY 1)
        |SELECT event_type, n_users, total_events,
        |  CAST((ss * 1000000)
        |    // (CAST(total_events AS HUGEINT) * total_events) AS BIGINT)
        |    AS hhi_micro
        |FROM t ORDER BY event_type""".stripMargin,

    // pure-integer sign pairs over the daily micro sums (the ts_holt
    // pre-collapse); single-day users have no pairs in either engine
    "ts_mk_trend" ->
      """WITH daily AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS x
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT a.user_id,
        |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END
        |      AS sgn
        |  FROM daily a JOIN daily b
        |    ON a.user_id = b.user_id AND a.day < b.day)
        |SELECT user_id, COUNT(*) AS n_pairs,
        |  CAST(SUM(sgn) AS BIGINT) AS s_stat,
        |  CAST(CASE WHEN SUM(sgn) > 0 THEN 1 WHEN SUM(sgn) < 0 THEN -1
        |    ELSE 0 END AS INTEGER) AS trend
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the label_prop vote CTEs verbatim, then Newman contributions in
    // HUGEINT ≡ Spark DECIMAL(38,0); // truncates like DIV
    "graph_modularity" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |pairs AS (
        |  SELECT a.s AS a, b.s AS b
        |  FROM li a JOIN li b USING (ok)
        |  WHERE a.s < b.s
        |  GROUP BY 1, 2
        |  HAVING COUNT(DISTINCT ok) >= 2),
        |adj AS (SELECT a AS u, b AS v FROM pairs
        |        UNION ALL SELECT b, a FROM pairs),
        |l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM adj),
        |v1 AS (SELECT a.u AS node, l.lbl, COUNT(*) AS c
        |       FROM adj a JOIN l0 l ON a.v = l.node GROUP BY 1, 2),
        |l1 AS (SELECT node, lbl FROM (
        |  SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
        |    ORDER BY c DESC, lbl) AS rn FROM v1) WHERE rn = 1),
        |v2 AS (SELECT a.u AS node, l.lbl, COUNT(*) AS c
        |       FROM adj a JOIN l1 l ON a.v = l.node GROUP BY 1, 2),
        |l2 AS (SELECT node, lbl FROM (
        |  SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
        |    ORDER BY c DESC, lbl) AS rn FROM v2) WHERE rn = 1),
        |v3 AS (SELECT a.u AS node, l.lbl, COUNT(*) AS c
        |       FROM adj a JOIN l2 l ON a.v = l.node GROUP BY 1, 2),
        |l3 AS (SELECT node, lbl FROM (
        |  SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
        |    ORDER BY c DESC, lbl) AS rn FROM v3) WHERE rn = 1),
        |mm AS (SELECT COUNT(*) AS m FROM pairs),
        |e AS (
        |  SELECT la.lbl AS community, COUNT(*) AS intra_edges
        |  FROM pairs p
        |  JOIN l3 la ON p.a = la.node
        |  JOIN l3 lb ON p.b = lb.node
        |  WHERE la.lbl = lb.lbl GROUP BY 1),
        |d AS (
        |  SELECT l.lbl AS community, COUNT(*) AS degree_sum
        |  FROM adj a JOIN l3 l ON a.u = l.node GROUP BY 1)
        |SELECT d.community, COALESCE(e.intra_edges, 0) AS intra_edges,
        |  d.degree_sum,
        |  CAST(((CAST(COALESCE(e.intra_edges, 0) AS HUGEINT) * 4 * mm.m
        |      - CAST(d.degree_sum AS HUGEINT) * d.degree_sum) * 1000000)
        |    // (CAST(4 AS HUGEINT) * mm.m * mm.m) AS BIGINT) AS q_micro
        |FROM d LEFT JOIN e USING (community) CROSS JOIN mm
        |ORDER BY q_micro DESC, community""".stripMargin,

    // cross-multiplied CDF gaps (division eliminated), HUGEINT ≡
    // DECIMAL(38,0); argmax = smallest cents among maxima
    "agg_ks_test" ->
      """WITH e AS (
        |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    event_type
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
        |cells AS (
        |  SELECT cents,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
        |  FROM e GROUP BY 1),
        |c AS (
        |  SELECT cents,
        |    SUM(ca) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cuma,
        |    SUM(cb) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cumb,
        |    SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
        |  FROM cells),
        |g AS (
        |  SELECT cents, na, nb,
        |    CAST((abs(CAST(cuma AS HUGEINT) * nb
        |        - CAST(cumb AS HUGEINT) * na) * 1000000)
        |      // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS gap_micro
        |  FROM c)
        |SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
        |  MAX(gap_micro) AS d_micro,
        |  (SELECT MIN(cents) FROM g g2
        |   WHERE g2.gap_micro = (SELECT MAX(gap_micro) FROM g)) AS at_cents
        |FROM g""".stripMargin,

    // lower-median rank selection over the (slope, di, dj) total order;
    // slope division truncates toward zero in both engines
    "ts_theilsen" ->
      """WITH daily AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS x
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT a.user_id, a.day AS di, b.day AS dj,
        |    (b.x - a.x) // (b.day - a.day) AS slope
        |  FROM daily a JOIN daily b
        |    ON a.user_id = b.user_id AND a.day < b.day),
        |r AS (
        |  SELECT user_id, slope,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY slope, di, dj) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM p)
        |SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
        |  slope AS sen_slope_micro
        |FROM r WHERE rn = (n + 1) // 2 ORDER BY user_id""".stripMargin,

    // doubled midranks keep tied ranks integer: a tie group of size f
    // after combined rank `bef` has doubled midrank 2·bef+f+1
    "agg_mannwhitney" ->
      """WITH e AS (
        |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    event_type
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
        |cells AS (
        |  SELECT cents,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
        |  FROM e GROUP BY 1),
        |c AS (
        |  SELECT cents, ca, cb, ca + cb AS f,
        |    SUM(ca + cb) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) - (ca + cb) AS bef,
        |    SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
        |  FROM cells),
        |t AS (
        |  SELECT CAST(MAX(na) AS BIGINT) AS n_a,
        |    CAST(MAX(nb) AS BIGINT) AS n_b,
        |    SUM(CAST(ca AS HUGEINT) * (2 * bef + f + 1)) AS r2
        |  FROM c)
        |SELECT n_a, n_b,
        |  CAST(r2 - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a,
        |  CAST(((r2 - CAST(n_a AS HUGEINT) * (n_a + 1)) * 1000000)
        |    // (CAST(2 AS HUGEINT) * n_a * n_b) AS BIGINT) AS auc_micro
        |FROM t""".stripMargin,

    // type-table aggregation; repeat mass in HUGEINT ≡ DECIMAL(38,0)
    "corpus_simpson_diversity" ->
      """WITH t AS (
        |  SELECT lang,
        |    UNNEST(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS word
        |  FROM documents),
        |g AS (SELECT lang, word, COUNT(*) AS n FROM t GROUP BY 1, 2),
        |a AS (
        |  SELECT lang, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |    COUNT(*) AS n_types,
        |    SUM(CAST(n AS HUGEINT) * (n - 1)) AS rep
        |  FROM g GROUP BY 1)
        |SELECT lang, n_tokens, n_types,
        |  CAST((rep * 1000000)
        |    // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1)) AS BIGINT)
        |    AS simpson_micro
        |FROM a WHERE n_tokens > 1 ORDER BY lang""".stripMargin,

    // the oracle reads the UNPARTITIONED source with the same filter —
    // pruning must be invisible in the rows (PlanGuardSpec owns the
    // PartitionFilters assertion); IN drops NULL lang in both engines
    "scan_partition_prune" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(CAST(SUM(doc_id % 2147483647) AS HUGEINT) % 2147483647
        |    AS BIGINT) AS id_checksum
        |FROM documents WHERE lang IN ('en', 'fr')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // latest-wins merge: the keeper is the max (version, op, chars)
    // struct; DuckDB replays it with a window argmax — same keeper by
    // the version total order per key
    "pipeline_cdc_apply" ->
      """WITH base AS (SELECT doc_id, n_chars FROM documents),
        |log AS (
        |  SELECT doc_id, 1 AS version, 'I' AS op, n_chars AS chars
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id, 2, 'U', n_chars + 1000 FROM base
        |  WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 3, 'U', n_chars + 2000 FROM base
        |  WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id, 4, 'D', 0 FROM base WHERE doc_id % 13 = 0),
        |r AS (
        |  SELECT doc_id, version, op, chars,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY version DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY doc_id) AS n
        |  FROM log)
        |SELECT doc_id, CAST(version AS INTEGER) AS final_version,
        |  CAST(n - 1 AS BIGINT) AS n_changes,
        |  CAST(chars AS BIGINT) AS final_chars
        |FROM r WHERE rn = 1 AND op <> 'D'
        |ORDER BY doc_id""".stripMargin,

    // sign-bit packing is a pure comparison (no float arithmetic);
    // distance = XOR + popcount on the two 32-bit words — integer end
    // to end in both engines
    "sim_hamming_topk" ->
      """WITH packed AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(range(0, 32), i ->
        |      CASE WHEN embedding[i + 1] > 0.0
        |           THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT)
        |      AS w0,
        |    CAST(list_sum(list_transform(range(0, 32), i ->
        |      CASE WHEN embedding[i + 33] > 0.0
        |           THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT)
        |      AS w1
        |  FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, w0 AS p0, w1 AS p1
        |      FROM packed WHERE vec_id < 8),
        |d AS (
        |  SELECT p.probe_id, c.vec_id,
        |    CAST(bit_count(xor(c.w0, p.p0))
        |       + bit_count(xor(c.w1, p.p1)) AS BIGINT) AS hamming
        |  FROM packed c CROSS JOIN p WHERE c.vec_id <> p.probe_id),
        |r AS (
        |  SELECT probe_id, vec_id, hamming,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |      ORDER BY hamming, vec_id) AS INTEGER) AS rn
        |  FROM d)
        |SELECT probe_id, vec_id, hamming, rn FROM r
        |WHERE rn <= 10 ORDER BY probe_id, rn""".stripMargin,

    // the FULL REBUILD of the co-purchase pair-support projection — the
    // engine side folds 4 whole-order append batches through
    // mergePairSupport, so hash equality IS append ≡ rebuild
    "graph_copurchase_incr" ->
      """SELECT a.l_partkey AS a, b.l_partkey AS b,
        |  COUNT(DISTINCT a.l_orderkey) AS support
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2
        |ORDER BY 1, 2""".stripMargin,
  )

  /** DuckDB oracle for `text_langid`, generated from
    * [[graft.operators.TextOps.langProfiles]] so the two engines score
    * identical word lists. Argmax tie-break: Spark sorts
    * struct(score, lang) descending, so ties go to the lexicographically
    * LARGEST language code — mirrored here by CASE arms in descending
    * code order. */
  private def langIdOracleSql: String = {
    val profiles = operators.TextOps.langProfiles
    val scoreCols = profiles.map { case (l, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      s"  len(list_filter(w, x -> x IN ($inList))) AS s_$l"
    }.mkString(",\n")
    val allScores = profiles.map("s_" + _._1).mkString(", ")
    val caseArms = profiles.map(_._1).sorted.reverse
      .map(l => s"       WHEN s_$l = g THEN '$l'").mkString("\n")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       |s AS (
       |  SELECT doc_id,
       |$scoreCols
       |  FROM toks),
       |best AS (SELECT *, greatest($allScores) AS g FROM s)
       |SELECT doc_id,
       |  CASE WHEN g = 0 THEN 'und'
       |$caseArms
       |  END AS pred_lang,
       |  CAST(g AS INTEGER) AS marker_hits
       |FROM best ORDER BY doc_id""".stripMargin
  }

  /** Oracles whose SQL embeds FITTED model parameters as literals —
    * resolvable only with a session over the gate's corpus, so Verify
    * merges them into oracle_sql.json at dump time (r15; VERDICT r14
    * #4). The fits themselves (KMeans centers, the PCA power iteration)
    * stay unoracled; everything DOWNSTREAM of the exported parameters —
    * cell assignment, probe ranking, SemDeDup keeper, PCA scoring — is
    * replayed independently by DuckDB over the same literals, the
    * sim_ann_lsh hyperplane device applied to fitted state. The
    * builders are registry-cached (cachedIvfIndex) or deterministic
    * within a session (pcaAxis), so the parameters here are identical
    * to what the queries' own runs used. Declared AFTER oracleSql:
    * ContractSpec's source-layout dupe guard counts this block in the
    * oracle section, so a slug accidentally registered both statically
    * and dynamically trips it. */
  /** The slugs [[dynamicOracleSql]] MUST cover — the fail-closed
    * contract (r16, ADVICE r15): Verify compares the resolved map's
    * keys against this list and emits an `error(...)`-raising oracle
    * for any slug the resolution failed to produce, so a regression in
    * the fitted-model family surfaces as a driver-gate FAILURE instead
    * of silently shrinking the oracled count. ContractSpec pins the
    * two declarations against each other. */
  val dynamicOracleSlugs: Seq[String] = Seq(
    "sim_ann_ivf", "sim_ann_ivf_batch", "dedup_semantic_ivf",
    "emb_pca_top", "emb_pq_encode", "sim_pq_topk",
    "sim_pq_rerank", "retrieval_pq_recall",
    "sim_ann_ivfpq", "sim_ann_ivfpq_batch", "retrieval_ivfpq_recall")

  def dynamicOracleSql(spark: SparkSession,
                       sfDir: String): Map[String, String] = {
    val emb = Tables.embeddings(spark, sfDir)
    val annCenters = operators.VectorOps.cachedIvfIndex(emb).centers
    val semCenters = operators.VectorOps.cachedIvfIndex(
      operators.VectorOps.withReingested(emb)).centers
    val (v, shift, lambda) = operators.VectorOps.pcaAxis(emb)
    val pqBook = operators.VectorOps.cachedPqCodebook(emb)
    val pqLut = operators.VectorOps.pqProbeLut(emb)
    Map(
      "sim_ann_ivf" -> OracleGen.simAnnIvfSql(annCenters),
      "sim_ann_ivf_batch" -> OracleGen.simAnnIvfBatchSql(annCenters),
      "dedup_semantic_ivf" -> OracleGen.semanticIvfSql(semCenters),
      "emb_pca_top" -> OracleGen.pcaTopSql(v, shift, math.round(lambda * 1e6)),
      "emb_pq_encode" -> OracleGen.pqEncodeSql(pqBook),
      "sim_pq_topk" -> OracleGen.pqTopKSql(pqBook, pqLut),
      "sim_pq_rerank" -> OracleGen.pqRerankSql(pqBook, pqLut),
      "retrieval_pq_recall" -> OracleGen.pqRecallSql(pqBook, pqLut),
      // r17: the composed IVF+PQ tier — routing cells, codebooks and
      // the probe LUT all inline as literals
      "sim_ann_ivfpq" -> OracleGen.ivfPqSql(annCenters, pqBook, pqLut),
      "sim_ann_ivfpq_batch" -> OracleGen.ivfPqBatchSql(annCenters, pqBook,
        operators.VectorOps.pqProbeLutBatch(emb)),
      "retrieval_ivfpq_recall" ->
        OracleGen.ivfPqRecallSql(annCenters, pqBook, pqLut))
  }
}
