package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2/§7. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every entry passes through [[graft.plans.SortSamplePin]]: a query
    * whose top-level global sort would RE-EXECUTE an expensive
    * window/join pipeline in the range exchange's boundary-sampling
    * pass gets its sort input pinned (MEMORY_AND_DISK) so the sampler
    * and the shuffle read one execution. Rows, values and output order
    * are unchanged. The pin is gated on a measured allowlist — a
    * 35-query A/B showed the blanket version loses on cheap tails (see
    * SortSamplePin's scaladoc).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (name, fn) =>
      name -> ((spark: SparkSession, dir: String) =>
        graft.plans.SortSamplePin(name, fn(spark, dir)))
    }

  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "q2_join" -> (Relational.q2Join _),
    "q3_topk" -> (Relational.q3TopK _),
    "q4_window" -> (Relational.q4Window _),
    "q5_semi" -> (Relational.q5Semi _),
    "q6_filter" -> (Relational.q6Forecast _),
    "ts_range" -> (Timeseries.tsRange _),
    "ts_downsample" -> (Timeseries.tsDownsample _),
    "ts_fillgaps" -> (Timeseries.tsFillgaps _),
    "ts_skew_stats" -> (Timeseries.tsSkewStats _),
    "ts_resample_chunk" -> (Timeseries.tsResampleChunk _),
    "ts_gaps" -> (Timeseries.tsGaps _),
    "ts_montage" -> (Timeseries.tsMontage _),
    "ts_montage_named" -> (Timeseries.tsMontageNamed _),
    "ts_montage_aligned" -> (Timeseries.tsMontageAligned _),
    "ts_eventbin" -> (Timeseries.tsEventBin _),
    "ts_auto" -> (Timeseries.tsAuto _),
    // the partitioned layout end to end: write once per JVM, read with
    // rule-derived p_bucket partition pruning (DeriveBucketFilter)
    "ts_layout_range" -> (graft.sources.TsLayout.tsLayoutRange _),
    // the LSH-bucket-partitioned embedding layout end to end: write
    // once per JVM, read with p_bucket partition pruning over the
    // multi-probe set — value-identical to ann_lsh (same oracle)
    "ann_lsh_layout" -> (graft.sources.EmbLayout.annLshLayout _),
    "ts_spikes" -> (Timeseries.tsSpikes _),
    "ts_asof" -> (Timeseries.tsAsof _),
    "ts_stats" -> (Timeseries.tsStats _),
    "ts_channels" -> (Timeseries.tsChannels _),
    "ts_annotations" -> (Timeseries.tsAnnotations _),
    // rows-only: IIR recursion is not SQL-expressible; golden-value +
    // sequential-equivalence coverage lives in Butterworth/FilteringSpec
    "ts_butterworth" -> (Filtering.tsButterworth _),
    "dedup_exact" -> (Dedup.dedupExact _),
    "dedup_exact_hash" -> (Dedup.dedupExactHash _),
    // lead-fingerprint dedup: first-50-words hash catches appended-footer
    // re-crawls that full-text dedup misses
    "dedup_prefix" -> (Dedup.dedupPrefix _),
    "dedup_minhash" -> (Dedup.dedupMinhash _),
    "dedup_clusters" -> (Dedup.dedupClusters _),
    "dedup_simhash" -> (Dedup.dedupSimhash _),
    "dedup_ngram" -> (Dedup.dedupNgram _),
    "dedup_embed" -> (Dedup.dedupEmbed _),
    "dedup_embed_blocked" -> (Dedup.dedupEmbedBlocked _),
    "ann_bruteforce" -> (Similarity.annBruteforce _),
    "ann_lsh" -> (Similarity.annLsh _),
    "ann_ivf" -> (Similarity.annIvf _),
    "text_tokens" -> (TextAnalysis.textTokens _),
    "text_quality" -> (TextAnalysis.textQuality _),
    "text_langid" -> (TextAnalysis.textLangid _),
    "langid_eval" -> (TextAnalysis.langidEvalQ _),
    "text_fingerprint" -> (TextAnalysis.textFingerprint _),
    "corpus_stats" -> (TextAnalysis.corpusStatsQ _),
    "text_split" -> (TextAnalysis.textSplit _),
    "text_chunk" -> (TextAnalysis.textChunk _),
    "dedup_cross_source" -> (Dedup.dedupCrossSource _),
    "ann_knn_label" -> (Similarity.annKnnLabel _),
    "train_negatives" -> (Similarity.trainNegatives _),
    "embed_lof" -> (Similarity.embedLof _),
    "mm_decode" -> (Multimodal.mmDecode _), // decode kernel is the sanctioned stub; features oracled
    "mm_frames" -> (Multimodal.mmFrames _), // frame-sample → decode chain
    // rows-only + FilteringSpec sequential-equivalence (montage → IIR chain)
    "ts_montage_filter" -> (Filtering.tsMontageFilter _),
    // the reference hot path composed end to end; rows-only (IIR stage),
    // byte-exactness carried by the golden end-to-end spec
    "ts_hotpath" -> (Filtering.tsHotpath _),
    // the unit-channel serve composed end to end: event bins +
    // index-trimmed spike waveforms -> TimeSeriesMessage{event} frames
    "ts_unit_hotpath" -> (UnitHotpath.tsUnitHotpath _),
    "ts_waveforms" -> (Timeseries.tsWaveforms _),
    "ts_histogram" -> (Timeseries.tsHistogram _),
    "ts_acf" -> (Timeseries.tsAcf _),
    "pii_detect" -> (Curation.piiDetect _),
    "sample_stratified" -> (Curation.sampleStratifiedQ _),
    // end-to-end manifest: dedup survivors + quality + langid + tokens + split
    "train_mix" -> (Curation.trainMixQ _),
    "ts_sessions" -> (Timeseries.tsSessions _),
    "ts_quantiles" -> (Timeseries.tsQuantiles _),
    "ts_bandpower" -> (Timeseries.tsBandpower _),
    "text_repetition" -> (TextAnalysis.textRepetition _),
    "text_decontam" -> (Curation.textDecontam _),
    "bm25_search" -> (Search.bm25Search _),
    "embed_kmeans" -> (Similarity.embedKmeans _),
    "ts_xcorr" -> (Timeseries.tsXcorr _),
    "ts_interp" -> (Timeseries.tsInterp _),
    "dedup_semantic" -> (Similarity.dedupSemantic _),
    "ts_props" -> (Timeseries.tsProps _),
    "ann_ivf_kmeans" -> (Similarity.annIvfKmeans _),
    "ts_funnel" -> (Timeseries.tsFunnel _),
    "corpus_drift" -> (TextAnalysis.corpusDriftQ _),
    "corpus_burstiness" -> (TextAnalysis.corpusBurstinessQ _),
    // format-agnosticism proof: same range query served from an ORC
    // copy of the layout, oracled against the original parquet
    "ts_orc_range" -> (graft.sources.OrcLayout.tsOrcRange _),
    "corpus_keywords" -> (TextAnalysis.corpusKeywordsQ _),
    "ts_zscore" -> (Timeseries.tsZscore _),
    "dedup_semantic_clusters" -> (Similarity.dedupSemanticClusters _),
    "sample_coreset" -> (Similarity.sampleCoresetQ _),
    // reference blob format end to end: gzip BE-f64 store + range index
    // built from events, read through BinarySegments.readRange
    "ts_blob_range" -> (graft.sources.BlobStore.tsBlobRange _),
    "corpus_rollup" -> (TextAnalysis.corpusRollupQ _),
    "ts_pivot" -> (Timeseries.tsPivot _),
    "ts_retention" -> (Timeseries.tsRetention _),
    // GetChannelsQuery + Montage.validate composed: virtual channels
    // with validity, overlap window, rate and coverage
    "ts_montage_channels" -> (Timeseries.tsMontageChannels _),
    // deep-graph star-contraction CC over the same mined pairs —
    // must match dedup_clusters' transitive-closure oracle exactly
    "dedup_clusters_star" -> (Dedup.dedupClustersStar _),
    "dedup_report" -> (Dedup.dedupReport _),
    "dedup_matrix" -> (Dedup.dedupMatrix _),
    // 1/cluster-size soft-dedup sampling weights over the mined clusters
    "train_dedup_weights" -> (Dedup.trainDedupWeights _),
    // product-quantization ANN: m sliced codebooks, byte codes,
    // asymmetric-distance ranking
    "ann_pq" -> (Similarity.annPq _),
    // substring-level dup signal: per-doc fraction of word 5-grams
    // shared with any other document
    "dedup_spans" -> (Dedup.dedupSpans _),
    "dedup_passage" -> (Dedup.dedupPassage _),
    "corpus_overlap" -> (Dedup.corpusOverlap _),
    // corpus-LM nats/token quality proxy (KenLM-style document prior)
    "text_perplexity" -> (TextAnalysis.textPerplexity _),
    // concat-and-chunk sequence packing via two-phase prefix sum
    "pack_sequences" -> (Packing.packSequencesQ _),
    // asymmetric containment dedup: subsumption pairs Jaccard misses,
    // mined by rare-shingle blocking with the counted-df cap
    "dedup_containment" -> (Dedup.dedupContainment _),
    // DSIR hashed-ngram importance weights vs the en target slice
    "train_dsir" -> (Curation.trainDsir _),
    "train_classifier" -> (Curation.trainClassifier _),
    "train_bpe" -> (Tokenizer.trainBpe _),
    // the whole curation pipeline as one cumulative-stage funnel
    "corpus_funnel" -> (Curation.corpusFunnelQ _),
    // lexical + semantic retrieval fused by reciprocal rank
    "search_hybrid" -> (Search.searchHybrid _),
    // cross-channel spectral coherence averaged over day windows
    "ts_coherence" -> (Timeseries.tsCoherence _),
    // corpus 1/2/3-gram count table, top-k heavy hitters per order
    "corpus_ngrams" -> (TextAnalysis.corpusNgrams _),
    // thumbnail stage: resize (stride-decimation stub) -> decode
    "mm_resize" -> (Multimodal.mmResize _),
    // pagerank centrality over the verified near-dup graph
    "graph_pagerank" -> (Dedup.graphPagerank _),
    // top principal component of the embedding table (power iteration)
    "embed_pca" -> (Similarity.embedPca _),
    // TPC-H Q7-shaped nation-pair shipping volume by year
    "q7_volume" -> (Relational.q7Volume _),
    // Gopher hard rule battery: per-doc flags + pass conjunction
    "quality_gopher" -> (TextAnalysis.qualityGopher _),
    // temperature-scaled source mixing weights (n^alpha rebalancing)
    "sample_temperature" -> (Curation.sampleTemperature _),
    // multi-resolution zoom pyramid, each tier rolled up from the
    // tier below (one corpus-scale shuffle for the whole pyramid)
    "ts_pyramid" -> (Timeseries.tsPyramid _),
    // encode the corpus under the trained BPE merges: per-doc token
    // stats via a join against the rewritten vocabulary relation
    "tokenize_bpe" -> (Tokenizer.tokenizeBpe _),
    // audio modality: payload → int16 PCM frames → RMS + crossings
    "mm_audio" -> (Multimodal.mmAudio _),
    // c-TF-IDF topic words per embedding k-means cell
    "cluster_topics" -> (Similarity.clusterTopicsQ _),
    // TPC-H Q8-shaped national market share by year
    "q8_market" -> (Relational.q8Market _),
    // per-cluster distance z-scores: embedding-space outlier pruning
    "embed_outliers" -> (Similarity.embedOutliersQ _),
    "embed_silhouette" -> (Similarity.embedSilhouetteQ _),
    // threshold retrieval: every neighbor above cosine tau via LSH
    "ann_radius" -> (Similarity.annRadius _),
    // char + word Shannon entropy (compressibility quality signals)
    "text_entropy" -> (TextAnalysis.textEntropy _),
    // Bloom-prefiltered cross-corpus membership dedup (exact answer)
    "dedup_bloom" -> (Dedup.dedupBloom _),
    // anti-aliased 5-tap FIR low-pass + decimate (window-expressible)
    "ts_fir" -> (Timeseries.tsFir _),
    // day-of-week x hour seasonal profile per channel
    "ts_dow_profile" -> (Timeseries.tsDowProfile _),
    // exact phrase adjacency over a positional inverted index
    "search_phrase" -> (Search.searchPhrase _),
    // TPC-H Q10-shape returned-item customer revenue ranking
    "q10_returns" -> (Relational.q10Returns _),
    // two-sided sliding-window level-shift (change-point) screen
    "ts_shift" -> (Timeseries.tsShift _),
    "ts_cusum" -> (Timeseries.tsCusum _),
    // scalar-quantized ANN with dequantized shortlist + exact rerank
    "ann_sq" -> (Similarity.annSq _),
    // recall@k of the LSH index vs the exact brute-force baseline
    "ann_recall" -> (Similarity.annRecall _),
    // All-but-the-Top rank-1 anisotropy debias report
    "embed_debias" -> (Similarity.embedDebias _),
    // OLS Zipf-law fit over the top-1000 word frequency spectrum
    "corpus_zipf" -> (TextAnalysis.corpusZipf _),
    "corpus_heaps" -> (TextAnalysis.corpusHeaps _),
    // TPC-H Q18-shape large-order having-join report
    "q18_big" -> ((s, dir) => Relational.q18Big(s, dir)),
    "q12_priority" -> (Relational.q12Priority _),
    "q14_promo" -> (Relational.q14Promo _),
    "q19_bands" -> (Relational.q19Bands _),
    "q16_counts" -> (Relational.q16Counts _),
    "q22_anti" -> (Relational.q22Anti _),
    "q13_dist" -> (Relational.q13Dist _),
    "q15_top" -> (Relational.q15Top _),
    "q17_small" -> ((s, dir) => Relational.q17Small(s, dir)),
    "q9_profit" -> (Relational.q9Profit _),
    "q11_partvalue" -> (Relational.q11PartValue _),
    "q20_potential" -> (Relational.q20Potential _),
    "q21_waiting" -> ((s, dir) => Relational.q21Waiting(s, dir)),
    // PMI collocation mining over adjacent word pairs
    "corpus_pmi" -> (TextAnalysis.corpusPmi _),
    // Levenshtein<=1 fuzzy term lookup over the corpus vocabulary
    "search_fuzzy" -> (Search.searchFuzzy _),
    // TF-IDF cosine more-like-this over an inverted-index join
    "search_mlt" -> (Search.searchMlt _),
    // trailing 24-bucket rolling baseline + hourly drift screen
    "ts_rolling" -> (Timeseries.tsRolling _),
    // classical trend/seasonal/residual decompose over the bucket grid
    "ts_seasonal" -> (Timeseries.tsSeasonal _),
    "ts_hjorth" -> (Timeseries.tsHjorth _),
    // Hampel robust despiking screen (block-halo rolling median/MAD)
    "ts_hampel" -> (Timeseries.tsHampel _),
    "ts_linelength" -> (Timeseries.tsLinelength _),
    // per-channel OLS trend over the bucket grid + 6-bucket forecast
    "ts_forecast" -> (Timeseries.tsForecast _),
    // per-source TTR / Guiraud / Simpson / Yule lexical diversity
    "corpus_diversity" -> (TextAnalysis.corpusDiversity _),
    // maximum-inner-product top-k (un-normalized retrieval order)
    "ann_mips" -> (Similarity.annMips _),
    // triangle count + clustering coefficient over the near-dup graph
    "graph_triangles" -> (Dedup.graphTriangles _),
    // prefix autocomplete over the corpus vocabulary by df
    "search_suggest" -> (Search.searchSuggest _),
    // length-quartile curriculum staging via broadcast percentile cuts
    "train_curriculum" -> (Curation.trainCurriculum _),
    // image near-dup: average-hash bands, counted buckets, Hamming verify
    "mm_phash" -> (Multimodal.mmPhash _),
    // Welch-averaged per-channel PSD over the bandpower windows
    "ts_welch" -> (Timeseries.tsWelch _),
    // cumulative top-N vocabulary token-coverage curve
    "corpus_coverage" -> (TextAnalysis.corpusCoverage _),
    // data-constrained token-budget allocation with epoch caps
    "train_budget" -> (Curation.trainBudget _),
    // spectral entropy + flatness over the Welch harmonic powers
    "ts_spectral_entropy" -> (Timeseries.tsSpectralEntropy _),
    // image dup families: phash pair graph → CC with min-id survivors
    "mm_phash_clusters" -> (Multimodal.mmPhashClusters _),
    // deterministic Efraimidis-Spirakis weighted sample (md5 uniform)
    "sample_weighted" -> (Curation.sampleWeighted _),
    // indexed MIPS: norm-augmented LSH buckets + exact-dot rerank
    "ann_mips_lsh" -> (Similarity.annMipsLsh _),
    // LTTB shape-preserving render downsample (parallel variant)
    "ts_lttb" -> (Timeseries.tsLttb _),
    // inter-arrival mean/CV/burstiness per channel (stitched lag)
    "ts_arrival_stats" -> (Timeseries.tsArrivalStats _),
    // LSH S-curve calibration vs the empirical candidate histogram
    "dedup_tuning" -> (Dedup.dedupTuning _),
    // point-in-span join: samples × annotation islands, bucket equi-key
    "ts_span_join" -> (Timeseries.tsSpanJoin _),
    // M4 pixel-perfect render reduction (first/last/min/max per bucket)
    "ts_m4" -> (Timeseries.tsM4 _),
    // CUBE pricing summary: all grouping sets in one Expand + agg
    "q_cube" -> (Relational.qCube _),
    // pairwise source JSD over unigram distributions (mix distance)
    "corpus_jsd" -> (TextAnalysis.corpusJsd _),
    // repeated word spans across docs: the strings a cleaner would strip
    "corpus_boilerplate" -> (Dedup.corpusBoilerplate _),
    // local-maximum peaks with rise/drop magnitudes (block-halo lag/lead)
    "ts_peaks" -> (Timeseries.tsPeaks _),
    // event-locked grand-average template over the waveform envelope
    "ts_erp" -> (Timeseries.tsErp _),
    // dominant Welch harmonic per channel with its power share
    "ts_dominant_freq" -> (Timeseries.tsDominantFreq _),
    // substring grep through a trigram index probe + exact verify
    "search_substring" -> (Search.searchSubstring _),
    // energy VAD: voiced-frame islands over the decoded PCM stream
    "mm_audio_vad" -> (Multimodal.mmAudioVad _),
    // first/last-touch conversion attribution (bucketed per-user interval join)
    "ts_attribution" -> (Timeseries.tsAttribution _),
    // pairwise mutual information over binned hourly means (nonlinear dependence)
    "ts_mi" -> (Timeseries.tsMi _),
    // frame-difference shot boundaries over the sampled frame chain
    "mm_video_shots" -> (Multimodal.mmVideoShots _),
    // top user-journey event trigrams via the stitched block-halo lags
    "ts_journeys" -> (Timeseries.tsJourneys _),
    // per-dimension embedding stats: the dead/runaway dimension screen
    "embed_dims" -> (Similarity.embedDims _),
    // Welch two-sample t-test between channel pairs (A/B comparison)
    "ts_ttest" -> (Timeseries.tsTtest _),
    // ACF lags 1-3 + Durbin-Levinson partial autocorrelation
    "ts_pacf" -> (Timeseries.tsPacf _),
    // exact discrete p10/p50/p90 bands per (channel, hour)
    "ts_bands" -> (Timeseries.tsBands _),
    // label-filtered vector search (metadata predicate + cosine top-k)
    "ann_filtered" -> (Similarity.annFiltered _),
    // per-source dedup cost: docs and tokens lost to exact dedup
    "dedup_impact" -> (Dedup.dedupImpactQ _),
    // DAU/WAU/stickiness from the user-day summary (no event-grain window)
    "ts_dau" -> (Timeseries.tsDau _),
    // hourly error proportion with the 95% Wilson score interval
    "ts_error_rate" -> (Timeseries.tsErrorRate _),
    // per-source character-class profile (mojibake/format-drift screen)
    "corpus_charset" -> (TextAnalysis.corpusCharset _),
    // Benford first-digit screen with per-channel chi-square
    "ts_benford" -> (Timeseries.tsBenford _),
    // Wald-Wolfowitz runs test (order-sensitive randomness screen)
    "ts_runs" -> (Timeseries.tsRuns _),
    // byte-histogram entropy per payload (compressed/degenerate screen)
    "mm_entropy" -> (Multimodal.mmEntropy _),
    // order-3 permutation entropy (Bandt-Pompe ordinal complexity)
    "ts_perm_entropy" -> (Timeseries.tsPermEntropy _),
    // tolerance-bounded nearest-neighbor alignment (both directions)
    "ts_align" -> (Timeseries.tsAlign _),
    // bitwise-identical embedding vectors (exact dup screen)
    "embed_dups" -> (Similarity.embedDups _),
    // ROLLUP hierarchy subtotals over region -> nation revenue
    "q_rollup" -> (Relational.qRollup _),
    // Gumbel block-maxima fit + 30/365-day return levels
    "ts_extremes" -> (Timeseries.tsExtremes _),
    // seasonal-residual anomaly buckets (STL-residual k-sigma cut)
    "ts_anomaly" -> (Timeseries.tsAnomaly _),
    // truncated dyadic-kernel EWMA baseline over the bucket grid
    "ts_ewma" -> (Timeseries.tsEwma _),
    // directional lead-lag F-test per ordered channel pair
    "ts_granger" -> (Timeseries.tsGranger _),
    "ts_higuchi" -> (Timeseries.tsHiguchi _),
    "ts_dfa" -> (Timeseries.tsDfa _),
    "ts_sax" -> (Timeseries.tsSax _),
    // phase-locking value per channel pair (phase-only coupling next
    // to the amplitude-weighted ts_coherence)
    "ts_plv" -> (Timeseries.tsPlv _),
    // Lomb-Scargle periodogram: spectral estimate on the raw IRREGULAR
    // timestamps (the uneven-sampling twin of welch/bandpower)
    "ts_lomb" -> (Timeseries.tsLomb _),
    // banded DTW channel-pair distance over the z-normalized PAA grid
    // (nested-fold DP expression; raster recursive-CTE oracle)
    "ts_dtw" -> (Timeseries.tsDtw _),
    // Mann-Kendall trend + Sen's slope: integer order-statistic screen
    "ts_mk" -> (Timeseries.tsMk _),
    // graph-based ANN: beam search over the mined kNN graph (the
    // HNSW-class index family member), plus its recall acceptance curve
    "ann_graph" -> (Similarity.annGraph _),
    "ann_recall_graph" -> (Similarity.annRecallGraph _),
    // cross-modal retrieval: stub image encoder queried against the
    // text embedding corpus in the shared d=64 space
    "mm_crossmodal" -> (Multimodal.mmCrossmodal _),
    // WordPiece completes the tokenizer triad (BPE / unigram / wordpiece)
    "train_wordpiece" -> (Tokenizer.trainWordpiece _),
    "tokenize_wordpiece" -> (Tokenizer.tokenizeWordpiece _),
    // farthest-point diversity sampling (greedy k-center, Gonzalez 1985)
    "sample_kcenter" -> (Similarity.sampleKcenterQ _),
    // MMR diversification rerank (Carbonell-Goldstein 1998)
    "ann_mmr" -> (Similarity.annMmr _),
    // sample entropy: regularity screen via template-pair counting
    "ts_sampen" -> (Timeseries.tsSampen _),
    // two-sample Kolmogorov-Smirnov drift screen between time halves
    "ts_ks" -> (Timeseries.tsKs _),
    // Poincare-plot SD1/SD2/RMSSD descriptors over successive pairs
    "ts_poincare" -> (Timeseries.tsPoincare _),
    // matrix profile: per-position nearest-neighbor subsequence distance
    "ts_matrix_profile" -> (Timeseries.tsMatrixProfile _),
    // Ljung-Box portmanteau white-noise test over lags 1..6
    "ts_ljungbox" -> (Timeseries.tsLjungbox _),
    // Dickey-Fuller unit-root / stationarity test per channel
    "ts_adf" -> (Timeseries.tsAdf _),
    // Lo-MacKinlay variance-ratio random-walk test at q=2/4/8
    "ts_vr" -> (Timeseries.tsVr _),
    // rescaled-range Hurst exponent over dyadic block sizes
    "ts_hurst" -> (Timeseries.tsHurst _),
    // KPSS level-stationarity test (reversed-null complement of ts_adf)
    "ts_kpss" -> (Timeseries.tsKpss _),
    // count-min-sketch heavy hitters vs exact baseline (fixed-size
    // partial-merge aggregate; estimate column is engine-native)
    "corpus_cms" -> (TextAnalysis.corpusCms _),
    // hand-rolled HyperLogLog distinct-token sketch vs exact (oracle-
    // reproducible, unlike the native HLL++'s private seeds)
    "corpus_hll" -> (TextAnalysis.corpusHll _),
    // C4 line/document cleaning rule report (Raffel et al. 2020)
    "quality_c4" -> (TextAnalysis.qualityC4 _),
    // FineWeb/MassiveText repetition-removal battery (Penedo et al.
    // 2024; Rae et al. 2021 §A1.1)
    "quality_fineweb" -> (TextAnalysis.qualityFineweb _),
    // ExactSubstr span dedup: maximal duplicated ≥30-token spans
    // (Lee et al. 2022 §4, sliding-window form)
    "dedup_substr" -> (Dedup.dedupSubstr _),
    // one-row ExactSubstr removal budget (duplicated-token fraction)
    "dedup_substr_impact" -> (Dedup.dedupSubstrImpact _),
    // sampled closeness centrality over the mined near-dup graph
    // (Eppstein & Wang 2001, pinned sources)
    "graph_closeness" -> (Dedup.graphCloseness _),
    // sampled betweenness centrality (Brandes 2001, pinned sources)
    "graph_betweenness" -> (Dedup.graphBetweenness _),
    // fifth recall curve: the composed IVFADC index vs exact
    "ann_recall_ivfpq" -> (Similarity.annRecallIvfPq _),
    // bigram interpolated-LM document score (order-2 CCNet-style
    // quality screen next to text_perplexity's unigram prior)
    "text_perplexity2" -> (TextAnalysis.textPerplexity2 _),
    // unigram-LM tokenizer: hard-EM piece probabilities (Kudo 2018)
    "train_unigram" -> (Tokenizer.trainUnigram _),
    // per-doc token accounting under the trained unigram LM
    "tokenize_unigram" -> (Tokenizer.tokenizeUnigram _),
    // BPE vs unigram per-language parity (tokenizer selection report)
    "tokenize_parity" -> (Tokenizer.tokenizeParity _),
    // bigram conditional entropy H(W2|W1) per language: the
    // sequence-predictability screen (Shannon 1951)
    "corpus_cond_entropy" -> (TextAnalysis.corpusCondEntropy _),
    // offset-voting audio constellation match (Wang 2003): finds
    // time-shifted audio twins whole-blob hashing can't see
    "mm_audio_match" -> (Multimodal.mmAudioMatch _),
    // code-vs-prose router: 4-signal per-line-rate vote
    "text_code_detect" -> (TextAnalysis.textCodeDetect _),
    // one-row anisotropy report: mean share + top-eigendirection share
    // off the shared (mu, u1) — embed_debias's acceptance metric
    "embed_isotropy" -> (Similarity.embedIsotropy _),
    // fourth recall curve: SQ's loss is the shortlist margin only
    "ann_recall_sq" -> (Similarity.annRecallSq _),
    // per-lang tokenizer parity off the shared (memoized) BPE training
    "tokenize_fertility" -> (Tokenizer.tokenizeFertility _),
    // coreness ladder over the near-dup graph: iterated h-index rounds
    "graph_kcore" -> (Dedup.graphKcore _),
    // 1/f aperiodic exponent: log-log OLS over the welch summary
    "ts_psd_slope" -> (Timeseries.tsPsdSlope _),
    // Engle-Granger two-step: shared-trend test per channel pair
    "ts_cointegration" -> (Timeseries.tsCointegration _),
    // recurrence quantification: RR/DET/Lmax over the PAA grid
    "ts_rqa" -> (Timeseries.tsRqa _),
    // Davies-Bouldin: the cheap k-selection curve off the shared Lloyd run
    "cluster_db_index" -> (Similarity.clusterDbIndex _),
    // per-bin cross-doc contamination report for concat-and-chunk packing
    "pack_bins" -> (Packing.packBinsQ _),
    // IVFADC: coarse IVF cells + PQ asymmetric distance inside them,
    // sharing both existing index builds
    "ann_ivf_pq" -> (Similarity.annIvfPq _),
    // label-centroid cosine matrix (semantic source distance)
    "embed_label_sim" -> (Similarity.embedLabelSim _),
    // clustering-vs-labels external validation: NMI + purity + ARI
    // in one row off the shared kmeans trajectory's contingency table
    "cluster_nmi" -> (Similarity.clusterNmiQ _),
    // synchronous label-propagation communities over the mined pair
    // graph (density view beside dedup_clusters' connectivity view)
    "graph_communities" -> (Dedup.graphCommunities _),
    // Newman degree assortativity of the near-dup graph
    "graph_assortativity" -> (Dedup.graphAssortativity _),
    // neighbor-set Jaccard link prediction over the near-dup graph
    "graph_jaccard" -> (Dedup.graphJaccard _),
    // AND/NOT postings algebra over the query vocabulary
    "search_boolean" -> (Search.searchBoolean _),
    // token-balanced contiguous shard manifest via the pack prefix sum
    "train_shards" -> (Packing.trainShardsQ _),
    // per-source OOV rate against the capped global vocabulary
    "corpus_oov" -> (TextAnalysis.corpusOov _),
    // audio landmark constellation: dominant DFT band per PCM frame
    "mm_audio_fp" -> (Multimodal.mmAudioFp _),
    // hourly sampling-cadence drift vs the channel baseline
    "ts_cadence" -> (Timeseries.tsCadence _),
    // Population Stability Index between stream halves (drift metric)
    "ts_psi" -> (Timeseries.tsPsi _),
    // tightest two-term co-occurrence windows (highlight snippets)
    "search_snippet" -> (Search.searchSnippet _),
    // deterministic hash-bucket train/val/test split manifest
    "train_split" -> (Curation.trainSplitQ _),
    // recall@k of the IVF index vs the exact baseline
    "ann_recall_ivf" -> (Similarity.annRecallIvf _),
    // Haar wavelet per-level energy (multi-scale variance split)
    "ts_haar" -> (Timeseries.tsHaar _),
    // binary-segmentation changepoints (recursive CUSUM, depth 2)
    "ts_changepoints" -> (Timeseries.tsChangepoints _),
    // kNN-graph in-degree screen (hub/orphan pathology report)
    "embed_hubness" -> (Similarity.embedHubness _),
    // per-user first-order Markov transition matrix
    "ts_transitions" -> (Timeseries.tsTransitions _),
    // recall@k of the PQ index vs the exact baseline
    "ann_recall_pq" -> (Similarity.annRecallPq _),
    // holdout backtest of the trend forecaster (MAE + MASE vs naive)
    "ts_forecast_eval" -> (Timeseries.tsForecastEval _),
    // precision@k / MRR of BM25 vs conjunctive-match relevance
    "search_rank_eval" -> (Search.searchRankEval _),
    // montage -> band power chain (differential-channel spectra)
    "ts_montage_bandpower" -> (Timeseries.tsMontageBandpower _),
    // Gini of per-user activity (whale concentration, all-integer)
    "ts_gini" -> (Timeseries.tsGini _),
    // within-doc hapax rates (diversity tail next to repetition's head)
    "corpus_hapax" -> (TextAnalysis.corpusHapax _),
    "text_readability" -> (TextAnalysis.textReadability _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  /** Pre-round straddle-audit twins (see [[StraddleAudit.auditTwins]]):
    * per query, a frame of the UNROUNDED quantities its quantized
    * finals consumed, double columns named `<base>__s<k>` (k = the
    * final's rounding scale). The output-side straddle scan is blind
    * to a pre-round half-grid value — it rounds ONTO the grid in both
    * engines (possibly to opposite sides) before the scan sees it —
    * so Verify audits these frames beside each output. Registered for
    * the two historically driver-red queries; any operator can join.
    */
  def preRoundTwins: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_mk" -> (Timeseries.tsMkTwins _),
    "cluster_nmi" -> (Similarity.clusterNmiTwins _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1Sql,
    "q2_join" -> Relational.q2Sql,
    "q3_topk" -> Relational.q3Sql,
    "q4_window" -> Relational.q4Sql,
    "q5_semi" -> Relational.q5Sql,
    "q6_filter" -> Relational.q6Sql,
    "ts_range" -> Timeseries.tsRangeSql,
    "ts_downsample" -> Timeseries.tsDownsampleSql,
    "ts_fillgaps" -> Timeseries.tsFillgapsSql,
    "ts_skew_stats" -> Timeseries.tsSkewStatsSql,
    "ts_resample_chunk" -> Timeseries.tsResampleChunkSql,
    "ts_gaps" -> Timeseries.tsGapsSql,
    "ts_montage" -> Timeseries.tsMontageSql,
    "ts_montage_named" -> Timeseries.tsMontageNamedSql,
    "ts_montage_aligned" -> Timeseries.tsMontageAlignedSql,
    "ts_eventbin" -> Timeseries.tsEventBinSql,
    "ts_auto" -> Timeseries.tsAutoSql,
    "ts_layout_range" -> graft.sources.TsLayout.tsLayoutRangeSql,
    "ts_spikes" -> Timeseries.tsSpikesSql,
    "ts_asof" -> Timeseries.tsAsofSql,
    "ts_stats" -> Timeseries.tsStatsSql,
    "ts_channels" -> Timeseries.tsChannelsSql,
    "ts_annotations" -> Timeseries.tsAnnotationsSql,
    "ts_waveforms" -> Timeseries.tsWaveformsSql,
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_exact_hash" -> Dedup.dedupExactHashSql,
    "dedup_prefix" -> Dedup.dedupPrefixSql,
    "dedup_minhash" -> Dedup.dedupMinhashSql,
    "dedup_clusters" -> Dedup.dedupClustersSql,
    "dedup_simhash" -> Dedup.dedupSimhashSql,
    "dedup_ngram" -> Dedup.dedupNgramSql,
    "dedup_embed" -> Dedup.dedupEmbedSql,
    "dedup_embed_blocked" -> Dedup.dedupEmbedBlockedSql,
    "ann_bruteforce" -> Similarity.annBruteforceSql,
    "ann_lsh" -> Similarity.annLshSql,
    "ann_lsh_layout" -> Similarity.annLshSql,
    "ann_ivf" -> Similarity.annIvfSql,
    "text_tokens" -> TextAnalysis.textTokensSql,
    "text_quality" -> TextAnalysis.textQualitySql,
    "text_langid" -> TextAnalysis.textLangidSql,
    "langid_eval" -> TextAnalysis.langidEvalSql,
    "text_fingerprint" -> TextAnalysis.textFingerprintSql,
    "corpus_stats" -> TextAnalysis.corpusStatsSql,
    "text_split" -> TextAnalysis.textSplitSql,
    "text_chunk" -> TextAnalysis.textChunkSql,
    "dedup_cross_source" -> Dedup.dedupCrossSourceSql,
    "ann_knn_label" -> Similarity.annKnnLabelSql,
    "train_negatives" -> Similarity.trainNegativesSql,
    "embed_lof" -> Similarity.embedLofSql,
    "mm_decode" -> Multimodal.mmDecodeSql,
    "mm_frames" -> Multimodal.mmFramesSql,
    "ts_histogram" -> Timeseries.tsHistogramSql,
    "ts_acf" -> Timeseries.tsAcfSql,
    "pii_detect" -> Curation.piiDetectSql,
    "sample_stratified" -> Curation.sampleStratifiedSql,
    "train_mix" -> Curation.trainMixSql,
    "ts_sessions" -> Timeseries.tsSessionsSql,
    "ts_quantiles" -> Timeseries.tsQuantilesSql,
    "ts_bandpower" -> Timeseries.tsBandpowerSql,
    "text_repetition" -> TextAnalysis.textRepetitionSql,
    "text_decontam" -> Curation.textDecontamSql,
    "bm25_search" -> Search.bm25SearchSql,
    "embed_kmeans" -> Similarity.embedKmeansSql,
    "ts_xcorr" -> Timeseries.tsXcorrSql,
    "ts_interp" -> Timeseries.tsInterpSql,
    "dedup_semantic" -> Similarity.dedupSemanticSql,
    "ts_props" -> Timeseries.tsPropsSql,
    "ann_ivf_kmeans" -> Similarity.annIvfKmeansSql,
    "ts_funnel" -> Timeseries.tsFunnelSql,
    "corpus_drift" -> TextAnalysis.corpusDriftSql,
    "corpus_burstiness" -> TextAnalysis.corpusBurstinessSql,
    "ts_orc_range" -> graft.sources.OrcLayout.tsOrcRangeSql,
    "corpus_keywords" -> TextAnalysis.corpusKeywordsSql,
    "ts_zscore" -> Timeseries.tsZscoreSql,
    "dedup_semantic_clusters" -> Similarity.dedupSemanticClustersSql,
    "sample_coreset" -> Similarity.sampleCoresetSql,
    "ts_blob_range" -> graft.sources.BlobStore.tsBlobRangeSql,
    "corpus_rollup" -> TextAnalysis.corpusRollupSql,
    "ts_pivot" -> Timeseries.tsPivotSql,
    "ts_retention" -> Timeseries.tsRetentionSql,
    "ts_montage_channels" -> Timeseries.tsMontageChannelsSql,
    // the dedup_clusters oracle verbatim: star contraction and
    // min-label propagation must agree on the clustering
    "dedup_clusters_star" -> Dedup.dedupClustersSql,
    "dedup_report" -> Dedup.dedupReportSql,
    "dedup_matrix" -> Dedup.dedupMatrixSql,
    "train_dedup_weights" -> Dedup.trainDedupWeightsSql,
    "ann_pq" -> Similarity.annPqSql,
    "dedup_spans" -> Dedup.dedupSpansSql,
    "dedup_passage" -> Dedup.dedupPassageSql,
    "corpus_overlap" -> Dedup.corpusOverlapSql,
    "text_perplexity" -> TextAnalysis.textPerplexitySql,
    "pack_sequences" -> Packing.packSequencesSql,
    "dedup_containment" -> Dedup.dedupContainmentSql,
    "train_dsir" -> Curation.trainDsirSql,
    "train_classifier" -> Curation.trainClassifierSql,
    "train_bpe" -> Tokenizer.trainBpeSql,
    "corpus_funnel" -> Curation.corpusFunnelSql,
    "search_hybrid" -> Search.searchHybridSql,
    "ts_coherence" -> Timeseries.tsCoherenceSql,
    "corpus_ngrams" -> TextAnalysis.corpusNgramsSql,
    "mm_resize" -> Multimodal.mmResizeSql,
    "graph_pagerank" -> Dedup.graphPagerankSql,
    "embed_pca" -> Similarity.embedPcaSql,
    "q7_volume" -> Relational.q7Sql,
    "quality_gopher" -> TextAnalysis.qualityGopherSql,
    "sample_temperature" -> Curation.sampleTemperatureSql,
    "ts_pyramid" -> Timeseries.tsPyramidSql,
    "tokenize_bpe" -> Tokenizer.tokenizeBpeSql,
    "mm_audio" -> Multimodal.mmAudioSql,
    "cluster_topics" -> Similarity.clusterTopicsSql,
    "q8_market" -> Relational.q8Sql,
    "embed_outliers" -> Similarity.embedOutliersSql,
    "embed_silhouette" -> Similarity.embedSilhouetteSql,
    "ann_radius" -> Similarity.annRadiusSql,
    "text_entropy" -> TextAnalysis.textEntropySql,
    "dedup_bloom" -> Dedup.dedupBloomSql,
    "ts_fir" -> Timeseries.tsFirSql,
    "ts_dow_profile" -> Timeseries.tsDowProfileSql,
    "search_phrase" -> Search.searchPhraseSql,
    "q10_returns" -> Relational.q10Sql,
    "ts_shift" -> Timeseries.tsShiftSql,
    "ts_cusum" -> Timeseries.tsCusumSql,
    "ann_sq" -> Similarity.annSqSql,
    "ann_recall" -> Similarity.annRecallSql,
    "embed_debias" -> Similarity.embedDebiasSql,
    "corpus_zipf" -> TextAnalysis.corpusZipfSql,
    "corpus_heaps" -> TextAnalysis.corpusHeapsSql,
    "q18_big" -> Relational.q18Sql,
    "q12_priority" -> Relational.q12Sql,
    "q14_promo" -> Relational.q14Sql,
    "q19_bands" -> Relational.q19Sql,
    "q16_counts" -> Relational.q16Sql,
    "q22_anti" -> Relational.q22Sql,
    "q13_dist" -> Relational.q13Sql,
    "q15_top" -> Relational.q15Sql,
    "q17_small" -> Relational.q17Sql,
    "q9_profit" -> Relational.q9Sql,
    "q11_partvalue" -> Relational.q11Sql,
    "q20_potential" -> Relational.q20Sql,
    "q21_waiting" -> Relational.q21Sql,
    "corpus_pmi" -> TextAnalysis.corpusPmiSql,
    "search_fuzzy" -> Search.searchFuzzySql,
    "search_mlt" -> Search.searchMltSql,
    "ts_rolling" -> Timeseries.tsRollingSql,
    "ts_seasonal" -> Timeseries.tsSeasonalSql,
    "ts_hjorth" -> Timeseries.tsHjorthSql,
    "ts_hampel" -> Timeseries.tsHampelSql,
    "ts_linelength" -> Timeseries.tsLinelengthSql,
    "ts_forecast" -> Timeseries.tsForecastSql,
    "corpus_diversity" -> TextAnalysis.corpusDiversitySql,
    "ann_mips" -> Similarity.annMipsSql,
    "graph_triangles" -> Dedup.graphTrianglesSql,
    "search_suggest" -> Search.searchSuggestSql,
    "train_curriculum" -> Curation.trainCurriculumSql,
    "mm_phash" -> Multimodal.mmPhashSql,
    "ts_welch" -> Timeseries.tsWelchSql,
    "corpus_coverage" -> TextAnalysis.corpusCoverageSql,
    "train_budget" -> Curation.trainBudgetSql,
    "ts_spectral_entropy" -> Timeseries.tsSpectralEntropySql,
    "mm_phash_clusters" -> Multimodal.mmPhashClustersSql,
    "sample_weighted" -> Curation.sampleWeightedSql,
    "ann_mips_lsh" -> Similarity.annMipsLshSql,
    "ts_lttb" -> Timeseries.tsLttbSql,
    "ts_arrival_stats" -> Timeseries.tsArrivalStatsSql,
    "dedup_tuning" -> Dedup.dedupTuningSql,
    "ts_span_join" -> Timeseries.tsSpanJoinSql,
    "ts_m4" -> Timeseries.tsM4Sql,
    "q_cube" -> Relational.qCubeSql,
    "corpus_jsd" -> TextAnalysis.corpusJsdSql,
    "corpus_boilerplate" -> Dedup.corpusBoilerplateSql,
    "ts_peaks" -> Timeseries.tsPeaksSql,
    "ts_erp" -> Timeseries.tsErpSql,
    "ts_dominant_freq" -> Timeseries.tsDominantFreqSql,
    "search_substring" -> Search.searchSubstringSql,
    "mm_audio_vad" -> Multimodal.mmAudioVadSql,
    "ts_attribution" -> Timeseries.tsAttributionSql,
    "ts_mi" -> Timeseries.tsMiSql,
    "mm_video_shots" -> Multimodal.mmVideoShotsSql,
    "ts_journeys" -> Timeseries.tsJourneysSql,
    "embed_dims" -> Similarity.embedDimsSql,
    "ts_ttest" -> Timeseries.tsTtestSql,
    "ts_pacf" -> Timeseries.tsPacfSql,
    "ts_bands" -> Timeseries.tsBandsSql,
    "ann_filtered" -> Similarity.annFilteredSql,
    "dedup_impact" -> Dedup.dedupImpactSql,
    "ts_dau" -> Timeseries.tsDauSql,
    "ts_error_rate" -> Timeseries.tsErrorRateSql,
    "corpus_charset" -> TextAnalysis.corpusCharsetSql,
    "ts_benford" -> Timeseries.tsBenfordSql,
    "ts_runs" -> Timeseries.tsRunsSql,
    "mm_entropy" -> Multimodal.mmEntropySql,
    "ts_perm_entropy" -> Timeseries.tsPermEntropySql,
    "ts_align" -> Timeseries.tsAlignSql,
    "embed_dups" -> Similarity.embedDupsSql,
    "q_rollup" -> Relational.qRollupSql,
    "ts_extremes" -> Timeseries.tsExtremesSql,
    "ts_anomaly" -> Timeseries.tsAnomalySql,
    "ts_ewma" -> Timeseries.tsEwmaSql,
    "ts_granger" -> Timeseries.tsGrangerSql,
    "ts_higuchi" -> Timeseries.tsHiguchiSql,
    "ts_dfa" -> Timeseries.tsDfaSql,
    "ts_sax" -> Timeseries.tsSaxSql,
    "ts_plv" -> Timeseries.tsPlvSql,
    "ts_lomb" -> Timeseries.tsLombSql,
    "ts_dtw" -> Timeseries.tsDtwSql,
    "ts_mk" -> Timeseries.tsMkSql,
    "ann_graph" -> Similarity.annGraphSql,
    "ann_recall_graph" -> Similarity.annRecallGraphSql,
    "mm_crossmodal" -> Multimodal.mmCrossmodalSql,
    "train_wordpiece" -> Tokenizer.trainWordpieceSql,
    "tokenize_wordpiece" -> Tokenizer.tokenizeWordpieceSql,
    "sample_kcenter" -> Similarity.sampleKcenterSql,
    "ann_mmr" -> Similarity.annMmrSql,
    "ts_sampen" -> Timeseries.tsSampenSql,
    "ts_ks" -> Timeseries.tsKsSql,
    "corpus_hll" -> TextAnalysis.corpusHllSql,
    "quality_c4" -> TextAnalysis.qualityC4Sql,
    "quality_fineweb" -> TextAnalysis.qualityFinewebSql,
    "dedup_substr" -> Dedup.dedupSubstrSql,
    "text_perplexity2" -> TextAnalysis.textPerplexity2Sql,
    "tokenize_parity" -> Tokenizer.tokenizeParitySql,
    "dedup_substr_impact" -> Dedup.dedupSubstrImpactSql,
    "graph_closeness" -> Dedup.graphClosenessSql,
    "graph_betweenness" -> Dedup.graphBetweennessSql,
    "ann_recall_ivfpq" -> Similarity.annRecallIvfPqSql,
    "train_unigram" -> Tokenizer.trainUnigramSql,
    "tokenize_unigram" -> Tokenizer.tokenizeUnigramSql,
    "ann_ivf_pq" -> Similarity.annIvfPqSql,
    "corpus_cond_entropy" -> TextAnalysis.corpusCondEntropySql,
    "mm_audio_match" -> Multimodal.mmAudioMatchSql,
    "text_code_detect" -> TextAnalysis.textCodeDetectSql,
    "embed_isotropy" -> Similarity.embedIsotropySql,
    "ann_recall_sq" -> Similarity.annRecallSqSql,
    "tokenize_fertility" -> Tokenizer.tokenizeFertilitySql,
    "graph_kcore" -> Dedup.graphKcoreSql,
    "ts_psd_slope" -> Timeseries.tsPsdSlopeSql,
    "ts_cointegration" -> Timeseries.tsCointegrationSql,
    "ts_rqa" -> Timeseries.tsRqaSql,
    "cluster_db_index" -> Similarity.clusterDbIndexSql,
    "pack_bins" -> Packing.packBinsSql,
    "ts_poincare" -> Timeseries.tsPoincareSql,
    "ts_matrix_profile" -> Timeseries.tsMatrixProfileSql,
    "ts_ljungbox" -> Timeseries.tsLjungboxSql,
    "ts_adf" -> Timeseries.tsAdfSql,
    "ts_vr" -> Timeseries.tsVrSql,
    "ts_hurst" -> Timeseries.tsHurstSql,
    "ts_kpss" -> Timeseries.tsKpssSql,
    "embed_label_sim" -> Similarity.embedLabelSimSql,
    "cluster_nmi" -> Similarity.clusterNmiSql,
    "graph_jaccard" -> Dedup.graphJaccardSql,
    "graph_communities" -> Dedup.graphCommunitiesSql,
    "graph_assortativity" -> Dedup.graphAssortativitySql,
    "search_boolean" -> Search.searchBooleanSql,
    "train_shards" -> Packing.trainShardsSql,
    "corpus_oov" -> TextAnalysis.corpusOovSql,
    "mm_audio_fp" -> Multimodal.mmAudioFpSql,
    "ts_cadence" -> Timeseries.tsCadenceSql,
    "ts_psi" -> Timeseries.tsPsiSql,
    "search_snippet" -> Search.searchSnippetSql,
    "train_split" -> Curation.trainSplitSql,
    "ann_recall_ivf" -> Similarity.annRecallIvfSql,
    "ts_haar" -> Timeseries.tsHaarSql,
    "ts_changepoints" -> Timeseries.tsChangepointsSql,
    "embed_hubness" -> Similarity.embedHubnessSql,
    "ts_transitions" -> Timeseries.tsTransitionsSql,
    "ann_recall_pq" -> Similarity.annRecallPqSql,
    "ts_forecast_eval" -> Timeseries.tsForecastEvalSql,
    "search_rank_eval" -> Search.searchRankEvalSql,
    "ts_montage_bandpower" -> Timeseries.tsMontageBandpowerSql,
    "ts_gini" -> Timeseries.tsGiniSql,
    "corpus_hapax" -> TextAnalysis.corpusHapaxSql,
    "text_readability" -> TextAnalysis.textReadabilitySql
  )
}
