package graft.queries

/** THE CAN'T-TWIN REGISTRY (VERDICT r13 item 5) — the streaming-twin
  * discipline is this library's signature proof technique (a batch
  * query's mergeable state streamed per micro-batch, sum/union/max-
  * merged, finished at serving time, sharing the batch oracle
  * hash-proven), so every batch query that has NO oracle-shared
  * streaming twin carries a DECLARED reason here. Twin gaps are
  * design, never drift: `TwinRegistrySpec` machine-checks the
  * three-way partition
  *
  *   batch = oracle-twinned ⊎ differentSemantics ⊎ cantTwin
  *
  * against `SparkEntry.queries`/`oracleSql` (oracle-twinned = the
  * batch queries whose oracle SQL string is shared verbatim by a
  * `stream_*` entry), so a new batch query cannot land untwinned and
  * unregistered, and a registered query that later GETS a twin fails
  * the staleness check until its entry is removed.
  */
object TwinRegistry {

  /** Batch queries whose functional streaming counterpart ships with
    * its OWN oracle (event-time windowed semantics differ from the
    * batch snapshot's by design — incremental emission, watermark
    * cutoffs — so the oracles legitimately differ): batch name →
    * the stream query that carries the semantics online.
    */
  val differentSemantics: Map[String, String] = Map(
    "events_window_agg" -> "stream_window_agg",
    "events_sliding_window" -> "stream_sliding_window",
    "events_sessionize" -> "stream_session_window",
    "events_gapfill" -> "stream_gapfill",
    "events_gapfill_lerp" -> "stream_gapfill_tws",
    "events_dedup_first" -> "stream_dedup_within_wm",
    "events_asof_join" -> "stream_stream_join")

  /** reason → the batch queries it covers. Reasons, in the order a
    * reviewer should test them against a candidate query:
    *
    * - `relational-sql-idiom`: the SURVEY §2.3-8 relational/SQL
    *   surface (DML, recursive CTE, pivot/lateral/set-op idioms, scan
    *   formats, join-strategy demos) — batch SQL semantics
    *   demonstrations; several are unsupported or meaningless under
    *   Structured Streaming (multi-pass DML, recursive CTE, global
    *   sorts), and none is a standing aggregate a stream maintains.
    * - `sensor-batch-twin-of-stream`: these ARE the deterministic
    *   batch twins of the streaming source (SURVEY §2 #1-8); the
    *   stream side ships as SensorStream/PseudoWindow — a "streaming
    *   twin" would be circular.
    * - `train-time-artifact-build`: index/tokenizer CONSTRUCTION
    *   (iterative Lloyd rounds, BPE merges, codebooks) and top-k
    *   serving against the frozen result. Build is a train-time batch
    *   job by definition; serving is request/response, not a standing
    *   aggregate. The ingest posture IS twinned
    *   (stream_ann_index_append).
    * - `corpus-pair-or-graph-topology`: whole-corpus pair/graph
    *   work (LSH bands, connected components, k-core, kNN graphs,
    *   blocking-pair scores). Incremental maintenance of these is a
    *   structurally different algorithm, not a merge law; the
    *   family's incremental representatives ARE twinned
    *   (dedup_incremental, dedup_incremental_bloom,
    *   stream_incremental_dedup).
    * - `performance-posture-variant`: _fast/_scaled/_hier_scaled
    *   cost-posture twins of batch anchors — the twin discipline
    *   applies to the anchor family's semantics, which are pinned
    *   elsewhere; these exist to carry measured scale rows.
    * - `sequential-no-merge-law`: per-key ORDER-dependent extraction
    *   (lag pairs, prefix scans, path concatenation, first/last-touch
    *   credit, drift alarms on prefix statistics). No additive merge
    *   law exists — transition pairs and prefix states cross
    *   micro-batch boundaries — so a twin needs keyed state machinery
    *   (mapGroupsWithState), outside the sum-merge replay harness;
    *   the keyed-state machinery itself is covered by the gap-fill /
    *   pseudo-window operators.
    * - `stateless-per-row`: pure per-row projections or scoring
    *   against frozen artifacts (redaction, codec decode, z-score vs
    *   frozen moments). Map-only — there is no state to merge, hence
    *   no merge law to prove; a stream runs the identical projection
    *   trivially.
    * - `mergeable-replay-bounded`: finishes whose state IS mergeable
    *   and whose merge law is already hash-proven by a named sibling
    *   twin on the same state class (moments, contingency cells,
    *   sketches, per-user totals). Twins are omitted deliberately to
    *   bound the per-round stream-replay count — each twin costs a
    *   full fixture replay in Verify/Bench — not because a law is
    *   missing.
    * - `corpus-snapshot-stage`: offline curation stages whose batch
    *   pass over a frozen corpus snapshot IS the product (packing,
    *   shuffling, split assignment, dataset cards, DP releases). A
    *   "streamed" version would recompute the snapshot per batch
    *   rather than maintain anything; the CDC-maintenance posture IS
    *   twinned (cdc_agg_maintain/stream_cdc_maintain).
    * - `query-time-serving-or-eval`: search serving and ranking
    *   evaluation over an indexed snapshot (BM25, RRF fusion, MMR,
    *   nDCG) — request/response over stored artifacts.
    */
  val cantTwin: Map[String, Seq[String]] = Map(
    "relational-sql-idiom" -> Seq(
      "q1_agg", "q3_top_orders", "q5_regional_revenue", "q_anti_join",
      "q_bucketed_join", "q_cube", "q_distinct_agg", "q_expectations",
      "q_percentiles", "q_range_join", "q_rollup", "q_salted_join",
      "q_scalar_funcs", "q_scan_csv", "q_scan_json", "q_scan_orc",
      "q_semi_join", "q_set_ops", "q_set_ops_all", "q_sql_correlated",
      "q_sql_delete", "q_sql_filter_agg", "q_sql_groupingsets",
      "q_sql_ignore_nulls", "q_sql_lateral", "q_sql_merge",
      "q_sql_native_funcs", "q_sql_order_priority", "q_sql_outer_join",
      "q_sql_pipe", "q_sql_pivot", "q_sql_recursive",
      "q_sql_small_quantity_revenue", "q_sql_unpivot", "q_sql_update",
      "q_topk_orders", "q_typed_wavg", "q_window_dist",
      "q_window_range_frame", "q_window_rank", "q_window_running"),
    "sensor-batch-twin-of-stream" -> Seq(
      "sensor_points", "sensor_pressure_series", "sensor_value_domain",
      "sensor_window_count"),
    "train-time-artifact-build" -> Seq(
      "ann_recall_ivf", "ann_topk_bruteforce", "ann_topk_fast",
      "ann_topk_filtered", "ann_topk_ivf", "ann_topk_ivf_fast",
      "ann_topk_ivf_trained", "ann_topk_ivfpq", "ann_topk_lsh",
      "ann_topk_lsh_fast", "ann_topk_pq", "ann_topk_pq_rerank",
      "ann_topk_sq", "kmeans_step", "kmeans_train", "pq_codebook",
      "pq_codes", "sq_codes", "sq_minmax", "emb_lsh_buckets",
      "text_bpe_train", "text_bpe_merge", "text_bpe_pairs",
      "text_bpe_tokens", "text_bpe_encode",
      // r17: the many-round trainer is the same vocab-build stage
      "text_bpe_train10"),
    "corpus-pair-or-graph-topology" -> Seq(
      "dedup_cc", "dedup_containment", "dedup_dbscan",
      "dedup_embedding_pairs", "dedup_jaccard_pairs",
      "dedup_jaro_winkler", "dedup_lsh_eval", "dedup_lsh_keep",
      "dedup_lsh_pairs", "dedup_lsh_sweep", "dedup_minhash_bands",
      "dedup_ngram_pairs", "dedup_semantic", "dedup_simhash",
      "dedup_sorted_neighborhood", "dedup_substring",
      // r15: the coverage finish + per-source impact on the same
      // corpus-wide gram-df topology (df ≥ 2 is a whole-corpus fact)
      "dedup_substring_spans", "dedup_substring_coverage",
      // r16: the maximal-span audit is the coverage finish re-grouped
      // on the same corpus-wide gram-df topology
      "dedup_substring_intervals",
      // (dedup_substring_incremental left this registry in r16: its
      // gram-df topology is consumed only as a frozen base-side table,
      // so it twins the stream_incremental_dedup way —
      // stream_substring_incremental shares its oracle, hash-proven)
      "er_canonical", "graph_adamic_adar",
      // r14 wave 7: the Jaccard finish on adamic_adar's wedge chain
      "graph_jaccard_linkpred",
      // r14 wave 8: degree-gated edge density on the same topology
      "graph_rich_club",
      "graph_assortativity", "graph_bfs", "graph_hits", "graph_kcore",
      "graph_lpa", "graph_modularity", "graph_pagerank", "graph_ppr",
      "graph_triangles", "mm_near_dup", "mm_near_dup_perceptual",
      "mm_near_dup_eval",
      // r16: frame-sequence banding is the same whole-corpus bucket
      // topology, per aligned frame
      "mm_video_near_dup", "mm_video_near_dup_eval",
      // r17: audio fingerprint banding, same whole-corpus bucket
      // topology as the image/video tiers
      "mm_audio_near_dup", "mm_audio_near_dup_eval",
      // r17: the verified near-dup graph (LSH buckets → Jaccard-
      // verified edges → CC) and the release split keyed on its
      // components — whole-corpus graph topology like dedup_cc
      "dedup_lsh_verified", "pipeline_split_verified",
      "emb_knn_graph",
      "emb_knn_accuracy", "emb_intrinsic_dim", "emb_centroid_sim",
      "emb_triplet_eval", "text_bleu_pairs", "text_rouge_pairs",
      "graph_closeness_sampled", "emb_matryoshka_recall",
      "pipeline_cluster_sizes", "graph_degree_distribution",
      "pipeline_hard_negatives"),
    "performance-posture-variant" -> Seq(
      "dedup_semantic_fast", "dedup_semantic_scaled",
      "dedup_semantic_hier_scaled", "dedup_dbscan_scaled",
      "emb_knn_graph_scaled", "emb_knn_graph_hier_scaled",
      "emb_intrinsic_dim_scaled", "emb_intrinsic_dim_hier_scaled",
      "emb_knn_accuracy_scaled", "emb_knn_accuracy_hier_scaled"),
    "sequential-no-merge-law" -> Seq(
      "events_page_hinkley", "events_interarrival", "text_heaps_law",
      "events_changepoint_multi", "events_markov",
      "events_markov_stationary", "events_markov_stationary_absorbing",
      "events_lag_features", "events_paths", "events_attribution",
      "events_attribution_position", "events_binning"),
    "stateless-per-row" -> Seq(
      // r16: mojibake repair + NFC is one map-only projection
      "text_normalize",
      "text_redact", "text_chunk", "text_fingerprint", "text_langid",
      "text_quality", "text_c4_filters", "text_repetition",
      "layout_zorder", "layout_hilbert", "mm_audio_decode",
      "mm_audio_features", "mm_audio_pitch", "mm_decode_dims",
      "mm_features", "mm_frame_sample", "mm_resize",
      "pipeline_anonymize", "events_json_props", "events_variant_props",
      "emb_ood_zscore", "emb_ood_mahalanobis", "emb_pq_distortion"),
    "mergeable-replay-bounded" -> Seq(
      "dedup_exact", "events_ab_cuped", "events_retention_triangle",
      "events_cross_corr", "events_anomaly", "events_anomaly_iqr",
      "events_anomaly_mad", "events_anomaly_seasonal", "events_srm",
      "sketch_join_size", "sketch_kmv_jaccard",
      "sketch_quantiles_by_type", "text_bigram_lm", "text_stats",
      "text_token_freq", "text_zipf", "text_quality_brier",
      "text_quality_lr_calibration",
      "text_quality_lr_cv", "text_quality_nb", "text_quality_auc",
      "events_profile", "events_profile_approx", "events_pivot",
      "events_bartlett", "text_simpson_diversity",
      // r14: the (type,value)/(type,ts) grids and presence flags these
      // read are the proven ksGrid / max-merge state classes
      // (stream_ks_test, stream_mannwhitney, stream_anova carry the
      // laws); finishes omitted to bound the replay count
      // (kruskal_wallis / tukey_hsd / brown_forsythe got their own
      // twins)
      "events_mcnemar", "events_spearman", "events_friedman",
      "events_cochran_q",
      // r14: third finish on stream_lexical_diversity's proven cells
      "text_good_turing",
      // r14 wave 5: fourth finishes on already-twinned state classes —
      // ksGrid (stream_ks_test), the survival death/censor grid
      // (stream_survival / stream_cum_hazard), the chisq contingency
      // cells (stream_chisq); replay count bounded, laws proven
      "events_wasserstein", "events_logrank", "events_cramers_v",
      "events_theils_u",
      // r14 wave 11: Hopkins scans against frozen md5 probes (the
      // per-probe decimal min is a max-merge law; no twin yet —
      // the probe/corpus replay would be the whole query)
      // (wave 12: mantel_haenszel/kendall_tau/hill_tail/rmst/
      // burstiness/sign_test got their own streaming twins and left
      // this registry)
      "emb_hopkins",
      // r14 wave 13b: exact quartiles on the (type, value) count
      // grid (stream_ks_test's additive grid class)
      "events_bowley_skew"),
      // (r14 wave 9: theil_index/chao1/mood_median/welch_anova/
      // cliffs_delta got their own streaming twins and left this
      // registry)
    "corpus-snapshot-stage" -> Seq(
      "pipeline_pack", "pipeline_pack_efficiency", "pipeline_shuffle",
      "pipeline_split", "pipeline_select", "pipeline_mix",
      "pipeline_sample", "pipeline_sample_weighted",
      "pipeline_dataset_card", "pipeline_pareto",
      "pipeline_k_anonymity", "pipeline_dp_release",
      "pipeline_contamination", "pipeline_dedup_impact",
      // r16: the coverage-gated keep/strip/drop decision is the same
      // snapshot-stage class as pipeline_select
      "pipeline_select_v2",
      // r15: the span-dedup report + transform are corpus-release
      // stages like dedup_impact/select (their df≥2 input is the
      // coverage topology, but the queries themselves are the
      // snapshot report and the applied rewrite)
      "pipeline_substring_impact", "pipeline_substring_strip",
      "pipeline_ccnet_buckets", "pipeline_curriculum",
      "pipeline_stratified_split", "pipeline_token_stats",
      "pipeline_source_report", "cdc_scd2", "cdc_snapshot"),
    "query-time-serving-or-eval" -> Seq(
      "search_hybrid_rrf", "search_hybrid_rrf_indexed", "search_mmr",
      "search_ndcg", "search_retrieval_eval", "search_tfidf_cosine",
      "text_bm25", "text_inverted_index", "text_keywords"))
}
