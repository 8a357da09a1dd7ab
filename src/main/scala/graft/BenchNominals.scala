package graft

/** Per-query clean-run nominal BANDS for the graded SF — (lo, hi) over a
  * set of >= 3 clean `graft.Bench` runs at sf0.1/local[32] (each with
  * `suspect_congestion: false` and a flat canary series). The HIGH edge
  * is what Bench's congestion machinery compares against
  * (widenRetrySet / uniformlySlow / needsAnotherRetry): under the
  * materialize-era ±12% run-to-run band, a single-run nominal caught
  * near its distribution's low edge made the 1.5x trigger fire on
  * ordinary clean variance; 1.5x the observed MAX does not, while a
  * genuine congestion window (2-6x) still lands far past it.
  * Regenerate with `python3 tools/gen_nominals.py` fed the
  * CONCATENATED stdout of >= 3 clean runs; values are measurements,
  * not budgets — a stale band costs one wasted re-measurement, never a
  * corrupted number.
  */
object BenchNominals {

  /** Nominals apply only to the SF they were measured at; the returned
    * map carries each query's band HIGH edge (see scaladoc above).
    */
  def forDir(sfDir: String): Map[String, Double] = {
    // basename EQUALITY, not endsWith: ".../xsf0.1" is a different
    // dataset and applying sf0.1 nominals to it would trigger spurious
    // widened retries (self-correcting but wasted re-runs)
    val base = sfDir.replaceAll("/+$", "").split('/').last
    if (base == "sf0.1") sf01.map { case (k, (_, hi)) => k -> hi }
    else Map.empty
  }

  /** Clean-host nominal for Bench's fixed-work canary (seconds). The
    * canary burns a fixed 64M-term hash sum on 32 slices, so its cost
    * is SF-independent and depends only on effective machine
    * throughput; congestion windows measure 2-6x this. Bench's gates
    * (pre-loop and per-stride mid-loop) compare each sample against
    * 1.5x this value and briefly wait out a busy host instead of
    * timing a known-congested segment (VERDICT r15 #8 / r16 nit 2).
    *
    * Calibrated round 17 from 80 clean-run samples across five
    * 143-query runs: median 0.313, p90 0.359, max 0.435 — the old
    * 0.30 nominal put the 0.45 gate limit 3% above the observed
    * clean MAX, so an ordinary tail sample (one 0.469 observed on a
    * quiet host) armed the suspect flag as fake congestion evidence.
    * 0.32 keeps the limit (0.48) above the clean tail while real
    * windows (0.6-1.8s samples) still trip it instantly.
    */
  val canaryNominal: Double = 0.32

  val sf01: Map[String, (Double, Double)] = Map(
    "r01_scan_project" -> ((0.298, 0.369)),
    "r02_star" -> ((0.147, 0.163)),
    "r03_filter_and_or" -> ((0.430, 0.543)),
    "r04_filter_comparators" -> ((0.374, 0.439)),
    "r05_distinct" -> ((0.351, 0.413)),
    "r06_agg_global" -> ((0.193, 0.220)),
    "r07_multi_agg" -> ((0.411, 0.563)),
    "r08_cross_join_filter" -> ((0.230, 0.298)),
    "r09_nway_join" -> ((0.297, 0.370)),
    "s01_group_agg" -> ((0.821, 1.005)),
    "s02_having" -> ((0.466, 0.587)),
    "s03_orderby_limit" -> ((0.159, 0.190)),
    "s04_join_inner" -> ((0.395, 0.431)),
    "s05_join_left" -> ((0.882, 1.096)),
    "s06_join_full" -> ((0.466, 0.591)),
    "s07_semi_join" -> ((0.362, 0.479)),
    "s08_anti_join" -> ((0.293, 0.365)),
    "s09_union_all" -> ((0.474, 0.623)),
    "s10_union_distinct" -> ((0.428, 0.519)),
    "s11_intersect" -> ((0.418, 0.575)),
    "s12_except" -> ((0.338, 0.416)),
    "s13_case_when" -> ((0.373, 0.485)),
    "s14_between_in_like" -> ((0.198, 0.240)),
    "s15_arith_cast" -> ((0.333, 0.405)),
    "s16_scalar_subquery" -> ((0.367, 0.544)),
    "s17_in_subquery" -> ((0.421, 0.606)),
    "s18_exists_sql" -> ((0.757, 0.987)),
    "s19_window_topk" -> ((0.483, 0.661)),
    "s20_window_running" -> ((0.274, 0.410)),
    "s21_window_lag" -> ((0.252, 0.337)),
    "s22_rollup" -> ((0.494, 0.705)),
    "s23_cube" -> ((0.335, 0.518)),
    "s24_tpch_q3" -> ((0.561, 0.739)),
    "s25_tpch_q5" -> ((0.667, 1.084)),
    "s26_string_funcs" -> ((0.247, 0.390)),
    "s27_date_funcs" -> ((0.393, 0.546)),
    "s28_count_distinct" -> ((0.841, 0.965)),
    "s29_approx_distinct" -> ((1.785, 2.287)),
    "s30_grouping_sets" -> ((0.359, 0.432)),
    "s31_sql_entry" -> ((0.299, 0.396)),
    "s32_from_subquery" -> ((0.151, 0.203)),
    "s33_join_using" -> ((0.124, 0.163)),
    "s34_bitwise" -> ((0.226, 0.295)),
    "s35_is_null" -> ((0.376, 0.477)),
    "s36_concat_op" -> ((0.106, 0.141)),
    "s37_percentile" -> ((0.313, 0.428)),
    "s38_date_arith" -> ((0.399, 0.577)),
    "s39_regexp" -> ((0.150, 0.207)),
    "s40_tpch_q13" -> ((0.532, 0.711)),
    "s41_tpch_q18" -> ((0.609, 0.838)),
    "s42_pivot" -> ((0.326, 0.426)),
    "s43_unpivot" -> ((0.239, 0.313)),
    "s44_array_agg" -> ((0.225, 0.304)),
    "s45_window_rank_funcs" -> ((0.361, 0.411)),
    "s46_stratified_sample" -> ((0.505, 0.597)),
    "s47_tpch_q4" -> ((0.694, 0.841)),
    "s48_tpch_q10" -> ((0.761, 1.077)),
    "s49_map_funcs" -> ((0.289, 0.413)),
    "s50_date_spine" -> ((0.368, 0.433)),
    "x01_dedup_exact" -> ((0.296, 0.329)),
    "x02_token_stats" -> ((0.546, 0.733)),
    "x03_lang_id" -> ((0.689, 0.860)),
    "x04_quality_by_source" -> ((0.306, 0.478)),
    "x05_jaccard_pairs" -> ((0.666, 0.927)),
    "x06_dedup_minhash" -> ((0.917, 1.063)),
    "x07_dedup_simhash" -> ((1.200, 1.323)),
    "x08_ann_bruteforce" -> ((0.386, 0.480)),
    "x09_ann_lsh" -> ((0.319, 0.331)),
    "x10_embed_neardup" -> ((1.255, 1.579)),
    "x10b_embed_neardup_auto" -> ((1.175, 1.508)),
    "x11_ann_ivf_cells" -> ((0.351, 0.476)),
    "x12_events_hourly" -> ((0.442, 0.700)),
    "x13_events_sessionize" -> ((0.903, 1.195)),
    "x14_events_json" -> ((0.592, 1.079)),
    "x15_multimodal_binary" -> ((0.169, 0.236)),
    "x16_multimodal_decode" -> ((0.265, 0.392)),
    "x17_text_rolling_hash" -> ((0.153, 0.209)),
    "x18_asof_join" -> ((0.515, 0.719)),
    "x19_salted_agg" -> ((0.346, 0.502)),
    "x20_corpus_stats" -> ((0.290, 0.515)),
    "x21_regex_tokens" -> ((0.400, 0.630)),
    "x22_interval_join" -> ((0.434, 0.568)),
    "x23_top_tokens" -> ((0.296, 0.448)),
    "x24_text_scrub" -> ((0.733, 1.060)),
    "x25_vocab_encode" -> ((0.838, 1.210)),
    "x26_quantize_int8" -> ((0.282, 0.411)),
    "x27_char_ngram_pairs" -> ((0.605, 0.789)),
    "x28_bloom_join" -> ((0.451, 0.747)),
    "x29_salted_join" -> ((0.355, 0.552)),
    "x30_dedup_incremental" -> ((0.409, 0.588)),
    "x31_sequence_pack" -> ((0.290, 0.590)),
    "x31b_sequence_pack_sharded" -> ((0.318, 0.439)),
    "x32_dedup_clusters" -> ((1.201, 1.947)),
    "x33_ann_ivf_search" -> ((0.433, 0.649)),
    "x34_frame_sample" -> ((0.195, 0.286)),
    "x35_corpus_pipeline" -> ((1.585, 2.824)),
    "x36_ivf_kmeans" -> ((0.812, 1.133)),
    "x37_decontaminate" -> ((1.061, 1.285)),
    "x37b_decontaminate_clean" -> ((0.905, 1.216)),
    "x38_mix_weights" -> ((0.338, 0.597)),
    "x39_shuffle_shards" -> ((0.596, 0.872)),
    "x40_repetition_signals" -> ((1.111, 1.414)),
    "x41_importance_weights" -> ((1.876, 2.298)),
    "x42_bpe_pairs" -> ((0.590, 0.826)),
    "x43_sessionize_chunked" -> ((1.281, 1.648)),
    "x44_interval_join_nearest" -> ((0.467, 0.602)),
    "x45_semantic_dedup" -> ((2.218, 2.839)),
    "x46_bigram_lm" -> ((1.506, 2.072)),
    "x47_dup_ngram_frac" -> ((1.312, 1.574)),
    "x48_bpe_encode" -> ((0.552, 0.702)),
    "x49_quality_select" -> ((0.653, 0.815)),
    "x50_hash_split" -> ((0.173, 0.232)),
    "x51_stratified_sample" -> ((0.170, 0.312)),
    "x52_tfidf_terms" -> ((1.141, 1.652)),
    "x53_filter_reasons" -> ((0.392, 0.733)),
    "x54_knn_label_agree" -> ((0.440, 0.916)),
    "x55_source_cap" -> ((0.320, 0.469)),
    "x56_chunk_dedup" -> ((1.188, 1.872)),
    "x57_cluster_canonical" -> ((1.369, 2.166)),
    "x58_corpus_offsets" -> ((0.495, 0.793)),
    "x59_novelty" -> ((1.608, 1.976)),
    "x60_split_leakage" -> ((0.999, 1.157)),
    "x61_winnow_pairs" -> ((1.104, 1.498)),
    "x62_boiler_list" -> ((0.789, 1.121)),
    "x63_chunk_dedup_scoped" -> ((1.626, 2.271)),
    "x64_winnow_coverage" -> ((2.003, 2.624)),
    "x65_sentiment" -> ((0.419, 0.534)),
    "x66_chunk_dedup_lines" -> ((1.492, 1.870)),
    "x67_token_budget_select" -> ((1.378, 2.314)),
    "x68_neardup_ingest" -> ((0.511, 0.899)),
    "x69_pq_encode" -> ((0.436, 0.849)),
    "x70_pq_adc_topk" -> ((0.656, 1.077)),
    "x71_label_outliers" -> ((0.894, 1.369)),
    "x72_contrastive_pairs" -> ((0.359, 0.634)),
    "x73_sliding_chunks" -> ((0.227, 0.325)),
    "x74_classifier_gate" -> ((0.366, 0.449)),
    "x75_curation_funnel" -> ((1.379, 1.656)),
    "x76_mix_sample" -> ((0.517, 0.549)),
    "x77_ivfpq_topk" -> ((0.780, 0.882)),
    "x78_composed_gate" -> ((0.541, 0.565)),
    "x79_contrastive_bycell" -> ((0.570, 0.662)),
    "x80_image_headers" -> ((0.254, 0.278)),
    "x81_ingest_path" -> ((1.457, 1.674)))
}
