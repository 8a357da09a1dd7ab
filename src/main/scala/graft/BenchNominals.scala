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
    "r01_scan_project" -> ((0.285, 0.356)),
    "r02_star" -> ((0.160, 0.210)),
    "r03_filter_and_or" -> ((0.421, 0.554)),
    "r04_filter_comparators" -> ((0.373, 0.504)),
    "r05_distinct" -> ((0.324, 0.398)),
    "r06_agg_global" -> ((0.166, 0.215)),
    "r07_multi_agg" -> ((0.396, 0.507)),
    "r08_cross_join_filter" -> ((0.225, 0.292)),
    "r09_nway_join" -> ((0.286, 0.400)),
    "s01_group_agg" -> ((0.825, 1.198)),
    "s02_having" -> ((0.388, 0.527)),
    "s03_orderby_limit" -> ((0.142, 0.188)),
    "s04_join_inner" -> ((0.298, 0.448)),
    "s05_join_left" -> ((0.741, 1.059)),
    "s06_join_full" -> ((0.444, 0.613)),
    "s07_semi_join" -> ((0.330, 0.427)),
    "s08_anti_join" -> ((0.256, 0.387)),
    "s09_union_all" -> ((0.448, 0.685)),
    "s10_union_distinct" -> ((0.408, 0.537)),
    "s11_intersect" -> ((0.386, 0.533)),
    "s12_except" -> ((0.310, 0.436)),
    "s13_case_when" -> ((0.322, 0.425)),
    "s14_between_in_like" -> ((0.194, 0.251)),
    "s15_arith_cast" -> ((0.287, 0.376)),
    "s16_scalar_subquery" -> ((0.342, 0.515)),
    "s17_in_subquery" -> ((0.392, 0.591)),
    "s18_exists_sql" -> ((0.719, 1.004)),
    "s19_window_topk" -> ((0.492, 0.644)),
    "s20_window_running" -> ((0.270, 0.353)),
    "s21_window_lag" -> ((0.266, 0.353)),
    "s22_rollup" -> ((0.428, 0.623)),
    "s23_cube" -> ((0.293, 0.398)),
    "s24_tpch_q3" -> ((0.553, 0.750)),
    "s25_tpch_q5" -> ((0.645, 0.915)),
    "s26_string_funcs" -> ((0.224, 0.325)),
    "s27_date_funcs" -> ((0.373, 0.526)),
    "s28_count_distinct" -> ((0.671, 0.961)),
    "s29_approx_distinct" -> ((1.616, 2.423)),
    "s30_grouping_sets" -> ((0.346, 0.457)),
    "s31_sql_entry" -> ((0.258, 0.351)),
    "s32_from_subquery" -> ((0.164, 0.233)),
    "s33_join_using" -> ((0.113, 0.165)),
    "s34_bitwise" -> ((0.222, 0.309)),
    "s35_is_null" -> ((0.327, 0.430)),
    "s36_concat_op" -> ((0.096, 0.130)),
    "s37_percentile" -> ((0.353, 0.486)),
    "s38_date_arith" -> ((0.420, 0.621)),
    "s39_regexp" -> ((0.149, 0.208)),
    "s40_tpch_q13" -> ((0.455, 0.657)),
    "s41_tpch_q18" -> ((0.567, 0.758)),
    "s42_pivot" -> ((0.345, 0.429)),
    "s43_unpivot" -> ((0.240, 0.298)),
    "s44_array_agg" -> ((0.236, 0.263)),
    "s45_window_rank_funcs" -> ((0.332, 0.422)),
    "s46_stratified_sample" -> ((0.477, 0.637)),
    "s47_tpch_q4" -> ((0.710, 0.819)),
    "s48_tpch_q10" -> ((0.725, 0.861)),
    "s49_map_funcs" -> ((0.273, 0.387)),
    "s50_date_spine" -> ((0.371, 0.571)),
    "x01_dedup_exact" -> ((0.298, 0.336)),
    "x02_token_stats" -> ((0.523, 0.748)),
    "x03_lang_id" -> ((0.673, 0.897)),
    "x04_quality_by_source" -> ((0.308, 0.454)),
    "x05_jaccard_pairs" -> ((0.735, 0.882)),
    "x06_dedup_minhash" -> ((0.858, 1.270)),
    "x07_dedup_simhash" -> ((1.013, 1.302)),
    "x08_ann_bruteforce" -> ((0.307, 0.446)),
    "x09_ann_lsh" -> ((0.253, 0.356)),
    "x10_embed_neardup" -> ((1.200, 1.655)),
    "x10b_embed_neardup_auto" -> ((1.179, 1.868)),
    "x11_ann_ivf_cells" -> ((0.303, 0.459)),
    "x12_events_hourly" -> ((0.457, 0.750)),
    "x13_events_sessionize" -> ((0.800, 1.284)),
    "x14_events_json" -> ((0.631, 1.140)),
    "x15_multimodal_binary" -> ((0.185, 0.260)),
    "x16_multimodal_decode" -> ((0.242, 0.411)),
    "x17_text_rolling_hash" -> ((0.144, 0.222)),
    "x18_asof_join" -> ((0.529, 0.793)),
    "x19_salted_agg" -> ((0.336, 0.570)),
    "x20_corpus_stats" -> ((0.307, 0.432)),
    "x21_regex_tokens" -> ((0.462, 0.762)),
    "x22_interval_join" -> ((0.393, 0.531)),
    "x23_top_tokens" -> ((0.327, 0.441)),
    "x24_text_scrub" -> ((0.763, 1.046)),
    "x25_vocab_encode" -> ((0.780, 1.100)),
    "x26_quantize_int8" -> ((0.299, 0.364)),
    "x27_char_ngram_pairs" -> ((0.595, 0.899)),
    "x28_bloom_join" -> ((0.430, 0.583)),
    "x29_salted_join" -> ((0.317, 0.512)),
    "x30_dedup_incremental" -> ((0.404, 0.658)),
    "x31_sequence_pack" -> ((0.350, 0.530)),
    "x31b_sequence_pack_sharded" -> ((0.387, 0.536)),
    "x32_dedup_clusters" -> ((1.440, 1.872)),
    "x33_ann_ivf_search" -> ((0.450, 0.654)),
    "x34_frame_sample" -> ((0.222, 0.293)),
    "x35_corpus_pipeline" -> ((1.621, 2.613)),
    "x36_ivf_kmeans" -> ((0.809, 1.371)),
    "x37_decontaminate" -> ((1.013, 1.434)),
    "x37b_decontaminate_clean" -> ((0.915, 1.429)),
    "x38_mix_weights" -> ((0.329, 0.622)),
    "x39_shuffle_shards" -> ((0.579, 0.854)),
    "x40_repetition_signals" -> ((0.993, 1.514)),
    "x41_importance_weights" -> ((1.624, 2.684)),
    "x42_bpe_pairs" -> ((0.603, 0.768)),
    "x43_sessionize_chunked" -> ((1.144, 1.778)),
    "x44_interval_join_nearest" -> ((0.452, 0.684)),
    "x45_semantic_dedup" -> ((2.015, 3.143)),
    "x46_bigram_lm" -> ((1.541, 2.113)),
    "x47_dup_ngram_frac" -> ((1.268, 1.711)),
    "x48_bpe_encode" -> ((0.484, 0.778)),
    "x49_quality_select" -> ((0.747, 0.960)),
    "x50_hash_split" -> ((0.181, 0.237)),
    "x51_stratified_sample" -> ((0.154, 0.229)),
    "x52_tfidf_terms" -> ((1.040, 1.454)),
    "x53_filter_reasons" -> ((0.381, 0.555)),
    "x54_knn_label_agree" -> ((0.584, 0.825)),
    "x55_source_cap" -> ((0.325, 0.437)),
    "x56_chunk_dedup" -> ((1.214, 1.913)),
    "x57_cluster_canonical" -> ((1.407, 2.034)),
    "x58_corpus_offsets" -> ((0.526, 0.817)),
    "x59_novelty" -> ((1.602, 2.030)),
    "x60_split_leakage" -> ((0.899, 1.338)),
    "x61_winnow_pairs" -> ((1.167, 1.569)),
    "x62_boiler_list" -> ((0.805, 1.363)),
    "x63_chunk_dedup_scoped" -> ((1.495, 2.317)),
    "x64_winnow_coverage" -> ((1.892, 2.384)),
    "x65_sentiment" -> ((0.404, 0.590)),
    "x66_chunk_dedup_lines" -> ((1.250, 1.861)),
    "x67_token_budget_select" -> ((1.253, 1.815)),
    "x68_neardup_ingest" -> ((0.485, 0.851)),
    "x69_pq_encode" -> ((0.454, 0.584)),
    "x70_pq_adc_topk" -> ((0.620, 0.943)),
    "x71_label_outliers" -> ((0.720, 1.345)),
    "x72_contrastive_pairs" -> ((0.302, 0.437)),
    "x73_sliding_chunks" -> ((0.191, 0.274)),
    "x74_classifier_gate" -> ((0.326, 0.468)),
    "x75_curation_funnel" -> ((1.101, 1.802)),
    "x76_mix_sample" -> ((0.388, 0.648)),
    "x77_ivfpq_topk" -> ((0.640, 1.072)),
    "x78_composed_gate" -> ((0.473, 0.792)),
    "x79_contrastive_bycell" -> ((0.485, 0.758)),
    "x80_image_headers" -> ((0.224, 0.301)),
    "x81_ingest_path" -> ((1.514, 2.061)),
    "x82_ingest_indexed" -> ((2.253, 3.486)),
    "x83_pq_drift_probe" -> ((0.430, 0.650)),
    "x84_media_headers" -> ((0.426, 0.689)))
}
