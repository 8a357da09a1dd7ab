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
    "r01_scan_project" -> ((0.275, 0.353)),
    "r02_star" -> ((0.143, 0.152)),
    "r03_filter_and_or" -> ((0.454, 0.620)),
    "r04_filter_comparators" -> ((0.336, 0.530)),
    "r05_distinct" -> ((0.291, 0.480)),
    "r06_agg_global" -> ((0.173, 0.200)),
    "r07_multi_agg" -> ((0.356, 0.485)),
    "r08_cross_join_filter" -> ((0.223, 0.283)),
    "r09_nway_join" -> ((0.284, 0.346)),
    "s01_group_agg" -> ((0.811, 0.969)),
    "s02_having" -> ((0.390, 0.534)),
    "s03_orderby_limit" -> ((0.132, 0.143)),
    "s04_join_inner" -> ((0.301, 0.337)),
    "s05_join_left" -> ((0.756, 0.972)),
    "s06_join_full" -> ((0.424, 0.623)),
    "s07_semi_join" -> ((0.319, 0.384)),
    "s08_anti_join" -> ((0.265, 0.359)),
    "s09_union_all" -> ((0.432, 0.753)),
    "s10_union_distinct" -> ((0.386, 0.601)),
    "s11_intersect" -> ((0.378, 0.592)),
    "s12_except" -> ((0.290, 0.418)),
    "s13_case_when" -> ((0.326, 0.534)),
    "s14_between_in_like" -> ((0.184, 0.316)),
    "s15_arith_cast" -> ((0.265, 0.413)),
    "s16_scalar_subquery" -> ((0.365, 0.563)),
    "s17_in_subquery" -> ((0.471, 0.522)),
    "s18_exists_sql" -> ((0.735, 0.895)),
    "s19_window_topk" -> ((0.469, 0.685)),
    "s20_window_running" -> ((0.292, 0.298)),
    "s21_window_lag" -> ((0.244, 0.284)),
    "s22_rollup" -> ((0.472, 0.507)),
    "s23_cube" -> ((0.322, 0.433)),
    "s24_tpch_q3" -> ((0.540, 0.753)),
    "s25_tpch_q5" -> ((0.704, 0.864)),
    "s26_string_funcs" -> ((0.232, 0.344)),
    "s27_date_funcs" -> ((0.383, 0.498)),
    "s28_count_distinct" -> ((0.665, 0.890)),
    "s29_approx_distinct" -> ((1.681, 2.367)),
    "s30_grouping_sets" -> ((0.321, 0.513)),
    "s31_sql_entry" -> ((0.250, 0.366)),
    "s32_from_subquery" -> ((0.141, 0.231)),
    "s33_join_using" -> ((0.114, 0.168)),
    "s34_bitwise" -> ((0.231, 0.334)),
    "s35_is_null" -> ((0.364, 0.438)),
    "s36_concat_op" -> ((0.102, 0.171)),
    "s37_percentile" -> ((0.334, 0.453)),
    "s38_date_arith" -> ((0.405, 0.639)),
    "s39_regexp" -> ((0.152, 0.215)),
    "s40_tpch_q13" -> ((0.512, 0.623)),
    "s41_tpch_q18" -> ((0.567, 0.895)),
    "s42_pivot" -> ((0.301, 0.390)),
    "s43_unpivot" -> ((0.201, 0.244)),
    "s44_array_agg" -> ((0.202, 0.280)),
    "s45_window_rank_funcs" -> ((0.298, 0.378)),
    "s46_stratified_sample" -> ((0.474, 0.661)),
    "s47_tpch_q4" -> ((0.595, 0.742)),
    "s48_tpch_q10" -> ((0.673, 0.844)),
    "s49_map_funcs" -> ((0.306, 0.381)),
    "s50_date_spine" -> ((0.340, 0.516)),
    "x01_dedup_exact" -> ((0.248, 0.394)),
    "x02_token_stats" -> ((0.519, 0.676)),
    "x03_lang_id" -> ((0.664, 0.893)),
    "x04_quality_by_source" -> ((0.297, 0.399)),
    "x05_jaccard_pairs" -> ((0.699, 0.963)),
    "x06_dedup_minhash" -> ((0.869, 1.204)),
    "x07_dedup_simhash" -> ((0.974, 1.339)),
    "x08_ann_bruteforce" -> ((0.286, 0.499)),
    "x09_ann_lsh" -> ((0.238, 0.366)),
    "x10_embed_neardup" -> ((1.237, 1.618)),
    "x10b_embed_neardup_auto" -> ((1.105, 1.504)),
    "x11_ann_ivf_cells" -> ((0.358, 0.448)),
    "x12_events_hourly" -> ((0.458, 0.770)),
    "x13_events_sessionize" -> ((0.922, 1.192)),
    "x14_events_json" -> ((0.828, 0.889)),
    "x15_multimodal_binary" -> ((0.208, 0.238)),
    "x16_multimodal_decode" -> ((0.293, 0.375)),
    "x17_text_rolling_hash" -> ((0.177, 0.228)),
    "x18_asof_join" -> ((0.548, 0.716)),
    "x19_salted_agg" -> ((0.380, 0.582)),
    "x20_corpus_stats" -> ((0.364, 0.504)),
    "x21_regex_tokens" -> ((0.470, 0.606)),
    "x22_interval_join" -> ((0.459, 0.502)),
    "x23_top_tokens" -> ((0.317, 0.451)),
    "x24_text_scrub" -> ((0.803, 0.881)),
    "x25_vocab_encode" -> ((0.812, 0.969)),
    "x26_quantize_int8" -> ((0.320, 0.347)),
    "x27_char_ngram_pairs" -> ((0.619, 0.837)),
    "x28_bloom_join" -> ((0.463, 0.563)),
    "x29_salted_join" -> ((0.325, 0.481)),
    "x30_dedup_incremental" -> ((0.420, 0.585)),
    "x31_sequence_pack" -> ((0.344, 0.427)),
    "x31b_sequence_pack_sharded" -> ((0.317, 0.400)),
    "x32_dedup_clusters" -> ((1.427, 1.682)),
    "x33_ann_ivf_search" -> ((0.480, 0.636)),
    "x34_frame_sample" -> ((0.215, 0.379)),
    "x35_corpus_pipeline" -> ((1.972, 2.286)),
    "x36_ivf_kmeans" -> ((0.881, 1.412)),
    "x37_decontaminate" -> ((1.026, 1.251)),
    "x37b_decontaminate_clean" -> ((0.969, 1.243)),
    "x38_mix_weights" -> ((0.361, 0.506)),
    "x39_shuffle_shards" -> ((0.603, 0.931)),
    "x40_repetition_signals" -> ((1.045, 1.251)),
    "x41_importance_weights" -> ((1.681, 2.324)),
    "x42_bpe_pairs" -> ((0.543, 0.956)),
    "x43_sessionize_chunked" -> ((1.189, 1.798)),
    "x44_interval_join_nearest" -> ((0.438, 0.664)),
    "x45_semantic_dedup" -> ((2.178, 3.502)),
    "x46_bigram_lm" -> ((1.686, 1.826)),
    "x47_dup_ngram_frac" -> ((1.196, 1.417)),
    "x48_bpe_encode" -> ((0.461, 0.567)),
    "x49_quality_select" -> ((0.608, 0.716)),
    "x50_hash_split" -> ((0.162, 0.223)),
    "x51_stratified_sample" -> ((0.170, 0.217)),
    "x52_tfidf_terms" -> ((1.058, 1.281)),
    "x53_filter_reasons" -> ((0.412, 0.529)),
    "x54_knn_label_agree" -> ((0.569, 0.613)),
    "x55_source_cap" -> ((0.296, 0.389)),
    "x56_chunk_dedup" -> ((1.323, 1.597)),
    "x57_cluster_canonical" -> ((1.479, 1.878)),
    "x58_corpus_offsets" -> ((0.493, 0.672)),
    "x59_novelty" -> ((1.330, 1.770)),
    "x60_split_leakage" -> ((0.892, 1.056)),
    "x61_winnow_pairs" -> ((1.085, 1.164)),
    "x62_boiler_list" -> ((0.724, 0.730)),
    "x63_chunk_dedup_scoped" -> ((1.381, 1.504)),
    "x64_winnow_coverage" -> ((1.883, 2.176)),
    "x65_sentiment" -> ((0.339, 0.463)),
    "x66_chunk_dedup_lines" -> ((1.252, 1.353)),
    "x67_token_budget_select" -> ((1.158, 1.663)),
    "x68_neardup_ingest" -> ((0.434, 0.584)),
    "x69_pq_encode" -> ((0.377, 0.446)),
    "x70_pq_adc_topk" -> ((0.577, 0.752)),
    "x71_label_outliers" -> ((0.732, 1.037)),
    "x72_contrastive_pairs" -> ((0.297, 0.415)),
    "x73_sliding_chunks" -> ((0.196, 0.266)),
    "x74_classifier_gate" -> ((0.347, 0.390)),
    "x75_curation_funnel" -> ((1.188, 1.650)),
    "x76_mix_sample" -> ((0.426, 0.576)),
    "x77_ivfpq_topk" -> ((0.674, 0.777)),
    "x78_composed_gate" -> ((0.513, 0.604)),
    "x79_contrastive_bycell" -> ((0.506, 0.661)))
}
