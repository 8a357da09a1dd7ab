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

  val sf01: Map[String, (Double, Double)] = Map(
    "r01_scan_project" -> ((0.249, 0.249)),
    "r02_star" -> ((0.127, 0.127)),
    "r03_filter_and_or" -> ((0.390, 0.390)),
    "r04_filter_comparators" -> ((0.350, 0.350)),
    "r05_distinct" -> ((0.312, 0.312)),
    "r06_agg_global" -> ((0.171, 0.171)),
    "r07_multi_agg" -> ((0.406, 0.406)),
    "r08_cross_join_filter" -> ((0.220, 0.220)),
    "r09_nway_join" -> ((0.301, 0.301)),
    "s01_group_agg" -> ((0.790, 0.790)),
    "s02_having" -> ((0.426, 0.426)),
    "s03_orderby_limit" -> ((0.144, 0.144)),
    "s04_join_inner" -> ((0.339, 0.339)),
    "s05_join_left" -> ((0.813, 0.813)),
    "s06_join_full" -> ((0.479, 0.479)),
    "s07_semi_join" -> ((0.324, 0.324)),
    "s08_anti_join" -> ((0.281, 0.281)),
    "s09_union_all" -> ((0.418, 0.418)),
    "s10_union_distinct" -> ((0.349, 0.349)),
    "s11_intersect" -> ((0.384, 0.384)),
    "s12_except" -> ((0.318, 0.318)),
    "s13_case_when" -> ((0.305, 0.305)),
    "s14_between_in_like" -> ((0.180, 0.180)),
    "s15_arith_cast" -> ((0.265, 0.265)),
    "s16_scalar_subquery" -> ((0.343, 0.343)),
    "s17_in_subquery" -> ((0.389, 0.389)),
    "s18_exists_sql" -> ((0.661, 0.661)),
    "s19_window_topk" -> ((0.512, 0.512)),
    "s20_window_running" -> ((0.271, 0.271)),
    "s21_window_lag" -> ((0.241, 0.241)),
    "s22_rollup" -> ((0.432, 0.432)),
    "s23_cube" -> ((0.289, 0.289)),
    "s24_tpch_q3" -> ((0.526, 0.526)),
    "s25_tpch_q5" -> ((0.622, 0.622)),
    "s26_string_funcs" -> ((0.224, 0.224)),
    "s27_date_funcs" -> ((0.377, 0.377)),
    "s28_count_distinct" -> ((0.639, 0.639)),
    "s29_approx_distinct" -> ((1.608, 1.608)),
    "s30_grouping_sets" -> ((0.324, 0.324)),
    "s31_sql_entry" -> ((0.263, 0.263)),
    "s32_from_subquery" -> ((0.150, 0.150)),
    "s33_join_using" -> ((0.114, 0.114)),
    "s34_bitwise" -> ((0.219, 0.219)),
    "s35_is_null" -> ((0.311, 0.311)),
    "s36_concat_op" -> ((0.107, 0.107)),
    "s37_percentile" -> ((0.342, 0.342)),
    "s38_date_arith" -> ((0.444, 0.444)),
    "s39_regexp" -> ((0.164, 0.164)),
    "s40_tpch_q13" -> ((0.473, 0.473)),
    "s41_tpch_q18" -> ((0.590, 0.590)),
    "s42_pivot" -> ((0.310, 0.310)),
    "s43_unpivot" -> ((0.216, 0.216)),
    "s44_array_agg" -> ((0.240, 0.240)),
    "s45_window_rank_funcs" -> ((0.287, 0.287)),
    "s46_stratified_sample" -> ((0.487, 0.487)),
    "s47_tpch_q4" -> ((0.608, 0.608)),
    "s48_tpch_q10" -> ((0.622, 0.622)),
    "s49_map_funcs" -> ((0.272, 0.272)),
    "s50_date_spine" -> ((0.352, 0.352)),
    "x01_dedup_exact" -> ((0.243, 0.243)),
    "x02_token_stats" -> ((0.700, 0.700)),
    "x03_lang_id" -> ((0.730, 0.730)),
    "x04_quality_by_source" -> ((0.297, 0.297)),
    "x05_jaccard_pairs" -> ((0.654, 0.654)),
    "x06_dedup_minhash" -> ((1.038, 1.038)),
    "x07_dedup_simhash" -> ((0.995, 0.995)),
    "x08_ann_bruteforce" -> ((0.310, 0.310)),
    "x09_ann_lsh" -> ((0.249, 0.249)),
    "x10_embed_neardup" -> ((1.269, 1.269)),
    "x10b_embed_neardup_auto" -> ((1.124, 1.124)),
    "x11_ann_ivf_cells" -> ((0.403, 0.403)),
    "x12_events_hourly" -> ((0.422, 0.422)),
    "x13_events_sessionize" -> ((0.896, 0.896)),
    "x14_events_json" -> ((0.666, 0.666)),
    "x15_multimodal_binary" -> ((0.174, 0.174)),
    "x16_multimodal_decode" -> ((0.254, 0.254)),
    "x17_text_rolling_hash" -> ((0.176, 0.176)),
    "x18_asof_join" -> ((0.510, 0.510)),
    "x19_salted_agg" -> ((0.374, 0.374)),
    "x20_corpus_stats" -> ((0.274, 0.274)),
    "x21_regex_tokens" -> ((0.406, 0.406)),
    "x22_interval_join" -> ((0.396, 0.396)),
    "x23_top_tokens" -> ((0.316, 0.316)),
    "x24_text_scrub" -> ((0.702, 0.702)),
    "x25_vocab_encode" -> ((0.857, 0.857)),
    "x26_quantize_int8" -> ((0.293, 0.293)),
    "x27_char_ngram_pairs" -> ((0.674, 0.674)),
    "x28_bloom_join" -> ((0.471, 0.471)),
    "x29_salted_join" -> ((0.390, 0.390)),
    "x30_dedup_incremental" -> ((0.494, 0.494)),
    "x31_sequence_pack" -> ((0.347, 0.347)),
    "x31b_sequence_pack_sharded" -> ((0.373, 0.373)),
    "x32_dedup_clusters" -> ((1.353, 1.353)),
    "x33_ann_ivf_search" -> ((0.506, 0.506)),
    "x34_frame_sample" -> ((0.237, 0.237)),
    "x35_corpus_pipeline" -> ((1.814, 1.814)),
    "x36_ivf_kmeans" -> ((0.832, 0.832)),
    "x37_decontaminate" -> ((1.147, 1.147)),
    "x37b_decontaminate_clean" -> ((0.955, 0.955)),
    "x38_mix_weights" -> ((0.403, 0.403)),
    "x39_shuffle_shards" -> ((0.641, 0.641)),
    "x40_repetition_signals" -> ((1.221, 1.221)),
    "x41_importance_weights" -> ((1.802, 1.802)),
    "x42_bpe_pairs" -> ((0.542, 0.542)),
    "x43_sessionize_chunked" -> ((1.155, 1.155)),
    "x44_interval_join_nearest" -> ((0.442, 0.442)),
    "x45_semantic_dedup" -> ((2.078, 2.078)),
    "x46_bigram_lm" -> ((1.652, 1.652)),
    "x47_dup_ngram_frac" -> ((1.383, 1.383)),
    "x48_bpe_encode" -> ((0.599, 0.599)),
    "x49_quality_select" -> ((0.664, 0.664)),
    "x50_hash_split" -> ((0.156, 0.156)),
    "x51_stratified_sample" -> ((0.155, 0.155)),
    "x52_tfidf_terms" -> ((1.025, 1.025)),
    "x53_filter_reasons" -> ((0.381, 0.381)),
    "x54_knn_label_agree" -> ((0.569, 0.569)),
    "x55_source_cap" -> ((0.295, 0.295)),
    "x56_chunk_dedup" -> ((1.217, 1.217)),
    "x57_cluster_canonical" -> ((1.488, 1.488)),
    "x58_corpus_offsets" -> ((0.526, 0.526)),
    "x59_novelty" -> ((1.265, 1.265)),
    "x60_split_leakage" -> ((0.958, 0.958)),
    "x61_winnow_pairs" -> ((1.133, 1.133)),
    "x62_boiler_list" -> ((0.731, 0.731)),
    "x63_chunk_dedup_scoped" -> ((1.430, 1.430)))
}
