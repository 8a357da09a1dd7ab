package graft

/** Per-query clean-run nominals for the graded SF, the reference point
  * Bench's widened congestion retry compares against (Bench.widenRetrySet).
  * Captured from a clean `graft.Bench` run at sf0.1/local[32] with
  * `suspect_congestion: false` and a flat canary series; regenerate with
  * `python3 tools/gen_nominals.py < bench_output` after the inventory or
  * an operator's cost materially changes. Values are measurements, not
  * budgets: a stale (too-low) nominal costs one wasted re-measurement on
  * a genuinely-slower query — the retry then confirms the new cost and
  * the min is kept — it can never corrupt a reported number.
  */
object BenchNominals {

  /** Nominals apply only to the SF they were measured at. */
  def forDir(sfDir: String): Map[String, Double] = {
    // basename EQUALITY, not endsWith: ".../xsf0.1" is a different
    // dataset and applying sf0.1 nominals to it would trigger spurious
    // widened retries (self-correcting but wasted re-runs)
    val base = sfDir.replaceAll("/+$", "").split('/').last
    if (base == "sf0.1") sf01 else Map.empty
  }

  val sf01: Map[String, Double] = Map(
    "r01_scan_project" -> 0.181,
    "r02_star" -> 0.155,
    "r03_filter_and_or" -> 0.282,
    "r04_filter_comparators" -> 0.294,
    "r05_distinct" -> 0.366,
    "r06_agg_global" -> 0.181,
    "r07_multi_agg" -> 0.118,
    "r08_cross_join_filter" -> 0.237,
    "r09_nway_join" -> 0.319,
    "s01_group_agg" -> 0.329,
    "s02_having" -> 0.427,
    "s03_orderby_limit" -> 0.219,
    "s04_join_inner" -> 0.259,
    "s05_join_left" -> 0.329,
    "s06_join_full" -> 0.490,
    "s07_semi_join" -> 0.366,
    "s08_anti_join" -> 0.366,
    "s09_union_all" -> 0.289,
    "s10_union_distinct" -> 0.426,
    "s11_intersect" -> 0.493,
    "s12_except" -> 0.360,
    "s13_case_when" -> 0.244,
    "s14_between_in_like" -> 0.189,
    "s15_arith_cast" -> 0.174,
    "s16_scalar_subquery" -> 0.390,
    "s17_in_subquery" -> 0.476,
    "s18_exists_sql" -> 0.846,
    "s19_window_topk" -> 0.572,
    "s20_window_running" -> 0.144,
    "s21_window_lag" -> 0.139,
    "s22_rollup" -> 0.456,
    "s23_cube" -> 0.244,
    "s24_tpch_q3" -> 0.530,
    "s25_tpch_q5" -> 0.557,
    "s26_string_funcs" -> 0.118,
    "s27_date_funcs" -> 0.210,
    "s28_count_distinct" -> 0.229,
    "s29_approx_distinct" -> 0.179,
    "s30_grouping_sets" -> 0.275,
    "s31_sql_entry" -> 0.227,
    "s32_from_subquery" -> 0.146,
    "s33_join_using" -> 0.111,
    "s34_bitwise" -> 0.141,
    "s35_is_null" -> 0.385,
    "s36_concat_op" -> 0.079,
    "s37_percentile" -> 0.184,
    "s38_date_arith" -> 0.321,
    "s39_regexp" -> 0.142,
    "s40_tpch_q13" -> 0.475,
    "s41_tpch_q18" -> 0.578,
    "s42_pivot" -> 0.145,
    "s43_unpivot" -> 0.111,
    "s44_array_agg" -> 0.206,
    "s45_window_rank_funcs" -> 0.143,
    "s46_stratified_sample" -> 0.263,
    "s47_tpch_q4" -> 0.594,
    "s48_tpch_q10" -> 0.797,
    "s49_map_funcs" -> 0.140,
    "s50_date_spine" -> 0.162,
    "x01_dedup_exact" -> 0.192,
    "x02_token_stats" -> 0.126,
    "x03_lang_id" -> 0.106,
    "x04_quality_by_source" -> 0.140,
    "x05_jaccard_pairs" -> 0.353,
    "x06_dedup_minhash" -> 0.903,
    "x07_dedup_simhash" -> 0.943,
    "x08_ann_bruteforce" -> 0.304,
    "x09_ann_lsh" -> 0.316,
    "x10_embed_neardup" -> 1.220,
    "x10b_embed_neardup_auto" -> 1.362,
    "x11_ann_ivf_cells" -> 0.356,
    "x12_events_hourly" -> 0.351,
    "x13_events_sessionize" -> 0.629,
    "x14_events_json" -> 0.234,
    "x15_multimodal_binary" -> 0.165,
    "x16_multimodal_decode" -> 0.315,
    "x17_text_rolling_hash" -> 0.121,
    "x18_asof_join" -> 0.203,
    "x19_salted_agg" -> 0.177,
    "x20_corpus_stats" -> 0.161,
    "x21_regex_tokens" -> 0.100,
    "x22_interval_join" -> 0.377,
    "x23_top_tokens" -> 0.359,
    "x24_text_scrub" -> 0.136,
    "x25_vocab_encode" -> 0.888,
    "x26_quantize_int8" -> 0.105,
    "x27_char_ngram_pairs" -> 0.431,
    "x28_bloom_join" -> 0.363,
    "x29_salted_join" -> 0.311,
    "x30_dedup_incremental" -> 0.432,
    "x31_sequence_pack" -> 0.265,
    "x31b_sequence_pack_sharded" -> 0.276,
    "x32_dedup_clusters" -> 1.480,
    "x33_ann_ivf_search" -> 0.572,
    "x34_frame_sample" -> 0.199,
    "x35_corpus_pipeline" -> 1.826,
    "x36_ivf_kmeans" -> 0.890,
    "x37_decontaminate" -> 0.897,
    "x37b_decontaminate_clean" -> 0.846,
    "x38_mix_weights" -> 0.189,
    "x39_shuffle_shards" -> 0.515,
    "x40_repetition_signals" -> 0.583,
    "x41_importance_weights" -> 1.299,
    "x42_bpe_pairs" -> 0.660,
    "x43_sessionize_chunked" -> 0.877,
    "x44_interval_join_nearest" -> 0.589,
    "x45_semantic_dedup" -> 2.522,
    "x46_bigram_lm" -> 1.802,
    "x47_dup_ngram_frac" -> 1.395)
}
