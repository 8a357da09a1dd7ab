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
    "r01_scan_project" -> 0.295,
    "r02_star" -> 0.155,
    "r03_filter_and_or" -> 0.493,
    "r04_filter_comparators" -> 0.468,
    "r05_distinct" -> 0.395,
    "r06_agg_global" -> 0.210,
    "r07_multi_agg" -> 0.503,
    "r08_cross_join_filter" -> 0.281,
    "r09_nway_join" -> 0.377,
    "s01_group_agg" -> 1.168,
    "s02_having" -> 0.599,
    "s03_orderby_limit" -> 0.178,
    "s04_join_inner" -> 0.392,
    "s05_join_left" -> 0.915,
    "s06_join_full" -> 0.600,
    "s07_semi_join" -> 0.422,
    "s08_anti_join" -> 0.365,
    "s09_union_all" -> 0.604,
    "s10_union_distinct" -> 0.508,
    "s11_intersect" -> 0.462,
    "s12_except" -> 0.418,
    "s13_case_when" -> 0.463,
    "s14_between_in_like" -> 0.250,
    "s15_arith_cast" -> 0.422,
    "s16_scalar_subquery" -> 0.580,
    "s17_in_subquery" -> 0.554,
    "s18_exists_sql" -> 0.959,
    "s19_window_topk" -> 0.588,
    "s20_window_running" -> 0.311,
    "s21_window_lag" -> 0.300,
    "s22_rollup" -> 0.510,
    "s23_cube" -> 0.404,
    "s24_tpch_q3" -> 0.667,
    "s25_tpch_q5" -> 0.775,
    "s26_string_funcs" -> 0.262,
    "s27_date_funcs" -> 0.494,
    "s28_count_distinct" -> 0.807,
    "s29_approx_distinct" -> 1.796,
    "s30_grouping_sets" -> 0.387,
    "s31_sql_entry" -> 0.294,
    "s32_from_subquery" -> 0.182,
    "s33_join_using" -> 0.132,
    "s34_bitwise" -> 0.261,
    "s35_is_null" -> 0.385,
    "s36_concat_op" -> 0.116,
    "s37_percentile" -> 0.379,
    "s38_date_arith" -> 0.474,
    "s39_regexp" -> 0.188,
    "s40_tpch_q13" -> 0.624,
    "s41_tpch_q18" -> 0.726,
    "s42_pivot" -> 0.382,
    "s43_unpivot" -> 0.255,
    "s44_array_agg" -> 0.425,
    "s45_window_rank_funcs" -> 0.392,
    "s46_stratified_sample" -> 0.545,
    "s47_tpch_q4" -> 0.732,
    "s48_tpch_q10" -> 0.800,
    "s49_map_funcs" -> 0.354,
    "s50_date_spine" -> 0.488,
    "x01_dedup_exact" -> 0.326,
    "x02_token_stats" -> 0.631,
    "x03_lang_id" -> 0.841,
    "x04_quality_by_source" -> 0.449,
    "x05_jaccard_pairs" -> 0.843,
    "x06_dedup_minhash" -> 1.423,
    "x07_dedup_simhash" -> 1.154,
    "x08_ann_bruteforce" -> 0.615,
    "x09_ann_lsh" -> 0.362,
    "x10_embed_neardup" -> 1.710,
    "x10b_embed_neardup_auto" -> 1.967,
    "x11_ann_ivf_cells" -> 0.534,
    "x12_events_hourly" -> 0.599,
    "x13_events_sessionize" -> 1.352,
    "x14_events_json" -> 1.363,
    "x15_multimodal_binary" -> 0.253,
    "x16_multimodal_decode" -> 0.385,
    "x17_text_rolling_hash" -> 0.266,
    "x18_asof_join" -> 0.705,
    "x19_salted_agg" -> 0.529,
    "x20_corpus_stats" -> 0.476,
    "x21_regex_tokens" -> 0.475,
    "x22_interval_join" -> 0.517,
    "x23_top_tokens" -> 0.512,
    "x24_text_scrub" -> 0.977,
    "x25_vocab_encode" -> 1.234,
    "x26_quantize_int8" -> 0.444,
    "x27_char_ngram_pairs" -> 0.797,
    "x28_bloom_join" -> 0.712,
    "x29_salted_join" -> 0.495,
    "x30_dedup_incremental" -> 0.646,
    "x31_sequence_pack" -> 0.520,
    "x31b_sequence_pack_sharded" -> 0.470,
    "x32_dedup_clusters" -> 2.010,
    "x33_ann_ivf_search" -> 0.775,
    "x34_frame_sample" -> 0.352,
    "x35_corpus_pipeline" -> 2.449,
    "x36_ivf_kmeans" -> 1.285,
    "x37_decontaminate" -> 1.357,
    "x37b_decontaminate_clean" -> 1.330,
    "x38_mix_weights" -> 0.635,
    "x39_shuffle_shards" -> 0.798,
    "x40_repetition_signals" -> 1.373,
    "x41_importance_weights" -> 2.711,
    "x42_bpe_pairs" -> 0.794,
    "x43_sessionize_chunked" -> 1.923,
    "x44_interval_join_nearest" -> 0.679,
    "x45_semantic_dedup" -> 3.591,
    "x46_bigram_lm" -> 2.601,
    "x47_dup_ngram_frac" -> 1.753,
    "x48_bpe_encode" -> 0.775,
    // added by hand from the quietest clean run (58.7s board): the rest
    // of the map comes from a mid-band run, and regenerating everything
    // from the fast end would turn ordinary box noise into spurious
    // distributional congestion triggers; scaled to the mid-band level
    "x49_quality_select" -> 0.8)
}
