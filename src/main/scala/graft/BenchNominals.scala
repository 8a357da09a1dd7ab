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
    "r01_scan_project" -> 0.156,
    "r02_star" -> 0.111,
    "r03_filter_and_or" -> 0.241,
    "r04_filter_comparators" -> 0.227,
    "r05_distinct" -> 0.297,
    "r06_agg_global" -> 0.174,
    "r07_multi_agg" -> 0.127,
    "r08_cross_join_filter" -> 0.236,
    "r09_nway_join" -> 0.297,
    "s01_group_agg" -> 0.241,
    "s02_having" -> 0.398,
    "s03_orderby_limit" -> 0.175,
    "s04_join_inner" -> 0.242,
    "s05_join_left" -> 0.302,
    "s06_join_full" -> 0.450,
    "s07_semi_join" -> 0.309,
    "s08_anti_join" -> 0.338,
    "s09_union_all" -> 0.231,
    "s10_union_distinct" -> 0.394,
    "s11_intersect" -> 0.513,
    "s12_except" -> 0.348,
    "s13_case_when" -> 0.248,
    "s14_between_in_like" -> 0.170,
    "s15_arith_cast" -> 0.162,
    "s16_scalar_subquery" -> 0.340,
    "s17_in_subquery" -> 0.407,
    "s18_exists_sql" -> 0.711,
    "s19_window_topk" -> 0.504,
    "s20_window_running" -> 0.150,
    "s21_window_lag" -> 0.136,
    "s22_rollup" -> 0.414,
    "s23_cube" -> 0.270,
    "s24_tpch_q3" -> 0.627,
    "s25_tpch_q5" -> 0.602,
    "s26_string_funcs" -> 0.114,
    "s27_date_funcs" -> 0.256,
    "s28_count_distinct" -> 0.268,
    "s29_approx_distinct" -> 0.162,
    "s30_grouping_sets" -> 0.316,
    "s31_sql_entry" -> 0.222,
    "s32_from_subquery" -> 0.130,
    "s33_join_using" -> 0.121,
    "s34_bitwise" -> 0.159,
    "s35_is_null" -> 0.401,
    "s36_concat_op" -> 0.085,
    "s37_percentile" -> 0.164,
    "s38_date_arith" -> 0.334,
    "s39_regexp" -> 0.129,
    "s40_tpch_q13" -> 0.503,
    "s41_tpch_q18" -> 0.623,
    "s42_pivot" -> 0.146,
    "s43_unpivot" -> 0.116,
    "s44_array_agg" -> 0.211,
    "s45_window_rank_funcs" -> 0.124,
    "s46_stratified_sample" -> 0.287,
    "s47_tpch_q4" -> 0.619,
    "s48_tpch_q10" -> 0.648,
    "s49_map_funcs" -> 0.135,
    "s50_date_spine" -> 0.225,
    "x01_dedup_exact" -> 0.175,
    "x02_token_stats" -> 0.137,
    "x03_lang_id" -> 0.116,
    "x04_quality_by_source" -> 0.155,
    "x05_jaccard_pairs" -> 0.487,
    "x06_dedup_minhash" -> 1.165,
    "x07_dedup_simhash" -> 1.175,
    "x08_ann_bruteforce" -> 0.459,
    "x09_ann_lsh" -> 0.352,
    "x10_embed_neardup" -> 1.132,
    "x10b_embed_neardup_auto" -> 1.283,
    "x11_ann_ivf_cells" -> 0.652,
    "x12_events_hourly" -> 0.302,
    "x13_events_sessionize" -> 0.524,
    "x14_events_json" -> 0.238,
    "x15_multimodal_binary" -> 0.134,
    "x16_multimodal_decode" -> 0.213,
    "x17_text_rolling_hash" -> 0.107,
    "x18_asof_join" -> 0.165,
    "x19_salted_agg" -> 0.142,
    "x20_corpus_stats" -> 0.135,
    "x21_regex_tokens" -> 0.101,
    "x22_interval_join" -> 0.302,
    "x23_top_tokens" -> 0.273,
    "x24_text_scrub" -> 0.102,
    "x25_vocab_encode" -> 0.817,
    "x26_quantize_int8" -> 0.101,
    "x27_char_ngram_pairs" -> 0.405,
    "x28_bloom_join" -> 0.366,
    "x29_salted_join" -> 0.289,
    "x30_dedup_incremental" -> 0.411,
    "x31_sequence_pack" -> 0.316,
    "x31b_sequence_pack_sharded" -> 0.276,
    "x32_dedup_clusters" -> 1.361,
    "x33_ann_ivf_search" -> 0.875,
    "x34_frame_sample" -> 0.167,
    "x35_corpus_pipeline" -> 1.789,
    "x36_ivf_kmeans" -> 1.657,
    "x37_decontaminate" -> 0.951,
    "x37b_decontaminate_clean" -> 0.954,
    "x38_mix_weights" -> 0.230,
    "x39_shuffle_shards" -> 0.371,
    "x40_repetition_signals" -> 0.559,
    "x41_importance_weights" -> 1.134,
    "x42_bpe_pairs" -> 0.625,
    "x43_sessionize_chunked" -> 0.860,
    "x44_interval_join_nearest" -> 0.429)
}
