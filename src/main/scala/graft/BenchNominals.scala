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
    "r01_scan_project" -> 0.302,
    "r02_star" -> 0.149,
    "r03_filter_and_or" -> 0.506,
    "r04_filter_comparators" -> 0.597,
    "r05_distinct" -> 0.432,
    "r06_agg_global" -> 0.275,
    "r07_multi_agg" -> 0.502,
    "r08_cross_join_filter" -> 0.264,
    "r09_nway_join" -> 0.336,
    "s01_group_agg" -> 1.167,
    "s02_having" -> 0.490,
    "s03_orderby_limit" -> 0.157,
    "s04_join_inner" -> 0.350,
    "s05_join_left" -> 1.022,
    "s06_join_full" -> 0.577,
    "s07_semi_join" -> 0.465,
    "s08_anti_join" -> 0.318,
    "s09_union_all" -> 0.845,
    "s10_union_distinct" -> 0.586,
    "s11_intersect" -> 0.540,
    "s12_except" -> 0.467,
    "s13_case_when" -> 0.558,
    "s14_between_in_like" -> 0.291,
    "s15_arith_cast" -> 0.424,
    "s16_scalar_subquery" -> 0.511,
    "s17_in_subquery" -> 0.560,
    "s18_exists_sql" -> 0.838,
    "s19_window_topk" -> 0.655,
    "s20_window_running" -> 0.292,
    "s21_window_lag" -> 0.261,
    "s22_rollup" -> 0.773,
    "s23_cube" -> 0.311,
    "s24_tpch_q3" -> 0.665,
    "s25_tpch_q5" -> 0.742,
    "s26_string_funcs" -> 0.229,
    "s27_date_funcs" -> 0.389,
    "s28_count_distinct" -> 0.689,
    "s29_approx_distinct" -> 5.507,
    "s30_grouping_sets" -> 0.459,
    "s31_sql_entry" -> 0.457,
    "s32_from_subquery" -> 0.185,
    "s33_join_using" -> 0.145,
    "s34_bitwise" -> 0.345,
    "s35_is_null" -> 0.510,
    "s36_concat_op" -> 0.202,
    "s37_percentile" -> 0.662,
    "s38_date_arith" -> 0.581,
    "s39_regexp" -> 0.238,
    "s40_tpch_q13" -> 0.775,
    "s41_tpch_q18" -> 0.691,
    "s42_pivot" -> 0.415,
    "s43_unpivot" -> 0.243,
    "s44_array_agg" -> 0.249,
    "s45_window_rank_funcs" -> 0.421,
    "s46_stratified_sample" -> 0.558,
    "s47_tpch_q4" -> 0.836,
    "s48_tpch_q10" -> 0.798,
    "s49_map_funcs" -> 0.434,
    "s50_date_spine" -> 0.619,
    "x01_dedup_exact" -> 0.526,
    "x02_token_stats" -> 0.820,
    "x03_lang_id" -> 0.782,
    "x04_quality_by_source" -> 0.490,
    "x05_jaccard_pairs" -> 0.895,
    "x06_dedup_minhash" -> 1.227,
    "x07_dedup_simhash" -> 1.266,
    "x08_ann_bruteforce" -> 0.420,
    "x09_ann_lsh" -> 0.358,
    "x10_embed_neardup" -> 1.464,
    "x10b_embed_neardup_auto" -> 1.668,
    "x11_ann_ivf_cells" -> 0.490,
    "x12_events_hourly" -> 0.583,
    "x13_events_sessionize" -> 1.157,
    "x14_events_json" -> 1.006,
    "x15_multimodal_binary" -> 0.255,
    "x16_multimodal_decode" -> 0.456,
    "x17_text_rolling_hash" -> 0.244,
    "x18_asof_join" -> 0.869,
    "x19_salted_agg" -> 0.666,
    "x20_corpus_stats" -> 0.536,
    "x21_regex_tokens" -> 0.686,
    "x22_interval_join" -> 0.516,
    "x23_top_tokens" -> 0.434,
    "x24_text_scrub" -> 0.744,
    "x25_vocab_encode" -> 0.949,
    "x26_quantize_int8" -> 0.350,
    "x27_char_ngram_pairs" -> 0.819,
    "x28_bloom_join" -> 0.466,
    "x29_salted_join" -> 0.417,
    "x30_dedup_incremental" -> 0.461,
    "x31_sequence_pack" -> 0.452,
    "x31b_sequence_pack_sharded" -> 0.459,
    "x32_dedup_clusters" -> 1.881,
    "x33_ann_ivf_search" -> 0.862,
    "x34_frame_sample" -> 0.266,
    "x35_corpus_pipeline" -> 3.073,
    "x36_ivf_kmeans" -> 1.315,
    "x37_decontaminate" -> 1.268,
    "x37b_decontaminate_clean" -> 1.257,
    "x38_mix_weights" -> 0.523,
    "x39_shuffle_shards" -> 0.798,
    "x40_repetition_signals" -> 1.314,
    "x41_importance_weights" -> 2.032,
    "x42_bpe_pairs" -> 0.695,
    "x43_sessionize_chunked" -> 1.462,
    "x44_interval_join_nearest" -> 0.540,
    "x45_semantic_dedup" -> 2.794,
    "x46_bigram_lm" -> 1.822,
    "x47_dup_ngram_frac" -> 1.434)
}
