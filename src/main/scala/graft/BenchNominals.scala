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
    "r01_scan_project" -> 0.370,
    "r02_star" -> 0.184,
    "r03_filter_and_or" -> 0.611,
    "r04_filter_comparators" -> 0.494,
    "r05_distinct" -> 0.528,
    "r06_agg_global" -> 0.229,
    "r07_multi_agg" -> 0.575,
    "r08_cross_join_filter" -> 0.281,
    "r09_nway_join" -> 0.369,
    "s01_group_agg" -> 1.391,
    "s02_having" -> 0.480,
    "s03_orderby_limit" -> 0.227,
    "s04_join_inner" -> 0.389,
    "s05_join_left" -> 1.123,
    "s06_join_full" -> 0.645,
    "s07_semi_join" -> 0.416,
    "s08_anti_join" -> 0.337,
    "s09_union_all" -> 0.653,
    "s10_union_distinct" -> 0.531,
    "s11_intersect" -> 0.594,
    "s12_except" -> 0.359,
    "s13_case_when" -> 0.437,
    "s14_between_in_like" -> 0.240,
    "s15_arith_cast" -> 0.350,
    "s16_scalar_subquery" -> 0.464,
    "s17_in_subquery" -> 0.489,
    "s18_exists_sql" -> 1.022,
    "s19_window_topk" -> 0.627,
    "s20_window_running" -> 0.328,
    "s21_window_lag" -> 0.337,
    "s22_rollup" -> 0.574,
    "s23_cube" -> 0.402,
    "s24_tpch_q3" -> 0.756,
    "s25_tpch_q5" -> 0.882,
    "s26_string_funcs" -> 0.367,
    "s27_date_funcs" -> 0.612,
    "s28_count_distinct" -> 0.853,
    "s29_approx_distinct" -> 2.077,
    "s30_grouping_sets" -> 0.469,
    "s31_sql_entry" -> 0.310,
    "s32_from_subquery" -> 0.179,
    "s33_join_using" -> 0.157,
    "s34_bitwise" -> 0.333,
    "s35_is_null" -> 0.423,
    "s36_concat_op" -> 0.116,
    "s37_percentile" -> 0.453,
    "s38_date_arith" -> 0.569,
    "s39_regexp" -> 0.218,
    "s40_tpch_q13" -> 0.655,
    "s41_tpch_q18" -> 0.703,
    "s42_pivot" -> 0.342,
    "s43_unpivot" -> 0.223,
    "s44_array_agg" -> 0.247,
    "s45_window_rank_funcs" -> 0.350,
    "s46_stratified_sample" -> 0.519,
    "s47_tpch_q4" -> 0.688,
    "s48_tpch_q10" -> 0.862,
    "s49_map_funcs" -> 0.343,
    "s50_date_spine" -> 0.543,
    "x01_dedup_exact" -> 0.311,
    "x02_token_stats" -> 0.663,
    "x03_lang_id" -> 1.141,
    "x04_quality_by_source" -> 0.476,
    "x05_jaccard_pairs" -> 0.822,
    "x06_dedup_minhash" -> 1.627,
    "x07_dedup_simhash" -> 1.265,
    "x08_ann_bruteforce" -> 0.494,
    "x09_ann_lsh" -> 0.358,
    "x10_embed_neardup" -> 1.475,
    "x10b_embed_neardup_auto" -> 1.339,
    "x11_ann_ivf_cells" -> 0.483,
    "x12_events_hourly" -> 0.548,
    "x13_events_sessionize" -> 0.948,
    "x14_events_json" -> 0.712,
    "x15_multimodal_binary" -> 0.216,
    "x16_multimodal_decode" -> 0.385,
    "x17_text_rolling_hash" -> 0.184,
    "x18_asof_join" -> 0.634,
    "x19_salted_agg" -> 0.507,
    "x20_corpus_stats" -> 0.443,
    "x21_regex_tokens" -> 0.526,
    "x22_interval_join" -> 0.462,
    "x23_top_tokens" -> 0.407,
    "x24_text_scrub" -> 0.774,
    "x25_vocab_encode" -> 1.104,
    "x26_quantize_int8" -> 0.363,
    "x27_char_ngram_pairs" -> 0.722,
    "x28_bloom_join" -> 0.508,
    "x29_salted_join" -> 0.397,
    "x30_dedup_incremental" -> 0.525,
    "x31_sequence_pack" -> 0.392,
    "x31b_sequence_pack_sharded" -> 0.453,
    "x32_dedup_clusters" -> 1.658,
    "x33_ann_ivf_search" -> 0.718,
    "x34_frame_sample" -> 0.289,
    "x35_corpus_pipeline" -> 2.093,
    "x36_ivf_kmeans" -> 1.000,
    "x37_decontaminate" -> 1.181,
    "x37b_decontaminate_clean" -> 1.197,
    "x38_mix_weights" -> 0.550,
    "x39_shuffle_shards" -> 0.725,
    "x40_repetition_signals" -> 1.214,
    "x41_importance_weights" -> 2.096,
    "x42_bpe_pairs" -> 0.756,
    "x43_sessionize_chunked" -> 1.453,
    "x44_interval_join_nearest" -> 0.636,
    "x45_semantic_dedup" -> 2.496,
    "x46_bigram_lm" -> 1.725,
    "x47_dup_ngram_frac" -> 1.291)
}
