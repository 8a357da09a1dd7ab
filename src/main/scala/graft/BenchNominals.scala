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
    "r01_scan_project" -> 0.179,
    "r02_star" -> 0.109,
    "r03_filter_and_or" -> 0.248,
    "r04_filter_comparators" -> 0.246,
    "r05_distinct" -> 0.334,
    "r06_agg_global" -> 0.181,
    "r07_multi_agg" -> 0.127,
    "r08_cross_join_filter" -> 0.267,
    "r09_nway_join" -> 0.320,
    "s01_group_agg" -> 0.284,
    "s02_having" -> 0.476,
    "s03_orderby_limit" -> 0.194,
    "s04_join_inner" -> 0.263,
    "s05_join_left" -> 0.327,
    "s06_join_full" -> 0.445,
    "s07_semi_join" -> 0.328,
    "s08_anti_join" -> 0.348,
    "s09_union_all" -> 0.237,
    "s10_union_distinct" -> 0.381,
    "s11_intersect" -> 0.472,
    "s12_except" -> 0.355,
    "s13_case_when" -> 0.226,
    "s14_between_in_like" -> 0.156,
    "s15_arith_cast" -> 0.175,
    "s16_scalar_subquery" -> 0.326,
    "s17_in_subquery" -> 0.388,
    "s18_exists_sql" -> 0.686,
    "s19_window_topk" -> 0.492,
    "s20_window_running" -> 0.145,
    "s21_window_lag" -> 0.130,
    "s22_rollup" -> 0.441,
    "s23_cube" -> 0.282,
    "s24_tpch_q3" -> 0.696,
    "s25_tpch_q5" -> 0.579,
    "s26_string_funcs" -> 0.115,
    "s27_date_funcs" -> 0.254,
    "s28_count_distinct" -> 0.229,
    "s29_approx_distinct" -> 0.150,
    "s30_grouping_sets" -> 0.323,
    "s31_sql_entry" -> 0.283,
    "s32_from_subquery" -> 0.152,
    "s33_join_using" -> 0.139,
    "s34_bitwise" -> 0.184,
    "s35_is_null" -> 0.460,
    "s36_concat_op" -> 0.104,
    "s37_percentile" -> 0.201,
    "s38_date_arith" -> 0.415,
    "s39_regexp" -> 0.171,
    "s40_tpch_q13" -> 0.544,
    "s41_tpch_q18" -> 0.687,
    "s42_pivot" -> 0.162,
    "s43_unpivot" -> 0.133,
    "s44_array_agg" -> 0.252,
    "s45_window_rank_funcs" -> 0.156,
    "s46_stratified_sample" -> 0.330,
    "s47_tpch_q4" -> 0.632,
    "s48_tpch_q10" -> 0.746,
    "s49_map_funcs" -> 0.141,
    "s50_date_spine" -> 0.142,
    "x01_dedup_exact" -> 0.188,
    "x02_token_stats" -> 0.131,
    "x03_lang_id" -> 0.115,
    "x04_quality_by_source" -> 0.138,
    "x05_jaccard_pairs" -> 0.409,
    "x06_dedup_minhash" -> 0.990,
    "x07_dedup_simhash" -> 1.054,
    "x08_ann_bruteforce" -> 0.346,
    "x09_ann_lsh" -> 0.376,
    "x10_embed_neardup" -> 0.970,
    "x10b_embed_neardup_auto" -> 1.295,
    "x11_ann_ivf_cells" -> 0.936,
    "x12_events_hourly" -> 0.335,
    "x13_events_sessionize" -> 0.639,
    "x14_events_json" -> 0.264,
    "x15_multimodal_binary" -> 0.149,
    "x16_multimodal_decode" -> 0.257,
    "x17_text_rolling_hash" -> 0.115,
    "x18_asof_join" -> 0.185,
    "x19_salted_agg" -> 0.154,
    "x20_corpus_stats" -> 0.146,
    "x21_regex_tokens" -> 0.120,
    "x22_interval_join" -> 0.316,
    "x23_top_tokens" -> 0.287,
    "x24_text_scrub" -> 0.105,
    "x25_vocab_encode" -> 0.801,
    "x26_quantize_int8" -> 0.105,
    "x27_char_ngram_pairs" -> 0.524,
    "x28_bloom_join" -> 0.380,
    "x29_salted_join" -> 0.329,
    "x30_dedup_incremental" -> 0.396,
    "x31_sequence_pack" -> 0.267,
    "x31b_sequence_pack_sharded" -> 0.289,
    "x32_dedup_clusters" -> 1.341,
    "x33_ann_ivf_search" -> 0.850,
    "x34_frame_sample" -> 0.206,
    "x35_corpus_pipeline" -> 1.738,
    "x36_ivf_kmeans" -> 1.656,
    "x37_decontaminate" -> 0.936,
    "x37b_decontaminate_clean" -> 0.905,
    "x38_mix_weights" -> 0.246,
    "x39_shuffle_shards" -> 0.406,
    "x40_repetition_signals" -> 0.534,
    "x41_importance_weights" -> 1.193,
    "x42_bpe_pairs" -> 1.201,
    "x43_sessionize_chunked" -> 0.923,
    "x44_interval_join_nearest" -> 0.398)
}
