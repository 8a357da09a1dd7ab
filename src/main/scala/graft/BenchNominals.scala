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
    "r01_scan_project" -> 0.182,
    "r02_star" -> 0.114,
    "r03_filter_and_or" -> 0.230,
    "r04_filter_comparators" -> 0.271,
    "r05_distinct" -> 0.351,
    "r06_agg_global" -> 0.210,
    "r07_multi_agg" -> 0.134,
    "r08_cross_join_filter" -> 0.234,
    "r09_nway_join" -> 0.301,
    "s01_group_agg" -> 0.286,
    "s02_having" -> 0.428,
    "s03_orderby_limit" -> 0.174,
    "s04_join_inner" -> 0.511,
    "s05_join_left" -> 0.363,
    "s06_join_full" -> 0.486,
    "s07_semi_join" -> 0.352,
    "s08_anti_join" -> 0.381,
    "s09_union_all" -> 0.273,
    "s10_union_distinct" -> 0.456,
    "s11_intersect" -> 0.565,
    "s12_except" -> 0.417,
    "s13_case_when" -> 0.290,
    "s14_between_in_like" -> 0.198,
    "s15_arith_cast" -> 0.172,
    "s16_scalar_subquery" -> 0.348,
    "s17_in_subquery" -> 0.493,
    "s18_exists_sql" -> 0.867,
    "s19_window_topk" -> 0.518,
    "s20_window_running" -> 0.158,
    "s21_window_lag" -> 0.154,
    "s22_rollup" -> 0.506,
    "s23_cube" -> 0.322,
    "s24_tpch_q3" -> 0.730,
    "s25_tpch_q5" -> 0.717,
    "s26_string_funcs" -> 0.150,
    "s27_date_funcs" -> 0.310,
    "s28_count_distinct" -> 0.296,
    "s29_approx_distinct" -> 0.186,
    "s30_grouping_sets" -> 0.348,
    "s31_sql_entry" -> 0.228,
    "s32_from_subquery" -> 0.134,
    "s33_join_using" -> 0.132,
    "s34_bitwise" -> 0.163,
    "s35_is_null" -> 0.438,
    "s36_concat_op" -> 0.087,
    "s37_percentile" -> 0.172,
    "s38_date_arith" -> 0.361,
    "s39_regexp" -> 0.135,
    "s40_tpch_q13" -> 0.499,
    "s41_tpch_q18" -> 0.632,
    "s42_pivot" -> 0.149,
    "s43_unpivot" -> 0.115,
    "s44_array_agg" -> 0.229,
    "s45_window_rank_funcs" -> 0.144,
    "s46_stratified_sample" -> 0.314,
    "s47_tpch_q4" -> 0.635,
    "s48_tpch_q10" -> 0.744,
    "s49_map_funcs" -> 0.142,
    "s50_date_spine" -> 0.163,
    "x01_dedup_exact" -> 0.190,
    "x02_token_stats" -> 0.123,
    "x03_lang_id" -> 0.131,
    "x04_quality_by_source" -> 0.135,
    "x05_jaccard_pairs" -> 0.473,
    "x06_dedup_minhash" -> 1.073,
    "x07_dedup_simhash" -> 1.141,
    "x08_ann_bruteforce" -> 0.424,
    "x09_ann_lsh" -> 0.356,
    "x10_embed_neardup" -> 1.180,
    "x10b_embed_neardup_auto" -> 1.358,
    "x11_ann_ivf_cells" -> 0.400,
    "x12_events_hourly" -> 0.320,
    "x13_events_sessionize" -> 0.592,
    "x14_events_json" -> 0.262,
    "x15_multimodal_binary" -> 0.151,
    "x16_multimodal_decode" -> 0.282,
    "x17_text_rolling_hash" -> 0.101,
    "x18_asof_join" -> 0.172,
    "x19_salted_agg" -> 0.140,
    "x20_corpus_stats" -> 0.128,
    "x21_regex_tokens" -> 0.094,
    "x22_interval_join" -> 0.301,
    "x23_top_tokens" -> 0.279,
    "x24_text_scrub" -> 0.103,
    "x25_vocab_encode" -> 0.834,
    "x26_quantize_int8" -> 0.105,
    "x27_char_ngram_pairs" -> 0.393,
    "x28_bloom_join" -> 0.365,
    "x29_salted_join" -> 0.298,
    "x30_dedup_incremental" -> 0.356,
    "x31_sequence_pack" -> 0.267,
    "x31b_sequence_pack_sharded" -> 0.305,
    "x32_dedup_clusters" -> 1.330,
    "x33_ann_ivf_search" -> 0.568,
    "x34_frame_sample" -> 0.186,
    "x35_corpus_pipeline" -> 1.785,
    "x36_ivf_kmeans" -> 0.879,
    "x37_decontaminate" -> 0.866,
    "x37b_decontaminate_clean" -> 0.852,
    "x38_mix_weights" -> 0.203,
    "x39_shuffle_shards" -> 0.452,
    "x40_repetition_signals" -> 0.584,
    "x41_importance_weights" -> 1.188,
    "x42_bpe_pairs" -> 0.612,
    "x43_sessionize_chunked" -> 0.934,
    "x44_interval_join_nearest" -> 0.451)
}
