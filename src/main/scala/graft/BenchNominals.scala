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
    "r01_scan_project" -> ((0.276, 0.293)),
    "r02_star" -> ((0.150, 0.153)),
    "r03_filter_and_or" -> ((0.408, 0.477)),
    "r04_filter_comparators" -> ((0.346, 0.391)),
    "r05_distinct" -> ((0.308, 0.355)),
    "r06_agg_global" -> ((0.178, 0.195)),
    "r07_multi_agg" -> ((0.390, 0.434)),
    "r08_cross_join_filter" -> ((0.233, 0.238)),
    "r09_nway_join" -> ((0.303, 0.374)),
    "s01_group_agg" -> ((0.810, 0.878)),
    "s02_having" -> ((0.413, 0.447)),
    "s03_orderby_limit" -> ((0.142, 0.152)),
    "s04_join_inner" -> ((0.332, 0.347)),
    "s05_join_left" -> ((0.822, 0.834)),
    "s06_join_full" -> ((0.508, 0.614)),
    "s07_semi_join" -> ((0.341, 0.396)),
    "s08_anti_join" -> ((0.276, 0.293)),
    "s09_union_all" -> ((0.464, 0.485)),
    "s10_union_distinct" -> ((0.419, 0.454)),
    "s11_intersect" -> ((0.421, 0.425)),
    "s12_except" -> ((0.328, 0.349)),
    "s13_case_when" -> ((0.354, 0.364)),
    "s14_between_in_like" -> ((0.202, 0.211)),
    "s15_arith_cast" -> ((0.302, 0.331)),
    "s16_scalar_subquery" -> ((0.391, 0.406)),
    "s17_in_subquery" -> ((0.465, 0.479)),
    "s18_exists_sql" -> ((0.793, 0.807)),
    "s19_window_topk" -> ((0.537, 0.648)),
    "s20_window_running" -> ((0.297, 0.316)),
    "s21_window_lag" -> ((0.268, 0.296)),
    "s22_rollup" -> ((0.456, 0.505)),
    "s23_cube" -> ((0.303, 0.371)),
    "s24_tpch_q3" -> ((0.603, 0.644)),
    "s25_tpch_q5" -> ((0.690, 0.740)),
    "s26_string_funcs" -> ((0.258, 0.266)),
    "s27_date_funcs" -> ((0.399, 0.416)),
    "s28_count_distinct" -> ((0.712, 0.816)),
    "s29_approx_distinct" -> ((1.698, 1.823)),
    "s30_grouping_sets" -> ((0.360, 0.387)),
    "s31_sql_entry" -> ((0.284, 0.316)),
    "s32_from_subquery" -> ((0.179, 0.191)),
    "s33_join_using" -> ((0.127, 0.140)),
    "s34_bitwise" -> ((0.233, 0.263)),
    "s35_is_null" -> ((0.352, 0.385)),
    "s36_concat_op" -> ((0.114, 0.119)),
    "s37_percentile" -> ((0.370, 0.406)),
    "s38_date_arith" -> ((0.425, 0.486)),
    "s39_regexp" -> ((0.160, 0.184)),
    "s40_tpch_q13" -> ((0.517, 0.589)),
    "s41_tpch_q18" -> ((0.635, 0.686)),
    "s42_pivot" -> ((0.314, 0.355)),
    "s43_unpivot" -> ((0.229, 0.252)),
    "s44_array_agg" -> ((0.222, 0.253)),
    "s45_window_rank_funcs" -> ((0.307, 0.350)),
    "s46_stratified_sample" -> ((0.458, 0.515)),
    "s47_tpch_q4" -> ((0.619, 0.669)),
    "s48_tpch_q10" -> ((0.635, 0.717)),
    "s49_map_funcs" -> ((0.282, 0.338)),
    "s50_date_spine" -> ((0.374, 0.396)),
    "x01_dedup_exact" -> ((0.270, 0.345)),
    "x02_token_stats" -> ((0.541, 0.589)),
    "x03_lang_id" -> ((0.684, 0.736)),
    "x04_quality_by_source" -> ((0.326, 0.356)),
    "x05_jaccard_pairs" -> ((0.689, 0.727)),
    "x06_dedup_minhash" -> ((0.990, 1.054)),
    "x07_dedup_simhash" -> ((1.048, 1.127)),
    "x08_ann_bruteforce" -> ((0.331, 0.370)),
    "x09_ann_lsh" -> ((0.255, 0.294)),
    "x10_embed_neardup" -> ((1.283, 1.500)),
    "x10b_embed_neardup_auto" -> ((1.180, 1.532)),
    "x11_ann_ivf_cells" -> ((0.353, 0.455)),
    "x12_events_hourly" -> ((0.532, 0.606)),
    "x13_events_sessionize" -> ((0.921, 1.153)),
    "x14_events_json" -> ((0.821, 0.873)),
    "x15_multimodal_binary" -> ((0.197, 0.249)),
    "x16_multimodal_decode" -> ((0.293, 0.319)),
    "x17_text_rolling_hash" -> ((0.165, 0.197)),
    "x18_asof_join" -> ((0.525, 0.581)),
    "x19_salted_agg" -> ((0.379, 0.403)),
    "x20_corpus_stats" -> ((0.363, 0.392)),
    "x21_regex_tokens" -> ((0.421, 0.508)),
    "x22_interval_join" -> ((0.409, 0.510)),
    "x23_top_tokens" -> ((0.366, 0.381)),
    "x24_text_scrub" -> ((0.709, 0.764)),
    "x25_vocab_encode" -> ((0.893, 0.932)),
    "x26_quantize_int8" -> ((0.321, 0.335)),
    "x27_char_ngram_pairs" -> ((0.729, 0.747)),
    "x28_bloom_join" -> ((0.481, 0.567)),
    "x29_salted_join" -> ((0.349, 0.417)),
    "x30_dedup_incremental" -> ((0.487, 0.535)),
    "x31_sequence_pack" -> ((0.347, 0.381)),
    "x31b_sequence_pack_sharded" -> ((0.347, 0.426)),
    "x32_dedup_clusters" -> ((1.492, 1.524)),
    "x33_ann_ivf_search" -> ((0.494, 0.592)),
    "x34_frame_sample" -> ((0.236, 0.265)),
    "x35_corpus_pipeline" -> ((1.877, 2.003)),
    "x36_ivf_kmeans" -> ((1.009, 1.067)),
    "x37_decontaminate" -> ((1.075, 1.100)),
    "x37b_decontaminate_clean" -> ((0.975, 1.044)),
    "x38_mix_weights" -> ((0.402, 0.469)),
    "x39_shuffle_shards" -> ((0.637, 0.715)),
    "x40_repetition_signals" -> ((1.165, 1.425)),
    "x41_importance_weights" -> ((1.847, 2.233)),
    "x42_bpe_pairs" -> ((0.634, 0.720)),
    "x43_sessionize_chunked" -> ((1.292, 1.551)),
    "x44_interval_join_nearest" -> ((0.451, 0.538)),
    "x45_semantic_dedup" -> ((2.372, 2.786)),
    "x46_bigram_lm" -> ((1.759, 2.040)),
    "x47_dup_ngram_frac" -> ((1.274, 1.469)),
    "x48_bpe_encode" -> ((0.565, 0.619)),
    "x49_quality_select" -> ((0.628, 1.057)),
    "x50_hash_split" -> ((0.208, 0.252)),
    "x51_stratified_sample" -> ((0.171, 0.249)),
    "x52_tfidf_terms" -> ((1.132, 1.479)),
    "x53_filter_reasons" -> ((0.412, 0.552)),
    "x54_knn_label_agree" -> ((0.554, 0.756)),
    "x55_source_cap" -> ((0.312, 0.502)),
    "x56_chunk_dedup" -> ((1.205, 1.693)),
    "x57_cluster_canonical" -> ((1.501, 1.947)),
    "x58_corpus_offsets" -> ((0.521, 0.767)),
    "x59_novelty" -> ((1.464, 1.738)),
    "x60_split_leakage" -> ((0.986, 1.070)),
    "x61_winnow_pairs" -> ((1.223, 1.254)),
    "x62_boiler_list" -> ((0.766, 0.890)),
    "x63_chunk_dedup_scoped" -> ((1.630, 1.718)),
    "x64_winnow_coverage" -> ((1.893, 2.006)),
    "x65_sentiment" -> ((0.393, 0.445)),
    "x66_chunk_dedup_lines" -> ((1.280, 1.405)),
    "x67_token_budget_select" -> ((1.436, 1.460)),
    "x68_neardup_ingest" -> ((0.521, 0.556)),
    "x69_pq_encode" -> ((0.412, 0.494)),
    "x70_pq_adc_topk" -> ((0.691, 0.707)),
    "x71_label_outliers" -> ((0.808, 0.919)),
    "x72_contrastive_pairs" -> ((0.336, 0.393)),
    "x73_sliding_chunks" -> ((0.202, 0.208)),
    "x74_classifier_gate" -> ((1.291, 1.484)),
    "x75_curation_funnel" -> ((7.566, 7.628)),
    "x76_mix_sample" -> ((0.438, 0.479)))
}
