#!/bin/bash
# Round 12, closing VERDICT r11 task 8 all the way: extend the sf10 record
# from 135 queries to the FULL inventory minus gold_alerts. The 54 queries
# below are the whole untested tail (every one ≤1.2s at sf1, est ≤12s at
# sf10 if linear); gold_alerts stays excluded BY CONTRACT — the uncapped
# flagship's output is density-quadratic (507s at sf1 ⇒ ~10⁴s at sf10) and
# its two production serves (gold_alerts_capped / gold_alerts_dense) are
# already in the record. Same discipline as run_sf10_r12.sh: one fresh
# 8 GiB JVM per small batch, 1g default maxResultSize, engine-only sinks.
set -u
OUT=${1:-/tmp/sf10_full.log}
: > "$OUT"
BATCHES=(
  "q1_pricing_summary,q2_filter_project,q4_order_topk,q6_latest_per_key,q9_theta_band_join"
  "q10_cross_join_small,q11_semi_join,q12_anti_join,q13_outer_join_count,q14_distinct"
  "q15_union,q16_intersect,q19_cube,q20_case_classify,q22_time_bucket"
  "q23_isin_filter,q24_concat_key,q25_conditional_kpi,q26_asof_join,q27_pivot"
  # q28_interval_overlap is EXCLUDED from sf10 sweeps by contract (the
  # record documents its one-off 86-CPU-minute 837M-pair materialization);
  # only its capped serve q28_interval_overlap_capped is swept.
  "q31_unpivot_melt,q32_grouping_sets,q33_scalar_subquery,q35_gapfill"
  "q39_regex_extract,q40_datetime_family,q41_null_semantics,geo_haversine,stats_entropy"
  "stats_ab_ttest,stats_histogram,ts_ewma,ts_rolling_zscore,skew_salted_agg,skew_salted_join"
  "sample_bernoulli_hash,sample_stratified,sample_weighted,privacy_k_anonymous"
  "dedup_exact,cluster_kmeans_assign,vector_centroid,vector_quantize_int8"
  "sim_topk_bruteforce,sim_matryoshka_topk,text_vocab_topk,text_length_percentiles"
  "export_shards,export_training_order,mix_token_budget"
  "multimodal_meta,multimodal_framesample,multimodal_wav_decode"
  # new this round: the PNG + WARC gates join the inventory — record them
  # at sf10 beside a BMP re-record from the same window
  "multimodal_png_decode,multimodal_bmp_decode,warc_extract"
)
for b in "${BATCHES[@]}"; do
  echo "== batch: $b" >> "$OUT"
  sbt -batch "runMain graft.tools.TimeOne $b /tmp/sf10 2" 2>&1 \
    | grep -E '\[timeone\]|OutOfMemory|Exception in thread' >> "$OUT"
done
echo "== done" >> "$OUT"
