#!/bin/bash
# VERDICT r11 task 8: extend the sf10 record past 100 queries, plus task 7's
# engine-only stream re-records. Same discipline as run_sf10_ext.sh: one
# fresh 8 GiB JVM per small batch (isolates cross-query accumulation while
# keeping the bench-JVM claim honest). Streams now run through the
# engine-only parquet FileStreamSink (TimeOne default), so the 16 GiB /
# raised-maxResultSize exceptions of the r11 record are gone: every batch
# below runs at the 1g default maxResultSize on the 8 GiB JVM.
set -u
OUT=${1:-/tmp/sf10_r12.log}
: > "$OUT"
BATCHES=(
  # task 7 re-records: the memory-sink-bound stream replays, engine-only
  "events_stream_stream_join,events_stream_stream_semi"
  "events_stream_stream_outer,events_stream_stream_full_outer"
  "events_session_window_stream,events_sessionize_stream"
  "events_window_stream,events_late_drop_stream,events_update_mode_stream"
  "events_sliding_window_stream,events_dedup_stream,events_complete_mode_stream"
  # this round's changed plans
  "text_fuzzy_join,stats_percentile_disc,approx_quantiles_hdr,graph_pagerank"
  # new r12 gate + middle band
  "multimodal_bmp_decode,multimodal_frame_stats,stats_outliers,sql_revenue_by_nation"
  "catalog_history,events_backfill_stream,dedup_ngram_jaccard,text_stats"
  "stats_regression,catalog_change_feed,catalog_incremental_gold,dedup_incremental_probe"
  "catalog_merge_upsert,text_lm_score,text_scrub_pii,events_basket_rules"
  "text_repetition,catalog_clone,text_pmi_bigrams,catalog_unique_constraint"
  "decontaminate_bloom,geo_grid_join,scd2_dimension,serving_unique_fires"
  "stats_mode_median,approx_distinct_hll,alert_flags,q30_ntile_buckets"
  "approx_distinct_kmv,catalog_vacuum,layout_zorder,join_runtime_filter"
  "sim_ann_pq_exhaustive,catalog_restore,catalog_generated_columns,catalog_schema_evolve"
  "catalog_time_travel,dedup_simhash_contained,profile_lineitem,q36_interpolate"
  "serving_kpis,q5_local_supplier_volume,text_bpeish_tokens,catalog_time_travel_ts"
  "q29_range_frame,events_sessionize,serving_top_wind,serving_risk_distribution"
  "text_bm25_topk,q3_shipping_priority,q37_asof_tolerance,text_quality,catalog_check_constraint"
)
for b in "${BATCHES[@]}"; do
  echo "== batch: $b" >> "$OUT"
  sbt -batch "runMain graft.tools.TimeOne $b /tmp/sf10 2" 2>&1 \
    | grep -E '\[timeone\]|OutOfMemory|Exception in thread' >> "$OUT"
done
echo "== done" >> "$OUT"
