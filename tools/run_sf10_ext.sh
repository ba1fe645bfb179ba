#!/bin/bash
# VERDICT r10 task 8: extend the sf10 record to the middle-cost band.
# One fresh 8 GiB JVM per small batch: back-to-back STREAMING queries in a
# single JVM accumulate memory-sink rows + state-store mirrors across
# queries, which is what OOMed the single-JVM 32-query attempt (stage 185,
# events_session_window_stream) — the per-batch JVM keeps the "same 8 GiB
# JVM as the bench" claim honest while isolating accumulation.
set -u
OUT=${1:-/tmp/sf10_ext_batched.log}
: > "$OUT"
BATCHES=(
  "events_session_window_stream,events_late_drop_stream,events_update_mode_stream,events_sliding_window_stream"
  "sim_index_incremental_stream,events_dedup_stream,events_complete_mode_stream,events_heavy_hitters_stream"
  "events_quantiles_stream,events_approx_distinct_hll_stream,events_blocklist_stream,events_enrich_stream,events_approx_distinct_stream"
  "catalog_bucketed_join,catalog_incremental_gold_stream,catalog_compact_roundtrip,catalog_stats_skipping"
  "catalog_update_set,catalog_concurrent_append,catalog_delete_where,catalog_merge_stream"
  "text_dedup_excise,text_dup_span_merge,text_dup_spans,dedup_keeplist_quality"
  "sim_ann_ivfpq_residual,sim_ann_ivfpq_filtered,sim_ann_pq,q34_rank_family"
  # re-records: queries whose plans changed this round (pagerank edge
  # pinning, ngram verify bound, clusters co-partitioned propagation)
  "graph_pagerank,dedup_ngram_capped,dedup_clusters,dedup_keeplist"
)
for b in "${BATCHES[@]}"; do
  echo "== batch: $b" >> "$OUT"
  sbt -batch "runMain graft.tools.TimeOne $b /tmp/sf10 2" 2>&1 \
    | grep -E '\[timeone\]|OutOfMemory|Exception in thread' >> "$OUT"
done
echo "== done" >> "$OUT"
