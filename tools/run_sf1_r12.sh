#!/bin/bash
# r12 sf1 delta: the three queries absent from BENCH_SF1 (two r11
# additions + the new BMP gate), this round's changed plans, and the
# engine-only re-records of the memory-sink-bound stream replays. Fresh
# 8 GiB JVM per batch, 1g default maxResultSize throughout.
set -u
OUT=${1:-/tmp/sf1_r12.log}
: > "$OUT"
BATCHES=(
  "dedup_clusters_star,decontaminate_fuzzy,multimodal_bmp_decode"
  "text_fuzzy_join,stats_percentile_disc,approx_quantiles_hdr,graph_pagerank"
  "events_stream_stream_join,events_stream_stream_semi,events_stream_stream_outer"
  "events_stream_stream_full_outer,events_session_window_stream,events_sessionize_stream"
  "events_window_stream,events_late_drop_stream,events_update_mode_stream"
  "events_sliding_window_stream,events_dedup_stream,events_complete_mode_stream"
)
for b in "${BATCHES[@]}"; do
  echo "== batch: $b" >> "$OUT"
  sbt -batch "runMain graft.tools.TimeOne $b /tmp/sf1 2" 2>&1 \
    | grep -E '\[timeone\]|OutOfMemory|Exception in thread' >> "$OUT"
done
echo "== done" >> "$OUT"
