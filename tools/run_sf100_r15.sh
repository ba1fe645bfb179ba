#!/bin/bash
# Round 15: re-measure the five r14 "weak" gates + neighbors at sf100
# after the width/barrier fixes (BatchScale + AQE initialPartitionNum +
# DISK_ONLY dedup barriers). One fresh 16 GiB JVM per batch, reps=1 for
# heavies (the question is slope, not record minima). Uncapped
# dedup_simhash stays excluded per the BASELINE.md r15 contract;
# gold_alerts / q28_interval_overlap / uncapped cosine pair gates stay
# excluded per their standing contracts.
set -u
SF=${2:-/tmp/sf100}
OUT=${1:-/tmp/sf100_r15.log}
: > "$OUT"
BATCHES=(
  "dedup_ngram_capped"
  "dedup_clusters"
  "dedup_clusters_star"
  "catalog_stats_skipping,catalog_compact_roundtrip"
  "graph_pagerank"
  "text_bpeish_tokens,layout_zorder"
  "dedup_simhash_capped,multimodal_adpcm_decode"
  "events_dedup_window_stream,events_dedup_stream"
)
for b in "${BATCHES[@]}"; do
  echo "== batch(x1): $b" >> "$OUT"
  SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.tools.TimeOne $b $SF 1" 2>&1 \
    | grep -E '\[timeone\]|OutOfMemory|Exception in thread' >> "$OUT"
done
echo "== done" >> "$OUT"
