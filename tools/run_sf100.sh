#!/bin/bash
# Round 14, VERDICT r13 task 2: probe the NEXT decade. The 100 TB claims
# rested on sf10 (1.6 GB); this sweeps the scale-critical families at
# sf100 (16 GB, tools.MakeSfN 1000x of /root/testdata/sf0.1) to find the
# next wall — driver manifest lists, state-store volume, bucket counts —
# not to mint a green record. One fresh JVM per batch (16 GiB heap: at
# sf100 the 8 GiB bench default is the first wall you'd hit, and the
# sweep should report the ALGORITHM's wall, not the harness heap's).
# Heavy queries (>=15s at sf10) and the stream replays run 1 rep —
# min-of-2 doubles an hour of wall for a sweep whose question is slope,
# not record-grade minima; everything else keeps min-of-2.
# gold_alerts and q28_interval_overlap stay excluded BY CONTRACT (their
# capped serves are swept); dedup_semantic / dedup_embedding_cosine
# likewise (output-quadratic uncapped pair joins — capped twins swept).
set -u
SF=${2:-/tmp/sf100}
OUT=${1:-/tmp/sf100.log}
: > "$OUT"
REP2=(
  "dedup_embedding_cosine_capped,dedup_semantic_capped,dedup_exact"
  "dedup_minhash_lsh,dedup_simhash,q28_interval_overlap_capped"
  "gold_alerts_capped,gold_alerts_dense,partition_pruned_scan"
  "sim_ann_ivf,sim_ann_lsh,sim_ann_pq"
  "sim_ann_ivfpq,sim_ann_ivfpq_filtered"
  "catalog_change_feed,catalog_merge_upsert,catalog_vacuum"
  "layout_zorder,multimodal_adpcm_decode"
)
REP1=(
  "catalog_compact_roundtrip"
  "catalog_bucketed_join,catalog_stats_skipping"
  "graph_pagerank"
  "dedup_clusters"
  "dedup_clusters_star"
  "dedup_ngram_capped,text_bpeish_tokens"
  "events_window_stream,events_dedup_stream"
  "events_stream_stream_join,events_sessionize_stream"
)
for b in "${REP2[@]}"; do
  echo "== batch(x2): $b" >> "$OUT"
  SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.tools.TimeOne $b $SF 2" 2>&1 \
    | grep -E '\[timeone\]|OutOfMemory|Exception in thread' >> "$OUT"
done
for b in "${REP1[@]}"; do
  echo "== batch(x1): $b" >> "$OUT"
  SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.tools.TimeOne $b $SF 1" 2>&1 \
    | grep -E '\[timeone\]|OutOfMemory|Exception in thread' >> "$OUT"
done
echo "== done" >> "$OUT"
