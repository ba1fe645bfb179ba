#!/usr/bin/env python3
"""Merge the r12 FULL-inventory sf10 extension into BENCH_SF10.json
(and the two new gates' sf1 entries into BENCH_SF1.json).

Sources:
 - BENCH_SF10.json: the 135-query r12 record, kept where not re-measured.
 - /tmp/sf10_full.log: the tail sweep — the 54 sub-second-at-sf1 queries
   that had never run at 100x bench scale, plus the round's two new
   gates (multimodal_png_decode, warc_extract) and a BMP re-record.
 - overrides: the three codec gates re-measured in isolation at HEAD
   after the shared-Deflater fixture fix landed (the sweep timed the
   pre-fix build).

Exclusions, both BY CONTRACT (output-quadratic under the bench
synthesis, verified by measurement, not assumption):
 - gold_alerts: the uncapped flagship (sf1 507 s; capped/dense serves
   are in the record).
 - q28_interval_overlap: fixed value range x100 density => pair count
   83,769 (sf0.1) -> 8,370,610 (sf1) -> 837,202,000 (sf10), exactly
   100x/decade (measured via DuckDB on the synthesized corpora). The
   sf1 entry (1.2 s over 8.37M pairs) stays in BENCH_SF1 as the honest
   scale point; materializing + globally sorting 837M pairs is a
   synthesis artifact, not an engine property — the same grid join at
   sf10 DENSITY-CAPPED is exercised by gold_alerts_capped/dense.
"""
import json, re

def mins_from(path):
    out = {}
    for line in open(path):
        m = re.search(r"\[timeone\] (\S+) rep\d+ ([0-9.]+) s", line)
        if m:
            q, t = m.group(1), float(m.group(2))
            out[q] = min(out.get(q, 1e9), t)
    return out

# isolated post-fix re-measurements at HEAD (shared-Deflater fixtures)
SF10_OVERRIDES = {
    "multimodal_png_decode": 6.076,
    "warc_extract": 7.304,
    "multimodal_bmp_decode": 2.788,
    # (nationkey, balance-cell) equi-key rewrite, isolated min-of-3
    "q9_theta_band_join": 3.315,
}
SF1_ADDITIONS = {
    "multimodal_png_decode": 1.045,
    "warc_extract": 1.190,
    # new q9 plan at sf1 (isolated min-of-4; pays explode overhead vs
    # the old nationkey-only plan's 0.489 quiet-window record - the
    # trade that buys 16.8 -> 3.3s at sf10)
    "q9_theta_band_join": 0.864,
}

sf1 = json.load(open("BENCH_SF1.json"))
sf1["queries"].update(SF1_ADDITIONS)
sf1["queries"] = {q: round(t, 3) for q, t in
                  sorted(sf1["queries"].items(), key=lambda kv: -kv[1])}
sf1["value"] = round(sum(sf1["queries"].values()), 3)
sf1["n_queries"] = len(sf1["queries"])
sf1["note"] = sf1.get("note", "") + (
    " r12 full-record addendum: multimodal_png_decode and warc_extract "
    "join (shared-Deflater fixture build).")

sf10 = json.load(open("BENCH_SF10.json"))
sf10["queries"].update(mins_from("/tmp/sf10_full.log"))
sf10["queries"].update(SF10_OVERRIDES)
sf10["queries"].pop("q28_interval_overlap", None)  # excluded by contract
sf10["queries"] = {q: round(t, 3) for q, t in
                   sorted(sf10["queries"].items(), key=lambda kv: -kv[1])}
sf10["value"] = round(sum(sf10["queries"].values()), 3)
sf10["n_queries"] = len(sf10["queries"])
s1q = sf1["queries"]
slopes = {q: round(t / s1q[q], 1) for q, t in sf10["queries"].items()
          if q in s1q and s1q[q] > 0}
sf10["slopes_vs_sf1"] = dict(sorted(slopes.items(), key=lambda kv: -kv[1]))
sf10["note"] = (
    "r12 FULL-inventory record: every driver query at 100x bench scale "
    "except gold_alerts and q28_interval_overlap, both excluded by "
    "contract as output-quadratic under the bench synthesis (gold_alerts "
    "sf1 507s; q28 pair count measured 83.7k -> 8.37M -> 837M, exactly "
    "100x/decade from the fixed value range — its grid join IS scale-"
    "exercised through gold_alerts_capped/dense). All on the 8 GiB JVM "
    "at the 1g DEFAULT maxResultSize; engine-only stream sinks; "
    "graph_pagerank batched one-per-JVM; TimeOne min-of-reps under "
    "BenchAction, local[32]. The two density-quadratic exact cosine "
    "gates (dedup_semantic, dedup_embedding_cosine) remain IN the "
    "record as the ground-truth twins of the ANN/LSH family.")

json.dump(sf1, open("BENCH_SF1.json", "w"), indent=1)
json.dump(sf10, open("BENCH_SF10.json", "w"), indent=1)
print("sf1:", sf1["n_queries"], "queries,", sf1["value"], "s")
print("sf10:", sf10["n_queries"], "queries,", sf10["value"], "s")
print("worst slopes:", list(sf10["slopes_vs_sf1"].items())[:10])
missing = [q for q in sf1["queries"]
           if q not in sf10["queries"]
           and q not in ("gold_alerts", "q28_interval_overlap")]
print("missing from sf10 (should be empty):", missing)
