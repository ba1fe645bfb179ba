#!/usr/bin/env python3
"""Merge a run_sf100.sh log into BENCH_SF100.json with slopes vs sf10.

Usage: python3 tools/merge_sf100.py /tmp/sf100.log
Reads [timeone] lines (min across reps per query), joins BENCH_SF10.json
for the per-decade slope column, writes BENCH_SF100.json.
"""
import json, re, sys

def main():
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100.log"
    times = {}
    for line in open(log):
        m = re.match(r"\[timeone\] (\S+) rep\d+ ([0-9.]+) s", line.strip())
        if m:
            q, sec = m.group(1), float(m.group(2))
            times[q] = min(times.get(q, 1e18), sec)
    sf10 = json.load(open("BENCH_SF10.json"))["queries"]
    slopes = {q: round(times[q] / sf10[q], 2) for q in times
              if q in sf10 and sf10[q] > 0}
    out = {
        "metric": "total",
        "value": round(sum(times.values()), 1),
        "unit": "sec",
        "queries": {q: round(v, 3) for q, v in sorted(times.items())},
        "slope_vs_sf10": dict(sorted(slopes.items())),
        "n_queries": len(times),
        "sf": "/tmp/sf100 (tools.MakeSfN 1000x of /root/testdata/sf0.1)",
        "note": ("r14 next-decade probe (VERDICT r13 task 2): scale-critical "
                 "families only, 16 GiB JVMs, heavies and stream replays 1 rep "
                 "(slope instrument, not a record-grade minimum; everything "
                 "else min-of-2). slope_vs_sf10 is the per-decade multiplier "
                 "against the committed BENCH_SF10 entry."),
    }
    with open("BENCH_SF100.json", "w") as f:
        f.write(json.dumps(out) + "\n")
    print(f"{len(times)} queries, total {out['value']}s")
    for q, s in sorted(slopes.items(), key=lambda kv: -kv[1]):
        print(f"  {s:6.2f}x/decade  {q} ({times[q]:.1f}s)")

if __name__ == "__main__":
    main()
