#!/usr/bin/env python3
"""Per-query scale-up ratios between two Bench JSON maps.

Usage: scale_ratio.py <bench_small.json> <bench_big.json> <factor>

Prints every query's (t_small, t_big, ratio) sorted by ratio descending,
plus a family rollup. A ratio at or below `factor` is at-worst-linear in
data volume; most queries sit far below because per-query fixed overhead
(plan + codegen + small-file scheduling) dominates at the small end.
Ratios materially ABOVE `factor` are the red flags the scale bench
exists to catch.
"""
import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))["queries"]
    big = json.load(open(sys.argv[2]))["queries"]
    factor = float(sys.argv[3])
    rows = []
    for name, ts in sorted(small.items()):
        if name not in big:
            continue
        tb = big[name]
        rows.append((name, ts, tb, tb / max(ts, 1e-9)))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':34s} {'small':>8s} {'big':>8s} {'ratio':>7s}")
    flagged = 0
    for name, ts, tb, ratio in rows:
        flag = "  <-- super-linear" if ratio > factor else ""
        if flag:
            flagged += 1
        print(f"{name:34s} {ts:8.2f} {tb:8.2f} {ratio:7.2f}{flag}")
    tot_s = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print(f"\n{'TOTAL':34s} {tot_s:8.2f} {tot_b:8.2f} "
          f"{tot_b / tot_s:7.2f}")
    print(f"queries above the x{factor:g} linear line: {flagged}")


if __name__ == "__main__":
    main()
