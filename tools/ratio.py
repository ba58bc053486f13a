#!/usr/bin/env python3
"""Scale-ratio report — THE pinned formula behind SURVEY's "median
per-query ratio" numbers (round-11 verdict finding #3: two readers
computed 4.93x vs 5.21x from the same artifacts; this script is now the
definition).

For each scale point BENCH_sfN.json:
  - take the intersection of query keys with BENCH.json (sf0.1);
  - ratio(q) = median_sfN(q) / median_sf0.1(q), using the per-query
    median-of-reps seconds stored in each file's "queries" map;
  - report the MEDIAN over those ratios, where an even count averages
    the two middle values (statistics.median), plus the count and the
    number of superlinear queries (ratio > scale factor).

Usage: python3 tools/ratio.py   (from the repo root)
"""
import json
import statistics
import sys

BASE = "BENCH.json"
POINTS = [("BENCH_sf1.json", 10), ("BENCH_sf3.json", 30), ("BENCH_sf10.json", 100)]


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    base = load(BASE)
    for path, factor in POINTS:
        try:
            q = load(path)
        except FileNotFoundError:
            print(f"{path}: missing")
            continue
        common = sorted(set(base) & set(q))
        ratios = [q[k] / base[k] for k in common if base[k] > 0]
        if not ratios:
            print(f"{path}: no comparable queries vs {BASE}")
            continue
        med = statistics.median(ratios)
        superlinear = [k for k in common if base[k] > 0 and q[k] / base[k] > factor]
        print(f"{path}: {len(common)} common queries, median ratio "
              f"{med:.2f}x on {factor}x data, {len(superlinear)} superlinear"
              + (f" ({', '.join(superlinear)})" if superlinear else ""))


if __name__ == "__main__":
    sys.exit(main())
