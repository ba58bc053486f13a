#!/usr/bin/env python3
"""Compare two BENCH json artifacts per query.

Usage: python3 tools/benchcmp.py <base.json> <new.json> [min_ratio]

Prints queries sorted by wall ratio (new/base) descending, flagging
ratios above `min_ratio` (default 2.0) — the quick answer to "what got
slower between these two commits / scale points" and "is growth
sublinear". Plan-hash changes are marked with `plan!` so a wall
regression can immediately be classified as plan-change vs noise.
"""
import sys, json

def _load(path):
    d = json.load(open(path))
    # driver-written BENCH_r{N}.json wraps the bench line under "parsed"
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d

def main(base_path, new_path, min_ratio=2.0):
    base = _load(base_path)
    new = _load(new_path)
    bq, nq = base.get("queries", {}), new.get("queries", {})
    bp, np_ = base.get("plans", {}), new.get("plans", {})
    rows = []
    for k in sorted(set(bq) | set(nq)):
        b, n = bq.get(k), nq.get(k)
        if b is None or n is None:
            rows.append((float("inf"), k, b, n, "only-one-side"))
            continue
        ratio = n / b if b > 0 else float("inf")
        mark = "plan!" if bp.get(k) != np_.get(k) and k in bp and k in np_ else ""
        rows.append((ratio, k, b, n, mark))
    rows.sort(reverse=True)
    flagged = 0
    for ratio, k, b, n, mark in rows:
        flag = " <-- " if ratio >= min_ratio and b is not None and n is not None else ""
        if flag:
            flagged += 1
        bs = f"{b:7.2f}" if b is not None else "      -"
        ns = f"{n:7.2f}" if n is not None else "      -"
        print(f"{ratio:7.2f}x  {bs} -> {ns}  {k} {mark}{flag}")
    med = sorted(r for r, _, b, n, _ in rows if b is not None and n is not None)
    if med:
        print(f"\nmedian ratio {med[len(med)//2]:.2f}x over {len(med)} queries; "
              f"{flagged} above {min_ratio}x; totals {base.get('value')} -> {new.get('value')}")

if __name__ == "__main__":
    try:
        main(sys.argv[1], sys.argv[2],
             float(sys.argv[3]) if len(sys.argv) > 3 else 2.0)
    except BrokenPipeError:  # piped to head
        pass
