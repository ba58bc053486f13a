#!/usr/bin/env python3
"""Oracle gate at SCALE: check.py's comparison run over a graft.ScaleUp
output directory (tables are parquet DIRECTORIES there, and a few
oracles are intentionally quadratic and priced out of DuckDB at 10x+).

Usage: python3 tools/scalecheck.py <scaledSfDir> <verifyOutDir> [skip,..] [only,..]

Type fidelity: the driver's events.ts is parquet
TIMESTAMP(isAdjustedToUTC=false, MICROS) — DuckDB reads it as
TIMESTAMP directly and ScaleUp preserves the same annotation
(pyarrow-verified), so no view rewrite is needed and the scale gate
exercises the identical Tpch.table NTZ branch as the driver gate. The
BIGINT branch below covers the legacy TIMESTAMP(NANOS) era, where
Spark read the column as LONG (nanosAsLong) and ScaleUp rewrote it as
untyped INT64; the view layer restores the declared type so old
replicas still check.

Default skips (all-pairs forms, O(n^2) at scale; their operators have
linear scale paths that ARE checked):
  d05 embed-dup exact + d06 brute top-k (quadratic on BOTH engines —
  also skipped Spark-side via SPARK_GRAFT_VERIFY_SKIP) / d24 whose
  DuckDB oracle is all-pairs levenshtein (the Spark side is SymSpell
  and runs fine). e05/e06 semdedup are NOT skipped: ScaleUp remaps
  cluster labels per replica, so cluster size is scale-invariant and
  the in-cluster pair join stays linear in the corpus.

  q15 is skipped at scale for a different declared reason: every
  replica contributes a group whose sum is the SAME set of doubles
  added in a different partition order, so the top-k boundary becomes
  a run of sub-ulp near-ties and `ORDER BY float LIMIT k` picks
  engine-dependent ids. The ordering is well-defined on the driver's
  un-replicated data (sf0.01 gate green); no tiebreaker can define a
  rank tighter than an ulp.

Float sums: 10x+ more additions than the driver gate means engine
summation order can move a grand total by ~1e-14 relative and flip a
round(x, 2) digit (q07 at 30x: ...708.02 vs ...708.04 of 9.5e11).
Rows that fail the exact string compare are re-compared positionally
with relative tolerance 1e-9 per numeric cell — a real defect (wrong
rows, wrong keys, wrong magnitudes) cannot hide inside 1e-9.
"""
import sys, json, os
import duckdb
from check import TABLES, norm

DEFAULT_SKIP = {"d05_embed_dup", "d06_cosine_topk", "d24_typo_pairs",
                "q15_order_limit"}

def _tol_eq(a, b, rel=1e-9):
    if a == b:
        return True
    try:
        fa, fb = float(a), float(b)
    except (TypeError, ValueError):
        return False
    return abs(fa - fb) <= rel * max(1.0, abs(fa), abs(fb))

def rows_match_tol(sr, dr):
    """Positional re-compare of two SORTED stringified row lists with
    per-cell float tolerance. Sound only when drift doesn't reorder the
    sort (keys sort first or row count is tiny); a misalignment just
    falls through to a reported VALUES diff, never a false OK."""
    if len(sr) != len(dr):
        return False
    return all(len(a) == len(b) and all(map(_tol_eq, a, b))
               for a, b in zip(sr, dr))

def main(sf_dir, out_dir, skip, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else (f"'{p}'" if os.path.exists(p) else None)
        if src is None:
            continue
        cols = con.execute(f"DESCRIBE SELECT * FROM read_parquet({src})").fetchall()
        types = {c[0]: c[1] for c in cols}
        # nanos-timestamp restore (see module docstring). DuckDB 1.0 has
        # no make_timestamp_ns, so the view truncates to micros — the
        # same resolution the compare already runs at (python datetime);
        # a flipped comparison needs two events of one user inside the
        # same MICROsecond (~1e-10 at this density), and would surface
        # as a VALUES diff, not silently.
        repl = ""
        if t == "events" and types.get("ts") == "BIGINT":
            repl = " REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT *{repl} FROM read_parquet({src})")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_skip = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        if name in skip:
            print(f"SKIP    {name} (declared-necessity skip at scale; see docstring)"); n_skip += 1; continue
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"MISSING {name}: no spark output"); n_bad += 1; continue
        try:
            sp = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            sp_cols = [d[0] for d in sp.description]; sp_rows = sp.fetchall()
            du = con.execute(oracle[name])
            du_cols = [d[0] for d in du.description]; du_rows = du.fetchall()
        except Exception as e:
            print(f"ERROR   {name}: {e}"); n_bad += 1; continue
        if sorted(sp_cols) != sorted(du_cols):
            print(f"SCHEMA  {name}: spark={sorted(sp_cols)} duck={sorted(du_cols)}"); n_bad += 1; continue
        sc, sr = norm(sp_rows, sp_cols)
        dc, dr = norm(du_rows, du_cols)
        if sr == dr:
            print(f"OK      {name} ({len(sr)} rows)"); n_ok += 1
        elif rows_match_tol(sr, dr):
            print(f"OK~     {name} ({len(sr)} rows, within fp tolerance)"); n_ok += 1
        else:
            print(f"VALUES  {name}: {len(sr)} spark rows vs {len(dr)} duck rows")
            only_sp = [r for r in sr if r not in set(dr)][:2]
            only_du = [r for r in dr if r not in set(sr)][:2]
            if only_sp: print(f"    only-spark: {only_sp}")
            if only_du: print(f"    only-duck:  {only_du}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_skip} skipped")
    return 1 if n_bad else 0

if __name__ == "__main__":
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 and sys.argv[3] else DEFAULT_SKIP
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2], skip, only))
