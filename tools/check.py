#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Compares each <outDir>/<name> parquet (Spark result) against the oracle
SQL in <outDir>/oracle_sql.json run by DuckDB over <sfDir>/*.parquet.
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(rows, cols):
    # sort columns by name, then rows by stringified values (driver-style)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    # Verify records every thrown query here — including rows-only ones
    # that have no oracle entry and would otherwise vanish from this
    # gate's universe entirely.
    fail_path = f"{out_dir}/_failures.json"
    if os.path.exists(fail_path):
        for name, err in sorted(json.load(open(fail_path)).items()):
            print(f"THREW   {name}: {err}"); n_bad += 1
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"MISSING {name}: no spark output"); n_bad += 1; continue
        try:
            sp = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            sp_cols = [d[0] for d in sp.description]; sp_rows = sp.fetchall()
            du = con.execute(sql)
            du_cols = [d[0] for d in du.description]; du_rows = du.fetchall()
        except Exception as e:
            print(f"ERROR   {name}: {e}"); n_bad += 1; continue
        if sorted(sp_cols) != sorted(du_cols):
            print(f"SCHEMA  {name}: spark={sorted(sp_cols)} duck={sorted(du_cols)}"); n_bad += 1; continue
        # The real driver compares through pandas: DuckDB HUGEINT becomes
        # float64 (hash-mismatches Spark int64) and LIST cells are
        # unsortable/unhashable. Flag both as failures even though the
        # fetchall() compare below would paper over them.
        du_types = [d[1] for d in du.description]
        bad_types = [(c, t) for c, t in zip(du_cols, du_types)
                     if str(t) in ("HUGEINT", "INT128") or str(t).endswith("[]") or "LIST" in str(t).upper()]
        sp_types = [d[1] for d in sp.description]
        bad_types += [(c, t) for c, t in zip(sp_cols, sp_types)
                      if str(t).endswith("[]") or "LIST" in str(t).upper()]
        if bad_types:
            print(f"DTYPE   {name}: driver-pandas-unsafe columns {bad_types}"); n_bad += 1; continue
        sc, sr = norm(sp_rows, sp_cols)
        dc, dr = norm(du_rows, du_cols)
        if sr == dr:
            print(f"OK      {name} ({len(sr)} rows)"); n_ok += 1
        else:
            print(f"VALUES  {name}: {len(sr)} spark rows vs {len(dr)} duck rows")
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            only_sp = [r for r in sr if r not in set(dr)][:3]
            only_du = [r for r in dr if r not in set(sr)][:3]
            for a, b in diff: print(f"    spark={a}\n    duck ={b}")
            if only_sp: print(f"    only-spark: {only_sp}")
            if only_du: print(f"    only-duck:  {only_du}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
