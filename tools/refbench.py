#!/usr/bin/env python3
"""Benchmark the REFERENCE (GambitResearch/bacon, /root/reference) on the
same data and query shapes as graft's Bench, for a single-node
throughput comparison. Usage: python3 tools/refbench.py [sfDir]
"""
import sys, time
sys.path.insert(0, "/root/reference")

import pyarrow.parquet as pq
from collections import namedtuple

from bacon.cubedef import CubeDef, Label, Measure
from bacon import accumulators as accs
from bacon.cubequery import CubeQuery
from bacon.cutting import CuttingBoard

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

t0 = time.time()
tbl = pq.read_table(f"{sf_dir}/lineitem.parquet")
cols = tbl.column_names
Row = namedtuple("Row", cols)
data = [Row(*vals) for vals in zip(*[tbl.column(c).to_pylist() for c in cols])]
t_load = time.time() - t0
print(f"load {len(data)} rows: {t_load:.2f}s")

cd = CubeDef()
cd.add_label(Label("l_returnflag"))
cd.add_label(Label("l_linestatus"))
cd.add_measure(Measure("sum_qty", extract=lambda r: r.l_quantity, acc=accs.Sum))
cd.add_measure(Measure("n_rows", extract=lambda r: 1, acc=accs.Count))
cd.add_measure(Measure("avg_qty", extract=lambda r: r.l_quantity, acc=accs.Average))
cd.add_measure(Measure("std_qty", extract=lambda r: r.l_quantity, acc=accs.StdDev))

board = CuttingBoard(cd, data)
results = {}

def bench(name, q, fresh=False):
    # fresh=True: a new board with an empty slice cache — the COLD cost
    # of the shape; fresh=False reuses `board` (its cache measures the
    # reference's warm drill-down path)
    b = CuttingBoard(cd, data) if fresh else board
    t0 = time.time()
    s = b.slice(q)
    # force full materialization like graft's noop sink
    def walk(d):
        if isinstance(d, dict):
            for v in d.values():
                walk(v)
    walk(s._data)
    results[name] = time.time() - t0
    print(f"{name:28s} {results[name]:7.2f}s")

q1 = (CubeQuery().add_axis("l_returnflag").add_axis("l_linestatus")
      .add_value("sum_qty").add_value("n_rows"))
bench("q01_agg_basic (cold)", q1)
bench("q01_agg_basic (cached)", q1)

q3 = CubeQuery().add_axis("l_returnflag").add_value("avg_qty").add_value("std_qty")
bench("q03_avg_stddev", q3)

# drill-down: filter on first axis, drop it (DrillOnFirstAxis reuse)
qd = q1.add_filter("l_returnflag", "R").remove_axis("l_returnflag")
bench("q19_drill (from cache)", qd)

# filtered slice on a NON-axis label: no cached slice can serve it —
# the cold full-scan path graft runs as a pushed-down parquet filter
q8 = (CubeQuery().add_axis("l_linestatus").add_value("sum_qty")
      .add_filter("l_returnflag", "A"))
bench("q08_filter_cmp (cold scan)", q8, fresh=True)

# pivot: row axis l_returnflag, pivoted l_linestatus (q14's shape)
q14 = (CubeQuery().add_axis("l_returnflag").add_axis("l_linestatus")
       .add_value("sum_qty").set_pivot("l_linestatus"))
bench("q14_pivot (cold)", q14, fresh=True)

# grand total: 0-dim slice over every row (q07's shape)
q7 = CubeQuery().add_value("sum_qty").add_value("n_rows")
bench("q07_grand_total", q7, fresh=True)

total = sum(results.values())
print(f"total slices: {total:.2f}s  (+ {t_load:.2f}s load)")
