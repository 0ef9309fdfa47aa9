import sys; sys.path.insert(0, "/root/repo")
"""Validate the compile-only latency model (compiler/latency.py) against the
memoised measured latencies (results/memo_*.csv, v6 calibrated entries).

Prints modelled-vs-measured per schedule plus Spearman rank correlation and
whether the modelled argmin matches the measured argmin — the VERDICT r2
next-2 'ranking matches measured order on the memoised configs' check.

Runs entirely on CPU (no TPU needed): the model is closed-form.
"""
import csv
import os

import jax

jax.config.update("jax_platforms", "cpu")

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
    latency as L, schedule as S)

ds = gta.load_dataset("cora")
hg = ds.host_graph

CASES = [
    ("results/memo_gcn_cora.csv", "GCN-original-gcn2",
     lambda: gta.build_op_graph("GCN", 128, 64, layer_tag="gcn2"), 128),
    ("results/memo_gat_cora_l3.csv", "GAT-original-l3bench",
     lambda: gta.build_op_graph("GAT", 64, 16, heads=16,
                                layer_tag="l3bench"), 64),
    ("results/memo_gat_cora128.csv", None, None, None),  # auto-discover
]


def spearman(a, b):
    import numpy as np
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean(); rb -= rb.mean()
    d = (ra * ra).sum() ** 0.5 * (rb * rb).sum() ** 0.5
    return float((ra * rb).sum() / d) if d else 0.0


for path, gname, builder, fw in CASES:
    if builder is None or not os.path.exists(path):
        continue
    graph = builder()
    cost = L.GraphCost(hg)
    rows = []
    with open(path) as f:
        for rec in csv.reader(f):
            if len(rec) != 2 or not rec[0].startswith("v6|"):
                continue
            _, name, key = rec[0].split("|", 2)
            if name != gname:
                continue
            try:
                sched = S.Schedule.from_key(key)
            except Exception:
                continue
            modelled = L.schedule_ns(graph, sched, cost) / 1e3
            measured = float(rec[1]) * 1e6
            rows.append((measured, modelled, key))
    if not rows:
        print(f"{gname}: no v6 entries")
        continue
    rows.sort()
    print(f"\n== {gname} ({len(rows)} schedules) ==")
    print(f"{'measured us':>12} {'modelled us':>12}  schedule")
    for meas, mod, key in rows:
        print(f"{meas:12.1f} {mod:12.1f}  {key[:90]}")
    meas = [r[0] for r in rows]
    mod = [r[1] for r in rows]
    rho = spearman(meas, mod)
    argmin_match = mod.index(min(mod)) == 0
    print(f"spearman={rho:.3f}  modelled-argmin==measured-argmin: "
          f"{argmin_match}")
