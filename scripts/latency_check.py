import sys; sys.path.insert(0, "/root/repo")
"""Validate the compile-only latency model (compiler/latency.py) against the
memoised measured latencies (results/memo_*.csv, v6 calibrated entries).

Thin CLI over compiler.latency.rank_check — the same check is enforced in
CI by tests/test_latency_model.py (spearman >= 0.9, argmin regret <= 1.25).
Runs entirely on CPU (no TPU needed): the model is closed-form.
"""
import jax

jax.config.update("jax_platforms", "cpu")

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
    latency as L)

ds = gta.load_dataset("cora")

CASES = [
    ("results/memo_gcn_cora.csv", "GCN-original-gcn2",
     lambda: gta.build_op_graph("GCN", 128, 64, layer_tag="gcn2")),
    ("results/memo_gat_cora_l3.csv", "GAT-original-l3bench",
     lambda: gta.build_op_graph("GAT", 64, 16, heads=16,
                                layer_tag="l3bench")),
]

for path, gname, builder in CASES:
    r = L.rank_check(path, gname, builder(), ds.host_graph)
    if r is None:
        print(f"{gname}: no v6 entries")
        continue
    print(f"\n== {gname} ({len(r['rows'])} schedules) ==")
    print(f"{'measured us':>12} {'modelled us':>12}  schedule")
    for meas, mod, key in r["rows"]:
        print(f"{meas:12.1f} {mod:12.1f}  {key[:90]}")
    print(f"spearman={r['spearman']:.3f}  argmin_regret={r['argmin_regret']:.2f}")
