import sys; sys.path.insert(0, "/root/repo")
"""Batched-graph serving benchmark: block-diagonal batching, tuned schedules.

Small-graph latency is fixed-cost bound (~40 edge tiles x per-tile overhead
dominate at Cora scale — ROADMAP fact 2), so a serving deployment batches B
independent graphs into one block-diagonal adjacency (node ids offset by
b*N) and runs ONE kernel sweep.  Edges/s should rise in B until the chip
saturates.

The serving path is the REAL framework path: the schedule tuned once on the
base graph (results/best_gat_cora128.json / best_gcn_cora.json, written by
`cli.py tune`) is lowered against the batched host graph — tile geometry
transfers because per-block density is unchanged by block-diagonal
composition.  (A raw-ops 256x256 baseline measured 231 us B=1 GAT /
0.052 Gedge/s B=64 — 6x worse than the tuned schedule; keep using the
compiler.)

Usage: python scripts/serving_bench.py
"""
import json
import os

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
    schedule as S)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.fusion import (
    lower_schedule)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import (
    init_params, lower)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)


def load_schedule(path):
    spec = json.load(open(path))
    return S.Schedule(blocks=tuple(tuple(b) for b in spec["blocks"]),
                      tiles=tuple(S.TileConfig(*t) for t in spec["tiles"]))


NETS = {
    "GAT": (("GAT", 128, 128), dict(heads=4), "results/best_gat_cora128.json"),
    "GCN": (("GCN", 128, 128), dict(), "results/best_gcn_cora.json"),
}

ds = gta.load_dataset("cora")
hg = ds.host_graph
s = hg.senders[: hg.n_edge]
r = hg.receivers[: hg.n_edge]
N = hg.n_node
print(f"base: cora N={N} E={hg.n_edge}", flush=True)

for net, ((fam, fin, fout), kw, sched_path) in NETS.items():
    og = gta.build_op_graph(fam, fin, fout, layer_tag=f"serve_{net}", **kw)
    params = jax.device_put(init_params(og, jax.random.key(0)))
    sched = (load_schedule(sched_path) if os.path.exists(sched_path) else None)
    results = []
    for B in (1, 4, 16, 64):
        off = (np.arange(B, dtype=np.int64)[:, None] * N)
        bs = (s[None, :] + off).reshape(-1).astype(np.int64)
        br = (r[None, :] + off).reshape(-1).astype(np.int64)
        bhg = gta.build_host_graph(bs, br, B * N, symmetric_norm=True)
        fn = (lower_schedule(og, sched, bhg, compute_dtype=jnp.bfloat16)
              if sched is not None else
              lower(og, compute_dtype=jnp.bfloat16))
        x = jax.device_put(jax.random.normal(jax.random.key(1), (B * N, fin),
                                             jnp.float32))
        g = bhg.to_device()
        # bigger batches carry proportionally more device work per loop
        # iteration; shrink loop counts to keep wall time bounded
        kb = max(120, 4100 // B)
        t = time_layer_device(fn, params, g, x, k_small=20, k_big=kb, reps=3)
        results.append((B, bhg.n_edge, t))
        print(f"{net} B={B:3d}: E={bhg.n_edge:8d}  {t*1e6:9.1f} us  "
              f"({bhg.n_edge/t/1e9:6.3f} Gedge/s)", flush=True)
    b1, bN = results[0], results[-1]
    print(f"{net} scaling: {b1[2]/bN[2]*bN[0]:.1f}x ideal {bN[0]}x; best "
          f"{max(e/t for _, e, t in results)/1e9:.3f} Gedge/s", flush=True)
