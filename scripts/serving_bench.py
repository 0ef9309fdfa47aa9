import sys; sys.path.insert(0, "/root/repo")
"""Batched-graph serving benchmark: block-diagonal batching.

Small-graph latency is fixed-cost bound (~40 edge tiles x ~µs dispatch +
per-tile overhead dominate at Cora scale — ROADMAP fact 2), so a serving
deployment batches B independent graphs into one block-diagonal adjacency
(node ids offset by b*N) and runs ONE kernel sweep.  Edges/s should rise
~linearly in B until the chip saturates; this measures that curve for the
SpMM aggregation and the fused GAT attention chain.

Usage: python scripts/serving_bench.py [--net GAT|SPMM]
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import tile_graph
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import spmm as spmm_mod
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import gat_attention
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

F, H = 128, 4
ds = gta.load_dataset("cora")
hg = ds.host_graph
s = hg.senders[: hg.n_edge]
r = hg.receivers[: hg.n_edge]
N = hg.n_node

print(f"base: cora N={N} E={hg.n_edge}", flush=True)
results = []
for B in (1, 4, 16, 64):
    off = (np.arange(B, dtype=np.int64)[:, None] * N)
    bs = (s[None, :] + off).reshape(-1).astype(np.int64)
    br = (r[None, :] + off).reshape(-1).astype(np.int64)
    bhg = gta.build_host_graph(bs, br, B * N, symmetric_norm=True)
    tg = tile_graph(bhg, block_rows=256, block_cols=256, tile_edges=512)
    tgu = tile_graph(bhg, block_rows=256, block_cols=256, tile_edges=512,
                     unit_weight=True)
    n_edge = bhg.n_edge

    x = jax.device_put(jax.random.normal(jax.random.key(0), (B * N, F),
                                         jnp.bfloat16))
    a_s = jax.device_put(jax.random.normal(jax.random.key(1), (B * N, H),
                                           jnp.bfloat16))
    a_d = jax.device_put(jax.random.normal(jax.random.key(2), (B * N, H),
                                           jnp.bfloat16))

    t_sp = time_layer_device(lambda p, g, v: spmm_mod.spmm(g, v),
                             None, tg, x, k_small=20, k_big=520, reps=2)
    t_gat = time_layer_device(
        lambda p, g, v: gat_attention(g, v, a_s, a_d, heads=H),
        None, tgu, x, k_small=20, k_big=520, reps=2)
    results.append((B, n_edge, t_sp, t_gat))
    print(f"B={B:3d}: E={n_edge:8d}  spmm {t_sp*1e6:8.1f} us "
          f"({n_edge/t_sp/1e9:6.3f} Gedge/s)   gat {t_gat*1e6:8.1f} us "
          f"({n_edge/t_gat/1e9:6.3f} Gedge/s)", flush=True)

b1 = results[0]
bN = results[-1]
print(f"scaling: spmm {b1[2]/bN[2]*bN[0]:.1f}x ideal {bN[0]}x; "
      f"gat {b1[3]/bN[3]*bN[0]:.1f}x ideal {bN[0]}x", flush=True)
print(f"SERVING best: spmm {bN[1]/bN[2]/1e9:.3f} Gedge/s  "
      f"gat {bN[1]/bN[3]/1e9:.3f} Gedge/s at B={bN[0]}", flush=True)
