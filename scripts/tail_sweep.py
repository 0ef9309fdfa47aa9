import sys; sys.path.insert(0, "/root/repo")
"""Sparse-tail geometry sweep at full Reddit scale.

The hybrid SpMM's cost is dominated by the sparse tail (r2: 94.8 of
103.8 ms).  Per tile the one-hot kernel does ~2*ET*(R+C)*F FLOPs for
ET*util real edges, so the figure of merit is (R+C)/(edges per tile) —
bigger blocks capture more edges per tile (community locality) but pay
wider one-hot matmuls.  This sweeps (sparse_block, tile_edges) over the
SAME tail edge set and times the SpMM kernel on hardware.

Usage: python scripts/tail_sweep.py [n_edges]
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.data.datasets import synthetic_coo
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    block_nnz, reorder_nodes, tile_graph)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import dense as D
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import spmm as spmm_mod
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

N = 232965
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
E = int(_pos[0]) if _pos else 114_615_892
F = 128
RB = CB = 256          # dense grid (fixed — same as reddit_bench)
DENSE_BUDGET = 5 << 30

t0 = time.time()
s, r, labels = synthetic_coo(N, E, seed=1, communities=1000, p_in=0.7)
hg = gta.build_host_graph(s, r, N, add_self_loops=True, symmetric_norm=False)
del s, r
hg, perm = reorder_nodes(hg, "hubs+labels", labels=labels)
print(f"build+reorder {time.time()-t0:.0f}s E={hg.n_edge}", flush=True)

# same dense/tail split as reddit_bench
bn = block_nnz(hg, RB, CB).reshape(-1)
bn_sorted = np.sort(bn)[::-1]
max_blocks = DENSE_BUDGET // (RB * CB * 2)
thr = max(D.spmm_dense_threshold(RB, CB),
          int(bn_sorted[max_blocks - 1]) + 1 if len(bn_sorted) > max_blocks
          else 0)
DO_GAT = "--gat" in sys.argv
H, HD = 4, 128
if DO_GAT:
    thr = max(D.gat_dense_threshold(RB, CB, H, HD // H),
              int(bn_sorted[max_blocks - 1]) + 1
              if len(bn_sorted) > max_blocks else 0)
se = hg.senders[: hg.n_edge]
re = hg.receivers[: hg.n_edge]
cbn = -(-N // CB)
key = (re // RB).astype(np.int64) * cbn + (se // CB)
in_dense = bn[key] >= thr
tail_s, tail_r = se[~in_dense], re[~in_dense]
print(f"tail edges {len(tail_s)} (thr={thr}, gat={DO_GAT})", flush=True)
tail_hg = gta.build_host_graph(tail_s, tail_r, N, add_self_loops=False,
                               symmetric_norm=False)
del tail_s, tail_r, se, re

x = jax.device_put(jax.random.normal(jax.random.key(0), (N, F), jnp.bfloat16))
if DO_GAT:
    a_s = jax.device_put(jax.random.normal(jax.random.key(5), (N, H),
                                           jnp.bfloat16))
    a_d = jax.device_put(jax.random.normal(jax.random.key(6), (N, H),
                                           jnp.bfloat16))
    msrc = jnp.max(a_s.astype(jnp.float32), axis=0, keepdims=True)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import (
        _gat_forward)

    def tail_fn(p, gg, xx):
        return _gat_forward(gg, xx, a_s, a_d, normalize=False,
                            msrc=msrc)[:N, :HD]
else:
    def tail_fn(p, gg, xx):
        return spmm_mod.spmm(gg, xx)[:N]

CONFIGS = [
    (1024, 1024, 512),    # r2 baseline
    (1024, 1024, 1024),
    (2048, 2048, 512),
    (2048, 2048, 1024),
    (512, 512, 512),
    (512, 4096, 512),     # rectangular: wide gather, narrow scatter
    (2048, 4096, 1024),
]

results = []
for sbr, sbc, et in CONFIGS:
    t0 = time.time()
    try:
        tg = tile_graph(tail_hg, block_rows=sbr, block_cols=sbc,
                        tile_edges=et, unit_weight=DO_GAT)
        nt = tg.n_tiles
        util = tail_hg.n_edge / max(nt * et, 1)
        tt = time_layer_device(tail_fn, None, tg, x, k_small=1, k_big=7,
                               reps=2)
    except Exception as ex:
        print(f"R{sbr} C{sbc} ET{et}: FAILED {type(ex).__name__}", flush=True)
        continue
    gps = tail_hg.n_edge / tt / 1e9
    results.append((sbr, sbc, et, nt, util, tt, gps))
    print(f"R{sbr} C{sbc} ET{et}: tiles={nt} util={util:.2f} "
          f"prep={time.time()-t0:.0f}s  {tt*1e3:.1f} ms  {gps:.3f} Gedge/s",
          flush=True)
    del tg

if not results:
    print("no config succeeded", flush=True)
    sys.exit(1)
best = max(results, key=lambda t: t[-1])
print(f"BEST: R{best[0]} C{best[1]} ET{best[2]} -> {best[6]:.3f} Gedge/s "
      f"({best[5]*1e3:.1f} ms)", flush=True)
