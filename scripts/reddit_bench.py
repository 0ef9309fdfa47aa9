import sys; sys.path.insert(0, "/root/repo")
"""Reddit-scale SpMM/GAT benchmark (full 114.6M edges — the reference's
Reddit dims, genGraphOP.py:196-199).

Round-2 path: degree reorder + density-split execution — dense adjacency
blocks (bf16 MXU matmuls, supertiled for x-panel reuse) + one-hot edge
tiles for the sparse tail.  Compare against the round-1 streaming scan.

Usage: python scripts/reddit_bench.py [n_edges] [--stream]
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.data.datasets import synthetic_coo
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    hybrid_graph, reorder_nodes)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import dense as D
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import spmm as spmm_mod
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

N = 232965
E = int(sys.argv[1]) if len(sys.argv) > 1 else 114_615_892
DO_STREAM = "--stream" in sys.argv
F = 128

t0 = time.time()
s, r = synthetic_coo(N, E, seed=1)
hg = gta.build_host_graph(s, r, N, add_self_loops=True, symmetric_norm=True)
del s, r
print(f"build {time.time()-t0:.0f}s E={hg.n_edge}", flush=True)

t0 = time.time()
hg, perm = reorder_nodes(hg, "degree")
print(f"reorder {time.time()-t0:.0f}s", flush=True)

# --- hybrid split: dense blocks >= FLOP-balance threshold ---------------
RB = CB = 256
thr = D.spmm_dense_threshold(RB, CB)           # 128 edges per 256x256 block
t0 = time.time()
hyb = hybrid_graph(hg, block_rows=RB, block_cols=CB, tile_edges=512,
                   min_nnz=thr, supergroup=16,
                   values_dtype=ml_dtypes.bfloat16)
nb = hyb.dense.n_blocks if hyb.dense else 0
print(f"hybrid split {time.time()-t0:.0f}s: dense {hyb.n_dense_edges} edges "
      f"in {nb} blocks ({nb*RB*CB*2/2**30:.2f} GiB), "
      f"sparse {hyb.n_sparse_edges} in {hyb.tiles.n_tiles} tiles",
      flush=True)

x = jax.device_put(jax.random.normal(jax.random.key(0), (N, F), jnp.bfloat16))

def hybrid_fn(p, gg, xx):
    y = spmm_mod.spmm(hyb.tiles, xx)
    if hyb.dense is not None:
        yd = D.spmm_dense(hyb.dense, xx)
        y = y + yd[: y.shape[0]]
    return y[:N]

t = time_layer_device(hybrid_fn, None, None, x, k_small=1, k_big=7, reps=2)
print(f"HYBRID spmm F={F} bf16: {t*1e3:.1f} ms  "
      f"{hg.n_edge/t/1e9:.3f} Gedge/s", flush=True)

# dense-only and sparse-only components (same data) for the breakdown
if hyb.dense is not None:
    td = time_layer_device(lambda p, gg, xx: D.spmm_dense(hyb.dense, xx)[:N],
                           None, None, x, k_small=1, k_big=7, reps=2)
    print(f"  dense part:  {td*1e3:.1f} ms  "
          f"{hyb.n_dense_edges/td/1e9:.3f} Gedge/s", flush=True)
ts = time_layer_device(lambda p, gg, xx: spmm_mod.spmm(hyb.tiles, xx)[:N],
                       None, None, x, k_small=1, k_big=7, reps=2)
print(f"  sparse part: {ts*1e3:.1f} ms  "
      f"{hyb.n_sparse_edges/ts/1e9:.3f} Gedge/s", flush=True)

if DO_STREAM:
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import chunked
    g = hg.to_device()
    t2 = time_layer_device(
        lambda p, gg, xx: chunked.spmm_chunked(gg, xx, chunk=1 << 20),
        None, g, x, k_small=1, k_big=5, reps=2)
    print(f"STREAM spmm: {t2*1e3:.1f} ms  {hg.n_edge/t2/1e9:.3f} Gedge/s",
          flush=True)
