import sys; sys.path.insert(0, "/root/repo")
"""Calibrate the multi-class tile assignment on the flickr SpMM tail.

One process, discarded warmup, in-process baseline (timing discipline per
ROADMAP): measures
  (a) single-class tilings at each candidate ET (fixed-cost regression),
  (b) multi-class tilings for several fixed_slots values and class sets.

Usage: python scripts/class_sweep.py [dataset]
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    HostGraph, block_nnz, reorder_nodes, tile_graph, tile_graph_classes)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import dense as D
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import spmm as spmm_mod
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

name = sys.argv[1] if len(sys.argv) > 1 else "flickr"
F = 128
ds = gta.load_dataset(name)
hg, _ = reorder_nodes(ds.host_graph, "degree")
N = hg.n_node

# isolate the SpMM tail (same split as medium_bench)
bn = block_nnz(hg, 256, 256).reshape(-1)
cbn = int(np.ceil(N / 256))
thr = D.spmm_dense_threshold(256, 256, fudge=0.5)
m = bn[((hg.receivers[: hg.n_edge] // 256).astype(np.int64) * cbn
        + hg.senders[: hg.n_edge] // 256)] < thr
st, rt = hg.senders[: hg.n_edge][m], hg.receivers[: hg.n_edge][m]
k = len(st)
ep = ((k + 127) // 128) * 128
tail = HostGraph(
    senders=np.concatenate([st, np.full(ep - k, N, np.int32)]),
    receivers=np.concatenate([rt, np.full(ep - k, N, np.int32)]),
    edge_mask=np.concatenate([np.ones(k, bool), np.zeros(ep - k, bool)]),
    edge_weight=np.concatenate([hg.edge_weight[: hg.n_edge][m],
                                np.zeros(ep - k, np.float32)]),
    n_node=N, n_edge=k)
print(f"{name} tail: {k} edges", flush=True)

x = jax.device_put(jax.random.normal(jax.random.key(0), (N, F),
                                     jnp.bfloat16))
fn = lambda p, t, v: spmm_mod.spmm(t, v)

def meas(tg, warm=False):
    t = time_layer_device(fn, None, tg, x, k_small=5, k_big=400, reps=3)
    return t

# warmup (first slope in a process reads high)
tg0 = tile_graph(tail, block_rows=1024, block_cols=1024, tile_edges=512)
meas(tg0)

# (a) single-class per-ET cost
for et in (64, 128, 256, 512, 1024):
    tg = tile_graph(tail, block_rows=1024, block_cols=1024, tile_edges=et)
    t = meas(tg)
    slots = tg.n_tiles * et
    print(f"  single ET={et:5d}: tiles={tg.n_tiles:6d} {t*1e3:7.3f} ms  "
          f"-> per-tile {t/tg.n_tiles*1e9:7.1f} ns  per-slot "
          f"{t/slots*1e9:5.2f} ns", flush=True)

# (b) multi-class assignments
for fixed in (80, 160, 240, 320):
    for classes in ((64, 128, 256, 512, 1024), (128, 512), (128, 256, 512)):
        mtg = tile_graph_classes(tail, block_rows=1024, block_cols=1024,
                                 tile_classes=classes, fixed_slots=fixed)
        t = meas(mtg)
        counts = {p.tile_edges: p.n_tiles for p in mtg.parts}
        print(f"  multi fixed={fixed:3d} {classes}: {t*1e3:7.3f} ms "
              f"tiles={counts}", flush=True)
