import sys; sys.path.insert(0, "/root/repo")
"""Measure Reddit SpMM tail geometries on chip (panel-DMA cost model A/B).

The refit cost model (scripts/class_sweep.py calibration)
    time = runs * C*F*2/819 ns  +  tiles * (50 ns + ET * 2.77*(R+C)/2048 ns)
says the per-run x-panel DMA, not the grid step, is the dominant fixed
cost, moving the optimum from 1024x1024/ET512 to 1024x256/ET128.  One
process, discarded warmup, in-process baseline.

Usage: python scripts/tail_geometry.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    HostGraph, tile_graph, tile_graph_classes)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import dense as D
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import spmm as spmm_mod
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

N = 232965
F = 128
z = np.load("/tmp/reddit_cache_114615892_l.npz")
ne = int(z["ne"])
s, r, w = z["s"][:ne], z["r"][:ne], z["w"][:ne]
cbn = int(np.ceil(N / 256))
key = (r // 256).astype(np.int64) * cbn + (s // 256)
bn = np.bincount(key, minlength=int(np.ceil(N / 256)) * cbn)
thr = D.spmm_dense_threshold(256, 256, fudge=0.5)
m = bn[key] < thr
st, rt, wt = s[m], r[m], w[m]
k = len(st)
ep = ((k + 127) // 128) * 128
tail = HostGraph(
    senders=np.concatenate([st, np.full(ep - k, N, np.int32)]),
    receivers=np.concatenate([rt, np.full(ep - k, N, np.int32)]),
    edge_mask=np.concatenate([np.ones(k, bool), np.zeros(ep - k, bool)]),
    edge_weight=np.concatenate([wt, np.zeros(ep - k, np.float32)]),
    n_node=N, n_edge=k)
print(f"reddit tail: {k} edges (thr={thr})", flush=True)

x = jax.device_put(jax.random.normal(jax.random.key(0), (N, F),
                                     jnp.bfloat16))
fn = lambda p, t, v: spmm_mod.spmm(t, v)

def meas(tg):
    return time_layer_device(fn, None, tg, x, k_small=1, k_big=8, reps=3)

configs = [
    ("base 1024x1024/512", dict(R=1024, C=1024, ets=(512,))),
    ("1024x256/128",       dict(R=1024, C=256,  ets=(128,))),
    ("1024x256/multi",     dict(R=1024, C=256,  ets=(128, 256, 512))),
    ("1024x512/multi",     dict(R=1024, C=512,  ets=(128, 256, 512))),
    ("512x512/128",        dict(R=512,  C=512,  ets=(128,))),
]
warm = False
for name, cfg in configs:
    t0 = time.time()
    if len(cfg["ets"]) == 1:
        tg = tile_graph(tail, block_rows=cfg["R"], block_cols=cfg["C"],
                        tile_edges=cfg["ets"][0])
        ntiles = tg.n_tiles
    else:
        tg = tile_graph_classes(tail, block_rows=cfg["R"],
                                block_cols=cfg["C"],
                                tile_classes=cfg["ets"], fixed_slots=117)
        ntiles = {p.tile_edges: p.n_tiles for p in tg.parts}
    build = time.time() - t0
    if not warm:
        meas(tg)          # discard first slope (reads high)
        warm = True
    t = meas(tg)
    print(f"  {name}: {t*1e3:7.2f} ms  ({k/t/1e9:.3f} Gedge/s) "
          f"tiles={ntiles} build={build:.0f}s", flush=True)
