import sys; sys.path.insert(0, "/root/repo")
"""A/B: per-tile one-hot SpMM (r2 baseline 1024^2/ET512) vs the round-3
stripe-group chunked kernel at Reddit-tail density.

The tail is uniform background noise (results/SUMMARY.md "Tail analysis"),
so a uniform random graph at the tail's (N, E) reproduces its regime
without the 80 s full hybrid build.  Timing: device-slope k=1/5, reps>=2,
discarded in-process warmup (first measurement reads ~10-15% high).

Usage: python scripts/grouped_ab.py [E] [--quick]
"""
import gc
import time

import numpy as np
import jax
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    tile_graph, tile_graph_grouped)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import spmm as spmm_mod
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

N = 232965
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
E = int(_pos[0]) if _pos else 20_500_000
F = 128
QUICK = "--quick" in sys.argv

t0 = time.time()
rng = np.random.default_rng(7)
s = rng.integers(0, N, E).astype(np.int32)
r = rng.integers(0, N, E).astype(np.int32)
hg = gta.build_host_graph(s, r, N, add_self_loops=False, symmetric_norm=False)
del s, r
print(f"build {time.time()-t0:.0f}s E={hg.n_edge}", flush=True)

x = jax.device_put(jax.random.normal(jax.random.key(0), (N, F), jnp.bfloat16))


def fn(p, gg, xx):
    return spmm_mod.spmm(gg, xx)[:N]


# (label, builder) — the graph is unit-weight, so the grouped kernel runs
# its no-weight-stream variant (weight_all_unit)
CONFIGS = [
    ("baseline 1024^2/ET512",
     lambda: tile_graph(hg, block_rows=1024, block_cols=1024,
                        tile_edges=512)),
    ("grouped-unit 512^2/ET128/G16",
     lambda: tile_graph_grouped(hg, block_rows=512, block_cols=512,
                                tile_edges=128, group=16)),
]
if QUICK:
    CONFIGS = CONFIGS[-1:]

results = []
warmed = False
_built = {}
for label, build in CONFIGS:
    t0 = time.time()
    if id(build) in _built:
        gg = _built[id(build)]
    else:
        gg = build()
        _built[id(build)] = gg
    nt = gg.n_tiles
    slots = (gg.total_slots if hasattr(gg, "total_slots")
             else nt * gg.tile_edges)
    print(f"[{label}] tiled {time.time()-t0:.0f}s tiles={nt} "
          f"util={hg.n_edge/slots:.2f}", flush=True)
    if not warmed:
        # discarded warmup measurement on the first config
        time_layer_device(fn, None, gg, x, k_small=1, k_big=3, reps=1)
        warmed = True
    t = time_layer_device(fn, None, gg, x, k_small=1, k_big=5, reps=2)
    thr = hg.n_edge / t / 1e9
    print(f"[{label}] {t*1e3:.2f} ms  {thr:.3f} Gedge/s", flush=True)
    results.append((label, t * 1e3, thr))
_built.clear()
gc.collect()

print("\n== summary ==")
for label, ms, thr in results:
    print(f"{label:32s} {ms:8.2f} ms  {thr:.3f} Gedge/s")
