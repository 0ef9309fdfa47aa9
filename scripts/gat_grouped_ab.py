import sys; sys.path.insert(0, "/root/repo")
"""A/B: per-tile GAT tail kernel (r2 champion: 512x1024/ET256
transposed_derive) vs the round-3 grouped GAT kernel at Reddit-tail
density.  Both run the normalize=False partial path (the production
hybrid composition).

Usage: python scripts/gat_grouped_ab.py [E]
"""
import gc
import time

import numpy as np
import jax
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    tile_graph, tile_graph_grouped)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import (
    _gat_forward)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

N = 232965
E = int(sys.argv[1]) if len(sys.argv) > 1 else 20_500_000
H, HD = 4, 128

t0 = time.time()
rng = np.random.default_rng(7)
s = rng.integers(0, N, E).astype(np.int32)
r = rng.integers(0, N, E).astype(np.int32)
hg = gta.build_host_graph(s, r, N, add_self_loops=False,
                          symmetric_norm=False)
del s, r
print(f"build {time.time()-t0:.0f}s E={hg.n_edge}", flush=True)

x = jax.device_put(jax.random.normal(jax.random.key(0), (N, HD),
                                     jnp.bfloat16))
w_a = jax.device_put(jax.random.normal(jax.random.key(5), (HD, H),
                                       jnp.bfloat16) * 0.1)
a_d = jax.device_put(jax.random.normal(jax.random.key(6), (N, H),
                                       jnp.float32))

DF = "per-tile"


def fn(p, gg, xx):
    a_s = jnp.dot(xx, w_a, preferred_element_type=jnp.float32)
    msrc = jnp.max(a_s, axis=0, keepdims=True)
    kw = dict(w_asrc=w_a, normalize=False, msrc=msrc)
    if DF == "per-tile":
        kw["dataflow"] = "transposed_derive"
    return _gat_forward(gg, xx, None, a_d.astype(jnp.bfloat16), **kw)


CONFIGS = [
    ("per-tile 512x1024/ET256 t_derive", "per-tile",
     lambda: tile_graph(hg, block_rows=512, block_cols=1024,
                        tile_edges=256, unit_weight=True)),
    ("grouped-T 512^2/ET128/G8 (r4)", "grouped",
     lambda: tile_graph_grouped(hg, block_rows=512, block_cols=512,
                                tile_edges=128, group=8,
                                unit_weight=True)),
    ("grouped-T 512^2/ET128/G16 (r4)", "grouped",
     lambda: tile_graph_grouped(hg, block_rows=512, block_cols=512,
                                tile_edges=128, group=16,
                                unit_weight=True)),
    ("grouped-T 512x1024/ET128/G8", "grouped",
     lambda: tile_graph_grouped(hg, block_rows=512, block_cols=1024,
                                tile_edges=128, group=8,
                                unit_weight=True)),
]

results = []
warmed = False
for label, df, build in CONFIGS:
    DF = df
    t0 = time.time()
    gg = build()
    nt = gg.n_tiles
    slots = (gg.total_slots if hasattr(gg, "total_slots")
             else nt * gg.tile_edges)
    print(f"[{label}] tiled {time.time()-t0:.0f}s tiles={nt} "
          f"util={hg.n_edge/slots:.2f}", flush=True)
    if not warmed:
        time_layer_device(fn, None, gg, x, k_small=1, k_big=3, reps=1)
        warmed = True
    t = time_layer_device(fn, None, gg, x, k_small=1, k_big=5, reps=2)
    print(f"[{label}] {t*1e3:.2f} ms  {hg.n_edge/t/1e9:.3f} Gedge/s",
          flush=True)
    results.append((label, t * 1e3, hg.n_edge / t / 1e9))
    del gg
    gc.collect()

print("\n== summary ==")
for label, ms, thr in results:
    print(f"{label:36s} {ms:8.2f} ms  {thr:.3f} Gedge/s")
