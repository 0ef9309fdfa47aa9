import sys; sys.path.insert(0, "/root/repo")
"""Round-2 hardware sweep: v2 (3-pass) GAT chain kernel on the headline
config (GAT-Cora layer3: 64 -> 16, 16 heads — the reference's GA benchmark,
BASELINE.md 81.66us).

Times several tile geometries with the device-loop slope method, then (last,
because readback degrades the tunnel) checks allclose vs the XLA lowering.
"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import schedule as S
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.fusion import lower_schedule
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import init_params, lower
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import time_layer_device

ds = gta.load_dataset("cora")
n, f = ds.host_graph.n_node, 64
og = gta.build_op_graph("GAT", f, 16, heads=16, layer_tag="l3bench")
params = jax.device_put(init_params(og, jax.random.key(0)))
x = jax.device_put(jax.random.normal(jax.random.key(1), (n, f), jnp.float32))

spec = json.load(open("results/best_gat_cora_l3.json"))
blocks = tuple(tuple(b) for b in spec["blocks"])
chain_idx = max(range(len(blocks)), key=lambda i: len(blocks[i]))

CONFIGS = [
    (512, 1024, 512),   # round-1 best
    (512, 1024, 768),   # ET fits each block's ~737 edges in ONE tile
    (512, 1024, 896),
    (256, 1024, 384),
    (512, 512, 448),
    (256, 512, 192),
]

fns = {}
for cfg in CONFIGS:
    tiles = list(S.TileConfig(*t) for t in spec["tiles"])
    tiles[chain_idx] = S.TileConfig(*cfg)
    sched = S.Schedule(blocks=blocks, tiles=tuple(tiles))
    fns[cfg] = lower_schedule(og, sched, ds.host_graph,
                              compute_dtype=jnp.bfloat16)

results = {}
for cfg, fn in fns.items():
    try:
        lat = time_layer_device(fn, params, ds.graph, x,
                                k_small=50, k_big=550, reps=2)
        results[cfg] = lat * 1e6
        print(f"{cfg}: {lat*1e6:.1f} us", flush=True)
    except Exception as ex:
        print(f"{cfg}: FAILED {type(ex).__name__}: {ex}", flush=True)
        results[cfg] = float("inf")

best = min(results, key=results.get)
print(f"BEST {best}: {results[best]:.1f} us  "
      f"vs_baseline={81.66/results[best]:.3f}", flush=True)

# correctness last (readback flips the tunnel into slow mode)
ref_fn = jax.jit(lower(og))
y_ref = np.asarray(ref_fn(params, ds.graph, x))
y_new = np.asarray(jax.jit(fns[best])(params, ds.graph, x))
err = np.max(np.abs(y_new - y_ref)) / (np.max(np.abs(y_ref)) + 1e-9)
print(f"rel err vs XLA oracle (bf16 kernel): {err:.2e}")
assert err < 5e-2, err
print("OK")
