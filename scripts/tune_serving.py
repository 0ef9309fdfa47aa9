import sys; sys.path.insert(0, "/root/repo")
"""Serving-shape autotune: tune ON the B=64 block-diagonal batched graph.

serving_bench showed the B=1-tuned schedule holds ~0.09 Gedge/s at B=64
(per-edge bound).  The batched graph is a different operating point
(173k nodes, 848k edges, unchanged per-block density): this tunes the GAT
layer directly at that shape and saves the winner for the serving path.

Usage: python scripts/tune_serving.py [B]
"""
import json

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import (
    init_params)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.tune import autotune

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ds = gta.load_dataset("cora")
hg = ds.host_graph
s, r = hg.senders[: hg.n_edge], hg.receivers[: hg.n_edge]
N = hg.n_node
off = (np.arange(B, dtype=np.int64)[:, None] * N)
bs = (s[None, :] + off).reshape(-1).astype(np.int64)
br = (r[None, :] + off).reshape(-1).astype(np.int64)
bhg = gta.build_host_graph(bs, br, B * N, symmetric_norm=True)
print(f"serving tune: B={B} N={bhg.n_node} E={bhg.n_edge}", flush=True)

og = gta.build_op_graph("GAT", 128, 128, heads=4, layer_tag=f"serve{B}")
params = jax.device_put(init_params(og, jax.random.key(0)))
x = jax.device_put(jax.random.normal(jax.random.key(1),
                                     (bhg.n_node, 128), jnp.float32))
g = bhg.to_device()

# seed with the B=1 winner: partitioned schedules carry ~4x the mega-fused
# block's modelled traffic and get pruned before measurement, but kernel
# dispatch beats the traffic model at this shape (serving_bench transfer
# result) — the seed makes the comparison happen inside ONE tune
seeds = []
try:
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
        schedule as S)
    spec = json.load(open("results/best_gat_cora128.json"))
    seeds.append(S.Schedule(
        blocks=tuple(tuple(b) for b in spec["blocks"]),
        tiles=tuple(S.TileConfig(*t) for t in spec["tiles"])))
except FileNotFoundError:
    pass
res = autotune(og, bhg, params, g, x, compute_dtype=jnp.bfloat16,
               iters=512, verbose=True, seed_schedules=seeds,
               memo_path=f"results/memo_gat_serve{B}.csv")
print(res.report(), flush=True)
best = res.best
json.dump({"blocks": [list(b) for b in best.blocks],
           "tiles": [list(t.key()) for t in best.tiles],
           "latency_us": res.latency_s * 1e6},
          open(f"results/best_gat_serve{B}.json", "w"))
print("saved best", flush=True)
