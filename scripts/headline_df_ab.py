import sys; sys.path.insert(0, "/root/repo")
"""A/B the GAT edge-tile dataflows at the HEADLINE config (bench.py):
Cora layer3, hidden 64 -> 16, attention width 16 (HD=16, H=16).

The tuned 30 us schedule uses the transposed kernel with the packed
[h ‖ a_src] gather (32 sublanes).  transposed_derive gathers h alone
(16 sublanes) and derives a_src in-kernel — potentially ~2x on pass 1.
Uses the tuned tile geometry (512^3 hybrid attention block is the tuned
schedule; here we isolate the ATTENTION chain at the same tiles).
"""
import numpy as np
import jax
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import tile_graph
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import _gat_forward
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

HD, H = 16, 16
ds = gta.load_dataset("cora")
hg = ds.host_graph
N = hg.n_node
print(f"cora N={N} E={hg.n_edge}", flush=True)

x = jax.device_put(jax.random.normal(jax.random.key(0), (N, HD), jnp.bfloat16))
w_a = jax.device_put(jax.random.normal(jax.random.key(5), (HD, H),
                                       jnp.bfloat16) * 0.1)
a_d = jax.device_put(jax.random.normal(jax.random.key(6), (N, H), jnp.float32))

for TR, TC, ET in ((512, 512, 512), (1024, 512, 512)):
    tg = tile_graph(hg, block_rows=TR, block_cols=TC, tile_edges=ET)
    for df in ("transposed", "transposed_derive", "wide"):
        def fn(p, g, xx, _df=df, _tg=tg):
            return _gat_forward(_tg, xx, None, a_d.astype(jnp.bfloat16),
                                w_asrc=w_a, dataflow=_df)
        t = time_layer_device(fn, None, None, x, k_small=100, k_big=2100,
                              reps=3)
        print(f"{TR}x{TC}/ET{ET} tiles={tg.n_tiles} {df:18s}: "
              f"{t*1e6:7.2f} us", flush=True)
