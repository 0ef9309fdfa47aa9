import sys; sys.path.insert(0, "/root/repo")
"""GAT tail geometry sweep round 3: smaller tile capacities (the SpMM
panel-DMA/grid-const refit moved SpMM's optimum to ET128 — does GAT's
3-pass kernel follow?).  One process, discarded warmup.

Usage: python scripts/gat_tail_sweep2.py [dataset]
"""
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    HostGraph, block_nnz, reorder_nodes, tile_graph)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import dense as D
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import _gat_forward
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

name = sys.argv[1] if len(sys.argv) > 1 else "flickr"
F, H, HD = 128, 4, 128
ds = gta.load_dataset(name)
hg, _ = reorder_nodes(ds.host_graph, "degree")
N = hg.n_node
bn = block_nnz(hg, 256, 256).reshape(-1)
cbn = int(np.ceil(N / 256))
thr = D.gat_dense_threshold_t(256, 256, H, HD // H)
m = bn[((hg.receivers[: hg.n_edge] // 256).astype(np.int64) * cbn
        + hg.senders[: hg.n_edge] // 256)] < thr
st, rt = hg.senders[: hg.n_edge][m], hg.receivers[: hg.n_edge][m]
k = len(st)
ep = ((k + 127) // 128) * 128
tail = HostGraph(
    senders=np.concatenate([st, np.full(ep - k, N, np.int32)]),
    receivers=np.concatenate([rt, np.full(ep - k, N, np.int32)]),
    edge_mask=np.concatenate([np.ones(k, bool), np.zeros(ep - k, bool)]),
    edge_weight=np.concatenate([np.ones(k, np.float32),
                                np.zeros(ep - k, np.float32)]),
    n_node=N, n_edge=k)
print(f"{name} GAT tail: {k} edges (thr={thr})", flush=True)

x = jax.device_put(jax.random.normal(jax.random.key(0), (N, F),
                                     jnp.bfloat16))
w_a = jax.device_put(jax.random.normal(jax.random.key(5), (HD, H),
                                       jnp.bfloat16) * 0.1)
a_d = jax.device_put(jax.random.normal(jax.random.key(6), (N, H),
                                       jnp.float32))

def gat_fn(p, tg, xx):
    a_s = jnp.dot(xx, w_a, preferred_element_type=jnp.float32)
    msrc = jnp.max(a_s, axis=0, keepdims=True)
    return _gat_forward(tg, xx, None, a_d.astype(jnp.bfloat16),
                        w_asrc=w_a, normalize=False, msrc=msrc,
                        dataflow="transposed_derive")

warm = False
for R, C, ET in ((512, 1024, 256), (512, 1024, 128), (1024, 1024, 128),
                 (1024, 1024, 256), (2048, 1024, 128), (512, 512, 128),
                 (1024, 512, 128)):
    tg = tile_graph(tail, block_rows=R, block_cols=C, tile_edges=ET,
                    unit_weight=True)
    if not warm:
        time_layer_device(gat_fn, None, tg, x, k_small=2, k_big=60, reps=2)
        warm = True
    try:
        t = time_layer_device(gat_fn, None, tg, x, k_small=2, k_big=60,
                              reps=3)
        print(f"  {R}x{C}/ET{ET} tiles={tg.n_tiles}: {t*1e3:7.2f} ms "
              f"({k/t/1e9:.3f} Gedge/s)", flush=True)
    except Exception as e:
        print(f"  {R}x{C}/ET{ET}: FAIL {type(e).__name__} "
              f"{str(e).splitlines()[0][:90]}", flush=True)
