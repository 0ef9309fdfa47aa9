import sys; sys.path.insert(0, "/root/repo")
"""Serving-shape A/B (round 4): the B=64 block-diagonal Cora GAT layer
through the HYBRID path (dense 'cr' int8 blocks + transposed grouped chain
tail) vs the r2 tuned per-tile schedule record (7.55 ms, 0.128 Gedge/s —
results/SUMMARY.md "Batched-graph serving").

Block-diagonal composition preserves per-block density, and at Cora
density most 256^2 blocks sit near the measured dense/tail breakeven —
exactly the regime the r4 kernels redesigned.  The layer is hand-composed
(XLA MMs + hybrid attention partials + normalize) the same way
reddit_bench --gat composes it.

Usage: python scripts/serving_grouped_ab.py [B]
"""
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp
import ml_dtypes

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    hybrid_graph)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import dense as D
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import (
    _gat_forward)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
H, HD, FIN = 4, 128, 128

ds = gta.load_dataset("cora")
hg0 = ds.host_graph
s = hg0.senders[: hg0.n_edge]
r = hg0.receivers[: hg0.n_edge]
N = hg0.n_node
off = (np.arange(B, dtype=np.int64)[:, None] * N)
bs = (s[None, :] + off).reshape(-1).astype(np.int64)
br = (r[None, :] + off).reshape(-1).astype(np.int64)
bhg = gta.build_host_graph(bs, br, B * N, symmetric_norm=True)
print(f"B={B}: N={bhg.n_node} E={bhg.n_edge}", flush=True)

for thr, tg_fmt, grp in ((128, "grouped", 16), (128, "tiles", 8)):
    hyb = hybrid_graph(bhg, block_rows=256, block_cols=256, tile_edges=128,
                       min_nnz=thr, unit_weight=True, block_layout="cr",
                       values_dtype=np.int8,
                       sparse_block_rows=512, sparse_block_cols=512,
                       tail_format=tg_fmt, tail_group=grp)
    nb = hyb.dense.n_blocks if hyb.dense else 0
    print(f"[{tg_fmt}] split: dense {hyb.n_dense_edges} in {nb} blocks, "
          f"tail {hyb.n_sparse_edges} in {hyb.tiles.n_tiles} tiles",
          flush=True)

    w_in = jax.device_put(jax.random.normal(
        jax.random.key(2), (FIN, HD), jnp.bfloat16) * 0.1)
    w_a = jax.device_put(jax.random.normal(
        jax.random.key(5), (HD, H), jnp.bfloat16) * 0.1)
    a_dw = jax.device_put(jax.random.normal(
        jax.random.key(6), (HD, H), jnp.bfloat16) * 0.1)
    x = jax.device_put(jax.random.normal(
        jax.random.key(1), (bhg.n_node, FIN), jnp.bfloat16))

    def gat_layer(p, gg, xx):
        bg, tg = gg
        h = jnp.dot(xx, w_in, preferred_element_type=jnp.float32)
        h = h.astype(jnp.bfloat16)
        a_s = jnp.dot(h, w_a, preferred_element_type=jnp.float32)
        a_d = jnp.dot(h, a_dw, preferred_element_type=jnp.float32)
        msrc = jnp.max(a_s, axis=0, keepdims=True)
        acc = _gat_forward(tg, h, None, a_d.astype(jnp.bfloat16),
                           w_asrc=w_a, normalize=False, msrc=msrc,
                           dataflow=None if tg_fmt == "grouped"
                           else "transposed_derive")
        if bg is not None:
            accd = D.gat_dense_partial(bg, h, a_s, a_d, msrc)
            acc = acc + accd[: acc.shape[0]]
        num, den = acc[:, :HD], acc[:, HD:]
        out = num / jnp.repeat(jnp.maximum(den, 1e-20), HD // H, axis=1)
        return jax.nn.elu(out)

    gg = (hyb.dense, hyb.tiles)
    time_layer_device(gat_layer, None, gg, x, k_small=10, k_big=110, reps=1)
    t = time_layer_device(gat_layer, None, gg, x, k_small=20, k_big=520,
                          reps=3)
    print(f"[{tg_fmt}] GAT layer B={B}: {t*1e6:.1f} us  "
          f"{bhg.n_edge/t/1e9:.3f} Gedge/s", flush=True)
