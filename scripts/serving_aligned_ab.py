import sys; sys.path.insert(0, "/root/repo")
"""Serving-shape A/B round 5: COPY-ALIGNED block-diagonal batching.

The r4 serving number (6.04 ms at B=64 Cora GAT, hybrid A/B) batched
copies at stride N=2708 — every 256/512 adjacency block straddles two
copies, so tiles carry mixed-copy runs and fill collapses (grouped fill
0.18).  graph.batch_host_graph pads each copy to a 1024-multiple stride:
the tiler then produces IDENTICAL per-copy tiles at the B=1 fill, and
stripe groups never span copies.  This script A/Bs:

  unaligned-hybrid   — the r4 recipe (reproduces ~6.04 ms)
  aligned-hybrid     — same recipe on the aligned batch
  aligned-grouped    — aligned + per-copy stripe groups (G = copy rb's)
  aligned geometry sweep over the tail

Usage: python scripts/serving_aligned_ab.py [B]
"""
import json
import os

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    batch_host_graph, hybrid_graph)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import dense as D
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import (
    _gat_forward)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
H, HD, FIN = 4, 128, 128

ds = gta.load_dataset("cora")
hg0 = ds.host_graph
N = hg0.n_node
s = hg0.senders[: hg0.n_edge]
r = hg0.receivers[: hg0.n_edge]

# unaligned (r4) batch
off = (np.arange(B, dtype=np.int64)[:, None] * N)
bs = (s[None, :] + off).reshape(-1).astype(np.int64)
br = (r[None, :] + off).reshape(-1).astype(np.int64)
bhg_u = gta.build_host_graph(bs, br, B * N, symmetric_norm=True)
# aligned batch (stride 3072)
bhg_a = batch_host_graph(hg0, B)
print(f"B={B}: unaligned N={bhg_u.n_node} E={bhg_u.n_edge} | "
      f"aligned N={bhg_a.n_node} E={bhg_a.n_edge}", flush=True)

results = {}


def run(tag, bhg, *, tail_fmt, grp, sr, sc, et, thr=128):
    hyb = hybrid_graph(bhg, block_rows=256, block_cols=256, tile_edges=128,
                       min_nnz=thr, unit_weight=True, block_layout="cr",
                       values_dtype=np.int8,
                       sparse_block_rows=sr, sparse_block_cols=sc,
                       tail_format=tail_fmt, tail_group=grp)
    nb = hyb.dense.n_blocks if hyb.dense else 0
    nt = getattr(hyb.tiles, "n_tiles", None)
    fill = (hyb.n_sparse_edges / (nt * et)) if nt else float("nan")
    print(f"[{tag}] dense {hyb.n_dense_edges} in {nb} blk, tail "
          f"{hyb.n_sparse_edges}, fill {fill:.2f}", flush=True)

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
                           dataflow=None if tail_fmt == "grouped"
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
    rate = bhg.n_edge / t / 1e9
    print(f"[{tag}] GAT layer B={B}: {t*1e3:.2f} ms  {rate:.3f} Gedge/s",
          flush=True)
    results[tag] = dict(ms=t * 1e3, gedges=rate)
    return t


run("unaligned-hybrid", bhg_u, tail_fmt="tiles", grp=8, sr=512, sc=512,
    et=128)
run("aligned-hybrid", bhg_a, tail_fmt="tiles", grp=8, sr=512, sc=512,
    et=128)
run("aligned-hybrid-1024", bhg_a, tail_fmt="tiles", grp=8, sr=512, sc=1024,
    et=512)
# per-copy stripe groups: 3072/512 = 6 rb blocks per copy
run("aligned-grouped-G6", bhg_a, tail_fmt="grouped", grp=6, sr=512, sc=512,
    et=128)
run("aligned-grouped-G3", bhg_a, tail_fmt="grouped", grp=3, sr=1024,
    sc=1024, et=128)

os.makedirs("results", exist_ok=True)
json.dump(results, open("results/serving_aligned_ab.json", "w"), indent=1)
print(json.dumps(results, indent=1))
