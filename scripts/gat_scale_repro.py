import sys; sys.path.insert(0, "/root/repo")
"""MINIMAL REPRO of the full-batch GAT train-step device fault (r3).

Facts established by bisection (all at E=90M, reference Reddit dims):
  * forward alone, backward alone, ONE layer fwd+bwd (plain AND w_asrc),
    and TWO chained FORWARDS each run fine;
  * TWO chained attention layers + value_and_grad fault with
    UNAVAILABLE: TPU device error AFTER compiling (16.9 GB fits);
  * the same 2-layer step works at E=60M.

Prime suspect: a per-executable runtime resource limit (semaphores / DMA
queues) — at 90M the program holds ~40 pallas_call instances (per layer:
~4 fwd multi-call chunks + 4 per-head sddmm calls x their splits + 4
per-head spmm_T calls) vs ~30 at 60M.  jax.checkpoint on a layer trips
UnexpectedTracerError (the gat custom_vjp closes over the tiling
tracers; arg-thread them like dist._spmm_local_kernel to enable remat).
Fusing the 4 per-head sddmm calls back into one heads=H call (-12
calls) was TRIED and does NOT fix the fault — the call-count theory is
weakened; chunking the [E] alpha pipeline (caps live edge state) or
enabling remat via arg-threaded custom_vjp tilings are the remaining
levers.

Usage: python scripts/gat_scale_repro.py [E]   (90M reproduces, 60M passes)
"""
import numpy as np
import jax
import jax.numpy as jnp

from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    HostGraph, tile_graph, transpose_host_graph)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import gat as gat_mod

N = 232965
E = int(sys.argv[1]) if len(sys.argv) > 1 else 90_000_000
z = np.load(f"/tmp/reddit_cache_{E}_c.npz")
hg = HostGraph(senders=z["s"], receivers=z["r"], edge_mask=z["m"],
               edge_weight=z["w"], n_node=N, n_edge=int(z["ne"]))
g = hg.to_device()
tg = tile_graph(hg, block_rows=512, block_cols=1024, tile_edges=512,
                unit_weight=True)
hgt, perm = transpose_host_graph(hg)
tgt = tile_graph(hgt, block_rows=512, block_cols=1024, tile_edges=512,
                 unit_weight=True)
permd = jnp.asarray(perm)
print("tiled", flush=True)
H, HD = 4, 128
x = jax.device_put(jax.random.normal(jax.random.key(0), (N, 602),
                                     jnp.bfloat16))
W1 = jax.device_put(jax.random.normal(jax.random.key(1), (602, HD),
                                      jnp.bfloat16) * 0.05)
W2 = jax.device_put(jax.random.normal(jax.random.key(2), (HD, HD),
                                      jnp.bfloat16) * 0.1)
wa1 = jax.device_put(jax.random.normal(jax.random.key(3), (HD, H),
                                       jnp.float32) * 0.3)
wa2 = jax.device_put(jax.random.normal(jax.random.key(4), (HD, H),
                                       jnp.float32) * 0.3)
wd1 = jax.device_put(jax.random.normal(jax.random.key(5), (HD, H),
                                       jnp.float32) * 0.3)
wd2 = jax.device_put(jax.random.normal(jax.random.key(6), (HD, H),
                                       jnp.float32) * 0.3)
y = jax.device_put(jnp.asarray(
    np.random.default_rng(0).integers(0, 41, N), jnp.int32))
Wo = jax.device_put(jax.random.normal(jax.random.key(7), (HD, 41),
                                      jnp.bfloat16) * 0.1)


def loss(gd, tgv, tgtv, pm, xx, p):
    W1, W2, wa1, wa2, wd1, wd2, Wo = p
    h1 = jnp.dot(xx, W1)
    a_d1 = jnp.dot(h1.astype(jnp.float32), wd1.astype(jnp.float32))
    o1 = gat_mod.gat_attention(tgv, h1, a_dst=a_d1, heads=H, w_asrc=wa1,
                               g=gd, tg_t=tgtv, ev_perm_t=pm)
    h2 = jnp.maximum(o1, 0).astype(jnp.bfloat16) @ W2
    a_d2 = jnp.dot(h2.astype(jnp.float32), wd2.astype(jnp.float32))
    o2 = gat_mod.gat_attention(tgv, h2, a_dst=a_d2, heads=H, w_asrc=wa2,
                               g=gd, tg_t=tgtv, ev_perm_t=pm)
    logits = o2.astype(jnp.bfloat16) @ Wo
    ll = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.mean(jnp.take_along_axis(ll, y[:, None], 1))


p = (W1, W2, wa1, wa2, wd1, wd2, Wo)
f = jax.jit(jax.value_and_grad(loss, argnums=5))
l, gr = jax.block_until_ready(f(g, tg, tgt, permd, x, p))
print("2-layer train step ok, loss", float(l), flush=True)
