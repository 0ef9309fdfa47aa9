import sys; sys.path.insert(0, "/root/repo")
"""2-layer full-batch GAT train step at scale — r3's fault repro, now a
REGRESSION CHECK (round 4).

r3 bisected a fault at E >= ~90M to "two fwd+bwd pairs in one program"
and suspected a per-executable semaphore/DMA budget.  Round 4 ruled that
out (scripts/long_program_probe.py): the device enforces a ~60 s
PER-PROGRAM WALL-CLOCK limit, and the r3 backward (per-head [E]-pipeline,
50.8 s/step at 60M) simply crossed it at 90M.  With the fused
tile-domain backward (ops/gat.py _gat_bwd_fused) the same 2-layer step
runs at 90M and at the full 114.5M.

Usage: python scripts/gat_scale_repro.py [E]   (expected: prints loss, OK)
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
