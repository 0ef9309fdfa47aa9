import sys; sys.path.insert(0, "/root/repo")
"""FULL-BATCH Reddit training on one chip — the tiled backward makes the
gradients scale like the forward (VERDICT r2 next-3: the r2 VJPs
materialised [E, F] ~ 58 GB at Reddit/F=128 and could not run).

GCN: grouped-path SpMM schedules + transposed grouped tilings (dx = Aᵀȳ).
GAT: fused-chain forward + the scalable [E, H] backward (sddmm-kernel t,
per-head transposed SpMM dh).

Usage: python scripts/reddit_train.py [GCN|GAT] [n_edges]
"""
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
    schedule as S)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.fusion import (
    classify_block)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import HostGraph
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.zoo import (
    build_model)

NET = sys.argv[1] if len(sys.argv) > 1 else "GCN"
N = 232965
E = int(sys.argv[2]) if len(sys.argv) > 2 else 114_615_892
F_IN, HIDDEN, N_CLASS = 602, 128, 41          # reference Reddit dims

cache = f"/tmp/reddit_cache_{E}_c.npz"
t0 = time.time()
if os.path.exists(cache):
    z = np.load(cache)
    hg = HostGraph(senders=z["s"], receivers=z["r"], edge_mask=z["m"],
                   edge_weight=z["w"], n_node=N, n_edge=int(z["ne"]))
    print(f"cache load {time.time()-t0:.0f}s E={hg.n_edge}", flush=True)
else:
    import gta_graph_tensor_acclelrator_for_general_gnn_tpu as _gta
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.data.datasets \
        import synthetic_coo
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import \
        reorder_nodes
    s_, r_, labels = synthetic_coo(N, E, seed=1, communities=1000, p_in=0.7)
    hg = _gta.build_host_graph(s_, r_, N, add_self_loops=True,
                               symmetric_norm=True)
    hg, _ = reorder_nodes(hg, "hubs+labels", labels=labels)
    np.savez(cache, s=hg.senders, r=hg.receivers, m=hg.edge_mask,
             w=hg.edge_weight, ne=hg.n_edge)
    print(f"build+reorder {time.time()-t0:.0f}s E={hg.n_edge}", flush=True)

heads = 4 if NET == "GAT" else None
# GCN uses the TRANS (transform-first) variant — the reference's own
# isReorder: aggregating at F=128 instead of the 602-wide input.  The
# r5 trace showed the 602-wide layer-1 aggregation alone was 591 ms of
# the 844 ms step.  (GAT projects first by construction.)
model = build_model(NET, F_IN, N_CLASS, hidden=HIDDEN, n_layers=2,
                    reorder=(NET == "GCN"),
                    **({"heads": heads} if heads else {}))

PATH = sys.argv[3] if len(sys.argv) > 3 else "hybrid"

t0 = time.time()
scheds = []
for graph in model.layers:
    if NET == "GCN":
        part = S.aggregation_partition(graph)
        if PATH == "hybrid":
            # r5: density-split execution with the kernel backward
            # (int8 256^2 count blocks + separable sym-norm scales; tail
            # at the proven per-tile geometry; dx = A^T ybar through the
            # transposed hybrid) — the r4 per-tile path stays reachable
            # via argv[3]='onehot' for A/B
            tcg = S.TileConfig(1024, 1024, 512, S.PATH_HYBRID,
                               dense_block=256)
            want = "spmm_hybrid"
        else:
            tcg = S.TileConfig(1024, 1024, 512, S.PATH_ONEHOT)
            want = "spmm"
        tiles = tuple(
            tcg if classify_block(graph, b, tcg)[0] == want
            else S.TileConfig(path=S.PATH_XLA) for b in part)
    else:
        part = S.pattern_partition(graph)
        if PATH == "hybrid":
            # r5: hybrid attention (dense 'cr' int8 blocks + one-hot tail)
            # with the fused tile-domain tail backward + dense-block VJP
            # kernels — full-batch training at forward-path rates
            tcc = S.TileConfig(512, 1024, 512, S.PATH_HYBRID,
                               dense_block=256)
            want = ("gat_hybrid",)
        else:
            tcc = S.TileConfig(512, 1024, 512, S.PATH_ONEHOT)
            want = ("gat", "gat_layer")
        tiles = tuple(
            tcc if classify_block(graph, b, tcc)[0] in want
            else S.TileConfig(path=S.PATH_XLA) for b in part)
    assert any(t.kernel for t in tiles), part
    scheds.append(S.Schedule(blocks=part, tiles=tuple(tiles)))
print(f"schedules {time.time()-t0:.0f}s: "
      f"{[sc.key()[:60] for sc in scheds]}", flush=True)

t0 = time.time()
# lower per layer and thread the tile captures through jit as ARGUMENTS
# (a closure would lower the multi-GB tilings as HLO constants — the
# classic full-Reddit crash, ROADMAP fact 5); tile_cache shares the
# fwd+transposed tilings across both layers
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.fusion \
    import lower_schedule
cache = {}
fns = [lower_schedule(g, sc, hg, jnp.bfloat16, build_transpose=True,
                      tile_cache=cache)
       for g, sc in zip(model.layers, scheds)]
caps = tuple(fn.captures for fn in fns)   # already device-resident
print(f"lowering (tilings fwd+T, shared cache) {time.time()-t0:.0f}s",
      flush=True)

params = jax.device_put(model.init(jax.random.key(0)))
rngn = np.random.default_rng(0)
xh = rngn.standard_normal((N, F_IN)).astype(np.float32)
# learnable labels (a random linear probe of the features) so the loss
# visibly drops — random labels give ~zero gradient signal at this scale
wy = rngn.standard_normal((F_IN, N_CLASS)).astype(np.float32)
yh = np.argmax(xh @ wy, axis=1).astype(np.int32)
x = jax.device_put(jnp.asarray(xh, jnp.bfloat16))
y = jax.device_put(jnp.asarray(yh))
del xh
g_dev = hg.to_device()


def loss_fn(p, caps, gd, xx, yy):
    h = xx
    for fn, c in zip(fns, caps):
        h = fn.inner(p, gd, h, c)
    ll = jax.nn.log_softmax(h.astype(jnp.float32))
    return -jnp.mean(jnp.take_along_axis(ll, yy[:, None], 1))


step = jax.jit(jax.value_and_grad(loss_fn, argnums=0))

t0 = time.time()
l0, g0 = jax.block_until_ready(step(params, caps, g_dev, x, y))
print(f"first step (compile) {time.time()-t0:.0f}s", flush=True)

# timed steps (full batch: one step == one epoch)
losses = []
p = params
times = []
for i in range(4):
    t0 = time.time()
    l, gr = step(p, caps, g_dev, x, y)
    jax.block_until_ready((l, gr))   # the loss alone can complete before
    times.append(time.time() - t0)   # the grad tree: block on BOTH
    p = jax.tree.map(lambda a, b: a - 0.5 * b.astype(a.dtype), p, gr)
    losses.append(float(l))

import statistics
print(f"{NET} FULL-BATCH Reddit train: epoch(step) = "
      f"{statistics.median(times[1:]):.2f} s  "
      f"(times {['%.2f' % t for t in times]}; median of steady steps — "
      f"the first can read 0 through the tunnel queue)", flush=True)

if os.environ.get("GTA_TRACE"):
    # per-kernel timeline of one step (written AFTER the timed region:
    # profiling adds overhead) — top ops by device time
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.profile \
        import trace, trace_events
    tdir = os.environ["GTA_TRACE"]
    with trace(tdir):
        l, gr = step(p, caps, g_dev, x, y)
        jax.block_until_ready((l, gr))
    evs = trace_events(tdir)
    tot = sum(e.total_us for e in evs)
    print(f"trace: {len(evs)} distinct ops, {tot/1e6:.2f} s total",
          flush=True)
    for e in sorted(evs, key=lambda v: -v.total_us)[:18]:
        print(f"  {e.total_us/1e3:9.1f} ms  x{e.count:<5d} {e.name[:70]}",
              flush=True)
print(f"losses {losses}  monotone={all(b < a for a, b in zip(losses, losses[1:]))}",
      flush=True)
