import sys; sys.path.insert(0, "/root/repo")
"""Medium-density regime A/B (VERDICT r4 next-4): pubmed/flickr GCN
aggregation through per-op XLA vs hybrid vs FULL-DENSE adjacency matmul,
and flickr GAT through the r4 grouped-T production recipe.

Measured with the device-slope timer; prints one line per config and
writes results/medium_ab.json.

Usage: python scripts/medium_ab.py [pubmed|flickr|both] [F]
"""
import json
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu import ir
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    dense_adjacency, reorder_nodes)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
    dense as D, primitives as P)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

which = sys.argv[1] if len(sys.argv) > 1 else "both"
F = int(sys.argv[2]) if len(sys.argv) > 2 else 128
out = {}


def bench(name, fn, cap, *args, kb=2100):
    # cap (graph/adjacency data) rides as a jit ARGUMENT — closing over
    # multi-hundred-MB device arrays embeds them as HLO constants and the
    # remote compiler rejects the program (ROADMAP fact 5)
    t = time_layer_device(lambda p, g, v: fn(g, v), None, cap, *args,
                          k_small=100, k_big=kb, reps=3)
    print(f"  {name}: {t*1e3:.3f} ms", flush=True)
    return t


for dsname in (("pubmed", "flickr") if which == "both" else (which,)):
    ds = gta.load_dataset(dsname)
    hg, _ = reorder_nodes(ds.host_graph, "degree")
    g = hg.to_device()
    n, e = hg.n_node, hg.n_edge
    print(f"{dsname}: n={n} e={e} F={F}", flush=True)
    res = {"n": n, "e": e, "F": F}
    x = jax.device_put(jax.random.normal(jax.random.key(1), (n, F),
                                         jnp.bfloat16))

    # per-op XLA aggregation (the current pubmed pick)
    def xla_fn(gg, v):
        ew = P.scatter_to_edges(v, gg, "C") * gg.edge_weight[:, None].astype(
            v.dtype)
        return P.gather_to_nodes(ew, gg, ir.ADD)
    res["xla_ms"] = bench("xla agg", xla_fn, g, x) * 1e3

    # full dense adjacency matmul
    if n <= 65536:
        A = jax.device_put(jnp.asarray(dense_adjacency(hg)))

        def dense_fn(Ad, v):
            vp = jnp.zeros((Ad.shape[1], v.shape[1]), v.dtype).at[:n].set(v)
            return jnp.dot(Ad.astype(v.dtype), vp,
                           preferred_element_type=jnp.float32)[:n]
        res["densefull_ms"] = bench("densefull agg", dense_fn, A, x) * 1e3

    # production hybrid (auto-tuned split)
    hyb = D.auto_hybrid(hg, kind="spmm", feat_width=F)
    res["hybrid_ms"] = bench(
        "hybrid agg",
        lambda gg, v: D.spmm_hybrid(gg[0], gg[1], v), (hyb, g), x) * 1e3

    # flickr-class GAT through the production grouped recipe
    H, HD = 4, F
    hyb_g = D.auto_hybrid(hg, kind="gat", feat_width=F, heads=H,
                          head_dim=HD // H)
    a_s = jax.device_put(jax.random.normal(jax.random.key(2), (n, H),
                                           jnp.float32))
    a_d = jax.device_put(jax.random.normal(jax.random.key(3), (n, H),
                                           jnp.float32))

    def gat_fn(gg, v):
        return D.gat_hybrid(gg[0], gg[1], v, a_s, a_d)
    t = bench("gat hybrid", gat_fn, (hyb_g, g), x)
    res["gat_ms"] = t * 1e3
    res["gat_gedges"] = e / t / 1e9
    print(f"  gat rate: {res['gat_gedges']:.3f} Gedge/s", flush=True)
    out[dsname] = res

os.makedirs("results", exist_ok=True)
json.dump(out, open("results/medium_ab.json", "w"), indent=1)
print(json.dumps(out, indent=1))
