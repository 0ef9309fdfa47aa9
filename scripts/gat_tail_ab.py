import sys; sys.path.insert(0, "/root/repo")
"""A/B the GAT edge-tile dataflows at the Reddit-tail operating point.

The Reddit GAT hybrid's cost is ~91% sparse tail (one-hot edge tiles at
HD+H = 132 lanes).  The wide (row-major) kernel with in-kernel a_src derive
costs ~ET*(C+3R) lane-passes per tile; the transposed [feat, edges] kernel
costs ~(HD+H)*(C+R)*ET/128 + tiny — a ~1.4x cut on paper even at 132 lanes
(the measured NARROW_T=64 crossover predates the derive path and was swept
at small R/C).  This measures both dataflows x tile geometries on a
synthetic graph matched to the measured tail density (~404 nnz per 1024^2
block, uniform background — results/SUMMARY.md "Tail analysis").

Usage: python scripts/gat_tail_ab.py [n_nodes]
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import tile_graph
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import _gat_forward
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
N = int(_pos[0]) if _pos else 65536
DENS = 404 / (1024 * 1024)            # measured tail background density
E = int(N * N * DENS)
H, HD = 4, 128

rng = np.random.default_rng(0)
s = rng.integers(0, N, E).astype(np.int32)
r = rng.integers(0, N, E).astype(np.int32)
hg = gta.build_host_graph(s, r, N)
print(f"N={N} E={hg.n_edge} (tail-density uniform)", flush=True)

x = jax.device_put(jax.random.normal(jax.random.key(0), (N, HD), jnp.bfloat16))
w_a = jax.device_put(jax.random.normal(jax.random.key(5), (HD, H),
                                       jnp.bfloat16) * 0.1)
a_d = jax.device_put(jax.random.normal(jax.random.key(6), (N, H), jnp.float32))

GEOS = [(512, 2048), (1024, 1024), (2048, 512), (512, 512)]
if "--round2" in sys.argv:
    # focused second round: best geometries, ET512 (fixed-cost chooser),
    # including the transposed+derive repack
    GEOS = [(512, 2048), (1024, 1024)]
DATAFLOWS = (("wide", "transposed_derive", "transposed")
             if "--round2" in sys.argv else ("wide", "transposed"))
if "--round3" in sys.argv:
    # fine sweep around the round-2 winner, best dataflow only: the tail is
    # ~64% source gather (cost ∝ C per tile) vs tiles ∝ 1/(R*C) coverage
    GEOS = [(512, 2048), (512, 1536), (512, 1024), (768, 2048),
            (768, 1536), (1024, 2048), (384, 2048), (512, 2560)]
    DATAFLOWS = ("transposed_derive",)
if "--round3b" in sys.argv:
    # round3 leaders (384x2048 8.0, 512x1024 9.4 vs 512x2048 11.0 baseline)
    # re-measured against the baseline IN ONE PROCESS: round3's first
    # measurement was inflated ~15% (512x2048 11.0 first-position vs 9.6 in
    # round2), so cross-position ranking needs a warmup throwaway and the
    # baseline present.  TR must be a multiple of 128 (Pallas block dim).
    GEOS = [(512, 2048), (384, 2048), (512, 1024), (384, 1536), (384, 1024),
            (256, 2048), (256, 1024), (512, 2048)]
    DATAFLOWS = ("transposed_derive",)
if DATAFLOWS == ("transposed_derive",):
    # throwaway: the first measurement in a process reads ~15% high
    GEOS = [GEOS[0]] + list(GEOS)
for gi, (TR, TC) in enumerate(GEOS):
    # ET minimising slots + per-tile fixed cost (reddit_bench logic)
    tcn = int(np.ceil(N / TC))
    key = ((hg.receivers[: hg.n_edge] // TR).astype(np.int64) * tcn
           + hg.senders[: hg.n_edge] // TC)
    nnz = np.bincount(key); nnz = nnz[nnz > 0]
    cands = range(256, 1025, 128)
    ET = min(cands,
             key=lambda et: (int(np.ceil(nnz / et).sum()) * (et + 80), et))
    tg = tile_graph(hg, block_rows=TR, block_cols=TC, tile_edges=ET)
    util = hg.n_edge / (tg.n_tiles * ET)
    for df in DATAFLOWS:
        def fn(p, g, xx, _df=df, _tg=tg):
            a_s = jnp.dot(xx, w_a, preferred_element_type=jnp.float32)
            msrc = jnp.max(a_s, axis=0, keepdims=True)
            return _gat_forward(_tg, xx, None, a_d.astype(jnp.bfloat16),
                                w_asrc=w_a, normalize=False, msrc=msrc,
                                dataflow=_df)
        t = time_layer_device(fn, None, None, x, k_small=1, k_big=7, reps=2)
        tag = " (warmup, discard)" if (
            gi == 0 and DATAFLOWS == ("transposed_derive",)) else ""
        print(f"{TR}x{TC}/ET{ET} util={util:.2f} tiles={tg.n_tiles} "
              f"{df:10s}: {t*1e3:7.2f} ms  {hg.n_edge/t/1e9:.3f} Gedge/s"
              f"{tag}", flush=True)
