"""Sparse-input first-layer MM (the reference's isSinput mode).

The reference auto-enables a sparse-input mode when dataset feature
sparsity < 0.5 (vTCAD/code/simulator.py:460-461) and makes the first
``applynode MM`` read/compute only the nnz of X
(vTCAD/code/compiler.py:302-306,321-325).  Cora's bag-of-words X is ~1.2%
dense, Citeseer's ~0.9% — the dense 2708x1433x128 first-layer matmul is
almost all zeros.

TPU-native realisation: X@W *is* an SpMM over the bipartite
(feature -> node) incidence graph, so the existing block-sparse one-hot /
dense-block machinery applies verbatim:

    senders   = feature (word) index of each nonzero
    receivers = node (document) index
    weight    = X[doc, word]
    X @ W     = spmm(tiles(X), W)

The nonzero PATTERN AND VALUES are baked at lowering time (the dataset's
features are fixed across a training run — the only regime where this mode
is used; a generic ``apply(params, g, x)`` with varying x keeps the dense
MM).  The VJP w.r.t. W is exact: d(X@W)/dW = X^T @ gbar, computed from the
baked sparse pattern via the transposed bipartite graph.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import HybridGraph, build_host_graph, hybrid_graph
from . import dense as dense_mod
from . import spmm as spmm_mod

SPARSITY_THRESHOLD = 0.5   # reference: isSinput auto-on when density < 0.5


def density(x: np.ndarray) -> float:
    return float(np.count_nonzero(x)) / max(x.size, 1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FeatureGraph:
    """Bipartite incidence tiling of a sparse feature matrix X [N, F_in]."""
    fwd: HybridGraph          # rows = nodes, cols = features
    bwd: HybridGraph          # rows = features, cols = nodes (for the VJP)
    n_node: int = dataclasses.field(metadata=dict(static=True))
    n_feat: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))


def feature_graph(
    x: np.ndarray,
    *,
    block: int = 256,
    tile_edges: int = 512,
) -> FeatureGraph:
    """Build the bipartite tiling of X's nonzeros (host side, once)."""
    x = np.asarray(x)
    docs, words = np.nonzero(x)
    vals = x[docs, words].astype(np.float32)
    n = max(x.shape[0], x.shape[1])   # square node space covers both sides
    thr = dense_mod.spmm_dense_threshold(block, block)

    def build(s, r, w):
        hg = build_host_graph(s.astype(np.int32), r.astype(np.int32), n,
                              edge_weight=w, edge_pad_multiple=tile_edges)
        return hybrid_graph(hg, block_rows=block, block_cols=block,
                            tile_edges=tile_edges, min_nnz=thr)

    return FeatureGraph(
        fwd=build(words, docs, vals),
        bwd=build(docs, words, vals),
        n_node=int(x.shape[0]),
        n_feat=int(x.shape[1]),
        nnz=len(vals),
    )


def _apply_hybrid(hyb: HybridGraph, w: jax.Array, out_rows: int,
                  interpret: bool) -> jax.Array:
    y = spmm_mod.spmm(hyb.tiles, w, interpret=interpret)
    if hyb.dense is not None:
        yd = dense_mod.spmm_dense(hyb.dense, w, interpret=interpret)
        y = y + yd[: y.shape[0]]
    return y[:out_rows]


def sparse_input_mm(
    fg: FeatureGraph,
    w: jax.Array,
    *,
    compute_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """X @ W over the baked nonzeros of X; [F_in, F_out] -> [N, F_out] f32.

    Exact custom VJP (linear in W, X constant): gbar -> X^T @ gbar via the
    transposed bipartite tiling — both directions run the same block-sparse
    kernels."""
    n, f = fg.n_node, fg.n_feat

    @jax.custom_vjp
    def f_(wv):
        wk = wv.astype(compute_dtype) if compute_dtype is not None else wv
        # rows beyond f in the padded [max(n,f)]-space are zero columns of W
        wp = jnp.zeros((max(n, f), wv.shape[1]), wk.dtype).at[:f].set(wk)
        return _apply_hybrid(fg.fwd, wp, n, interpret)

    def fwd_(wv):
        return f_(wv), ()

    def bwd_(_, gbar):
        gk = gbar.astype(compute_dtype) if compute_dtype is not None else gbar
        gp = jnp.zeros((max(n, f), gbar.shape[1]), gk.dtype).at[:n].set(gk)
        return (_apply_hybrid(fg.bwd, gp, f, interpret),)

    f_.defvjp(fwd_, bwd_)
    return f_(w)
