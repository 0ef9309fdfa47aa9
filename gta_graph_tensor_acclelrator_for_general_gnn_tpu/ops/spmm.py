"""Pallas TPU block-sparse SpMM (the `gather ADD` hot kernel).

Computes ``y[r] = sum over edges (s -> r) of w_e * x[s]`` — the aggregation
at the heart of every GNN layer (the reference simulates this as its MM/VEC
units replaying LOAD/COMP/STORE tiles, vTCAD/code/simulator.py:281-355;
here it runs for real).

TPU-native design: there is no efficient dynamic scatter on the MXU, so the
kernel turns both the gather (read x[s]) and the scatter-add (accumulate into
y[r]) into *one-hot matmuls* over statically tiled edge blocks:

    for each edge tile t (all edges in one block_rows x block_cols adjacency
    block, padded to tile_edges):
        G   = onehot(src_local)            # [ET, C]   built on the VPU
        M   = (G @ X_cblock) * w           # [ET, F]   MXU gather + weight
        S   = onehot(dst_local)^T          # [R,  ET]
        Y_rblock += S @ M                  # [R,  F]   MXU scatter-add

Tiles are sorted by destination row block (TiledGraph invariant) and the
grid runs feature-block-major, tile-minor, so each output row block is
visited by *consecutive* grid steps: it stays resident in VMEM across its
whole row stripe, zeroed on first visit and written back exactly once.
Scalar prefetch (tile_rb / tile_cb) drives the BlockSpec index maps — the
Pallas pipeline double-buffers the x column-block DMAs automatically, which
is the TPU equivalent of the reference's ping-pong buffering
(vTCAD/code/compiler.py:101-104).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph import MultiTiledGraph, TiledGraph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _spmm_kernel(
    # scalar prefetch
    rb_ref, cb_ref,
    # tensor inputs
    src_ref, dst_ref, w_ref, x_ref,
    # output
    o_ref,
    *, block_rows: int, block_cols: int, tile_edges: int, precision,
):
    t = pl.program_id(1)

    prev_rb = jnp.where(t == 0, -1, rb_ref[jnp.maximum(t - 1, 0)])

    @pl.when(rb_ref[t] != prev_rb)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    src = src_ref[0, 0, :]                                # [ET]
    dst = dst_ref[0, 0, :]                                # [ET]
    w = w_ref[0, 0, :]                                    # [ET]

    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_edges, block_cols), 1)
    g = (src[:, None] == cols).astype(x_ref.dtype)        # [ET, C]
    msg = jnp.dot(g, x_ref[:], preferred_element_type=jnp.float32,
                  precision=precision)
    msg = msg * w[:, None]                                # [ET, F]

    # scatter-add via transposed-contraction dot_general on an [ET, R]
    # one-hot (building the [R, ET] orientation separately costs an extra
    # VPU compare pass — measured slower on v5e, round-2 sweep)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_edges, block_rows), 1)
    s = (dst[:, None] == rows).astype(x_ref.dtype)        # [ET, R]
    o_ref[:] += jax.lax.dot_general(
        s, msg.astype(x_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


# Above ~100k tiles the two scalar-prefetch arrays outgrow SMEM and the
# Mosaic compile crashes (measured: 101k tiles OK, 207k fails); kernels
# split larger tile sets into multiple pallas calls at row-stripe
# boundaries (tiles are rb-sorted, so chunks cover disjoint row ranges).
MAX_TILES_PER_CALL = 65536


def _stripe_chunks(row_first: tuple, n_tiles: int, cap: int):
    """Split [0, n_tiles) into (t0, t1, rb0, rb1) chunks of <= cap tiles,
    cut at row-stripe starts (row_first is strictly increasing since every
    row block owns at least one tile)."""
    import bisect
    n_rb = len(row_first) - 1
    chunks = []
    t0, rb0 = 0, 0
    while t0 < n_tiles:
        rb1 = bisect.bisect_right(row_first, t0 + cap) - 1
        rb1 = max(rb1, rb0 + 1)          # a stripe larger than cap: one call
        rb1 = min(rb1, n_rb)
        chunks.append((t0, int(row_first[rb1]), rb0, rb1))
        t0, rb0 = int(row_first[rb1]), rb1
    return chunks


def _spmm_reference(tg, x, edge_vals=None):
    """XLA COO formulation over the SAME tile arrays — numerically identical
    weighted sum (tile weight is exactly 0 on padding, so pad-slot index
    collisions contribute nothing).  Used as the custom-VJP recompute: the
    backward of y = A x is A^T ybar, which XLA expresses as the transposed
    gather/segment-add of this formulation."""
    if isinstance(tg, MultiTiledGraph):
        y = None
        for part in tg.parts:
            yp = _spmm_reference(part, x, edge_vals)
            y = yp if y is None else y + yp
        return y
    src = (tg.tile_cb[:, None] * tg.block_cols + tg.src_local).reshape(-1)
    dst = (tg.tile_rb[:, None] * tg.block_rows + tg.dst_local).reshape(-1)
    w = tg.weight
    if edge_vals is not None:
        w = w * jnp.take(edge_vals, tg.edge_id, axis=0)
    w = w.reshape(-1).astype(jnp.float32)
    n_cols = tg.n_col_blocks * tg.block_cols
    xp = jnp.zeros((n_cols, x.shape[1]), x.dtype).at[: x.shape[0]].set(x)
    vals = (jnp.take(xp, src, axis=0, mode="clip").astype(jnp.float32)
            * w[:, None])
    y = jnp.zeros((tg.n_row_blocks * tg.block_rows, x.shape[1]),
                  jnp.float32).at[dst].add(vals, mode="drop")
    return y[: tg.n_node]


def spmm(
    tg: TiledGraph,
    x: jax.Array,
    edge_vals: Optional[jax.Array] = None,
    *,
    feat_block: int = 512,
    interpret: bool = False,
    precision: Optional[jax.lax.Precision] = None,
    max_tiles_per_call: int = MAX_TILES_PER_CALL,
    _xp: Optional[jax.Array] = None,
) -> jax.Array:
    """Block-sparse SpMM: ``y`` [n_node, F] f32, differentiable in ``x`` and
    ``edge_vals``.  Forward = the Pallas one-hot kernel (:func:`_spmm_raw`);
    backward = autodiff of the exact XLA COO formulation (the kernel computes
    a plain weighted sum, so the VJP is exact — same pattern as the GAT
    kernels' custom VJPs)."""
    kw = dict(feat_block=feat_block, interpret=interpret, precision=precision,
              max_tiles_per_call=max_tiles_per_call, _xp=_xp)
    if edge_vals is None:
        @jax.custom_vjp
        def f(v):
            return _spmm_raw(tg, v, None, **kw)

        def fwd(v):
            return f(v), (v,)

        def bwd(res, gy):
            _, vjp = jax.vjp(lambda vv: _spmm_reference(tg, vv), *res)
            return vjp(gy)

        f.defvjp(fwd, bwd)
        return f(x)

    @jax.custom_vjp
    def f2(v, ev):
        return _spmm_raw(tg, v, ev, **kw)

    def fwd2(v, ev):
        return f2(v, ev), (v, ev)

    def bwd2(res, gy):
        _, vjp = jax.vjp(lambda vv, ee: _spmm_reference(tg, vv, ee), *res)
        return vjp(gy)

    f2.defvjp(fwd2, bwd2)
    return f2(x, edge_vals)


def _spmm_raw(
    tg: TiledGraph,
    x: jax.Array,
    edge_vals: Optional[jax.Array] = None,
    *,
    feat_block: int = 512,
    interpret: bool = False,
    precision: Optional[jax.lax.Precision] = None,
    max_tiles_per_call: int = MAX_TILES_PER_CALL,
    _xp: Optional[jax.Array] = None,
) -> jax.Array:
    """Block-sparse SpMM forward: returns ``y`` [n_node, F] float32.

    Args:
      tg: the tiled graph (host-side preprocessing, graph.tile_graph).
      x:  node features [n_node, F]; padded internally to the tiled column
          space.  src padding index == block_cols never matches the one-hot
          iota, so padded edges contribute exact zeros.
      edge_vals: optional per-edge multiplier [e_pad] (e.g. attention alpha);
          combined with the static tile weights.  Gathered into tile layout
          with one XLA take (cheap) before entering the kernel.

    Tile sets beyond ``max_tiles_per_call`` are executed as several pallas
    calls over disjoint row-stripe ranges (SMEM holds the per-call scalar
    prefetch arrays) and concatenated.

    A :class:`graph.MultiTiledGraph` (per-run capacity classes) runs one
    kernel per class; the partial sums add exactly (plain weighted sums).
    """
    if isinstance(tg, MultiTiledGraph):
        # build the padded x panel ONCE (classes share geometry); per-class
        # rebuilds measurably eat the packing win on medium graphs
        p0 = tg.parts[0]
        f = x.shape[1]
        fb = min(feat_block, _round_up(f, 128))
        xp = jnp.zeros((p0.n_col_blocks * p0.block_cols, _round_up(f, fb)),
                       x.dtype).at[: x.shape[0], :f].set(x)
        y = None
        for part in tg.parts:
            yp = _spmm_raw(part, x, edge_vals, feat_block=feat_block,
                           interpret=interpret, precision=precision,
                           max_tiles_per_call=max_tiles_per_call, _xp=xp)
            y = yp if y is None else y + yp
        return y
    n_cols = tg.n_col_blocks * tg.block_cols
    f = x.shape[1]
    fb = min(feat_block, _round_up(f, 128))
    f_pad = _round_up(f, fb)

    xp = (_xp if _xp is not None
          else jnp.zeros((n_cols, f_pad), x.dtype).at[: x.shape[0], :f].set(x))

    w = tg.weight
    if edge_vals is not None:
        w = w * jnp.take(edge_vals, tg.edge_id, axis=0)

    # The one-hot operands are exactly representable in bf16, so the only
    # precision loss is rounding x itself: for f32 inputs default to HIGHEST
    # (exact gather/scatter-add); bf16 inputs take the fast single-pass MXU.
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    kernel = functools.partial(
        _spmm_kernel,
        block_rows=tg.block_rows,
        block_cols=tg.block_cols,
        tile_edges=tg.tile_edges,
        precision=precision,
    )

    def call(tile_rb, tile_cb, srcl, dstl, wv, n_rb):
        T = int(tile_rb.shape[0])
        # grid: feature blocks outer, tiles inner -> output row blocks are
        # visited contiguously per feature block (accumulation in VMEM).
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(f_pad // fb, T),
            in_specs=[
                # [T, 1, ET] layout: TPU requires the last two block dims to
                # be (8k, 128k) or equal to the array dims — (1, ET) blocks
                # over [T, ET] are illegal, (1, 1, ET) over [T, 1, ET] fine.
                pl.BlockSpec((1, 1, tg.tile_edges),
                             lambda fi, t, rb, cb: (t, 0, 0)),
                pl.BlockSpec((1, 1, tg.tile_edges),
                             lambda fi, t, rb, cb: (t, 0, 0)),
                pl.BlockSpec((1, 1, tg.tile_edges),
                             lambda fi, t, rb, cb: (t, 0, 0)),
                pl.BlockSpec(
                    (tg.block_cols, fb), lambda fi, t, rb, cb: (cb[t], fi)),
            ],
            out_specs=pl.BlockSpec(
                (tg.block_rows, fb), lambda fi, t, rb, cb: (rb[t], fi)),
        )
        flops = (2 * T * tg.tile_edges
                 * (tg.block_cols + tg.block_rows) * f_pad)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_rb * tg.block_rows, f_pad), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(xp.size * xp.dtype.itemsize
                                + T * tg.tile_edges * 12),
                transcendentals=0,
            ),
            interpret=interpret,
        )(tile_rb, tile_cb,
          srcl[:, None, :], dstl[:, None, :], wv[:, None, :], xp)

    T = tg.n_tiles
    if T <= max_tiles_per_call or tg.row_first_host is None:
        y = call(tg.tile_rb, tg.tile_cb, tg.src_local, tg.dst_local, w,
                 tg.n_row_blocks)
    else:
        parts = []
        for t0, t1, rb0, rb1 in _stripe_chunks(
                tg.row_first_host, T, max_tiles_per_call):
            parts.append(call(
                tg.tile_rb[t0:t1] - rb0, tg.tile_cb[t0:t1],
                tg.src_local[t0:t1], tg.dst_local[t0:t1], w[t0:t1],
                rb1 - rb0))
        y = jnp.concatenate(parts, axis=0)
    return y[: tg.n_node, :f]
