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

from ..graph import GroupedTiledGraph, MultiTiledGraph, TiledGraph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _spmm_grouped_kernel(
    # scalar prefetch
    grp_ref, cb_ref,
    # tensor inputs: src, dst, [w,] x   (w absent when unit_weight)
    *refs,
    block_rows: int, block_cols: int, tile_edges: int, group: int,
    precision, unit_weight: bool,
):
    """One grid step = one chunk: ``group`` sub-tiles sharing a single
    (stripe-group, col-block).  Sub-tile j serves row block grp*group+j, so
    every index is static: the output stripe [group*R, fb] stays VMEM
    resident across its group, the x panel [C, fb] is DMA'd once per chunk
    (amortised over the group), and the grid constant is paid per chunk
    instead of per tile.  This is what lets the one-hot width R+C shrink
    to 1024 (vs 2048) at equal utilisation — the round-3 tail redesign
    (VERDICT r2 next-1).

    ``unit_weight``: every real-edge weight is exactly 1.0 — the weight
    stream, its DMA, and the f32 multiply pass all drop out (~20% of the
    kernel, scripts/grouped_ablate.py).  Padding safety is independent of
    the weights: pad slots carry src==block_cols / dst==block_rows, which
    match neither one-hot iota, so they contribute exact zeros."""
    if unit_weight:
        src_ref, dst_ref, x_ref, o_ref = refs
        w_ref = None
    else:
        src_ref, dst_ref, w_ref, x_ref, o_ref = refs
    c = pl.program_id(1)

    prev_grp = jnp.where(c == 0, -1, grp_ref[jnp.maximum(c - 1, 0)])

    @pl.when(grp_ref[c] != prev_grp)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    # batched over the group: ONE [G*ET, C] gather matmul (full MXU M) and
    # one G-batched scatter contraction — at F=128 the kernel is otherwise
    # VPU-bound on one-hot construction and MXU-overhead-bound on small-M
    # matmuls (measured: per-j unroll 73 ms vs batched form, grouped_ab)
    G, ET, R, C = group, tile_edges, block_rows, block_cols
    xb = x_ref[:]                                          # [C, fb]
    fb = o_ref.shape[1]
    src = src_ref[0].astype(jnp.int32)                     # [G, ET]
    dst = dst_ref[0].astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (G, ET, C), 2)
    g = (src[..., None] == cols).astype(xb.dtype).reshape(G * ET, C)
    rows = jax.lax.broadcasted_iota(jnp.int32, (G, ET, R), 2)
    s = (dst[..., None] == rows).astype(xb.dtype)          # [G, ET, R]
    msg = jnp.dot(g, xb, preferred_element_type=jnp.float32,
                  precision=precision)                     # [G*ET, fb]
    if unit_weight:
        msg = msg.reshape(G, ET, fb).astype(xb.dtype)
    else:
        # weight applied in f32 on the 3-D view (a [G*ET, 1] reshape of w
        # is a cross-lane shape cast Mosaic can't lower; the leading-dim
        # split of msg is layout-preserving)
        w = w_ref[0]                                       # [G, ET]
        msg = (msg.reshape(G, ET, fb) * w[..., None]).astype(xb.dtype)
    out = jax.lax.dot_general(
        s, msg,
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    o_ref[:] += out.reshape(G * R, fb)                     # [G*R, fb]


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

    src = src_ref[0, 0, :].astype(jnp.int32)             # [ET]
    dst = dst_ref[0, 0, :].astype(jnp.int32)              # [ET]
    # 32-bit upcasts at read: tilings store int16 local offsets and (on
    # unit tilings) bf16 weights; 16-bit minor-dim insertions have no
    # Mosaic lowering
    w = w_ref[0, 0, :].astype(jnp.float32)                # [ET]

    # dead tiles (uniform-shape padding across shard_map shards) carry
    # cb == -1: skip both matmuls, paying only the grid constant — the
    # skew-aware padding fix (VERDICT r2 next-8)
    @pl.when(cb_ref[t] >= 0)
    def _compute():
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (tile_edges, block_cols), 1)
        g = (src[:, None] == cols).astype(x_ref.dtype)    # [ET, C]
        msg = jnp.dot(g, x_ref[:], preferred_element_type=jnp.float32,
                      precision=precision)
        msg = msg * w[:, None]                            # [ET, F]

        # scatter-add via transposed-contraction dot_general on an [ET, R]
        # one-hot (building the [R, ET] orientation separately costs an
        # extra VPU compare pass — measured slower on v5e, round-2 sweep)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (tile_edges, block_rows), 1)
        s = (dst[:, None] == rows).astype(x_ref.dtype)    # [ET, R]
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


def _spmm_grouped_raw(
    tg: GroupedTiledGraph,
    x: jax.Array,
    edge_vals: Optional[jax.Array] = None,
    *,
    feat_block: int = 512,
    interpret: bool = False,
    precision: Optional[jax.lax.Precision] = None,
    max_chunks_per_call: int = 65536,
    _xp: Optional[jax.Array] = None,
) -> jax.Array:
    """Grouped-chunk SpMM forward: ``y`` [n_node, F] float32.

    When every real-edge weight is exactly 1.0 and there are no runtime
    ``edge_vals``, the weight stream drops out of the kernel entirely
    (tg.weight_all_unit, ~20% faster at tail density)."""
    n_cols = tg.n_col_blocks * tg.block_cols
    f = x.shape[1]
    fb = min(feat_block, _round_up(f, 128))
    f_pad = _round_up(f, fb)
    GR = tg.group * tg.block_rows                     # stripe rows

    xp = (_xp if _xp is not None
          else jnp.zeros((n_cols, f_pad), x.dtype).at[: x.shape[0], :f].set(x))

    w = tg.weight
    unit = edge_vals is None and tg.weight_all_unit
    if edge_vals is not None:
        w = w * jnp.take(edge_vals, tg.edge_id, axis=0)

    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    kernel = functools.partial(
        _spmm_grouped_kernel,
        block_rows=tg.block_rows,
        block_cols=tg.block_cols,
        tile_edges=tg.tile_edges,
        group=tg.group,
        precision=precision,
        unit_weight=unit,
    )

    def call(chunk_grp, chunk_cb, srcl, dstl, wv, n_grp):
        NC = int(chunk_grp.shape[0])
        edge_spec = pl.BlockSpec((1, tg.group, tg.tile_edges),
                                 lambda fi, c, grp, cb: (c, 0, 0))
        in_specs = [edge_spec, edge_spec]
        operands = [srcl, dstl]
        if not unit:
            in_specs.append(edge_spec)
            operands.append(wv)
        in_specs.append(pl.BlockSpec(
            (tg.block_cols, fb), lambda fi, c, grp, cb: (cb[c], fi)))
        operands.append(xp)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(f_pad // fb, NC),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (GR, fb), lambda fi, c, grp, cb: (grp[c], fi)),
        )
        flops = (2 * NC * tg.group * tg.tile_edges
                 * (tg.block_cols + tg.block_rows) * f_pad)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_grp * GR, f_pad), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(NC * tg.block_cols * fb * xp.dtype.itemsize
                                + NC * tg.group * tg.tile_edges * 12),
                transcendentals=0,
            ),
            interpret=interpret,
        )(chunk_grp, chunk_cb, *operands)

    NC = tg.n_chunks
    if NC <= max_chunks_per_call or tg.grp_first_chunk_host is None:
        y = call(tg.chunk_grp, tg.chunk_cb, tg.src_local, tg.dst_local, w,
                 tg.n_groups)
    else:
        parts = []
        for c0, c1, g0, g1 in _stripe_chunks(
                tg.grp_first_chunk_host, NC, max_chunks_per_call):
            parts.append(call(
                tg.chunk_grp[c0:c1] - g0, tg.chunk_cb[c0:c1],
                tg.src_local[c0:c1], tg.dst_local[c0:c1], w[c0:c1],
                g1 - g0))
        y = jnp.concatenate(parts, axis=0)
    return y[: tg.n_node, :f]


def _spmm_grouped_reference(tg: GroupedTiledGraph, x, edge_vals=None):
    """XLA COO twin over the grouped tile arrays (for VJP recompute and
    parity tests); pad slots carry weight 0 so collisions are harmless."""
    NC, G, ET = tg.src_local.shape
    grp = tg.chunk_grp
    src = (tg.chunk_cb[:, None, None] * tg.block_cols
           + tg.src_local).reshape(-1)
    j = jnp.arange(G, dtype=jnp.int32)[None, :, None]
    dst = ((grp[:, None, None] * G + j) * tg.block_rows
           + tg.dst_local).reshape(-1)
    w = tg.weight
    if edge_vals is not None:
        w = w * jnp.take(edge_vals, tg.edge_id, axis=0)
    w = w.reshape(-1).astype(jnp.float32)
    n_cols = tg.n_col_blocks * tg.block_cols
    xp = jnp.zeros((n_cols, x.shape[1]), x.dtype).at[: x.shape[0]].set(x)
    vals = (jnp.take(xp, src, axis=0, mode="clip").astype(jnp.float32)
            * w[:, None])
    y = jnp.zeros((tg.n_groups * G * tg.block_rows, x.shape[1]),
                  jnp.float32).at[dst].add(vals, mode="drop")
    return y[: tg.n_node]


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
    if isinstance(tg, GroupedTiledGraph):
        return _spmm_grouped_reference(tg, x, edge_vals)
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
    tg_t=None,
    ev_perm_t: Optional[jax.Array] = None,
    feat_block: int = 512,
    interpret: bool = False,
    precision: Optional[jax.lax.Precision] = None,
    max_tiles_per_call: int = MAX_TILES_PER_CALL,
    _xp: Optional[jax.Array] = None,
) -> jax.Array:
    """Block-sparse SpMM: ``y`` [n_node, F] f32, differentiable in ``x`` and
    ``edge_vals``.  Forward = the Pallas one-hot kernel (:func:`_spmm_raw`).

    Backward: with ``tg_t`` (a tiling of the TRANSPOSED graph, built once
    host-side via graph.transpose_host_graph) the x-grad runs the SAME
    kernel on the transpose — dx = Aᵀ ȳ — so gradients scale exactly like
    the forward (the round-3 tiled backward, VERDICT r2 next-3).  Without
    ``tg_t``, autodiff of the exact XLA COO formulation (materialises
    [slots, F] — fine at small scale, fatal at Reddit full-batch).

    ``ev_perm_t``: transposed-order -> original-order edge permutation
    (transpose_host_graph's ``perm``) — routes runtime ``edge_vals`` into
    the transposed tiling with one [E] take.  The edge_vals GRAD always
    uses the reference formulation (it is an SDDMM; kernel route lives in
    the GAT custom VJPs)."""
    kw = dict(feat_block=feat_block, interpret=interpret, precision=precision,
              max_tiles_per_call=max_tiles_per_call, _xp=_xp)
    kwt = dict(feat_block=feat_block, interpret=interpret,
               precision=precision, max_tiles_per_call=max_tiles_per_call)
    if edge_vals is None:
        @jax.custom_vjp
        def f(v):
            return _spmm_raw(tg, v, None, **kw)

        def fwd(v):
            return f(v), (v,)

        def bwd(res, gy):
            (v,) = res
            if tg_t is not None:
                dx = _spmm_raw(tg_t, gy.astype(v.dtype), None, **kwt)
                return (dx[: v.shape[0]].astype(v.dtype),)
            _, vjp = jax.vjp(lambda vv: _spmm_reference(tg, vv), v)
            return vjp(gy)

        f.defvjp(fwd, bwd)
        return f(x)

    @jax.custom_vjp
    def f2(v, ev):
        return _spmm_raw(tg, v, ev, **kw)

    def fwd2(v, ev):
        return f2(v, ev), (v, ev)

    def bwd2(res, gy):
        v, ev = res
        _, vjp = jax.vjp(lambda vv, ee: _spmm_reference(tg, vv, ee), v, ev)
        if tg_t is not None and ev_perm_t is not None:
            ev_t = jnp.take(ev, ev_perm_t, axis=0)
            dx = _spmm_raw(tg_t, gy.astype(v.dtype), ev_t, **kwt)
            _, dev = vjp(gy)
            return dx[: v.shape[0]].astype(v.dtype), dev
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
    A :class:`graph.GroupedTiledGraph` routes to the stripe-group chunked
    kernel (:func:`_spmm_grouped_raw`).
    """
    if isinstance(tg, GroupedTiledGraph):
        return _spmm_grouped_raw(
            tg, x, edge_vals, feat_block=feat_block, interpret=interpret,
            precision=precision, _xp=_xp)
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
                    (tg.block_cols, fb),
                    lambda fi, t, rb, cb: (jnp.maximum(cb[t], 0), fi)),
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
