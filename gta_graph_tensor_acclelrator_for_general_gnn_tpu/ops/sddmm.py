"""Pallas TPU SDDMM: per-edge dot products of gathered node features.

Computes ``e[k] = sum_d x_src[senders[k], d] * x_dst[receivers[k], d]`` for
every edge — the sampled-dense-dense matmul behind attention logits (the
reference expresses this as scatter+scatter+applyedge chains, e.g. GAT ops
3/4/5/6 in vTCAD/GraphOP/genGraphOP.py:50-60).

Same one-hot MXU strategy as :mod:`spmm`: for an edge tile in adjacency block
(rb, cb),

    S = onehot(src_local) @ Xsrc_cblock      # [ET, F] gather of source rows
    D = onehot(dst_local) @ Xdst_rblock      # [ET, F] gather of dest rows
    e = rowsum_per_head(S * D)                # VPU reduction, f32

Multi-head: F = heads * head_dim with head-major feature layout; each head's
dot lies inside one feature block (block size is a multiple of head_dim), so
every output element is written exactly once — no cross-block accumulation.
Output layout is [heads, T, ET] so the lane dimension is the (large) edge
axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph import GroupedTiledGraph, MultiTiledGraph, TiledGraph


def _head_block(heads: int, per_head: int, feat_block: int) -> int:
    """Largest divisor k of `heads` with k*per_head <= feat_block."""
    best = 1
    for k in range(1, heads + 1):
        if heads % k == 0 and k * per_head <= max(feat_block, per_head):
            best = k
    return best


def sddmm(
    tg: TiledGraph,
    x_src: jax.Array,
    x_dst: jax.Array,
    *,
    heads: int = 1,
    feat_block: int = 512,
    interpret: bool = False,
    precision=None,
) -> jax.Array:
    """Per-edge per-head dots in tile layout: returns [heads, T, ET] float32.

    Use :func:`tiles_to_edges` to map back to GraphTensor edge order.

    A :class:`graph.MultiTiledGraph` runs one kernel per capacity class and
    returns a TUPLE of per-class tile values (shapes differ per class);
    ``tiles_to_edges`` accepts the tuple and sums the scatters.
    """
    if isinstance(tg, MultiTiledGraph):
        return tuple(
            sddmm(p, x_src, x_dst, heads=heads, feat_block=feat_block,
                  interpret=interpret, precision=precision)
            for p in tg.parts)
    if isinstance(tg, GroupedTiledGraph):
        return _sddmm_grouped(tg, x_src, x_dst, heads=heads,
                              interpret=interpret, precision=precision)
    if precision is None:
        # one-hot operands are bf16-exact; see spmm.py for the policy
        precision = (jax.lax.Precision.HIGHEST if x_src.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
    f = x_src.shape[1]
    assert f % heads == 0, (f, heads)
    per_head = f // heads
    hpb = _head_block(heads, per_head, feat_block)
    fb = hpb * per_head
    n_fb = heads // hpb

    n_cols = tg.n_col_blocks * tg.block_cols
    n_rows = tg.n_row_blocks * tg.block_rows
    xs = jnp.zeros((n_cols, f), x_src.dtype).at[: x_src.shape[0]].set(x_src)
    xd = jnp.zeros((n_rows, f), x_dst.dtype).at[: x_dst.shape[0]].set(x_dst)

    T, ET = tg.n_tiles, tg.tile_edges

    def kernel(rb, cb, src_ref, dst_ref, xsrc_ref, xdst_ref, o_ref):
        src = src_ref[0, 0, :].astype(jnp.int32)
        dst = dst_ref[0, 0, :].astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (ET, tg.block_cols), 1)
        gs = (src[:, None] == cols).astype(xsrc_ref.dtype)
        s = jnp.dot(gs, xsrc_ref[:], preferred_element_type=jnp.float32,
                    precision=precision)
        rows = jax.lax.broadcasted_iota(jnp.int32, (ET, tg.block_rows), 1)
        gd = (dst[:, None] == rows).astype(xdst_ref.dtype)
        d = jnp.dot(gd, xdst_ref[:], preferred_element_type=jnp.float32,
                    precision=precision)
        prod = s * d                                           # [ET, fb] f32
        # per-head reduction as a head-selector matmul (no transpose/reshape —
        # Mosaic-friendly): hsel[h, j] = 1 iff feature j belongs to head h
        hrow = jax.lax.broadcasted_iota(jnp.int32, (hpb, fb), 0)
        hcol = jax.lax.broadcasted_iota(jnp.int32, (hpb, fb), 1) // per_head
        hsel = (hrow == hcol).astype(jnp.float32)
        ph = jax.lax.dot_general(
            hsel, prod, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)               # [hpb, ET]
        o_ref[:, 0, 0, :] = ph

    # [T, 1, ET] index layout and [H, T, 1, ET] output: the last two block
    # dims must be (8k, 128k) or equal to the array dims on TPU.
    def call(tile_rb, tile_cb, srcl, dstl):
        T_ = int(tile_rb.shape[0])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_fb, T_),
            in_specs=[
                pl.BlockSpec((1, 1, ET), lambda fi, t, rb, cb: (t, 0, 0)),
                pl.BlockSpec((1, 1, ET), lambda fi, t, rb, cb: (t, 0, 0)),
                pl.BlockSpec((tg.block_cols, fb),
                             lambda fi, t, rb, cb: (cb[t], fi)),
                pl.BlockSpec((tg.block_rows, fb),
                             lambda fi, t, rb, cb: (rb[t], fi)),
            ],
            out_specs=pl.BlockSpec(
                (hpb, 1, 1, ET), lambda fi, t, rb, cb: (fi, t, 0, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((heads, T_, 1, ET), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * T_ * ET * (tg.block_cols + tg.block_rows) * f,
                bytes_accessed=(xs.size + xd.size) * x_src.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(tile_rb, tile_cb, srcl[:, None, :], dstl[:, None, :], xs, xd)

    from .spmm import MAX_TILES_PER_CALL, _stripe_chunks
    if T <= MAX_TILES_PER_CALL or tg.row_first_host is None:
        out = call(tg.tile_rb, tg.tile_cb, tg.src_local, tg.dst_local)
    else:
        # the scalar-prefetch arrays outgrow SMEM past ~65k tiles (hit at
        # full-Reddit scale by the GAT scalable backward): split at
        # row-stripe boundaries and concat on the tile axis
        parts = []
        for t0, t1, rb0, rb1 in _stripe_chunks(
                tg.row_first_host, T, MAX_TILES_PER_CALL):
            parts.append(call(tg.tile_rb[t0:t1], tg.tile_cb[t0:t1],
                              tg.src_local[t0:t1], tg.dst_local[t0:t1]))
        out = jnp.concatenate(parts, axis=1)
    return out[:, :, 0, :]


def _sddmm_grouped(
    tg: GroupedTiledGraph,
    x_src: jax.Array,
    x_dst: jax.Array,
    *,
    heads: int = 1,
    interpret: bool = False,
    precision=None,
    max_chunks_per_call: int = 65536,
) -> jax.Array:
    """Stripe-group chunked SDDMM in the TRANSPOSED dataflow (round 4):
    one chunk = ``group`` sub-tiles sharing an x_src column panel; every
    per-edge array is [feat, edges] so the edge axis rides the 128 lanes.
    Returns [heads, NC, G*ET] f32 (grouped tile layout; pair with
    ``tg.edge_id`` to map back to edge order).

        s_t = xs_t[F, C] @ oh_src_t[C, G*ET]         # one wide gather
        per sub-tile g: d_t[:, g] = xd_t[F, R_g] @ oh_dst_t_g
        e   = hsel[H, F] @ (s_t * d_t)               # per-head reduce

    Per edge slot: (C+R) one-hot compares + (C+R)*F gather MACs + one
    [F, ET] multiply + an F-deep head reduction — the grouped SpMM cost
    plus one VPU pass, vs the per-tile wide kernel's per-tile panel DMAs
    and HIGHEST-precision head-selector dot."""
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if x_src.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
    f = x_src.shape[1]
    assert f % heads == 0, (f, heads)
    G, R, C, ET = tg.group, tg.block_rows, tg.block_cols, tg.tile_edges
    GR, GET = G * R, G * ET
    n_cols = tg.n_col_blocks * C
    n_rows = tg.n_groups * GR
    dt = x_src.dtype
    xs = jnp.zeros((n_cols, f), dt).at[: x_src.shape[0]].set(x_src)
    xd = jnp.zeros((n_rows, f), dt).at[: x_dst.shape[0]].set(
        x_dst.astype(dt))
    xs_t, xd_t = xs.T, xd.T

    def kernel(grp_ref, cb_ref, src_ref, dst_ref, xsrc_ref, xdst_ref,
               o_ref):
        src = src_ref[0].astype(jnp.int32).reshape(GET)
        src_b = jax.lax.broadcast_in_dim(src, (C, GET), (1,))
        oh_src_t = (src_b == jax.lax.broadcasted_iota(
            jnp.int32, (C, GET), 0)).astype(dt)
        s = jnp.dot(xsrc_ref[:], oh_src_t,
                    preferred_element_type=jnp.float32,
                    precision=precision)                       # [F, GET]
        dcols = []
        for g in range(G):
            dstg = dst_ref[0, g].astype(jnp.int32)
            dst_b = jax.lax.broadcast_in_dim(dstg, (R, ET), (1,))
            oh_dst_t = (dst_b == jax.lax.broadcasted_iota(
                jnp.int32, (R, ET), 0)).astype(dt)
            dcols.append(jnp.dot(
                xdst_ref[:, g * R:(g + 1) * R], oh_dst_t,
                preferred_element_type=jnp.float32,
                precision=precision))                          # [F, ET]
        d = jnp.concatenate(dcols, axis=1)                     # [F, GET]
        prod = (s * d).astype(dt)
        hrow = jax.lax.broadcasted_iota(jnp.int32, (heads, f), 0)
        hcol = jax.lax.broadcasted_iota(
            jnp.int32, (heads, f), 1) // (f // heads)
        hsel = (hrow == hcol).astype(dt)
        o_ref[:, 0, 0, :] = jnp.dot(
            hsel, prod, preferred_element_type=jnp.float32,
            precision=precision)                               # [H, GET]

    def call(chunk_grp, chunk_cb, srcl, dstl, xd_panel):
        NC = int(chunk_grp.shape[0])
        edge_spec = pl.BlockSpec((1, G, ET),
                                 lambda fi, c, grp, cb: (c, 0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1, NC),
            in_specs=[
                edge_spec, edge_spec,
                pl.BlockSpec((f, C), lambda fi, c, grp, cb: (0, cb[c])),
                pl.BlockSpec((f, GR), lambda fi, c, grp, cb: (0, grp[c])),
            ],
            # [H, NC, 1, GET] output: the last two block dims must be
            # (8k, 128k) or equal to the array dims on TPU (same trick as
            # the per-tile kernel's [H, T, 1, ET])
            out_specs=pl.BlockSpec(
                (heads, 1, 1, GET), lambda fi, c, grp, cb: (0, c, 0, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((heads, NC, 1, GET),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * NC * GET * (C + R) * f,
                bytes_accessed=NC * (C + GR) * f * dt.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(chunk_grp, chunk_cb, srcl, dstl, xs_t, xd_panel)

    from .spmm import _stripe_chunks
    NC = tg.n_chunks
    if NC <= max_chunks_per_call or tg.grp_first_chunk_host is None:
        return call(tg.chunk_grp, tg.chunk_cb, tg.src_local, tg.dst_local,
                    xd_t)[:, :, 0, :]
    parts = []
    for c0, c1, g0, g1 in _stripe_chunks(
            tg.grp_first_chunk_host, NC, max_chunks_per_call):
        # chunk_grp rebased by -g0: slice the xd panel to the group window
        parts.append(call(
            tg.chunk_grp[c0:c1] - g0, tg.chunk_cb[c0:c1],
            tg.src_local[c0:c1], tg.dst_local[c0:c1],
            xd_t[:, g0 * GR:g1 * GR]))
    return jnp.concatenate(parts, axis=1)[:, :, 0, :]


def tiles_to_edges(tg: TiledGraph, vals: jax.Array, e_pad: int) -> jax.Array:
    """Map tile-layout values [heads, T, ET] back to edge order [e_pad, heads].

    Each real edge occupies exactly one tile slot.  Padding slots alias the
    last edge id, so the scatter must ADD (their kernel values are exact
    zeros — the one-hot rows miss) rather than SET, which would clobber the
    last edge with an arbitrary winner among the duplicate writes.

    MultiTiledGraph: ``vals`` is the per-class tuple from :func:`sddmm`;
    each class owns a disjoint edge subset, so the scatters sum exactly."""
    if isinstance(tg, MultiTiledGraph):
        out = None
        for p, v in zip(tg.parts, vals):
            o = tiles_to_edges(p, v, e_pad)
            out = o if out is None else out + o
        return out
    H = vals.shape[0]
    flat = vals.reshape(H, -1).T                     # [T*ET, H]
    idx = tg.edge_id.reshape(-1)
    out = jnp.zeros((e_pad, H), vals.dtype)
    return out.at[idx].add(flat, mode="drop")


def edges_to_tiles(tg: TiledGraph, vals: jax.Array) -> jax.Array:
    """Gather per-edge values [e_pad, ...] into tile layout [T, ET, ...].

    MultiTiledGraph: returns the per-class tuple."""
    if isinstance(tg, MultiTiledGraph):
        return tuple(edges_to_tiles(p, vals) for p in tg.parts)
    return jnp.take(vals, tg.edge_id, axis=0)


def sddmm_edges(tg: TiledGraph, g, x_src: jax.Array, x_dst: jax.Array,
                compute: str = "MUL", *, interpret: bool = False) -> jax.Array:
    """Edge-domain scatter(C)+scatter(R)+apply_edge(ADD|MUL) as one SDDMM:
    returns [e_pad, F] f32 in GraphTensor edge order.

    Elementwise MUL = SDDMM with heads=F (per-head width 1); elementwise ADD
    = SDDMM over augmented operands [a ‖ 1]·[1 ‖ b] (per-head width 2).
    Forward runs the one-hot MXU kernel; backward is the XLA take/segment
    formulation (exact — both compute the same per-edge values)."""
    e_pad = int(g.senders.shape[0])
    F = x_src.shape[1]

    def ref_fwd(xs, xd):
        n = g.n_node
        src = jnp.where(g.edge_mask, g.senders, n)
        dst = jnp.where(g.edge_mask, g.receivers, n)
        pad = jnp.zeros((1, F), jnp.float32)
        s = jnp.take(jnp.concatenate([xs.astype(jnp.float32), pad]), src,
                     axis=0)
        d = jnp.take(jnp.concatenate([xd.astype(jnp.float32), pad]), dst,
                     axis=0)
        return s * d if compute == "MUL" else \
            jnp.where(g.edge_mask[:, None], s + d, 0.0)

    @jax.custom_vjp
    def f(xs, xd):
        if compute == "MUL":
            ev = sddmm(tg, xs, xd, heads=F, interpret=interpret)
        else:
            xs2 = jnp.stack([xs, jnp.ones_like(xs)], axis=2)
            xd2 = jnp.stack([jnp.ones_like(xd), xd], axis=2)
            ev = sddmm(tg, xs2.reshape(xs.shape[0], 2 * F),
                       xd2.reshape(xd.shape[0], 2 * F), heads=F,
                       interpret=interpret)
        out = tiles_to_edges(tg, ev, e_pad)
        # tile padding slots overwrite the last edge id with zeros; the ADD
        # variant's real values there are fine (padding writes land last in
        # undefined order only on the padded slots, which are masked edges)
        return jnp.where(g.edge_mask[:, None], out, 0.0)

    def fwd(xs, xd):
        return f(xs, xd), (xs, xd)

    def bwd(res, gbar):
        _, vjp = jax.vjp(ref_fwd, *res)
        return vjp(gbar.astype(jnp.float32))

    f.defvjp(fwd, bwd)
    return f(x_src, x_dst)
