"""Fused pair-sum aggregation kernel: the DGN/PNA edge chain in one pass.

Both remaining zoo families build their layer around the same edge pattern
(reference vTCAD/GraphOP/genGraphOP.py:110-147):

    z_e = sf( u[src_e] + v[dst_e] )          sf ∈ {identity, leaky_relu}
    outs = { reduce_e->r z_e  :  reduce ∈ {ADD, MAX, MEAN} }

Per-op XLA materialises z as an [E, D] HBM tensor and pays a dynamic
take/segment pass per op; this kernel keeps z entirely in VMEM:

    per edge tile (rb, cb):
        U = onehot(src) @ u_cblock           # [ET, D]   MXU gather
        V = onehot(dst) @ v_rblock           # [ET, D]   MXU gather
        z = sf(U + V)                        # VPU
        acc_sum += onehot(dst)^T @ z         # MXU scatter-add
        acc_cnt += onehot(dst)^T @ 1         # (degree, for MEAN)
        # MAX: receiver-sorted edges make segments contiguous inside the
        # tile, so a SEGMENTED CUMULATIVE MAX (log2 ET shifted-max passes
        # with a boundary guard) followed by a last-of-segment one-hot
        # select gives the per-row tile max; o_max = max(o_max, tile max)

There is no max-matmul on the MXU — the segmented scan is the VPU-shaped
substitute, and the one-hot select reuses the scatter machinery (the
reference dispatches these chains to its VEC unit, simulator.py:541-545).

The matcher (:func:`match_pair_agg`) collects LINEAR combinations of
scatter terms — apply_edge MM distributes over the gather
((XW)[s] ≡ X[s]W) and pair-sums merge — so both reference variants
('original' with edge-side MMs and 'trans' with node-side MMs) and DGN's
two parallel streams all canonicalise to one (u, v) pair.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import ir
from ..graph import TiledGraph

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _pair_agg_kernel(
    rb_ref, cb_ref,
    src_ref, dst_ref, u_ref, v_ref,
    o_ref,
    *, block_rows: int, block_cols: int, tile_edges: int, d_pad: int,
    sf: Optional[str], slope: float, want_max: bool, precision,
):
    """Accumulator layout o_ref [R, d_pad + d_pad + 128]:
    [ sum ‖ max ‖ count (column 0 of the last 128 lanes) ]."""
    t = pl.program_id(1)
    R, C, ET, Dp = block_rows, block_cols, tile_edges, d_pad

    prev_rb = jnp.where(t == 0, -1, rb_ref[jnp.maximum(t - 1, 0)])

    @pl.when(rb_ref[t] != prev_rb)
    def _zero():
        o_ref[:, :Dp] = jnp.zeros_like(o_ref[:, :Dp])
        o_ref[:, Dp:2 * Dp] = jnp.full_like(o_ref[:, Dp:2 * Dp], NEG)
        o_ref[:, 2 * Dp:] = jnp.zeros_like(o_ref[:, 2 * Dp:])

    src = src_ref[0, 0, :].astype(jnp.int32)              # [ET]
    dst = dst_ref[0, 0, :].astype(jnp.int32)
    # all minor-dim insertions happen on int32 (Mosaic restriction: minor
    # dim insertion only for 32-bit types); bools stay 2-D thereafter
    dst2 = dst[:, None]                                   # [ET, 1] int32
    valid2 = dst2 < R                                     # [ET, 1] bool

    cols = jax.lax.broadcasted_iota(jnp.int32, (ET, C), 1)
    gu = (src[:, None] == cols).astype(u_ref.dtype)
    U = jnp.dot(gu, u_ref[:], preferred_element_type=jnp.float32,
                precision=precision)                      # [ET, Dp]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ET, R), 1)
    od = (dst2 == rows).astype(u_ref.dtype)               # [ET, R]
    V = jnp.dot(od, v_ref[:], preferred_element_type=jnp.float32,
                precision=precision)
    z = U + V
    if sf == "leaky_relu":
        z = jnp.where(z >= 0, z, slope * z)

    # invalid (padding) slots have an ALL-ZERO one-hot row (dst == R
    # matches no iota), so the sum/count matmuls need no masking — and an
    # i1 [ET, 1] -> [ET, lanes] broadcast is a Mosaic relayout trap anyway
    zs = z.astype(u_ref.dtype)
    o_ref[:, :Dp] += jax.lax.dot_general(
        od, zs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    tile_cnt = jax.lax.dot_general(
        od, jnp.ones((ET, 128), u_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)  # [R, 128]
    o_ref[:, 2 * Dp:] += tile_cnt

    if want_max:
        # segmented cummax: receivers sorted within the tile -> segments
        # are contiguous; log2(ET) shifted-max passes guarded by a
        # same-segment test.  Masks applied arithmetically on [ET, 1]
        # (bool lane broadcasts don't lower)
        mv = valid2.astype(jnp.float32)                   # [ET, 1]
        cm = z * mv + NEG * (1.0 - mv)                    # [ET, Dp] f32
        seg = jnp.where(valid2, dst2, -1)                 # [ET, 1] int32
        k = 1
        while k < ET:
            cm_k = jnp.concatenate(
                [jnp.full((k, Dp), NEG, cm.dtype), cm[:-k]], axis=0)
            seg_k = jnp.concatenate(
                [jnp.full((k, 1), -2, seg.dtype), seg[:-k]], axis=0)
            cm = jnp.where(seg == seg_k, jnp.maximum(cm, cm_k), cm)
            k *= 2
        seg_next = jnp.concatenate(
            [seg[1:], jnp.full((1, 1), -3, seg.dtype)], axis=0)
        is_last = (seg != seg_next) & valid2              # [ET, 1] bool
        # i1 -> f32 select first (an i1 select straight into a 16-bit
        # layout is another relayout trap), then convert
        last_f = jnp.where(is_last, 1.0, 0.0)             # [ET, 1] f32
        sel = od * last_f.astype(u_ref.dtype)
        contrib = jax.lax.dot_general(
            sel, cm.astype(u_ref.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        # arithmetic has-edge mask (a [R, 1] bool lane broadcast would
        # relayout): rows with no edge in this tile contribute NEG
        hm = jnp.minimum(tile_cnt[:, :1], 1.0)            # [R, 1] f32
        o_ref[:, Dp:2 * Dp] = jnp.maximum(
            o_ref[:, Dp:2 * Dp], contrib * hm + NEG * (1.0 - hm))


def pair_aggregate_raw(
    tg: TiledGraph,
    u: jax.Array,
    v: jax.Array,
    *,
    sf: Optional[str] = None,
    slope: float = 0.2,
    want_max: bool = True,
    interpret: bool = False,
    precision=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (sum [N, D] f32, max [N, D] f32 with 0 on empty rows,
    count [N, 1] f32)."""
    from .spmm import MAX_TILES_PER_CALL, _stripe_chunks
    n, d = u.shape
    Dp = _round_up(d, 128)
    R, C, ET, T = tg.block_rows, tg.block_cols, tg.tile_edges, tg.n_tiles
    n_cols = tg.n_col_blocks * C
    n_rows = tg.n_row_blocks * R
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if u.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
    up = jnp.zeros((n_cols, Dp), u.dtype).at[:n, :d].set(u)
    vp = jnp.zeros((n_rows, Dp), v.dtype).at[:n, :d].set(v.astype(u.dtype))

    kernel = functools.partial(
        _pair_agg_kernel, block_rows=R, block_cols=C, tile_edges=ET,
        d_pad=Dp, sf=sf, slope=slope, want_max=want_max,
        precision=precision)
    Wout = 2 * Dp + 128

    def call(tile_rb, tile_cb, srcl, dstl, n_rb, vp_part):
        T_ = int(tile_rb.shape[0])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1, T_),
            in_specs=[
                pl.BlockSpec((1, 1, ET), lambda fi, t, rb, cb: (t, 0, 0)),
                pl.BlockSpec((1, 1, ET), lambda fi, t, rb, cb: (t, 0, 0)),
                pl.BlockSpec((C, Dp),
                             lambda fi, t, rb, cb: (jnp.maximum(cb[t], 0),
                                                    0)),
                pl.BlockSpec((R, Dp), lambda fi, t, rb, cb: (rb[t], 0)),
            ],
            out_specs=pl.BlockSpec((R, Wout),
                                   lambda fi, t, rb, cb: (rb[t], 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rb * R, Wout), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=4 * T_ * ET * (C + 2 * R) * Dp,
                bytes_accessed=T_ * (C + R) * Dp * u.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(tile_rb, tile_cb, srcl[:, None, :], dstl[:, None, :], up,
          vp_part)

    if T <= MAX_TILES_PER_CALL or tg.row_first_host is None:
        o = call(tg.tile_rb, tg.tile_cb, tg.src_local, tg.dst_local,
                 tg.n_row_blocks, vp)
    else:
        parts = []
        for t0, t1, rb0, rb1 in _stripe_chunks(
                tg.row_first_host, T, MAX_TILES_PER_CALL):
            # tile_rb is rebased by -rb0, so the v panel must be sliced to
            # the same row window — its BlockSpec indexes (rb[t], 0)
            parts.append(call(
                tg.tile_rb[t0:t1] - rb0, tg.tile_cb[t0:t1],
                tg.src_local[t0:t1], tg.dst_local[t0:t1], rb1 - rb0,
                vp[rb0 * R:rb1 * R]))
        # stripe chunks cover disjoint row ranges: plain row concat
        o = jnp.concatenate(parts, axis=0)
    y_sum = o[:n, :d]
    cnt = o[:n, 2 * Dp:2 * Dp + 1]
    y_max = jnp.where(cnt > 0, o[:n, Dp:Dp + d], 0.0)
    return y_sum, y_max, cnt


def _pair_agg_reference(tg: TiledGraph, u, v, *, sf, slope):
    """XLA twin over the tile edge lists (VJP backward + parity tests)."""
    n = tg.n_node
    src = (tg.tile_cb[:, None] * tg.block_cols + tg.src_local).reshape(-1)
    dst = (tg.tile_rb[:, None] * tg.block_rows + tg.dst_local).reshape(-1)
    valid = ((tg.dst_local.reshape(-1) < tg.block_rows)
             & (tg.src_local.reshape(-1) < tg.block_cols)
             & (tg.tile_cb[:, None] >= 0).repeat(
                 tg.tile_edges, 1).reshape(-1))
    src = jnp.where(valid, src, tg.n_col_blocks * tg.block_cols)
    dst = jnp.where(valid, dst, n)
    f32 = jnp.float32
    up = jnp.zeros((tg.n_col_blocks * tg.block_cols + 1, u.shape[1]),
                   f32).at[:n].set(u.astype(f32))
    vp = jnp.zeros((n + 1, v.shape[1]), f32).at[:n].set(v.astype(f32))
    z = jnp.take(up, src, axis=0) + jnp.take(vp, jnp.minimum(dst, n),
                                             axis=0)
    if sf == "leaky_relu":
        z = jax.nn.leaky_relu(z, slope)
    zs = jnp.where(valid[:, None], z, 0.0)
    y_sum = jax.ops.segment_sum(zs, dst, n + 1)[:n]
    zm = jnp.where(valid[:, None], z, NEG)
    y_max = jax.ops.segment_max(zm, dst, n + 1)[:n]
    cnt = jax.ops.segment_sum(valid.astype(f32), dst, n + 1)[:n, None]
    y_max = jnp.where(cnt > 0, y_max, 0.0)
    return y_sum, y_max, cnt


def pair_aggregate(tg: TiledGraph, u, v, *, sf=None, slope=0.2,
                   want_max=True, interpret=False):
    """Differentiable fused pair aggregation; backward = autodiff of the
    XLA twin (materialises [slots, D] — fine at zoo scale)."""

    @jax.custom_vjp
    def f(uu, vv):
        return pair_aggregate_raw(tg, uu, vv, sf=sf, slope=slope,
                                  want_max=want_max, interpret=interpret)

    def fwd(uu, vv):
        return f(uu, vv), (uu, vv)

    def bwd(res, gys):
        _, vjp = jax.vjp(
            lambda a, b: _pair_agg_reference(tg, a, b, sf=sf, slope=slope),
            *res)
        return vjp(tuple(g.astype(jnp.float32) for g in gys))

    f.defvjp(fwd, bwd)
    return f(u, v)


# ---------------------------------------------------------------------------
# matcher: linear pair-term collection over the edge chain
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PairAggPlan:
    """u = Σ terms_c (node_ref [@ W]), v = Σ terms_r; per-edge
    z = sf(u[src]+v[dst]); ``gathers`` maps reduce -> gather op id."""
    cterms: List[Tuple[int, Optional[str]]]
    rterms: List[Tuple[int, Optional[str]]]
    sf: Optional[str]
    slope: float
    gathers: Dict[str, int]
    ops: frozenset
    width: int


def _collect_terms(graph: ir.OpGraph, oid: int, allow: set):
    """(cterms, rterms, ops) of the linear pair expression rooted at
    ``oid``, or None.  apply_edge MM distributes over the scatter gather:
    (scatter(x)) @ W  ==  scatter(x @ W) — recorded as (ref, w_name)."""
    if oid not in allow:
        return None
    op = graph.by_id[oid]
    if (op.kind == ir.SCATTER and op.compute == ir.NONE
            and len(op.inputs) == 1):
        term = [(op.inputs[0], None)]
        return (term, [], {oid}) if op.order == "C" else ([], term, {oid})
    if op.kind == ir.APPLY_EDGE and op.compute == ir.ADD \
            and len(op.inputs) == 2:
        a = _collect_terms(graph, op.inputs[0], allow)
        b = _collect_terms(graph, op.inputs[1], allow)
        if a is None or b is None:
            return None
        return a[0] + b[0], a[1] + b[1], a[2] | b[2] | {oid}
    if op.kind == ir.APPLY_EDGE and op.compute == ir.MM \
            and op.extra.get("weight") and len(op.inputs) == 1:
        inner = _collect_terms(graph, op.inputs[0], allow)
        if inner is None:
            return None
        wname = op.extra["weight"][0]
        if any(w is not None for _, w in inner[0] + inner[1]):
            return None           # one linear map deep is all we absorb
        ct = [(r, wname) for r, _ in inner[0]]
        rt = [(r, wname) for r, _ in inner[1]]
        return ct, rt, inner[2] | {oid}
    return None


def match_pair_agg(graph: ir.OpGraph,
                   block: Sequence[int]) -> Optional[PairAggPlan]:
    """Match a block that is exactly: a linear pair expression, an optional
    leaky_relu, and 1..3 gathers {ADD, MAX, MEAN} consuming it."""
    allow = set(block)
    B = {o: graph.by_id[o] for o in block}
    gathers = {o: op for o, op in B.items() if op.kind == ir.GATHER}
    if not gathers:
        return None
    roots = {op.inputs[0] for op in gathers.values()}
    if len(roots) != 1:
        return None
    root = next(iter(roots))
    reduces = {}
    for o, op in gathers.items():
        if op.order != "R" or op.compute not in (ir.ADD, ir.MAX, ir.MEAN):
            return None
        if op.compute in reduces:
            return None
        reduces[op.compute] = o
    sf = None
    slope = 0.2
    covered = set(gathers)
    expr_root = root
    rop = B.get(root)
    if rop is None:
        return None
    if rop.kind == ir.APPLY_EDGE and rop.compute == ir.SF:
        if rop.extra.get("sf") != "leaky_relu":
            return None
        sf = "leaky_relu"
        slope = rop.extra.get("negative_slope", 0.2)
        covered.add(root)
        expr_root = rop.inputs[0]
    got = _collect_terms(graph, expr_root, allow)
    if got is None:
        return None
    ct, rt, expr_ops = got
    if not ct or not rt:
        return None
    covered |= expr_ops
    if covered != set(block):
        return None
    # internal values must not escape the block (only the gathers are
    # materialised)
    consumers: Dict[int, set] = {o: set() for o in graph.by_id}
    for op in graph.ops:
        for i in op.inputs:
            if i in consumers:
                consumers[i].add(op.op_id)
    internal = set(block) - set(gathers)
    if any(consumers[o] - set(block) for o in internal) \
            or (internal & set(graph.outputs)):
        return None
    return PairAggPlan(cterms=ct, rterms=rt, sf=sf, slope=slope,
                       gathers={r: o for r, o in reduces.items()},
                       ops=frozenset(block),
                       width=graph.by_id[root].out_width)
