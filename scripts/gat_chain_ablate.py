import sys; sys.path.insert(0, "/root/repo")
"""Ablate the r4 transposed grouped GAT chain kernel: which stage holds the
~4.2 ns/slot (vs grouped SpMM's ~1.4)?  Each variant deletes one stage,
keeping shapes/DMAs identical; deltas are that stage's true marginal cost.

Variants (cumulative from 'full'):
  full        the production _gat_grouped_kernel_t
  noexp       p := a_s slice (skip leaky/bound/exp/where chain)
  noad        a_d := 0 (skip the per-g a_dst gather dots)
  nosoftmax   both of the above
  spmm_like   scatter hs only (width HD, no p, no concat — the SpMM shape)
  onehot_only no matmuls at all: build one-hots, accumulate a sum (floor)

Usage: python scripts/gat_chain_ablate.py [E]
"""
import functools
import gc
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    tile_graph_grouped)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

N = 232965
E = int(sys.argv[1]) if len(sys.argv) > 1 else 20_500_000
H, HD = 4, 128
G, R, C, ET = int(sys.argv[3]) if len(sys.argv) > 3 else 8, 512, 512, 128


def kernel_v2(grp_ref, cb_ref, src_ref, dst_ref, hcat_ref, w_ref, adb_ref,
              o_ref, *, precision):
    """v2: transposed dataflow + BATCHED per-group dots (one batched
    a_d/bound gather, one batched head expansion, one batched scatter) —
    per-dot fixed overhead paid 3x per chunk instead of 3*G times.
    adb_ref: [G*2H, R] panel = per row block [a_dst_t ; bound_t].
    o_ref: [G*(HD+H), R] — row-major group stripes, XLA transposes once."""
    c = pl.program_id(1)
    GET = G * ET
    dt = hcat_ref.dtype
    slope = 0.2

    prev_grp = jnp.where(c == 0, -1, grp_ref[jnp.maximum(c - 1, 0)])

    @pl.when(grp_ref[c] != prev_grp)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    src = src_ref[0].astype(jnp.int32).reshape(GET)
    src_b = jax.lax.broadcast_in_dim(src, (C, GET), (1,))
    oh_src_t = (src_b == jax.lax.broadcasted_iota(
        jnp.int32, (C, GET), 0)).astype(dt)
    hs = jnp.dot(hcat_ref[:], oh_src_t,
                 preferred_element_type=jnp.float32, precision=precision)
    a_s = jax.lax.dot_general(
        w_ref[:], hs.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)  # [H, GET]

    dst = dst_ref[0].astype(jnp.int32)                     # [G, ET]
    dst_b = jax.lax.broadcast_in_dim(dst, (G, R, ET), (0, 2))
    oh_dst3 = (dst_b == jax.lax.broadcasted_iota(
        jnp.int32, (G, R, ET), 1)).astype(dt)              # [G, R, ET]

    adb3 = adb_ref[:].reshape(G, 2 * H, R)
    pack = jax.lax.dot_general(
        adb3.astype(dt), oh_dst3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    a_d = pack[:, :H, :]                                   # [G, H, ET]
    bound = pack[:, H:, :]

    def leaky(v):
        return jnp.where(v >= 0, v, slope * v)

    # ONE relayout per chunk: [*, G*ET] lane-major -> [G, *, ET]
    a_s3 = a_s.reshape(H, G, ET).transpose(1, 0, 2)
    hs3 = hs.reshape(HD, G, ET).transpose(1, 0, 2)         # [G, HD, ET]
    e = leaky(a_s3 + a_d)
    dmat = jax.lax.broadcast_in_dim(dst, (G, H, ET), (0, 2))
    p = jnp.where(dmat < R, jnp.exp(jnp.minimum(e - bound, 60.0)), 0.0)
    brow = jax.lax.broadcasted_iota(jnp.int32, (G, HD, H), 1) // (HD // H)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (G, HD, H), 2)
    Bt3 = (brow == bcol).astype(jnp.float32)
    p_full = jax.lax.dot_general(
        Bt3, p, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)               # [G, HD, ET]
    v = jnp.concatenate([p_full * hs3, p], axis=1).astype(dt)
    acc = jax.lax.dot_general(
        v, oh_dst3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    o_ref[:] += acc.reshape(G * (HD + H), R)


def kernel(grp_ref, cb_ref, src_ref, dst_ref, hcat_ref, w_ref, adst_ref,
           msrc_ref, o_ref, *, mode: str, precision):
    c = pl.program_id(1)
    GET = G * ET
    dt = hcat_ref.dtype
    slope = 0.2

    prev_grp = jnp.where(c == 0, -1, grp_ref[jnp.maximum(c - 1, 0)])

    @pl.when(grp_ref[c] != prev_grp)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    src = src_ref[0].astype(jnp.int32).reshape(GET)
    src_b = jax.lax.broadcast_in_dim(src, (C, GET), (1,))
    oh_src_t = (src_b == jax.lax.broadcasted_iota(
        jnp.int32, (C, GET), 0)).astype(dt)

    if mode == "onehot_only":
        acc = jnp.zeros((HD + H, R), jnp.float32)
        for g in range(G):
            dstg = dst_ref[0, g].astype(jnp.int32)
            dst_b = jax.lax.broadcast_in_dim(dstg, (R, ET), (1,))
            oh_dst_t = (dst_b == jax.lax.broadcasted_iota(
                jnp.int32, (R, ET), 0)).astype(dt)
            acc = acc + jnp.sum(oh_dst_t, axis=1)[None, :]
        o_ref[:, :R] += acc + jnp.sum(oh_src_t, axis=0)[None, :R]
        return

    hs = jnp.dot(hcat_ref[:], oh_src_t,
                 preferred_element_type=jnp.float32, precision=precision)
    if mode not in ("spmm_like",):
        a_s = jax.lax.dot_general(
            w_ref[:], hs.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def leaky(v):
        return jnp.where(v >= 0, v, slope * v)

    brow = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 0) // (HD // H)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 1)
    Bt = (brow == bcol).astype(jnp.float32)

    for g in range(G):
        dstg = dst_ref[0, g].astype(jnp.int32)
        dst_b = jax.lax.broadcast_in_dim(dstg, (R, ET), (1,))
        oh_dst_t = (dst_b == jax.lax.broadcasted_iota(
            jnp.int32, (R, ET), 0)).astype(dt)
        hsg = hs[:, g * ET:(g + 1) * ET]
        if mode == "spmm_like":
            o_ref[:HD, g * R:(g + 1) * R] += jax.lax.dot_general(
                hsg.astype(dt), oh_dst_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            continue
        if mode in ("noad", "nosoftmax"):
            a_d = jnp.zeros((H, ET), jnp.float32)
        else:
            a_d = jnp.dot(adst_ref[:, g * R:(g + 1) * R], oh_dst_t,
                          preferred_element_type=jnp.float32,
                          precision=precision)
        a_sg = a_s[:, g * ET:(g + 1) * ET]
        if mode in ("noexp", "nosoftmax"):
            p = a_sg + a_d
        else:
            e = leaky(a_sg + a_d)
            bound = leaky(msrc_ref[:, 0][:, None] + a_d)
            dmat = jax.lax.broadcast_in_dim(dstg, (H, ET), (1,))
            p = jnp.where(dmat < R,
                          jnp.exp(jnp.minimum(e - bound, 60.0)), 0.0)
        if mode == "v3":
            # head expansion as a sublane repeat, not a K=4 MXU dot
            p_full = pltpu.repeat(p, HD // H, axis=0)
        else:
            p_full = jnp.dot(Bt, p, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        v = jnp.concatenate([p_full * hsg, p], axis=0).astype(dt)
        o_ref[:, g * R:(g + 1) * R] += jax.lax.dot_general(
            v, oh_dst_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)


def run(tg, h, w_a, a_d, msrc, mode):
    n_cols = tg.n_col_blocks * C
    n_rows = tg.n_groups * G * R
    GR = G * R
    dt = h.dtype
    precision = jax.lax.Precision.DEFAULT
    hcat = jnp.zeros((n_cols, HD), dt).at[: h.shape[0]].set(h)
    ads = jnp.zeros((n_rows, H), jnp.float32).at[: a_d.shape[0]].set(a_d)
    NC = tg.n_chunks
    if mode == "v2":
        slope = 0.2
        bound_r = jnp.where(msrc + ads >= 0, msrc + ads,
                            slope * (msrc + ads))          # [n_rows, H]
        # [n_grp, G, 2H, R] -> [n_grp*G*2H, R]
        adb = jnp.concatenate(
            [ads.reshape(-1, R, H), bound_r.reshape(-1, R, H)],
            axis=2)                                        # [nG, R, 2H]
        adb = adb.transpose(0, 2, 1).reshape(-1, R)        # [nG*2H, R]
        k = functools.partial(kernel_v2, precision=precision)
        edge_spec = pl.BlockSpec((1, G, ET),
                                 lambda fi, c, grp, cb: (c, 0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1, NC),
            in_specs=[
                edge_spec, edge_spec,
                pl.BlockSpec((HD, C), lambda fi, c, grp, cb: (0, cb[c])),
                pl.BlockSpec((HD, H), lambda fi, c, grp, cb: (0, 0)),
                pl.BlockSpec((G * 2 * H, R),
                             lambda fi, c, grp, cb: (grp[c], 0)),
            ],
            out_specs=pl.BlockSpec(
                (G * (HD + H), R), lambda fi, c, grp, cb: (grp[c], 0)),
        )
        out = pl.pallas_call(
            k, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (tg.n_groups * G * (HD + H), R), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * NC * G * ET * (C + 2 * R) * (HD + H),
                bytes_accessed=NC * C * HD * dt.itemsize,
                transcendentals=NC * G * ET * H,
            ),
        )(tg.chunk_grp, tg.chunk_cb, tg.src_local, tg.dst_local,
          hcat.T, w_a.astype(dt), adb)
        # [nG*G*(HD+H), R] -> rows x (HD+H)
        out = out.reshape(-1, HD + H, R).transpose(0, 2, 1)
        return out.reshape(-1, HD + H)[: tg.n_node]
    k = functools.partial(kernel, mode=mode, precision=precision)
    edge_spec = pl.BlockSpec((1, G, ET), lambda fi, c, grp, cb: (c, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, NC),
        in_specs=[
            edge_spec, edge_spec,
            pl.BlockSpec((HD, C), lambda fi, c, grp, cb: (0, cb[c])),
            pl.BlockSpec((HD, H), lambda fi, c, grp, cb: (0, 0)),
            pl.BlockSpec((H, GR), lambda fi, c, grp, cb: (0, grp[c])),
            pl.BlockSpec((H, 1), lambda fi, c, grp, cb: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (HD + H, GR), lambda fi, c, grp, cb: (0, grp[c])),
    )
    out = pl.pallas_call(
        k, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((HD + H, tg.n_groups * GR),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * NC * G * ET * (C + 2 * R) * (HD + H),
            bytes_accessed=NC * C * HD * dt.itemsize,
            transcendentals=NC * G * ET * H,
        ),
    )(tg.chunk_grp, tg.chunk_cb, tg.src_local, tg.dst_local,
      hcat.T, w_a.astype(dt), ads.T, msrc.astype(jnp.float32).T)
    return out.T[: tg.n_node]


def main():
    t0 = time.time()
    rng = np.random.default_rng(7)
    s = rng.integers(0, N, E).astype(np.int32)
    r = rng.integers(0, N, E).astype(np.int32)
    hg = gta.build_host_graph(s, r, N, add_self_loops=False,
                              symmetric_norm=False)
    del s, r
    tg = tile_graph_grouped(hg, block_rows=R, block_cols=C, tile_edges=ET,
                            group=G, unit_weight=True)
    print(f"build+tile {time.time()-t0:.0f}s chunks={tg.n_chunks}",
          flush=True)
    x = jax.device_put(jax.random.normal(jax.random.key(0), (N, HD),
                                         jnp.bfloat16))
    w_a = jax.device_put(jax.random.normal(jax.random.key(5), (HD, H),
                                           jnp.bfloat16) * 0.1)
    a_d = jax.device_put(jax.random.normal(jax.random.key(6), (N, H),
                                           jnp.float32))
    msrc = jnp.zeros((1, H), jnp.float32)

    modes = ["full", "noexp", "noad", "nosoftmax", "spmm_like",
             "onehot_only"]
    if len(sys.argv) > 2:
        modes = sys.argv[2].split(",")
    warmed = False
    res = []
    for mode in modes:
        fn = lambda p, gg, xx: run(gg, xx, w_a, a_d, msrc, mode)
        if not warmed:
            time_layer_device(fn, None, tg, x, k_small=1, k_big=3, reps=1)
            warmed = True
        t = time_layer_device(fn, None, tg, x, k_small=1, k_big=5, reps=2)
        print(f"[{mode:12s}] {t*1e3:8.2f} ms  {hg.n_edge/t/1e9:.3f} Gedge/s",
              flush=True)
        res.append((mode, t * 1e3))
        gc.collect()
    print("\n== summary ==")
    base = dict(res)["full"]
    for mode, ms in res:
        print(f"{mode:12s} {ms:8.2f} ms  (delta vs full {base-ms:+7.2f})")


if __name__ == "__main__":
    main()
