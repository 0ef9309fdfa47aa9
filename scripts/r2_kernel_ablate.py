import sys; sys.path.insert(0, "/root/repo")
"""Ablation timing of the GAT chain kernel's cost components on hardware.

Variants (same grid/tiles as the headline best config 512x1024x512):
  empty   — grid + DMA orchestration only (per-tile fixed overhead)
  onehot  — + both one-hot builds (VPU compare cost)
  pass1   — + the [ET,C]@[C,HD+H] gather matmul
  pass2   — + the [ET,R]@[R,H] a_dst gather
  noexp   — full kernel with exp -> identity (transcendental cost)
  full    — the real kernel
"""
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import tile_graph
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

R, C, ET = 512, 1024, 512
H, HD = 16, 16
SLOPE = 0.2

ds = gta.load_dataset("cora")
tg = tile_graph(ds.host_graph, block_rows=R, block_cols=C, tile_edges=ET,
                unit_weight=True)
print("tiles:", tg.n_tiles, flush=True)
n_cols = tg.n_col_blocks * C
n_rows = tg.n_row_blocks * R


def kernel(rb_ref, cb_ref, src_ref, dst_ref, hcat_ref, adst_ref, msrc_ref,
           o_ref, acc_ref, *, mode):
    t = pl.program_id(0)
    prev_rb = jnp.where(t == 0, -1, rb_ref[jnp.maximum(t - 1, 0)])

    @pl.when(rb_ref[t] != prev_rb)
    def _reset():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if mode == "empty":
        o_ref[:] = acc_ref[:, :HD]
        return
    src = src_ref[0, 0, :]
    dst = dst_ref[0, 0, :]
    dt = hcat_ref.dtype
    cols = jax.lax.broadcasted_iota(jnp.int32, (ET, C), 1)
    oh_src = (src[:, None] == cols).astype(dt)
    rows_er = jax.lax.broadcasted_iota(jnp.int32, (ET, R), 1)
    oh_dst = (dst[:, None] == rows_er).astype(dt)
    if mode == "onehot":
        acc_ref[:, :1] += (jnp.sum(oh_src.astype(jnp.float32))
                           + jnp.sum(oh_dst.astype(jnp.float32)))
        o_ref[:] = acc_ref[:, :HD]
        return
    g = jnp.dot(oh_src, hcat_ref[:], preferred_element_type=jnp.float32)
    hs, a_s = g[:, :HD], g[:, HD:]
    if mode == "pass1":
        acc_ref[:, :HD] += g[:R, :HD] + jnp.sum(oh_dst.astype(jnp.float32))
        o_ref[:] = acc_ref[:, :HD]
        return
    a_d = jnp.dot(oh_dst, adst_ref[:], preferred_element_type=jnp.float32)
    if mode == "pass2":
        acc_ref[:, HD:] += a_d[:R, :]
        acc_ref[:, :HD] += g[:R, :HD]
        o_ref[:] = acc_ref[:, :HD]
        return

    def leaky(v):
        return jnp.where(v >= 0, v, SLOPE * v)

    e = leaky(a_s + a_d)
    bound = leaky(msrc_ref[0, :][None, :] + a_d)
    dmat = jax.lax.broadcast_in_dim(dst, (ET, H), (0,))
    if mode == "noexp":
        p = jnp.where(dmat < R, jnp.minimum(e - bound, 60.0), 0.0)
    else:
        p = jnp.where(dmat < R, jnp.exp(jnp.minimum(e - bound, 60.0)), 0.0)
    brow = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 0)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 1) // (HD // H)
    B = (brow == bcol).astype(jnp.float32)
    p_full = jnp.dot(p, B, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    v = jnp.concatenate([p_full * hs, p], axis=1).astype(dt)
    acc_ref[:] += jax.lax.dot_general(
        oh_dst, v, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    T = pl.num_programs(0)
    next_rb = jnp.where(t == T - 1, -1, rb_ref[jnp.minimum(t + 1, T - 1)])

    @pl.when(next_rb != rb_ref[t])
    def _pub():
        den_full = jnp.dot(jnp.maximum(acc_ref[:, HD:], 1e-20), B,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        o_ref[:] = acc_ref[:, :HD] / den_full


def build(mode):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tg.n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda t, rb, cb: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET), lambda t, rb, cb: (t, 0, 0)),
            pl.BlockSpec((C, HD + H), lambda t, rb, cb: (cb[t], 0)),
            pl.BlockSpec((R, H), lambda t, rb, cb: (rb[t], 0)),
            pl.BlockSpec((1, H), lambda t, rb, cb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, HD), lambda t, rb, cb: (rb[t], 0)),
        scratch_shapes=[pltpu.VMEM((R, HD + H), jnp.float32)],
    )

    def f(params, g_unused, x):
        hcat = jnp.zeros((n_cols, HD + H), jnp.bfloat16)
        hcat = hcat.at[: x.shape[0]].set(x[:, : HD + H].astype(jnp.bfloat16))
        ads = jnp.zeros((n_rows, H), jnp.float32).at[: x.shape[0]].set(
            x[:, :H].astype(jnp.float32))
        msrc = jnp.max(ads, axis=0, keepdims=True)
        out = pl.pallas_call(
            functools.partial(kernel, mode=mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, HD), jnp.float32),
        )(tg.tile_rb, tg.tile_cb,
          tg.src_local[:, None, :], tg.dst_local[:, None, :], hcat, ads, msrc)
        return out[: x.shape[0]]

    return f


x = jax.device_put(jax.random.normal(
    jax.random.key(1), (ds.host_graph.n_node, HD + H), jnp.float32))
for mode in ("empty", "onehot", "pass1", "pass2", "noexp", "full"):
    fn = build(mode)
    lat = time_layer_device(fn, None, None, x, k_small=50, k_big=550, reps=2)
    print(f"{mode:8s}: {lat*1e6:7.1f} us  ({lat*1e6/tg.n_tiles:.2f} us/tile)",
          flush=True)
