import sys; sys.path.insert(0, "/root/repo")
"""Ablate the grouped SpMM kernel at tail density to attribute time:
full kernel vs no-weight vs gather-only vs scatter-only.  Semantics of the
ablated variants are WRONG on purpose — they only time the halves.

Usage: python scripts/grouped_ablate.py [E]
"""
import functools

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
E = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
F = 128

rng = np.random.default_rng(7)
s = rng.integers(0, N, E).astype(np.int32)
r = rng.integers(0, N, E).astype(np.int32)
hg = gta.build_host_graph(s, r, N, add_self_loops=False, symmetric_norm=False)
tg = tile_graph_grouped(hg, block_rows=512, block_cols=512, tile_edges=128,
                        group=16)
print(f"tiles={tg.n_tiles} chunks={tg.n_chunks} util={hg.n_edge/tg.total_slots:.2f}",
      flush=True)

x = jax.device_put(jax.random.normal(jax.random.key(0), (N, F), jnp.bfloat16))


def make_kernel(mode):
    def kern(grp_ref, cb_ref, src_ref, dst_ref, w_ref, x_ref, o_ref):
        G, ET, R, C = tg.group, tg.tile_edges, tg.block_rows, tg.block_cols
        c = pl.program_id(1)
        prev_grp = jnp.where(c == 0, -1, grp_ref[jnp.maximum(c - 1, 0)])

        @pl.when(grp_ref[c] != prev_grp)
        def _zero():
            o_ref[:] = jnp.zeros_like(o_ref)

        fb = o_ref.shape[1]
        xb = x_ref[:]
        src = src_ref[0]
        dst = dst_ref[0]
        w = w_ref[0]
        if mode == "scatter_only":
            msg = jnp.broadcast_to(xb[:1], (G * ET, fb)).astype(jnp.float32)
        else:
            cols = jax.lax.broadcasted_iota(jnp.int32, (G, ET, C), 2)
            g = (src[..., None] == cols).astype(xb.dtype).reshape(G * ET, C)
            msg = jnp.dot(g, xb, preferred_element_type=jnp.float32)
        if mode in ("full",):
            msg = msg.reshape(G, ET, fb) * w[..., None]
        else:
            msg = msg.reshape(G, ET, fb)
        if mode == "gather_only":
            o_ref[:] += jnp.sum(msg) * jnp.ones_like(o_ref)
        else:
            rows = jax.lax.broadcasted_iota(jnp.int32, (G, ET, R), 2)
            sm = (dst[..., None] == rows).astype(xb.dtype)
            out = jax.lax.dot_general(
                sm, msg.astype(xb.dtype), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[:] += out.reshape(G * R, fb)
    return kern


def run(mode):
    G, ET, R, C = tg.group, tg.tile_edges, tg.block_rows, tg.block_cols
    GR = G * R
    NC = tg.n_chunks
    fb = 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, NC),
        in_specs=[
            pl.BlockSpec((1, G, ET), lambda fi, c, grp, cb: (c, 0, 0)),
            pl.BlockSpec((1, G, ET), lambda fi, c, grp, cb: (c, 0, 0)),
            pl.BlockSpec((1, G, ET), lambda fi, c, grp, cb: (c, 0, 0)),
            pl.BlockSpec((C, fb), lambda fi, c, grp, cb: (cb[c], fi)),
        ],
        out_specs=pl.BlockSpec((GR, fb), lambda fi, c, grp, cb: (grp[c], fi)),
    )
    n_cols = tg.n_col_blocks * C
    xp = jnp.zeros((n_cols, fb), x.dtype).at[:N].set(x)
    xp = jax.device_put(xp)

    def fn(p, tgg, xpp):
        return pl.pallas_call(
            make_kernel(mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tg.n_groups * GR, fb),
                                           jnp.float32),
        )(tgg.chunk_grp, tgg.chunk_cb, tgg.src_local, tgg.dst_local,
          tgg.weight, xpp)

    t = time_layer_device(fn, None, tg, xp, k_small=1, k_big=5, reps=2)
    print(f"{mode:14s} {t*1e3:8.2f} ms  {hg.n_edge/t/1e9:.3f} Gedge/s",
          flush=True)
    return t


run("full")          # discarded warmup
run("full")
run("no_weight")
run("scatter_only")
run("gather_only")
