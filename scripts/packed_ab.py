import sys; sys.path.insert(0, "/root/repo")
"""A/B: one packed [T, 3, ET] int32 DMA per tile vs three separate
src/dst/w streams in the SpMM kernel — probing how much of the measured
~314 ns/tile grid constant is DMA-issue overhead.

Usage: python scripts/packed_ab.py [flickr|reddit]
"""
import functools
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    HostGraph, tile_graph)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import dense as D
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import spmm as spmm_mod
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)


def _packed_kernel(rb_ref, cb_ref, pk_ref, x_ref, o_ref, *,
                   block_rows, block_cols, tile_edges, precision):
    t = pl.program_id(1)
    prev_rb = jnp.where(t == 0, -1, rb_ref[jnp.maximum(t - 1, 0)])

    @pl.when(rb_ref[t] != prev_rb)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    src = pk_ref[0, 0, :]
    dst = pk_ref[0, 1, :]
    w = pltpu.bitcast(pk_ref[0, 2:3, :], jnp.float32)[0]

    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_edges, block_cols), 1)
    g = (src[:, None] == cols).astype(x_ref.dtype)
    msg = jnp.dot(g, x_ref[:], preferred_element_type=jnp.float32,
                  precision=precision)
    msg = msg * w[:, None]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_edges, block_rows), 1)
    s = (dst[:, None] == rows).astype(x_ref.dtype)
    o_ref[:] += jax.lax.dot_general(
        s, msg.astype(x_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def spmm_packed(tg, packed, x, *, feat_block=512):
    f = x.shape[1]
    fb = min(feat_block, ((f + 127) // 128) * 128)
    f_pad = ((f + fb - 1) // fb) * fb
    n_cols = tg.n_col_blocks * tg.block_cols
    xp = jnp.zeros((n_cols, f_pad), x.dtype).at[: x.shape[0], :f].set(x)
    T = tg.n_tiles
    kernel = functools.partial(
        _packed_kernel, block_rows=tg.block_rows, block_cols=tg.block_cols,
        tile_edges=tg.tile_edges, precision=jax.lax.Precision.DEFAULT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(f_pad // fb, T),
        in_specs=[
            pl.BlockSpec((1, 3, tg.tile_edges), lambda fi, t, rb, cb: (t, 0, 0)),
            pl.BlockSpec((tg.block_cols, fb), lambda fi, t, rb, cb: (cb[t], fi)),
        ],
        out_specs=pl.BlockSpec(
            (tg.block_rows, fb), lambda fi, t, rb, cb: (rb[t], fi)),
    )
    y = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (tg.n_row_blocks * tg.block_rows, f_pad), jnp.float32),
    )(tg.tile_rb, tg.tile_cb, packed, xp)
    return y[: tg.n_node, :f]


name = sys.argv[1] if len(sys.argv) > 1 else "reddit"
F = 128
if name == "reddit":
    N = 232965
    z = np.load("/tmp/reddit_cache_114615892_l.npz")
    ne = int(z["ne"])
    s, r, w = z["s"][:ne], z["r"][:ne], z["w"][:ne]
else:
    import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        reorder_nodes)
    ds = gta.load_dataset(name)
    hg0, _ = reorder_nodes(ds.host_graph, "degree")
    N = hg0.n_node
    ne = hg0.n_edge
    s, r, w = hg0.senders[:ne], hg0.receivers[:ne], hg0.edge_weight[:ne]

cbn = int(np.ceil(N / 256))
key = (r // 256).astype(np.int64) * cbn + (s // 256)
bn = np.bincount(key, minlength=int(np.ceil(N / 256)) * cbn)
thr = D.spmm_dense_threshold(256, 256, fudge=0.5)
m = bn[key] < thr
st, rt, wt = s[m], r[m], w[m]
k = len(st)
ep = ((k + 127) // 128) * 128
tail = HostGraph(
    senders=np.concatenate([st, np.full(ep - k, N, np.int32)]),
    receivers=np.concatenate([rt, np.full(ep - k, N, np.int32)]),
    edge_mask=np.concatenate([np.ones(k, bool), np.zeros(ep - k, bool)]),
    edge_weight=np.concatenate([wt, np.zeros(ep - k, np.float32)]),
    n_node=N, n_edge=k)
print(f"{name} tail: {k} edges", flush=True)

x = jax.device_put(jax.random.normal(jax.random.key(0), (N, F),
                                     jnp.bfloat16))

geoms = ([(1024, 1024, 512), (1024, 256, 128), (1024, 512, 256)]
         if name == "reddit" else
         [(1024, 1024, 128), (1024, 1024, 256), (2048, 1024, 128)])
warm = False
for R, C, ET in geoms:
    tg = tile_graph(tail, block_rows=R, block_cols=C, tile_edges=ET)
    if tg.n_tiles > 65536:
        print(f"  {R}x{C}/{ET}: {tg.n_tiles} tiles > 1 call, skipping",
              flush=True)
        continue
    packed = jnp.stack(
        [tg.src_local, tg.dst_local,
         jax.lax.bitcast_convert_type(tg.weight, jnp.int32)], axis=1)
    base = lambda p, t, v: spmm_mod.spmm(t, v)
    pk = lambda p, t, v: spmm_packed(t[0], t[1], v)
    if not warm:
        time_layer_device(base, None, tg, x, k_small=1, k_big=8, reps=2)
        warm = True
    tb = time_layer_device(base, None, tg, x, k_small=1, k_big=8, reps=3)
    tp = time_layer_device(pk, None, (tg, packed), x, k_small=1, k_big=8,
                           reps=3)
    print(f"  {R}x{C}/{ET} tiles={tg.n_tiles}: base {tb*1e3:7.2f} ms | "
          f"packed {tp*1e3:7.2f} ms ({(tb-tp)/tb*100:+.0f}%)", flush=True)
