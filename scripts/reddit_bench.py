import sys; sys.path.insert(0, "/root/repo")
"""Reddit-scale SpMM/GAT benchmark (full 114.6M edges — the reference's
Reddit dims, genGraphOP.py:196-199).

Round-2 path: degree reorder + density-split execution — dense adjacency
blocks (bf16 MXU matmuls, supertiled for x-panel reuse) + one-hot edge
tiles for the sparse tail.  Compare against the round-1 streaming scan.

Usage: python scripts/reddit_bench.py [n_edges] [--stream]
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.data.datasets import synthetic_coo
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    hybrid_graph, reorder_nodes, tile_graph)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import dense as D
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import spmm as spmm_mod
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

N = 232965
_VALUE_FLAGS = {"--rb", "--thr-g", "--et", "--df"}   # flags that consume the next token
_pos, _skip = [], False
for _a in sys.argv[1:]:
    if _skip:
        _skip = False
        continue
    if _a in _VALUE_FLAGS:
        _skip = True
        continue
    if not _a.startswith("--"):
        _pos.append(_a)
E = int(_pos[0]) if _pos else 114_615_892
DO_STREAM = "--stream" in sys.argv
UNIFORM = "--uniform" in sys.argv   # adversarial no-locality variant
CLUSTER = "--cluster" in sys.argv   # label-FREE reorder (LPA discovers the
                                    # communities; the real-graph pipeline)
F = 128

t0 = time.time()
_cache = (f"/tmp/reddit_cache_{E}_"
          f"{'u' if UNIFORM else ('l' if CLUSTER else 'c')}.npz")
if os.path.exists(_cache) and "--no-cache" not in sys.argv:
    z = np.load(_cache)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import HostGraph
    hg = HostGraph(senders=z["s"], receivers=z["r"], edge_mask=z["m"],
                   edge_weight=z["w"], n_node=N, n_edge=int(z["ne"]))
    print(f"cache load {time.time()-t0:.0f}s E={hg.n_edge}", flush=True)
else:
    if UNIFORM:
        s, r = synthetic_coo(N, E, seed=1)
        labels = None
    else:
        # clustered graph (Reddit-like assortativity); labels stand in for
        # the metis/louvain pass a production pipeline runs on real data
        s, r, labels = synthetic_coo(N, E, seed=1, communities=1000, p_in=0.7)
    hg = gta.build_host_graph(s, r, N, add_self_loops=True,
                              symmetric_norm=True)
    del s, r
    print(f"build {time.time()-t0:.0f}s E={hg.n_edge} "
          f"({'uniform' if UNIFORM else 'community'})", flush=True)
    t0 = time.time()
    if CLUSTER:
        # label-free path: LPA discovers the communities from the edges
        from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
            cluster_labels)
        found = cluster_labels(hg)
        print(f"LPA clustering {time.time()-t0:.0f}s "
              f"k={int(found.max())+1}", flush=True)
        t0 = time.time()
        hg, perm = reorder_nodes(hg, "hubs+labels", labels=found)
    elif labels is None:
        hg, perm = reorder_nodes(hg, "degree")
    else:
        hg, perm = reorder_nodes(hg, "hubs+labels", labels=labels)
    print(f"reorder {time.time()-t0:.0f}s", flush=True)
    np.savez(_cache, s=hg.senders, r=hg.receivers, m=hg.edge_mask,
             w=hg.edge_weight, ne=hg.n_edge)

# --- hybrid split: dense blocks >= FLOP-balance threshold ---------------
# adaptive: raise the threshold until the dense value matrices fit the
# HBM budget.  Default dense store: int8 edge counts + separable degree
# scaling (halves A traffic vs bf16; the dense part is DMA-bound).
INT8 = "--bf16-dense" not in sys.argv


def _flag(name, default):
    return (int(sys.argv[sys.argv.index(name) + 1])
            if name in sys.argv else default)


# dense grid: the per-grid-step fixed cost (~400ns measured) dominates the
# 256-grid dense part; --rb 512 amortises it over 4x block area (int8
# makes the extra covered area affordable)
RB = CB = _flag("--rb", 256)
DENSE_BUDGET = 5 << 30
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import block_nnz
bn = block_nnz(hg, RB, CB).reshape(-1)
bn_sorted = np.sort(bn)[::-1]
VB = 1 if INT8 else 2                   # bytes per dense A entry
max_blocks = DENSE_BUDGET // (RB * CB * VB)
# int8 halves the dense byte cost per block -> the bandwidth-balance
# threshold halves with it (fudge 0.5)
thr = max(D.spmm_dense_threshold(RB, CB, fudge=0.5 if INT8 else 1.0),
          int(bn_sorted[max_blocks - 1]) + 1 if len(bn_sorted) > max_blocks
          else 0)
cbn256 = int(np.ceil(N / CB))


def tail_edge_ids(thr_):
    """host mask of edges whose 256-grid block is below thr_ (the tail)."""
    key = ((hg.receivers[: hg.n_edge] // RB).astype(np.int64) * cbn256
           + hg.senders[: hg.n_edge] // CB)
    return bn[key] < thr_


def best_tile_edges(thr_, tr, tc):
    """Tail tile capacity minimising the measured v5e cost model
    (graph.tile_time_model_ns: per-run panel DMA + ~314ns grid const +
    chunk penalty past 65536 tiles)."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        best_tile_capacity)
    m = tail_edge_ids(thr_)
    tcn = int(np.ceil(N / tc))
    key = ((hg.receivers[: hg.n_edge][m] // tr).astype(np.int64) * tcn
           + hg.senders[: hg.n_edge][m] // tc)
    nnz = np.bincount(key)
    nnz = nnz[nnz > 0]
    if not len(nnz):
        return 512
    return best_tile_capacity(nnz, tr, tc)


tail_e = int(bn[bn < thr].sum())
GROUPED = "--grouped" in sys.argv   # round-3 stripe-group chunked tail
t0 = time.time()
if GROUPED:
    ET = 128
    hyb = hybrid_graph(hg, block_rows=RB, block_cols=CB, tile_edges=ET,
                       min_nnz=thr, supergroup=16,
                       values_dtype=np.int8 if INT8 else ml_dtypes.bfloat16,
                       sparse_block_rows=512, sparse_block_cols=512,
                       tail_format="grouped", tail_group=16)
else:
    ET = best_tile_edges(thr, 1024, 1024)
    hyb = hybrid_graph(hg, block_rows=RB, block_cols=CB, tile_edges=ET,
                       min_nnz=thr, supergroup=16,
                       values_dtype=np.int8 if INT8 else ml_dtypes.bfloat16,
                       sparse_block_rows=1024, sparse_block_cols=1024)
nb = hyb.dense.n_blocks if hyb.dense else 0
print(f"hybrid split {time.time()-t0:.0f}s thr={thr}: "
      f"dense {hyb.n_dense_edges} edges in {nb} blocks "
      f"({nb*RB*CB*VB/2**30:.2f} GiB {'int8' if INT8 else 'bf16'}), "
      f"sparse {hyb.n_sparse_edges} in {hyb.tiles.n_tiles} tiles "
      f"(ET={ET} util {hyb.n_sparse_edges/max(hyb.tiles.n_tiles*ET,1):.2f})",
      flush=True)

x = jax.device_put(jax.random.normal(jax.random.key(0), (N, F), jnp.bfloat16))

# separable symmetric-norm factors for the int8 count blocks (the tail
# tiles carry the full per-edge weights either way)
if INT8:
    deg_in = np.bincount(hg.receivers[: hg.n_edge], minlength=N)
    deg_out = np.bincount(hg.senders[: hg.n_edge], minlength=N)
    rs = jax.device_put(jnp.asarray(
        1.0 / np.sqrt(np.maximum(deg_in, 1)), jnp.float32))
    cs = jax.device_put(jnp.asarray(
        1.0 / np.sqrt(np.maximum(deg_out, 1)), jnp.float32))
else:
    rs = cs = None

# the tile/dense arrays are GBs: they MUST be jit ARGUMENTS (a closure
# would embed them as HLO constants — multi-GB lowering, compile never
# finishes; bisected from the round-1 "full Reddit crashes" bug)
def _dense_part(bg, xx, scales):
    r_, c_ = scales
    return D.spmm_dense(bg, xx, row_scale=r_, col_scale=c_)

def hybrid_fn(p, gg, xx):
    bg, tg, scales = gg
    y = spmm_mod.spmm(tg, xx)
    if bg is not None:
        yd = _dense_part(bg, xx, scales)
        y = y + yd[: y.shape[0]]
    return y[:N]

gg = (hyb.dense, hyb.tiles, (rs, cs))
t = time_layer_device(hybrid_fn, None, gg, x, k_small=1, k_big=7, reps=2)
print(f"HYBRID spmm F={F} bf16: {t*1e3:.1f} ms  "
      f"{hg.n_edge/t/1e9:.3f} Gedge/s", flush=True)

# dense-only and sparse-only components (same data) for the breakdown
if hyb.dense is not None:
    td = time_layer_device(
        lambda p, gg, xx: _dense_part(gg[0], xx, gg[2])[:N],
        None, gg, x, k_small=1, k_big=7, reps=2)
    print(f"  dense part:  {td*1e3:.1f} ms  "
          f"{hyb.n_dense_edges/td/1e9:.3f} Gedge/s", flush=True)
ts = time_layer_device(lambda p, gg, xx: spmm_mod.spmm(gg[1], xx)[:N],
                       None, gg, x, k_small=1, k_big=7, reps=2)
print(f"  sparse part: {ts*1e3:.1f} ms  "
      f"{hyb.n_sparse_edges/ts/1e9:.3f} Gedge/s", flush=True)

if DO_STREAM:
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import chunked
    g = hg.to_device()
    t2 = time_layer_device(
        lambda p, gg, xx: chunked.spmm_chunked(gg, xx, chunk=1 << 20),
        None, g, x, k_small=1, k_big=5, reps=2)
    print(f"STREAM spmm: {t2*1e3:.1f} ms  {hg.n_edge/t2/1e9:.3f} Gedge/s",
          flush=True)

# --- SDDMM at full scale (--sddmm): hybrid per-edge logits ----------------
if "--sddmm" in sys.argv:
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import sddmm as sddmm_mod
    # dense blocks: SDDMM-as-GEMM (all R*C pair dots, bg.values is the
    # sampling mask); tail: one-hot gather-pair tiles.  Reuses the spmm
    # hybrid split (same FLOP balance).
    xs = jax.device_put(jax.random.normal(jax.random.key(7), (N, F),
                                          jnp.bfloat16))

    def sddmm_fn(p, gg, xx):
        bg, tg = gg
        e_tail = sddmm_mod.sddmm(tg, xx, p, heads=1)      # [1, T, ET]
        # scalar reduction keeps the logits live (anti-DCE) at negligible cost
        out = e_tail.sum().astype(xx.dtype)
        if bg is not None:
            e_blk = D.sddmm_dense_blocks(bg, xx, p)       # [B, R, C]
            out = out + e_blk.sum().astype(xx.dtype)
        return xx + out * 1e-9

    gg = (hyb.dense, hyb.tiles)
    ts_ = time_layer_device(sddmm_fn, xs, gg, x, k_small=1, k_big=4, reps=2)
    print(f"HYBRID sddmm F{F}: {ts_*1e3:.1f} ms  "
          f"{hg.n_edge/ts_/1e9:.3f} Gedge/s", flush=True)

# --- GAT attention at full scale (--gat): hybrid dense-mask + edge tiles --
if "--gat" in sys.argv:
    del hyb, gg
    H, HD = 4, 128
    # transposed dense kernel (values_layout 'cr'): per-head matmuls
    # stream D sublanes, so the FLOP-balance threshold drops and the
    # dense fraction grows
    # --thr-g N overrides the FLOP-balance threshold: measured r2/r3 rates
    # (dense ~0.41 us/block at 256^2 int8 'cr', tail ~6 ns/edge) put the
    # real breakeven near 70 nnz/block, ~10x below the FLOP model — the
    # tail tiles run at ~7x less useful FLOP/s than the model assumes
    thr_g = _flag("--thr-g", 0) or D.gat_dense_threshold_t(RB, CB, H, HD // H)
    # memory: reuse budget; attention needs rb-major dense order
    thr_g = max(thr_g,
                int(bn_sorted[max_blocks - 1]) + 1
                if len(bn_sorted) > max_blocks else 0)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import (
        _gat_forward)

    # a_src is derived IN-KERNEL from w (width-128 repack: the pass-1
    # gather stays one lane chunk); a_dst stays a value input
    w_a = jax.device_put(jax.random.normal(jax.random.key(5), (HD, H),
                                           jnp.bfloat16) * 0.1)
    a_d = jax.device_put(jax.random.normal(jax.random.key(6), (N, H),
                                           jnp.float32))

    # tail geometry: 512x1024/ET256 won the round-2 fine sweep; the round-3
    # panel-DMA/grid-const refit (graph.tile_time_model_ns) moved flickr's
    # GAT tail to 2048x1024/ET128 (-45%), so the sweep now probes tall
    geos = ([(512, 1024), (1024, 1024), (2048, 1024)]
            if "--geo-sweep" in sys.argv else [(512, 1024)])
    # tail dataflow (measured best: transposed_derive, scripts/gat_tail_ab)
    DF = (sys.argv[sys.argv.index("--df") + 1] if "--df" in sys.argv
          else "transposed_derive")
    ET_FORCE = _flag("--et", 0)
    # r4: the TRANSPOSED grouped GAT chain kernel (interleaved-repeat head
    # expansion) is the production tail — measured ~2x the per-tile
    # transposed_derive at tail density (scripts/gat_chain_ablate.py v3 +
    # gat_grouped_ab).  --per-tile-gat keeps the old path for A/B.
    GROUPED_GAT = "--per-tile-gat" not in sys.argv
    if GROUPED_GAT:
        geos = [(512, 512)]
        # measured-rate dense/tail breakeven: dense 'cr' int8 ~0.41us per
        # 256^2 block vs grouped-T tail ~3.3 ns/edge -> ~125 nnz/block
        # (the FLOP-model threshold is ~10x higher because it assumes the
        # tail runs at full useful-FLOP rate)
        thr_g = _flag("--thr-g", 0) or 128
        thr_g = max(thr_g,
                    int(bn_sorted[max_blocks - 1]) + 1
                    if len(bn_sorted) > max_blocks else 0)
    for TRr, TCc in geos:
        ET_g = (128 if GROUPED_GAT
                else (ET_FORCE or best_tile_edges(thr_g, TRr, TCc)))
        t0 = time.time()
        hyb_g = hybrid_graph(
            hg, block_rows=RB, block_cols=CB, tile_edges=ET_g,
            min_nnz=thr_g, unit_weight=True, block_layout="cr",
            values_dtype=np.int8 if INT8 else ml_dtypes.bfloat16,
            sparse_block_rows=TRr, sparse_block_cols=TCc,
            tail_format="grouped" if GROUPED_GAT else "tiles",
            tail_group=16 if GROUPED_GAT else 8)
        nbg = hyb_g.dense.n_blocks if hyb_g.dense else 0
        print(f"gat split {time.time()-t0:.0f}s thr={thr_g} "
              f"tail {TRr}x{TCc}/ET{ET_g}: dense {hyb_g.n_dense_edges} in "
              f"{nbg} blocks, sparse {hyb_g.n_sparse_edges} in "
              f"{hyb_g.tiles.n_tiles} tiles", flush=True)

        def gat_fn(p, gg, xx):
            bg, tg, wv = gg
            a_s = jnp.dot(xx, wv, preferred_element_type=jnp.float32)
            msrc = jnp.max(a_s, axis=0, keepdims=True)
            acc = _gat_forward(tg, xx, None, a_d.astype(jnp.bfloat16),
                               w_asrc=wv, normalize=False, msrc=msrc,
                               dataflow=None if GROUPED_GAT else DF)
            if bg is not None:
                accd = D.gat_dense_partial(bg, xx, a_s, a_d, msrc)
                acc = acc + accd[: acc.shape[0]]
            num, den = acc[:, :HD], acc[:, HD:]
            return num / jnp.repeat(jnp.maximum(den, 1e-20), HD // H, axis=1)

        gg = (hyb_g.dense, hyb_g.tiles, w_a)
        tg_ = time_layer_device(gat_fn, None, gg, x, k_small=1, k_big=5,
                                reps=2)
        print(f"HYBRID gat H{H} HD{HD} tail {TRr}x{TCc}: {tg_*1e3:.1f} ms  "
              f"{hg.n_edge/tg_/1e9:.3f} Gedge/s", flush=True)

        def gat_tail_fn(p, gg, xx):
            bg, tg, wv = gg
            a_s = jnp.dot(xx, wv, preferred_element_type=jnp.float32)
            msrc = jnp.max(a_s, axis=0, keepdims=True)
            return _gat_forward(tg, xx, None, a_d.astype(jnp.bfloat16),
                                w_asrc=wv, normalize=False, msrc=msrc,
                                dataflow=None if GROUPED_GAT else DF)

        tt_ = time_layer_device(gat_tail_fn, None, gg, x, k_small=1,
                                k_big=5, reps=2)
        if hyb_g.dense is not None:
            def gat_dense_fn(p, gg, xx):
                bg, tg, wv = gg
                a_s = jnp.dot(xx, wv, preferred_element_type=jnp.float32)
                msrc = jnp.max(a_s, axis=0, keepdims=True)
                return D.gat_dense_partial(bg, xx, a_s, a_d, msrc)
            td_ = time_layer_device(gat_dense_fn, None, gg, x, k_small=1,
                                    k_big=5, reps=2)
            print(f"  gat dense part: {td_*1e3:.1f} ms  "
                  f"{hyb_g.n_dense_edges/td_/1e9:.3f} Gedge/s", flush=True)
        print(f"  gat tail part:  {tt_*1e3:.1f} ms  "
              f"{hyb_g.n_sparse_edges/tt_/1e9:.3f} Gedge/s", flush=True)
        del hyb_g, gg
