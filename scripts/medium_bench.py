import sys; sys.path.insert(0, "/root/repo")
"""Medium-dataset benchmarks: Pubmed (88.6k edges) and Flickr (900k edges)
at their published dims (SURVEY §2 C2 dataset table / data.DATASET_STATS),
same hybrid density-split path as the Reddit bench.

These sit between the Cora fixed-cost regime and the Reddit
bandwidth regime; numbers published in results/SUMMARY.md.

Usage: python scripts/medium_bench.py [dataset ...]   (default: pubmed flickr)
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    block_nnz, hybrid_graph, reorder_nodes)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import dense as D
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import spmm as spmm_mod
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import _gat_forward
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

F, H, HD = 128, 4, 128
RB = CB = 256
names = [a for a in sys.argv[1:] if not a.startswith("--")] or [
    "pubmed", "flickr"]
# --community: same dims but with planted community structure (Reddit-like
# ~233-node communities) and the LABEL-FREE cluster reorder — the regime
# real medium graphs live in, vs the default uniform power-law worst case
COMMUNITY = "--community" in sys.argv
# --classes: per-run capacity classes for the sparse tail
# (graph.tile_graph_classes) instead of one tile_edges
CLASSES = (64, 128, 256, 512, 1024) if "--classes" in sys.argv else None
# --grouped: stripe-group chunked tail for SpMM — EXPERIMENTAL here and
# measured WORSE on these graphs (flickr 6.3 -> 10.9 ms: medium tails
# have ~17-25-edge runs at 512^2, so ET128 grouped tiles sit at ~13%
# utilisation; the grouped format's domain is Reddit-class tails with
# ~100-edge runs).  The default model-chosen per-tile path stays the
# production config.  --grouped-gat additionally routes the GAT tail
# (G16 VMEM-bound at HD=128/H=4 — use G8)
GROUPED = "--grouped" in sys.argv
GROUPED_GAT = "--grouped-gat" in sys.argv

warmed = False
for name in names:
    if COMMUNITY:
        from gta_graph_tensor_acclelrator_for_general_gnn_tpu.data.datasets import (
            DATASET_STATS, synthetic_coo)
        N0, E0 = DATASET_STATS[name][:2]
        s, r, _ = synthetic_coo(N0, E0, seed=1,
                                communities=max(N0 // 233, 8), p_in=0.7)
        hg0 = gta.build_host_graph(s, r, N0, add_self_loops=True,
                                   symmetric_norm=True)
        t0 = time.time()
        hg, _ = reorder_nodes(hg0, "cluster")
        print(f"{name}-community: LPA+reorder {time.time()-t0:.1f}s",
              flush=True)
    else:
        ds = gta.load_dataset(name)
        hg, _ = reorder_nodes(ds.host_graph, "degree")
    N = hg.n_node
    print(f"{name}{'-community' if COMMUNITY else ''}: N={N} E={hg.n_edge}",
          flush=True)

    bn = block_nnz(hg, RB, CB).reshape(-1)
    cbn = int(np.ceil(N / CB))

    def best_et(thr_, tr, tc):
        m = bn[((hg.receivers[: hg.n_edge] // RB).astype(np.int64) * cbn
                + hg.senders[: hg.n_edge] // CB)] < thr_
        tcn = int(np.ceil(N / tc))
        key = ((hg.receivers[: hg.n_edge][m] // tr).astype(np.int64) * tcn
               + hg.senders[: hg.n_edge][m] // tc)
        nnz = np.bincount(key); nnz = nnz[nnz > 0]
        if not len(nnz):
            return 512
        # measured v5e cost model (per-run panel DMA + ~314ns grid const);
        # flickr tail ET 256 -> 128 measured -25%
        from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
            best_tile_capacity)
        return best_tile_capacity(nnz, tr, tc)

    x = jax.device_put(jax.random.normal(jax.random.key(0), (N, F),
                                         jnp.bfloat16))

    # --- SpMM: int8 dense blocks + model-chosen tail geometry ---
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        tile_time_model_ns)
    thr = D.spmm_dense_threshold(RB, CB, fudge=0.5)

    def tail_nnz(thr_, tr, tc):
        m = bn[((hg.receivers[: hg.n_edge] // RB).astype(np.int64) * cbn
                + hg.senders[: hg.n_edge] // CB)] < thr_
        tcn = int(np.ceil(N / tc))
        key = ((hg.receivers[: hg.n_edge][m] // tr).astype(np.int64) * tcn
               + hg.senders[: hg.n_edge][m] // tc)
        nnz = np.bincount(key)
        return nnz[nnz > 0]

    best = None
    for (tr, tc) in ((1024, 1024), (2048, 1024), (1024, 512), (2048, 512)):
        nnz = tail_nnz(thr, tr, tc)
        if not len(nnz):
            tr, tc, et = 1024, 1024, 512
            best = (0, tr, tc, et)
            break
        et = best_et(thr, tr, tc)
        t = tile_time_model_ns(nnz, et, tr, tc)
        if best is None or t < best[0]:
            best = (t, tr, tc, et)
    _, SR, SC, ET = best
    if GROUPED:
        SR = SC = 512
        ET = 128
    print(f"  spmm tail geometry {SR}x{SC}/ET{ET}"
          f"{' grouped/G16' if GROUPED else ''} "
          f"(model {best[0]/1e6:.2f} ms)", flush=True)
    hyb = hybrid_graph(hg, block_rows=RB, block_cols=CB, tile_edges=ET,
                       min_nnz=thr, supergroup=16, values_dtype=np.int8,
                       sparse_block_rows=SR, sparse_block_cols=SC,
                       tile_classes=CLASSES,
                       tail_format="grouped" if GROUPED else "tiles",
                       tail_group=16)
    nb = hyb.dense.n_blocks if hyb.dense else 0
    deg_in = np.bincount(hg.receivers[: hg.n_edge], minlength=N)
    deg_out = np.bincount(hg.senders[: hg.n_edge], minlength=N)
    rs = jax.device_put(jnp.asarray(1 / np.sqrt(np.maximum(deg_in, 1)),
                                    jnp.float32))
    cs = jax.device_put(jnp.asarray(1 / np.sqrt(np.maximum(deg_out, 1)),
                                    jnp.float32))
    print(f"  spmm split thr={thr}: dense {hyb.n_dense_edges} in {nb} "
          f"blocks, sparse {hyb.n_sparse_edges} in {hyb.tiles.n_tiles} "
          f"tiles (ET={ET})", flush=True)

    def spmm_fn(p, gg, xx):
        bg, tg, (r_, c_) = gg
        y = spmm_mod.spmm(tg, xx)
        if bg is not None:
            yd = D.spmm_dense(bg, xx, row_scale=r_, col_scale=c_)
            y = y + yd[: y.shape[0]]
        return y[:N]

    gg = (hyb.dense, hyb.tiles, (rs, cs))
    kb = max(60, min(2100, int(2e9 / max(hg.n_edge, 1))))
    if not warmed:   # first slope measurement in a process reads high
        time_layer_device(spmm_fn, None, gg, x, k_small=5, k_big=kb // 4,
                          reps=2)
        warmed = True
    t = time_layer_device(spmm_fn, None, gg, x, k_small=5, k_big=kb, reps=3)
    print(f"  SPMM hybrid F={F}: {t*1e6:.1f} us  "
          f"{hg.n_edge/t/1e9:.3f} Gedge/s", flush=True)

    # --- GAT attention: transposed dense 'cr' + model-chosen derive tail
    # (same ranking model as SpMM: flickr tail measured 512x1024/ET256
    # 19.9ms vs 2048x1024/ET128 10.9ms — scripts/gat_tail_sweep2) ---
    thr_g = D.gat_dense_threshold_t(RB, CB, H, HD // H)
    best_g = None
    for (tr, tc) in ((512, 1024), (1024, 1024), (2048, 1024)):
        nnz = tail_nnz(thr_g, tr, tc)
        if not len(nnz):
            best_g = (0, 512, 1024, 256)
            break
        et = best_et(thr_g, tr, tc)
        t = tile_time_model_ns(nnz, et, tr, tc)
        if best_g is None or t < best_g[0]:
            best_g = (t, tr, tc, et)
    _, GR, GC, ET_g = best_g
    if GROUPED_GAT:
        # r5 measured winner at flickr (calibrated, scripts → SUMMARY):
        # grouped-T G4 over 1024x2048/ET128 with thr 128 — 7.38 ms /
        # 0.134 Gedge/s vs the per-tile best 14.1 ms
        GR, GC, ET_g = 1024, 2048, 128
        thr_g = 128
    print(f"  gat tail geometry {GR}x{GC}/ET{ET_g}"
          f"{' grouped/G4' if GROUPED_GAT else ''}", flush=True)
    hyb_g = hybrid_graph(hg, block_rows=RB, block_cols=CB, tile_edges=ET_g,
                         min_nnz=thr_g, unit_weight=True, block_layout="cr",
                         values_dtype=np.int8,
                         sparse_block_rows=GR, sparse_block_cols=GC,
                         tail_format="grouped" if GROUPED_GAT else "tiles",
                         tail_group=4,
                         # transposed dataflow: edge axis rides the 128-lane
                         # dim, so capacities must be %128
                         tile_classes=(tuple(c for c in CLASSES if c % 128 == 0)
                                       if CLASSES else None))
    nbg = hyb_g.dense.n_blocks if hyb_g.dense else 0
    print(f"  gat split thr={thr_g}: dense {hyb_g.n_dense_edges} in {nbg} "
          f"blocks, sparse {hyb_g.n_sparse_edges} in "
          f"{hyb_g.tiles.n_tiles} tiles (ET={ET_g})", flush=True)
    w_a = jax.device_put(jax.random.normal(jax.random.key(5), (HD, H),
                                           jnp.bfloat16) * 0.1)
    a_d = jax.device_put(jax.random.normal(jax.random.key(6), (N, H),
                                           jnp.float32))

    def gat_fn(p, gg, xx):
        bg, tg, wv = gg
        a_s = jnp.dot(xx, wv, preferred_element_type=jnp.float32)
        msrc = jnp.max(a_s, axis=0, keepdims=True)
        acc = _gat_forward(tg, xx, None, a_d.astype(jnp.bfloat16),
                           w_asrc=wv, normalize=False, msrc=msrc,
                           dataflow=None if GROUPED_GAT else
                           "transposed_derive")
        if bg is not None:
            accd = D.gat_dense_partial(bg, xx, a_s, a_d, msrc)
            acc = acc + accd[: acc.shape[0]]
        num, den = acc[:, :HD], acc[:, HD:]
        return num / jnp.repeat(jnp.maximum(den, 1e-20), HD // H, axis=1)

    gg = (hyb_g.dense, hyb_g.tiles, w_a)
    t = time_layer_device(gat_fn, None, gg, x, k_small=5, k_big=kb, reps=3)
    print(f"  GAT hybrid H{H} HD{HD}: {t*1e6:.1f} us  "
          f"{hg.n_edge/t/1e9:.3f} Gedge/s", flush=True)
