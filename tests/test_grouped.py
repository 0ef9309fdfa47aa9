"""GroupedTiledGraph tiler + grouped SpMM kernel + latency-model tests
(round-3 sparse-tail redesign and compile-only pick, VERDICT r2 next-1/2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    GroupedTiledGraph, tile_graph_grouped)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
    primitives as P, spmm as spmm_mod)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
    latency as L, schedule as S)


def _rand_graph(rng, n=700, e=5000, **kw):
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    return gta.build_host_graph(s, r, n, **kw)


def test_grouped_tiler_invariants(rng):
    hg = _rand_graph(rng, add_self_loops=True, symmetric_norm=True)
    tg = tile_graph_grouped(hg, block_rows=128, block_cols=256,
                            tile_edges=64, group=4)
    assert isinstance(tg, GroupedTiledGraph)
    # chunks sorted by stripe group, every group owns >= 1 chunk
    grp = np.asarray(tg.chunk_grp)
    assert (np.diff(grp) >= 0).all()
    assert set(range(tg.n_groups)) <= set(grp.tolist())
    # every real edge appears exactly once with its weight
    eid = np.asarray(tg.edge_id).ravel()
    wv = np.asarray(tg.weight).ravel()
    live = wv != 0
    assert live.sum() == hg.n_edge
    assert sorted(eid[live].tolist()) == sorted(range(hg.n_edge))
    # local indices in range; sub-tile j belongs to row block grp*G+j
    src_l = np.asarray(tg.src_local)
    dst_l = np.asarray(tg.dst_local)
    assert src_l.min() >= 0 and src_l.max() <= tg.block_cols
    assert dst_l.min() >= 0 and dst_l.max() <= tg.block_rows
    recv = np.asarray(hg.receivers[: hg.n_edge])
    send = np.asarray(hg.senders[: hg.n_edge])
    NC, G, ET = src_l.shape
    j = np.broadcast_to(np.arange(G)[None, :, None], (NC, G, ET)).ravel()
    cgrp = np.broadcast_to(grp[:, None, None], (NC, G, ET)).ravel()
    ccb = np.broadcast_to(
        np.asarray(tg.chunk_cb)[:, None, None], (NC, G, ET)).ravel()
    rb = (cgrp * G + j)
    ok = live
    assert (recv[eid[ok]] // tg.block_rows == rb[ok]).all()
    assert (recv[eid[ok]] % tg.block_rows == dst_l.ravel()[ok]).all()
    assert (send[eid[ok]] // tg.block_cols == ccb[ok]).all()
    assert (send[eid[ok]] - ccb[ok] * tg.block_cols
            == src_l.ravel()[ok]).all()


@pytest.mark.parametrize("unit", [False, True])
def test_grouped_spmm_parity(rng, unit):
    hg = _rand_graph(rng, add_self_loops=True,
                     symmetric_norm=not unit)
    tg = tile_graph_grouped(hg, block_rows=128, block_cols=256,
                            tile_edges=64, group=4)
    assert tg.weight_all_unit == unit
    x = jnp.asarray(rng.standard_normal((hg.n_node, 96)), jnp.float32)
    y = spmm_mod._spmm_grouped_raw(tg, x, interpret=True)
    # oracle: the plain XLA weighted segment-sum over the original edges
    g = hg.to_device()
    msg = jnp.take(x, g.senders, axis=0) * g.edge_weight[:, None]
    yref = jnp.zeros_like(x).at[g.receivers].add(
        msg * g.edge_mask[:, None], mode="drop")
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                               rtol=1e-5, atol=1e-5)


def test_grouped_spmm_edge_vals_and_dispatch(rng):
    hg = _rand_graph(rng, add_self_loops=False, symmetric_norm=False)
    tg = tile_graph_grouped(hg, block_rows=128, block_cols=128,
                            tile_edges=64, group=8)
    x = jnp.asarray(rng.standard_normal((hg.n_node, 64)), jnp.float32)
    ev = jnp.asarray(rng.standard_normal(hg.e_pad), jnp.float32)
    y = spmm_mod._spmm_raw(tg, x, ev, interpret=True)  # grouped dispatch
    yref = spmm_mod._spmm_reference(tg, x, ev)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref[: hg.n_node]),
                               rtol=1e-5, atol=1e-5)


def test_grouped_empty_and_singleton():
    hg = gta.build_host_graph(np.zeros(1, np.int32), np.zeros(1, np.int32),
                              5, add_self_loops=False, symmetric_norm=False)
    tg = tile_graph_grouped(hg, block_rows=8, block_cols=8, tile_edges=8,
                            group=2)
    x = jnp.ones((5, 8), jnp.float32)
    y = spmm_mod._spmm_grouped_raw(tg, x, interpret=True)
    assert y.shape == (5, 8)
    assert float(y[0, 0]) == 1.0
    assert float(jnp.abs(y[1:]).max()) == 0.0


def test_schedule_key_roundtrip():
    sched = S.Schedule(
        blocks=((0, 1), (2,)),
        tiles=(S.TileConfig(512, 1024, 768, S.PATH_ONEHOT),
               S.TileConfig(path=S.PATH_XLA)))
    assert S.Schedule.from_key(sched.key()) == sched


def test_latency_pick_never_kernel_for_maxmin(rng):
    """DGN/PNA (gather MAX/MIN) have no kernel yet: the latency pick must
    fall back to all-XLA rather than a kernel-free 'kernel' schedule."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.zoo import (
        build_model)
    ds_x_width, n_class = 64, 7
    hg = _rand_graph(rng, n=500, e=3000, add_self_loops=True,
                     symmetric_norm=True)
    for net in ("DGN", "PNA"):
        model = build_model(net, ds_x_width, n_class, hidden=32, n_layers=1)
        for graph in model.layers:
            sc, t = L.min_latency_schedule(graph, hg, feat_width=ds_x_width)
            assert sc is not None and np.isfinite(t)
            from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler \
                import fusion as F
            kinds = {F.classify_block(graph, b, tc)[0]
                     for b, tc in zip(sc.blocks, sc.tiles)}
            assert kinds <= {"xla"}, (net, kinds)


def test_latency_pick_kernels_gat(rng):
    """GAT must pick the chain kernel (it is 3-17x faster measured)."""
    hg = _rand_graph(rng, n=2708, e=10556, add_self_loops=True,
                     symmetric_norm=True)
    graph = gta.build_op_graph("GAT", 64, 16, heads=16, layer_tag="t")
    sc, t = L.min_latency_schedule(graph, hg, feat_width=64)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
        fusion as F)
    kinds = {F.classify_block(graph, b, tc)[0]
             for b, tc in zip(sc.blocks, sc.tiles)}
    assert kinds & {"gat", "gat_hybrid", "gat_layer"}, kinds
    # and the modelled pick must not exceed the modelled all-XLA cost
    cost = L.GraphCost(hg)
    xla = S.Schedule(
        blocks=S.max_fusion_partition(graph),
        tiles=tuple(S.TileConfig(path=S.PATH_XLA)
                    for _ in S.max_fusion_partition(graph)))
    assert t <= L.schedule_ns(graph, xla, cost)


def test_latency_model_prices_lowering_not_intent(rng):
    """A mega-layer block with a hybrid path silently lowers to XLA
    (fusion.classify_block) — the model must price it as XLA (this exact
    mispricing produced r2's 455us 'hybrid' anomaly)."""
    hg = _rand_graph(rng, n=2708, e=10556, add_self_loops=True,
                     symmetric_norm=True)
    graph = gta.build_op_graph("GAT", 64, 16, heads=16, layer_tag="t")
    lp = S.layer_partition(graph)
    assert lp is not None and len(lp) == 1
    cost = L.GraphCost(hg)
    hyb = S.Schedule(blocks=lp, tiles=(S.TileConfig(512, 512, 512,
                                                    S.PATH_HYBRID),))
    xla = S.Schedule(blocks=lp, tiles=(S.TileConfig(path=S.PATH_XLA),))
    assert L.schedule_ns(graph, hyb, cost) == L.schedule_ns(graph, xla, cost)
