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


def test_latency_pick_kernel_or_xla_never_worse(rng):
    """The pick must be well-formed for every family: finite modelled
    latency, and never exceed the modelled all-XLA cost (the never-regress
    property; DGN/PNA now route through the pair-agg kernel)."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.zoo import (
        build_model)
    ds_x_width, n_class = 64, 7
    hg = _rand_graph(rng, n=500, e=3000, add_self_loops=True,
                     symmetric_norm=True)
    cost = L.GraphCost(hg)
    for net in ("DGN", "PNA"):
        model = build_model(net, ds_x_width, n_class, hidden=32, n_layers=1)
        for graph in model.layers:
            sc, t = L.min_latency_schedule(graph, hg, feat_width=ds_x_width)
            assert sc is not None and np.isfinite(t)
            mf = S.max_fusion_partition(graph)
            xla = S.Schedule(blocks=mf, tiles=tuple(
                S.TileConfig(path=S.PATH_XLA) for _ in mf))
            assert t <= L.schedule_ns(graph, xla, cost)


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


def test_pair_agg_lowering_pna_dgn(rng):
    """PNA/DGN lower through the fused pair-aggregate kernel and match the
    XLA oracle; the compile-only pick selects it (VERDICT r2 next-5)."""
    import jax
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.fusion \
        import classify_block, lower_schedule
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower \
        import init_params, lower
    hg = _rand_graph(rng, n=500, e=3000, add_self_loops=True,
                     symmetric_norm=True)
    g = hg.to_device()
    for net, kw in (("PNA", {}), ("PNA", {"reorder": True}), ("DGN", {})):
        og = gta.build_op_graph(net, 48, 16, **kw)
        part = S.pair_agg_partition(og)
        assert part is not None, (net, kw)
        tc0 = S.TileConfig(128, 128, 64)
        tiles = tuple(tc0 if classify_block(og, b, tc0)[0] == "pair_agg"
                      else S.TileConfig(path=S.PATH_XLA) for b in part)
        assert any(t.kernel for t in tiles)
        params = init_params(og, jax.random.key(0))
        x = jnp.asarray(rng.standard_normal((hg.n_node, 48)), jnp.float32)
        ref = lower(og)(params, g, x)
        out = lower_schedule(og, S.Schedule(blocks=part, tiles=tiles), hg,
                             interpret=True)(params, g, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        sc, _ = L.min_latency_schedule(og, hg, feat_width=48)
        kinds = {classify_block(og, b, t)[0]
                 for b, t in zip(sc.blocks, sc.tiles)}
        assert "pair_agg" in kinds, (net, kw, kinds)


def test_pair_agg_grads(rng):
    """Backward through the pair-agg custom VJP (XLA-twin recompute)."""
    import jax
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        tile_graph)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
        pairagg as PA)
    hg = _rand_graph(rng, n=300, e=2000)
    tg = tile_graph(hg, block_rows=128, block_cols=128, tile_edges=64,
                    unit_weight=True)
    g = hg.to_device()
    n, d = hg.n_node, 32
    u = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)

    def loss_k(a, b):
        ys, ym, cnt = PA.pair_aggregate(tg, a, b, sf="leaky_relu",
                                        interpret=True)
        return jnp.vdot(ys, gy) + jnp.vdot(ym, gy)

    def loss_ref(a, b):
        src = jnp.where(g.edge_mask, g.senders, n)
        dst = jnp.where(g.edge_mask, g.receivers, n)
        ap = jnp.concatenate([a, jnp.zeros((1, d))], 0)
        bp = jnp.concatenate([b, jnp.zeros((1, d))], 0)
        z = jax.nn.leaky_relu(jnp.take(ap, src, 0) + jnp.take(bp, dst, 0),
                              0.2)
        zs = jnp.where(g.edge_mask[:, None], z, 0.0)
        ys = jax.ops.segment_sum(zs, dst, n + 1)[:n]
        zm = jnp.where(g.edge_mask[:, None], z, -1e30)
        ym = jax.ops.segment_max(zm, dst, n + 1)[:n]
        ym = jnp.where(ym > -1e29, ym, 0.0)
        return jnp.vdot(ys, gy) + jnp.vdot(ym, gy)

    gk = jax.grad(loss_k, argnums=(0, 1))(u, v)
    gr = jax.grad(loss_ref, argnums=(0, 1))(u, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_grouped_path_schedule_lowering(rng):
    """PATH_GROUPED schedules lower through tile_graph_grouped + the
    grouped kernel, with working transposed-backward plumbing."""
    import jax
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.fusion \
        import classify_block, lower_schedule
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower \
        import init_params, lower
    hg = _rand_graph(rng, n=400, e=3000, add_self_loops=True,
                     symmetric_norm=True)
    g = hg.to_device()
    og = gta.build_op_graph("GCN", 32, 16)
    part = S.aggregation_partition(og)
    tcg = S.TileConfig(128, 128, 64, S.PATH_GROUPED)
    tiles = tuple(
        tcg if classify_block(og, b, tcg)[0] == "spmm_grouped"
        else S.TileConfig(path=S.PATH_XLA) for b in part)
    assert any(t.path == S.PATH_GROUPED for t in tiles)
    params = init_params(og, jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((hg.n_node, 32)), jnp.float32)
    ref = lower(og)(params, g, x)
    fn = lower_schedule(og, S.Schedule(blocks=part, tiles=tiles), hg,
                        interpret=True, build_transpose=True)
    out = fn(params, g, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    gk = jax.grad(lambda p: jnp.sum(fn(p, g, x) ** 2))(params)
    gr = jax.grad(lambda p: jnp.sum(lower(og)(p, g, x) ** 2))(params)
    for k in gr:
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gr[k]),
                                   rtol=2e-3, atol=2e-3)


def test_gat_grouped_partials_match_per_tile(rng):
    """The grouped GAT chain kernel (normalize=False partials, derive
    variant) is bit-exact vs the per-tile kernel path under the same
    msrc shift (experimental: hybrid-tail use; G16 at HD=128 is
    VMEM-bound on hardware, use G8)."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        tile_graph)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
        gat as gat_mod)
    hg = _rand_graph(rng, n=700, e=5000)
    H, HD = 4, 32
    h = jnp.asarray(rng.standard_normal((hg.n_node, HD)), jnp.float32)
    w_a = jnp.asarray(rng.standard_normal((HD, H)) * 0.3, jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((hg.n_node, H)), jnp.float32)
    msrc = jnp.max(h @ w_a, axis=0, keepdims=True)
    tgg = tile_graph_grouped(hg, block_rows=128, block_cols=128,
                             tile_edges=64, group=4, unit_weight=True)
    tgu = tile_graph(hg, block_rows=128, block_cols=128, tile_edges=64,
                     unit_weight=True)
    acc = gat_mod._gat_forward(tgg, h, None, a_d, w_asrc=w_a,
                               normalize=False, msrc=msrc, interpret=True)
    ref = gat_mod._gat_forward(tgu, h, None, a_d, w_asrc=w_a,
                               normalize=False, msrc=msrc, interpret=True,
                               dataflow="wide")
    np.testing.assert_allclose(np.asarray(acc), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grouped_sddmm_parity(rng):
    """The r4 transposed grouped SDDMM against the per-edge oracle: every
    live slot's per-head dot matches; padding slots are exact zeros."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
        sddmm as sddmm_mod)
    hg = _rand_graph(rng, add_self_loops=False, symmetric_norm=False)
    heads, f = 4, 64
    tg = tile_graph_grouped(hg, block_rows=128, block_cols=128,
                            tile_edges=64, group=4, unit_weight=True)
    xs = jnp.asarray(rng.standard_normal((hg.n_node, f)), jnp.float32)
    xd = jnp.asarray(rng.standard_normal((hg.n_node, f)), jnp.float32)
    out = np.asarray(sddmm_mod.sddmm(tg, xs, xd, heads=heads,
                                     interpret=True))   # [H, NC, G*ET]
    NC, G, ET = tg.n_chunks, tg.group, tg.tile_edges
    out = out.reshape(heads, NC, G, ET)
    dst_l = np.asarray(tg.dst_local)
    eid = np.asarray(tg.edge_id)
    live = dst_l < tg.block_rows
    # oracle per-edge per-head dots
    s_e = np.asarray(xs)[hg.senders[: hg.n_edge]]
    d_e = np.asarray(xd)[hg.receivers[: hg.n_edge]]
    prod = (s_e * d_e).reshape(-1, heads, f // heads).sum(-1)  # [E, H]
    for h in range(heads):
        got = out[h][live]
        want = prod[eid[live], h]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert np.abs(out[:, ~live]).max() == 0.0
