"""Round-4 regression tests for the round-3 advisor findings (ADVICE.md):

1. _gat_grouped_raw multi-call split: the a_dst panel must be sliced to the
   rebased group window (was: read from the wrong offset on every call
   after the first).
2. pair_aggregate_raw multi-call split: same panel-misalignment for the v
   panel.
3. weight_all_unit must be inferred from pre-placement real edge weights
   (was: real weight-0.0 edges classified as padding -> treated as 1.0 by
   the unit-weight kernel).
4. GAT kernels must skip dead padding tiles (tile_cb == -1 from
   parallel.dist.shard_tiles) and clamp their x-panel block index.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    tile_graph, tile_graph_grouped)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
    gat as gat_mod, pairagg as PA, spmm as spmm_mod)


def _rand_graph(rng, n=700, e=5000, **kw):
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    return gta.build_host_graph(s, r, n, **kw)


def test_gat_grouped_split_panel_alignment(rng):
    """Split-path (max_chunks_per_call < n_chunks) must equal single-call:
    the rebased chunk_grp indexes a SLICED a_dst panel (ADVICE high).
    (The r3 wide grouped kernel this bug was found in is deleted; the r4
    transposed kernel's split slices ads_t the same way.)"""
    hg = _rand_graph(rng, n=900, e=7000)
    H, HD = 4, 32
    h = jnp.asarray(rng.standard_normal((hg.n_node, HD)), jnp.float32)
    w_a = jnp.asarray(rng.standard_normal((HD, H)) * 0.3, jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((hg.n_node, H)), jnp.float32)
    msrc = jnp.max(h @ w_a, axis=0, keepdims=True)
    tg = tile_graph_grouped(hg, block_rows=128, block_cols=128,
                            tile_edges=64, group=2, unit_weight=True)
    assert tg.n_chunks > 6, "fixture must exercise the split"
    ref = gat_mod._gat_grouped_raw(tg, h, a_d, w_a, msrc, interpret=True)
    out = gat_mod._gat_grouped_raw(tg, h, a_d, w_a, msrc, interpret=True,
                                   max_chunks_per_call=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gat_grouped_transposed_weighted_and_headdim1(rng):
    """The r4 transposed grouped GAT kernel against the per-tile reference:
    non-unit edge weights (term multiplicity must be applied) and the
    HD == H (head_dim 1) degenerate expansion."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        tile_graph)
    for H, HD, unit in ((4, 32, False), (4, 4, True)):
        hg = _rand_graph(rng, n=700, e=5000)
        if not unit:
            hg = dataclasses.replace(
                hg, edge_weight=(rng.integers(1, 4, hg.senders.shape[0])
                                 .astype(np.float32) * hg.edge_mask))
        h = jnp.asarray(rng.standard_normal((hg.n_node, HD)), jnp.float32)
        w_a = jnp.asarray(rng.standard_normal((HD, H)) * 0.3, jnp.float32)
        a_d = jnp.asarray(rng.standard_normal((hg.n_node, H)), jnp.float32)
        msrc = jnp.max(h @ w_a, axis=0, keepdims=True)
        tgg = tile_graph_grouped(hg, block_rows=128, block_cols=128,
                                 tile_edges=64, group=4, unit_weight=unit)
        assert tgg.weight_all_unit == unit
        tgu = tile_graph(hg, block_rows=128, block_cols=128, tile_edges=64,
                         unit_weight=unit)
        acc = gat_mod._gat_forward(tgg, h, None, a_d, w_asrc=w_a,
                                   normalize=False, msrc=msrc,
                                   interpret=True)
        ref = gat_mod._gat_forward(tgu, h, None, a_d, w_asrc=w_a,
                                   normalize=False, msrc=msrc,
                                   interpret=True, dataflow="wide")
        np.testing.assert_allclose(np.asarray(acc), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"H={H} HD={HD} unit={unit}")


def test_pair_agg_split_panel_alignment(rng, monkeypatch):
    """pair_aggregate_raw split path: rebased tile_rb indexes a SLICED v
    panel (ADVICE medium)."""
    hg = _rand_graph(rng, n=900, e=7000)
    d = 24
    u = jnp.asarray(rng.standard_normal((hg.n_node, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((hg.n_node, d)), jnp.float32)
    tg = tile_graph(hg, block_rows=128, block_cols=128, tile_edges=64,
                    unit_weight=True)
    assert tg.n_tiles > 12, "fixture must exercise the split"
    ref = PA.pair_aggregate_raw(tg, u, v, sf="leaky_relu", interpret=True)
    monkeypatch.setattr(spmm_mod, "MAX_TILES_PER_CALL", 8)
    out = PA.pair_aggregate_raw(tg, u, v, sf="leaky_relu", interpret=True)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_weight_all_unit_respects_zero_weights(rng):
    """A real edge with weight exactly 0.0 must (a) disable the unit-weight
    fast path and (b) contribute nothing to the aggregation (ADVICE
    medium: the old slot-array test treated it as padding => weight 1)."""
    n, e = 300, 2000
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    w = np.ones(e, np.float32)
    w[rng.integers(0, e, 50)] = 0.0  # masked/dropped edges
    hg = gta.build_host_graph(s, r, n, edge_weight=w)
    tg = tile_graph_grouped(hg, block_rows=128, block_cols=128,
                            tile_edges=64, group=2)
    assert not tg.weight_all_unit
    x = jnp.asarray(rng.standard_normal((n, 32)), jnp.float32)
    y = spmm_mod._spmm_grouped_raw(tg, x, interpret=True)
    g = hg.to_device()
    msg = jnp.take(x, g.senders, axis=0) * g.edge_weight[:, None]
    yref = jnp.zeros_like(x).at[g.receivers].add(
        msg * g.edge_mask[:, None], mode="drop")
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                               rtol=1e-5, atol=1e-5)
    # all-unit weights still detected
    hg1 = gta.build_host_graph(s, r, n)
    tg1 = tile_graph_grouped(hg1, block_rows=128, block_cols=128,
                             tile_edges=64, group=2, unit_weight=True)
    assert tg1.weight_all_unit


def _pad_dead_tiles(tg, ext):
    """Append `ext` dead tiles exactly like parallel.dist.shard_tiles."""
    last_rb = tg.n_row_blocks - 1
    return dataclasses.replace(
        tg,
        row_first_host=None,
        tile_rb=jnp.concatenate(
            [tg.tile_rb, jnp.full((ext,), last_rb, jnp.int32)]),
        tile_cb=jnp.concatenate(
            [tg.tile_cb, jnp.full((ext,), -1, jnp.int32)]),
        src_local=jnp.concatenate(
            [tg.src_local,
             jnp.full((ext, tg.tile_edges), tg.block_cols,
                      tg.src_local.dtype)]),
        dst_local=jnp.concatenate(
            [tg.dst_local,
             jnp.full((ext, tg.tile_edges), tg.block_rows,
                      tg.dst_local.dtype)]),
        edge_id=jnp.concatenate(
            [tg.edge_id, jnp.zeros((ext, tg.tile_edges), jnp.int32)]),
        weight=jnp.concatenate(
            [tg.weight, jnp.zeros((ext, tg.tile_edges), tg.weight.dtype)]),
    )


def test_gat_dead_tiles_skipped(rng):
    """GAT kernels on shard-padded tiles (cb == -1): identical output in
    both dataflows, no out-of-bounds x-panel block (ADVICE medium)."""
    hg = _rand_graph(rng, n=500, e=3000)
    H, HD = 4, 32
    h = jnp.asarray(rng.standard_normal((hg.n_node, HD)), jnp.float32)
    a_s = jnp.asarray(rng.standard_normal((hg.n_node, H)), jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((hg.n_node, H)), jnp.float32)
    tg = tile_graph(hg, block_rows=128, block_cols=128, tile_edges=64,
                    unit_weight=True)
    padded = _pad_dead_tiles(tg, 5)
    for df in ("wide", "transposed"):
        ref = gat_mod._gat_forward(tg, h, a_s, a_d, interpret=True,
                                   dataflow=df)
        out = gat_mod._gat_forward(padded, h, a_s, a_d, interpret=True,
                                   dataflow=df)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=df)
