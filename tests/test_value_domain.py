"""Value-domain regression suite (VERDICT r2 next-6/7): adversarial logit
spreads for the GAT shift bound, multiplicity saturation past the int8 cap,
extreme degrees, and empty tiles — each a class of bug that slipped or
nearly slipped through earlier rounds (the r2 int8-wrap episode had no test
until after the fact)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    hybrid_graph, tile_graph)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
    dense as dense_mod, gat as gat_mod, spmm as spmm_mod)


def _rand_graph(rng, n=300, e=2000, **kw):
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    return gta.build_host_graph(s, r, n, **kw)


# ---------------------------------------------------------------------------
# GAT shift-bound domain (weak #4): adversarial a_src spreads
# ---------------------------------------------------------------------------


def _adversarial_inputs(rng, hg, H=2, D=4, spread=200.0):
    """a_src with one +spread/2 outlier; ordinary rows sit at -spread/2
    below the global max — beyond the f32 exp underflow of the kernels'
    global-msrc shift bound."""
    n = hg.n_node
    h = jnp.asarray(rng.standard_normal((n, H * D)), jnp.float32)
    a_s = jnp.asarray(rng.standard_normal((n, H)) - spread / 2, jnp.float32)
    a_s = a_s.at[0, :].set(spread / 2)
    a_d = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    return h, a_s, a_d


def test_gat_shift_gap_detects_adversarial(rng):
    hg = _rand_graph(rng, add_self_loops=True)
    g = hg.to_device()
    _, a_s, _ = _adversarial_inputs(rng, hg)
    gap = float(gat_mod.gat_shift_gap(g, a_s))
    assert gap > gat_mod.SHIFT_GAP_SAFE
    # benign logits stay inside the domain
    benign = jnp.asarray(rng.standard_normal((hg.n_node, 2)) * 3.0,
                         jnp.float32)
    assert float(gat_mod.gat_shift_gap(g, benign)) < gat_mod.SHIFT_GAP_SAFE


def test_gat_adversarial_logits_unguarded_collapse_guarded_exact(rng):
    """Documents the failure AND the fix: without the guard the kernel
    collapses adversarial rows to ~0 attention; with guard_shift the
    lax.cond routes to the exact segment-max path."""
    hg = _rand_graph(rng, add_self_loops=True)
    g = hg.to_device()
    tg = tile_graph(hg, block_rows=128, block_cols=128, tile_edges=64,
                    unit_weight=True)
    h, a_s, a_d = _adversarial_inputs(rng, hg)
    exact = gat_mod._gat_reference(tg, h, a_s, a_d, 0.2)
    raw = gat_mod.gat_attention(tg, h, a_s, a_d, heads=2, interpret=True)
    err_raw = float(jnp.abs(raw - exact).max())
    assert err_raw > 0.1, "kernel unexpectedly survives 200-wide spreads"
    guarded = gat_mod.gat_attention(tg, h, a_s, a_d, heads=2,
                                    interpret=True, g=g, guard_shift=True)
    np.testing.assert_allclose(np.asarray(guarded), np.asarray(exact),
                               rtol=1e-4, atol=1e-4)


def test_gat_guard_passthrough_benign(rng):
    """On benign logits the guard takes the kernel branch and matches it."""
    hg = _rand_graph(rng, add_self_loops=True)
    g = hg.to_device()
    tg = tile_graph(hg, block_rows=128, block_cols=128, tile_edges=64,
                    unit_weight=True)
    n = hg.n_node
    h = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
    a_s = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)
    raw = gat_mod.gat_attention(tg, h, a_s, a_d, heads=2, interpret=True)
    guarded = gat_mod.gat_attention(tg, h, a_s, a_d, heads=2,
                                    interpret=True, g=g, guard_shift=True)
    np.testing.assert_allclose(np.asarray(guarded), np.asarray(raw),
                               rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# multiplicity saturation (the r2 int8-wrap bug class)
# ---------------------------------------------------------------------------


def test_int8_dense_multiplicity_over_cap(rng):
    """Pairs with multiplicity far beyond int8 (here 400) must aggregate
    exactly: the dense store keeps `cap` copies, the excess merges into one
    tail slot — red/green for the silent int8 wrap r2 shipped."""
    n = 64
    # a dense block worth of singles + one hot pair repeated 400x
    s = rng.integers(0, 32, 3000).astype(np.int32)
    r = rng.integers(0, 32, 3000).astype(np.int32)
    s = np.concatenate([s, np.full(400, 3, np.int32)])
    r = np.concatenate([r, np.full(400, 7, np.int32)])
    hg = gta.build_host_graph(s, r, n, add_self_loops=False,
                              symmetric_norm=False)
    hyb = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                       min_nnz=16, values_dtype=np.int8)
    x = jnp.asarray(rng.standard_normal((n, 32)), jnp.float32)
    g = hg.to_device()
    y = dense_mod.spmm_hybrid(hyb, g, x, interpret=True)
    msg = jnp.take(x, g.senders, axis=0) * g.edge_mask[:, None]
    yref = jnp.zeros_like(x).at[g.receivers].add(msg, mode="drop")
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                               rtol=1e-4, atol=1e-4)
    # the hot pair really contributes 400x
    assert float(yref[7].sum()) != 0.0


def test_grouped_tail_large_integer_weights(rng):
    """Merged-multiplicity weights (large exact ints) through the grouped
    kernel's weighted path — weight_all_unit must be False and the values
    exact."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        tile_graph_grouped)
    n = 100
    s = rng.integers(0, n, 800).astype(np.int32)
    r = rng.integers(0, n, 800).astype(np.int32)
    w = np.ones(800, np.float32)
    w[:10] = 5800.0           # merged hot-pair counts
    hg = gta.build_host_graph(s, r, n, edge_weight=w)
    tg = tile_graph_grouped(hg, block_rows=64, block_cols=64,
                            tile_edges=32, group=2)
    assert not tg.weight_all_unit
    x = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    y = spmm_mod._spmm_grouped_raw(tg, x, interpret=True)
    g = hg.to_device()
    msg = jnp.take(x, g.senders, axis=0) * g.edge_weight[:, None]
    yref = jnp.zeros_like(x).at[g.receivers].add(
        msg * g.edge_mask[:, None], mode="drop")
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                               rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# extreme degrees / empty structures
# ---------------------------------------------------------------------------


def test_star_graph_hub_degree(rng):
    """One node receives every edge (degree = E): tile packing and kernel
    accumulation across many tiles of one row."""
    n, e = 64, 4000
    s = rng.integers(0, n, e).astype(np.int32)
    r = np.zeros(e, np.int32)
    hg = gta.build_host_graph(s, r, n, add_self_loops=False,
                              symmetric_norm=False)
    tg = tile_graph(hg, block_rows=32, block_cols=32, tile_edges=64)
    x = jnp.ones((n, 8), jnp.float32)
    y = spmm_mod.spmm(tg, x, interpret=True)
    assert float(y[0, 0]) == e
    assert float(jnp.abs(y[1:]).max()) == 0.0


def test_empty_rows_gat(rng):
    """Nodes with no in-edges produce zero attention output (den clamps),
    not NaN."""
    n = 96
    s = rng.integers(0, n, 300).astype(np.int32)
    r = rng.integers(0, 48, 300).astype(np.int32)   # upper half edge-free
    hg = gta.build_host_graph(s, r, n, add_self_loops=False,
                              symmetric_norm=False)
    tg = tile_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                    unit_weight=True)
    h = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
    a_s = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)
    out = gat_mod.gat_attention(tg, h, a_s, a_d, heads=2, interpret=True)
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.abs(out[48:]).max()) == 0.0
