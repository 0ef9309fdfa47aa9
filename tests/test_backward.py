"""Tiled backward (dx = Aᵀ ȳ over a transposed tiling) vs XLA autodiff
(VERDICT r2 next-3: gradients that scale like the forward)."""
import numpy as np
import jax
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    hybrid_graph, tile_graph, tile_graph_grouped, transpose_host_graph)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
    dense as dense_mod, spmm as spmm_mod)


def _rand_graph(rng, n=400, e=3000, **kw):
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    return gta.build_host_graph(s, r, n, **kw)


def _xla_spmm(hg, x):
    g = hg.to_device()
    msg = jnp.take(x, g.senders, axis=0) * g.edge_weight[:, None]
    return jnp.zeros_like(x).at[g.receivers].add(
        msg * g.edge_mask[:, None], mode="drop")


def test_transpose_host_graph(rng):
    hg = _rand_graph(rng, symmetric_norm=True)
    gt, perm = transpose_host_graph(hg)
    ne = hg.n_edge
    assert gt.n_edge == ne
    np.testing.assert_array_equal(gt.senders[:ne],
                                  hg.receivers[:ne][perm[:ne]])
    np.testing.assert_array_equal(gt.receivers[:ne],
                                  hg.senders[:ne][perm[:ne]])
    np.testing.assert_array_equal(gt.edge_weight[:ne],
                                  hg.edge_weight[:ne][perm[:ne]])
    assert (np.diff(gt.receivers[:ne]) >= 0).all()  # sorted for tiling


def test_spmm_grad_tiled_vs_xla(rng):
    hg = _rand_graph(rng, symmetric_norm=True)
    hgt, _ = transpose_host_graph(hg)
    tg = tile_graph(hg, block_rows=128, block_cols=128, tile_edges=64)
    tg_t = tile_graph(hgt, block_rows=128, block_cols=128, tile_edges=64)
    x = jnp.asarray(rng.standard_normal((hg.n_node, 64)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((hg.n_node, 64)), jnp.float32)

    def loss_k(v):
        return jnp.vdot(spmm_mod.spmm(tg, v, tg_t=tg_t,
                                      interpret=True), gy)

    def loss_ref(v):
        return jnp.vdot(_xla_spmm(hg, v), gy)

    dk = jax.grad(loss_k)(x)
    dr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dr),
                               rtol=1e-4, atol=1e-4)


def test_spmm_grad_grouped_transpose(rng):
    hg = _rand_graph(rng, symmetric_norm=True)
    hgt, _ = transpose_host_graph(hg)
    tg = tile_graph_grouped(hg, block_rows=128, block_cols=128,
                            tile_edges=64, group=4)
    tg_t = tile_graph_grouped(hgt, block_rows=128, block_cols=128,
                              tile_edges=64, group=4)
    x = jnp.asarray(rng.standard_normal((hg.n_node, 64)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((hg.n_node, 64)), jnp.float32)
    dk = jax.grad(lambda v: jnp.vdot(
        spmm_mod.spmm(tg, v, tg_t=tg_t, interpret=True), gy))(x)
    dr = jax.grad(lambda v: jnp.vdot(_xla_spmm(hg, v), gy))(x)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dr),
                               rtol=1e-4, atol=1e-4)


def test_spmm_grad_edge_vals_transpose(rng):
    hg = _rand_graph(rng, symmetric_norm=True)
    hgt, perm = transpose_host_graph(hg)
    tg = tile_graph(hg, block_rows=128, block_cols=128, tile_edges=64)
    tg_t = tile_graph(hgt, block_rows=128, block_cols=128, tile_edges=64)
    x = jnp.asarray(rng.standard_normal((hg.n_node, 32)), jnp.float32)
    ev = jnp.asarray(rng.standard_normal(hg.e_pad), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((hg.n_node, 32)), jnp.float32)
    permd = jnp.asarray(perm)

    def k(v, ee):
        return jnp.vdot(spmm_mod.spmm(tg, v, ee, tg_t=tg_t,
                                      ev_perm_t=permd, interpret=True), gy)

    def ref(v, ee):
        g = hg.to_device()
        msg = (jnp.take(v, g.senders, axis=0) * g.edge_weight[:, None]
               * ee[:, None])
        y = jnp.zeros_like(v).at[g.receivers].add(
            msg * g.edge_mask[:, None], mode="drop")
        return jnp.vdot(y, gy)

    dkx, dke = jax.grad(k, argnums=(0, 1))(x, ev)
    drx, dre = jax.grad(ref, argnums=(0, 1))(x, ev)
    np.testing.assert_allclose(np.asarray(dkx), np.asarray(drx),
                               rtol=1e-4, atol=1e-4)
    # edge grads exist only on live slots; reference twin zeroes pads
    np.testing.assert_allclose(np.asarray(dke)[: hg.n_edge],
                               np.asarray(dre)[: hg.n_edge],
                               rtol=1e-4, atol=1e-4)


def test_spmm_hybrid_grad_transpose(rng):
    hg = _rand_graph(rng, symmetric_norm=True)
    hgt, _ = transpose_host_graph(hg)
    kw = dict(block_rows=128, block_cols=128, tile_edges=64, min_nnz=40)
    hyb = hybrid_graph(hg, **kw)
    hyb_t = hybrid_graph(hgt, **kw)
    g = hg.to_device()
    x = jnp.asarray(rng.standard_normal((hg.n_node, 64)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((hg.n_node, 64)), jnp.float32)
    dk = jax.grad(lambda v: jnp.vdot(dense_mod.spmm_hybrid(
        hyb, g, v, interpret=True, hyb_t=hyb_t), gy))(x)
    dr = jax.grad(lambda v: jnp.vdot(_xla_spmm(hg, v), gy))(x)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dr),
                               rtol=1e-4, atol=1e-4)


def test_lower_schedule_build_transpose_grads(rng):
    """End-to-end: a GCN layer whose SpMM block is kernel-dispatched,
    lowered with build_transpose, matches the XLA lowering's gradients —
    exercising the tg_t plumbing through lower_schedule."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.zoo import (
        build_model)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
        schedule as S)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.fusion \
        import classify_block, lower_schedule
    hg = _rand_graph(rng, n=300, e=2000, add_self_loops=True,
                     symmetric_norm=True)
    g = hg.to_device()
    model = build_model("GCN", 32, 5, hidden=16, n_layers=1)
    params = model.init(jax.random.key(0))
    graph = model.layers[0]
    part = S.aggregation_partition(graph)
    assert part is not None
    tiles = tuple(
        S.TileConfig(128, 128, 64)
        if classify_block(graph, b, S.TileConfig(128, 128, 64))[0] == "spmm"
        else S.TileConfig(path=S.PATH_XLA) for b in part)
    sched = S.Schedule(blocks=part, tiles=tiles)
    assert any(tc.kernel for tc in tiles)
    x = jnp.asarray(rng.standard_normal((hg.n_node, 32)), jnp.float32)

    fn_x = model.make_apply()
    fn_k = lower_schedule(graph, sched, hg, interpret=True,
                          build_transpose=True)

    def loss(fn, p):
        out = fn(p, g, x)
        return jnp.sum(out * out)

    gx = jax.grad(lambda p: loss(fn_x, p))(params)
    gk = jax.grad(lambda p: loss(fn_k, p))(params)
    for k in gx:
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gx[k]),
                                   rtol=2e-3, atol=2e-3)


def test_gat_grad_scalable_vs_reference(rng):
    """Tiled GAT backward (_gat_bwd_scalable) vs autodiff of the XLA
    segment formulation — both h/a_src/a_dst grads and the w_asrc chain."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
        gat as gat_mod)
    hg = _rand_graph(rng, n=260, e=1800, add_self_loops=True)
    hgt, perm = transpose_host_graph(hg)
    g = hg.to_device()
    tg = tile_graph(hg, block_rows=128, block_cols=128, tile_edges=64,
                    unit_weight=True)
    tg_t = tile_graph(hgt, block_rows=128, block_cols=128, tile_edges=64,
                      unit_weight=True)
    permd = jnp.asarray(perm)
    H, D = 4, 8
    h = jnp.asarray(rng.standard_normal((hg.n_node, H * D)), jnp.float32)
    a_s = jnp.asarray(rng.standard_normal((hg.n_node, H)), jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((hg.n_node, H)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((hg.n_node, H * D)), jnp.float32)

    def loss_k(hh, ss, dd):
        out = gat_mod.gat_attention(tg, hh, ss, dd, heads=H,
                                    interpret=True, g=g, tg_t=tg_t,
                                    ev_perm_t=permd)
        return jnp.vdot(out, gy)

    def loss_ref(hh, ss, dd):
        return jnp.vdot(gat_mod._gat_reference(tg, hh, ss, dd, 0.2), gy)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(h, a_s, a_d)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(h, a_s, a_d)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    # w_asrc variant: a_src derived in-kernel; grads chain through w
    w_as = jnp.asarray(rng.standard_normal((H * D, H)) * 0.3, jnp.float32)

    def loss_kw(hh, ww, dd):
        out = gat_mod.gat_attention(tg, hh, a_dst=dd, heads=H,
                                    interpret=True, w_asrc=ww, g=g,
                                    tg_t=tg_t, ev_perm_t=permd)
        return jnp.vdot(out, gy)

    def loss_rw(hh, ww, dd):
        # HIGHEST: the derive kernel computes hs@w in full f32, while this
        # JAX's DEFAULT f32 matmul rounds through bf16 — the reference twin
        # must match the kernel's (more accurate) logits
        a_s2 = jnp.dot(hh, ww, precision=jax.lax.Precision.HIGHEST)
        return jnp.vdot(gat_mod._gat_reference(tg, hh, a_s2, dd, 0.2), gy)

    gkw = jax.grad(loss_kw, argnums=(0, 1, 2))(h, w_as, a_d)
    grw = jax.grad(loss_rw, argnums=(0, 1, 2))(h, w_as, a_d)
    for a, b in zip(gkw, grw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_gat_grad_fused_split_and_legacy_agree(rng):
    """Round-4 fused tile-domain backward: the multi-call split path is
    exact, and the legacy per-head [E]-pipeline backward (FUSED_BWD=False)
    still matches the reference on the same inputs."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
        gat as gat_mod)
    hg = _rand_graph(rng, n=260, e=1800, add_self_loops=True)
    hgt, perm = transpose_host_graph(hg)
    g = hg.to_device()
    tg = tile_graph(hg, block_rows=128, block_cols=128, tile_edges=64,
                    unit_weight=True)
    tg_t = tile_graph(hgt, block_rows=128, block_cols=128, tile_edges=64,
                      unit_weight=True)
    permd = jnp.asarray(perm)
    H, D = 4, 8
    h = jnp.asarray(rng.standard_normal((hg.n_node, H * D)), jnp.float32)
    a_s = jnp.asarray(rng.standard_normal((hg.n_node, H)), jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((hg.n_node, H)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((hg.n_node, H * D)), jnp.float32)

    # split path == single-call path (panel alignment across stripe chunks)
    HD = H * D
    raw = gat_mod._gat_forward(tg, h, a_s, a_d, normalize=False,
                               interpret=True)
    den = raw[:, HD:]
    y = raw[:, :HD] / jnp.maximum(jnp.repeat(den, D, axis=1), 1e-20)
    full = gat_mod._gat_bwd_fused(tg, tg_t, h, a_s, a_d, den, y, gy, 0.2,
                                  interpret=True)
    split = gat_mod._gat_bwd_fused(tg, tg_t, h, a_s, a_d, den, y, gy, 0.2,
                                   interpret=True, max_tiles_per_call=5)
    for a, b in zip(full, split):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    # legacy path stays correct when toggled back on
    def loss_k(hh, ss, dd):
        out = gat_mod.gat_attention(tg, hh, ss, dd, heads=H,
                                    interpret=True, g=g, tg_t=tg_t,
                                    ev_perm_t=permd)
        return jnp.vdot(out, gy)

    def loss_ref(hh, ss, dd):
        return jnp.vdot(gat_mod._gat_reference(tg, hh, ss, dd, 0.2), gy)

    gat_mod.FUSED_BWD = False
    try:
        gk = jax.grad(loss_k, argnums=(0, 1, 2))(h, a_s, a_d)
    finally:
        gat_mod.FUSED_BWD = True
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(h, a_s, a_d)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_gat_remat_through_custom_vjp(rng):
    """Round-4 (VERDICT r3 missing #4): jax.checkpoint through the GAT
    attention custom_vjp.  The r3 custom_vjp closed over tiling tracers
    and remat raised UnexpectedTracerError; the arg-threaded module-level
    vjp (_gat_vjp) makes the layer remat-able with exact gradients."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
        gat as gat_mod)
    hg = _rand_graph(rng, n=260, e=1800, add_self_loops=True)
    hgt, perm = transpose_host_graph(hg)
    g = hg.to_device()
    tg = tile_graph(hg, block_rows=128, block_cols=128, tile_edges=64,
                    unit_weight=True)
    tg_t = tile_graph(hgt, block_rows=128, block_cols=128, tile_edges=64,
                      unit_weight=True)
    H, D = 4, 8
    h = jnp.asarray(rng.standard_normal((hg.n_node, H * D)), jnp.float32)
    a_s = jnp.asarray(rng.standard_normal((hg.n_node, H)), jnp.float32)
    a_d = jnp.asarray(rng.standard_normal((hg.n_node, H)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((hg.n_node, H * D)), jnp.float32)
    caps = (tg, tg_t, g, jnp.asarray(perm))

    def layer(caps, hh, ss, dd):
        tg_, tgt_, g_, pm = caps
        return gat_mod.gat_attention(tg_, hh, ss, dd, heads=H,
                                     interpret=True, g=g_, tg_t=tgt_,
                                     ev_perm_t=pm)

    @jax.jit
    def loss(caps, hh, ss, dd):
        out = jax.checkpoint(layer)(caps, hh, ss, dd)
        out = jax.checkpoint(layer)(
            caps, jnp.maximum(out, 0).astype(hh.dtype), ss, dd)
        return jnp.vdot(out, gy)

    gr = jax.grad(loss, argnums=1)(caps, h, a_s, a_d)

    def loss_ref(hh, ss, dd):
        o = gat_mod._gat_reference(tg, hh, ss, dd, 0.2)
        o = gat_mod._gat_reference(
            tg, jnp.maximum(o, 0).astype(hh.dtype), ss, dd, 0.2)
        return jnp.vdot(o, gy)

    gref = jax.grad(loss_ref)(h, a_s, a_d)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gref),
                               rtol=2e-4, atol=2e-4)


def test_gat_bwd_transposed_matches_wide(rng):
    """The r5 transposed-dataflow backward kernels compute exactly the
    wide kernels' gradients (same math, different orientation)."""
    import numpy as np
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        build_host_graph, tile_graph, transpose_host_graph)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
        gat as gat_mod)
    from conftest import small_graph

    s, r = small_graph(rng, n=96, e=700)
    hg = build_host_graph(s, r, 96, edge_pad_multiple=128)
    hg_t, _ = transpose_host_graph(hg)
    tg = tile_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                    unit_weight=True)
    tg_t = tile_graph(hg_t, block_rows=32, block_cols=32, tile_edges=64,
                      unit_weight=True)
    H, HD = 2, 8
    h = jnp.asarray(rng.normal(size=(96, HD)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(96, H)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(96, H)).astype(np.float32))
    raw = gat_mod._gat_forward(tg, h, a_s, a_d, normalize=False,
                               interpret=True,
                               msrc=jnp.max(a_s, 0, keepdims=True))
    den = raw[:, HD:]
    y = raw[:, :HD] / jnp.repeat(jnp.maximum(den, 1e-20), HD // H, 1)
    gbar = jnp.asarray(rng.normal(size=y.shape).astype(np.float32))

    outs = {}
    for flag in (True, False):
        old = gat_mod.GAT_BWD_T
        gat_mod.GAT_BWD_T = flag
        try:
            outs[flag] = gat_mod._gat_bwd_fused(
                tg, tg_t, h, a_s, a_d, den, y, gbar, 0.2, interpret=True)
        finally:
            gat_mod.GAT_BWD_T = old
    for name, a, b in zip(("dh", "das", "dad"), outs[True], outs[False]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
