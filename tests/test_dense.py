"""Dense-block kernels + density-split (hybrid) dispatch vs the XLA oracle."""
import jax
import jax.numpy as jnp
import numpy as np

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu import ir
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
    schedule as S)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.fusion import (
    lower_schedule)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import (
    init_params, lower)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    block_nnz, build_host_graph, hybrid_graph)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import dense as D
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import primitives as P

from conftest import small_graph


def _graphs(rng, n=50, e=250, **kw):
    s, r = small_graph(rng, n=n, e=e)
    hg = build_host_graph(s, r, n, edge_pad_multiple=128, **kw)
    return hg, hg.to_device()


def test_block_nnz_counts(rng):
    hg, _ = _graphs(rng)
    nnz = block_nnz(hg, 32, 32)
    assert nnz.sum() == hg.n_edge
    assert nnz.shape == (2, 2)


def test_hybrid_split_partitions_edges(rng):
    hg, _ = _graphs(rng)
    hyb = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                       min_nnz=20)
    assert hyb.n_dense_edges + hyb.n_sparse_edges == hg.n_edge
    assert hyb.n_dense_edges > 0          # 4 blocks x ~60 edges each
    # dense values hold exactly the dense edges' weight mass
    tot = float(np.asarray(hyb.dense.values).sum()) if hyb.dense else 0.0
    np.testing.assert_allclose(
        tot, np.sum(hg.edge_weight[: hg.n_edge]) - float(
            np.asarray(hyb.tiles.weight).sum()), rtol=1e-5)


def test_spmm_dense_standalone(rng):
    hg, g = _graphs(rng, symmetric_norm=True)
    hyb = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                       min_nnz=1)    # everything dense
    assert hyb.n_sparse_edges == 0
    x = jnp.asarray(rng.normal(size=(hg.n_node, 16)).astype(np.float32))
    y = D.spmm_dense(hyb.dense, x, interpret=True)[: hg.n_node]
    e = P.scatter_to_edges(x, g, "C") * g.edge_weight[:, None]
    y_ref = P.gather_to_nodes(e, g, ir.ADD)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_spmm_hybrid_matches_oracle(rng):
    hg, g = _graphs(rng, symmetric_norm=True)
    hyb = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                       min_nnz=40)   # genuine split
    assert hyb.n_dense_edges and hyb.n_sparse_edges
    x = jnp.asarray(rng.normal(size=(hg.n_node, 16)).astype(np.float32))
    y = D.spmm_hybrid(hyb, g, x, interpret=True)[: hg.n_node]
    e = P.scatter_to_edges(x, g, "C") * g.edge_weight[:, None]
    y_ref = P.gather_to_nodes(e, g, ir.ADD)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    # linear VJP is exact
    f = lambda v: jnp.sum(D.spmm_hybrid(hyb, g, v, interpret=True) ** 2)
    fr = lambda v: jnp.sum(
        P.gather_to_nodes(
            P.scatter_to_edges(v, g, "C") * g.edge_weight[:, None],
            g, ir.ADD) ** 2)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                               np.asarray(jax.grad(fr)(x)),
                               rtol=1e-3, atol=1e-3)


def test_gat_hybrid_matches_oracle(rng):
    hg, g = _graphs(rng)
    hyb = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                       min_nnz=40, unit_weight=True)
    assert hyb.n_dense_edges and hyb.n_sparse_edges
    H, HD = 2, 8
    h = jnp.asarray(rng.normal(size=(hg.n_node, HD)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))
    out = D.gat_hybrid(hyb, g, h, a_s, a_d, interpret=True)
    ref = D._gat_reference_g(g, h, a_s, a_d, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # gradients through the custom VJP
    f = lambda v: jnp.sum(D.gat_hybrid(hyb, g, v, a_s, a_d,
                                       interpret=True) ** 2)
    fr = lambda v: jnp.sum(D._gat_reference_g(g, v, a_s, a_d, 0.2) ** 2)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(h)),
                               np.asarray(jax.grad(fr)(h)),
                               rtol=1e-3, atol=1e-3)


def test_gat_hybrid_large_logits(rng):
    """The data-dependent shift bound stays exact at logit scales far past
    where the round-1 static SHIFT=12 scheme saturated (logits > 72).  The
    bound's documented domain is a_src spread < ~80 (see ops/gat.py) —
    scale-10 normals give |logits| up to ~60 with spread ~60."""
    hg, g = _graphs(rng)
    hyb = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                       min_nnz=40, unit_weight=True)
    H, HD = 2, 8
    h = jnp.asarray(rng.normal(size=(hg.n_node, HD)).astype(np.float32))
    a_s = jnp.asarray((10.0 * rng.normal(size=(hg.n_node, H))).astype(np.float32))
    a_d = jnp.asarray((10.0 * rng.normal(size=(hg.n_node, H))).astype(np.float32))
    out = D.gat_hybrid(hyb, g, h, a_s, a_d, interpret=True)
    ref = D._gat_reference_g(g, h, a_s, a_d, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_schedule_hybrid_path_gcn(rng):
    """PATH_HYBRID through the full schedule lowering (GCN aggregation)."""
    hg, g = _graphs(rng, symmetric_norm=True)
    og = gta.build_op_graph("GCN", 12, 8)
    params = init_params(og, jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(hg.n_node, 12)).astype(np.float32))
    ref = lower(og)(params, g, x)

    sched = S.default_schedule(og)
    tc = S.TileConfig(block_rows=32, block_cols=32, tile_edges=64,
                      path=S.PATH_HYBRID)
    sched = S.Schedule(blocks=sched.blocks,
                       tiles=tuple(tc for _ in sched.blocks))
    out = lower_schedule(og, sched, hg, interpret=True)(params, g, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_schedule_hybrid_path_gat(rng):
    hg, g = _graphs(rng)
    og = gta.build_op_graph("GAT", 8, 8, heads=2)
    params = init_params(og, jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(hg.n_node, 8)).astype(np.float32))
    ref = lower(og)(params, g, x)

    sched = S.default_schedule(og)
    tc = S.TileConfig(block_rows=32, block_cols=32, tile_edges=64,
                      path=S.PATH_HYBRID)
    sched = S.Schedule(blocks=sched.blocks,
                       tiles=tuple(tc for _ in sched.blocks))
    fn = lower_schedule(og, sched, hg, interpret=True)
    out = fn(params, g, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss(f):
        return lambda p: jnp.sum(f(p, g, x) ** 2)

    g_fused = jax.grad(loss(fn))(params)
    g_ref = jax.grad(loss(lower(og)))(params)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_fused[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=2e-4, atol=2e-5)


def test_sparse_input_mm_matches_dense(rng):
    """isSinput: X @ W over baked nonzeros == dense matmul; exact VJP."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import sinput

    n, fin, fout = 60, 90, 16
    x = (rng.random((n, fin)) < 0.05).astype(np.float32) * \
        rng.normal(size=(n, fin)).astype(np.float32)
    assert sinput.density(x) < 0.5
    fg = sinput.feature_graph(x, block=32, tile_edges=64)
    assert fg.nnz == np.count_nonzero(x)
    w = jnp.asarray(rng.normal(size=(fin, fout)).astype(np.float32))
    y = sinput.sparse_input_mm(fg, w, interpret=True)
    np.testing.assert_allclose(np.asarray(y), x @ np.asarray(w),
                               rtol=1e-4, atol=1e-4)
    gr = jax.grad(lambda v: jnp.sum(
        sinput.sparse_input_mm(fg, v, interpret=True) ** 2))(w)
    gr_ref = jax.grad(lambda v: jnp.sum(
        (jnp.asarray(x) @ v) ** 2))(w)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref),
                               rtol=1e-3, atol=1e-3)


def test_schedule_sinput_auto_enable(rng):
    """lower_schedule(x_host=sparse X) swaps the first-layer MM to the
    sparse-input path and still matches the dense lowering."""
    hg, g = _graphs(rng, symmetric_norm=True)
    og = gta.build_op_graph("GCN", 24, 8)
    params = init_params(og, jax.random.key(0))
    xs = (rng.random((hg.n_node, 24)) < 0.1).astype(np.float32) * \
        rng.normal(size=(hg.n_node, 24)).astype(np.float32)
    x = jnp.asarray(xs)
    ref = lower(og)(params, g, x)

    sched = S.default_schedule(og)
    tc = S.TileConfig(block_rows=32, block_cols=32, tile_edges=64)
    sched = S.Schedule(blocks=sched.blocks,
                       tiles=tuple(tc for _ in sched.blocks))
    out = lower_schedule(og, sched, hg, interpret=True,
                         x_host=xs)(params, g, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_sddmm_block_lowering(rng):
    """scatter(C)+scatter(R)+apply_edge(ADD) singleton block lowers through
    the SDDMM kernel and matches XLA, including gradients."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.fusion import (
        match_sddmm)
    hg, g = _graphs(rng)
    og = gta.build_op_graph("GAT", 8, 8, heads=2)
    # find the logit block ops: the ADD of two scatters plus the scatters
    add_op = next(op for op in og.ops
                  if op.kind == ir.APPLY_EDGE and op.compute == ir.ADD)
    block = tuple(sorted(add_op.inputs + [add_op.op_id]))
    assert match_sddmm(og, block) is not None

    blocks = [block] + [(o.op_id,) for o in og.ops if o.op_id not in block]
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.schedule import (
        _order_blocks)
    part = tuple(tuple(b) for b in _order_blocks(og, [list(b) for b in blocks]))
    tiles = tuple(
        S.TileConfig(block_rows=32, block_cols=32, tile_edges=64)
        if match_sddmm(og, b) else S.TileConfig(path=S.PATH_XLA)
        for b in part)
    params = init_params(og, jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(hg.n_node, 8)).astype(np.float32))
    fn = lower_schedule(og, S.Schedule(blocks=part, tiles=tiles), hg,
                        interpret=True)
    ref_fn = lower(og)
    np.testing.assert_allclose(np.asarray(fn(params, g, x)),
                               np.asarray(ref_fn(params, g, x)),
                               rtol=1e-4, atol=1e-4)
    g1 = jax.grad(lambda p: jnp.sum(fn(p, g, x) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(ref_fn(p, g, x) ** 2))(params)
    for k in g2:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=2e-4, atol=2e-5)


def test_spmm_dense_supertiled(rng):
    """Supertiled (x-panel-reuse) dense kernel == rb-major dense kernel."""
    hg, g = _graphs(rng, n=120, e=900, symmetric_norm=True)
    x = jnp.asarray(rng.normal(size=(hg.n_node, 16)).astype(np.float32))
    hyb0 = hybrid_graph(hg, block_rows=16, block_cols=16, tile_edges=64,
                        min_nnz=1)
    hybG = hybrid_graph(hg, block_rows=16, block_cols=16, tile_edges=64,
                        min_nnz=1, supergroup=4)
    assert hybG.dense.supergroup == 4
    y0 = D.spmm_dense(hyb0.dense, x, interpret=True)[: hg.n_node]
    yG = D.spmm_dense(hybG.dense, x, interpret=True)[: hg.n_node]
    np.testing.assert_allclose(np.asarray(yG), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)


def test_hybrid_bf16_values(rng):
    """ml_dtypes.bfloat16 host values round-trip through the dense kernel."""
    import ml_dtypes
    hg, g = _graphs(rng, symmetric_norm=True)
    hyb = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                       min_nnz=1, values_dtype=ml_dtypes.bfloat16)
    assert hyb.dense.values.dtype == jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(hg.n_node, 16)).astype(np.float32))
    y = D.spmm_dense(hyb.dense, x, interpret=True)[: hg.n_node]
    e = P.scatter_to_edges(x, g, "C") * g.edge_weight[:, None]
    y_ref = P.gather_to_nodes(e, g, ir.ADD)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-2)


def test_spmm_dense_int8_separable(rng):
    """int8 count blocks + separable degree scaling == the f32 weighted
    dense kernel (symmetric norm w_e = deg_in[r]^-1/2 * deg_out[s]^-1/2
    factorises exactly; the int8 store halves dense A traffic)."""
    hg, g = _graphs(rng, n=120, e=900, symmetric_norm=True)
    x = jnp.asarray(rng.normal(size=(hg.n_node, 16)).astype(np.float32))
    hyb_f = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                         min_nnz=1)
    hyb_i = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                         min_nnz=1, values_dtype=np.int8)
    assert hyb_i.dense.values.dtype == jnp.int8
    deg_in = np.bincount(hg.receivers[: hg.n_edge], minlength=hg.n_node)
    deg_out = np.bincount(hg.senders[: hg.n_edge], minlength=hg.n_node)
    rs = jnp.asarray(1.0 / np.sqrt(np.maximum(deg_in, 1)), jnp.float32)
    cs = jnp.asarray(1.0 / np.sqrt(np.maximum(deg_out, 1)), jnp.float32)
    y_f = D.spmm_dense(hyb_f.dense, x, interpret=True)[: hg.n_node]
    y_i = D.spmm_dense(hyb_i.dense, x, interpret=True,
                       row_scale=rs, col_scale=cs)[: hg.n_node]
    np.testing.assert_allclose(np.asarray(y_i), np.asarray(y_f),
                               rtol=1e-4, atol=1e-4)
    # int8 counts also serve the GAT mask path (unit-weight edges)
    hyb_g = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                         min_nnz=1, unit_weight=True, values_dtype=np.int8)
    H, HD = 2, 8
    h = jnp.asarray(rng.normal(size=(hg.n_node, HD)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))
    msrc = jnp.max(a_s, axis=0, keepdims=True)
    acc_i = D.gat_dense_partial(hyb_g.dense, h, a_s, a_d, msrc,
                                interpret=True)
    hyb_gf = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                          min_nnz=1, unit_weight=True)
    acc_f = D.gat_dense_partial(hyb_gf.dense, h, a_s, a_d, msrc,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(acc_i), np.asarray(acc_f),
                               rtol=1e-4, atol=1e-4)


def test_gat_wide_derive_asrc(rng):
    """Width-128 repack: the WIDE row-major kernel with w_asrc derives
    a_src in-kernel (pass-1 gather stays one 128-lane chunk) and matches
    the packed-values oracle."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        tile_graph)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import (
        NARROW_T, gat_attention)
    hg, g = _graphs(rng, n=120, e=900)
    tg = tile_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                    unit_weight=True)
    H, HD = 2, 64
    assert HD + H > NARROW_T    # forces the row-major (derive) kernel
    h = jnp.asarray(rng.normal(size=(hg.n_node, HD)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(HD, H)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))
    out = gat_attention(tg, h, None, a_d, heads=H, w_asrc=w, interpret=True)
    ref = D._gat_reference_g(g, h, jnp.dot(h, w), a_d, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # gradients flow through the custom VJP (h and w)
    f = lambda v, wv: jnp.sum(gat_attention(tg, v, None, a_d, heads=H,
                                            w_asrc=wv, interpret=True) ** 2)
    fr = lambda v, wv: jnp.sum(
        D._gat_reference_g(g, v, jnp.dot(v, wv), a_d, 0.2) ** 2)
    gh, gw = jax.grad(f, argnums=(0, 1))(h, w)
    gh_r, gw_r = jax.grad(fr, argnums=(0, 1))(h, w)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)


def test_gat_chunked_matches_single_call(rng):
    """Stripe-chunked GAT dispatch (SMEM scalar-prefetch cap) == one call,
    in both the narrow (transposed) and wide (row-major) kernels."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        tile_graph)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import (
        _gat_forward)
    hg, g = _graphs(rng, n=120, e=900)
    tg = tile_graph(hg, block_rows=16, block_cols=16, tile_edges=32,
                    unit_weight=True)
    assert tg.n_tiles > 8 and tg.row_first_host is not None
    a_d = jnp.asarray(rng.normal(size=(hg.n_node, 2)).astype(np.float32))
    for HD in (8, 64):   # narrow / wide
        h = jnp.asarray(rng.normal(size=(hg.n_node, HD)).astype(np.float32))
        a_s = jnp.asarray(rng.normal(size=(hg.n_node, 2)).astype(np.float32))
        y1 = _gat_forward(tg, h, a_s, a_d, interpret=True)
        y2 = _gat_forward(tg, h, a_s, a_d, interpret=True,
                          max_tiles_per_call=4)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=1e-5, atol=1e-5)


def test_gat_chain_single_head_dim(rng):
    """HD == H (head_dim 1, the reference layer3 config) elides the head
    expansion entirely — must still match the oracle."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import tile_graph
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import (
        gat_attention)
    hg, g = _graphs(rng)
    tg = tile_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                    unit_weight=True)
    H = 8
    h = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))
    out = gat_attention(tg, h, a_s, a_d, heads=H, interpret=True)
    ref = D._gat_reference_g(g, h, a_s, a_d, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_gat_dense_partial_transposed_matches_wide(rng):
    """The 'cr' (transposed) dense attention kernel must agree exactly with
    the wide 'rc' kernel — same num/den partials from either layout."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        hybrid_graph)

    s, r = small_graph(rng, n=500, e=15000, multi_edges=True)
    hg = gta.build_host_graph(s, r, 500)
    H, HD = 4, 32
    kw = dict(block_rows=128, block_cols=128, tile_edges=128, min_nnz=30,
              unit_weight=True, values_dtype=np.int8)
    h_rc = hybrid_graph(hg, **kw)
    h_cr = hybrid_graph(hg, block_layout="cr", **kw)
    assert h_rc.dense is not None and h_cr.dense is not None
    assert h_cr.dense.values_layout == "cr"
    h = jnp.asarray(rng.normal(size=(500, HD)), jnp.float32)
    a_s = jnp.asarray(rng.normal(size=(500, H)), jnp.float32)
    a_d = jnp.asarray(rng.normal(size=(500, H)), jnp.float32)
    msrc = jnp.max(a_s, axis=0, keepdims=True)
    acc_rc = D.gat_dense_partial(h_rc.dense, h, a_s, a_d, msrc,
                                 interpret=True)
    acc_cr = D.gat_dense_partial(h_cr.dense, h, a_s, a_d, msrc,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(acc_cr), np.asarray(acc_rc),
                               rtol=1e-5, atol=1e-5)


def test_hybrid_int8_multiedge_overflow_exact(rng):
    """Pair multiplicity above the int8 max must not wrap: the excess
    copies are evicted to the edge tail, keeping the hybrid result exact
    (the synthetic Reddit generator emits such multi-edges at scale)."""
    s, r = small_graph(rng, n=64, e=800, multi_edges=True)
    s = np.concatenate([s, np.full(200, 3, np.int32)])
    r = np.concatenate([r, np.full(200, 5, np.int32)])
    hg = build_host_graph(s, r, 64, edge_pad_multiple=128)
    hyb = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                       min_nnz=20, values_dtype=np.int8)
    assert hyb.n_dense_edges + hyb.n_sparse_edges == hg.n_edge
    vals = np.asarray(hyb.dense.values)
    assert vals.max() == 127 and vals.min() >= 0
    g = hg.to_device()
    x = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    y = D.spmm_hybrid(hyb, g, x, interpret=True)[:64]
    e = P.scatter_to_edges(x, g, "C") * g.edge_weight[:, None]
    y_ref = P.gather_to_nodes(e, g, ir.ADD)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_gat_hybrid_grads_ignore_edge_weights(rng):
    """Forward kernels run unit-weight; the custom-VJP backward must
    differentiate the same (unweighted) function even on a sym-norm graph
    (regression: it used to differentiate the WEIGHTED softmax)."""
    hg, g = _graphs(rng, symmetric_norm=True)
    hyb = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                       min_nnz=40, unit_weight=True)
    h = jnp.asarray(rng.normal(size=(hg.n_node, 16)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(hg.n_node, 4)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(hg.n_node, 4)).astype(np.float32))
    # forward equals the UNWEIGHTED oracle despite g's sym-norm weights
    out = D.gat_hybrid(hyb, g, h, a_s, a_d, interpret=True)
    ref = D._gat_reference_g(g, h, a_s, a_d, 0.2, weighted=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # gradients match the same unweighted formulation
    f = lambda v: jnp.sum(D.gat_hybrid(hyb, g, v, a_s, a_d,
                                       interpret=True) ** 2)
    fr = lambda v: jnp.sum(
        D._gat_reference_g(g, v, a_s, a_d, 0.2, weighted=False) ** 2)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(h)),
                               np.asarray(jax.grad(fr)(h)),
                               rtol=1e-3, atol=1e-3)


def test_spmm_hybrid_with_tile_classes(rng):
    """hybrid_graph(tile_classes=...) routes the tail through multi-class
    tiles; forward and gradients stay exact."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        MultiTiledGraph)
    hg, g = _graphs(rng, n=96, e=1200, symmetric_norm=True)
    hyb = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                       min_nnz=30, tile_classes=(32, 64, 128))
    assert isinstance(hyb.tiles, MultiTiledGraph)
    x = jnp.asarray(rng.normal(size=(hg.n_node, 16)).astype(np.float32))
    y = D.spmm_hybrid(hyb, g, x, interpret=True)[: hg.n_node]
    e = P.scatter_to_edges(x, g, "C") * g.edge_weight[:, None]
    y_ref = P.gather_to_nodes(e, g, ir.ADD)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    f = lambda v: jnp.sum(D.spmm_hybrid(hyb, g, v, interpret=True) ** 2)
    fr = lambda v: jnp.sum(D._spmm_ref_g(g, v) ** 2)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                               np.asarray(jax.grad(fr)(x)),
                               rtol=1e-3, atol=1e-3)


def test_gat_hybrid_with_tile_classes(rng):
    """GAT hybrid with a multi-class tail: per-class partial (num, den)
    softmax accumulators must compose exactly under the shared msrc shift."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        MultiTiledGraph)
    hg, g = _graphs(rng, n=96, e=1200, symmetric_norm=True)
    hyb = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                       min_nnz=40, unit_weight=True,
                       tile_classes=(32, 64, 128))
    assert isinstance(hyb.tiles, MultiTiledGraph)
    h = jnp.asarray(rng.normal(size=(hg.n_node, 16)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(hg.n_node, 4)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(hg.n_node, 4)).astype(np.float32))
    out = D.gat_hybrid(hyb, g, h, a_s, a_d, interpret=True)
    ref = D._gat_reference_g(g, h, a_s, a_d, 0.2, weighted=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_auto_hybrid_spmm_and_gat(rng):
    """auto_hybrid picks thresholds/geometry from the measured model and
    the result executes exactly for both kinds."""
    hg, g = _graphs(rng, n=96, e=1500, symmetric_norm=True)
    hyb = D.auto_hybrid(hg, kind="spmm", dense_block=32,
                        tail_geometries=((64, 64), (96, 64)))
    x = jnp.asarray(rng.normal(size=(hg.n_node, 16)).astype(np.float32))
    deg_in = np.bincount(hg.receivers[: hg.n_edge], minlength=96)
    deg_out = np.bincount(hg.senders[: hg.n_edge], minlength=96)
    # int8 count blocks need the separable norm factors at execution
    rs = jnp.asarray(1 / np.sqrt(np.maximum(deg_in, 1)), jnp.float32)
    cs = jnp.asarray(1 / np.sqrt(np.maximum(deg_out, 1)), jnp.float32)
    y = spmm_tiles = None
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
        spmm as spmm_mod)
    y = spmm_mod.spmm(hyb.tiles, x, interpret=True)
    if hyb.dense is not None:
        y = y + D.spmm_dense(hyb.dense, x, row_scale=rs, col_scale=cs,
                             interpret=True)[: y.shape[0]]
    e = P.scatter_to_edges(x, g, "C") * g.edge_weight[:, None]
    y_ref = P.gather_to_nodes(e, g, ir.ADD)
    np.testing.assert_allclose(np.asarray(y[:96]), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    # gat kind builds unit-weight 'cr' tiles
    hyb_g = D.auto_hybrid(hg, kind="gat", dense_block=32, heads=4,
                          head_dim=4,
                          tail_geometries=((64, 64),))
    assert hyb_g.n_dense_edges + hyb_g.n_sparse_edges == hg.n_edge


def test_gat_hybrid_multiedge_overflow_exact(rng):
    """Attention with pair multiplicity above the int8 cap: the excess
    copies merge into one tail slot carrying the COUNT, and the kernels
    scale each exp term by it — exact vs the per-copy oracle."""
    s, r = small_graph(rng, n=64, e=700, multi_edges=True)
    s = np.concatenate([s, np.full(180, 7, np.int32)])   # 180 copies of 7->9
    r = np.concatenate([r, np.full(180, 9, np.int32)])
    hg = build_host_graph(s, r, 64, edge_pad_multiple=128,
                          symmetric_norm=True)
    g = hg.to_device()
    hyb = hybrid_graph(hg, block_rows=32, block_cols=32, tile_edges=64,
                       min_nnz=20, unit_weight=True, values_dtype=np.int8)
    # the guard must have merged: fewer physical tail slots than copies
    h = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
    out = D.gat_hybrid(hyb, g, h, a_s, a_d, interpret=True)
    ref = D._gat_reference_g(g, h, a_s, a_d, 0.2, weighted=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def _hyb_pair(hg, **kw):
    """Forward hybrid + transposed twin (the kernel-backward pair)."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        transpose_host_graph)
    hg_t, _ = transpose_host_graph(hg)
    kw.setdefault("block_layout", "cr")
    kw.setdefault("unit_weight", True)
    return (hybrid_graph(hg, **kw), hybrid_graph(hg_t, **kw))


def test_gat_hybrid_kernel_backward_parity(rng):
    """The r5 kernel backward (fused tile-domain tail + dense-block VJP
    kernels) matches autodiff of the XLA segment oracle for ALL THREE
    inputs (h, a_src, a_dst) on a genuine dense/tail split."""
    hg, g = _graphs(rng, n=96, e=900)
    hyb, hyb_t = _hyb_pair(hg, block_rows=32, block_cols=32, tile_edges=64,
                           min_nnz=105)
    assert hyb.n_dense_edges and hyb.n_sparse_edges
    H, HD = 2, 8
    h = jnp.asarray(rng.normal(size=(hg.n_node, HD)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))
    # forward parity first (the 'cr' + hyb_t path)
    out = D.gat_hybrid(hyb, g, h, a_s, a_d, interpret=True, hyb_t=hyb_t)
    ref = D._gat_reference_g(g, h, a_s, a_d, 0.2, weighted=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    w = jnp.asarray(rng.normal(size=(HD, 3)).astype(np.float32))

    def loss(fn):
        def inner(hh, ss, dd):
            y = fn(hh, ss, dd)
            return jnp.sum(jnp.tanh(y @ w) ** 2)
        return inner

    gk = jax.grad(loss(lambda *a: D.gat_hybrid(
        hyb, g, *a, interpret=True, hyb_t=hyb_t)), argnums=(0, 1, 2))(
            h, a_s, a_d)
    gr = jax.grad(loss(lambda *a: D._gat_reference_g(
        g, *a, 0.2, weighted=False)), argnums=(0, 1, 2))(h, a_s, a_d)
    for name, k, r in zip(("dh", "das", "dad"), gk, gr):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_gat_hybrid_kernel_backward_all_dense(rng):
    """Kernel backward with an all-dense split (no tail edges)."""
    hg, g = _graphs(rng, n=64, e=600)
    hyb, hyb_t = _hyb_pair(hg, block_rows=32, block_cols=32, tile_edges=64,
                           min_nnz=1)
    assert hyb.n_sparse_edges == 0
    H, HD = 2, 8
    h = jnp.asarray(rng.normal(size=(hg.n_node, HD)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))
    f = lambda v: jnp.sum(D.gat_hybrid(hyb, g, v, a_s, a_d,
                                       interpret=True, hyb_t=hyb_t) ** 2)
    fr = lambda v: jnp.sum(D._gat_reference_g(g, v, a_s, a_d, 0.2,
                                              weighted=False) ** 2)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(h)),
                               np.asarray(jax.grad(fr)(h)),
                               rtol=1e-3, atol=1e-3)


def test_gat_hybrid_kernel_backward_int8_multiedge(rng):
    """Kernel backward stays exact when int8 dense blocks carry pair
    multiplicities and the tail holds merged residual copies."""
    s, r = small_graph(rng, n=64, e=700, multi_edges=True)
    s = np.concatenate([s, np.full(180, 7, np.int32)])
    r = np.concatenate([r, np.full(180, 9, np.int32)])
    hg = build_host_graph(s, r, 64, edge_pad_multiple=128)
    g = hg.to_device()
    hyb, hyb_t = _hyb_pair(hg, block_rows=32, block_cols=32, tile_edges=64,
                           min_nnz=20, values_dtype=np.int8)
    H, HD = 2, 8
    h = jnp.asarray(rng.normal(size=(64, HD)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(64, H)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(64, H)).astype(np.float32))
    gk = jax.grad(lambda v: jnp.sum(D.gat_hybrid(
        hyb, g, v, a_s, a_d, interpret=True, hyb_t=hyb_t) ** 2),
    )(h)
    gr = jax.grad(lambda v: jnp.sum(D._gat_reference_g(
        g, v, a_s, a_d, 0.2, weighted=False) ** 2))(h)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=2e-3, atol=2e-3)


def test_spmm_densefull_path(rng):
    """PATH_DENSEFULL: the full dense adjacency matmul path (medium-N
    regime) matches the XLA oracle and is differentiable (plain dot)."""
    hg, g = _graphs(rng, symmetric_norm=True)
    og = gta.build_op_graph("GCN", 12, 8)
    params = init_params(og, jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(hg.n_node, 12)).astype(np.float32))
    ref = lower(og)(params, g, x)
    part = S.aggregation_partition(og)
    tiles = tuple(
        S.TileConfig(path=S.PATH_DENSEFULL) if len(b) > 1
        else S.TileConfig(path=S.PATH_XLA) for b in part)
    sched = S.Schedule(blocks=part, tiles=tiles)
    fn = lower_schedule(og, sched, hg)
    out = fn(params, g, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)   # bf16 A
    gk = jax.grad(lambda v: jnp.sum(fn(params, g, v) ** 2))(x)
    gr = jax.grad(lambda v: jnp.sum(lower(og)(params, g, v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=5e-2, atol=5e-2)


def test_densefull_modelled_and_guarded(rng):
    """The latency model prices densefull; past the node cap the lowering
    and the model both fall back to XLA."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
        latency as L)
    hg, _ = _graphs(rng)
    og = gta.build_op_graph("GCN", 12, 8)
    part = S.aggregation_partition(og)
    agg = next(b for b in part if len(b) > 1)
    cost = L.GraphCost(hg)
    t = L.block_ns(og, agg, S.TileConfig(path=S.PATH_DENSEFULL), cost)
    assert 0 < t < 1e9


def test_spmm_densefull_mean_gather(rng):
    """densefull under a MEAN gather (GraphSAGE aggregation): the dense
    matmul computes the SUM; the 1/in-degree post-scale must wire up
    (regression: zoo r5 SAGE pick crashed on a None inv_deg)."""
    hg, g = _graphs(rng)
    og = gta.build_op_graph("GraphSAGE", 12, 8)
    params = init_params(og, jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(hg.n_node, 12)).astype(np.float32))
    ref = lower(og)(params, g, x)
    part = S.aggregation_partition(og)
    tiles = tuple(
        S.TileConfig(path=S.PATH_DENSEFULL) if len(b) > 1
        else S.TileConfig(path=S.PATH_XLA) for b in part)
    fn = lower_schedule(og, S.Schedule(blocks=part, tiles=tiles), hg)
    out = fn(params, g, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_gat_hybrid_wmode_kernel_backward(rng):
    """gat_hybrid derive mode (w_asrc instead of a_src values): forward
    parity + (dh, dw, dad) against autodiff of the XLA oracle."""
    hg, g = _graphs(rng, n=96, e=900)
    hyb, hyb_t = _hyb_pair(hg, block_rows=32, block_cols=32, tile_edges=64,
                           min_nnz=105)
    H, HD = 2, 8
    h = jnp.asarray(rng.normal(size=(hg.n_node, HD)).astype(np.float32))
    w = jnp.asarray((0.3 * rng.normal(size=(HD, H))).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(hg.n_node, H)).astype(np.float32))

    out = D.gat_hybrid(hyb, g, h, None, a_d, interpret=True, hyb_t=hyb_t,
                       w_asrc=w)
    ref = D._gat_reference_g(g, h, h @ w, a_d, 0.2, weighted=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss_k(hh, ww, dd):
        return jnp.sum(D.gat_hybrid(hyb, g, hh, None, dd, interpret=True,
                                    hyb_t=hyb_t, w_asrc=ww) ** 2)

    def loss_r(hh, ww, dd):
        return jnp.sum(D._gat_reference_g(g, hh, hh @ ww, dd, 0.2,
                                          weighted=False) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(h, w, a_d)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(h, w, a_d)
    for name, k, r in zip(("dh", "dw", "dad"), gk, gr):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_batch_host_graph_alignment(rng):
    """batch_host_graph: per-copy node ranges are stride-aligned, edges
    replicate exactly, and pad_batch_features matches the layout."""
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        batch_host_graph, pad_batch_features)
    s, r = small_graph(rng, n=50, e=200)
    hg = build_host_graph(s, r, 50, edge_pad_multiple=128,
                          symmetric_norm=True)
    B = 4
    bhg = batch_host_graph(hg, B)
    stride = 1024                      # round_up(50, 1024)
    assert bhg.n_node == B * stride
    assert bhg.n_edge == B * hg.n_edge
    ne = hg.n_edge
    for b in range(B):
        sl = slice(b * ne, (b + 1) * ne)
        np.testing.assert_array_equal(
            np.sort(bhg.senders[sl] - b * stride),
            np.sort(hg.senders[:ne]))
        np.testing.assert_array_equal(
            np.sort(bhg.receivers[sl] - b * stride),
            np.sort(hg.receivers[:ne]))
    # per-copy weight mass preserved
    np.testing.assert_allclose(
        bhg.edge_weight[: B * ne].sum(),
        B * hg.edge_weight[: ne].sum(), rtol=1e-5)
    x = rng.normal(size=(B, 50, 8)).astype(np.float32)
    xp = pad_batch_features(x, B, 50)
    assert xp.shape == (B * stride, 8)
    np.testing.assert_array_equal(xp[stride: stride + 50], x[1])
    assert np.all(xp[50: stride] == 0)


def test_hybrid_threshold_budget_raise(rng):
    """hybrid_threshold raises the FLOP-balance threshold until the dense
    value store fits the byte budget."""
    hg, _ = _graphs(rng, n=96, e=900)
    base = D.hybrid_threshold(hg, "spmm", dense_rows=32, dense_cols=32,
                              budget=1 << 30)
    tight = D.hybrid_threshold(hg, "spmm", dense_rows=32, dense_cols=32,
                               budget=32 * 32 * 2)   # room for ~2 blocks
    assert tight >= base
    nnz = block_nnz(hg, 32, 32).reshape(-1)
    assert (nnz >= tight).sum() <= 2
