"""End-to-end IR correctness: every model family's op graph, lowered to XLA,
must match the independent dense-adjacency numpy oracle."""
import numpy as np
import jax
import pytest

from gta_graph_tensor_acclelrator_for_general_gnn_tpu import (
    build_graph, build_op_graph, init_params, lower, ir,
)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models import dense_oracle as O

from conftest import small_graph

N, F, OUT = 50, 24, 16


def _setup(rng, network, reorder=False, symmetric_norm=False, **kw):
    senders, receivers = small_graph(rng, n=N, e=300)
    g = build_graph(senders, receivers, N, symmetric_norm=symmetric_norm,
                    edge_pad_multiple=64)
    graph_def = build_op_graph(network, F, OUT, reorder=reorder, **kw)
    params = init_params(graph_def, jax.random.key(0))
    x = rng.normal(size=(N, F)).astype(np.float32)
    apply = jax.jit(lower(graph_def))
    out = np.asarray(apply(params, g, x))
    # use the graph's own (sorted) edge arrays so weights line up
    s = np.asarray(g.senders)[: g.n_edge]
    r = np.asarray(g.receivers)[: g.n_edge]
    ew = np.asarray(g.edge_weight)[: g.n_edge]
    A_w, A_cnt = O.dense_mats(s, r, ew, N)
    np_params = {k: np.asarray(v, np.float64) for k, v in params.items()}
    return out, np_params, x.astype(np.float64), A_w, A_cnt


@pytest.mark.parametrize("reorder", [False, True])
def test_gcn(rng, reorder):
    out, p, x, A_w, _ = _setup(rng, "GCN", reorder, symmetric_norm=True)
    exp = O.gcn(p, x, A_w, reorder=reorder)
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-4)


def test_sgc(rng):
    out, p, x, A_w, _ = _setup(rng, "SGC", symmetric_norm=True)
    np.testing.assert_allclose(out, O.sgc(p, x, A_w), rtol=1e-4, atol=1e-4)


def test_graphsage(rng):
    out, p, x, _, A_cnt = _setup(rng, "GraphSAGE")
    np.testing.assert_allclose(out, O.graphsage(p, x, A_cnt), rtol=1e-4, atol=1e-4)


def test_gin(rng):
    out, p, x, _, A_cnt = _setup(rng, "GIN")
    np.testing.assert_allclose(out, O.gin(p, x, A_cnt), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reorder", [False, True])
def test_gat(rng, reorder):
    out, p, x, _, A_cnt = _setup(rng, "GAT", reorder, heads=4)
    exp = O.gat(p, x, A_cnt, heads=4)
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-4)


def test_gat_variants_agree(rng):
    """original and trans GAT are algebraic reorderings of the same math."""
    out1, p, x, _, A_cnt = _setup(rng, "GAT", False, heads=4)
    out2, *_ = _setup(np.random.default_rng(0), "GAT", True, heads=4)
    np.testing.assert_allclose(out1, out2, rtol=1e-4, atol=1e-4)


def test_dgn(rng):
    out, p, x, _, A_cnt = _setup(rng, "DGN")
    np.testing.assert_allclose(out, O.dgn(p, x, A_cnt), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reorder", [False, True])
def test_pna(rng, reorder):
    out, p, x, _, A_cnt = _setup(rng, "PNA", reorder)
    np.testing.assert_allclose(out, O.pna(p, x, A_cnt), rtol=1e-4, atol=1e-4)


def test_fusion_legality():
    graph_def = build_op_graph("GAT", F, OUT, heads=4)
    # every-op-own-block is always legal
    singleton = [[op.op_id] for op in graph_def.ops]
    assert ir.partition_is_legal(graph_def, singleton)
    # whole-graph-single-block hits gather->scatter breakpoints in GAT
    whole = [[op.op_id for op in graph_def.ops]]
    assert not ir.partition_is_legal(graph_def, whole)


def test_topo_and_edges():
    graph_def = build_op_graph("GCN", F, OUT)
    assert graph_def.topo_order() == [0, 1, 2, 3]
    assert (0, 1) in graph_def.edges() and (2, 3) in graph_def.edges()


def test_reorder_nodes_density_and_correctness(rng):
    """Degree relabelling must preserve semantics (logits permute)."""
    import jax
    import jax.numpy as jnp
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import reorder_nodes
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import (
        init_params, lower)
    import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
    from conftest import small_graph

    s, r = small_graph(rng, n=120, e=900)
    hg = gta.build_host_graph(s, r, 120, add_self_loops=True,
                              symmetric_norm=True)
    g2, perm = reorder_nodes(hg)
    assert g2.e_pad == hg.e_pad and g2.n_edge == hg.n_edge
    og = gta.build_op_graph("GCN", 10, 6)
    params = init_params(og, jax.random.key(0))
    x = rng.normal(size=(120, 10)).astype(np.float32)
    out1 = np.asarray(lower(og)(params, hg.to_device(), jnp.asarray(x)))
    out2 = np.asarray(lower(og)(params, g2.to_device(), jnp.asarray(x[perm])))
    np.testing.assert_allclose(out2, out1[perm], rtol=2e-5, atol=2e-5)
