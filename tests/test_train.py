"""Training-loop convergence tests (the reference has no training; the
framework's correctness anchor is that every family trains — SURVEY §7)."""
import numpy as np
import pytest

from gta_graph_tensor_acclelrator_for_general_gnn_tpu.data.datasets import load_dataset
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.train import train_node_classifier


@pytest.mark.parametrize("network", ["GCN", "GAT", "GraphSAGE", "GIN"])
def test_train_converges_tiny(network):
    ds = load_dataset("tiny")
    _, res = train_node_classifier(
        ds, network, hidden=32, n_layers=2, heads=4, epochs=40, lr=1e-2)
    # planted-community features: must beat chance (0.25) solidly on train
    assert res.train_acc > 0.6, res
    assert np.isfinite(res.train_loss)


def test_train_bf16_compute():
    ds = load_dataset("tiny")
    import jax.numpy as jnp
    _, res = train_node_classifier(
        ds, "GCN", hidden=32, epochs=30, compute_dtype=jnp.bfloat16)
    assert res.train_acc > 0.6, res
