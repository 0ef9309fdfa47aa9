"""Checkpoint/resume round-trip (new capability; the reference has none)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from gta_graph_tensor_acclelrator_for_general_gnn_tpu.data.datasets import load_dataset
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.train import (
    TrainState, make_train_step)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.zoo import build_model
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils import checkpoint as ckpt


def test_save_restore_roundtrip(tmp_path):
    ds = load_dataset("tiny")
    model = build_model("GCN", ds.x.shape[1], ds.n_class, hidden=8)
    params = model.init(jax.random.key(0))
    tx = optax.adam(1e-2)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model.make_apply(), tx)
    x, y = jnp.asarray(ds.x), jnp.asarray(ds.y)
    m = jnp.asarray(ds.train_mask)
    for _ in range(3):
        state, loss = step(state, ds.graph, x, y, m)

    path = str(tmp_path / "ckpt")
    saved = ckpt.save_state(path, state)
    assert saved == 3
    assert ckpt.latest_step(path) == 3

    template = TrainState(model.init(jax.random.key(1)),
                          tx.init(model.init(jax.random.key(1))),
                          jnp.zeros((), jnp.int32))
    restored = ckpt.restore_state(path, template)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training continues from the restored state identically
    s1, l1 = step(restored, ds.graph, x, y, m)
    s2, l2 = step(state, ds.graph, x, y, m)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
