"""int8-quantized halo exchange (parallel/qcomm.py): numerics, gradient
flow (straight-through), and end-to-end distributed training with
quantize_halo on the virtual mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _mesh(n=8):
    devs = jax.devices()[:n]
    if len(devs) < n:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs), ("graph",))


def test_q8_all_to_all_close_and_differentiable():
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.parallel.qcomm \
        import q8_all_to_all
    mesh = _mesh()
    D, H, F = 8, 4, 32
    x = jax.random.normal(jax.random.key(0), (D * D, H, F), jnp.float32)

    def run(fn):
        def local(v):
            return fn(v)
        return shard_map(local, mesh=mesh, in_specs=P("graph"),
                         out_specs=P("graph"), check_vma=False)(x)

    exact = run(lambda v: jax.lax.all_to_all(v, "graph", 0, 0))
    quant = run(lambda v: q8_all_to_all(v, "graph"))
    # per-row int8: error <= ~1% of the row max
    err = np.max(np.abs(np.asarray(quant) - np.asarray(exact)))
    assert err <= 0.01 * np.max(np.abs(np.asarray(exact))) + 1e-6, err

    # straight-through gradient: nonzero and close to the exact transpose
    def loss(fn):
        def local(v):
            return fn(v) ** 2
        def outer(v):
            return jnp.sum(shard_map(
                local, mesh=mesh, in_specs=P("graph"), out_specs=P("graph"),
                check_vma=False,
            )(v))
        return outer

    gq = jax.grad(loss(lambda v: q8_all_to_all(v, "graph")))(x)
    ge = jax.grad(loss(lambda v: jax.lax.all_to_all(v, "graph", 0, 0)))(x)
    assert float(jnp.linalg.norm(gq)) > 0
    rel = (np.linalg.norm(np.asarray(gq) - np.asarray(ge))
           / np.linalg.norm(np.asarray(ge)))
    assert rel < 0.05, rel


def test_q8_all_gather_close():
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.parallel.qcomm \
        import q8_all_gather
    mesh = _mesh()
    x = jax.random.normal(jax.random.key(1), (16, 32), jnp.float32)

    def run(fn):
        return shard_map(fn, mesh=mesh, in_specs=P("graph"),
                         out_specs=P(None), check_vma=False)(x)

    exact = run(lambda v: jax.lax.all_gather(v, "graph").reshape(-1, 32))
    quant = run(lambda v: q8_all_gather(v, "graph").reshape(-1, 32))
    err = np.max(np.abs(np.asarray(quant) - np.asarray(exact)))
    assert err <= 0.01 * np.max(np.abs(np.asarray(exact))) + 1e-6, err


def test_sharded_train_step_quantized_halo():
    """Full distributed GCN train step with the quantized exchange: loss
    finite and within a few % of the unquantized step's loss."""
    import optax
    import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu import parallel
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.train \
        import TrainState
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.zoo \
        import build_model
    from jax.sharding import NamedSharding

    mesh = _mesh()
    ds = gta.load_dataset("tiny")
    model = build_model("GCN", ds.x.shape[1], ds.n_class, hidden=32,
                        n_layers=2)
    part_host = parallel.partition_graph(ds.host_graph, 8)
    part = parallel.shard_part(part_host, mesh)
    sh1 = NamedSharding(mesh, P("graph"))
    sh2 = NamedSharding(mesh, P("graph", None))
    x = jax.device_put(jnp.asarray(parallel.pad_nodes(ds.x, part_host)), sh2)
    y = jax.device_put(jnp.asarray(parallel.pad_nodes(ds.y, part_host)), sh1)
    m = jax.device_put(
        jnp.asarray(parallel.pad_nodes(ds.train_mask, part_host)), sh1)
    tx = optax.adam(1e-2)

    losses = {}
    for quant in (False, True):
        params = model.init(jax.random.key(0))
        step = parallel.make_sharded_train_step(
            model.layers, mesh, tx, quantize_halo=quant)
        st = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        st, loss = step(st, part, x, y, m)
        losses[quant] = float(loss)
    assert np.isfinite(losses[True])
    assert abs(losses[True] - losses[False]) < 0.05 * abs(losses[False]) + 1e-3, losses


def test_remote_table_2d_quantized_close():
    """The hierarchical (host x chip) exchange with int8 payloads stays
    within quantization tolerance of the exact remote table."""
    import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu import parallel
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.parallel.mesh2d \
        import remote_table_2d

    devs = jax.devices()[:8]
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs).reshape(2, 4), ("host", "chip"))
    ds = gta.load_dataset("tiny")
    part_host = parallel.partition_graph_2d(ds.host_graph, 2, 4)
    part = parallel.shard_part(part_host, mesh, axis=("host", "chip"))
    from jax.sharding import NamedSharding
    x = jax.device_put(
        jnp.asarray(parallel.pad_nodes(ds.x.astype(np.float32), part_host)),
        NamedSharding(mesh, P(("host", "chip"), None)))

    def run(quant):
        def local(sh, xl):
            return remote_table_2d(xl, sh, "host", "chip", quantize=quant)
        return shard_map(
            local, mesh=mesh,
            in_specs=(P(("host", "chip")), P(("host", "chip"), None)),
            out_specs=P(None), check_vma=False)(part, x)

    exact = np.asarray(run(False))
    quant = np.asarray(run(True))
    err = np.max(np.abs(quant - exact))
    assert err <= 0.01 * np.max(np.abs(exact)) + 1e-6, err
