"""Training: full-batch node classification on TPU.

The reference has no training at all (its "execution" is a cycle-count
simulation — SURVEY §2); this module supplies the real thing: masked
cross-entropy over train nodes, optax Adam, a single jitted train step with
donated parameters, and an epoch loop reporting loss/accuracy and edges/s.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..data.datasets import Dataset
from ..graph import GraphTensor
from .zoo import Model, build_model


class TrainState(NamedTuple):
    params: Dict[str, jax.Array]
    opt_state: optax.OptState
    step: jax.Array


def masked_cross_entropy(logits: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean softmax CE over masked nodes (f32 for stability)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    m = mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def accuracy(logits: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    pred = jnp.argmax(logits, axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum((pred == labels) * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_train_step(
    apply: Callable,
    tx: optax.GradientTransformation,
    *,
    remat: bool = False,
):
    """Build ``step(state, g, x, y, mask) -> (state, loss)``.

    ``remat=True`` wraps the forward in jax.checkpoint, trading FLOPs for HBM
    on deep stacks / large graphs.
    """
    fwd = jax.checkpoint(apply) if remat else apply

    def loss_fn(params, g, x, y, mask):
        logits = fwd(params, g, x)
        return masked_cross_entropy(logits, y, mask)

    def step(state: TrainState, g: GraphTensor, x, y, mask):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, g, x, y, mask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


@dataclasses.dataclass
class FitResult:
    train_loss: float
    train_acc: float
    val_acc: float
    test_acc: float
    epochs: int
    epoch_time_s: float        # steady-state per-epoch wall time
    edges_per_s: float


def train_node_classifier(
    ds: Dataset,
    network: str = "GCN",
    *,
    hidden: int = 128,
    n_layers: int = 2,
    heads: int = 4,
    epochs: int = 100,
    lr: float = 1e-2,
    weight_decay: float = 5e-4,
    compute_dtype=None,
    seed: int = 0,
    remat: bool = False,
    model: Optional[Model] = None,
    schedules=None,
    sinput: bool = True,
    verbose: bool = False,
) -> Tuple[TrainState, FitResult]:
    """Full-batch training of ``network`` on ``ds``; returns final state +
    metrics.  ``schedules`` routes layers through the fusion compiler
    (tuned Pallas/stream execution) — training works through the fused
    kernels' custom VJPs.  ``sinput`` (with schedules) auto-enables the
    sparse-input first-layer MM when feature density < 0.5 (isSinput);
    features are constant across a training run, so baking X is sound."""
    model = model or build_model(
        network, ds.x.shape[1], ds.n_class,
        hidden=hidden, n_layers=n_layers, heads=heads)
    apply = model.make_apply(compute_dtype, schedules=schedules,
                             host_graph=ds.host_graph if schedules else None,
                             x_host=ds.x if (schedules and sinput) else None)
    params = model.init(jax.random.key(seed))
    tx = optax.adamw(lr, weight_decay=weight_decay)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    step = jax.jit(make_train_step(apply, tx, remat=remat), donate_argnums=0)
    eval_fn = jax.jit(apply)

    g = ds.graph
    x = jax.device_put(jnp.asarray(ds.x))
    y = jax.device_put(jnp.asarray(ds.y))
    tr = jax.device_put(jnp.asarray(ds.train_mask))

    # warmup (compile) outside the timed region
    state, loss = step(state, g, x, y, tr)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    timed = 0
    for e in range(1, epochs):
        state, loss = step(state, g, x, y, tr)
        timed += 1
        if verbose and e % 20 == 0:
            print(f"epoch {e}: loss {float(loss):.4f}")
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / max(timed, 1)

    logits = eval_fn(state.params, g, x)
    res = FitResult(
        train_loss=float(loss),
        train_acc=float(accuracy(logits, y, tr)),
        val_acc=float(accuracy(logits, y, jnp.asarray(ds.val_mask))),
        test_acc=float(accuracy(logits, y, jnp.asarray(ds.test_mask))),
        epochs=epochs,
        epoch_time_s=dt,
        edges_per_s=ds.graph.n_edge / dt if dt > 0 else 0.0,
    )
    return state, res


def train_sampled(
    ds: Dataset,
    *,
    fanouts=(10, 10),
    batch_size: int = 256,
    epochs: int = 3,
    hidden: int = 128,
    lr: float = 1e-2,
    compute_dtype=None,
    seed: int = 0,
    network: str = "GraphSAGE",
) -> Tuple[TrainState, FitResult]:
    """Minibatch training with neighbour sampling (the Reddit-scale path).

    Every batch has identical static shapes, so ONE jitted train step serves
    the whole run; per-step host work is the sampler + feature gather.
    """
    import numpy as np
    from ..data.sampling import NeighborSampler, gather_features

    model = build_model(network, ds.x.shape[1], ds.n_class,
                        hidden=hidden, n_layers=len(fanouts))
    apply = model.make_apply(compute_dtype)
    params = model.init(jax.random.key(seed))
    tx = optax.adamw(lr, weight_decay=5e-4)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(apply, tx), donate_argnums=0)

    sampler = NeighborSampler(ds.host_graph, fanouts, batch_size, seed=seed)
    train_nodes = np.flatnonzero(ds.train_mask)
    n_steps = 0
    t0 = time.perf_counter()
    loss = jnp.zeros(())
    for _ in range(epochs):
        for batch in sampler.epoch(train_nodes):
            xb = jnp.asarray(gather_features(ds.x, batch))
            valid = batch.node_ids >= 0
            yb = np.zeros(batch.cap_nodes, np.int32)
            yb[valid] = ds.y[batch.node_ids[valid]]
            # device_graph pins the static n_edge so this step compiles ONCE
            state, loss = step(state, batch.device_graph(), xb,
                               jnp.asarray(yb), jnp.asarray(batch.seed_mask))
            n_steps += 1
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / max(epochs, 1)

    # full-graph eval (host features may be large; fine for the published sets)
    eval_fn = jax.jit(apply)
    logits = eval_fn(state.params, ds.graph, jnp.asarray(ds.x))
    y = jnp.asarray(ds.y)
    res = FitResult(
        train_loss=float(loss),
        train_acc=float(accuracy(logits, y, jnp.asarray(ds.train_mask))),
        val_acc=float(accuracy(logits, y, jnp.asarray(ds.val_mask))),
        test_acc=float(accuracy(logits, y, jnp.asarray(ds.test_mask))),
        epochs=epochs,
        epoch_time_s=dt,
        edges_per_s=(n_steps // max(epochs, 1)) * sampler.cap_edges / dt
        if dt > 0 else 0.0,
    )
    return state, res
