"""Distributed execution: shard_map lowering of the IR over a device mesh.

The reference has no multi-device execution of any kind (SURVEY §2); this is
the new TPU-native scaling layer.  The op graph lowers to a *per-shard* JAX
function over the :class:`~.partition.PartitionedGraph` halo layout:

  * apply_node / apply_edge: purely local (data-parallel over node/edge shards);
  * gather: local segment reduction (edges live with their receiver);
  * scatter(order=C): one static ``all_to_all`` halo exchange of the input's
    boundary rows, then a local take from the combined [local + halo] table;
  * scatter(order=R): local take (receivers are local by construction).

Parameters are replicated (in_spec P()); their gradient transpose inserts the
psum across shards, so ``jax.grad`` through the shard_mapped forward is the
data-parallel gradient — no hand-written collectives in the training step.
"""
from __future__ import annotations

from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import ir
from ..ops import primitives as Pr
from .partition import PartitionedGraph

AXIS = "graph"


def _sq(a):
    """Drop the per-device leading dim (1) of a sharded [D, ...] array."""
    return a[0]


def halo_exchange(x_local: jax.Array, sh: PartitionedGraph, axis: str = AXIS) -> jax.Array:
    """Exchange boundary rows; returns the combined source table
    [n_local + D*H + 1, F] (local rows, halo rows, zero dump row)."""
    send_idx = _sq(sh.send_idx)                       # [D, H]
    send_mask = _sq(sh.send_mask)                     # [D, H]
    send = jnp.take(x_local, send_idx, axis=0)        # [D, H, F]
    send = jnp.where(send_mask[..., None], send, 0.0).astype(x_local.dtype)
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    flat = recv.reshape(-1, x_local.shape[-1])        # [D*H, F]
    dump = jnp.zeros((1, x_local.shape[-1]), x_local.dtype)
    return jnp.concatenate([x_local, flat, dump], axis=0)


def _scatter_c(v_node: jax.Array, sh: PartitionedGraph, axis: str) -> jax.Array:
    table = halo_exchange(v_node, sh, axis)
    return jnp.take(table, _sq(sh.e_src), axis=0)


def _scatter_r(v_node: jax.Array, sh: PartitionedGraph) -> jax.Array:
    dump = jnp.zeros((1, v_node.shape[-1]), v_node.dtype)
    table = jnp.concatenate([v_node, dump], axis=0)
    return jnp.take(table, _sq(sh.e_dst), axis=0)


def _gather(v_edge: jax.Array, sh: PartitionedGraph, reduce: str) -> jax.Array:
    dst = _sq(sh.e_dst)
    num = sh.n_local + 1
    if reduce == ir.ADD:
        out = jax.ops.segment_sum(v_edge, dst, num)
    elif reduce == ir.MAX:
        out = jax.ops.segment_max(v_edge, dst, num)
        out = jnp.where(jnp.isfinite(out), out, jnp.zeros_like(out))
    elif reduce == ir.MEAN:
        s = jax.ops.segment_sum(v_edge, dst, num)
        d = jax.ops.segment_sum(_sq(sh.e_mask).astype(v_edge.dtype), dst, num)
        out = s / jnp.maximum(d, 1.0)[:, None]
    else:
        raise ValueError(f"bad gather reduce {reduce}")
    return out[: sh.n_local]


def lower_shard(
    graph: ir.OpGraph,
    compute_dtype=None,
    axis: str = AXIS,
) -> Callable:
    """Lower an OpGraph to a per-shard function ``fn(params, sh, x_local)``
    for use inside shard_map.  Mirrors compiler.lower but with the scatter /
    gather primitives replaced by their halo-partitioned equivalents."""
    order = graph.topo_order()
    outputs = list(graph.outputs)

    def apply(params: Dict[str, jax.Array], sh: PartitionedGraph, x: jax.Array):
        vals: Dict[int, jax.Array] = {}

        def ref(i: int) -> jax.Array:
            if i == ir.X_INPUT:
                return x
            if i == ir.EDGE_WEIGHT:
                return _sq(sh.e_w)[:, None]
            return vals[i]

        for oid in order:
            op = graph.by_id[oid]
            ins = [ref(i) for i in op.inputs] if op.inputs else [x]
            if op.kind == ir.SCATTER:
                v = _scatter_c(ins[0], sh, axis) if op.order == "C" \
                    else _scatter_r(ins[0], sh)
            elif op.kind == ir.GATHER:
                v = _gather(ins[0], sh, op.compute)
            elif op.compute == ir.NONE:
                v = ins[0]
            elif op.compute == ir.MM:
                name, _, _ = op.extra["weight"]
                v = Pr.dense_mm(ins[0], params[name], compute_dtype)
            elif op.compute == ir.SF:
                v = Pr.special_function(
                    ins[0], op.extra.get("sf", "relu"),
                    op.extra.get("negative_slope", 0.2))
            elif op.compute in (ir.ADD, ir.MUL, ir.SUB, ir.DIV):
                if len(ins) == 2:
                    v = Pr.binary_op(op.compute, ins[0], ins[1])
                else:
                    c = jnp.asarray(op.extra["const"], ins[0].dtype)
                    v = Pr.binary_op(op.compute, ins[0], jnp.broadcast_to(c, (1, 1)))
            else:
                raise ValueError(f"op {op.op_id}: unhandled compute {op.compute}")
            vals[oid] = v
        if len(outputs) == 1:
            return vals[outputs[0]]
        return {o: vals[o] for o in outputs}

    return apply


def make_dist_apply(
    layers: List[ir.OpGraph],
    mesh: Mesh,
    compute_dtype=None,
    axis: str = AXIS,
) -> Callable:
    """Build the mesh-wide forward ``apply(params, part, x) -> logits``.

    ``part`` is the full PartitionedGraph ([D, ...] arrays), ``x`` the padded
    [D*n_local, F] node features; both should be device_put with P(axis)
    shardings (see :func:`shard_part`).  Output is [D*n_local, n_out] sharded
    the same way.
    """
    fns = [lower_shard(g, compute_dtype, axis) for g in layers]

    def local_forward(params, sh, x_local):
        h = x_local
        for fn in fns:
            h = fn(params, sh, h)
        return h

    return jax.shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )


def shard_part(part: PartitionedGraph, mesh: Mesh, axis: str = AXIS) -> PartitionedGraph:
    """device_put every array leaf of the partition with its P(axis) sharding."""
    def put(leaf):
        spec = P(axis, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree.map(put, part)


def make_sharded_train_step(
    layers: List[ir.OpGraph],
    mesh: Mesh,
    tx,
    compute_dtype=None,
    axis: str = AXIS,
) -> Callable:
    """Full distributed training step: forward via shard_map (halo all_to_all
    inside), masked CE on the node-sharded logits, grads (the replicated-param
    transpose inserts the cross-shard psum), optax update.  Jit once over the
    mesh; all arrays keep their NamedShardings."""
    from ..models.train import TrainState, masked_cross_entropy

    fwd = make_dist_apply(layers, mesh, compute_dtype, axis)

    def step(state: TrainState, part: PartitionedGraph, x, y, mask):
        def loss_fn(params):
            logits = fwd(params, part, x)
            return masked_cross_entropy(logits, y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        import optax
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step, donate_argnums=0)
