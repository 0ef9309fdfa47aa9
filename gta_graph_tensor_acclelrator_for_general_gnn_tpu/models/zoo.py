"""Multi-layer models stacked from single-layer op graphs.

The reference runs one layer at a time through its pipeline (GAT = layer1..3,
others ``alllayer`` — ``vTCAD/code/start.py:26-29``); here a :class:`Model`
stacks per-layer :class:`~..ir.OpGraph` s into one end-to-end JAX function so
XLA sees (and fuses across) the whole network.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp

from .. import ir
from ..compiler import lower as L
from ..graph import GraphTensor
from .builders import build_op_graph, NETWORKS


@dataclasses.dataclass
class Model:
    """A stack of per-layer op graphs with a shared parameter namespace."""

    name: str
    layers: List[ir.OpGraph]

    def init(self, key: jax.Array, dtype=jnp.float32) -> Dict[str, jax.Array]:
        params: Dict[str, jax.Array] = {}
        for g in self.layers:
            key, sub = jax.random.split(key)
            params.update(L.init_params(g, sub, dtype))
        return params

    def make_apply(self, compute_dtype=None, schedules=None, host_graph=None,
                   x_host=None, build_transpose=False):
        """Forward over the layer stack.

        ``schedules``: optional per-layer :class:`~..compiler.schedule.Schedule`
        (or one schedule reused for all layers) — layers then lower through
        the fusion compiler (Pallas kernels / streaming per the schedule) and
        remain trainable (the fused attention kernel carries a custom VJP).
        Requires ``host_graph`` for tile construction.

        ``x_host``: the dataset features (numpy) — enables the sparse-input
        first-layer MM when density < 0.5 (isSinput; only the FIRST layer
        sees X, so only it gets the flag).  Bakes X's nonzeros: use for
        training / fixed-feature runs only.
        """
        if schedules is None:
            fns = [L.lower(g, compute_dtype) for g in self.layers]
        else:
            from ..compiler.fusion import lower_schedule
            if not isinstance(schedules, (list, tuple)):
                schedules = [schedules] * len(self.layers)
            assert host_graph is not None, "schedules need host_graph"
            shared_cache: dict = {}
            fns = [lower_schedule(g, s, host_graph, compute_dtype,
                                  x_host=x_host if i == 0 else None,
                                  build_transpose=build_transpose,
                                  tile_cache=shared_cache)
                   for i, (g, s) in enumerate(zip(self.layers, schedules))]

        def apply(params, g: GraphTensor, x: jax.Array) -> jax.Array:
            h = x
            for fn in fns:
                h = fn(params, g, h)
            return h

        return apply


def build_model(
    network: str,
    in_width: int,
    n_class: int,
    *,
    hidden: int = 128,
    n_layers: int = 2,
    heads: int = 4,
    reorder: bool = False,
) -> Model:
    """Build an ``n_layers`` model of ``network`` ending in ``n_class`` logits.

    Hidden layers use the family's default activation; the last layer emits
    raw logits (sf=identity) for the classifier head.  GAT hidden layers use
    ``heads`` attention heads (out widths stay multiples of heads); the final
    GAT layer uses a single head, matching the usual Cora GAT configuration.
    """
    if network not in NETWORKS:
        raise ValueError(f"unknown network {network!r}")
    layers: List[ir.OpGraph] = []
    w = in_width
    for i in range(n_layers):
        last = i == n_layers - 1
        out_w = n_class if last else hidden
        kw = dict(
            reorder=reorder,
            layer_tag=f"l{i}",
            final_sf="identity" if last else ("elu" if network == "GAT" else "relu"),
        )
        if network == "GAT":
            kw["heads"] = 1 if last else heads
        if network in ("GIN", "PNA"):
            kw["hidden"] = hidden
        layers.append(build_op_graph(network, w, out_w, **kw))
        w = out_w
    return Model(name=f"{network}-{n_layers}l", layers=layers)
