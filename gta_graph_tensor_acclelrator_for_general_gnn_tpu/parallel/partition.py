"""Spatial graph partitioning with a static halo-exchange plan.

The reference is strictly single-device (SURVEY §2 "Parallelism strategies:
none"); multi-chip execution is new design.  The scheme here is the standard
1-D vertex partition with halo (ghost) vertices, laid out for TPU constraints:
every shard gets *identical static shapes*, so one shard_map-traced program
serves all devices, and the boundary feature exchange is a single
``lax.all_to_all`` over the mesh axis (ICI within a slice, DCN across hosts).

Partition invariants (D shards):
  * node space padded to D * n_local; shard d owns [d*n_local, (d+1)*n_local);
  * every edge lives on the shard that owns its *receiver* (so gather is a
    purely local segment reduction — aggregation never crosses the wire);
  * per remote shard pair (p -> q), the unique senders owned by p and needed
    by q form the halo; all pairs are padded to one uniform halo width H so
    the exchange is one static all_to_all of shape [D, H, F];
  * edge sender ids are remapped to a combined local table
    ``concat([x_local (n_local rows), halo (D*H rows), zero dump row])`` so a
    single take serves both local and remote sources.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import GraphTensor, _as_host


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Static per-shard graph arrays.  Leading axis D = mesh size; shard these
    with ``P('graph')`` and each device sees its own [1, ...] block."""

    send_idx: jax.Array    # int32[D, D, H]   send_idx[p, q]: local rows p ships to q
    send_mask: jax.Array   # bool [D, D, H]   True on real halo slots
    e_src: jax.Array       # int32[D, E_l]    index into combined table (see module doc)
    e_dst: jax.Array       # int32[D, E_l]    local receiver; n_local = dump row
    e_w: jax.Array         # f32  [D, E_l]    edge weight (0 on padding)
    e_mask: jax.Array      # bool [D, E_l]
    n_local: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    n_node: int = dataclasses.field(metadata=dict(static=True))
    n_edge: int = dataclasses.field(metadata=dict(static=True))

    @property
    def e_local(self) -> int:
        return int(self.e_src.shape[1])

    @property
    def n_pad(self) -> int:
        return self.n_local * self.n_shards


def partition_graph(
    g,
    n_shards: int,
    *,
    edge_pad_multiple: int = 128,
    halo_pad_multiple: int = 8,
) -> PartitionedGraph:
    """Host-side partition of a HostGraph (preferred — a device GraphTensor
    forces a device->host readback) into ``n_shards`` halo shards."""
    g = _as_host(g)
    senders = g.senders[: g.n_edge]
    receivers = g.receivers[: g.n_edge]
    weight = g.edge_weight[: g.n_edge]
    D = n_shards
    n_local = _round_up(g.n_node, D * 8) // D

    owner_s = senders // n_local
    owner_r = receivers // n_local

    # --- halo plan: unique remote senders per (src_owner p, dst_owner q) ----
    pair_send: dict = {}
    remote = owner_s != owner_r
    for p in range(D):
        for q in range(D):
            if p == q:
                continue
            sel = remote & (owner_s == p) & (owner_r == q)
            pair_send[(p, q)] = np.unique(senders[sel])
    H = max([len(v) for v in pair_send.values()] + [1])
    H = _round_up(H, halo_pad_multiple)

    send_idx = np.zeros((D, D, H), np.int32)
    send_mask = np.zeros((D, D, H), bool)
    # halo slot lookup: for shard q, sender s owned by p lives at combined row
    # n_local + p*H + slot  (after the local rows)
    slot_of = [dict() for _ in range(D)]  # per dst shard q: global sender -> slot row
    for (p, q), nodes in pair_send.items():
        k = len(nodes)
        send_idx[p, q, :k] = nodes - p * n_local
        send_mask[p, q, :k] = True
        for j, s in enumerate(nodes):
            slot_of[q][int(s)] = n_local + p * H + j

    # --- per-shard edge arrays -------------------------------------------
    counts = np.bincount(owner_r, minlength=D)
    E_l = _round_up(int(counts.max()) if len(counts) else 1, edge_pad_multiple)
    E_l = max(E_l, edge_pad_multiple)
    dump_row = n_local + D * H  # a guaranteed-zero row in the combined table

    e_src = np.full((D, E_l), dump_row, np.int32)
    e_dst = np.full((D, E_l), n_local, np.int32)
    e_w = np.zeros((D, E_l), np.float32)
    e_mask = np.zeros((D, E_l), bool)
    for q in range(D):
        sel = np.flatnonzero(owner_r == q)
        k = len(sel)
        s_q, r_q = senders[sel], receivers[sel]
        src_rows = np.where(
            s_q // n_local == q,
            s_q - q * n_local,
            np.array([slot_of[q].get(int(s), dump_row) for s in s_q], np.int64),
        )
        e_src[q, :k] = src_rows
        e_dst[q, :k] = r_q - q * n_local
        e_w[q, :k] = weight[sel]
        e_mask[q, :k] = True

    return PartitionedGraph(
        send_idx=jnp.asarray(send_idx),
        send_mask=jnp.asarray(send_mask),
        e_src=jnp.asarray(e_src),
        e_dst=jnp.asarray(e_dst),
        e_w=jnp.asarray(e_w),
        e_mask=jnp.asarray(e_mask),
        n_local=n_local,
        halo=H,
        n_shards=D,
        n_node=g.n_node,
        n_edge=g.n_edge,
    )


def pad_nodes(arr: np.ndarray, part: PartitionedGraph) -> np.ndarray:
    """Pad a [n_node, ...] host array to the partitioned node space [D*n_local, ...]."""
    pad = part.n_pad - arr.shape[0]
    if pad < 0:
        raise ValueError("array longer than padded node space")
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, widths)
