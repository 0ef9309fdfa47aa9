"""Static-shape graph containers for TPU execution.

The reference framework (GTA) represents a graph as a dense adjacency matrix
split into T x node_num tiles with per-tile nnz histograms
(``FinalVersion For Paper/preprocessing.py:11-39`` in the reference).  That
representation exists to feed a cycle-accurate simulator.  On a real TPU the
requirements are different: XLA traces once, so *every* shape must be static,
and the hot kernels want edges grouped into fixed-capacity tiles that map onto
MXU-friendly one-hot matmuls.

This module provides:

* :class:`GraphTensor` — a pytree of statically padded COO/CSR arrays, edges
  sorted by destination (receiver).  This is the universal input to both the
  XLA reference path and the Pallas kernels.
* :class:`TiledGraph` — the block-sparse edge tiling (the TPU-native
  equivalent of the reference's ``adj_<ds>_<T>_1.yaml`` nnz-per-tile data,
  cf. ``vTCAD/code/simulator.py:481-483``): the adjacency is partitioned into
  ``block_rows x block_cols`` node blocks and edges are packed into
  fixed-capacity tiles, each tile belonging to a single block.  Scalar
  prefetch arrays derived from it drive the Pallas SpMM/SDDMM grids.

All padding uses index ``n_node`` (one past the last real node) for node ids
and mask arrays for edges so that segment reductions on padded entries land in
a dump row that is sliced away.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class HostGraph:
    """Host-side (numpy) twin of :class:`GraphTensor`.

    All preprocessing (tiling, partitioning, histograms) runs off this so it
    never reads device buffers back: a device->host readback is (a) wasted
    PCIe/tunnel traffic and (b) on the axon TPU tunnel it permanently degrades
    every subsequent dispatch in the process (measured: 80us -> 26ms).  Build
    once on host, `.to_device()` exactly once.
    """

    senders: np.ndarray
    receivers: np.ndarray
    edge_mask: np.ndarray
    edge_weight: np.ndarray
    n_node: int
    n_edge: int

    @property
    def e_pad(self) -> int:
        return int(self.senders.shape[0])

    def to_device(self) -> "GraphTensor":
        return GraphTensor(
            senders=jnp.asarray(self.senders),
            receivers=jnp.asarray(self.receivers),
            edge_mask=jnp.asarray(self.edge_mask),
            edge_weight=jnp.asarray(self.edge_weight),
            n_node=self.n_node,
            n_edge=self.n_edge,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphTensor:
    """A statically padded graph.

    Attributes:
      senders:    int32[E_pad]  source node of each edge (padded with n_node).
      receivers:  int32[E_pad]  destination node, **sorted ascending**.
      edge_mask:  bool[E_pad]   True for real edges.
      edge_weight: float32[E_pad] optional per-edge scalar (e.g. the symmetric
        GCN normalisation 1/sqrt(d_u d_v)); 0 on padding.
      n_node / n_edge: static python ints (real counts, pre-padding).
    """

    senders: jax.Array
    receivers: jax.Array
    edge_mask: jax.Array
    edge_weight: jax.Array
    n_node: int = dataclasses.field(metadata=dict(static=True))
    n_edge: int = dataclasses.field(metadata=dict(static=True))

    @property
    def e_pad(self) -> int:
        return int(self.senders.shape[0])

    @property
    def n_pad(self) -> int:
        # one dump row past the real nodes, rounded for TPU lanes
        return _round_up(self.n_node + 1, 8)


def build_host_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_node: int,
    edge_weight: Optional[np.ndarray] = None,
    *,
    add_self_loops: bool = False,
    symmetric_norm: bool = False,
    edge_pad_multiple: int = 512,
) -> HostGraph:
    """Build a sorted, padded :class:`HostGraph` from COO arrays (host side)."""
    senders = np.asarray(senders, np.int32)
    receivers = np.asarray(receivers, np.int32)
    if add_self_loops:
        loop = np.arange(n_node, dtype=np.int32)
        senders = np.concatenate([senders, loop])
        receivers = np.concatenate([receivers, loop])
        edge_weight = None if edge_weight is None else np.concatenate(
            [np.asarray(edge_weight, np.float32), np.ones(n_node, np.float32)]
        )
    n_edge = int(senders.shape[0])

    order = np.argsort(receivers, kind="stable")
    senders, receivers = senders[order], receivers[order]
    if edge_weight is not None:
        edge_weight = np.asarray(edge_weight, np.float32)[order]

    if symmetric_norm:
        deg = np.zeros(n_node, np.float64)
        np.add.at(deg, receivers, 1.0)
        out_deg = np.zeros(n_node, np.float64)
        np.add.at(out_deg, senders, 1.0)
        inv = 1.0 / np.sqrt(np.maximum(deg[receivers] * out_deg[senders], 1.0))
        edge_weight = inv.astype(np.float32)
    if edge_weight is None:
        edge_weight = np.ones(n_edge, np.float32)

    e_pad = max(_round_up(n_edge, edge_pad_multiple), edge_pad_multiple)
    pad = e_pad - n_edge
    senders = np.concatenate([senders, np.full(pad, n_node, np.int32)])
    receivers = np.concatenate([receivers, np.full(pad, n_node, np.int32)])
    mask = np.concatenate([np.ones(n_edge, bool), np.zeros(pad, bool)])
    edge_weight = np.concatenate([edge_weight, np.zeros(pad, np.float32)])

    return HostGraph(
        senders=senders,
        receivers=receivers,
        edge_mask=mask,
        edge_weight=edge_weight,
        n_node=n_node,
        n_edge=n_edge,
    )


def build_graph(*args, **kwargs) -> GraphTensor:
    """Device variant of :func:`build_host_graph` (same signature)."""
    return build_host_graph(*args, **kwargs).to_device()


def _as_host(g) -> HostGraph:
    """HostGraph view of either graph type.  Readbacks from a device
    GraphTensor are allowed only as a CPU-platform convenience (tests)."""
    if isinstance(g, HostGraph):
        return g
    return HostGraph(
        senders=np.asarray(g.senders),
        receivers=np.asarray(g.receivers),
        edge_mask=np.asarray(g.edge_mask),
        edge_weight=np.asarray(g.edge_weight),
        n_node=g.n_node,
        n_edge=g.n_edge,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TiledGraph:
    """Block-sparse edge tiling for the Pallas kernels.

    The node set is split into row blocks of ``block_rows`` (destinations) and
    col blocks of ``block_cols`` (sources).  Edges are packed into tiles of
    ``tile_edges`` capacity, each tile belonging to one (row_block, col_block)
    pair, tiles sorted by row block (so output accumulation is monotone).

    Attributes (T = number of tiles):
      tile_rb:  int32[T]  row-block index of each tile.
      tile_cb:  int32[T]  col-block index of each tile.
      src_local: int32[T, tile_edges]  sender - cb*block_cols (pad: block_cols)
      dst_local: int32[T, tile_edges]  receiver - rb*block_rows (pad: block_rows)
      edge_id:  int32[T, tile_edges]  index into the GraphTensor edge arrays
                (for per-edge values); padding points at a masked edge slot.
      weight:   float32[T, tile_edges] per-edge scalar weight (0 on padding).
      row_first_tile: int32[RB+1] first tile of each row block (tiles sorted
                by rb); enables row-stripe iteration for online softmax.
    """

    tile_rb: jax.Array
    tile_cb: jax.Array
    src_local: jax.Array
    dst_local: jax.Array
    edge_id: jax.Array
    weight: jax.Array
    row_first_tile: jax.Array
    block_rows: int = dataclasses.field(metadata=dict(static=True))
    block_cols: int = dataclasses.field(metadata=dict(static=True))
    tile_edges: int = dataclasses.field(metadata=dict(static=True))
    n_node: int = dataclasses.field(metadata=dict(static=True))
    n_row_blocks: int = dataclasses.field(metadata=dict(static=True))
    n_col_blocks: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return int(self.tile_rb.shape[0])


def tile_graph(
    g,
    *,
    block_rows: int = 256,
    block_cols: int = 256,
    tile_edges: int = 512,
    unit_weight: bool = False,
) -> TiledGraph:
    """Host-side tiling of a HostGraph (or GraphTensor) into the block-sparse
    edge format.

    This replaces the reference's adjacency-tile nnz preprocessing
    (``preprocessing.py:calculate_sparsity``) — instead of a histogram fed to a
    simulator, we materialise the tiles themselves for real execution.
    Prefer passing a :class:`HostGraph`: passing a device GraphTensor forces a
    device->host readback (see HostGraph docstring).
    """
    g = _as_host(g)
    senders = g.senders[: g.n_edge]
    receivers = g.receivers[: g.n_edge]
    weight = (np.ones(g.n_edge, np.float32) if unit_weight
              else g.edge_weight[: g.n_edge])
    n = g.n_node

    rb = receivers // block_rows
    cb = senders // block_cols
    n_row_blocks = max(_round_up(n, block_rows) // block_rows, 1)
    n_col_blocks = max(_round_up(n, block_cols) // block_cols, 1)

    # sort edges by (row block, col block) — stable keeps dst order within
    key = rb.astype(np.int64) * n_col_blocks + cb
    order = np.argsort(key, kind="stable")
    senders, receivers, weight, key = (
        senders[order], receivers[order], weight[order], key[order])
    edge_ids = np.arange(g.n_edge, dtype=np.int32)[order]

    # split into per-block runs, then chunks of tile_edges
    boundaries = np.flatnonzero(np.diff(key)) + 1
    runs = np.split(np.arange(len(key)), boundaries)

    t_rb, t_cb, t_src, t_dst, t_eid, t_w = [], [], [], [], [], []
    for run in runs:
        if len(run) == 0:
            continue
        block_key = key[run[0]]
        block_rb = int(block_key // n_col_blocks)
        block_cb = int(block_key % n_col_blocks)
        for off in range(0, len(run), tile_edges):
            idx = run[off : off + tile_edges]
            k = len(idx)
            sl = np.full(tile_edges, block_cols, np.int32)
            dl = np.full(tile_edges, block_rows, np.int32)
            ei = np.full(tile_edges, g.e_pad - 1, np.int32)
            w = np.zeros(tile_edges, np.float32)
            sl[:k] = senders[idx] - block_cb * block_cols
            dl[:k] = receivers[idx] - block_rb * block_rows
            ei[:k] = edge_ids[idx]
            w[:k] = weight[idx]
            t_rb.append(block_rb)
            t_cb.append(block_cb)
            t_src.append(sl)
            t_dst.append(dl)
            t_eid.append(ei)
            t_w.append(w)

    # guarantee every row block owns >=1 tile so fused kernels visit (and
    # write) every output block, even for edge-less row stripes
    present = set(t_rb)
    for rb_missing in range(n_row_blocks):
        if rb_missing not in present:
            t_rb.append(rb_missing)
            t_cb.append(0)
            t_src.append(np.full(tile_edges, block_cols, np.int32))
            t_dst.append(np.full(tile_edges, block_rows, np.int32))
            t_eid.append(np.full(tile_edges, g.e_pad - 1, np.int32))
            t_w.append(np.zeros(tile_edges, np.float32))
    order2 = np.argsort(np.asarray(t_rb), kind="stable")
    t_rb = [t_rb[i] for i in order2]
    t_cb = [t_cb[i] for i in order2]
    t_src = [t_src[i] for i in order2]
    t_dst = [t_dst[i] for i in order2]
    t_eid = [t_eid[i] for i in order2]
    t_w = [t_w[i] for i in order2]

    tile_rb = np.asarray(t_rb, np.int32)
    row_first = np.searchsorted(tile_rb, np.arange(n_row_blocks + 1)).astype(np.int32)

    return TiledGraph(
        tile_rb=jnp.asarray(tile_rb),
        tile_cb=jnp.asarray(np.asarray(t_cb, np.int32)),
        src_local=jnp.asarray(np.stack(t_src)),
        dst_local=jnp.asarray(np.stack(t_dst)),
        edge_id=jnp.asarray(np.stack(t_eid)),
        weight=jnp.asarray(np.stack(t_w)),
        row_first_tile=jnp.asarray(row_first),
        block_rows=block_rows,
        block_cols=block_cols,
        tile_edges=tile_edges,
        n_node=n,
        n_row_blocks=n_row_blocks,
        n_col_blocks=n_col_blocks,
    )


def nnz_histogram(g, tile_rows: int) -> np.ndarray:
    """nnz count per tile_rows-row stripe of the adjacency — the autotuner
    feature retained from the reference's preprocessing (SURVEY §7 layer 1)."""
    receivers = _as_host(g).receivers[: g.n_edge]
    n_stripes = _round_up(g.n_node, tile_rows) // tile_rows
    hist = np.zeros(n_stripes, np.int64)
    np.add.at(hist, receivers // tile_rows, 1)
    return hist
