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
from typing import Optional, Sequence, Tuple

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

    from . import native
    order = (native.sort_by_receiver_native(receivers, n_node)
             if native.HAVE_NATIVE else None)
    if order is None:
        order = np.argsort(receivers, kind="stable")
    senders, receivers = senders[order], receivers[order]
    if edge_weight is not None:
        edge_weight = np.asarray(edge_weight, np.float32)[order]

    if symmetric_norm:
        degs = (native.degrees_native(senders, receivers, n_node)
                if native.HAVE_NATIVE else None)
        if degs is not None:
            out_deg, deg = degs
        else:
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
    # host copy of row_first_tile (tuple so it hashes as a static field):
    # kernels consult it to split huge tile sets into multiple pallas calls
    # at row-stripe boundaries WITHOUT a device readback (which would
    # permanently degrade the axon tunnel).  None on hand-built instances.
    row_first_host: Optional[Tuple[int, ...]] = dataclasses.field(
        default=None, metadata=dict(static=True))

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

    ``unit_weight`` tilings store the weight in bf16 (1.0 and 0.0 are
    exact): halves a full-Reddit tiling's weight array (585 -> 293 MB) —
    the kernels upcast in the multiply.
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

    from . import native
    nat = native.tile_edges_native(
        senders, receivers, weight, n_row_blocks, n_col_blocks,
        block_rows, block_cols, tile_edges, g.e_pad) if native.HAVE_NATIVE \
        else None
    if nat is not None:
        data_rb, data_cb, nsrc, ndst, neid, nw = nat
        T_data = len(data_rb)
        parts = dict(src=nsrc, dst=ndst, eid=neid, w=nw)
    else:
        # vectorised numpy fallback (no per-run Python loop): sort edges by
        # (row block, col block), then compute each edge's tile and slot
        # analytically from its offset within its (rb, cb) run.
        key = rb.astype(np.int64) * n_col_blocks + cb
        order = np.argsort(key, kind="stable")
        senders, receivers, weight, key = (
            senders[order], receivers[order], weight[order], key[order])
        edge_ids = np.arange(g.n_edge, dtype=np.int32)[order]

        ne = len(key)
        if ne:
            starts = np.flatnonzero(
                np.concatenate([[True], key[1:] != key[:-1]]))
            run_len = np.diff(np.concatenate([starts, [ne]]))
            run_keys = key[starts]                          # per run (rb, cb)
            tiles_per_run = -(-run_len // tile_edges)       # ceil
            tile_base = np.concatenate([[0], np.cumsum(tiles_per_run)[:-1]])
            run_of_edge = np.searchsorted(
                starts, np.arange(ne), side="right") - 1
            offset = np.arange(ne) - starts[run_of_edge]
            tile_of_edge = tile_base[run_of_edge] + offset // tile_edges
            slot = (offset % tile_edges).astype(np.int64)
            T_data = int(tiles_per_run.sum())
            data_rb = np.repeat((run_keys // n_col_blocks).astype(np.int32),
                                tiles_per_run)
            data_cb = np.repeat((run_keys % n_col_blocks).astype(np.int32),
                                tiles_per_run)
        else:
            T_data = 0
            tile_of_edge = slot = np.zeros(0, np.int64)
            data_rb = data_cb = np.zeros(0, np.int32)

        nsrc = np.full((T_data, tile_edges), block_cols, np.int32)
        ndst = np.full((T_data, tile_edges), block_rows, np.int32)
        neid = np.full((T_data, tile_edges), max(g.e_pad - 1, 0), np.int32)
        nw = np.zeros((T_data, tile_edges), np.float32)
        if ne:
            nsrc[tile_of_edge, slot] = (
                senders - data_cb[tile_of_edge] * block_cols)
            ndst[tile_of_edge, slot] = (
                receivers - data_rb[tile_of_edge] * block_rows)
            neid[tile_of_edge, slot] = edge_ids
            nw[tile_of_edge, slot] = weight

    # guarantee every row block owns >=1 tile so fused kernels visit (and
    # write) every output block, even for edge-less row stripes
    missing = np.setdiff1d(np.arange(n_row_blocks, dtype=np.int32),
                           np.unique(data_rb))
    T = T_data + len(missing)
    if len(missing):
        src_l = np.concatenate(
            [nsrc, np.full((len(missing), tile_edges), block_cols, np.int32)])
        dst_l = np.concatenate(
            [ndst, np.full((len(missing), tile_edges), block_rows, np.int32)])
        eid = np.concatenate(
            [neid, np.full((len(missing), tile_edges), max(g.e_pad - 1, 0),
                           np.int32)])
        w = np.concatenate(
            [nw, np.zeros((len(missing), tile_edges), np.float32)])
        tile_rb = np.concatenate([data_rb, missing])
        tile_cb = np.concatenate([data_cb, np.zeros(len(missing), np.int32)])
        # sort tiles by row block (stable keeps cb order within a stripe)
        torder = np.argsort(tile_rb, kind="stable")
        tile_rb, tile_cb = tile_rb[torder], tile_cb[torder]
        src_l, dst_l = src_l[torder], dst_l[torder]
        eid, w = eid[torder], w[torder]
    else:
        # both producers emit tiles already rb-major; skip the 4x big-array
        # gather (at Reddit scale these arrays are GBs)
        src_l, dst_l, eid, w = nsrc, ndst, neid, nw
        tile_rb, tile_cb = data_rb, data_cb

    row_first = np.searchsorted(tile_rb, np.arange(n_row_blocks + 1)).astype(np.int32)

    # local offsets fit int16 (blocks <= 32k; tile_is_feasible caps far
    # lower): halves the two big index arrays — at full-Reddit training
    # scale the fwd+transposed tilings shed ~1.2 GB of HBM
    idt = jnp.int16 if max(block_rows, block_cols) < 32000 else jnp.int32
    return TiledGraph(
        tile_rb=jnp.asarray(tile_rb),
        tile_cb=jnp.asarray(tile_cb),
        src_local=jnp.asarray(src_l, idt),
        dst_local=jnp.asarray(dst_l, idt),
        edge_id=jnp.asarray(eid),
        weight=jnp.asarray(w, jnp.bfloat16 if unit_weight else None),
        row_first_tile=jnp.asarray(row_first),
        row_first_host=tuple(int(v) for v in row_first),
        block_rows=block_rows,
        block_cols=block_cols,
        tile_edges=tile_edges,
        n_node=n,
        n_row_blocks=n_row_blocks,
        n_col_blocks=n_col_blocks,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultiTiledGraph:
    """Edge tiling with per-run CAPACITY CLASSES.

    A single ``tile_edges`` wastes most slots when (rb, cb) run sizes are
    heterogeneous (a 5-edge adjacency block padded to 512 slots is 1%
    utilised — power-law graphs without community structure live there:
    flickr's tail measured 0.22 utilisation).  Here every run is packed
    with the capacity minimising its modelled kernel time
    ``ceil(len/ET) * (ET*(R+C)/2048 + fixed_slots)`` and runs of the same
    class share one TiledGraph; per-class kernel outputs add exactly.

    The reference's analogue is per-block tile sizes in its GA genome
    (vTCAD/code/genetic_algorithm.py:452-466); this takes the idea to
    per-adjacency-run granularity with a closed-form assignment instead of
    a search dimension.

    Modelled tail-slot reduction at 1024x1024 geometry: pubmed 2.3x,
    flickr 3.0x, Reddit-community ~1.0x (its tail runs are concentrated
    near one size, so one class already fits).
    """

    parts: Tuple[TiledGraph, ...]

    @property
    def n_node(self) -> int:
        return self.parts[0].n_node

    @property
    def n_tiles(self) -> int:
        return sum(p.n_tiles for p in self.parts)

    @property
    def total_slots(self) -> int:
        return sum(p.n_tiles * p.tile_edges for p in self.parts)


def grid_ramp_ns(n_runs: int, n_tiles: float,
                 feat_width: int = 128) -> float:
    """SHORT-GRID ramp (r4 refit on the Cora memo v6 residuals): grids of
    tens of tiles never reach DMA/compute steady state — each x-panel
    switch costs ~700 ns extra and each tile ~120 ns on top of the
    large-grid constants (lstsq over 7 measured GCN-Cora schedules, RMS
    3.3 us).  Fades hyperbolically so the Reddit-scale fits (where the
    314 ns/tile constant was measured at T ~ 5e4) are untouched: at
    T = 51k the ramp adds ~16 ns/tile.  A PER-CALL cost: multi-pass
    chains (GAT/pair-agg factors) must NOT scale it."""
    # panel-switch cost: scales with the panel width up to one 128-lane
    # group (the fit data is F=128; sub-128 widths switch proportionally
    # cheaper, wider panels' extra bytes are already in the panel term)
    per_run = 700.0 * min(max(feat_width, 1), 128) / 128.0
    return (n_runs * per_run + n_tiles * 120.0) / (1.0 + n_tiles / 1024.0)


def tile_time_model_ns(run_nnz: np.ndarray, tile_edges: int,
                       block_rows: int, block_cols: int,
                       *, feat_width: int = 128, x_bytes: int = 2,
                       grid_const_ns: float = 314.0,
                       slot_ns: float = 2.77,
                       include_ramp: bool = True) -> float:
    """Modelled one-hot kernel time for packing the given (rb, cb) run-size
    distribution at one tile capacity (v5e fit, scripts/class_sweep.py +
    tail_geometry.py):

        time = runs * panel  +  tiles * (grid_const + max(0, compute-panel))
        panel = C * F * x_bytes / 819 GB/s      (x col-panel DMA, paid once
                                                 per run: consecutive tiles
                                                 of a run skip the DMA)
        compute = ET * slot_ns * (R+C)/2048     (two one-hot matmuls)

    i.e. per tile the pipeline overlaps the panel DMA with compute and pays
    ``grid_const`` (~314 ns: scalar-stream DMAs, index maps, semaphores) on
    top.  Calibrated at F=128; taking it linear in F is good enough for
    capacity CHOICE (both terms scale with F)."""
    panel = block_cols * feat_width * x_bytes / 819.0
    compute = tile_edges * slot_ns * (block_rows + block_cols) / 2048.0
    compute *= feat_width / 128.0
    tiles = np.ceil(run_nnz / tile_edges)
    per_tile = grid_const_ns + max(0.0, compute - panel)
    n_tiles = float(tiles.sum())
    if n_tiles > 65536:
        # beyond one pallas call (SMEM scalar-prefetch cap) every tile costs
        # ~200 ns extra (measured: Reddit-tail 512x512/128 and 1024x256/128
        # both read +~200 ns/tile over the small-call fit)
        per_tile += 200.0
    ramp = (grid_ramp_ns(len(run_nnz), n_tiles, feat_width)
            if include_ramp else 0.0)
    return float(len(run_nnz) * panel + n_tiles * per_tile + ramp)


def best_tile_capacity(run_nnz: np.ndarray, block_rows: int, block_cols: int,
                       *, candidates: Sequence[int] = tuple(
                           range(128, 1025, 128)),
                       feat_width: int = 128, x_bytes: int = 2) -> int:
    """Tile capacity minimising :func:`tile_time_model_ns` for a run-size
    distribution (measured win on v5e: flickr tail ET 256 -> 128 = -25%)."""
    return min(candidates,
               key=lambda et: (tile_time_model_ns(
                   run_nnz, et, block_rows, block_cols,
                   feat_width=feat_width, x_bytes=x_bytes), et))


def run_nnz_hist(g, block_rows: int, block_cols: int) -> np.ndarray:
    """nnz per nonzero (rb, cb) adjacency block — the run-size distribution
    the capacity model consumes (reference's nnz histograms, C12)."""
    g = _as_host(g)
    ncb = max(_round_up(g.n_node, block_cols) // block_cols, 1)
    key = ((g.receivers[: g.n_edge] // block_rows).astype(np.int64) * ncb
           + g.senders[: g.n_edge] // block_cols)
    cnt = np.bincount(key)
    return cnt[cnt > 0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroupedTiledGraph:
    """Stripe-group chunked edge tiling — the round-3 sparse-tail format.

    The one-hot SpMM kernel's per-edge cost is ``2*(R+C)*F / utilisation``
    FLOPs: smaller blocks are strictly cheaper per edge until tiles fall
    below the MXU's 128-row quantum.  What blocked small blocks before was
    (a) the ~314 ns/grid-step pipeline constant and (b) per-tile x-panel
    DMAs (each tile re-reads its [C, F] column panel).  This format fixes
    both structurally:

    * Row blocks are grouped into *stripe groups* of ``group`` consecutive
      row blocks; the kernel keeps the whole ``group*R``-row output stripe
      resident in VMEM.
    * A *chunk* is one grid step: ``group`` sub-tiles sharing a single
      (stripe-group, col-block) pair — sub-tile ``j`` holds edges of row
      block ``grp*group + j``.  One x-panel DMA serves all ``group``
      sub-tiles, and the grid constant is paid once per chunk.
    * Blocks with more than ``tile_edges`` edges spill level-k>=1 overflow
      chunks for the same (grp, cb); at tail densities (~100 nnz per 512^2
      block) that is ~2% of chunks.

    Net effect vs the per-tile 1024^2/ET512 format: one-hot width R+C
    halves (2048 -> 1024) at equal slot utilisation, grid constant and
    x-traffic amortise ``group``-fold.  Measured on the Reddit tail: see
    results/SUMMARY.md round 3.

    DOMAIN: uniform-sparse regimes (the hybrid TAIL).  Every (grp, cb)
    chunk carries the MAX tile depth over its ``group`` row blocks, so a
    skewed run distribution (e.g. the dense head of a full reordered
    graph) degenerates: one 260k-edge block inflates all G sub-tiles to
    its depth.  Feed full graphs through hybrid_graph(tail_format=
    'grouped') so dense blocks never reach this format.

    Attributes (NC = number of chunks, G = group, ET = tile_edges):
      chunk_grp: int32[NC]  stripe-group index (output block index map)
      chunk_cb:  int32[NC]  col-block index (x panel index map)
      src_local: int32[NC, G, ET]  sender - cb*C   (pad: block_cols)
      dst_local: int32[NC, G, ET]  receiver - rb*R (pad: block_rows)
      edge_id:   int32[NC, G, ET]  parent edge index (pad: masked slot)
      weight:    f32[NC, G, ET]    per-edge weight (0 on padding)
      grp_first_chunk_host: first chunk of each stripe group (chunks are
        grp-major) so huge chunk sets can split into multiple pallas calls
        at group boundaries without a device readback.
    """

    chunk_grp: jax.Array
    chunk_cb: jax.Array
    src_local: jax.Array
    dst_local: jax.Array
    edge_id: jax.Array
    weight: jax.Array
    block_rows: int = dataclasses.field(metadata=dict(static=True))
    block_cols: int = dataclasses.field(metadata=dict(static=True))
    tile_edges: int = dataclasses.field(metadata=dict(static=True))
    group: int = dataclasses.field(metadata=dict(static=True))
    n_node: int = dataclasses.field(metadata=dict(static=True))
    n_groups: int = dataclasses.field(metadata=dict(static=True))
    n_col_blocks: int = dataclasses.field(metadata=dict(static=True))
    grp_first_chunk_host: Optional[Tuple[int, ...]] = dataclasses.field(
        default=None, metadata=dict(static=True))
    # every REAL-edge weight exactly 1.0 (host-checked): the kernel drops
    # the weight stream + multiply entirely (padding safety comes from the
    # one-hot sentinels, not the weights)
    weight_all_unit: bool = dataclasses.field(
        default=False, metadata=dict(static=True))

    @property
    def n_chunks(self) -> int:
        return int(self.chunk_grp.shape[0])

    @property
    def n_tiles(self) -> int:
        return self.n_chunks * self.group

    @property
    def total_slots(self) -> int:
        return self.n_tiles * self.tile_edges


def tile_graph_grouped(
    g,
    *,
    block_rows: int = 512,
    block_cols: int = 512,
    tile_edges: int = 128,
    group: int = 8,
    unit_weight: bool = False,
) -> GroupedTiledGraph:
    """Host-side tiler for :class:`GroupedTiledGraph`.

    Edges are keyed by (stripe-group, col-block, row-block); each (rb, cb)
    run is cut into level-k tiles of ``tile_edges``; level-k tiles of all
    row blocks in one (grp, cb) assemble into chunk (grp, cb, k) at
    sub-tile slot ``j = rb % group``.  Chunks sort by (grp, cb, level) so
    the output stripe stays resident per group and consecutive levels
    reuse the x panel.
    """
    g = _as_host(g)
    ne = g.n_edge
    s = g.senders[:ne]
    r = g.receivers[:ne]
    w = (np.ones(ne, np.float32) if unit_weight else g.edge_weight[:ne])
    n = g.n_node
    nrb = max(_round_up(n, block_rows) // block_rows, 1)
    ncb = max(_round_up(n, block_cols) // block_cols, 1)
    n_groups = max(-(-nrb // group), 1)
    ET, G = tile_edges, group

    rb = (r // block_rows).astype(np.int64)
    cb = (s // block_cols).astype(np.int64)
    grp = rb // G
    rbl = rb % G
    # sort edges by (grp, cb, rbl): runs = (rb, cb) blocks, grouped by
    # (grp, cb) with ascending rbl
    key = (grp * ncb + cb) * G + rbl
    order = np.argsort(key, kind="stable")
    ks = key[order]

    if ne:
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        run_len = np.diff(np.concatenate([starts, [ne]]))
        run_key = ks[starts]
        run_grpcb = run_key // G                     # combined grp*ncb+cb
        run_rbl = (run_key % G).astype(np.int64)
        run_levels = -(-run_len // ET)               # tiles per run
        # chunk count per (grp, cb) = max levels over its runs
        gc_start = np.flatnonzero(np.concatenate(
            [[True], run_grpcb[1:] != run_grpcb[:-1]]))
        gc_id_of_run = np.searchsorted(gc_start, np.arange(len(run_key)),
                                       side="right") - 1
        n_gc = len(gc_start)
        gc_levels = np.maximum.reduceat(run_levels, gc_start)
        chunk_base = np.concatenate([[0], np.cumsum(gc_levels)[:-1]])
        NC_data = int(gc_levels.sum())
        # per-chunk metadata
        gc_key = run_grpcb[gc_start]
        chunk_grp = np.repeat((gc_key // ncb).astype(np.int32), gc_levels)
        chunk_cb = np.repeat((gc_key % ncb).astype(np.int32), gc_levels)
        # edge placement
        run_of_edge = np.searchsorted(starts, np.arange(ne),
                                      side="right") - 1
        offset = np.arange(ne) - starts[run_of_edge]
        level = offset // ET
        slot = (offset % ET).astype(np.int64)
        chunk_of_edge = chunk_base[gc_id_of_run[run_of_edge]] + level
        j_of_edge = run_rbl[run_of_edge]
    else:
        NC_data = 0
        chunk_grp = chunk_cb = np.zeros(0, np.int32)
        chunk_of_edge = j_of_edge = slot = np.zeros(0, np.int64)

    # every stripe group must own >= 1 chunk (output zero/write visit)
    missing = np.setdiff1d(np.arange(n_groups, dtype=np.int32),
                           np.unique(chunk_grp))
    NC = NC_data + len(missing)
    src_l = np.full((NC, G, ET), block_cols, np.int32)
    dst_l = np.full((NC, G, ET), block_rows, np.int32)
    eid = np.full((NC, G, ET), max(g.e_pad - 1, 0), np.int32)
    wv = np.zeros((NC, G, ET), np.float32)
    if ne:
        se, re_, we = s[order], r[order], w[order]
        eids = np.arange(ne, dtype=np.int32)[order]
        src_l[chunk_of_edge, j_of_edge, slot] = (
            se - chunk_cb[chunk_of_edge].astype(np.int64) * block_cols
        ).astype(np.int32)
        dst_l[chunk_of_edge, j_of_edge, slot] = (re_ % block_rows).astype(
            np.int32)
        eid[chunk_of_edge, j_of_edge, slot] = eids
        wv[chunk_of_edge, j_of_edge, slot] = we
    if len(missing):
        chunk_grp = np.concatenate([chunk_grp, missing])
        chunk_cb = np.concatenate([chunk_cb,
                                   np.zeros(len(missing), np.int32)])
        corder = np.argsort(chunk_grp, kind="stable")
        chunk_grp, chunk_cb = chunk_grp[corder], chunk_cb[corder]
        src_l, dst_l = src_l[corder], dst_l[corder]
        eid, wv = eid[corder], wv[corder]

    grp_first = np.searchsorted(
        chunk_grp, np.arange(n_groups + 1)).astype(np.int64)

    # detect unit weights from the pre-placement REAL edge weights: the slot
    # array pads with 0.0, so testing it would mistake real weight-0.0 edges
    # (masked/dropped) for padding and let the unit-weight kernel treat them
    # as weight 1.0
    w_unit = bool(ne == 0 or np.all(w == 1.0))

    idt = jnp.int16 if max(block_rows, block_cols) < 32000 else jnp.int32
    return GroupedTiledGraph(
        chunk_grp=jnp.asarray(chunk_grp),
        chunk_cb=jnp.asarray(chunk_cb),
        src_local=jnp.asarray(src_l, idt),
        dst_local=jnp.asarray(dst_l, idt),
        edge_id=jnp.asarray(eid),
        weight=jnp.asarray(wv),
        block_rows=block_rows,
        block_cols=block_cols,
        tile_edges=ET,
        group=G,
        n_node=n,
        n_groups=n_groups,
        n_col_blocks=ncb,
        grp_first_chunk_host=tuple(int(v) for v in grp_first),
        weight_all_unit=w_unit,
    )


def tile_graph_classes(
    g,
    *,
    block_rows: int = 1024,
    block_cols: int = 1024,
    tile_classes: Sequence[int] = (64, 128, 256, 512, 1024),
    unit_weight: bool = False,
    fixed_slots: int = 80,
) -> MultiTiledGraph:
    """Multi-capacity tiling (see :class:`MultiTiledGraph`).

    ``fixed_slots`` is the per-tile fixed kernel cost in edge-slot units
    (~240 ns grid-step overhead / 3.2 ns per slot at R+C=2048, measured on
    v5e); it is what stops the assignment from always picking the smallest
    class.  Classes that win no run produce no TiledGraph.
    """
    g = _as_host(g)
    ne = g.n_edge
    s = g.senders[:ne]
    r = g.receivers[:ne]
    w = (np.ones(ne, np.float32) if unit_weight
         else g.edge_weight[:ne])
    tile_classes = sorted(set(int(c) for c in tile_classes))
    ncb = max(_round_up(g.n_node, block_cols) // block_cols, 1)

    key = (r // block_rows).astype(np.int64) * ncb + (s // block_cols)
    order = np.argsort(key, kind="stable")
    ks = key[order]
    starts = (np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
              if ne else np.zeros(0, np.int64))
    run_len = np.diff(np.concatenate([starts, [ne]]))
    scale = (block_rows + block_cols) / 2048.0
    cost = np.stack([np.ceil(run_len / et) * (et * scale + fixed_slots)
                     for et in tile_classes], axis=0)
    choice = cost.argmin(axis=0) if ne else np.zeros(0, np.int64)
    edge_class = np.repeat(choice, run_len)        # aligned with `order`

    parts = []
    for ci, et in enumerate(tile_classes):
        eidx = order[edge_class == ci]             # parent edge ids
        k = len(eidx)
        if k == 0:
            continue
        sub_ep = max(_round_up(k, 128), 128)
        sub = HostGraph(
            senders=np.concatenate(
                [s[eidx], np.full(sub_ep - k, g.n_node, np.int32)]),
            receivers=np.concatenate(
                [r[eidx], np.full(sub_ep - k, g.n_node, np.int32)]),
            edge_mask=np.concatenate(
                [np.ones(k, bool), np.zeros(sub_ep - k, bool)]),
            edge_weight=np.concatenate(
                [w[eidx], np.zeros(sub_ep - k, np.float32)]),
            n_node=g.n_node,
            n_edge=k,
        )
        tg = tile_graph(sub, block_rows=block_rows, block_cols=block_cols,
                        tile_edges=et, unit_weight=False)
        # remap the subgraph-local edge ids back to the parent edge space
        # (per-edge values like attention alphas index the PARENT arrays);
        # jnp.take, not numpy: tg.edge_id is a device array and a readback
        # would poison the process (see HostGraph docstring)
        remap = np.concatenate(
            [eidx.astype(np.int32),
             np.full(sub_ep - k, max(g.e_pad - 1, 0), np.int32)])
        tg = dataclasses.replace(
            tg, edge_id=jnp.take(jnp.asarray(remap), tg.edge_id, axis=0))
        parts.append(tg)
    if not parts:
        # edge-less graph: keep one empty single-class tiling so kernels
        # still visit (zero) every output block
        parts = [tile_graph(g, block_rows=block_rows, block_cols=block_cols,
                            tile_edges=tile_classes[-1],
                            unit_weight=unit_weight)]
    return MultiTiledGraph(parts=tuple(parts))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseBlockGraph:
    """Dense adjacency blocks for the MXU-direct aggregation path.

    The reference re-dispatches edge tiles to its MM unit when a tile is
    >90% dense (vTCAD/code/simulator.py:541-545).  The TPU equivalent goes
    further: for adjacency blocks whose nnz exceeds the FLOP-balance
    threshold, materialise the block as a dense [R, C] value matrix and
    aggregate with a plain MXU matmul ``Y_rb += A_b @ X_cb`` — work scales
    with R*C*F instead of nnz*(R+C)*128, no per-edge index arrays, and
    (for attention) the per-edge softmax becomes a masked dense softmax.

    Attributes (B = number of dense blocks):
      blk_rb: int32[B]      row-block index
      blk_cb: int32[B]      col-block index
      values: bf16/f32[B, R, C]  summed edge weights (0 where no edge)
      row_mask: bool[n_row_blocks]  True where ANY dense block writes the
        row stripe (device-side so kernels never read indices back to host
        — a D2H readback permanently degrades the axon tunnel)
      supergroup: 0 = blocks sorted rb-major (output stripe resident);
        G > 0 = sorted by (rb//G, cb, rb) with the output accumulated over
        G*R-row superstripes — consecutive same-cb blocks reuse one x panel
        DMA, dividing x HBM traffic by up to G (the large-graph regime where
        x panel re-reads dominate).
    """

    blk_rb: jax.Array
    blk_cb: jax.Array
    values: jax.Array
    row_mask: jax.Array
    block_rows: int = dataclasses.field(metadata=dict(static=True))
    block_cols: int = dataclasses.field(metadata=dict(static=True))
    n_node: int = dataclasses.field(metadata=dict(static=True))
    n_row_blocks: int = dataclasses.field(metadata=dict(static=True))
    n_col_blocks: int = dataclasses.field(metadata=dict(static=True))
    supergroup: int = dataclasses.field(default=0, metadata=dict(static=True))
    # 'rc': values[b] is [R, C] (A_b, the SpMM operand); 'cr': [C, R]
    # (A_b^T, pre-transposed for the transposed attention kernel)
    values_layout: str = dataclasses.field(default="rc",
                                           metadata=dict(static=True))

    @property
    def n_blocks(self) -> int:
        return int(self.blk_rb.shape[0])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybridGraph:
    """Density-split graph: dense adjacency blocks (MXU-direct) + the sparse
    remainder as edge tiles (one-hot kernels).  Same (R, C) grid for both so
    the two kernels' outputs add elementwise.  ``dense`` is None when no
    block passes the threshold (pure edge-tile execution)."""

    dense: Optional[DenseBlockGraph]
    tiles: TiledGraph
    n_dense_edges: int = dataclasses.field(metadata=dict(static=True))
    n_sparse_edges: int = dataclasses.field(metadata=dict(static=True))
    # separable edge-weight recovery for INTEGRAL (count) dense blocks:
    # w_e = row_scale[receiver] * col_scale[sender] (e.g. symmetric norm).
    # None = dense values already carry the weights.  The edge tail always
    # carries real weights; these feed ops.dense.spmm_dense only.
    row_scale: Optional[jax.Array] = None
    col_scale: Optional[jax.Array] = None


def block_nnz(g, block_rows: int, block_cols: int) -> np.ndarray:
    """nnz per (row_block, col_block) adjacency block, shape [RB, CB].
    The execution-time consumer of the reference's per-tile nnz statistics
    (preprocessing.py:calculate_sparsity) — drives the dense-vs-sparse
    dispatch."""
    g = _as_host(g)
    s = g.senders[: g.n_edge]
    r = g.receivers[: g.n_edge]
    rbn = max(_round_up(g.n_node, block_rows) // block_rows, 1)
    cbn = max(_round_up(g.n_node, block_cols) // block_cols, 1)
    key = (r // block_rows).astype(np.int64) * cbn + (s // block_cols)
    return np.bincount(key, minlength=rbn * cbn).reshape(rbn, cbn)


def hybrid_graph(
    g,
    *,
    block_rows: int = 256,
    block_cols: int = 256,
    tile_edges: int = 512,
    min_nnz: int,
    unit_weight: bool = False,
    supergroup: int = 0,
    values_dtype=np.float32,
    sparse_block_rows: Optional[int] = None,
    sparse_block_cols: Optional[int] = None,
    block_layout: str = "rc",
    tile_classes: Optional[Sequence[int]] = None,
    tail_format: str = "tiles",
    tail_group: int = 16,
) -> HybridGraph:
    """Split the adjacency by per-block density: blocks with
    ``nnz >= min_nnz`` become dense [R, C] value matrices, the rest stays
    edge-tiled.  ``min_nnz <= 0`` disables the dense path entirely.
    ``supergroup`` G > 0 orders dense blocks by (rb//G, cb, rb) for x-panel
    reuse (see DenseBlockGraph).  ``values_dtype``: ml_dtypes.bfloat16
    halves host+device memory for large dense sets.

    ``sparse_block_*``: geometry for the EDGE-TILE remainder, decoupled
    from the dense grid (default: same).  At large-graph scale the tail is
    extremely sparse — a 256-grid block holds a handful of edges, so every
    512-slot tile is ~1% utilised; the tail wants blocks as large as VMEM
    allows (per-edge one-hot cost ∝ (1/R + 1/C) / density).  Outputs still
    add: both kernels emit [row-padded, F] aligned at row 0.

    ``tail_format='grouped'``: the remainder uses the stripe-group chunked
    format (GroupedTiledGraph + the grouped SpMM kernel) — halves the
    one-hot width at equal utilisation by amortising the x panel and grid
    constant over ``tail_group`` sub-tiles (the round-3 tail redesign;
    SpMM-only: attention kernels still consume the per-tile format).

    An INTEGRAL ``values_dtype`` (np.int8) stores dense blocks as edge
    COUNTS (0/1 after dedup) regardless of edge weights — halving the
    dense-path HBM traffic vs bf16.  The tail tiles keep the real
    weights; callers recover separable weights (e.g. symmetric norm
    ``w_e = deg_in[r]^-1/2 * deg_out[s]^-1/2``) via the ``row_scale`` /
    ``col_scale`` arguments of ``ops.dense.spmm_dense``."""
    g = _as_host(g)
    s = g.senders[: g.n_edge]
    r = g.receivers[: g.n_edge]
    integral_vals = np.issubdtype(np.dtype(values_dtype), np.integer)
    w = (np.ones(g.n_edge, np.float32) if unit_weight
         else g.edge_weight[: g.n_edge])
    # dense accumulation source: unit counts for integral dtypes
    wd = np.ones(g.n_edge, np.float32) if integral_vals else w

    sbr = sparse_block_rows or block_rows
    sbc = sparse_block_cols or block_cols
    nnz = block_nnz(g, block_rows, block_cols)
    rbn, cbn = nnz.shape
    dense_mask2d = nnz >= max(min_nnz, 1) if min_nnz > 0 else np.zeros_like(nnz, bool)
    dense_ids = np.flatnonzero(dense_mask2d.reshape(-1))      # rb-major order

    if len(dense_ids) == 0:
        if tail_format == "grouped":
            tiles = tile_graph_grouped(
                g, block_rows=sbr, block_cols=sbc, tile_edges=tile_edges,
                group=tail_group, unit_weight=unit_weight)
        elif tile_classes:
            tiles = tile_graph_classes(
                g, block_rows=sbr, block_cols=sbc,
                tile_classes=tile_classes, unit_weight=unit_weight)
        else:
            tiles = tile_graph(g, block_rows=sbr, block_cols=sbc,
                               tile_edges=tile_edges,
                               unit_weight=unit_weight)
        return HybridGraph(dense=None, tiles=tiles,
                           n_dense_edges=0, n_sparse_edges=g.n_edge)

    d_rb = (dense_ids // cbn).astype(np.int64)
    d_cb = (dense_ids % cbn).astype(np.int64)
    if supergroup > 0:
        # (rb//G, cb, rb) order: same-cb runs within a supergroup share one
        # resident x panel
        order = np.lexsort((d_rb, d_cb, d_rb // supergroup))
        dense_ids, d_rb, d_cb = dense_ids[order], d_rb[order], d_cb[order]

    key = (r // block_rows).astype(np.int64) * cbn + (s // block_cols)
    slot_of = np.full(rbn * cbn, -1, np.int64)
    slot_of[dense_ids] = np.arange(len(dense_ids))
    e_slot = slot_of[key]
    in_dense = e_slot >= 0

    rest_extra_drop = None      # edge ids merged away (weighted path only)
    w_rest = w
    if integral_vals and in_dense.any():
        # multi-edge saturation guard: an int8 cell holds at most 127 — for
        # any (receiver, sender) pair with multiplicity above the dtype max
        # (synthetic generators emit multi-edges; zipf head x small
        # community exceeds 127 at Reddit scale), keep `cap` copies in the
        # dense count and EVICT the excess copies to the edge tail.
        #
        # Both semantics are LINEAR in per-pair multiplicity — SpMM in the
        # summed edge weight, attention in the softmax-term count (the GAT
        # kernels scale every exp term by the tile weight) — so the excess
        # copies MERGE into one residual tail edge carrying their summed
        # weight / count: a 5,800-multiplicity hot pair costs one tail
        # slot, not 5,673 (measured: exact-GAT Reddit would otherwise grow
        # the tail 24.4M -> 33.4M edges, +25% attention time).
        cap = int(np.iinfo(values_dtype).max)
        keys = r[in_dense].astype(np.int64) * (g.n_node + 1) + s[in_dense]
        korder = np.argsort(keys, kind="stable")
        ks = keys[korder]
        new_grp = np.concatenate([[True], ks[1:] != ks[:-1]])
        grp_start = np.flatnonzero(new_grp)
        sizes = np.diff(np.concatenate([grp_start, [len(ks)]]))
        if sizes.max(initial=0) > cap:
            occ = np.arange(len(ks)) - np.repeat(grp_start, sizes)
            idx_dense = np.flatnonzero(in_dense)
            evict_local = korder[occ >= cap]
            in_dense[idx_dense[evict_local]] = False
            e_slot = np.where(in_dense, e_slot, -1)
            over = np.flatnonzero(sizes > cap)
            lens = sizes[over] - cap
            starts = grp_start[over] + cap
            pos = (np.repeat(starts, lens)
                   + np.arange(int(lens.sum()))
                   - np.repeat(np.cumsum(lens) - lens, lens))
            eids = idx_dense[korder[pos]]          # all excess copies
            gidx = np.repeat(np.arange(len(over)), lens)
            wsum = np.bincount(gidx, weights=w[eids].astype(np.float64))
            resid = idx_dense[korder[starts]]      # one residual / pair
            w_rest = w.copy()
            w_rest[resid] = wsum.astype(np.float32)
            drop = np.zeros(g.n_edge, bool)
            drop[eids] = True
            drop[resid] = False
            rest_extra_drop = drop

    assert block_layout in ("rc", "cr"), block_layout
    blk_shape = ((block_rows, block_cols) if block_layout == "rc"
                 else (block_cols, block_rows))
    i_r = r[in_dense] % block_rows
    i_c = s[in_dense] % block_cols
    if block_layout == "cr":
        i_r, i_c = i_c, i_r
    if values_dtype == np.float32:
        values = np.zeros((len(dense_ids),) + blk_shape, np.float32)
        np.add.at(values, (e_slot[in_dense], i_r, i_c), wd[in_dense])
    else:
        # low-precision store: accumulate in f32 CHUNKS of blocks, cast per
        # chunk (np.add.at on exotic dtypes is slow and lossy; a per-block
        # Python loop costs minutes at Reddit scale)
        B = len(dense_ids)
        values = np.zeros((B,) + blk_shape, values_dtype)
        es, rs, cs, ws = e_slot[in_dense], i_r, i_c, wd[in_dense]
        eorder = np.argsort(es, kind="stable")
        es, rs, cs, ws = es[eorder], rs[eorder], cs[eorder], ws[eorder]
        CH = max(1, (256 * 2**20) // (block_rows * block_cols * 4))
        starts = np.searchsorted(es, np.arange(0, B + CH, CH))
        for i, b0 in enumerate(range(0, B, CH)):
            nb = min(CH, B - b0)
            buf = np.zeros((nb,) + blk_shape, np.float32)
            lo, hi = starts[i], starts[i + 1]
            np.add.at(buf, (es[lo:hi] - b0, rs[lo:hi], cs[lo:hi]), ws[lo:hi])
            values[b0:b0 + nb] = buf.astype(values_dtype)

    row_mask = np.zeros(rbn, bool)
    row_mask[d_rb] = True
    dense = DenseBlockGraph(
        blk_rb=jnp.asarray(d_rb.astype(np.int32)),
        blk_cb=jnp.asarray(d_cb.astype(np.int32)),
        values=jnp.asarray(values),
        row_mask=jnp.asarray(row_mask),
        block_rows=block_rows,
        block_cols=block_cols,
        n_node=g.n_node,
        n_row_blocks=rbn,
        n_col_blocks=cbn,
        supergroup=int(supergroup),
        values_layout=block_layout,
    )

    rest_keep = ~in_dense
    if rest_extra_drop is not None:
        rest_keep &= ~rest_extra_drop     # merged multi-edge copies
    n_rest = int(rest_keep.sum())
    rest = HostGraph(
        senders=np.concatenate(
            [s[rest_keep], np.full(g.e_pad - n_rest, g.n_node, np.int32)]),
        receivers=np.concatenate(
            [r[rest_keep], np.full(g.e_pad - n_rest, g.n_node, np.int32)]),
        edge_mask=np.concatenate(
            [np.ones(n_rest, bool), np.zeros(g.e_pad - n_rest, bool)]),
        edge_weight=np.concatenate(
            [w_rest[rest_keep],
             np.zeros(g.e_pad - n_rest, np.float32)]),
        n_node=g.n_node,
        n_edge=n_rest,
    )
    # rest.edge_weight already carries the requested weights (1s when
    # unit_weight), so tile_graph must NOT re-unit them
    if tail_format == "grouped":
        tiles = tile_graph_grouped(rest, block_rows=sbr, block_cols=sbc,
                                   tile_edges=tile_edges, group=tail_group,
                                   unit_weight=False)
    elif tile_classes:
        tiles = tile_graph_classes(rest, block_rows=sbr, block_cols=sbc,
                                   tile_classes=tile_classes,
                                   unit_weight=False)
    else:
        tiles = tile_graph(rest, block_rows=sbr, block_cols=sbc,
                           tile_edges=tile_edges, unit_weight=False)
    # n_sparse_edges is the LOGICAL count the tail represents: merged
    # multi-edge copies still contribute (summed weight), so dense+sparse
    # always partitions the input edge set
    return HybridGraph(dense=dense, tiles=tiles,
                       n_dense_edges=int(in_dense.sum()),
                       n_sparse_edges=g.n_edge - int(in_dense.sum()))


# full-densification cap: above this node count the [N, N] bf16 adjacency
# exceeds ~8 GB and the blocked hybrid/one-hot paths win
DENSEFULL_MAX_N = 65536


def batch_host_graph(g, batch: int, *, copy_stride: Optional[int] = None
                     ) -> "HostGraph":
    """Block-diagonal batching of ``batch`` copies of one graph (the
    serving shape), with each copy's node range padded to ``copy_stride``
    (default: next multiple of 1024).

    The alignment is the point: with stride % block == 0 the tiler
    produces IDENTICAL per-copy tiles — no adjacency block straddles two
    copies, so the batched graph keeps the B=1 tiling's fill instead of
    the straddled blocks' (measured collapse: grouped fill 0.18 on
    unaligned B=64 Cora, scripts/serving_grouped_ab.py).  Features are
    laid out [batch * copy_stride, F] with per-copy zero padding
    (:func:`pad_batch_features`)."""
    g = _as_host(g)
    stride = copy_stride or _round_up(g.n_node, 1024)
    ne = g.n_edge
    off = (np.arange(batch, dtype=np.int64)[:, None] * stride)
    s = (g.senders[:ne][None, :] + off).reshape(-1)
    r = (g.receivers[:ne][None, :] + off).reshape(-1)
    w = np.tile(g.edge_weight[:ne], batch)
    n_tot = batch * stride
    e_tot = batch * ne
    e_pad = _round_up(e_tot, 512)
    return HostGraph(
        senders=np.concatenate(
            [s, np.full(e_pad - e_tot, n_tot, np.int64)]).astype(np.int32),
        receivers=np.concatenate(
            [r, np.full(e_pad - e_tot, n_tot, np.int64)]).astype(np.int32),
        edge_mask=np.concatenate(
            [np.ones(e_tot, bool), np.zeros(e_pad - e_tot, bool)]),
        edge_weight=np.concatenate(
            [w, np.zeros(e_pad - e_tot, np.float32)]).astype(np.float32),
        n_node=n_tot,
        n_edge=e_tot,
    )


def pad_batch_features(x: np.ndarray, batch: int, n_node: int,
                       copy_stride: Optional[int] = None) -> np.ndarray:
    """[batch, n_node, F] (or [batch*n_node, F]) -> the padded
    [batch * stride, F] layout :func:`batch_host_graph` expects."""
    stride = copy_stride or _round_up(n_node, 1024)
    x = np.asarray(x).reshape(batch, n_node, -1)
    out = np.zeros((batch, stride, x.shape[-1]), x.dtype)
    out[:, :n_node] = x
    return out.reshape(batch * stride, -1)


def dense_adjacency(g, *, weighted: bool = True, pad_multiple: int = 256,
                    dtype=None) -> np.ndarray:
    """The FULL dense adjacency [N_pad, N_pad] (rows = receivers, cols =
    senders; summed edge weights, or multi-edge counts when unweighted) —
    the medium-density regime's aggregation operand: at pubmed scale
    (N ~ 20k, E/N ~ 5) one big ``A @ x`` MXU matmul beats both the
    underfilled one-hot tiles and XLA's row-at-a-time gathers.
    bf16 by default (ml_dtypes); the sym-norm weights ride inside A."""
    import ml_dtypes
    g = _as_host(g)
    assert g.n_node <= DENSEFULL_MAX_N, (
        f"dense_adjacency at n={g.n_node} would need "
        f"{(g.n_node / 1024)**2 * 2 / 1024:.1f} GB — use the hybrid path")
    if dtype is None:
        dtype = ml_dtypes.bfloat16
    n_pad = _round_up(g.n_node, pad_multiple)
    a = np.zeros((n_pad, n_pad), np.float32)
    ne = g.n_edge
    w = (g.edge_weight[:ne] if weighted else np.ones(ne, np.float32))
    np.add.at(a, (g.receivers[:ne], g.senders[:ne]), w)
    return a.astype(dtype)


def separable_weight_scales(g) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(row_scale, col_scale) with ``w_e == row_scale[receiver] *
    col_scale[sender]`` when the edge weights are the symmetric
    normalisation (deg^-1/2 on both sides — the standard GCN weighting),
    else None.  Verified against the actual weights, so int8 count blocks
    + separable scales reproduce a weighted SpMM exactly."""
    g = _as_host(g)
    ne = g.n_edge
    if ne == 0:
        return None
    s = g.senders[:ne]
    r = g.receivers[:ne]
    w = g.edge_weight[:ne]
    deg_in = np.bincount(r, minlength=g.n_node)[: g.n_node]
    deg_out = np.bincount(s, minlength=g.n_node)[: g.n_node]
    rs = (1.0 / np.sqrt(np.maximum(deg_in, 1))).astype(np.float32)
    cs = (1.0 / np.sqrt(np.maximum(deg_out, 1))).astype(np.float32)
    if np.allclose(w, rs[r] * cs[s], rtol=1e-5, atol=1e-7):
        return rs, cs
    return None


def _label_prop_numpy(row_ptr: np.ndarray, nbrs: np.ndarray, n: int,
                      max_iter: int) -> np.ndarray:
    """Vectorised label propagation, numpy fallback for cluster_labels.

    Per sweep the winning neighbour label is computed for every node at
    once, but applied in two parity half-steps (even ids, then odd) — the
    two-colour schedule breaks the synchronous-update oscillations that
    plain parallel LPA is prone to (label-swapping node pairs)."""
    labels = np.arange(n, dtype=np.int64)
    owner = np.repeat(np.arange(n, dtype=np.int64), np.diff(row_ptr))

    def winners(lab):
        key = owner * n + lab[nbrs]
        uniq, cnt = np.unique(key, return_counts=True)
        own_u, lab_u = uniq // n, uniq % n
        # max count per owner, ties toward the smaller label id
        sel = np.lexsort((lab_u, -cnt, own_u))
        own_s = own_u[sel]
        first = np.concatenate([[True], own_s[1:] != own_s[:-1]])
        win = lab.copy()
        win[own_s[first]] = lab_u[sel][first]
        return win

    for _ in range(max_iter):
        changed = 0
        for parity in (0, 1):
            win = winners(labels)
            mask = (np.arange(n) % 2) == parity
            upd = mask & (win != labels)
            labels = np.where(upd, win, labels)
            changed += int(upd.sum())
        if changed * 1000 < n:
            break
    return labels


def transpose_host_graph(g) -> Tuple[HostGraph, np.ndarray]:
    """The transposed graph Aᵀ (senders <-> receivers, weights preserved)
    plus ``perm``: for edge i of the TRANSPOSED graph, ``perm[i]`` is its
    index in the original edge order (identity on weights; lets runtime
    per-edge values ride into transposed tilings via one [E] take).

    This is the backbone of the tiled backward (VERDICT r2 next-3): the
    VJP of y = A x is dx = Aᵀ ȳ — the SAME kernel over the transposed
    tiling, instead of the [E, F]-materialising XLA recompute."""
    g = _as_host(g)
    ne = g.n_edge
    order = np.argsort(g.senders[:ne], kind="stable")
    gt = HostGraph(
        senders=np.concatenate(
            [g.receivers[:ne][order],
             np.full(g.e_pad - ne, g.n_node, np.int32)]),
        receivers=np.concatenate(
            [g.senders[:ne][order],
             np.full(g.e_pad - ne, g.n_node, np.int32)]),
        edge_mask=np.concatenate(
            [np.ones(ne, bool), np.zeros(g.e_pad - ne, bool)]),
        edge_weight=np.concatenate(
            [g.edge_weight[:ne][order],
             np.zeros(g.e_pad - ne, np.float32)]),
        n_node=g.n_node,
        n_edge=ne,
    )
    perm = np.concatenate(
        [order.astype(np.int64),
         np.full(g.e_pad - ne, max(g.e_pad - 1, 0), np.int64)])
    return gt, perm


def cluster_labels(g: HostGraph, max_iter: int = 20, seed: int = 0):
    """Community assignment by label propagation — NO ground-truth labels.

    This is the clustering pass a production pipeline runs on a real graph
    before block-sparse execution: the hybrid density split earns its dense
    blocks from community locality, and real data does not come with the
    planted labels the synthetic generator returns.  The reference likewise
    assumes a pre-clustered node order for its per-tile nnz statistics
    (``FinalVersion For Paper/preprocessing.py``, maxlist sizing
    ``vTCAD/code/compiler.py:504``).

    Native async-LPA (``native/cluster.cpp``, deterministic seeded sweeps)
    with a vectorised numpy fallback.  Returns compact int32 community ids
    in [0, k)."""
    from . import native

    s = g.senders[: g.n_edge].astype(np.int64)
    r = g.receivers[: g.n_edge].astype(np.int64)
    n = g.n_node
    keep = s != r  # self loops carry no community information
    u = np.concatenate([s[keep], r[keep]]).astype(np.int32)
    v = np.concatenate([r[keep], s[keep]]).astype(np.int32)
    lab = None
    if native.HAVE_NATIVE:
        order = native.sort_by_receiver_native(u, n)  # O(E) counting sort
    else:
        order = np.argsort(u, kind="stable")
    nbrs = v[order]
    deg = np.bincount(u, minlength=n)
    row_ptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    if native.HAVE_NATIVE:
        lab = native.label_prop_native(row_ptr, nbrs, n,
                                       max_iter=max_iter, seed=seed)
    if lab is None:
        lab = _label_prop_numpy(row_ptr, nbrs, n, max_iter)
    _, compact = np.unique(lab, return_inverse=True)
    return compact.astype(np.int32)


def reorder_nodes(g: HostGraph, method: str = "degree", labels=None,
                  perm=None):
    """Relabel nodes to densify adjacency blocks (returns (HostGraph, perm),
    where perm[new_id] = old_id; apply ``x[perm]`` to node features).

    Power-law graphs under arbitrary labelling spread edges uniformly over
    the block grid, which is the worst case for block-sparse kernels (every
    tile nearly empty).  Degree-descending relabelling concentrates edges in
    the low-index blocks — the classic densification the reference's own
    per-tile nnz statistics exist to exploit (preprocessing.py).

    ``method="labels"`` groups nodes by a cluster assignment (``labels``,
    e.g. metis/louvain communities), degree-descending within each cluster
    — intra-cluster edges land in dense diagonal blocks.
    """
    s = g.senders[: g.n_edge]
    r = g.receivers[: g.n_edge]
    if method == "degree":
        deg = np.bincount(r, minlength=g.n_node) + np.bincount(
            s, minlength=g.n_node)
        perm = np.argsort(-deg, kind="stable").astype(np.int64)
    elif method == "labels":
        assert labels is not None and len(labels) == g.n_node
        deg = np.bincount(r, minlength=g.n_node) + np.bincount(
            s, minlength=g.n_node)
        perm = np.lexsort((-deg, np.asarray(labels))).astype(np.int64)
    elif method == "hubs+labels":
        # global hubs first (one dense row region catches the power-law
        # head of CROSS-community edges), then label-grouped: the two-level
        # ordering that densifies both the degree head and the community
        # diagonal.  hub cut = top 2% by degree.
        assert labels is not None and len(labels) == g.n_node
        deg = np.bincount(r, minlength=g.n_node) + np.bincount(
            s, minlength=g.n_node)
        k = max(int(g.n_node * 0.02), 1)
        cut = np.sort(deg)[::-1][k - 1]
        is_hub = deg >= max(cut, 1)
        key_group = np.where(is_hub, -1, np.asarray(labels))
        perm = np.lexsort((-deg, key_group)).astype(np.int64)
    elif method == "cluster":
        # label-free: discover communities by label propagation, then apply
        # the hubs+labels two-level ordering — the path real graphs take
        # (planted labels only exist for synthetic data)
        found = cluster_labels(g)
        return reorder_nodes(g, "hubs+labels", labels=found)
    elif method == "none":
        perm = np.arange(g.n_node, dtype=np.int64)
    elif method == "perm":
        # caller-supplied relabelling (e.g. parallel.community_partition_order)
        assert perm is not None and len(perm) == g.n_node
        perm = np.asarray(perm, np.int64)
    else:
        raise ValueError(f"unknown reorder method {method!r}")
    inv = np.empty_like(perm)
    inv[perm] = np.arange(g.n_node)
    out = build_host_graph(
        inv[s].astype(np.int32), inv[r].astype(np.int32), g.n_node,
        edge_weight=g.edge_weight[: g.n_edge],
        edge_pad_multiple=g.e_pad,   # preserve the static edge padding
    )
    return out, perm


def nnz_histogram(g, tile_rows: int) -> np.ndarray:
    """nnz count per tile_rows-row stripe of the adjacency — the autotuner
    feature retained from the reference's preprocessing (SURVEY §7 layer 1)."""
    receivers = _as_host(g).receivers[: g.n_edge]
    n_stripes = _round_up(g.n_node, tile_rows) // tile_rows
    hist = np.zeros(n_stripes, np.int64)
    np.add.at(hist, receivers // tile_rows, 1)
    return hist
