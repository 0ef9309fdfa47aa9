"""Hierarchical (hosts x chips) 2-D mesh partition with per-axis collectives.

The 1-D plan (partition.py) runs one all_to_all over a flat axis — correct
on any mesh, but on a multi-host pod every (shard -> shard) halo pair rides
DCN when the pair crosses hosts, and the same boundary row is shipped once
PER DESTINATION SHARD.  The SURVEY §7 design (ICI within a host, DCN across
hosts) wants the cross-host traffic deduplicated at host granularity:

  * intra-host halo: per same-host (p -> q) pair, unique senders — ONE
    ``all_to_all`` over the inner ``chip`` axis (ICI);
  * inter-host halo: per (shard -> destination HOST) unique senders — a row
    needed by several chips of host j crosses DCN exactly once: one
    ``all_to_all`` over the outer ``host`` axis (chip c of host i pairs
    with chip c of host j), then one ``all_gather`` over ``chip``
    redistributes the received rows inside the destination host (ICI);
  * hubs: ``all_gather`` over both axes (replication, as in 1-D).

Per-shard remote-source table layout (shard = (host i, chip c)):

    [ intra (Dc*Hin) ‖ inter (Dc*Dh*Hout, sender-chip-major) ‖
      hubs (D*Kh) ‖ zero dump row ]

``er_src`` indexes this table, so lower_shard's compute path is unchanged —
only :func:`remote_table` (dist.py) dispatches on the partition type.

No reference counterpart (the reference is single-device, SURVEY §2); the
design follows the standard hierarchical halo exchange for torus networks.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import _as_host
from .partition import _round_up

HOST_AXIS = "host"
CHIP_AXIS = "chip"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGraph2D:
    """Static per-shard arrays for the hierarchical plan.  Leading axis
    D = Dh*Dc (host-major shard order); shard with P(('host','chip'))."""

    send_in_idx: jax.Array    # int32[D, Dc, Hin]  intra-host halo sends
    send_in_mask: jax.Array   # bool [D, Dc, Hin]
    send_out_idx: jax.Array   # int32[D, Dh, Hout] deduped per-host sends
    send_out_mask: jax.Array  # bool [D, Dh, Hout]
    hub_idx: jax.Array        # int32[D, Kh]
    hub_mask: jax.Array       # bool [D, Kh]
    el_src: jax.Array         # int32[D, EL]
    el_dst: jax.Array
    el_w: jax.Array
    el_mask: jax.Array
    er_src: jax.Array         # int32[D, ER] rows of the 2-D combined table
    er_dst: jax.Array
    er_w: jax.Array
    er_mask: jax.Array
    n_local: int = dataclasses.field(metadata=dict(static=True))
    d_host: int = dataclasses.field(metadata=dict(static=True))
    d_chip: int = dataclasses.field(metadata=dict(static=True))
    halo_in: int = dataclasses.field(metadata=dict(static=True))
    halo_out: int = dataclasses.field(metadata=dict(static=True))
    hub_cap: int = dataclasses.field(metadata=dict(static=True))
    n_node: int = dataclasses.field(metadata=dict(static=True))
    n_edge: int = dataclasses.field(metadata=dict(static=True))
    n_local_edges: int = dataclasses.field(default=0,
                                           metadata=dict(static=True))

    @property
    def n_shards(self) -> int:
        return self.d_host * self.d_chip

    @property
    def n_pad(self) -> int:
        return self.n_local * self.n_shards

    def comm_report(self, feat_width: int, dtype_bytes: int = 2) -> dict:
        """Exchange volume per layer, split by fabric: ICI (intra-host
        all_to_all + the chip-axis redistribution) vs DCN (host-axis
        all_to_all + the hubs' cross-host legs)."""
        Dh, Dc, D = self.d_host, self.d_chip, self.n_shards
        f = feat_width * dtype_bytes
        ici = (D * Dc * self.halo_in * f                     # intra halo
               + D * Dh * self.halo_out * (Dc - 1) * f       # redistribution
               + D * self.hub_cap * (Dc - 1) * f)            # hub intra legs
        dcn = (D * (Dh - 1) * self.halo_out * f              # host all_to_all
               + D * self.hub_cap * (D - Dc) * f)            # hub cross legs
        return dict(
            ici_bytes=int(ici), dcn_bytes=int(dcn),
            halo_in=self.halo_in, halo_out=self.halo_out,
            hub_cap=self.hub_cap,
            local_edges_frac=(self.n_local_edges / self.n_edge
                              if self.n_edge else 0.0),
        )


def partition_graph_2d(
    g,
    d_host: int,
    d_chip: int,
    *,
    edge_pad_multiple: int = 128,
    halo_pad_multiple: int = 8,
    hub_frac: float = 1 / 256,
) -> PartitionedGraph2D:
    """Host-side hierarchical partition into ``d_host * d_chip`` shards
    (host-major shard ids: shard = host * d_chip + chip)."""
    g = _as_host(g)
    senders = g.senders[: g.n_edge]
    receivers = g.receivers[: g.n_edge]
    weight = g.edge_weight[: g.n_edge]
    Dh, Dc = d_host, d_chip
    D = Dh * Dc
    n_local = _round_up(g.n_node, D * 8) // D

    owner_s = (senders // n_local).astype(np.int64)
    owner_r = (receivers // n_local).astype(np.int64)
    host_s, chip_s = owner_s // Dc, owner_s % Dc
    host_r, chip_r = owner_r // Dc, owner_r % Dc
    local = owner_s == owner_r
    remote = ~local

    # --- hubs: shard-spread selection (as 1-D) -----------------------------
    if hub_frac > 0 and remote.any():
        pair = np.unique(senders[remote].astype(np.int64) * D
                         + owner_r[remote])
        spread = np.bincount((pair // D).astype(np.int64),
                             minlength=g.n_node)
        n_hub = max(int(g.n_node * hub_frac), 1)
        cand = np.argsort(-spread, kind="stable")[:n_hub]
        hubs = cand[spread[cand] >= 2]
    else:
        hubs = np.zeros(0, np.int64)
    is_hub = np.zeros(g.n_node, bool)
    is_hub[hubs] = True

    hub_owner = (hubs // n_local).astype(np.int64)
    Kh = int(np.bincount(hub_owner, minlength=D).max()) if len(hubs) else 0
    Kh = _round_up(max(Kh, 1), halo_pad_multiple) if len(hubs) else 0
    hub_idx = np.zeros((D, max(Kh, 1)), np.int32)
    hub_mask = np.zeros((D, max(Kh, 1)), bool)
    hub_row = np.full(g.n_node, -1, np.int64)
    if len(hubs):
        horder = np.argsort(hub_owner, kind="stable")
        hsort, hown = hubs[horder], hub_owner[horder]
        starts = np.searchsorted(hown, np.arange(D))
        slot = np.arange(len(hsort)) - starts[hown]
        hub_idx[hown, slot] = (hsort - hown * n_local).astype(np.int32)
        hub_mask[hown, slot] = True
        hub_row[hsort] = hown * Kh + slot

    halo_e = remote & ~is_hub[senders]
    same_host = host_s == host_r

    # --- intra-host halo: unique senders per same-host (p -> q) ------------
    sel_in = halo_e & same_host
    key_in = np.unique((owner_s[sel_in] * D + owner_r[sel_in])
                       * (n_local * np.int64(D)) + senders[sel_in])
    in_pair = key_in // (n_local * D)
    in_node = (key_in % (n_local * D)).astype(np.int64)
    if len(key_in):
        st = np.flatnonzero(np.concatenate([[True],
                                            in_pair[1:] != in_pair[:-1]]))
        ln = np.diff(np.concatenate([st, [len(key_in)]]))
        grp = np.searchsorted(st, np.arange(len(key_in)), side="right") - 1
        in_slot = np.arange(len(key_in)) - st[grp]
        Hin = int(ln.max())
    else:
        in_slot = np.zeros(0, np.int64)
        Hin = 1
    Hin = _round_up(Hin, halo_pad_multiple)
    send_in_idx = np.zeros((D, Dc, Hin), np.int32)
    send_in_mask = np.zeros((D, Dc, Hin), bool)
    in_p = (in_pair // D).astype(np.int64)
    in_q = (in_pair % D).astype(np.int64)
    send_in_idx[in_p, in_q % Dc, in_slot] = (
        in_node - in_p * n_local).astype(np.int32)
    send_in_mask[in_p, in_q % Dc, in_slot] = True

    # --- inter-host halo: unique senders per (shard -> dest HOST) ----------
    sel_out = halo_e & ~same_host
    key_out = np.unique((owner_s[sel_out] * Dh + host_r[sel_out])
                        * (n_local * np.int64(D)) + senders[sel_out])
    out_pair = key_out // (n_local * D)
    out_node = (key_out % (n_local * D)).astype(np.int64)
    if len(key_out):
        st = np.flatnonzero(np.concatenate([[True],
                                            out_pair[1:] != out_pair[:-1]]))
        ln = np.diff(np.concatenate([st, [len(key_out)]]))
        grp = np.searchsorted(st, np.arange(len(key_out)),
                              side="right") - 1
        out_slot = np.arange(len(key_out)) - st[grp]
        Hout = int(ln.max())
    else:
        out_slot = np.zeros(0, np.int64)
        Hout = 1
    Hout = _round_up(Hout, halo_pad_multiple)
    send_out_idx = np.zeros((D, Dh, Hout), np.int32)
    send_out_mask = np.zeros((D, Dh, Hout), bool)
    out_p = (out_pair // Dh).astype(np.int64)
    out_j = (out_pair % Dh).astype(np.int64)
    send_out_idx[out_p, out_j, out_slot] = (
        out_node - out_p * n_local).astype(np.int32)
    send_out_mask[out_p, out_j, out_slot] = True

    # --- combined-table rows per (receiver shard, sender node) -------------
    # layout: [intra Dc*Hin ‖ inter Dc*Dh*Hout ‖ hubs D*Kh ‖ dump]
    inter_base = Dc * Hin
    hub_base = inter_base + Dc * Dh * Hout
    dump_row = hub_base + D * max(Kh, 1)
    table_row = np.full((D, g.n_node), dump_row, np.int64)
    # intra rows at receiver q: sender chip cp -> cp*Hin + slot
    table_row[in_q, in_node] = (in_p % Dc) * Hin + in_slot
    # inter rows at EVERY chip of dest host j: sender (i, cp) slot k ->
    # inter_base + cp*(Dh*Hout) + i*Hout + k   (all_gather chip-major)
    if len(key_out):
        row = (inter_base + (out_p % Dc) * (Dh * Hout)
               + (out_p // Dc) * Hout + out_slot)
        for cq in range(Dc):
            q = out_j * Dc + cq
            table_row[q, out_node] = row
    if len(hubs):
        table_row[:, hubs] = hub_base + hub_row[hubs][None, :]

    # --- per-shard split edge arrays ---------------------------------------
    src_local_rows = (senders - owner_s * n_local).astype(np.int64)

    def build(sel, rows_full, E, pad_src):
        so, ro, wo, oo = (senders[sel], receivers[sel], weight[sel],
                          owner_r[sel])
        eorder = np.argsort(oo, kind="stable")
        so, ro, wo, oo = so[eorder], ro[eorder], wo[eorder], oo[eorder]
        rows = rows_full[eorder]
        shard_start = np.searchsorted(oo, np.arange(D))
        slot = np.arange(len(oo)) - shard_start[oo]
        e_src = np.full((D, E), pad_src, np.int32)
        e_dst = np.full((D, E), n_local, np.int32)
        e_w = np.zeros((D, E), np.float32)
        e_mask = np.zeros((D, E), bool)
        e_src[oo, slot] = rows.astype(np.int32)
        e_dst[oo, slot] = (ro - oo * n_local).astype(np.int32)
        e_w[oo, slot] = wo
        e_mask[oo, slot] = True
        return e_src, e_dst, e_w, e_mask

    counts_l = np.bincount(owner_r[local], minlength=D)
    counts_r = np.bincount(owner_r[remote], minlength=D)
    EL = max(_round_up(int(counts_l.max()) if local.any() else 1,
                       edge_pad_multiple), edge_pad_multiple)
    ER = max(_round_up(int(counts_r.max()) if remote.any() else 1,
                       edge_pad_multiple), edge_pad_multiple)
    el = build(local, src_local_rows[local], EL, n_local)
    er = build(remote, table_row[owner_r[remote], senders[remote]], ER,
               dump_row)

    return PartitionedGraph2D(
        send_in_idx=jnp.asarray(send_in_idx),
        send_in_mask=jnp.asarray(send_in_mask),
        send_out_idx=jnp.asarray(send_out_idx),
        send_out_mask=jnp.asarray(send_out_mask),
        hub_idx=jnp.asarray(hub_idx),
        hub_mask=jnp.asarray(hub_mask),
        el_src=jnp.asarray(el[0]), el_dst=jnp.asarray(el[1]),
        el_w=jnp.asarray(el[2]), el_mask=jnp.asarray(el[3]),
        er_src=jnp.asarray(er[0]), er_dst=jnp.asarray(er[1]),
        er_w=jnp.asarray(er[2]), er_mask=jnp.asarray(er[3]),
        n_local=n_local,
        d_host=Dh,
        d_chip=Dc,
        halo_in=Hin,
        halo_out=Hout,
        hub_cap=max(Kh, 1),
        n_node=g.n_node,
        n_edge=g.n_edge,
        n_local_edges=int(local.sum()),
    )


def remote_table_2d(x_local: jax.Array, sh: PartitionedGraph2D,
                    host_axis: str = HOST_AXIS,
                    chip_axis: str = CHIP_AXIS,
                    quantize: bool = False) -> jax.Array:
    """The hierarchical exchange: intra-host all_to_all (ICI), host-axis
    all_to_all + chip-axis all_gather (DCN once per row), hub all_gather.
    ``quantize``: int8 payloads + per-row scales on every hop (the DCN
    host exchange is where the byte cut matters most)."""
    from .qcomm import q8_all_gather, q8_all_to_all
    F = x_local.shape[-1]

    def sq(a):
        return a.reshape(a.shape[2:]) if a.ndim > 2 and a.shape[0] == 1 \
            else a[0]

    si = sh.send_in_idx[0]                              # [Dc, Hin]
    sm = sh.send_in_mask[0]
    send_in = jnp.take(x_local, si, axis=0)
    send_in = jnp.where(sm[..., None], send_in, 0.0).astype(x_local.dtype)
    halo_in = (q8_all_to_all(send_in, chip_axis) if quantize
               else jax.lax.all_to_all(send_in, chip_axis, split_axis=0,
                                       concat_axis=0)).reshape(-1, F)

    so = sh.send_out_idx[0]                             # [Dh, Hout]
    som = sh.send_out_mask[0]
    send_out = jnp.take(x_local, so, axis=0)
    send_out = jnp.where(som[..., None], send_out,
                         0.0).astype(x_local.dtype)
    if quantize:
        recv_out = q8_all_to_all(send_out, host_axis)   # [Dh, Hout, F]
        inter = q8_all_gather(recv_out, chip_axis)      # [Dc, Dh, Hout, F]
    else:
        recv_out = jax.lax.all_to_all(send_out, host_axis, split_axis=0,
                                      concat_axis=0)    # [Dh, Hout, F]
        inter = jax.lax.all_gather(recv_out, chip_axis)
    inter = inter.reshape(-1, F)

    hub_src = jnp.take(x_local, sh.hub_idx[0], axis=0)
    hub_src = jnp.where(sh.hub_mask[0][:, None], hub_src, 0.0)
    hub_src = hub_src.astype(x_local.dtype)
    hubs = (q8_all_gather(hub_src, (host_axis, chip_axis)) if quantize
            else jax.lax.all_gather(hub_src, (host_axis, chip_axis)))
    hubs = hubs.reshape(-1, F)

    dump = jnp.zeros((1, F), x_local.dtype)
    return jnp.concatenate([halo_in, inter, hubs, dump], axis=0)
