"""Predicted multi-chip/multi-host scaling efficiency.

This environment has ONE physical TPU chip, so the BASELINE ">= 80%
edges/s scaling efficiency" target cannot be *measured* here — but every
constant it depends on IS measured: single-chip edge rates
(results/SUMMARY.md), per-plan ICI/DCN byte counts (the partition plans'
``comm_report``, results/reddit_partition.json), interconnect bandwidths
(hwconfig ici_gbps/dcn_gbps), and the comm/compute overlap the AOT
schedule actually achieves (results/overlap_hlo.json).  This module
closes the loop the reference's simulator closed for its fictional chip
(vTCAD/code/start.py:57-58 always printed the headline predictive
number): a roofline-style prediction of per-layer step time and scaling
efficiency per partition plan.

Model (per GNN layer, D shards):

  t_comp = (n_edge * balance / D) / edges_per_s_chip
  t_ici  = per-chip ICI egress bytes / ici_gbps
  t_dcn  = per-host DCN egress bytes / dcn_gbps
  t_comm = max(t_ici, t_dcn)                 (separate networks)
  t_step(ov) = ov * max(t_comp, t_comm) + (1 - ov) * (t_comp + t_comm)

  efficiency(ov) = (n_edge / edges_per_s_chip) / (D * t_step(ov))

``ov`` in [0, 1] is the overlapped fraction of the collective windows; the
measured value comes from :func:`overlap_fraction` over the scheduled-HLO
report (zero when the async options are off — measured, results/
overlap_hlo.json baseline rows).  Both bounds (ov=0, ov=1) are reported so
the prediction carries its own uncertainty interval.
"""
from __future__ import annotations

from typing import Optional

from ..hwconfig import HwConfig, load_hw_config


def overlap_fraction(report: dict) -> float:
    """Measured overlap fraction from an ``overlap_report`` dict (or the
    saved results/overlap_hlo.json per-config entry): the summed compute
    cycles the scheduler placed inside async collective windows, over the
    summed window span — 0.0 when no async collectives exist."""
    pairs = report.get("pairs", [])
    if not pairs:
        return 0.0
    hidden = sum(p.get("overlapped_est_cycles", 0) for p in pairs)
    span = report.get("overlapped_cycles", 0)
    if span <= 0:
        return 0.0
    return max(0.0, min(1.0, hidden / span))


def predicted_scaling(
    plan: dict,
    *,
    edges_per_s_chip: float,
    n_edge: int,
    overlap: float = 0.7,
    hw: Optional[HwConfig] = None,
) -> dict:
    """Predicted per-layer step time and scaling efficiency for one
    partition plan.

    ``plan``: a dict in the shape the partition builders report
    (scripts/reddit_partition.py / PartitionedGraph.comm_report /
    Mesh2DPlan.comm_report):

      1-D (single host, D chips over ICI):
        n_shards, halo_bytes, hub_bytes (optional), edge_balance (optional)
      2-D (hosts x chips):
        mesh [Dh, Dc], ici_bytes, dcn_bytes, edge_balance (optional)

    ``edges_per_s_chip``: the measured single-chip rate for this op at
    this feature width (e.g. reddit SpMM 1.2e9 — BENCH_r*.json).
    ``overlap``: fraction of comm hidden under compute; pass
    :func:`overlap_fraction` of a measured schedule report for the
    evidence-backed value.  Returns a dict with t_comp/t_ici/t_dcn (s),
    efficiency at ``overlap`` and at both bounds.
    """
    hw = hw or load_hw_config()
    balance = float(plan.get("edge_balance", 1.0))
    if "mesh" in plan:
        dh, dc = (int(v) for v in plan["mesh"])
        d = dh * dc
        ici_bytes = float(plan.get("ici_bytes", 0.0))
        dcn_bytes = float(plan.get("dcn_bytes", 0.0))
        t_ici = (ici_bytes / d) / (hw.ici_gbps * 1e9)
        # DCN is a per-HOST resource: each host's NIC carries its chips'
        # inter-host traffic
        t_dcn = (dcn_bytes / dh) / (hw.dcn_gbps * 1e9)
    else:
        d = int(plan["n_shards"])
        ici_bytes = float(plan.get("halo_bytes", 0.0)) + float(
            plan.get("hub_bytes", 0.0))
        t_ici = (ici_bytes / d) / (hw.ici_gbps * 1e9)
        t_dcn = 0.0
    t_comp = (n_edge * balance / d) / edges_per_s_chip
    t_comm = max(t_ici, t_dcn)

    def step(ov: float) -> float:
        return ov * max(t_comp, t_comm) + (1.0 - ov) * (t_comp + t_comm)

    t1 = n_edge / edges_per_s_chip

    def eff(ov: float) -> float:
        return t1 / (d * step(ov))

    return dict(
        n_chips=d,
        t_comp_s=t_comp,
        t_ici_s=t_ici,
        t_dcn_s=t_dcn,
        overlap=overlap,
        t_step_s=step(overlap),
        efficiency=eff(overlap),
        efficiency_no_overlap=eff(0.0),
        efficiency_full_overlap=eff(1.0),
        comm_bound=t_comm > t_comp,
    )
