"""CI floor for the compile-only latency model (VERDICT r3 next-8).

Ranks every memoised current-version measured schedule (results/memo_*.csv — the
calibrated hardware measurements, reference C15 regression log) against the
closed-form model and enforces:

* Spearman rank correlation >= 0.9 (constants drift fails here first), and
* argmin regret <= 1.20 (tightened from 1.25 in r5; current values
  1.00 / 1.17): the schedule the model WOULD pick measures within 20% of
  the measured-best schedule (run-to-run variance on identical configs
  is ~13%, so exact-argmin is not a stable assertion — pick quality is
  what decides whether compile-only picking regresses).

Runs entirely on CPU; measured data is the committed memo CSVs.
"""
import pytest

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
    latency as L)

CASES = [
    ("results/memo_gcn_cora.csv", "GCN-original-gcn2",
     dict(network="GCN", in_width=128, out_width=64, layer_tag="gcn2"),
     13),
    ("results/memo_gat_cora_l3.csv", "GAT-original-l3bench",
     dict(network="GAT", in_width=64, out_width=16, heads=16,
          layer_tag="l3bench"),
     20),
    # NOT asserted: the heavier GAT-Cora128 shape (HD+H=132, wide-kernel
    # regime) ranks at spearman 0.46 / regret 1.36 against its v9 memo —
    # a known model gap at wide attention shapes (the gat_pass_factor is
    # fitted on the narrow transposed chain).  Recorded here so the gap
    # is visible; fixing it needs a wide-shape refit of the pass factor.
]


@pytest.fixture(scope="module")
def cora():
    return gta.load_dataset("cora")


@pytest.mark.parametrize("memo,gname,spec,min_rows",
                         CASES, ids=[c[1] for c in CASES])
def test_latency_model_rank_fidelity(cora, memo, gname, spec, min_rows):
    import os
    path = os.path.join(os.path.dirname(__file__), "..", memo)
    graph = gta.build_op_graph(
        spec["network"], spec["in_width"], spec["out_width"],
        heads=spec.get("heads", 1), layer_tag=spec["layer_tag"])
    r = L.rank_check(path, gname, graph, cora.host_graph)
    assert r is not None, (
        f"memo {memo} has no current-version entries for {gname} — "
        "re-run the tune scripts after a KERNEL_VERSION bump")
    assert len(r["rows"]) >= min_rows, (
        f"memo shrank: {len(r['rows'])} < {min_rows}")
    assert r["spearman"] >= 0.9, (
        f"{gname}: rank correlation {r['spearman']:.3f} < 0.9 — "
        "latency constants drifted; refit via scripts/latency_fit.py")
    assert r["argmin_regret"] <= 1.20, (
        f"{gname}: modelled pick measures {r['argmin_regret']:.2f}x the "
        "measured best")


def test_spearman_helper():
    assert L.spearman_rank([1, 2, 3], [10, 20, 30]) == pytest.approx(1.0)
    assert L.spearman_rank([1, 2, 3], [30, 20, 10]) == pytest.approx(-1.0)
