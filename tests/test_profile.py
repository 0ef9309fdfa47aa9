"""Observability: cost reports and profiler traces."""
import os

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import schedule as S
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils import profile as prof


def test_op_report_accounting():
    og = gta.build_op_graph("GCN", 64, 32)
    stats = S.GraphStats(n_node=1000, n_edge=5000, e_pad=5120)
    blocks = S.max_fusion_partition(og)
    costs = prof.op_report(og, blocks, stats)
    assert len(costs) == len(og.ops)
    mm = [c for c in costs if c.compute == "MM"][0]
    assert mm.flops == 2 * 1000 * 64 * 32
    # intra-block intermediates are marked fused (no HBM)
    assert any(c.fused for c in costs)


def test_schedule_report_renders():
    og = gta.build_op_graph("GAT", 16, 8, heads=2)
    stats = S.GraphStats(n_node=100, n_edge=500, e_pad=512)
    sched = S.default_schedule(og)
    text = prof.schedule_report(og, sched, stats, measured_s=1e-4)
    assert "GFLOP" in text and "TFLOP/s" in text


def test_trace_writes_files(tmp_path):
    import jax
    import jax.numpy as jnp
    out = str(tmp_path / "trace")
    with prof.trace(out):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    found = []
    for root, _, files in os.walk(out):
        found.extend(files)
    assert found, "no trace files written"


def test_trace_events_aggregation(tmp_path):
    """trace() + trace_events: a real profiler capture yields per-op
    measured durations."""
    import jax
    import jax.numpy as jnp
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.profile import (
        trace, trace_events, measured_report)

    d = str(tmp_path / "tr")
    with trace(d):
        x = jnp.ones((256, 256))
        for _ in range(3):
            x = jax.jit(lambda a: a @ a)(x)
        jax.block_until_ready(x)
    evs = trace_events(d)
    assert evs, "no trace events parsed"
    rep = measured_report(d)
    assert "total_us" in rep
