import sys; sys.path.insert(0, "/root/repo")
"""Model-zoo benchmark: measured forward latency for ALL seven GNN
families (SURVEY §2 C2: GCN, GAT, SGC, GraphSAGE, GIN, DGN, PNA) on the
Cora config (2-layer, 1433 -> 128 -> 7, GAT heads=4), one TPU chip.

Two execution paths per family:
  * xla        — per-op XLA lowering (compiler/lower.py), the oracle path
  * compiled   — the min-HBM-traffic legal schedule from the fusion
                 compiler (compiler/schedule.py enumeration + analytic
                 traffic model, NO measurement in the loop — the
                 reference's compile-only output, vTCAD/code/compiler.py
                 sorts candidates by rw the same way), lowered through
                 the Pallas/hybrid kernel paths per layer

Timing: utils/benchmark.time_layer_device with target_s self-calibration
(quotable absolutes; see docs/ARCHITECTURE.md "Measurement discipline").
A discarded warmup family absorbs the first-measurement-high artefact.

Usage: python scripts/zoo_bench.py [net ...]   (default: all seven)
"""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
    schedule as S)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.zoo import (
    NETWORKS, build_model)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.tune.search import (
    _candidate_schedules)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

ALL = ["GCN", "GAT", "SGC", "GraphSAGE", "GIN", "DGN", "PNA"]
nets = [a for a in sys.argv[1:] if not a.startswith("--")] or ALL
assert all(n in NETWORKS for n in nets), nets

ds = gta.load_dataset("cora")
hg = ds.host_graph
stats = S.GraphStats(n_node=hg.n_node, n_edge=hg.n_edge, e_pad=hg.e_pad)
x = jax.device_put(jnp.asarray(ds.x))
g_dev = ds.graph
dtype = jnp.bfloat16

from gta_graph_tensor_acclelrator_for_general_gnn_tpu.hwconfig import (
    load_hw_config)
palette = load_hw_config().palette()


def min_traffic_schedule(graph, feat_width, kernel_only):
    """The compiler's pick: min modelled HBM traffic over legal,
    VMEM-feasible candidates (≙ vTCAD/code/compiler.py:452 sort-by-rw).
    ``kernel_only`` restricts to schedules that dispatch at least one
    pattern block to a Pallas kernel (the min-traffic pick otherwise
    degenerates to the max-fused all-XLA schedule, already measured)."""
    best, best_t = None, float("inf")
    for c in _candidate_schedules(graph, 64, palette):
        if any(tc.path == S.PATH_ONEHOT and not S.tile_is_feasible(tc, feat_width)
               for tc in c.tiles):
            continue
        if kernel_only and all(tc.path == S.PATH_XLA for tc in c.tiles):
            continue
        t = S.traffic_bytes(graph, c.blocks, stats)
        if t < best_t:
            best, best_t = c, t
    return best, best_t


def measure(net, warmup=False):
    model = build_model(net, ds.x.shape[1], ds.n_class,
                        hidden=128, n_layers=2, heads=4)
    params = jax.device_put(model.init(jax.random.key(0)))

    row = {"net": net}
    t0 = time.time()
    fwd = model.make_apply(dtype)
    lat = time_layer_device(fwd, params, g_dev, x, target_s=0.4, reps=2)
    row["xla_us"] = lat * 1e6
    row["xla_wall_s"] = time.time() - t0

    scheds, traffic = [], 0
    w = ds.x.shape[1]
    for graph in model.layers:
        sc, tr = min_traffic_schedule(graph, w, kernel_only=True)
        if sc is None:  # no kernel pattern matches this family's blocks
            sc, tr = min_traffic_schedule(graph, w, kernel_only=False)
        scheds.append(sc)
        traffic += tr
        w = max(op.out_width for op in graph.ops if op.op_id in graph.outputs)
    t0 = time.time()
    try:
        fwd2 = model.make_apply(dtype, schedules=scheds, host_graph=hg)
        lat2 = time_layer_device(fwd2, params, g_dev, x, target_s=0.4, reps=2)
    except Exception as ex:  # Mosaic rejection: report, keep the sweep going
        row["compiled_error"] = f"{type(ex).__name__}: {ex}"[:200]
        lat2 = float("nan")
    row["compiled_us"] = lat2 * 1e6
    row["compiled_traffic_mb"] = traffic / 2**20
    row["compiled_wall_s"] = time.time() - t0
    row["schedule"] = [s.key() for s in scheds]
    if not warmup:
        print(json.dumps(row), flush=True)
    return row


# discarded warmup (first slope in a process reads ~10-15% high)
measure(nets[0], warmup=True)
rows = [measure(n) for n in nets]
print("\n| net | per-op XLA | compiled (min-traffic) | modelled HBM |")
print("|---|---|---|---|")
for r in rows:
    print(f"| {r['net']} | {r['xla_us']:.1f} us | {r['compiled_us']:.1f} us "
          f"| {r['compiled_traffic_mb']:.1f} MB |")
