import sys; sys.path.insert(0, "/root/repo")
"""Model-zoo benchmark: measured forward latency for ALL seven GNN
families (SURVEY §2 C2: GCN, GAT, SGC, GraphSAGE, GIN, DGN, PNA) on the
Cora config (2-layer, 1433 -> 128 -> 7, GAT heads=4), one TPU chip.

Two execution paths per family:
  * xla        — per-op XLA lowering (compiler/lower.py), the oracle path
  * compiled   — the min-MODELLED-LATENCY legal schedule from the fusion
                 compiler (compiler/latency.py: measured tile-cost model +
                 MXU/HBM rooflines + calibrated XLA row costs, NO
                 measurement in the loop — the reference's
                 compiler+simulator pick, vTCAD/code/simulator.py:423-650),
                 lowered through the Pallas/hybrid kernel paths per layer.
                 The all-XLA schedule is always a ranked candidate, so the
                 pick never models itself into a regression (r2's
                 traffic-min pick lost on PNA).

Timing: utils/benchmark.time_layer_device with target_s self-calibration
(quotable absolutes; see docs/ARCHITECTURE.md "Measurement discipline").
A discarded warmup family absorbs the first-measurement-high artefact.

Round-5: measurements repeat --reps times (default 3) and report the
MEDIAN — single runs carry ~13% noise, which drowned the r4 residual fit
(VERDICT r4 weak-5); the final table adds the modelled-vs-measured
residual per family.

Usage: python scripts/zoo_bench.py [net ...] [--reps N]  (default: all 7)
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
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
    latency as latency_mod)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

ALL = ["GCN", "GAT", "SGC", "GraphSAGE", "GIN", "DGN", "PNA"]
nets = [a for a in sys.argv[1:] if not a.startswith("--")] or ALL
REPS = 3
for i, a in enumerate(sys.argv):
    if a == "--reps":
        REPS = int(sys.argv[i + 1])
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


def compiled_pick(graph, feat_width):
    """The compiler's pick: argmin MODELLED LATENCY over legal,
    VMEM-feasible candidates including all-XLA (compiler/latency.py —
    the reference's compiler+simulator role).  Returns (schedule,
    modelled_ns, traffic_bytes)."""
    sc, t_ns = latency_mod.min_latency_schedule(
        graph, hg, feat_width=feat_width, tile_palette=palette)
    tr = S.traffic_bytes(graph, sc.blocks, stats) if sc is not None else 0
    return sc, t_ns, tr


def measure(net, warmup=False):
    model = build_model(net, ds.x.shape[1], ds.n_class,
                        hidden=128, n_layers=2, heads=4)
    params = jax.device_put(model.init(jax.random.key(0)))

    import statistics
    row = {"net": net}
    t0 = time.time()
    fwd = model.make_apply(dtype)
    lat = statistics.median(
        time_layer_device(fwd, params, g_dev, x, target_s=0.4, reps=2)
        for _ in range(1 if warmup else REPS))
    row["xla_us"] = lat * 1e6
    row["xla_wall_s"] = time.time() - t0

    scheds, traffic, modelled_ns = [], 0, 0.0
    w = ds.x.shape[1]
    for graph in model.layers:
        sc, t_ns, tr = compiled_pick(graph, w)
        scheds.append(sc)
        if sc is not None:
            traffic += tr
            modelled_ns += t_ns
        w = max(op.out_width for op in graph.ops if op.op_id in graph.outputs)
    row["modelled_us"] = modelled_ns / 1e3
    if any(sc is None for sc in scheds):
        # no feasible candidate at all for some layer: record and skip the
        # compiled measurement instead of crashing the remaining families
        row["compiled_error"] = "no feasible schedule"
        row["compiled_us"] = float("nan")
        row["compiled_traffic_mb"] = traffic / 2**20
        row["schedule"] = [s.key() if s else None for s in scheds]
        if not warmup:
            print(json.dumps(row), flush=True)
        return row
    t0 = time.time()
    try:
        fwd2 = model.make_apply(dtype, schedules=scheds, host_graph=hg)
        lat2 = statistics.median(
            time_layer_device(fwd2, params, g_dev, x, target_s=0.4, reps=2)
            for _ in range(1 if warmup else REPS))
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
print(f"\n(median of {REPS} repeated measurements per cell)")
print("| net | per-op XLA | compiled (min-latency) | modelled | residual | modelled HBM |")
print("|---|---|---|---|---|---|")
for r in rows:
    resid = (r.get("modelled_us", float("nan")) / r["compiled_us"] - 1) * 100
    r["residual_pct"] = resid
    print(f"| {r['net']} | {r['xla_us']:.1f} us | {r['compiled_us']:.1f} us "
          f"| {r.get('modelled_us', float('nan')):.1f} us "
          f"| {resid:+.1f}% "
          f"| {r['compiled_traffic_mb']:.1f} MB |")
import os
os.makedirs("results", exist_ok=True)
json.dump(rows, open("results/zoo_r5.json", "w"), indent=1)
print("wrote results/zoo_r5.json")
