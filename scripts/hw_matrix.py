import sys; sys.path.insert(0, "/root/repo")
"""Hardware-config matrix A/B: one command sweeping every configs/*.json
through the compile-only pick + latency model, optionally measuring the
picked schedule on the chip.

The TPU analog of the reference's 4-architecture comparison replay
(vTCAD/code/simulator.py:489-510: every fused block re-simulated under
GTA/HyGCN/GCNAX/OPU unit allocations, fastest kept): here each hardware
config carries its own VMEM budget, region caps, palette, and bandwidth;
the pick shows how the best schedule SHIFTS with the hardware — e.g.
under the reference's own 2 MB/128 GB/s envelope (configs/
reference_gta.json) large one-hot tiles become infeasible and the model
re-picks smaller tiles or per-op paths.

Usage: python scripts/hw_matrix.py [--measure] [--dataset cora]
                                   [--nets GCN,GAT,...]
Writes results/hw_matrix.json and prints a table.
"""
import argparse
import glob
import json
import os

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import (
    latency as L)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.hwconfig import (
    HwConfig, load_hw_config)

ap = argparse.ArgumentParser()
ap.add_argument("--measure", action="store_true",
                help="also time each config's pick on the chip")
ap.add_argument("--dataset", default="cora")
ap.add_argument("--nets", default="GCN,GAT,GIN,PNA")
ap.add_argument("--hidden", type=int, default=128)
ap.add_argument("--out_width", type=int, default=64)
args = ap.parse_args()

ds = gta.load_dataset(args.dataset)
configs = {"default(v5e)": None}
for path in sorted(glob.glob("configs/*.json")):
    configs[os.path.basename(path)] = path

rows = []
for net in args.nets.split(","):
    kw = dict(heads=4) if net in ("GAT",) else {}
    og = gta.build_op_graph(net, args.hidden, args.out_width, **kw)
    for cname, cpath in configs.items():
        if cpath is not None:
            os.environ["GTA_HW_CONFIG"] = cpath
            hw = load_hw_config(cpath)
        else:
            os.environ.pop("GTA_HW_CONFIG", None)
            hw = HwConfig()
        consts = L.LatencyConstants(hbm_gbps=hw.hbm_gbps)
        sched, ns = L.min_latency_schedule(
            og, ds.host_graph, tile_palette=hw.palette(), constants=consts)
        row = dict(net=net, config=cname, modelled_us=round(ns / 1e3, 1),
                   schedule=sched.key())
        if args.measure:
            import jax
            import jax.numpy as jnp
            from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler \
                .fusion import lower_schedule
            from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler \
                .lower import init_params
            from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils \
                .benchmark import time_layer_device
            params = jax.device_put(init_params(og, jax.random.key(0)))
            x = jax.device_put(jax.random.normal(
                jax.random.key(1), (ds.host_graph.n_node, args.hidden),
                jnp.float32))
            fn = lower_schedule(og, sched, ds.host_graph, jnp.bfloat16)
            t = time_layer_device(
                lambda p, g, v: fn.inner(p, g, v, fn.captures),
                params, ds.graph, x)
            row["measured_us"] = round(t * 1e6, 1)
        rows.append(row)
        print(f"{net:5s} {cname:22s} modelled {row['modelled_us']:9.1f} us"
              + (f"  measured {row.get('measured_us', 0):9.1f} us"
                 if args.measure else "")
              + f"  {sched.key()[:70]}", flush=True)

os.environ.pop("GTA_HW_CONFIG", None)
os.makedirs("results", exist_ok=True)
json.dump(dict(dataset=args.dataset, rows=rows),
          open("results/hw_matrix.json", "w"), indent=1)
print("wrote results/hw_matrix.json")
