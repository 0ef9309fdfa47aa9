import sys, os; sys.path.insert(0, "/root/repo")
"""Measure the BASELINE.json named configs (beyond the GAT-Cora headline):

  GCN-Citeseer, GCN-Pubmed      — forward latency (2-layer stack) + training
  GraphSAGE-Flickr (sampled)    — sampled-epoch time (scan path, native
                                  parallel sampler)

Each config runs in its OWN subprocess: any device->host readback poisons
later dispatch timing in a process (results/SUMMARY.md "Timing discipline"),
and separate processes also keep one config's compile cache misses from
skewing another's wall time.

Usage: python scripts/baseline_configs.py
"""
import json
import subprocess

PY = sys.executable
ENV = dict(os.environ)


def run(cmd, timeout=1800):
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout,
                       env=ENV)
    out = p.stdout.strip().splitlines()
    js = None
    for line in reversed(out):
        try:
            js = json.loads(line)
            break
        except Exception:
            continue
    if js is None:
        print(f"FAILED: {' '.join(cmd)}\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
    return js


M = "gta_graph_tensor_acclelrator_for_general_gnn_tpu.cli"
for ds, net in (("citeseer", "GCN"), ("pubmed", "GCN"), ("flickr", "GCN")):
    # --compiled: the latency-model schedule pick (the production path;
    # without it `run` measures the per-op XLA lowering).  --node-reorder
    # cluster: the label-free locality layout the density-split paths
    # need (the reference's preprocessing assumes clustered order too).
    # --reorder: the aggregate/transform algebraic variant sweep is the
    # reference's isReorder; report the better of the two picks.
    base = [PY, "-m", M, "run", "--dataset", ds, "--network", net,
            "--layers", "2", "--hidden", "128", "--iters", "2092",
            "--node-reorder", "cluster", "--json"]
    js_x = run(base)
    picks = [run(base + ["--compiled"]), run(base + ["--compiled",
                                                     "--reorder"])]
    picks = [p for p in picks if p]
    if js_x and picks:
        best = min(picks, key=lambda p: p["latency_us"])
        print(f"{net}-{ds} forward: compiled {best['latency_us']:.1f} us "
              f"vs per-op XLA {js_x['latency_us']:.1f} us  "
              f"({js_x['latency_us']/best['latency_us']:.2f}x)  "
              f"{best['edges_per_s']/1e9:.3f} Gedge/s", flush=True)
    js = run([PY, "-m", M, "train", "--dataset", ds, "--network", net,
              "--layers", "2", "--hidden", "128", "--epochs", "100",
              "--json"])
    if js:
        print(f"{net}-{ds} train: test_acc={js.get('test_acc')}  "
              f"epoch={js.get('epoch_time_s', 0)*1e3:.2f} ms", flush=True)

# GraphSAGE-Flickr sampled epoch (scan path + native parallel sampler)
code = r"""
import time, json
import numpy as np
import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.train import (
    train_sampled_scan)
ds = gta.load_dataset("flickr")
state, res, bd = train_sampled_scan(
    ds, network="GraphSAGE", fanouts=(10, 10), batch_size=512, epochs=3,
    hidden=128, measure_device_epoch=True)
print(json.dumps(dict(epoch_s=res.epoch_time_s, loss=res.train_loss,
                      **{k: float(v) for k, v in bd.items()})))
"""
js = run([PY, "-c", code], timeout=2400)
if js:
    print(f"GraphSAGE-flickr sampled: wall {js['epoch_s']:.2f} s/epoch "
          f"(device {js.get('device_epoch_s', float('nan')):.2f} s, "
          f"sample {js['sample_s']:.2f} s, "
          f"{int(js['steps_per_epoch'])} steps) loss {js['loss']:.3f}",
          flush=True)
