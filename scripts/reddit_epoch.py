import sys; sys.path.insert(0, "/root/repo")
"""Reddit sampled-training epoch benchmark (the BASELINE.json north-star
"Reddit epoch time" — the reference never executes, so there is no
reference number to beat; this publishes ours).

GraphSAGE with neighbour sampling at the reference's Reddit dims
(genGraphOP.py:196-199): 232,965 nodes / 114.6M edges / 602 features.
Features stay resident on device ([N, 602] f32 = 561 MB); each step ships
only index + edge arrays (~2 MB) through the tunnel, and a prefetch thread
overlaps host-side sampling with device execution
(models/train.train_sampled).

Epoch time here is honest end-to-end wall time: the train steps chain
through donated state, so the single loss readback at the end awaits the
full device queue.

Usage: python scripts/reddit_epoch.py [n_edges] [--batches N] [--batch B]
"""
import time

import numpy as np

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.train import (
    train_sampled_scan)

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
E = int(_pos[0]) if _pos else 114_615_892


def _flag(name, default):
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


BATCH = _flag("--batch", 512)
STEPS = _flag("--batches", None)
EPOCHS = _flag("--epochs", 3)

t0 = time.time()
import gta_graph_tensor_acclelrator_for_general_gnn_tpu.data.datasets as dmod
# build at the requested edge count (full Reddit by default)
stats = dict(dmod.DATASET_STATS)
dmod.DATASET_STATS["reddit"] = (232965, E, 602, 41)
ds = gta.load_dataset("reddit")
dmod.DATASET_STATS.update(stats)
print(f"build {time.time()-t0:.0f}s E={ds.host_graph.n_edge} "
      f"train_nodes={int(ds.train_mask.sum())}", flush=True)

t0 = time.time()
state, res, bd = train_sampled_scan(
    ds, network="GraphSAGE", fanouts=(10, 10), batch_size=BATCH,
    epochs=EPOCHS, hidden=128, compute_dtype=None,
    steps_per_epoch=STEPS, measure_device_epoch=True)
print(f"train total {time.time()-t0:.0f}s  breakdown={bd}", flush=True)
print(f"REDDIT epoch: wall {res.epoch_time_s:.2f} s/epoch "
      f"(device {bd.get('device_epoch_s', float('nan')):.2f} s, "
      f"sample {bd['sample_s']:.2f} s, h2d {bd['h2d_dispatch_s']:.2f} s; "
      f"{bd['steps_per_epoch']} steps)  "
      f"{res.edges_per_s/1e6:.1f} Medge/s sampled  "
      f"final_loss={res.train_loss:.4f}", flush=True)
