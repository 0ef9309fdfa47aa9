import sys; sys.path.insert(0, "/root/repo")
"""Build and cache the synthetic Reddit-scale host graph (hubs+labels
reordered), as used by reddit_train/reddit_bench/gat_scale_repro.

Usage: python scripts/build_reddit_cache.py [n_edges ...]
"""
import os
import time

import numpy as np

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.data.datasets import (
    synthetic_coo)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    reorder_nodes)

N = 232965
sizes = [int(a) for a in sys.argv[1:]] or [114_615_892]
for E in sizes:
    cache = f"/tmp/reddit_cache_{E}_c.npz"
    if os.path.exists(cache):
        print(f"{cache} exists", flush=True)
        continue
    t0 = time.time()
    s_, r_, labels = synthetic_coo(N, E, seed=1, communities=1000, p_in=0.7)
    hg = gta.build_host_graph(s_, r_, N, add_self_loops=True,
                              symmetric_norm=True)
    hg, _ = reorder_nodes(hg, "hubs+labels", labels=labels)
    np.savez(cache, s=hg.senders, r=hg.receivers, m=hg.edge_mask,
             w=hg.edge_weight, ne=hg.n_edge)
    # keep community labels for partition work (post-reorder label of each
    # node is labels[inverse perm]; store raw labels + the original ids)
    np.save(f"/tmp/reddit_labels_{E}.npy", labels)
    print(f"built {cache} in {time.time()-t0:.0f}s E={hg.n_edge}", flush=True)
