import sys; sys.path.insert(0, "/root/repo")
"""Build the halo partition at FULL Reddit dims (232,965 nodes /
114.6M edges — genGraphOP.py:196-199) and record its comm_report:
halo width, hub cap, local-edge fraction, MiB/layer on ICI and DCN
(VERDICT r2 next-4c).  Host-side only — no TPU needed.

Usage: python scripts/reddit_partition.py [n_edges]
"""
import json
import os
import time

import numpy as np

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu import parallel
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import HostGraph

N = 232965
E = int(sys.argv[1]) if len(sys.argv) > 1 else 114_615_892
F = 128

cache = f"/tmp/reddit_cache_{E}_c.npz"
t0 = time.time()
if os.path.exists(cache):
    z = np.load(cache)
    hg = HostGraph(senders=z["s"], receivers=z["r"], edge_mask=z["m"],
                   edge_weight=z["w"], n_node=N, n_edge=int(z["ne"]))
    print(f"cache load {time.time()-t0:.0f}s E={hg.n_edge}", flush=True)
else:
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.data.datasets \
        import synthetic_coo
    s, r, labels = synthetic_coo(N, E, seed=1, communities=1000, p_in=0.7)
    hg = gta.build_host_graph(s, r, N, add_self_loops=True,
                              symmetric_norm=True)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
        reorder_nodes)
    hg, _ = reorder_nodes(hg, "hubs+labels", labels=labels)
    print(f"build+reorder {time.time()-t0:.0f}s", flush=True)

out = {"n_node": hg.n_node, "n_edge": hg.n_edge, "feat_width": F}

for D in (8,):
    t0 = time.time()
    part = parallel.partition_graph(hg, D)
    rep = part.comm_report(F)
    rep["build_s"] = round(time.time() - t0, 1)
    rep["n_shards"] = D
    rep["halo_mib_per_layer"] = round(rep["halo_bytes"] / 2**20, 2)
    rep["hub_mib_per_layer"] = round(rep["hub_bytes"] / 2**20, 2)
    out[f"plan_1d_{D}"] = rep
    print(f"1-D D={D}: halo_width={rep['halo_width']} "
          f"hub_cap={rep['hub_cap']} local={rep['local_edges_frac']:.3f} "
          f"halo {rep['halo_mib_per_layer']} MiB + hubs "
          f"{rep['hub_mib_per_layer']} MiB /layer ({rep['build_s']}s)",
          flush=True)
    del part

for dh, dc in ((2, 4),):
    t0 = time.time()
    part2 = parallel.partition_graph_2d(hg, dh, dc)
    rep2 = part2.comm_report(F)
    rep2["build_s"] = round(time.time() - t0, 1)
    rep2["mesh"] = [dh, dc]
    rep2["ici_mib_per_layer"] = round(rep2["ici_bytes"] / 2**20, 2)
    rep2["dcn_mib_per_layer"] = round(rep2["dcn_bytes"] / 2**20, 2)
    out[f"plan_2d_{dh}x{dc}"] = rep2
    print(f"2-D ({dh}x{dc}): halo_in={rep2['halo_in']} "
          f"halo_out={rep2['halo_out']} hub_cap={rep2['hub_cap']} "
          f"local={rep2['local_edges_frac']:.3f} "
          f"ICI {rep2['ici_mib_per_layer']} MiB + DCN "
          f"{rep2['dcn_mib_per_layer']} MiB /layer ({rep2['build_s']}s)",
          flush=True)
    del part2

os.makedirs("results", exist_ok=True)
with open("results/reddit_partition.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: v for k, v in out.items() if k.startswith("plan")},
                 indent=1))
