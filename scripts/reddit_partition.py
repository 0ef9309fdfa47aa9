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

# --- round-4: COMMUNITY partition (VERDICT r3 missing #2) -----------------
# label-free production path: LPA discovers communities, communities pack
# onto shards edge-balanced (parallel.community_partition_order), the
# relabelled graph partitions by contiguous range as before.
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    cluster_labels, reorder_nodes)

lab_cache = f"/tmp/reddit_lpa_{E}.npy"
t0 = time.time()
if os.path.exists(lab_cache):
    labels = np.load(lab_cache)
    print(f"LPA cache load {time.time()-t0:.0f}s "
          f"k={int(labels.max())+1}", flush=True)
else:
    labels = cluster_labels(hg)
    np.save(lab_cache, labels)
    print(f"LPA clustering {time.time()-t0:.0f}s "
          f"k={int(labels.max())+1}", flush=True)

for D in (8,):
    t0 = time.time()
    perm_c, _ = parallel.community_partition_order(hg, labels, D)
    hg_c, _ = reorder_nodes(hg, "perm", perm=perm_c)
    part = parallel.partition_graph(hg_c, D)
    rep = part.comm_report(F)
    rep["build_s"] = round(time.time() - t0, 1)
    rep["n_shards"] = D
    rep["halo_mib_per_layer"] = round(rep["halo_bytes"] / 2**20, 2)
    rep["hub_mib_per_layer"] = round(rep["hub_bytes"] / 2**20, 2)
    # edge balance (EL/ER are max-padded: the widest shard sets the cost)
    el = np.asarray(part.el_mask).sum(1)
    er = np.asarray(part.er_mask).sum(1)
    rep["edge_balance"] = round(float(el.max() + er.max())
                                / (float(el.mean() + er.mean()) or 1), 3)
    # halo-width saturation note: at full-batch Reddit density each shard
    # pair sees ~18 cross-edge draws per candidate sender, so the per-pair
    # unique-sender halo saturates at ~n_local REGARDLESS of assignment
    # (measured: zipf sender_alpha=1.0 changes nothing).  The community
    # plan's win is the local fraction (remote-gather compute and the ER
    # max-pad halve) and edge balance; full-batch boundary exchange at this
    # density is inherently ~full-replication — an ICI-scale volume, with
    # DCN kept small by the 2-D plan's dedup.
    rep["halo_saturated"] = bool(rep["halo_width"] >= part.n_local - 8)
    out[f"plan_community_{D}"] = rep
    print(f"community D={D}: halo_width={rep['halo_width']} "
          f"hub_cap={rep['hub_cap']} local={rep['local_edges_frac']:.3f} "
          f"halo {rep['halo_mib_per_layer']} MiB + hubs "
          f"{rep['hub_mib_per_layer']} MiB /layer "
          f"balance {rep['edge_balance']} ({rep['build_s']}s)", flush=True)
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

for dh, dc in ((2, 4),):
    t0 = time.time()
    part2 = parallel.partition_graph_2d(hg_c, dh, dc)
    rep2 = part2.comm_report(F)
    rep2["build_s"] = round(time.time() - t0, 1)
    rep2["mesh"] = [dh, dc]
    rep2["ici_mib_per_layer"] = round(rep2["ici_bytes"] / 2**20, 2)
    rep2["dcn_mib_per_layer"] = round(rep2["dcn_bytes"] / 2**20, 2)
    out[f"plan_2d_community_{dh}x{dc}"] = rep2
    print(f"2-D community ({dh}x{dc}): local={rep2['local_edges_frac']:.3f} "
          f"ICI {rep2['ici_mib_per_layer']} MiB + DCN "
          f"{rep2['dcn_mib_per_layer']} MiB /layer ({rep2['build_s']}s)",
          flush=True)
    del part2

# predicted scaling efficiency per plan (parallel/scaling.py): measured
# single-chip rates + the plan's comm bytes at hwconfig bandwidths,
# bounded by the measured overlap fraction (results/overlap_hlo.json)
RATES = {"spmm": 1.206e9, "gat": 1.005e9}     # BENCH_r04 edges/s/chip
ovf = 0.0
ov_path = "results/overlap_hlo.json"
if os.path.exists(ov_path):
    cfgs = json.load(open(ov_path)).get("configs", {})
    if "GCN/overlap" in cfgs:
        ovf = parallel.overlap_fraction(cfgs["GCN/overlap"])
for name, plan in list(out.items()):
    if not name.startswith("plan"):
        continue
    plan["predicted"] = {
        op: {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in parallel.predicted_scaling(
                 plan, edges_per_s_chip=rate, n_edge=out["n_edge"],
                 overlap=ovf).items()}
        for op, rate in RATES.items()}
    # int8-quantized exchange (parallel/qcomm.py): payload bytes halve
    # (per-row f32 scales add 4/F per element ~ 1.6% at F=128, folded in)
    planq = dict(plan)
    for k in ("halo_bytes", "hub_bytes", "ici_bytes", "dcn_bytes"):
        if k in planq:
            planq[k] = planq[k] * (0.5 + 2.0 / F)
    plan["halo_bytes_q8"] = int(planq.get("halo_bytes", 0))
    plan["predicted_q8"] = {
        op: {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in parallel.predicted_scaling(
                 planq, edges_per_s_chip=rate, n_edge=out["n_edge"],
                 overlap=ovf).items()}
        for op, rate in RATES.items()}

os.makedirs("results", exist_ok=True)
with open("results/reddit_partition.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: v for k, v in out.items() if k.startswith("plan")},
                 indent=1))
