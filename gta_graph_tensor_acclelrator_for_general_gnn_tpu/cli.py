"""CLI driver — the reference's ``start.py`` (vTCAD/code/start.py:13-63)
re-imagined for real execution.

Reference flags and their TPU equivalents:
  --dataset / --network            same
  --isReorder                      --reorder (algebraically reordered graph)
  --isSinput                       auto (ops/sinput.py sparse-input MM when
                                   feature density < 0.5; train --schedule)
  --isPingpang                     (subsumed: Pallas pipelines double-buffer)
  --isFlexibleBuffer               --hw-config region caps (hwconfig.py)
plus new commands the reference cannot do:
  run       forward latency of the model on the dataset (per layer + total)
  train     full training run, reports accuracy and epoch time
  tune      schedule autotune (enumerative or --ga), prints the best schedule
  bench     edges/s for the SpMM/SDDMM hot kernels

The reference prints simulated latency-seconds and MB moved (start.py:57-58);
``run`` prints *measured* latency and the analytic HBM traffic of the chosen
schedule.
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="gta-tpu",
        description="TPU-native graph tensor accelerator for general GNNs")
    p.add_argument("command", choices=["run", "train", "tune", "bench"])
    p.add_argument("--dataset", default="cora")
    p.add_argument("--network", default="GAT")
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--reorder", action="store_true",
                   help="use the algebraically reordered (trans) op graph")
    p.add_argument("--node-reorder", default="none",
                   choices=["none", "degree", "cluster"],
                   help="relabel nodes to densify adjacency blocks before "
                        "execution (cluster = label-propagation communities "
                        "— the label-free preprocessing real graphs need "
                        "for the hybrid density-split path)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--f32", dest="bf16", action="store_false")
    p.add_argument("--ga", action="store_true", help="genetic tile search")
    p.add_argument("--stack", action="store_true",
                   help="tune each layer of the real model stack and write "
                        "a per-layer schedule JSON (run/train --schedule)")
    p.add_argument("--compiled", action="store_true",
                   help="run/train: use the compile-only min-modelled-"
                        "latency schedule pick (compiler/latency.py) when "
                        "no --schedule file is given; train additionally "
                        "builds the transposed tilings so gradients run "
                        "the kernel backwards")
    p.add_argument("--schedule", default=None,
                   help="path to a tuned schedule JSON (results/best_*.json) "
                        "to execute with (run/train)")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir: train saves final state here")
    p.add_argument("--memo", default=None, help="schedule memo CSV path")
    p.add_argument("--hw-config", default=None,
                   help="hardware config JSON/YAML (VMEM budget, region "
                        "caps, tile palette — the reference's "
                        "hardware_info.yaml); also via $GTA_HW_CONFIG")
    p.add_argument("--derive-palette", action="store_true",
                   help="tune over a palette derived from the VMEM-maximal "
                        "tile for this graph's widest op (the reference's "
                        "buffer-maximal tile-scale sweep)")
    p.add_argument("--batch", type=int, default=1,
                   help="bench: compose this many independent copies of "
                        "the dataset graph block-diagonally (the serving "
                        "shape) and report batched edges/s")
    p.add_argument("--tile-classes", default=None,
                   help="bench: per-run tile capacity classes for the "
                        "sparse kernels — comma list (e.g. 64,128,512) or "
                        "'auto' for the measured-good default; one class "
                        "per heterogeneous run size (graph.MultiTiledGraph)")
    p.add_argument("--sparse-block", type=int, default=None,
                   help="bench: row/col block size for the edge-tile "
                        "kernels (default 256)")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--target-s", type=float, default=0.25,
                   help="self-calibrate each device timing window to ~this "
                        "many seconds (quotable absolutes at every graph "
                        "scale; 0 = fixed --iters span, the short-loop "
                        "regime that mis-measures small graphs up to 4x)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", action="store_true", help="machine-readable output")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed and train full-batch "
                        "over the (hosts x local chips) mesh — run one "
                        "process per host (parallel/multihost.py)")
    p.add_argument("--coordinator", default=None,
                   help="multihost coordinator address host:port "
                        "(auto-detected on Cloud TPU pods)")
    p.add_argument("--nprocs", type=int, default=None,
                   help="multihost process count (auto on TPU pods)")
    p.add_argument("--procid", type=int, default=None,
                   help="this process's id (auto on TPU pods)")
    args = p.parse_args(argv)

    if args.hw_config:
        import os as _os
        _os.environ["GTA_HW_CONFIG"] = args.hw_config

    import jax
    import jax.numpy as jnp

    if args.multihost:
        # before any device use: join (or start) the jax.distributed pod
        from .parallel.multihost import init_multihost
        pid, pcount = init_multihost(args.coordinator, args.nprocs,
                                     args.procid)
        print(f"multihost: process {pid}/{pcount}, "
              f"{jax.local_device_count()} local / "
              f"{jax.device_count()} global devices", flush=True)

    from . import build_op_graph, load_dataset
    from .compiler.lower import init_params, lower
    from .utils.benchmark import time_layer_device

    dtype = jnp.bfloat16 if args.bf16 else None
    ds = load_dataset(args.dataset, seed=args.seed)
    if args.node_reorder != "none":
        import dataclasses as _dc

        from .graph import reorder_nodes
        hg2, perm = reorder_nodes(ds.host_graph, args.node_reorder)
        ds = _dc.replace(ds, host_graph=hg2, x=ds.x[perm], y=ds.y[perm],
                         train_mask=ds.train_mask[perm],
                         val_mask=ds.val_mask[perm],
                         test_mask=ds.test_mask[perm], _device_graph=None)
    out = {"dataset": args.dataset, "network": args.network,
           "synthetic_data": ds.synthetic,
           "node_reorder": args.node_reorder}

    def _parse_sched(spec):
        from .compiler import schedule as S
        return S.Schedule(
            blocks=tuple(tuple(b) for b in spec["blocks"]),
            tiles=tuple(S.TileConfig(*t) for t in spec["tiles"]))

    def load_schedule():
        """One schedule (reused per layer) or a per-layer list when the
        JSON carries a 'layers' key (written by ``tune --stack``)."""
        if not args.schedule:
            return None
        import json as _json
        spec = _json.load(open(args.schedule))
        if "layers" in spec:
            return [_parse_sched(sp) for sp in spec["layers"]]
        return _parse_sched(spec)

    if args.command == "train" and args.multihost:
        from .parallel.multihost import train_multihost
        loss, _state = train_multihost(
            ds, args.network, hidden=args.hidden, n_layers=args.layers,
            heads=args.heads, epochs=args.epochs, lr=args.lr,
            compute_dtype=dtype, seed=args.seed, verbose=not args.json)
        out.update(dict(train_loss=loss, multihost=True,
                        processes=jax.process_count(),
                        devices=jax.device_count()))
    elif args.command == "train":
        from .models.train import train_node_classifier
        sched = load_schedule()
        if sched is not None and not isinstance(sched, list):
            sched = [sched] * args.layers
        model_ = None
        if sched is None and args.compiled:
            # compile-only pick per layer; training flows through the
            # kernels' custom VJPs (hybrid kernel backward etc.).  The
            # transposed tilings for the kernel backward ride on
            # build_transpose below.  The picked-for model (incl. the
            # --reorder trans variant) is passed through so block ids
            # match the trained layers.
            from .compiler.latency import min_latency_schedule
            from .models.zoo import build_model
            model_ = build_model(args.network, ds.x.shape[1], ds.n_class,
                                 hidden=args.hidden, n_layers=args.layers,
                                 heads=args.heads, reorder=args.reorder)
            sched = []
            w = ds.x.shape[1]
            for gph in model_.layers:
                sc, _ = min_latency_schedule(gph, ds.host_graph,
                                             feat_width=w)
                sched.append(sc)
                w = max(op.out_width for op in gph.ops
                        if op.op_id in gph.outputs)
            out["schedule"] = [s.key() for s in sched]
        state, res = train_node_classifier(
            ds, args.network, hidden=args.hidden, n_layers=args.layers,
            heads=args.heads, epochs=args.epochs, lr=args.lr,
            compute_dtype=dtype, seed=args.seed, model=model_,
            schedules=sched, build_transpose=bool(args.compiled))
        if args.ckpt:
            from .utils.checkpoint import save_state
            out["ckpt_step"] = save_state(args.ckpt, state)
        out.update(dict(
            train_loss=res.train_loss, train_acc=res.train_acc,
            val_acc=res.val_acc, test_acc=res.test_acc,
            epoch_time_s=res.epoch_time_s, edges_per_s=res.edges_per_s))

    elif args.command == "run":
        from .models.zoo import build_model
        model = build_model(args.network, ds.x.shape[1], ds.n_class,
                            hidden=args.hidden, n_layers=args.layers,
                            heads=args.heads, reorder=args.reorder)
        params = jax.device_put(model.init(jax.random.key(args.seed)))
        x = jax.device_put(jnp.asarray(ds.x))
        sched = load_schedule()
        if sched is not None and not isinstance(sched, list):
            sched = [sched] * args.layers
        if sched is None and args.compiled:
            # compile-only pick: argmin MODELLED latency incl. the all-XLA
            # candidate (compiler/latency.py — the reference's
            # compiler+simulator role, no measurement in the loop)
            from .compiler.latency import min_latency_schedule
            sched = []
            w = ds.x.shape[1]
            modelled_ns = 0.0
            for graph in model.layers:
                sc, t_ns = min_latency_schedule(graph, ds.host_graph,
                                                feat_width=w)
                sched.append(sc)
                modelled_ns += t_ns
                w = max(op.out_width for op in graph.ops
                        if op.op_id in graph.outputs)
            out["modelled_us"] = modelled_ns / 1e3
        fwd = model.make_apply(
            dtype, schedules=sched,
            host_graph=ds.host_graph if sched else None)
        if sched:
            out["schedule"] = [s.key() for s in sched]
        lat = time_layer_device(fwd, params, ds.graph, x,
                                k_small=8, k_big=8 + args.iters,
                                target_s=args.target_s or None)
        out.update(dict(latency_us=lat * 1e6,
                        edges_per_s=ds.host_graph.n_edge * args.layers / lat))

    elif args.command == "tune":
        memo = args.memo or f"results/memo_{args.network}_{args.dataset}.csv"

        def tune_one(graph, in_w, warm=()):
            params = jax.device_put(
                init_params(graph, jax.random.key(args.seed)))
            x = jax.device_put(jax.random.normal(
                jax.random.key(1), (ds.host_graph.n_node, in_w),
                jnp.float32))
            if args.ga:
                from .tune import GeneticTuner
                tuner = GeneticTuner(graph, ds.host_graph,
                                     compute_dtype=dtype,
                                     memo_path=memo, iters=args.iters,
                                     warm_start=warm,
                                     derive_palette=args.derive_palette)
                return tuner.search(params, ds.graph, x,
                                    verbose=not args.json)
            from .tune import autotune
            return autotune(graph, ds.host_graph, params, ds.graph, x,
                            compute_dtype=dtype, memo_path=memo,
                            iters=args.iters, verbose=not args.json)

        if args.stack:
            # per-layer tuning of the REAL model stack (1433->128 and
            # 128->7 want different schedules); writes one JSON `run` and
            # `train --schedule` consume directly
            from .models.zoo import build_model
            model = build_model(args.network, ds.x.shape[1], ds.n_class,
                                hidden=args.hidden, n_layers=args.layers,
                                heads=args.heads, reorder=args.reorder)
            specs, total = [], 0.0
            w = ds.x.shape[1]
            prev_best = []           # transfer: seed layer i+1 from layer i
            for li, graph in enumerate(model.layers):
                res = tune_one(graph, w, warm=tuple(prev_best[-1:]))
                prev_best.append(res.best)
                total += res.latency_s
                specs.append(dict(
                    blocks=[list(b) for b in res.best.blocks],
                    tiles=[list(t.key()) for t in res.best.tiles],
                    latency_us=res.latency_s * 1e6))
                w = max(op.out_width for op in graph.ops
                        if op.op_id in graph.outputs)
                if not args.json:
                    print(f"layer {li}: {res.latency_s*1e6:.1f}us "
                          f"{res.best.key()}")
            import os as _os
            path = args.schedule or (
                f"results/best_{args.network}_{args.dataset}_stack.json")
            _os.makedirs(_os.path.dirname(path) or ".", exist_ok=True)
            json.dump({"layers": specs}, open(path, "w"))
            out.update(dict(stack_latency_us=total * 1e6,
                            schedule_path=path))
        else:
            graph = build_op_graph(
                args.network, args.hidden, args.hidden, heads=args.heads,
                reorder=args.reorder, layer_tag="tune")
            res = tune_one(graph, args.hidden)
            out.update(dict(best_latency_us=res.latency_s * 1e6,
                            best_schedule=res.best.key(),
                            n_trials=len(res.trials),
                            pareto=[dict(latency_us=m.latency_s * 1e6,
                                         traffic_bytes=m.traffic,
                                         schedule=m.schedule.key())
                                    for m in res.pareto]))
            if not args.json:
                print(res.report())

    elif args.command == "bench":
        from .graph import tile_graph, tile_graph_classes
        from .ops import sddmm as sddmm_mod
        from .ops import spmm as spmm_mod
        bhg = ds.host_graph
        if args.batch > 1:
            # block-diagonal serving composition: ONE kernel sweep serves
            # all B copies; per-graph edge weights (the dataset's own
            # symmetric norm) are preserved by batch_graphs
            from .data.batching import batch_graphs
            bhg, _ = batch_graphs([bhg] * args.batch)
            out["batch"] = args.batch
        if args.tile_classes:
            sb = args.sparse_block or 256
            classes = ((128, 256, 512, 1024)
                       if args.tile_classes == "auto" else
                       tuple(int(c) for c in args.tile_classes.split(",")))
            tg = tile_graph_classes(bhg, block_rows=sb, block_cols=sb,
                                    tile_classes=classes)
            out["tile_classes"] = list(classes)
            out["sparse_block"] = sb
        elif args.sparse_block:
            sb = args.sparse_block
            tg = tile_graph(bhg, block_rows=sb, block_cols=sb)
            out["sparse_block"] = sb
        else:
            # default: geometry + capacity from the measured v5e cost model
            # (graph.tile_time_model_ns); Cora B=64 serving measured
            # 11.75 -> 4.16 ms vs the old fixed 256^2/512
            from .graph import (best_tile_capacity, run_nnz_hist,
                                tile_time_model_ns)
            best = None
            for tr, tc in ((256, 256), (512, 512), (1024, 512),
                           (1024, 1024)):
                nnz = run_nnz_hist(bhg, tr, tc)
                if not len(nnz):
                    best = (0.0, 256, 256, 512)
                    break
                et = best_tile_capacity(nnz, tr, tc,
                                        feat_width=args.hidden)
                t = tile_time_model_ns(nnz, et, tr, tc,
                                       feat_width=args.hidden)
                if best is None or t < best[0]:
                    best = (t, tr, tc, et)
            _, tr, tc, et = best
            tg = tile_graph(bhg, block_rows=tr, block_cols=tc,
                            tile_edges=et)
            out["sparse_block"] = [tr, tc]
            out["tile_edges"] = et
        # CPU backends only run Pallas in interpret mode (CI smoke path)
        interp = jax.default_backend() == "cpu"
        x = jax.device_put(jax.random.normal(
            jax.random.key(1), (bhg.n_node, args.hidden),
            jnp.bfloat16 if args.bf16 else jnp.float32))
        lat = time_layer_device(
            lambda p, t, v: spmm_mod.spmm(t, v, interpret=interp),
            None, tg, x, k_small=8, k_big=8 + args.iters,
            target_s=args.target_s or None)
        out.update(dict(spmm_latency_us=lat * 1e6,
                        spmm_edges_per_s=bhg.n_edge / lat))
        # roofline %: achieved vs v5e peaks for the one-hot kernel
        # (VERDICT r2 next-9 — makes the tail gap a first-class number).
        # MXU: kernel FLOPs incl. padded slots; HBM: the ideal traffic
        # (x panel per run + edge streams + output), i.e. % of the
        # bandwidth-bound speed-of-light for this op
        import numpy as np
        from .hwconfig import load_hw_config
        cfg = load_hw_config()
        xb = x.dtype.itemsize
        slots = getattr(tg, "total_slots", None) or tg.n_tiles * tg.tile_edges
        if hasattr(tg, "parts"):
            kflops = sum(2 * p.n_tiles * p.tile_edges
                         * (p.block_rows + p.block_cols) * args.hidden
                         for p in tg.parts)
            runs = sum(len(np.unique(np.asarray(p.tile_rb)
                                     * p.n_col_blocks
                                     + np.asarray(p.tile_cb)))
                       for p in tg.parts)
            bc = tg.parts[0].block_cols
        else:
            kflops = (2 * slots * (tg.block_rows + tg.block_cols)
                      * args.hidden)
            bc = tg.block_cols
            if hasattr(tg, "chunk_cb"):
                runs = tg.n_chunks
            else:
                runs = len(np.unique(np.asarray(tg.tile_rb)
                                     * tg.n_col_blocks
                                     + np.asarray(tg.tile_cb)))
        ideal_bytes = (runs * bc * args.hidden * xb + slots * 16
                       + bhg.n_node * args.hidden * 4)
        mxu_peak = 197e12 if args.bf16 else 49e12
        out.update(dict(
            spmm_mxu_pct=round(100 * kflops / lat / mxu_peak, 1),
            spmm_hbm_pct=round(
                100 * ideal_bytes / lat / (cfg.hbm_gbps * 1e9), 1)))

        # SDDMM (per-edge pair dots — the attention-logit hot op; the
        # north-star metric is SpMM+SDDMM edges/s)
        def sddmm_fn(p, t, v):
            e = sddmm_mod.sddmm(t, v, v, heads=1, interpret=interp)
            # scalar keep-alive folded back at negligible cost
            # (multi-class tilings return a per-class tuple)
            tot = (sum(part.sum() for part in e) if isinstance(e, tuple)
                   else e.sum())
            return v + tot.astype(v.dtype) * 1e-9

        lat2 = time_layer_device(sddmm_fn, None, tg, x,
                                 k_small=8, k_big=8 + args.iters,
                                 target_s=args.target_s or None)
        out.update(dict(sddmm_latency_us=lat2 * 1e6,
                        sddmm_edges_per_s=bhg.n_edge / lat2))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
