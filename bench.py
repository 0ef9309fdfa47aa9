"""Headline benchmark: GAT layer on Cora, real TPU, vs the reference's best
simulated schedule.

The reference's headline number is its best GA-tuned schedule for one GAT
layer on Cora at the paper config (hidden 128, 4 attention heads): 81,660
cycles @ 1 GHz = 81.66 us on the simulated GTA accelerator
(vTCAD/code/genetic_algorithm.py:748-749; BASELINE.md).  We time the same
layer shape executing *for real* on one TPU chip and report latency in us.

vs_baseline = reference_us / measured_us  (>1 means faster than the
simulated accelerator the reference proposes).

Prints exactly ONE JSON line.
"""
import json

BASELINE_US = 81.66  # vTCAD/code/genetic_algorithm.py:749 (81,660 cycles @ 1 GHz)


def main():
    import jax
    import jax.numpy as jnp

    import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import (
        init_params, lower)
    from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
        time_fn_pipelined)

    ds = gta.load_dataset("cora")
    n, f = ds.host_graph.n_node, 128
    # reference layer-3 shape: 128 hidden features, 4 heads (changeyaml.py)
    og = gta.build_op_graph("GAT", f, 128, heads=4, layer_tag="bench")
    params = init_params(og, jax.random.key(0))
    x = jax.device_put(
        jax.random.normal(jax.random.key(1), (n, f), jnp.float32))
    params = jax.device_put(params)

    fwd = jax.jit(lower(og, compute_dtype=jnp.bfloat16))
    sec = time_fn_pipelined(fwd, params, ds.graph, x, iters=100, warmup=5)
    us = sec * 1e6
    print(json.dumps({
        "metric": "gat_cora_layer128_latency",
        "value": round(us, 2),
        "unit": "us",
        "vs_baseline": round(BASELINE_US / us, 3),
    }))


if __name__ == "__main__":
    main()
