import sys; sys.path.insert(0, "/root/repo")
import json
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import init_params
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.tune import autotune

ds = gta.load_dataset("cora")
# reference GCN layer2 shape: 128 -> 64 (aggregate-first)
og = gta.build_op_graph("GCN", 128, 64, layer_tag="gcn2")
params = jax.device_put(init_params(og, jax.random.key(0)))
x = jax.device_put(jax.random.normal(jax.random.key(1), (ds.host_graph.n_node, 128), jnp.float32))
res = autotune(og, ds.host_graph, params, ds.graph, x,
               compute_dtype=jnp.bfloat16, iters=1500, verbose=True,
               memo_path="results/memo_gcn_cora.csv")
print(res.report())
best = res.best
json.dump({"blocks": [list(b) for b in best.blocks],
           "tiles": [list(t.key()) for t in best.tiles],
           "latency_us": res.latency_s * 1e6},
          open("results/best_gcn_cora.json", "w"))
print("saved")
