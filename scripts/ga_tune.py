import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import init_params
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.tune import GeneticTuner

ds = gta.load_dataset("cora")
og = gta.build_op_graph("GAT", 64, 16, heads=16, layer_tag="l3bench")
params = jax.device_put(init_params(og, jax.random.key(0)))
x = jax.device_put(jax.random.normal(jax.random.key(1), (ds.host_graph.n_node, 64), jnp.float32))
tuner = GeneticTuner(og, ds.host_graph, compute_dtype=jnp.bfloat16,
                     memo_path="results/memo_gat_cora_l3.csv",
                     max_generations=6, n_offspring=6, stable_stop=3,
                     iters=1000)
res = tuner.search(params, ds.graph, x, verbose=True)
print(res.report())
