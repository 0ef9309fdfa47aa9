import sys; sys.path.insert(0, "/root/repo")
"""Decisive A/B of the candidate schedules with large-signal slope timing."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import schedule as S
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.fusion import lower_schedule
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import init_params, lower
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import time_layer_device

ds = gta.load_dataset("cora")
og = gta.build_op_graph("GAT", 128, 128, heads=4, layer_tag="bench")
params = jax.device_put(init_params(og, jax.random.key(0)))
x = jax.device_put(jax.random.normal(jax.random.key(1), (ds.host_graph.n_node, 128), jnp.float32))

part = S.pattern_partition(og)
def sched(tc):
    return S.Schedule(blocks=part, tiles=tuple(
        tc if len(b) > 2 else S.TileConfig(path=S.PATH_XLA) for b in part))

cands = {
    "onehot_1024x512": lower_schedule(og, sched(S.TileConfig(1024, 512, 512)), ds.host_graph, jnp.bfloat16),
    "onehot_512": lower_schedule(og, sched(S.TileConfig(512, 512, 512)), ds.host_graph, jnp.bfloat16),
    "xla": lower(og, compute_dtype=jnp.bfloat16),
}
for name, fn in cands.items():
    t = time_layer_device(fn, params, ds.graph, x, k_small=100, k_big=4100, reps=3)
    print(f"{name:18s}: {t*1e6:8.1f}us", flush=True)
