import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import schedule as S
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.fusion import lower_schedule
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import init_params, lower
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import time_layer_device

# dense-community graph: 4096 nodes, 600k edges (3.6% density)
rng = np.random.default_rng(0)
n, e = 4096, 600_000
s = rng.integers(0, n, e).astype(np.int32)
r = rng.integers(0, n, e).astype(np.int32)
hg = gta.build_host_graph(s, r, n, add_self_loops=True, symmetric_norm=True)
g = hg.to_device()
print(f"n={n} E={hg.n_edge}", flush=True)

og = gta.build_op_graph("GAT", 128, 128, heads=4, layer_tag="dense")
params = jax.device_put(init_params(og, jax.random.key(0)))
x = jax.device_put(jax.random.normal(jax.random.key(1), (n, 128), jnp.float32))

part = S.pattern_partition(og)
def sched(tc):
    return S.Schedule(blocks=part, tiles=tuple(
        tc if len(b) > 2 else S.TileConfig(path=S.PATH_XLA) for b in part))

for name, fn in {
    "onehot_512": lower_schedule(og, sched(S.TileConfig(512, 512, 2048)), hg, jnp.bfloat16),
    "onehot_1024": lower_schedule(og, sched(S.TileConfig(1024, 1024, 4096)), hg, jnp.bfloat16),
    "stream": lower_schedule(og, sched(S.TileConfig(512, 512, 256, path=S.PATH_STREAM)), hg, jnp.bfloat16),
    "xla": lower(og, compute_dtype=jnp.bfloat16),
}.items():
    try:
        t = time_layer_device(fn, params, g, x, k_small=20, k_big=320, reps=2)
        print(f"DENSE {name:12s}: {t*1e3:8.3f}ms  {hg.n_edge/t/1e9:.3f} Gedge/s", flush=True)
    except Exception as ex:
        print(f"DENSE {name:12s}: FAILED {type(ex).__name__}", flush=True)
