import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.data.datasets import synthetic_coo
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import chunked
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import time_layer_device

n, e = 232965, 40_000_000   # Reddit node count; 40M edges (full 114M crashed the worker)
t0 = time.time()
s, r = synthetic_coo(n, e, seed=1)
hg = gta.build_host_graph(s, r, n, add_self_loops=True, symmetric_norm=True)
del s, r
print(f"prep {time.time()-t0:.0f}s E={hg.n_edge}", flush=True)
g = hg.to_device()
x = jax.device_put(jax.random.normal(jax.random.key(0), (n, 128), jnp.bfloat16))

t = time_layer_device(lambda p, gg, xx: chunked.spmm_chunked(gg, xx, chunk=1<<20),
                      None, g, x, k_small=1, k_big=9, reps=2)
print(f"LARGE spmm_stream F=128 bf16: {t*1e3:.1f}ms  {hg.n_edge/t/1e9:.2f} Gedge/s", flush=True)

a1 = jax.device_put(jax.random.normal(jax.random.key(2), (n, 4), jnp.bfloat16))
a2 = jax.device_put(jax.random.normal(jax.random.key(3), (n, 4), jnp.bfloat16))
def gat_fn(p, gg, xx):
    return chunked.gat_chunked(gg, xx, a1, a2, chunk=1<<20)
t2 = time_layer_device(gat_fn, None, g, x, k_small=1, k_big=9, reps=2)
print(f"LARGE gat_stream H4 HD128:    {t2*1e3:.1f}ms  {hg.n_edge/t2/1e9:.2f} Gedge/s", flush=True)
