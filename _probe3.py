import sys, time
import jax, numpy as np
import jax.numpy as jnp
import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import init_params, lower

ds = gta.load_dataset("cora")
og = gta.build_op_graph("GAT", 128, 128, heads=4, layer_tag="bench")
params = jax.device_put(init_params(og, jax.random.key(0)))
x = jax.device_put(jax.random.normal(jax.random.key(1), (ds.host_graph.n_node, 128), jnp.float32))
apply = lower(og, compute_dtype=jnp.bfloat16)
g = ds.graph

def repeat(k):
    def fn(params, g, x):
        def body(i, h):
            return apply(params, g, h).astype(x.dtype)
        return jax.lax.fori_loop(0, k, body, x)
    return jax.jit(fn)

f1, f2 = repeat(50), repeat(1050)
_ = float(jnp.sum(f1(params, g, x)))   # compile f1 + sync (enter slow mode)
_ = float(jnp.sum(f2(params, g, x)))   # compile f2 + sync
def run(f):
    t0 = time.perf_counter()
    v = float(jnp.sum(f(params, g, x)))
    return time.perf_counter() - t0, v
t1, v1 = run(f1)
t2, v2 = run(f2)
per = (t2 - t1) / 1000
print(f"RESULT T50={t1:.3f}s T1050={t2:.3f}s per_layer={per*1e6:.1f}us", flush=True)
