import sys, time
N = int(sys.argv[1])
import jax, numpy as np
import jax.numpy as jnp
import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import init_params, lower

ds = gta.load_dataset("cora")
og = gta.build_op_graph("GAT", 128, 128, heads=4, layer_tag="bench")
params = jax.device_put(init_params(og, jax.random.key(0)))
x = jax.device_put(jax.random.normal(jax.random.key(1), (ds.host_graph.n_node, 128), jnp.float32))
fwd = jax.jit(lower(og, compute_dtype=jnp.bfloat16))
g = ds.graph
t_c0 = time.perf_counter()
out = fwd(params, g, x)
t_c1 = time.perf_counter()
t0 = time.perf_counter()
for _ in range(N):
    out = fwd(params, g, x)
t_loop = time.perf_counter() - t0
s = jnp.sum(out)
t_q = time.perf_counter()
v = float(s)
t_drain = time.perf_counter() - t_q
print(f"RESULT N={N} loop={t_loop:.3f}s drain={t_drain:.3f}s compile_call={t_c1-t_c0:.1f}s val={v:.1f}", flush=True)
