import sys, time
import jax, numpy as np
import jax.numpy as jnp
size, N = int(sys.argv[1]), int(sys.argv[2])
a = jax.device_put(jax.random.normal(jax.random.key(0), (size, size), jnp.bfloat16))
f = jax.jit(lambda a: a @ a)
out = f(a)                      # compile
t0 = time.perf_counter()
for _ in range(N):
    out = f(out)                # chained -> strictly serialized on device
t_loop = time.perf_counter() - t0
s = jnp.sum(out)
t1 = time.perf_counter()
v = float(s)
drain = time.perf_counter() - t1
flops = 2 * size**3 * N
print(f"RESULT size={size} N={N} loop={t_loop:.3f}s drain={drain:.3f}s "
      f"per_iter={(drain)/N*1e3:.1f}ms tflops={flops/drain/1e12:.1f}", flush=True)
