import sys; sys.path.insert(0, "/root/repo")
"""Probe: a single device program that runs past ~60 s faults with
UNAVAILABLE on this chip/tunnel — REGARDLESS of content.

RESULT (2026-08-20, v5e via axon): a pure-matmul fori_loop (zero
pallas_calls) of 4096^2 bf16 matmuls
  * k=40000 (~30 s)  -> PASS
  * k=160000 (~120s) -> FAULT after 60.9 s: UNAVAILABLE "TPU device error"
i.e. there is a HARD ~60 s per-program wall-clock budget.  This explains
the r3 2-layer GAT full-batch fault boundary exactly: the 60M-edge step ran
50.8 s (just under), 90M+ steps extrapolate past 60 s.  The r3 suspicion of
a per-executable semaphore/DMA budget is ruled out (no pallas involved
here).  Consequence: full-batch training at Reddit scale requires the STEP
TIME to sit well under 60 s — the fused tile-domain GAT backward — not a
restructuring of pallas call counts.

Usage: python scripts/long_program_probe.py [seconds]
"""
import time
import jax
import jax.numpy as jnp

target_s = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0

M = 4096
x = jnp.ones((M, M), jnp.bfloat16)
w = (jnp.eye(M, dtype=jnp.float32) * 0.999).astype(jnp.bfloat16)


def mk(k):
    def f(x):
        def body(i, h):
            return jnp.tanh(h @ w).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, k, body, x)[0, 0]
    return jax.jit(f)


# measured v5e rate ~0.74 ms/iter at steady state
k = int(target_s / 0.74e-3)
f = mk(k)
t0 = time.time()
c = f.lower(x).compile()
print(f"compile {time.time()-t0:.1f}s, running k={k} (~{target_s:.0f}s)",
      flush=True)
t0 = time.time()
try:
    jax.block_until_ready(c(x))
    print(f"PASS: single program ran {time.time()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"FAULT after {time.time()-t0:.1f}s: {type(e).__name__}: "
          f"{str(e)[:300]}", flush=True)
