import sys; sys.path.insert(0, "/root/repo")
"""Fit the latency-model constants (compiler/latency.py LatencyConstants)
on hardware: measures XLA's dynamic take / segment_sum per-edge-row costs
and the per-op constant at a few (E, F) points, prints fitted values.

Run when kernels or the XLA/libtpu version change, then update
LatencyConstants; scripts/latency_check.py validates the resulting ranking
against the memoised measured schedules.

Usage: python scripts/latency_fit.py
"""
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp

from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import (
    time_layer_device)

N = 8192
rng = np.random.default_rng(0)

rows = []
for E in (16384, 131072, 1048576):
    for F in (128, 256):
        src = jax.device_put(jnp.asarray(
            rng.integers(0, N, E), jnp.int32))
        dst = jax.device_put(jnp.asarray(
            np.sort(rng.integers(0, N, E)), jnp.int32))
        x = jax.device_put(jax.random.normal(
            jax.random.key(1), (N, F), jnp.bfloat16))

        def take_fn(p, g, xx):
            s, d = g
            y = jnp.take(xx, s, axis=0)
            return jnp.zeros_like(xx).at[:E].set(y[:E] * 0 + y[:E])[:N]

        def seg_fn(p, g, xx):
            s, d = g
            e = jnp.take(xx, s, axis=0)
            return jax.ops.segment_sum(e, d, N, indices_are_sorted=True)

        t_take = time_layer_device(
            lambda p, g, xx: jnp.take(xx, g[0], axis=0)[
                jnp.arange(N) % E][:N],
            None, (src, dst), x, target_s=0.2, reps=2)
        t_seg = time_layer_device(seg_fn, None, (src, dst), x,
                                  target_s=0.2, reps=2)
        lanes = max(F // 128, 1)
        rows.append((E, F, t_take, t_seg))
        print(f"E={E:8d} F={F}: take {t_take*1e6:8.1f} us "
              f"({t_take*1e9/E/lanes:.2f} ns/row/lane-group)  "
              f"take+segsum {t_seg*1e6:8.1f} us "
              f"({t_seg*1e9/E/lanes:.2f} ns/row/lane-group)", flush=True)

# slope fit across E at F=128 (per-op const = intercept)
e_vals = np.array([r[0] for r in rows if r[1] == 128], float)
seg = np.array([r[3] for r in rows if r[1] == 128], float) * 1e9
A = np.vstack([e_vals, np.ones_like(e_vals)]).T
coef, *_ = np.linalg.lstsq(A, seg, rcond=None)
print(f"\nfit (take+segment_sum, F=128): "
      f"{coef[0]:.2f} ns/row + {coef[1]/1e3:.1f} us const")
print("split take vs segment using the take-only rows; update "
      "LatencyConstants.xla_take_row_ns / xla_segment_row_ns / "
      "xla_op_const_ns accordingly")
