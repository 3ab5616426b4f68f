"""Microbench: XLA cholesky vs Pallas blocked cholesky on TPU.

The axon tunnel adds ~30 ms per host round-trip, so each timed sample
runs REPS factorizations back-to-back inside one jitted fori_loop and
fetches a single scalar.

Usage: python bin/microbench_chol.py [batch] [n] [block]
"""
import sys
import time

import jax
import jax.numpy as jnp

from spearmint_tpu.ops.pallas_chol import cholesky_pallas

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 10
n = int(sys.argv[2]) if len(sys.argv) > 2 else 6144
block = int(sys.argv[3]) if len(sys.argv) > 3 else 256
REPS = 5

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (batch, n, 64), dtype=jnp.float32)
a = x @ x.transpose(0, 2, 1) + n * jnp.eye(n, dtype=jnp.float32)[None]
a = jax.device_put(a)
jax.block_until_ready(a)

flops = batch * n**3 / 3


def bench(fn, label):
    def looped(m):
        def body(i, s):
            # s feeds back into the input so XLA cannot hoist the chol
            # out of the loop; contribution is exactly 0.
            return jnp.sum(fn(m + s * 0.0)) * (1.0 / REPS) + s * 0.0

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    f = jax.jit(looped)
    t0 = time.perf_counter()
    s = float(f(a))
    print(f"{label:24s} compile+first {time.perf_counter()-t0:7.1f} s")
    best = min(
        (lambda t: (float(f(a)), time.perf_counter() - t)[1])(time.perf_counter())
        for _ in range(3)
    )
    dt = best / REPS
    print(f"{label:24s} {dt*1e3:9.2f} ms  {flops/dt/1e12:6.2f} TFLOP/s  (sum={s:.6g})")
    return dt


t_xla = bench(jnp.linalg.cholesky, "xla cholesky")
t_pl = bench(lambda m: cholesky_pallas(m, block=block), f"pallas chol (B={block})")
ref = jax.jit(jnp.linalg.cholesky)(a)
mine = jax.jit(lambda m: cholesky_pallas(m, block=block))(a)
err = jnp.max(jnp.abs(ref - mine)) / jnp.max(jnp.abs(ref))
print(f"rel err {float(err):.2e}   speedup {t_xla/t_pl:.2f}x")
