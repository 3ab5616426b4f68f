#!/usr/bin/env python
"""Batch-scaling microbench for the MCMC hot op (batched Cholesky @ n=5120).

Decides whether merging the slice sampler's lower/upper step-out loops
(one 2×-batched logprob eval per iteration instead of two sequential
loops) can win: if chol wall-time is sublinear in batch, batching
evals is cheaper than serializing them.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def force(out):
    s = jnp.sum(out).astype(jnp.float32)
    return float(np.asarray(s))


def bench(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    print(f"# devices: {jax.devices()}")
    n = 5120
    rng = np.random.RandomState(0)
    x = rng.rand(n, 2).astype(np.float32)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    k_np = np.exp(-0.5 * d2) + 1e-3 * np.eye(n, dtype=np.float32)
    kj = jnp.array(k_np)

    chol = jax.jit(jnp.linalg.cholesky)
    for b in (1, 2, 5, 10, 20, 40):
        ks = jnp.broadcast_to(kj, (b, n, n)) + 0.0
        t = bench(chol, ks)
        fl = b * n**3 / 3
        print(f"chol batch={b:3d} n={n}: {t:.4f}s  {fl/t/1e12:5.1f} TF/s  "
              f"{t/b*1000:.1f} ms/item")

    # assembly scaling too (matern distance+exp at batch)
    from spearmint_tpu.core.kernels import matern52
    xj = jnp.array(x)

    @jax.jit
    def assemble(ls_b):
        return jax.vmap(lambda l: matern52(xj, xj, l))(ls_b)

    for b in (10, 20, 40):
        ls_b = jnp.ones((b, 2), jnp.float32)
        t = bench(assemble, ls_b)
        print(f"assemble batch={b:3d}: {t:.4f}s  {t/b*1000:.1f} ms/item")


if __name__ == "__main__":
    main()
