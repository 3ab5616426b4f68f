#!/usr/bin/env python
"""sweep1m precision split experiment (VERDICT r5 item 2).

Measures the 1M-candidate EI sweep phase with the variance-projection
GEMM at HIGHEST (shipping) vs HIGH (bf16_3x, the pre-fdda727 config),
plus f64-golden EI/variance errors for both at the sweep1m shape
(n=1000, pad 1024).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from spearmint_tpu.acquire import ei as ei_mod
from spearmint_tpu.core.linalg import pad_bucket
from spearmint_tpu.core.likelihood import GPHypers, JITTER, cross_cov
from spearmint_tpu.core.kernels import matern52

n, d, S, C = 1000, 2, 10, 1_000_000
rng = np.random.RandomState(0)
x = rng.rand(n, d); y = np.sin(3*x[:,0])*np.cos(2*x[:,1]) + 0.05*rng.randn(n)
y = (y - y.mean()).astype(np.float32)
pad = pad_bucket(n)
xp = np.zeros((pad, d), np.float32); xp[:n] = x
yp = np.zeros(pad, np.float32); yp[:n] = y
mask = np.arange(pad) < n
xj, yj, mj = jnp.array(xp), jnp.array(yp), jnp.array(mask)
cand = jnp.array(rng.rand(C, d), jnp.float32)

hyps = GPHypers(mean=jnp.zeros(S), amp2=jnp.array(rng.uniform(0.3,1.2,S), jnp.float32),
                noise=jnp.array(rng.uniform(3e-3,3e-2,S), jnp.float32),
                ls=jnp.array(rng.uniform(0.3,1.0,(S,d)), jnp.float32))

def make_posterior(var_prec, mu_prec):
    def posterior(cache, x, mask, cand, kernel=matern52):
        h = cache.hypers
        kx = cross_cov(x, cand, h.amp2, h.ls, kernel) * mask[:, None]
        mu = h.mean + jnp.tensordot(cache.alpha, kx, axes=((-1,),(0,)), precision=mu_prec)
        beta = jnp.matmul(cache.linv, kx, precision=var_prec)
        var = h.amp2 * (1.0 + JITTER) - jnp.sum(beta*beta, axis=0)
        return mu, var
    return posterior

caches = jax.vmap(lambda h: ei_mod.make_cache(xj, yj, mj, h, matern52, with_inverse=True))(hyps)

HP, HI = jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH
for name, vp, mp in [("ship_HIGHEST", HP, HP), ("var_HIGH", HI, HI), ("mu_HIGH_var_HIGHEST", HP, HI)]:
    ei_mod.posterior_from_cache = make_posterior(vp, mp)
    @jax.jit
    def sweep(caches, cand):
        return jnp.sum(jax.vmap(lambda c: ei_mod.ei_from_cache_chunked(c, xj, mj, cand, matern52))(caches), axis=0)
    out = sweep(caches, cand); float(np.asarray(out).sum())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(np.asarray(sweep(caches, cand)).sum()); ts.append(time.perf_counter()-t0)
    print(f"{name} sweep1M_s {np.median(ts):.4f}  {['%.3f'%t for t in ts]}", flush=True)

# ---- f64 golden error on a 4096-candidate subset, per variant --------
sub = cand[:4096]
import scipy.linalg as spla
from spearmint_tpu.golden import numpy_ref as g
from spearmint_tpu.core.likelihood import _effective_jitter
i = 3
x64 = x.astype(np.float64)
amp2, noise, ls_, mean = (float(hyps.amp2[i]), float(hyps.noise[i]),
                          np.asarray(hyps.ls[i], np.float64), float(hyps.mean[i]))
cov = amp2*(g.matern52(x64, x64, ls_) + _effective_jitter(pad)*np.eye(n)) + noise*np.eye(n)
chol = spla.cholesky(cov, lower=True)
alpha64 = spla.cho_solve((chol, True), y.astype(np.float64) - mean)
kx64 = amp2*g.matern52(x64, np.asarray(sub, np.float64), ls_)
mu64 = mean + kx64.T @ alpha64
beta64 = spla.solve_triangular(chol, kx64, lower=True)
var64 = amp2*(1.0 + 1e-6) - np.sum(beta64*beta64, axis=0)
best64 = float(y.min())
sig = np.sqrt(np.maximum(var64, 1e-14)); u = (best64 - mu64)/sig
import scipy.stats as sps
ei64 = sig*(u*sps.norm.cdf(u) + sps.norm.pdf(u))

one_cache = jax.tree.map(lambda a: a[i], caches)
for name, vp, mp in [("ship_HIGHEST", HP, HP), ("var_HIGH", HI, HI)]:
    post = make_posterior(vp, mp)
    mu, var = jax.jit(lambda c, s: post(c, xj, mj, s))(one_cache, sub)
    mu, var = np.asarray(mu, np.float64), np.asarray(var, np.float64)
    sg = np.sqrt(np.maximum(var, 1e-14)); uu = (best64-mu)/sg
    ei = sg*(uu*sps.norm.cdf(uu)+sps.norm.pdf(uu))
    print(f"{name}: var abs_err max {np.abs(var-var64).max():.3e} "
          f"rel@min {np.abs(var-var64)[var64.argmin()]/var64.min():.3e} "
          f"(min var64 {var64.min():.3e}); ei abs max {np.abs(ei-ei64).max():.3e} "
          f"(ei64 max {ei64.max():.3e}); neg_var {int((var<0).sum())}", flush=True)
