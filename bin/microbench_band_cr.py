#!/usr/bin/env python
"""Mosaic CR kernel timing at production shape."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from spearmint_tpu.ops import band
from spearmint_tpu.core.kernels import matern52
from spearmint_tpu.core.likelihood import unit_cov_matrix, log_marginal, GPHypers

K, N, D, b = 10, 5120, 2, 128
n_real = 5000
rng = np.random.RandomState(0)
x = np.zeros((N, D), np.float32); x[:n_real] = rng.rand(n_real, D)
y = np.zeros(N, np.float32); y[:n_real] = np.sin(3*x[:n_real,0]) + 0.1*rng.randn(n_real)
mask = np.arange(N) < n_real
xj, yj, mj = jnp.array(x), jnp.array(y), jnp.array(mask)
ls = jnp.array(np.stack([rng.uniform(0.3,1.2,D) for _ in range(K)]), jnp.float32)
means = jnp.array(rng.uniform(-0.2,0.2,K), jnp.float32)
amp2s = jnp.array(rng.uniform(0.3,1.5,K), jnp.float32)
noises = jnp.array(rng.uniform(5e-3,5e-2,K), jnp.float32)

def med(fn, reps=3):
    float(np.asarray(fn()).sum())
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); float(np.asarray(fn()).sum()); ts.append(time.perf_counter()-t0)
    return float(np.median(ts)), ts

# production path: band_marginal_factory vmapped (factory auto: CR via custom_vmap -> pallas)
def precompute(l_):
    m0 = unit_cov_matrix(xj, mj, l_, matern52)
    vecs = jnp.stack([jnp.where(mj, yj, 0.0), mj.astype(jnp.float32)], 1)
    return band.reduce_to_band(m0, vecs, b)
t0=time.perf_counter()
db, sb, vt = jax.block_until_ready(jax.jit(jax.vmap(precompute))(ls))
print(f"reduce compile+run {time.perf_counter()-t0:.1f}s", flush=True)
nb = db.shape[1]; mb = max(2, 1 << (nb-1).bit_length()); ext = (mb-nb)*b
zb = jnp.zeros((K, mb-nb, b, b), jnp.float32)
db_p = jnp.concatenate([db, zb], 1); sb_p = jnp.concatenate([sb, zb], 1)
uy = jnp.concatenate([vt[:,:,0], jnp.zeros((K, ext))], 1)
um = jnp.concatenate([vt[:,:,1], jnp.zeros((K, ext))], 1)
mask_e = jnp.concatenate([mj, jnp.zeros(ext, bool)])

@jax.jit
def cr_pallas_eval(mean, amp2, noise):
    def one(dbk, sbk, uyk, umk, m_, a_, nz_):
        dadd = jnp.where(mask_e, nz_, 1.0)
        resid = uyk - m_*umk
        ld, q = band.cr_eval(dbk, sbk, a_, dadd, resid)
        return -ld - 0.5*q
    return jax.vmap(one)(db_p, sb_p, uy, um, mean, amp2, noise)

t0=time.perf_counter()
lp = jax.block_until_ready(cr_pallas_eval(means, amp2s, noises))
print(f"cr_pallas compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t_cr, raw = med(lambda: cr_pallas_eval(means, amp2s, noises))
print(f"cr_pallas_eval10_s {t_cr:.4f} {['%.3f'%t for t in raw]}", flush=True)

@jax.jit
def fused_eval(mean, amp2, noise, lsk):
    def one(m_, a_, nz_, l_):
        return log_marginal(xj, yj, mj, GPHypers(m_, a_, nz_, l_), matern52)
    return jax.vmap(one)(mean, amp2, noise, lsk)
lp_f = fused_eval(means, amp2s, noises, ls)
t_f, _ = med(lambda: fused_eval(means, amp2s, noises, ls))
dabs = np.abs(np.asarray(lp)-np.asarray(lp_f))
print(f"fused_eval10_s {t_f:.4f}; pallas_cr_vs_fused max_abs {dabs.max():.3e} max_rel {(dabs/np.abs(np.asarray(lp_f))).max():.3e}", flush=True)
t_red, _ = med(lambda: jax.jit(jax.vmap(precompute))(ls)[2])
for evals in (10, 16):
    old = evals*t_f
    new = t_red + (evals+1)*t_cr
    print(f"evals={evals}: old={old:.3f} new={new:.3f} (reduce {t_red:.3f}) speedup={old/new:.2f}x", flush=True)
