"""Candidate fixes for the TPU CG divergence at nside 512 / lmax 1024.

Variants (run sequentially in one process):
  blfloor : zero beam transfer below 1e-12 (kills the subnormal/FTZ
            regime; modes damped by e^-28 carry no information)
  f64dot  : alm_dot accumulated in float64 on device
  both    : both
Usage: python _exp_fix512.py [variant] [niter]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_enable_x64", True)   # f64dot needs real float64
import jax.numpy as jnp

variant = sys.argv[1] if len(sys.argv) > 1 else "blfloor"
niter = int(sys.argv[2]) if len(sys.argv) > 2 else 40

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
nside, lmax, nband, ncomp = 512, 1024, 9, 5

with jax.default_device(cpu):
    from commander_tpu.sampling import amplitude as amp
    from commander_tpu.sphere import sht
    from commander_tpu.sphere.alm import alm_dot, eps_weights
    from commander_tpu.utils import transfer

    npix, nl = 12 * nside * nside, lmax + 1
    rng = np.random.default_rng(0)
    F = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp)).astype(np.float32)
    ell = np.arange(nl)
    bl = np.exp(-0.5 * ell * (ell + 1)
                * np.radians(rng.uniform(0.1, 0.5, nband))[:, None] ** 2)
    bl = bl.astype(np.float32)[:, None, :]
    if variant in ("blfloor", "both"):
        bl = np.where(bl < 1e-12, 0.0, bl)
    rms = rng.uniform(0.5, 3.0, (nband, 1, npix)).astype(np.float32)
    cl = np.zeros((ncomp, 1, nl), np.float32)
    cl[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
    data = rng.normal(0, 1, (nband, 1, npix)).astype(np.float32)
    sysm = amp.build_system(jnp.asarray(F), jnp.asarray(bl),
                            jnp.asarray(rms), jnp.asarray(cl),
                            jnp.asarray(data))
    plan = sht.get_plan(nside, lmax, dtype="float32", tables=True)
    spec, enc = transfer.encode((plan, sysm))
enc_d = jax.device_put(enc, dev)

if variant in ("f64dot", "both"):
    def mydot(a, b):
        w = eps_weights(a.shape[-1], jnp.float64)
        pa = (a.real.astype(jnp.float64) * b.real.astype(jnp.float64)
              + a.imag.astype(jnp.float64) * b.imag.astype(jnp.float64))
        return jnp.sum(pa * w).astype(jnp.float32)
else:
    mydot = alm_dot


@partial(jax.jit, static_argnums=1)
def go(e, n):
    plan, sysm = transfer.decode(spec, e)
    rhs = amp.compute_rhs(sysm, plan, None)
    M_inv = amp.build_preconditioner(sysm, plan)
    A = partial(amp.apply_A, sysm, plan)
    r0 = rhs
    z0 = M_inv(r0)
    bnorm = jnp.sqrt(mydot(rhs, rhs))

    def body(i, st):
        x, r, z, p, rz, hist = st
        Ap = A(p)
        alpha = rz / mydot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = mydot(r, z)
        p = z + (rz_new / rz) * p
        hist = hist.at[i].set(jnp.sqrt(mydot(r, r)) / bnorm)
        return (x, r, z, p, rz_new, hist)

    hist0 = jnp.zeros((n,), jnp.float32)
    x0 = jnp.zeros_like(rhs)
    x, r, *_, hist = jax.lax.fori_loop(
        0, n, body, (x0, r0, z0, z0, mydot(r0, z0), hist0))
    r_true = rhs - A(x)
    return hist, jnp.sqrt(mydot(r_true, r_true)) / bnorm


t0 = time.perf_counter()
hist, true_rel = go(enc_d, niter)
hist = np.asarray(hist)
print(f"[{variant}] wall {time.perf_counter() - t0:.1f}s", flush=True)
for i in range(4, niter, 5):
    print(f"   iter {i + 1:3d}: {hist[i]:.3e}")
print(f"[{variant}] final recurred {hist[-1]:.3e} "
      f"TRUE {float(np.asarray(true_rel)):.3e}", flush=True)
