"""BASELINE config-4 demo: nside-2048 / lmax-3000 multi-band CR draw on
ONE TPU chip via the fused Pallas OTF SHT (production scale of
param_BP_v8.00_full.txt:74,153-676 — 14 bands at nside up to 2048).

Memory note: alms (5 comps x 3001^2 c64) ~ 360 MB; 9 band maps at
nside 2048 ~ 1.8 GB; no Legendre table (OTF).
Usage: python _prof_pcg_2048.py [nband] [ncomp] [maxiter]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

nband = int(sys.argv[1]) if len(sys.argv) > 1 else 9
ncomp = int(sys.argv[2]) if len(sys.argv) > 2 else 5
maxiter = int(sys.argv[3]) if len(sys.argv) > 3 else 100

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
nside, lmax = 2048, 3000

with jax.default_device(cpu):
    from commander_tpu.sampling import amplitude as amp
    from commander_tpu.sphere import sht
    from commander_tpu.utils import transfer

    npix, nl = 12 * nside * nside, lmax + 1
    rng = np.random.default_rng(0)
    F = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp)).astype(np.float32)
    ell = np.arange(nl)
    bl = np.exp(-0.5 * ell * (ell + 1)
                * np.radians(rng.uniform(0.05, 0.2, nband))[:, None] ** 2)
    bl = np.where(bl < 1e-12, 0.0, bl)      # f32/TPU beam floor
    bl = bl.astype(np.float32)[:, None, :]
    rms = rng.uniform(0.5, 3.0, (nband, 1, npix)).astype(np.float32)
    cl = np.zeros((ncomp, 1, nl), np.float32)
    cl[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
    data = rng.normal(0, 1, (nband, 1, npix)).astype(np.float32)
    sysm = amp.build_system(jnp.asarray(F), jnp.asarray(bl),
                            jnp.asarray(rms), jnp.asarray(cl),
                            jnp.asarray(data))
    plan = sht.get_plan(nside, lmax, dtype="float32", tables=False,
                        legendre_backend="pallas")
    spec, enc = transfer.encode((plan, sysm))
enc_d = jax.device_put(enc, dev)


@partial(jax.jit, static_argnums=1)
def solve(e, n):
    plan, sysm = transfer.decode(spec, e)
    a, res = amp.sample_amplitudes(sysm, plan, key=jax.random.PRNGKey(1),
                                   tol=1e-6, maxiter=n)
    return (jnp.sum(jnp.abs(a.real)).astype(jnp.float32),
            res.iters.astype(jnp.float32),
            res.rel_res.astype(jnp.float32))


for n in (3, maxiter):
    t0 = time.perf_counter()
    v, it, rr = solve(enc_d, n)
    v = float(np.asarray(v))
    it = float(np.asarray(it))
    rr = float(np.asarray(rr))
    dt = time.perf_counter() - t0
    print(f"maxiter={n:3d}: {dt:8.2f} s wall  iters={it:.0f} "
          f"relres={rr:.2e}  ({dt / max(it, 1):.2f} s/iter incl "
          f"compile+rhs)", flush=True)
