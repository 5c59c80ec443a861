"""CPU diagnostic: preconditioner quality in the high-lmax beam-hierarchy
regime (reduced replica of _prof_pcg_512.py's stalling config).

Beam FWHMs are scaled so exp(-l(l+1)sigma^2) at THIS lmax matches the
nside-512/lmax-1024 run; noise inhomogeneity and Cl shape identical.
"""
import sys as _s
import time
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)   # match the TPU f32 regime
import jax.numpy as jnp
from functools import partial

from commander_tpu.sampling import amplitude as amp
from commander_tpu.sphere import sht

nside = int(_s.argv[1]) if len(_s.argv) > 1 else 128
lmax = 2 * nside
scale = 1024 / lmax          # beam scale factor to match lmax-1024 hierarchy
nband, ncomp = 9, 5
npix, nl = 12 * nside * nside, lmax + 1
rng = np.random.default_rng(0)
F = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp)).astype(np.float32)
ell = np.arange(nl)
fwhm = rng.uniform(0.2, 1.0, nband) * scale
bl = np.exp(-0.5 * ell * (ell + 1)
            * np.radians(fwhm)[:, None] ** 2 / (8 * np.log(2)) * (2.355**2))
bl = bl.astype(np.float32)[:, None, :]
rms = rng.uniform(0.5, 3.0, (nband, 1, npix)).astype(np.float32)
cl = np.zeros((ncomp, 1, nl), np.float32)
cl[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
data = rng.normal(0, 1, (nband, 1, npix)).astype(np.float32)

plan = sht.get_plan(nside, lmax, dtype="float32")
sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                       jnp.asarray(cl), jnp.asarray(data))

print(f"nside={nside} lmax={lmax} beams(fwhm deg)={np.sort(fwhm).round(2)}")
print(f"bl at lmax: {np.sort(bl[:, 0, -1]).round(16)}")

for name, kw in [("diagonal", {}),
                 ("pseudoinv", {"precond": "pseudoinv"}),
                 ("lowl16", {"lowl_lmax": 16})]:
    t0 = time.perf_counter()
    a, res = jax.jit(partial(amp.sample_amplitudes, tol=1e-8, maxiter=400,
                             **kw))(sys, plan, key=jax.random.PRNGKey(1))
    it = int(res.iters)
    rr = float(res.rel_res)
    print(f"{name:10s}: iters={it:4d} relres={rr:.3e} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)
