"""Validate the f32 attainable-accuracy hypothesis for the nside-512 CG
stall: same hierarchy as _prof_pcg_512 but at nside 128 with noise scaled
down to match the nside-512 condition number. Compares recurred vs TRUE
residual in f32 and f64."""
import sys as _s
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from functools import partial

from commander_tpu.sampling import amplitude as amp
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import alm_dot

nside = 128
lmax = 2 * nside
scale = 1024 / lmax
nband, ncomp = 9, 5
npix, nl = 12 * nside * nside, lmax + 1
noise_fac = float(_s.argv[1]) if len(_s.argv) > 1 else 0.25

rng = np.random.default_rng(0)
F64 = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp))
ell = np.arange(nl)
fwhm = rng.uniform(0.2, 1.0, nband) * scale
bl64 = np.exp(-0.5 * ell * (ell + 1) * np.radians(fwhm)[:, None] ** 2)
rms64 = rng.uniform(0.5, 3.0, (nband, 1, npix)) * noise_fac
cl64 = np.zeros((ncomp, 1, nl))
cl64[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
data64 = rng.normal(0, 1, (nband, 1, npix))

for dt in ("float32", "float64"):
    d = np.float32 if dt == "float32" else np.float64
    plan = sht.get_plan(nside, lmax, dtype=dt)
    sys = amp.build_system(jnp.asarray(F64.astype(d)),
                           jnp.asarray(bl64[:, None, :].astype(d)),
                           jnp.asarray(rms64.astype(d)),
                           jnp.asarray(cl64.astype(d)),
                           jnp.asarray(data64.astype(d)))
    rhs = amp.compute_rhs(sys, plan, jax.random.PRNGKey(1))
    M_inv = amp.build_preconditioner(sys, plan)
    from commander_tpu.ops.cg import pcg
    res = jax.jit(lambda: pcg(partial(amp.apply_A, sys, plan), rhs,
                              M_inv=M_inv, dot=alm_dot, tol=1e-12,
                              maxiter=200))()
    r_true = rhs - amp.apply_A(sys, plan, res.x)
    tr = float(jnp.sqrt(alm_dot(r_true, r_true))
               / jnp.sqrt(alm_dot(rhs, rhs)))
    print(f"{dt}: iters={int(res.iters)} recurred={float(res.rel_res):.3e} "
          f"TRUE={tr:.3e}", flush=True)
