"""Isolate the nside-512 CG stall: exact _prof_pcg_512 config on CPU,
comparing (a) all-f32 [the stalling TPU config], (b) all-f64, and
(c) f32 operator + f64 CG coefficient arithmetic.
Usage: python _exp_prec512b.py {f32|f64}
"""
import sys
import numpy as np
import jax

mode = sys.argv[1] if len(sys.argv) > 1 else "f32"
jax.config.update("jax_platforms", "cpu")
if mode == "f64":
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from functools import partial

from commander_tpu.sampling import amplitude as amp
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import alm_dot
from commander_tpu.ops.cg import pcg

nside, lmax, nband, ncomp = 512, 1024, 9, 5
npix, nl = 12 * nside * nside, lmax + 1
rng = np.random.default_rng(0)
F = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp)).astype(np.float32)
ell = np.arange(nl)
bl = np.exp(-0.5 * ell * (ell + 1)
            * np.radians(rng.uniform(0.2, 1.0, nband))[:, None] ** 2)
bl = bl.astype(np.float32)[:, None, :]
rms = rng.uniform(0.5, 3.0, (nband, 1, npix)).astype(np.float32)
cl = np.zeros((ncomp, 1, nl), np.float32)
cl[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
data = rng.normal(0, 1, (nband, 1, npix)).astype(np.float32)

dt = "float64" if mode == "f64" else "float32"
plan = sht.get_plan(nside, lmax, dtype=dt)
cast = (lambda a: jnp.asarray(np.asarray(a, np.float64))) if mode == "f64" \
    else jnp.asarray
sysm = amp.build_system(cast(F), cast(bl), cast(rms), cast(cl), cast(data))
rhs = amp.compute_rhs(sysm, plan, jax.random.PRNGKey(1))
M_inv = amp.build_preconditioner(sysm, plan)
for it in (50, 100, 200):
    res = jax.jit(lambda: pcg(partial(amp.apply_A, sysm, plan), rhs,
                              M_inv=M_inv, dot=alm_dot, tol=1e-8,
                              maxiter=it))()
    r_true = rhs - amp.apply_A(sysm, plan, res.x)
    tr = float(jnp.sqrt(alm_dot(r_true, r_true))
               / jnp.sqrt(alm_dot(rhs, rhs)))
    print(f"{mode} nside512 maxiter={it}: iters={int(res.iters)} "
          f"recurred={float(res.rel_res):.3e} TRUE={tr:.3e}", flush=True)
    if float(res.rel_res) < 1e-8:
        break
