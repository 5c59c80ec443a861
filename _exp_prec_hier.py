"""Beam-hierarchy preconditioner testbed (downscaled _prof_pcg_512 config).

nside 128 / lmax 256 with beams 0.8-4.0 deg reproduces the same b_l
dynamic range as the failing nside-512 / lmax-1024 / 0.2-1.0 deg config.
Compares preconditioners: iters to rel_res 1e-6 (cap 400).
"""
import sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from functools import partial

from commander_tpu.sampling import amplitude as amp
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import alm_dot
from commander_tpu.ops.cg import pcg

nside, lmax, nband, ncomp = 128, 256, 9, 5
beam_lo, beam_hi = 0.8, 4.0
if "--512" in sys.argv:
    nside, lmax, beam_lo, beam_hi = 512, 1024, 0.2, 1.0
npix, nl = 12 * nside * nside, lmax + 1
rng = np.random.default_rng(0)
F = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp)).astype(np.float32)
ell = np.arange(nl)
# NOTE: sigma = radians(x) directly, matching _prof_pcg_512.py's failing
# config (2.355x wider than a FWHM interpretation -> e^-160 damping of the
# widest band at lmax: bands die one by one, leaving near-underdetermined
# per-ell component blocks)
sig = np.radians(rng.uniform(beam_lo, beam_hi, nband))
bl = np.exp(-0.5 * ell * (ell + 1) * sig[:, None] ** 2).astype(np.float32)
bl = bl[:, None, :]
rms = rng.uniform(0.5, 3.0, (nband, 1, npix)).astype(np.float32)
cl = np.zeros((ncomp, 1, nl), np.float32)
cl[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
data = rng.normal(0, 1, (nband, 1, npix)).astype(np.float32)

plan = sht.get_plan(nside, lmax, dtype="float32")
sysm = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                        jnp.asarray(cl), jnp.asarray(data))
rhs = amp.compute_rhs(sysm, plan, jax.random.PRNGKey(1))
nrm = float(jnp.sqrt(alm_dot(rhs, rhs)))

MAXIT = 400


def run(name, M_inv):
    res = jax.jit(lambda: pcg(partial(amp.apply_A, sysm, plan), rhs,
                              M_inv=M_inv, dot=alm_dot, tol=1e-6,
                              maxiter=MAXIT))()
    r_true = rhs - amp.apply_A(sysm, plan, res.x)
    tr = float(jnp.sqrt(alm_dot(r_true, r_true))) / nrm
    print(f"{name:28s} iters={int(res.iters):4d} "
          f"recurred={float(res.rel_res):.3e} TRUE={tr:.3e}", flush=True)


run("diagonal", amp.build_preconditioner(sysm, plan))
run("pseudoinv", amp.build_preconditioner_pseudoinv(sysm, plan))
run("lowl(L=32)+diag", amp.build_preconditioner_lowl(sysm, plan, 32))
