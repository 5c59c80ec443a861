"""Ground-truth the nside-512 CG stall on CPU: exact _prof_pcg_512 config,
f32, reporting recurred AND true residuals at maxiter 100."""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
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

plan = sht.get_plan(nside, lmax, dtype="float32")
sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                       jnp.asarray(cl), jnp.asarray(data))
rhs = amp.compute_rhs(sys, plan, jax.random.PRNGKey(1))
M_inv = amp.build_preconditioner(sys, plan)
res = jax.jit(lambda: pcg(partial(amp.apply_A, sys, plan), rhs,
                          M_inv=M_inv, dot=alm_dot, tol=1e-30,
                          maxiter=100))()
r_true = rhs - amp.apply_A(sys, plan, res.x)
tr = float(jnp.sqrt(alm_dot(r_true, r_true)) / jnp.sqrt(alm_dot(rhs, rhs)))
print(f"f32 nside512: iters={int(res.iters)} "
      f"recurred={float(res.rel_res):.3e} TRUE={tr:.3e}", flush=True)
