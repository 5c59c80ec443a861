"""BASELINE config-4 demo: the BP v8 production band layout as ONE
multi-resolution CR draw on one TPU chip.

Mirrors param_BP_v8.00_full.txt:153-717: 3 low-res bands (nside 16,
lmax 64), 8 mid bands (nside 512, lmax 1500), 3 high bands (nside 1024,
lmax 3000); 5 components at lmax 3000 (COMP_LMAX_AMP03 = 3000). The
512/1024 groups run the fused Pallas OTF Legendre (tables over 2 GiB are
auto-refused; get_plan resolves OTF), the nside-16 group uses tables.

Usage: python _prof_pcg_bp.py [maxiter]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

maxiter = int(sys.argv[1]) if len(sys.argv) > 1 else 100

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
import os as _os
_variant = _os.environ.get("BP_GROUPS", "full")
GROUPS = {  # (nside, lmax, nband, beam fwhm range deg)
    "full": [(16, 64, 3, (2.0, 8.0)),
             (512, 1500, 8, (0.2, 0.6)),
             (1024, 3000, 3, (0.08, 0.23))],
    "no16": [(512, 1500, 8, (0.2, 0.6)),
             (1024, 3000, 3, (0.08, 0.23))],
    "cap48": [(16, 48, 3, (2.0, 8.0)),
              (512, 1500, 8, (0.2, 0.6)),
              (1024, 3000, 3, (0.08, 0.23))],
    "hi": [(1024, 3000, 3, (0.08, 0.23))],
}[_variant]
ncomp = 5
lmax_c = max(lm for _, lm, _, _ in GROUPS)

with jax.default_device(cpu):
    from commander_tpu.sampling import amplitude as amp
    from commander_tpu.sampling import multires
    from commander_tpu.sphere import sht
    from commander_tpu.utils import transfer

    nl_c = lmax_c + 1
    rng = np.random.default_rng(0)
    ell_c = np.arange(nl_c)
    cl = np.zeros((ncomp, 1, nl_c), np.float32)
    cl[:, :, 2:] = 100.0 / (ell_c[2:] * (ell_c[2:] + 1.0))

    groups, plans = [], []
    for ns, lm, nb, (f0, f1) in GROUPS:
        npix, nl = 12 * ns * ns, lm + 1
        F = 1.0 + rng.uniform(0.2, 1.0, (nb, ncomp)).astype(np.float32)
        ell = np.arange(nl)
        bl = np.exp(-0.5 * ell * (ell + 1)
                    * np.radians(rng.uniform(f0, f1, nb))[:, None] ** 2)
        bl = bl.astype(np.float32)[:, None, :]
        rms = rng.uniform(0.5, 3.0, (nb, 1, npix)).astype(np.float32)
        data = rng.normal(0, 1, (nb, 1, npix)).astype(np.float32)
        sys_g = amp.build_system(jnp.asarray(F), jnp.asarray(bl),
                                 jnp.asarray(rms),
                                 jnp.asarray(cl[..., :nl]),
                                 jnp.asarray(data))
        plan_g = sht.get_plan(ns, lm, dtype="float32")   # auto table/OTF
        groups.append(sys_g)
        plans.append(plan_g)
        print(f"group nside {ns} lmax {lm}: {nb} bands, "
              f"{'table' if plan_g.lam0 is not None else 'OTF-pallas'}",
              flush=True)
    ms = multires.build_multi_system(groups, jnp.asarray(cl))
    spec, enc = transfer.encode((ms, tuple(plans)))
enc_d = jax.device_put(enc, dev)


from commander_tpu.sphere.alm import alm_dot


@jax.jit
def init(e):
    ms, plans = transfer.decode(spec, e)
    rhs = multires.compute_rhs_multi(ms, plans, jax.random.PRNGKey(1))
    M_inv = multires.build_preconditioner_multi(ms, plans)
    z0 = M_inv(rhs)
    bnorm = jnp.sqrt(alm_dot(rhs, rhs))
    return (jnp.zeros_like(rhs), rhs, z0, z0, alm_dot(rhs, z0), bnorm)


@partial(jax.jit, static_argnums=2)
def run_chunk(e, st, n):
    ms, plans = transfer.decode(spec, e)
    M_inv = multires.build_preconditioner_multi(ms, plans)
    A = partial(multires.apply_A_multi, ms, plans)
    x, r, z, p, rz, bnorm = st

    def body(i, s):
        x, r, z, p, rz = s
        Ap = A(p)
        alpha = rz / alm_dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = alm_dot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new)

    x, r, z, p, rz = jax.lax.fori_loop(0, n, body, (x, r, z, p, rz))
    rel = jnp.sqrt(alm_dot(r, r)) / bnorm
    return (x, r, z, p, rz, bnorm), rel.astype(jnp.float32)


t0 = time.perf_counter()
st = init(enc_d)
done = 0
chunk = 10
while done < maxiter:
    st, rel = run_chunk(enc_d, st, chunk)
    done += chunk
    print(f"iter {done:3d}: recurred relres {float(np.asarray(rel)):.3e}"
          f"  ({time.perf_counter() - t0:.0f}s)", flush=True)
    if float(np.asarray(rel)) < 1e-8:
        break
