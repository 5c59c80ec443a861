"""CG scalar diagnostics at nside 512 on TPU: per-iteration alpha, p.Ap,
r.z, |r|, |x| — to see WHICH invariant breaks when the solve diverges.

Usage: python _exp_cgdiag.py [backend] [niter]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

backend = sys.argv[1] if len(sys.argv) > 1 else "table"
niter = int(sys.argv[2]) if len(sys.argv) > 2 else 12

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
nside, lmax, nband, ncomp = 512, 1024, 9, 5

with jax.default_device(cpu):
    from commander_tpu.sampling import amplitude as amp
    from commander_tpu.sphere import sht
    from commander_tpu.sphere.alm import alm_dot
    from commander_tpu.utils import transfer

    npix, nl = 12 * nside * nside, lmax + 1
    rng = np.random.default_rng(0)
    F = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp)).astype(np.float32)
    ell = np.arange(nl)
    bl = np.exp(-0.5 * ell * (ell + 1)
                * np.radians(rng.uniform(0.1, 0.5, nband))[:, None] ** 2)
    bl = bl.astype(np.float32)[:, None, :]
    rms = rng.uniform(0.5, 3.0, (nband, 1, npix)).astype(np.float32)
    cl = np.zeros((ncomp, 1, nl), np.float32)
    cl[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
    data = rng.normal(0, 1, (nband, 1, npix)).astype(np.float32)
    sysm = amp.build_system(jnp.asarray(F), jnp.asarray(bl),
                            jnp.asarray(rms), jnp.asarray(cl),
                            jnp.asarray(data))
    plan = sht.get_plan(nside, lmax, dtype="float32",
                        tables=(backend == "table"),
                        legendre_backend=("pallas" if backend == "pallas"
                                          else "xla"))
    spec, enc = transfer.encode((plan, sysm))
enc_d = jax.device_put(enc, dev)


@partial(jax.jit, static_argnums=1)
def go(e, n):
    plan, sysm = transfer.decode(spec, e)
    rhs = amp.compute_rhs(sysm, plan, None)
    M_inv = amp.build_preconditioner(sysm, plan)
    A = partial(amp.apply_A, sysm, plan)
    r0 = rhs
    z0 = M_inv(r0)

    def body(i, st):
        x, r, z, p, rz, hist = st
        Ap = A(p)
        pAp = alm_dot(p, Ap)
        alpha = rz / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = alm_dot(r, z)
        p = z + (rz_new / rz) * p
        row = jnp.stack([alpha, pAp, rz_new,
                         jnp.sqrt(alm_dot(r, r)),
                         jnp.sqrt(alm_dot(x, x)),
                         jnp.sqrt(alm_dot(p, p))])
        hist = hist.at[i].set(row)
        return (x, r, z, p, rz_new, hist)

    hist0 = jnp.zeros((n, 6), jnp.float32)
    x0 = jnp.zeros_like(rhs)
    out = jax.lax.fori_loop(0, n, body,
                            (x0, r0, z0, z0, alm_dot(r0, z0), hist0))
    x, r, z, p, rz, hist = out
    # one symmetry probe in the Krylov space: <Ap, z> vs <p, Az>
    Az = A(z)
    Ap = A(p)
    s1 = alm_dot(Ap, z)
    s2 = alm_dot(p, Az)
    return hist, s1, s2, jnp.sqrt(alm_dot(rhs, rhs))


t0 = time.perf_counter()
hist, s1, s2, bn = go(enc_d, niter)
hist = np.asarray(hist)
print(f"[{backend}] wall {time.perf_counter() - t0:.1f}s  bnorm="
      f"{float(np.asarray(bn)):.4e}", flush=True)
print(" it      alpha          pAp            rz         |r|"
      "          |x|          |p|")
for i in range(niter):
    a_, pap, rz_, rn, xn, pn = hist[i]
    print(f"{i + 1:3d}  {a_: .4e}  {pap: .4e}  {rz_: .4e}  {rn: .4e}"
          f"  {xn: .4e}  {pn: .4e}")
print(f"symmetry probe: <Ap,z>={float(np.asarray(s1)):.6e} "
      f"<p,Az>={float(np.asarray(s2)):.6e} "
      f"rel={abs(float(np.asarray(s1 - s2))) / abs(float(np.asarray(s1))):.2e}")
