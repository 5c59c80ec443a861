"""BASELINE config-3 demo: nside-1024 / lmax-2048, 9-band, 5-component
constrained-realization draw on ONE TPU chip via the fused Pallas OTF SHT
(no Legendre table fits in HBM at this size) and the chunked production
PCG (sample_amplitudes_chunked — the monolithic on-device loop miscomputes
with large constants live and long runs have crashed the TPU worker;
BASELINE.md round 3).

Measured 2026-08-21 (TPU v5e): relres 3.2e-5 @ 10 iters, 5.8e-9 @ 20,
floor ~2e-20 by 50; 1.11 s per CG iteration steady after a one-time
~305 s remote compile.
"""
import time
from functools import partial

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
nside, lmax, nband, ncomp = 1024, 2048, 9, 5

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
    plan = sht.get_plan(nside, lmax, dtype="float32", tables=False,
                        legendre_backend="pallas")
    spec, enc = transfer.encode((plan, sysm))
enc_d = jax.device_put(enc, dev)


@jax.jit
def _init(e):
    plan, sysm = transfer.decode(spec, e)
    rhs = amp.compute_rhs(sysm, plan, jax.random.PRNGKey(1))
    M_inv = amp.build_preconditioner(sysm, plan)
    z0 = M_inv(rhs)
    bnorm = jnp.sqrt(alm_dot(rhs, rhs))
    return (jnp.zeros_like(rhs), rhs, z0, z0, alm_dot(rhs, z0), bnorm)


@partial(jax.jit, static_argnums=2)
def _chunk(e, st, n):
    plan, sysm = transfer.decode(spec, e)
    M_inv = amp.build_preconditioner(sysm, plan)
    A = partial(amp.apply_A, sysm, plan)
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
st = _init(enc_d)
done = 0
while done < 100:
    st, rel = _chunk(enc_d, st, 10)
    done += 10
    print(f"iter {done:3d}: recurred relres "
          f"{float(np.asarray(rel)):.3e}  "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
    if float(np.asarray(rel)) < 1e-10:
        break
