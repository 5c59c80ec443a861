"""Chunked CG at nside 512 / lmax 1024 on TPU: SAME iteration as the
fori_loop version but state (x, r, z, p, rz) crosses the host boundary
every `chunk` iterations. If this converges where the monolithic
fori_loop diverges, the failure is in the runtime's handling of the long
loop with the 4.3 GB table resident (aliasing/rematerialization), not in
the math.

Usage: python _exp_chunkcg.py [chunk] [nchunks]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 5
nchunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
nside = int(sys.argv[3]) if len(sys.argv) > 3 else 512
backend = sys.argv[4] if len(sys.argv) > 4 else "table"

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
lmax, nband, ncomp = 2 * nside, 9, 5

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


@jax.jit
def init(e):
    plan, sysm = transfer.decode(spec, e)
    rhs = amp.compute_rhs(sysm, plan, None)
    M_inv = amp.build_preconditioner(sysm, plan)
    r0 = rhs
    z0 = M_inv(r0)
    bnorm = jnp.sqrt(alm_dot(rhs, rhs))
    return (jnp.zeros_like(rhs), r0, z0, z0, alm_dot(r0, z0), rhs, bnorm)


@partial(jax.jit, static_argnums=2)
def run_chunk(e, st, n):
    plan, sysm = transfer.decode(spec, e)
    M_inv = amp.build_preconditioner(sysm, plan)
    A = partial(amp.apply_A, sysm, plan)
    x, r, z, p, rz, rhs, bnorm = st

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
    return (x, r, z, p, rz, rhs, bnorm), rel.astype(jnp.float32)


t0 = time.perf_counter()
st = init(enc_d)
for c in range(nchunks):
    st, rel = run_chunk(enc_d, st, chunk)
    print(f"iter {(c + 1) * chunk:3d}: recurred relres "
          f"{float(np.asarray(rel)):.3e}  "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
