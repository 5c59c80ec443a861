"""BASELINE config-3 demo: nside-1024 / lmax-2048, 9-band, 5-component
constrained-realization draw on ONE TPU chip via the fused Pallas OTF SHT
(no Legendre table fits in HBM at this size).

Reports CG iterations, recurred relative residual, and s/iter.
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
    from commander_tpu.utils import transfer
    plan = sht.get_plan(nside, lmax, dtype="float32", tables=False,
                        legendre_backend="pallas")
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
    spec, enc = transfer.encode((plan, sysm))
enc_d = jax.device_put(enc, dev)


@partial(jax.jit, static_argnums=1)
def solve(e, maxiter):
    plan, sysm = transfer.decode(spec, e)
    a, res = amp.sample_amplitudes(sysm, plan, key=jax.random.PRNGKey(1),
                                   tol=1e-6, maxiter=maxiter)
    return (jnp.sum(jnp.abs(a.real)).astype(jnp.float32),
            res.iters.astype(jnp.float32),
            res.rel_res.astype(jnp.float32))


for n in (3, 30, 100):
    t0 = time.perf_counter()
    v, it, rr = solve(enc_d, n)
    v = float(np.asarray(v)); it = float(np.asarray(it))
    rr = float(np.asarray(rr))
    dt = time.perf_counter() - t0
    print(f"maxiter={n:3d}: {dt:8.2f} s wall  iters={it:.0f} "
          f"relres={rr:.2e}  ({dt / max(it, 1):.2f} s/iter incl "
          f"compile+rhs)", flush=True)
    if rr < 1e-6:
        break
