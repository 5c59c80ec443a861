"""Time the full sample_amplitudes at fixed iteration counts."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
nside, lmax, nband, ncomp = 512, 1024, 9, 5
with jax.default_device(cpu):
    from commander_tpu.sampling import amplitude as amp
    from commander_tpu.sphere import sht
    from commander_tpu.utils import transfer
    plan = sht.get_plan(nside, lmax, dtype="float32")
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
    sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                           jnp.asarray(cl), jnp.asarray(data))
    spec, enc = transfer.encode((plan, sys))
enc_d = jax.device_put(enc, dev)

@partial(jax.jit, static_argnums=1)
def solve(e, maxiter):
    plan, sys = transfer.decode(spec, e)
    a, res = amp.sample_amplitudes(sys, plan, key=jax.random.PRNGKey(1),
                                   tol=1e-30, maxiter=maxiter)
    return (jnp.sum(jnp.abs(a.real)).astype(jnp.float32),
            res.iters.astype(jnp.float32), res.rel_res.astype(jnp.float32))

def timed(n):
    t0 = time.perf_counter()
    v, it, rr = solve(enc_d, n)
    v = float(np.asarray(v)); it = float(np.asarray(it)); rr = float(np.asarray(rr))
    return time.perf_counter() - t0, it, rr

for n in (100, 100):
    t, it, rr = timed(n)
    print(f"maxiter={n:3d}: {t:7.2f} s  iters={it:.0f} relres={rr:.2e}", flush=True)
