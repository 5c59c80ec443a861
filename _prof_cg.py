"""Profile apply_A pieces at the CR bench config on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
nside, lmax, nband, ncomp = 256, 512, 7, 5
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
    u0 = (rng.standard_normal((ncomp, 1, nl, nl))
          + 1j * rng.standard_normal((ncomp, 1, nl, nl))).astype(np.complex64)
    u0 = jnp.asarray(u0) * sys.tri
    spec, enc = transfer.encode((plan, sys, u0))
enc_d = jax.device_put(enc, dev)

def bench(name, body, n_lo=1, n_hi=5):
    @partial(jax.jit, static_argnums=1)
    def chain(e, n):
        plan, sys, u = transfer.decode(spec, e)
        def f(i, x):
            return body(plan, sys, x)
        out = jax.lax.fori_loop(0, n, f, u)
        return jnp.sum(jnp.abs(out.real)).astype(jnp.float32)
    def timed(n):
        t0 = time.perf_counter()
        v = float(np.asarray(chain(enc_d, n)))
        assert np.isfinite(v)
        return time.perf_counter() - t0
    timed(n_lo); timed(n_hi)
    t_lo = min(timed(n_lo) for _ in range(2))
    t_hi = min(timed(n_hi) for _ in range(2))
    per = (t_hi - t_lo) / (n_hi - n_lo)
    print(f"{name:28s} {per*1e3:10.2f} ms/iter", flush=True)

bench("apply_A", lambda p, s, u: amp.apply_A(s, p, u) * 1e-1)
bench("sqrtS", lambda p, s, u: amp._sqrtS(s, u) * 1e-1)
bench("project_bands+synth",
      lambda p, s, u: (amp._project_bands_T(
          s, p, amp._synth_T(p, amp._synth(p, amp._project_bands(s, p, u))))
          * 1e-4).astype(u.dtype) if hasattr(amp, '_synth_T') else u)
