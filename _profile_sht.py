"""Microprofile the SHT stages on the live TPU: Legendre vs ring stage.

Chained-iteration timing with scalar readback (same methodology as bench.py).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from commander_tpu.sphere import sht
from commander_tpu.utils import transfer

nside, lmax, batch = 256, 512, 8
dtype = "float32"
dev = jax.devices()[0]
print("device:", dev)

with jax.default_device(jax.devices("cpu")[0]):
    plan = sht.get_plan(nside, lmax, dtype=dtype)
    nl = lmax + 1
    rng = np.random.default_rng(0)
    a0 = rng.standard_normal((batch, nl, nl)) + 1j * rng.standard_normal((batch, nl, nl))
    a = jnp.asarray(a0.astype(np.complex64))
    m0 = rng.standard_normal((batch, 12 * nside * nside))
    m = jnp.asarray(m0.astype(np.float32))

spec_p, enc_p = transfer.encode(plan)
spec_a, enc_a = transfer.encode(a)
spec_m, enc_m = transfer.encode(m)
enc_p, enc_a, enc_m = jax.device_put((enc_p, enc_a, enc_m), dev)


def timed(fn, ep, ex, n):
    t0 = time.perf_counter()
    v = float(np.asarray(fn(ep, ex, n)))
    assert np.isfinite(v)
    return time.perf_counter() - t0


def bench_stage(name, body_fn, spec_x, enc_x, n_lo=2, n_hi=20):
    @partial(jax.jit, static_argnums=2)
    def chain(ep, ex, n):
        p = transfer.decode(spec_p, ep)
        x = transfer.decode(spec_x, ex)

        def body(i, x):
            return body_fn(p, x)
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(jnp.abs(out.real if jnp.iscomplexobj(out) else out)).astype(jnp.float32)

    timed(chain, enc_p, enc_x, n_lo)
    timed(chain, enc_p, enc_x, n_hi)
    t_lo = min(timed(chain, enc_p, enc_x, n_lo) for _ in range(3))
    t_hi = min(timed(chain, enc_p, enc_x, n_hi) for _ in range(3))
    per = (t_hi - t_lo) / (n_hi - n_lo)
    print(f"{name:34s} {per*1e3:9.3f} ms/iter")
    return per


# full roundtrip at explicit f32 matmul precision
import contextlib
with jax.default_matmul_precision("float32"):
    bench_stage("roundtrip f32-precision",
                lambda p, a: sht.map2alm(p, sht.alm2map(p, a)).astype(a.dtype), spec_a, enc_a)
    bench_stage("legendre f32-precision",
                lambda p, a: (sht._legendre_adjoint(
                    p, sht._legendre_synth(p, a * p.lmmask, p.lam0, p.lam0),
                    p.lam0, p.lam0) * 1e-3).astype(a.dtype), spec_a, enc_a)

# full roundtrip
bench_stage("roundtrip (alm2map+map2alm)",
            lambda p, a: sht.map2alm(p, sht.alm2map(p, a)).astype(a.dtype), spec_a, enc_a)

# Legendre synth only (keep output shape == input via adjoint to chain)
bench_stage("legendre synth+adj",
            lambda p, a: (sht._legendre_adjoint(
                p, sht._legendre_synth(p, a * p.lmmask, p.lam0, p.lam0),
                p.lam0, p.lam0) * 1e-3).astype(a.dtype), spec_a, enc_a)

# ring stage only: synthesis + analysis on ring spectra (nring, nm)
with jax.default_device(jax.devices("cpu")[0]):
    G0 = rng.standard_normal((batch, 4 * nside - 1, lmax + 1)) \
        + 1j * rng.standard_normal((batch, 4 * nside - 1, lmax + 1))
    G = jnp.asarray(G0.astype(np.complex64))
spec_g, enc_g = transfer.encode(G)
enc_g = jax.device_put(enc_g, dev)
bench_stage("ring synth+analysis",
            lambda p, g: (sht.ring_analysis(p, sht.ring_synthesis(p, g))[..., : p.mmax + 1] * 1e-3).astype(g.dtype),
            spec_g, enc_g)

# pixel gathers
bench_stage("pad+gather pix",
            lambda p, x: sht._gather_pix(p, sht._pad_to_rings(p, x) * 1.0), spec_m, enc_m)
