"""FFT size sensitivity on the live TPU (float-only transfer shim)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from commander_tpu.utils import transfer

dev = jax.devices()[0]
print("device:", dev)
rng = np.random.default_rng(0)


def bench(name, make_x, fn, n_lo=2, n_hi=20):
    with jax.default_device(jax.devices("cpu")[0]):
        x = make_x()
    spec, enc = transfer.encode(x)
    enc = jax.device_put(enc, dev)

    @partial(jax.jit, static_argnums=1)
    def chain(enc, n):
        x = transfer.decode(spec, enc)

        def body(i, x):
            y = fn(x)
            return (y / (1.0 + jnp.max(jnp.abs(y.real)))).astype(x.dtype)
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(jnp.abs(out.real)).astype(jnp.float32)

    def timed(n):
        t0 = time.perf_counter()
        v = float(np.asarray(chain(enc, n)))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    timed(n_lo); timed(n_hi)
    t_lo = min(timed(n_lo) for _ in range(3))
    t_hi = min(timed(n_hi) for _ in range(3))
    per = (t_hi - t_lo) / (n_hi - n_lo)
    print(f"{name:44s} {per*1e3:9.3f} ms/iter")


B = 8184  # batch*nring at nside 256


def cplx(shape):
    return lambda: jnp.asarray(
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64))


for L in (2100, 2048, 4096, 1024):
    bench(f"fft  c64 ({B},{L})", cplx((B, L)), lambda x: jnp.fft.fft(x, axis=-1))
bench(f"ifft c64 ({B},4096)", cplx((B, 4096)), lambda x: jnp.fft.ifft(x, axis=-1))
bench(f"rfft+irfft f32 ({B},2048)",
      lambda: jnp.asarray(rng.standard_normal((B, 2048)).astype(np.float32)),
      lambda x: jnp.fft.irfft(jnp.fft.rfft(x, axis=-1), n=2048, axis=-1))

# matmul DFT alternative: batched over rings, M=2*batch (re/im), K=nm, N=pmax
nring, nm, pmax, bt = 1023, 513, 1024, 8
with jax.default_device(jax.devices("cpu")[0]):
    E = jnp.asarray(rng.standard_normal((nring, nm, pmax)).astype(np.float32))
specE, encE = transfer.encode(E)
encE = jax.device_put(encE, dev)


def dft_like(g):
    Ed = transfer.decode(specE, encE)
    return jnp.einsum("brm,rmp->brp", g, Ed)[..., :nm] * 1e-3


bench("einsum brm,rmp->brp f32 (x2 for cplx)",
      lambda: jnp.asarray(rng.standard_normal((2 * bt, nring, nm)).astype(np.float32)),
      dft_like)
