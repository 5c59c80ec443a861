"""Experiment: Legendre matmul precision + real-FFT belt estimates."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from commander_tpu.sphere import sht
from commander_tpu.utils import transfer

nside, lmax, batch = 256, 512, 8
dev = jax.devices()[0]
cpu = jax.devices("cpu")[0]
rng = np.random.default_rng(0)
nl = lmax + 1
a0 = (rng.standard_normal((batch, nl, nl))
      + 1j * rng.standard_normal((batch, nl, nl)))

# f64 truth on CPU
with jax.default_device(cpu):
    plan64 = sht.get_plan(nside, lmax, dtype="float64")
    truth = np.asarray(sht.alm2map(plan64, jnp.asarray(a0)))

def run(prec):
    with jax.default_device(cpu):
        plan = sht.get_plan(nside, lmax, dtype="float32", precision=prec)
        a = jnp.asarray(a0.astype(np.complex64))
    spec_p, enc_p = transfer.encode(plan)
    spec_a, enc_a = transfer.encode(a)
    enc_p, enc_a = jax.device_put((enc_p, enc_a), dev)

    @partial(jax.jit, static_argnums=2)
    def chain(ep, ea, n):
        p = transfer.decode(spec_p, ep)
        a = transfer.decode(spec_a, ea)
        def body(i, x):
            return sht.map2alm(p, sht.alm2map(p, x)).astype(x.dtype)
        out = jax.lax.fori_loop(0, n, body, a)
        return jnp.sum(jnp.abs(out.real)).astype(jnp.float32)

    @jax.jit
    def synth(ep, ea):
        p = transfer.decode(spec_p, ep)
        a = transfer.decode(spec_a, ea)
        m = sht.alm2map(p, a)
        return m.astype(jnp.float32)

    # accuracy (synth once; readback real map)
    m = np.asarray(synth(enc_p, enc_a))
    err = np.abs(m - truth).max() / np.abs(truth).max()

    def timed(n):
        t0 = time.perf_counter()
        v = float(np.asarray(chain(enc_p, enc_a, n)))
        assert np.isfinite(v)
        return time.perf_counter() - t0
    timed(2); timed(20)
    t_lo = min(timed(2) for _ in range(3))
    t_hi = min(timed(20) for _ in range(3))
    per = (t_hi - t_lo) / 18
    sht_s = 2 * batch / per
    print(f"prec={prec:8s} roundtrip {per*1e3:7.3f} ms  {sht_s:8.1f} SHT/s  relerr={err:.2e}")

for prec in ("float32", "high", "default"):
    run(prec)

# belt FFT: complex ifft vs irfft microbench
H0 = (rng.standard_normal((batch, 513, 513))
      + 1j * rng.standard_normal((batch, 513, 513))).astype(np.complex64)
with jax.default_device(cpu):
    H = jnp.asarray(H0)
spec_h, enc_h = transfer.encode(H)
enc_h = jax.device_put(enc_h, dev)

@partial(jax.jit, static_argnums=(1, 2))
def fft_chain(eh, n, mode):
    Hx = transfer.decode(spec_h, eh)
    def body(i, x):
        if mode == "cplx":
            y = jnp.pad(x, [(0, 0), (0, 0), (0, 1024 - x.shape[-1])])
            f = jnp.fft.ifft(y.reshape(-1, 1024), axis=-1).reshape(batch, 513, 1024)
            g = jnp.fft.fft(f.reshape(-1, 1024), axis=-1).reshape(batch, 513, 1024)
            return g[..., :513] * 1e-3
        else:
            f = jnp.fft.irfft(x.reshape(-1, 513), n=1024, axis=-1).reshape(batch, 513, 1024)
            g = jnp.fft.rfft(f.reshape(-1, 1024), axis=-1).reshape(batch, 513, 513)
            return g * 1e-3
    out = jax.lax.fori_loop(0, n, body, Hx)
    return jnp.sum(jnp.abs(out.real)).astype(jnp.float32)

for mode in ("cplx", "real"):
    def timed(n):
        t0 = time.perf_counter()
        v = float(np.asarray(fft_chain(enc_h, n, mode)))
        return time.perf_counter() - t0
    timed(2); timed(20)
    t = (min(timed(20) for _ in range(3)) - min(timed(2) for _ in range(3))) / 18
    print(f"belt fft mode={mode}: {t*1e3:7.3f} ms/roundtrip-pair")
