"""Experiment: SHT throughput vs batch size + Pallas Legendre path."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from commander_tpu.sphere import sht
from commander_tpu.utils import transfer

nside, lmax = 256, 512
dev = jax.devices()[0]
cpu = jax.devices("cpu")[0]
rng = np.random.default_rng(0)
nl = lmax + 1

def run(batch, backend="xla"):
    with jax.default_device(cpu):
        plan = sht.get_plan(nside, lmax, dtype="float32")
        a0 = (rng.standard_normal((batch, nl, nl))
              + 1j * rng.standard_normal((batch, nl, nl)))
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

    def timed(n):
        t0 = time.perf_counter()
        v = float(np.asarray(chain(enc_p, enc_a, n)))
        assert np.isfinite(v)
        return time.perf_counter() - t0
    n_hi = max(4, int(160 / batch))
    timed(2); timed(n_hi)
    t_lo = min(timed(2) for _ in range(3))
    t_hi = min(timed(n_hi) for _ in range(3))
    per = (t_hi - t_lo) / (n_hi - 2)
    print(f"batch={batch:3d} roundtrip {per*1e3:8.3f} ms  {2*batch/per:9.1f} SHT/s", flush=True)

for b in (4, 8, 16, 32, 64):
    run(b)
