"""nside-1024 (lmax 2048) OTF SHT on the real TPU — BASELINE config 3 scale."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
import sys
nside, lmax, batch = 1024, 2048, int(sys.argv[1]) if len(sys.argv)>1 else 2
with jax.default_device(cpu):
    from commander_tpu.sphere import sht
    from commander_tpu.utils import transfer
    backend = sys.argv[2] if len(sys.argv)>2 else "xla"
    chunk = int(sys.argv[3]) if len(sys.argv)>3 else 64
    plan = sht.get_plan(nside, lmax, dtype="float32", tables=False, legendre_backend=backend, otf_chunk=chunk)
    nl = lmax + 1
    rng = np.random.default_rng(0)
    a0 = (rng.standard_normal((batch, nl, nl))
          + 1j * rng.standard_normal((batch, nl, nl))).astype(np.complex64)
    a = jnp.asarray(a0)
    spec, enc = transfer.encode((plan, a))
enc_d = jax.device_put(enc, dev)

@partial(jax.jit, static_argnums=1)
def chain(e, n):
    plan, a = transfer.decode(spec, e)
    def body(i, x):
        return sht.map2alm(plan, sht.alm2map(plan, x)).astype(x.dtype)
    out = jax.lax.fori_loop(0, n, body, a)
    return jnp.sum(jnp.abs(out.real)).astype(jnp.float32)

def timed(n):
    t0 = time.perf_counter()
    v = float(np.asarray(chain(enc_d, n)))
    assert np.isfinite(v)
    return time.perf_counter() - t0

t0 = time.perf_counter()
timed(1)
print(f"compile+first {time.perf_counter()-t0:.1f} s", flush=True)
t_lo = min(timed(1) for _ in range(2))
t_hi = min(timed(3) for _ in range(2))
per = (t_hi - t_lo) / 2
print(f"nside {nside} lmax {lmax} batch {batch} backend {backend} chunk {chunk} OTF roundtrip: "
      f"{per*1e3:.1f} ms -> {2*batch/per:.1f} SHT/s", flush=True)
