"""Spin-2 (E,B -> Q+iU) SHT roundtrip on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
nside, lmax, batch = 256, 512, 8
with jax.default_device(cpu):
    from commander_tpu.sphere import sht
    from commander_tpu.utils import transfer
    plan = sht.get_plan(nside, lmax, dtype="float32", spin2=True)
    nl = lmax + 1
    rng = np.random.default_rng(0)
    aE = (rng.standard_normal((batch, nl, nl))
          + 1j * rng.standard_normal((batch, nl, nl))).astype(np.complex64)
    aB = (rng.standard_normal((batch, nl, nl))
          + 1j * rng.standard_normal((batch, nl, nl))).astype(np.complex64)
    spec, enc = transfer.encode((plan, jnp.asarray(aE), jnp.asarray(aB)))
enc_d = jax.device_put(enc, dev)

@partial(jax.jit, static_argnums=1)
def chain(e, n):
    plan, aE, aB = transfer.decode(spec, e)
    def body(i, ab):
        aE, aB = ab
        Q, U = sht.alm2map_spin2(plan, aE, aB)
        E, B = sht.map2alm_spin2(plan, Q, U)
        return (E.astype(aE.dtype), B.astype(aB.dtype))
    E, B = jax.lax.fori_loop(0, n, body, (aE, aB))
    return (jnp.sum(jnp.abs(E.real)) + jnp.sum(jnp.abs(B.real))).astype(jnp.float32)

def timed(n):
    t0 = time.perf_counter()
    v = float(np.asarray(chain(enc_d, n)))
    assert np.isfinite(v)
    return time.perf_counter() - t0

timed(2); timed(20)
t_lo = min(timed(2) for _ in range(3))
t_hi = min(timed(20) for _ in range(3))
per = (t_hi - t_lo) / 18
print(f"spin-2 roundtrip nside {nside} lmax {lmax} batch {batch}: "
      f"{per*1e3:.2f} ms -> {2*batch/per:.0f} pol-SHT/s", flush=True)
