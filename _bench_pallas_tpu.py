"""Validate + time the fused Pallas OTF Legendre kernels on real TPU.

Correctness: compiled Pallas vs XLA OTF (both f32) at sizes where the
2^30 rescaling fires (nside >= 256). Timing: chained-iteration readback
(same harness as bench.py). All host<->device traffic goes through
utils/transfer.py (this axon runtime implements only f32/f64 transfers).
"""
import sys
import time
from functools import partial

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
import numpy as np

from commander_tpu.sphere import sht
from commander_tpu.sphere.sht_otf import (legendre_otf, alm2map_otf,
                                          map2alm_otf)
from commander_tpu.sphere.pallas_sht import alm2map_pallas, map2alm_pallas
from commander_tpu.utils import transfer

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 256
lmax = 2 * nside
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
check = "--nocheck" not in sys.argv
dev = jax.devices()[0]

with jax.default_device(jax.devices("cpu")[0]):
    plan = sht.get_plan(nside, lmax, dtype="float32", tables=False)
    otf = legendre_otf(nside, lmax, 0, dtype="float32")
    nl = lmax + 1
    rng = np.random.default_rng(0)
    alm = (rng.standard_normal((batch, nl, nl))
           + 1j * rng.standard_normal((batch, nl, nl))).astype(np.complex64)
    alm[..., 0] = alm[..., 0].real
    for l in range(nl):
        alm[:, l, l + 1:] = 0
    spec, enc = transfer.encode((plan, otf, jnp.asarray(alm)))
enc = jax.device_put(enc, dev)

if check:
    @jax.jit
    def errs(e):
        plan, otf, a = transfer.decode(spec, e)
        m_x = alm2map_otf(plan, otf, a)
        a_x = map2alm_otf(plan, otf, m_x)
        m_pp = alm2map_pallas(plan, otf, a)
        a_pp = map2alm_pallas(plan, otf, m_x)
        em = jnp.abs(m_pp - m_x).max() / jnp.abs(m_x).max()
        ea = jnp.abs(a_pp - a_x).max() / jnp.abs(a_x).max()
        rm = jnp.sqrt(jnp.mean(jnp.square(m_pp - m_x))
                      / jnp.mean(jnp.square(m_x)))
        ra = jnp.sqrt(jnp.mean(jnp.square(jnp.abs(a_pp - a_x)))
                      / jnp.mean(jnp.square(jnp.abs(a_x))))
        return (em.astype(jnp.float32), ea.astype(jnp.float32),
                rm.astype(jnp.float32), ra.astype(jnp.float32))
    t0 = time.time()
    em, ea, rm, ra = errs(enc)
    print(f"compiled Pallas vs XLA OTF: synth max {float(em):.2e} "
          f"rms {float(rm):.2e}, adj max {float(ea):.2e} "
          f"rms {float(ra):.2e}  ({time.time()-t0:.0f}s incl compile)",
          flush=True)

@partial(jax.jit, static_argnums=1)
def chain(e, n):
    plan, otf, a = transfer.decode(spec, e)

    def body(_, a):
        m = alm2map_pallas(plan, otf, a)
        a2 = map2alm_pallas(plan, otf, m)
        return a2.astype(a.dtype)
    out = jax.lax.fori_loop(0, n, body, a)
    return jnp.sum(jnp.abs(out.real)).astype(jnp.float32)

prev = None
for n in (1, 2, 4):
    r = chain(enc, n); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = chain(enc, n); jax.block_until_ready(r)
        ts.append(time.time() - t0)
    t = min(ts)
    msg = f"n={n}: {t:.3f}s total, {t/n*1e3:.1f} ms/roundtrip-batch, " \
          f"{batch*n/t:.1f} SHT-roundtrips/s"
    if prev is not None:
        dt = t - prev[1]
        dn = n - prev[0]
        msg += f" | scaled: {batch*dn/dt:.1f} SHT/s"
    prev = (n, t)
    print(msg, flush=True)
