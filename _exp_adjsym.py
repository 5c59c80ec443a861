"""Measure <Y a, m> vs <a, Yt m> consistency on TPU per nside/backend.

CG requires the operator to be numerically self-adjoint; this isolates
which SHT size/backend breaks it.
"""
import sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
from functools import partial

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 256
backend = sys.argv[2] if len(sys.argv) > 2 else "table"

with jax.default_device(cpu):
    from commander_tpu.sphere import sht
    from commander_tpu.utils import transfer
    lmax = 2 * nside
    plan = sht.get_plan(nside, lmax, dtype="float32",
                        tables=(backend == "table"),
                        legendre_backend=("pallas" if backend == "pallas"
                                          else "xla"))
    nl = lmax + 1
    npix = 12 * nside * nside
    rng = np.random.default_rng(0)
    a_re = rng.normal(size=(1, nl, nl)).astype(np.float32)
    a_im = rng.normal(size=(1, nl, nl)).astype(np.float32)
    tri = np.tril(np.ones((nl, nl), np.float32)).T  # l>=m upper? match alm
    m_map = rng.normal(size=(1, npix)).astype(np.float32)
    spec, enc = transfer.encode((plan,))
enc_d = jax.device_put(enc, dev)
a_re_d = jax.device_put(jnp.asarray(a_re), dev)
a_im_d = jax.device_put(jnp.asarray(a_im), dev)
m_d = jax.device_put(jnp.asarray(m_map), dev)


@jax.jit
def go(e, are, aim, m):
    (plan,) = transfer.decode(spec, e)
    from commander_tpu.sphere.alm import alm_dot, triangle_mask
    nl = plan.lmax + 1
    a = (are + 1j * aim) * jnp.asarray(np.tril(np.ones((nl, nl))).T,
                                       jnp.float32)
    a = a.at[:, :, 0].set(are[:, :, 0])          # real m=0
    Ya = sht.alm2map(plan, a[None])[0]           # (1, npix)
    Ytm = sht.alm2map_adjoint(plan, m[None])[0]  # (1, nl, nm)
    d1 = jnp.sum(Ya * m)
    d2 = alm_dot(a, Ytm)
    n1 = jnp.sqrt(jnp.sum(Ya * Ya)) * jnp.sqrt(jnp.sum(m * m))
    return d1, d2, (d1 - d2) / n1


d1, d2, rel = go(enc_d, a_re_d, a_im_d, m_d)
print(f"nside={nside} backend={backend}: <Ya,m>={float(np.asarray(d1)):.7e} "
      f"<a,Ytm>={float(np.asarray(d2)):.7e} relerr={float(np.asarray(rel)):.3e}",
      flush=True)
