"""A/B pixel pad/gather strategies on the live TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from commander_tpu.sphere import sht, healpix
from commander_tpu.utils import transfer

nside, lmax, batch = 256, 512, 8
dev = jax.devices()[0]
print("device:", dev)

with jax.default_device(jax.devices("cpu")[0]):
    plan = sht.get_plan(nside, lmax, dtype="float32")
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.standard_normal((batch, 12 * nside * nside)).astype(np.float32))
g = healpix.ring_geometry(nside)

spec_p, enc_p = transfer.encode(plan)
spec_m, enc_m = transfer.encode(m)
enc_p, enc_m = jax.device_put((enc_p, enc_m), dev)

N = nside
nc = N - 1
fourN = 4 * N
nbelt = 2 * N + 1
b0 = 2 * N * nc
off_n = g.offset[:nc]
nphi_n = g.nphi[:nc]
off_s = g.offset[3 * N:]
nphi_s = g.nphi[3 * N:]


def pad_slices(p, maps):
    lead = maps.shape[:-1]
    belt = jax.lax.slice_in_dim(maps, b0, b0 + nbelt * fourN, axis=-1
                                ).reshape(*lead, nbelt, fourN)
    cn = jnp.zeros((*lead, nc, fourN), maps.dtype)
    cs = jnp.zeros((*lead, nc, fourN), maps.dtype)
    for i in range(nc):
        cn = cn.at[..., i, : nphi_n[i]].set(
            jax.lax.slice_in_dim(maps, int(off_n[i]), int(off_n[i] + nphi_n[i]), axis=-1))
        cs = cs.at[..., i, : nphi_s[i]].set(
            jax.lax.slice_in_dim(maps, int(off_s[i]), int(off_s[i] + nphi_s[i]), axis=-1))
    return jnp.concatenate([cn, belt, cs], axis=-2)


def gather_slices(p, fpad):
    lead = fpad.shape[:-2]
    parts = []
    for i in range(nc):
        parts.append(fpad[..., i, : nphi_n[i]])
    parts.append(fpad[..., nc: nc + nbelt, :].reshape(*lead, nbelt * fourN))
    for i in range(nc):
        parts.append(fpad[..., nc + nbelt + i, : nphi_s[i]])
    return jnp.concatenate(parts, axis=-1)


def bench(name, body, n_lo=2, n_hi=20):
    @partial(jax.jit, static_argnums=2)
    def chain(ep, em, n):
        p = transfer.decode(spec_p, ep)
        x = transfer.decode(spec_m, em)

        def it(i, x):
            return body(p, x)
        out = jax.lax.fori_loop(0, n, it, x)
        return jnp.sum(jnp.abs(out)).astype(jnp.float32)

    def timed(n):
        t0 = time.perf_counter()
        v = float(np.asarray(chain(enc_p, enc_m, n)))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    timed(n_lo); timed(n_hi)
    t_lo = min(timed(n_lo) for _ in range(3))
    t_hi = min(timed(n_hi) for _ in range(3))
    print(f"{name:40s} {(t_hi-t_lo)/(n_hi-n_lo)*1e3:9.3f} ms/iter")


bench("current pad+gather (gather-based)",
      lambda p, x: sht._gather_pix(p, sht._pad_to_rings(p, x) * 1.0))
bench("slice-based pad+gather",
      lambda p, x: gather_slices(p, pad_slices(p, x) * 1.0))

# sanity: equal results
with jax.default_device(jax.devices("cpu")[0]):
    a = sht._gather_pix(plan, sht._pad_to_rings(plan, m))
    b = gather_slices(plan, pad_slices(plan, m))
    print("max diff:", float(jnp.max(jnp.abs(a - b))))
