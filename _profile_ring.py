"""Split ring-stage cost: belt vs cap groups, on the live TPU."""
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
dev = jax.devices()[0]
print("device:", dev)

with jax.default_device(jax.devices("cpu")[0]):
    plan = sht.get_plan(nside, lmax, dtype="float32")
    rng = np.random.default_rng(0)
    G0 = rng.standard_normal((batch, plan.nring, lmax + 1)) \
        + 1j * rng.standard_normal((batch, plan.nring, lmax + 1))
    G = jnp.asarray(G0.astype(np.complex64))
print("cap groups:", plan.cap_groups)

spec_p, enc_p = transfer.encode(plan)
spec_g, enc_g = transfer.encode(G)
enc_p, enc_g = jax.device_put((enc_p, enc_g), dev)


def belt_only(p, G):
    nc, nbelt, fourN = p.ncap, p.nbelt, p.pmax
    H = jax.lax.slice_in_dim(G, nc, nc + nbelt, axis=-2) * p.belt_phase
    H = jnp.pad(H, [(0, 0)] * (H.ndim - 1) + [(0, fourN - H.shape[-1])])
    fb = sht._fft_flat(H, fourN, inverse=True) * fourN
    bins = sht._fft_flat(fb, fourN)
    return bins[..., : p.mmax + 1] * jnp.conj(p.belt_phase)


def caps_only(p, G):
    nc, nbelt, fourN, nm = p.ncap, p.nbelt, p.pmax, p.mmax + 1
    Gc = jnp.stack([G[..., :nc, :],
                    jnp.flip(G[..., nc + nbelt:, :], axis=-2)], axis=-3)
    outs = []
    for k, (i0, i1, Ls_k, La_k) in enumerate(p.cap_groups):
        gp = 4 * i1
        u = Gc[..., :, i0:i1, :] * p.cap_sA[k]
        U = sht._fft_flat(u, Ls_k)
        w = sht._fft_flat(U * p.cap_sVh[k], Ls_k, inverse=True)
        w = jax.lax.slice_in_dim(w, p.mmax, p.mmax + gp, axis=-1)
        fk = w * p.cap_sB[k]
        # analysis straight back
        u2 = fk * p.cap_aA[k]
        U2 = sht._fft_flat(u2, La_k)
        w2 = sht._fft_flat(U2 * p.cap_aVh[k], La_k, inverse=True)
        w2 = jax.lax.slice_in_dim(w2, gp - 1, gp - 1 + nm, axis=-1)
        outs.append(w2 * p.cap_aB[k])
    return jnp.concatenate(outs, axis=-2)


def one_group(p, G, k):
    nc, nbelt = p.ncap, p.nbelt
    Gc = jnp.stack([G[..., :nc, :],
                    jnp.flip(G[..., nc + nbelt:, :], axis=-2)], axis=-3)
    i0, i1, Ls_k, La_k = p.cap_groups[k]
    gp = 4 * i1
    u = Gc[..., :, i0:i1, :] * p.cap_sA[k]
    U = sht._fft_flat(u, Ls_k)
    w = sht._fft_flat(U * p.cap_sVh[k], Ls_k, inverse=True)
    w = jax.lax.slice_in_dim(w, p.mmax, p.mmax + gp, axis=-1)
    fk = w * p.cap_sB[k]
    return jnp.pad(fk, [(0, 0)] * (fk.ndim - 1)
                   + [(0, p.mmax + 1 - gp)]) if gp < p.mmax + 1 else \
        fk[..., : p.mmax + 1]


def bench(name, body, n_lo=2, n_hi=20):
    @partial(jax.jit, static_argnums=2)
    def chain(ep, eg, n):
        p = transfer.decode(spec_p, ep)
        x = transfer.decode(spec_g, eg)

        def it(i, x):
            y = body(p, x)
            # keep the carry shape fixed: fold a scalar stat of y back in
            stat = jnp.tanh(jnp.sum(jnp.abs(y.real)) * 1e-6) * 1e-6
            return (x * (1.0 + stat)).astype(x.dtype)
        out = jax.lax.fori_loop(0, n, it, x)
        return jnp.sum(jnp.abs(out.real)).astype(jnp.float32)

    def timed(n):
        t0 = time.perf_counter()
        v = float(np.asarray(chain(enc_p, enc_g, n)))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    timed(n_lo); timed(n_hi)
    t_lo = min(timed(n_lo) for _ in range(3))
    t_hi = min(timed(n_hi) for _ in range(3))
    print(f"{name:40s} {(t_hi-t_lo)/(n_hi-n_lo)*1e3:9.3f} ms/iter")


bench("belt fft+ifft (roundtrip)", belt_only)
bench("caps all groups (roundtrip)", caps_only)
bench("cap group 0 synth only",
      lambda p, G: one_group(p, G, 0))
bench("cap group 1 synth only",
      lambda p, G: one_group(p, G, 1))
