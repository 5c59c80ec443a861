"""BASELINE config-4 demo: nside-2048 / lmax-3000, multi-band,
multi-component constrained-realization draw on ONE TPU chip — the
production scale of param_BP_v8.00_full.txt:74,153-676 (14 bands, band
nside up to 2048, lmax up to 3000; reference solver comm_cr_mod.f90:
771-1024).

Uses the fused Pallas OTF SHT (a Legendre table at this size would be
~73 GB, far beyond HBM) and the chunked production PCG (the monolithic
on-device while_loop miscomputes on this TPU runtime — BASELINE.md
round 3).

Memory: 5 comp alms (3001^2 c64) ~ 360 MB x 4 CG vectors; 9 bands x
(data + inv_rms + inv_rms2) at nside 2048 f32 ~ 5.4 GB.

Usage: python _prof_pcg_2048.py [nband] [ncomp] [maxiter] [chunk]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

nband = int(sys.argv[1]) if len(sys.argv) > 1 else 9
ncomp = int(sys.argv[2]) if len(sys.argv) > 2 else 5
maxiter = int(sys.argv[3]) if len(sys.argv) > 3 else 60
chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 2

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
nside, lmax = 2048, 3000

with jax.default_device(cpu):
    from commander_tpu.sampling import amplitude as amp
    from commander_tpu.sphere import sht
    from commander_tpu.sphere.alm import alm_dot
    from commander_tpu.utils import transfer

    npix, nl = 12 * nside * nside, lmax + 1
    rng = np.random.default_rng(0)
    F = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp)).astype(np.float32)
    ell = np.arange(nl)
    bl = np.exp(-0.5 * ell * (ell + 1)
                * np.radians(rng.uniform(0.1, 0.5, nband))[:, None] ** 2)
    bl = bl.astype(np.float32)[:, None, :]
    rms = rng.uniform(0.5, 3.0, (nband, 1, npix)).astype(np.float32)
    cl = np.zeros((ncomp, 1, nl), np.float32)
    cl[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
    data = rng.normal(0, 1, (nband, 1, npix)).astype(np.float32)
    import dataclasses
    sysm = amp.build_system(jnp.asarray(F), jnp.asarray(bl),
                            jnp.asarray(rms), jnp.asarray(cl),
                            jnp.asarray(data))
    # the CG loop only needs {F, bl, inv_rms2, cl, tri}: strip data and
    # inv_rms (3.6 GB at this size) from the loop payload
    slim = dataclasses.replace(
        sysm, data=jnp.zeros((nband, 1, 1), jnp.float32),
        inv_rms=jnp.zeros((nband, 1, 1), jnp.float32))
    plan = sht.get_plan(nside, lmax, dtype="float32", tables=False,
                        legendre_backend="pallas")
    # two payloads: the slim solve payload (F, bl, inv_rms2, cl, plan)
    # stays resident for the whole run; (data, inv_rms) visit the device
    # only for the RHS and are freed before the CG chunks start
    spec_s, enc_s = transfer.encode((plan, slim))
    spec_d, enc_dat = transfer.encode((sysm.data, sysm.inv_rms))
enc_sd = jax.device_put(enc_s, dev)
enc_d = jax.device_put(enc_dat, dev)

BC = 3   # bands per group (divides 9: dynamic_slice path, no padded copies)


import dataclasses as _dc


@jax.jit
def _init(e_s, e_d):
    plan, sysm = transfer.decode(spec_s, e_s)
    data, inv_rms = transfer.decode(spec_d, e_d)
    sysm = _dc.replace(sysm, data=data, inv_rms=inv_rms)
    rhs = amp.compute_rhs(sysm, plan, jax.random.PRNGKey(1), band_chunk=BC)
    M_inv = amp.build_preconditioner(sysm, plan)
    z0 = M_inv(rhs)
    bnorm = jnp.sqrt(alm_dot(rhs, rhs))
    return (jnp.zeros_like(rhs), rhs, z0, z0, alm_dot(rhs, z0), bnorm)


@partial(jax.jit, static_argnums=2, donate_argnums=1)
def _chunk(e, st, n):
    # st buffers are donated: the six alm-sized CG vectors (x, r, z, p,
    # rhs-slot, z0-slot) reuse their input buffers for outputs instead
    # of doubling to ~4.3 GB at this size
    plan, sysm = transfer.decode(spec_s, e)
    M_inv = amp.build_preconditioner(sysm, plan)
    A = partial(amp.apply_A, sysm, plan, band_chunk=BC)
    x, r, z, p, rz, bnorm = st

    def body(i, s):
        x, r, z, p, rz = s
        Ap = A(p)
        alpha = rz / alm_dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = alm_dot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new)

    st5 = (x, r, z, p, rz)
    if n == 1:
        # inline one iteration: no fori_loop carry double-buffering
        # (the loop op holds 2x the four alm-sized carries in HBM)
        st5 = body(0, st5)
    else:
        st5 = jax.lax.fori_loop(0, n, body, st5)
    x, r, z, p, rz = st5
    rel = jnp.sqrt(alm_dot(r, r)) / bnorm
    return (x, r, z, p, rz, bnorm), rel.astype(jnp.float32)


t0 = time.perf_counter()
st = _init(enc_sd, enc_d)
bnorm_h = float(np.asarray(st[5]))       # force _init completion
print(f"init done: |rhs| = {bnorm_h:.4e}  "
      f"({time.perf_counter() - t0:.0f}s)", flush=True)
del enc_d, enc_dat   # free the RHS-only payload on device
import gc
gc.collect()
t_init = None
done = 0
while done < maxiter:
    st, rel = _chunk(enc_sd, st, chunk)
    done += chunk
    now = time.perf_counter()
    if t_init is None:
        t_init = now     # first chunk completion = compile done
    print(f"iter {done:3d}: recurred relres "
          f"{float(np.asarray(rel)):.3e}  ({now - t0:.0f}s)", flush=True)
    if float(np.asarray(rel)) < 1e-10:
        break
if done > chunk:
    print(f"steady: {(time.perf_counter() - t_init) / (done - chunk):.2f}"
          f" s/CG-iter after {t_init - t0:.0f}s first-chunk (incl compile)",
          flush=True)
