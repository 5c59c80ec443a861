"""Diagnose CR-draw CG convergence at high lmax on TPU.

Stage 1 (nside 512): same synthetic system solved with the table-based SHT
plan vs the Pallas OTF plan — if the OTF path converges slower, the kernel's
adjoint consistency (not the preconditioner) is the bottleneck.
Stage 2: residual trajectory (fori_loop CG, fixed iters) to distinguish
slow spectrum from a plateau/floor.

Usage: python _exp_prec1024.py [nside] [backend:table|pallas|both] [niter]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 512
which = sys.argv[2] if len(sys.argv) > 2 else "both"
niter = int(sys.argv[3]) if len(sys.argv) > 3 else 100

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
lmax, nband, ncomp = 2 * nside, 9, 5

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
    sysm = amp.build_system(jnp.asarray(F), jnp.asarray(bl),
                            jnp.asarray(rms), jnp.asarray(cl),
                            jnp.asarray(data))


def traj_cg(sysm, plan, n, blocks=None):
    """Fixed-iteration CG with recorded rnorm trajectory."""
    rhs = amp.compute_rhs(sysm, plan, None)
    if blocks is not None:
        M_inv = lambda r: jnp.einsum(
            "slcd,dslm->cslm", blocks, r,
            precision=jax.lax.Precision.HIGHEST)
    else:
        M_inv = amp.build_preconditioner(sysm, plan)
    A = partial(amp.apply_A, sysm, plan)
    r0 = rhs
    z0 = M_inv(r0)
    bnorm = jnp.sqrt(alm_dot(rhs, rhs))

    def body(i, st):
        x, r, z, p, rz, hist = st
        Ap = A(p)
        alpha = rz / alm_dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = alm_dot(r, z)
        p = z + (rz_new / rz) * p
        hist = hist.at[i].set(jnp.sqrt(alm_dot(r, r)) / bnorm)
        return (x, r, z, p, rz_new, hist)

    x0 = jnp.zeros_like(rhs)
    hist0 = jnp.zeros((n,), jnp.float32)
    x, r, *_, hist = jax.lax.fori_loop(
        0, n, body, (x0, r0, z0, z0, alm_dot(r0, z0), hist0))
    if nside >= 1024:
        # keeping rhs alive for the true-residual check costs an extra
        # 168 MB alm buffer — the nside-1024 9-band solve OOMs by 121 MB
        return hist, hist[-1]
    # true residual (recomputed, not recurred)
    r_true = rhs - A(x)
    return hist, jnp.sqrt(alm_dot(r_true, r_true)) / bnorm


def run(backend):
    hostprec = backend.endswith("+hostprec")
    backend = backend.replace("+hostprec", "")
    with jax.default_device(cpu):
        plan = sht.get_plan(nside, lmax, dtype="float32",
                            tables=(backend == "table"),
                            legendre_backend=("pallas" if backend == "pallas"
                                              else "xla"))
        blocks = None
        if hostprec:
            # build the per-(S,l) ncomp x ncomp preconditioner inverse on
            # host in f64 (LAPACK), ship as f32 constants
            with jax.enable_x64(True):
                sys64 = jax.tree.map(
                    lambda x: x.astype(jnp.float64)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                    sysm)
                kappa = jnp.sum(sys64.inv_rms2, axis=-1) / (4.0 * np.pi)
                sqcl = jnp.sqrt(jnp.maximum(sys64.cl, 0.0))
                fb = jnp.einsum("bcs,bsl->bcsl", sys64.F, sys64.bl)
                G = jnp.einsum("bcsl,bdsl,bs->slcd", fb, fb, kappa)
                S_half = jnp.einsum("csl->slc", sqcl)
                M = jnp.eye(sys64.F.shape[1])                     + S_half[..., :, None] * G * S_half[..., None, :]
                blocks = jnp.linalg.inv(M).astype(jnp.float32)
        spec, enc = transfer.encode((plan, sysm, blocks))
    enc_d = jax.device_put(enc, dev)

    @partial(jax.jit, static_argnums=1)
    def go(e, n):
        plan, sysm, blocks = transfer.decode(spec, e)
        hist, true_rel = traj_cg(sysm, plan, n, blocks=blocks)
        return hist, true_rel

    t0 = time.perf_counter()
    hist, true_rel = go(enc_d, niter)
    hist = np.asarray(hist)
    true_rel = float(np.asarray(true_rel))
    dt = time.perf_counter() - t0
    print(f"[{backend}] nside={nside} lmax={lmax} {niter} iters "
          f"{dt:.1f}s wall ({dt / niter:.2f} s/iter incl compile)",
          flush=True)
    print(f"[{backend}] recurred relres trajectory (every 5):")
    for i in range(4, niter, 5):
        print(f"   iter {i + 1:3d}: {hist[i]:.3e}")
    print(f"[{backend}] final recurred {hist[-1]:.3e}  TRUE {true_rel:.3e}",
          flush=True)


for backend in (["table", "pallas"] if which == "both" else [which]):
    run(backend)
