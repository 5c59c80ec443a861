"""Amplitude (constrained-realization CG) sampler tests.

Oracle strategy (SURVEY.md §4 consequence): the reference has no tests; we
validate against exact linear algebra — operator symmetry under the alm
metric, CG solution vs a dense solve of the materialized operator, high-SNR
signal recovery, and posterior-sample statistics vs the Wiener solution.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from commander_tpu.instrument.bandpass import delta_bandpass
from commander_tpu.instrument.beam import gaussian_bl
from commander_tpu.model.mixing import DiffuseComponent, mixing_matrix
from commander_tpu.sampling import amplitude as amp
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import alm_dot, random_alm_white, triangle_mask

NSIDE, LMAX = 8, 16
NPIX = 12 * NSIDE * NSIDE
GHZ = 1e9


def make_system(rms_level=10.0, seed=0):
    plan = sht.get_plan(NSIDE, LMAX)
    comps = [
        DiffuseComponent("cmb", "cmb", 100 * GHZ, unit="uK_cmb"),
        DiffuseComponent("synch", "power_law", 30 * GHZ, theta0=(-3.1,)),
        DiffuseComponent("dust", "MBB", 353 * GHZ, theta0=(1.6, 19.6)),
    ]
    bps = [delta_bandpass(f * GHZ) for f in (30, 100, 353)]
    F = mixing_matrix(comps, bps)                      # (3, 3)
    nl = LMAX + 1
    bl = np.stack([gaussian_bl(600.0, LMAX), gaussian_bl(420.0, LMAX),
                   gaussian_bl(300.0, LMAX)])[:, None, :]   # (B, S=1, nl)
    ell = np.arange(nl)
    cl = (1e4 / (1.0 + ell * (ell + 1.0)))[None, None, :].repeat(3, 0)  # (C,S,nl)
    rng = np.random.default_rng(seed)
    rms = np.full((3, 1, NPIX), rms_level)

    # simulate data from a known truth
    key = jax.random.PRNGKey(seed)
    a_true = amp.apply_sqrtS(jnp.asarray(cl),
                             random_alm_white(key, (3, 1, nl, nl)))
    a_true = a_true * jnp.asarray(triangle_mask(nl, nl))
    sys0 = amp.build_system(F, bl, jnp.asarray(rms), cl,
                            jnp.zeros((3, 1, NPIX)))
    alm_b = amp._project_bands(sys0, plan, a_true)
    sky = sht.alm2map(plan, alm_b)
    noise = rms * rng.standard_normal((3, 1, NPIX))
    data = sky + noise
    sys = amp.build_system(F, bl, jnp.asarray(rms), cl, data)
    return plan, sys, a_true


def test_operator_self_adjoint():
    plan, sys, _ = make_system()
    key = jax.random.PRNGKey(1)
    nl = LMAX + 1
    tri = jnp.asarray(triangle_mask(nl, nl))
    u = random_alm_white(key, (3, 1, nl, nl)) * tri
    v = random_alm_white(jax.random.PRNGKey(2), (3, 1, nl, nl)) * tri
    Au = amp.apply_A(sys, plan, u)
    Av = amp.apply_A(sys, plan, v)
    lhs, rhs = alm_dot(u, Av), alm_dot(Au, v)
    assert abs(lhs - rhs) < 1e-8 * abs(lhs)
    # positive definite on random vector
    assert alm_dot(u, Au) > 0


def test_cg_matches_dense_solve():
    plan, sys, _ = make_system()
    rhs = amp.compute_rhs(sys, plan, key=None)
    M_inv = amp.build_preconditioner(sys, plan)
    from commander_tpu.ops.cg import pcg
    res = pcg(partial(amp.apply_A, sys, plan), rhs, M_inv=M_inv,
              dot=alm_dot, tol=1e-10, maxiter=400)
    assert res.converged
    # dense oracle in the real packed representation
    nl = LMAX + 1
    tri = triangle_mask(nl, nl).astype(bool)
    C = 3
    idx = np.argwhere(tri)

    def pack(a):
        a = np.asarray(a).reshape(C, nl, nl)
        cols = []
        for c in range(C):
            cols.append(a[c][tri].real)
            cols.append(a[c][tri].imag)
        return np.concatenate(cols)

    def unpack(v):
        a = np.zeros((C, 1, nl, nl), dtype=complex)
        n = idx.shape[0]
        for c in range(C):
            re = v[2 * c * n:(2 * c + 1) * n]
            im = v[(2 * c + 1) * n:(2 * c + 2) * n]
            a[c, 0][tri] = re + 1j * im
        return jnp.asarray(a)

    n = idx.shape[0]
    dim = 2 * C * n
    basis = jnp.stack([unpack(np.eye(dim)[i]) for i in range(dim)])
    Acols = jax.vmap(partial(amp.apply_A, sys, plan))(basis)
    Amat = np.stack([pack(Acols[i]) for i in range(dim)], axis=1)
    x_dense = np.linalg.solve(Amat, pack(rhs))
    # compare in packed coords
    np.testing.assert_allclose(pack(res.x), x_dense, atol=1e-6)


def test_high_snr_recovery():
    plan, sys, a_true = make_system(rms_level=1e-3)
    a, res = amp.sample_amplitudes(sys, plan, key=None, tol=1e-10, maxiter=500)
    nl = LMAX + 1
    tri = triangle_mask(nl, nl).astype(bool)
    # Wiener mean ~ truth when noise negligible (beam-deconvolved ells only)
    err = np.abs(np.asarray(a - a_true))[:, 0][:, tri[: nl]]
    scale = np.abs(np.asarray(a_true))[:, 0][:, tri].max()
    assert err.max() < 1e-3 * scale


def test_posterior_sample_statistics():
    plan, sys, _ = make_system(rms_level=30.0)
    mean, _ = amp.sample_amplitudes(sys, plan, key=None, tol=1e-9, maxiter=400)

    nsamp = 48
    keys = jax.random.split(jax.random.PRNGKey(7), nsamp)
    draw = jax.jit(lambda k: amp.sample_amplitudes(sys, plan, key=k,
                                                   tol=1e-7, maxiter=300)[0])
    samples = np.stack([np.asarray(draw(k)) for k in keys])
    smean = samples.mean(axis=0)
    sstd = samples.std(axis=0)
    # each coefficient: |sample mean - wiener| < 5 sigma / sqrt(N)
    diff = np.abs(smean - np.asarray(mean))
    bound = 5.0 * sstd / np.sqrt(nsamp) + 1e-9
    frac_bad = np.mean(diff > bound)
    assert frac_bad < 0.01, f"{frac_bad:.3f} of coefficients outside 5 sigma"
    # fluctuations are nonzero and of prior order at noise-dominated ells
    assert sstd.max() > 0.1


def test_sample_amplitudes_chunked_matches_monolithic():
    """Chunked big-run PCG (BASELINE round 3) == the while_loop solver."""
    import numpy as np
    import jax.numpy as jnp
    from commander_tpu.sampling import amplitude as amp
    from commander_tpu.sphere import sht
    nside, lmax, B, C = 16, 32, 3, 2
    npix, nl = 12 * nside * nside, lmax + 1
    rng = np.random.default_rng(0)
    plan = sht.get_plan(nside, lmax, dtype="float32")
    F = jnp.asarray(1.0 + rng.uniform(0, 1, (B, C)).astype(np.float32))
    bl = jnp.ones((B, 1, nl), jnp.float32)
    ell = np.arange(nl)
    cl = jnp.asarray((100.0 / np.maximum(ell * (ell + 1.0), 1.0)
                      )[None, None, :].repeat(C, 0).astype(np.float32))
    rms = jnp.full((B, 1, npix), 2.0, jnp.float32)
    data = jnp.asarray(rng.normal(0, 3, (B, 1, npix)).astype(np.float32))
    sysm = amp.build_system(F, bl, rms, cl, data)
    a1, r1 = amp.sample_amplitudes(sysm, plan, key=None, tol=1e-9,
                                   maxiter=60)
    a2, r2 = amp.sample_amplitudes_chunked(sysm, plan, key=None, tol=1e-9,
                                           maxiter=60, chunk=7)
    err = float(jnp.max(jnp.abs(a1 - a2)) / jnp.max(jnp.abs(a1)))
    assert err < 1e-5
    assert bool(r2.converged)


def test_band_chunked_operator_and_rhs():
    """apply_A/compute_rhs with band_chunk match the batched versions
    exactly (the HBM lever for nside-2048 single-chip systems)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from commander_tpu.sampling import amplitude as amp
    from commander_tpu.sphere import sht
    from commander_tpu.sphere.alm import random_alm_white

    nside, lmax, B, C = 8, 16, 5, 3
    nl = lmax + 1
    npix = 12 * nside * nside
    rng = np.random.default_rng(0)
    plan = sht.get_plan(nside, lmax)
    F = 1.0 + rng.uniform(0.2, 1.0, (B, C))
    bl = np.exp(-0.001 * np.arange(nl) ** 2)[None, None, :].repeat(B, 0)
    rms = rng.uniform(1.0, 3.0, (B, 1, npix))
    cl = np.ones((C, 1, nl))
    data = rng.standard_normal((B, 1, npix))
    sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl),
                           jnp.asarray(rms), jnp.asarray(cl),
                           jnp.asarray(data))
    u = random_alm_white(jax.random.PRNGKey(3), (C, 1, nl, nl)) * sys.tri
    full = amp.apply_A(sys, plan, u)
    for bc in (1, 2, 3):
        ch = amp.apply_A(sys, plan, u, band_chunk=bc)
        np.testing.assert_allclose(np.asarray(ch), np.asarray(full),
                                   rtol=0, atol=1e-10)
    # RHS without fluctuations is deterministic: exact match
    r_full = amp.compute_rhs(sys, plan)
    r_ch = amp.compute_rhs(sys, plan, band_chunk=2)
    np.testing.assert_allclose(np.asarray(r_ch), np.asarray(r_full),
                               rtol=0, atol=1e-10)
    # with fluctuations the eta1 streams differ by construction, but the
    # RHS distribution must match: compare means/cov over draws
    draws_f, draws_c = [], []
    for i in range(48):
        draws_f.append(np.asarray(amp.compute_rhs(
            sys, plan, key=jax.random.PRNGKey(i))).ravel())
        draws_c.append(np.asarray(amp.compute_rhs(
            sys, plan, key=jax.random.PRNGKey(i),
            band_chunk=2)).ravel())
    vf = np.var(np.asarray(draws_f).real, axis=0).mean()
    vc = np.var(np.asarray(draws_c).real, axis=0).mean()
    assert abs(vf - vc) / vf < 0.35
