"""Polarized (T,Q,U) amplitude sampler tests: spin-2 correctness in the CG."""
import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from commander_tpu.instrument.beam import gaussian_bl
from commander_tpu.sampling import amplitude as amp
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import alm_dot, random_alm_white, triangle_mask

NSIDE, LMAX = 8, 16
NPIX = 12 * NSIDE * NSIDE


def make_pol_system(rms_level=5.0, seed=0):
    plan = sht.get_plan(NSIDE, LMAX, spin2=True)
    nl = LMAX + 1
    B, C, S = 2, 2, 3
    F = np.array([[1.0, 0.8], [1.0, 2.0]])[..., None].repeat(S, axis=-1)
    bl = np.stack([gaussian_bl(600.0, LMAX), gaussian_bl(400.0, LMAX)])[:, None, :]
    bl = np.broadcast_to(bl, (B, S, nl)).copy()
    ell = np.arange(nl)
    cl = np.broadcast_to(1e3 / (1 + ell * (ell + 1.0)), (C, S, nl)).copy()
    cl[:, 1:, :2] = 0.0  # E,B have no l<2
    rng = np.random.default_rng(seed)
    rms = np.full((B, S, NPIX), rms_level)
    key = jax.random.PRNGKey(seed)
    tri = jnp.asarray(triangle_mask(nl, nl))
    a_true = amp.apply_sqrtS(jnp.asarray(cl), random_alm_white(key, (C, S, nl, nl))) * tri
    sys0 = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                            jnp.asarray(cl), jnp.zeros((B, S, NPIX)))
    sky = amp._synth(plan, amp._project_bands(sys0, plan, a_true))
    data = np.asarray(sky) + rms * rng.standard_normal((B, S, NPIX))
    sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                           jnp.asarray(cl), jnp.asarray(data))
    return plan, sys, a_true


def test_pol_operator_self_adjoint():
    plan, sys, _ = make_pol_system()
    nl = LMAX + 1
    tri = jnp.asarray(triangle_mask(nl, nl))
    u = random_alm_white(jax.random.PRNGKey(1), (2, 3, nl, nl)) * tri
    v = random_alm_white(jax.random.PRNGKey(2), (2, 3, nl, nl)) * tri
    lhs = alm_dot(u, amp.apply_A(sys, plan, v))
    rhs = alm_dot(amp.apply_A(sys, plan, u), v)
    assert abs(lhs - rhs) < 1e-8 * abs(lhs)
    assert alm_dot(u, amp.apply_A(sys, plan, u)) > 0


def test_pol_wiener_recovers_truth_high_snr():
    plan, sys, a_true = make_pol_system(rms_level=1e-3)
    a, res = amp.sample_amplitudes(sys, plan, key=None, tol=1e-10, maxiter=600)
    assert res.converged
    nl = LMAX + 1
    tri = triangle_mask(nl, nl).astype(bool)
    tri_eb = tri.copy()
    tri_eb[:2] = False
    err_T = np.abs(np.asarray(a - a_true))[:, 0][:, tri].max()
    err_E = np.abs(np.asarray(a - a_true))[:, 1][:, tri_eb].max()
    err_B = np.abs(np.asarray(a - a_true))[:, 2][:, tri_eb].max()
    scale = np.abs(np.asarray(a_true)).max()
    assert err_T < 1e-3 * scale
    assert err_E < 1e-3 * scale
    assert err_B < 1e-3 * scale


def test_pol_sampling_runs():
    plan, sys, _ = make_pol_system(rms_level=20.0)
    a, res = amp.sample_amplitudes(sys, plan, key=jax.random.PRNGKey(3),
                                   tol=1e-7, maxiter=300)
    assert res.converged
    assert np.isfinite(np.asarray(a.real)).all()


def test_qucov_noise_in_cg():
    """QU-covariance noise blocks keep the operator self-adjoint and the
    Wiener solve convergent (comm_N_QUcov_mod wiring)."""
    import dataclasses
    plan = sht.get_plan(NSIDE, LMAX, spin2=True)
    nl = LMAX + 1
    B, C, S = 2, 2, 3
    rng = np.random.default_rng(9)
    F = np.abs(rng.standard_normal((B, C, S))) + 0.5
    bl = np.broadcast_to(gaussian_bl(500.0, LMAX)[None, None], (B, S, nl)).copy()
    ell = np.arange(nl)
    cl = np.broadcast_to(1e3 / (1 + ell * (ell + 1.0)), (C, S, nl)).copy()
    cl[:, 1:, :2] = 0.0
    rms = np.full((B, S, NPIX), 5.0)
    # random SPD 2x2 covariances per pixel
    a = rng.standard_normal((B, NPIX, 2, 2)) * 2
    cov = np.einsum("bpik,bpjk->bpij", a, a) + 25.0 * np.eye(2)
    data = rng.standard_normal((B, S, NPIX)) * 10
    sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                           jnp.asarray(cl), jnp.asarray(data),
                           cov_qu=jnp.asarray(cov))
    tri = jnp.asarray(triangle_mask(nl, nl))
    u = random_alm_white(jax.random.PRNGKey(1), (C, S, nl, nl)) * tri
    v = random_alm_white(jax.random.PRNGKey(2), (C, S, nl, nl)) * tri
    lhs = alm_dot(u, amp.apply_A(sys, plan, v))
    rhs = alm_dot(amp.apply_A(sys, plan, u), v)
    assert abs(lhs - rhs) < 1e-8 * abs(lhs)
    a_out, res = amp.sample_amplitudes(sys, plan, key=jax.random.PRNGKey(3),
                                       tol=1e-7, maxiter=400)
    assert res.converged
    assert np.isfinite(np.asarray(a_out.real)).all()
    # N^-1/2 consistency: (sqrtInvN)^T sqrtInvN == invN on random maps
    x = jnp.asarray(rng.standard_normal((B, S, NPIX)))
    y1 = amp.apply_invN(sys, x)
    half = amp.apply_sqrt_invN(sys, x)
    # apply transpose of sqrt via the same blocks transposed
    sysT = dataclasses.replace(sys, sqrt_inv_qu=jnp.swapaxes(sys.sqrt_inv_qu, -1, -2))
    y2 = amp.apply_sqrt_invN(sysT, half)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-9,
                               atol=1e-9)
