"""Pixel-dependent mixing in the CG (per-pixel spectral indices)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from commander_tpu.instrument.beam import gaussian_bl
from commander_tpu.sampling import amplitude as amp
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import alm_dot, random_alm_white, triangle_mask

NSIDE, LMAX = 8, 16
NPIX = 12 * NSIDE * NSIDE


def make_pixmix_system(seed=0, rms_level=2.0):
    plan = sht.get_plan(NSIDE, LMAX)
    nl = LMAX + 1
    B, C, S = 3, 2, 1
    rng = np.random.default_rng(seed)
    # pixel-varying mixing: power-law with a smoothly varying beta map
    nu = np.array([30e9, 44e9, 70e9])
    beta = -3.1 + 0.3 * np.cos(np.linspace(0, np.pi, NPIX))
    F_pix = np.stack([
        np.stack([np.ones(NPIX), (nu[b] / 30e9) ** beta])
        for b in range(B)])[:, :, None, :]          # (B, C, S, P)
    F_mean = F_pix.mean(-1)
    bl = np.stack([gaussian_bl(600.0, LMAX) for _ in range(B)])[:, None, :]
    ell = np.arange(nl)
    cl = np.broadcast_to(2e3 / (1 + ell * (ell + 1.0)), (C, S, nl)).copy()
    rms = np.full((B, S, NPIX), rms_level)
    data = rng.standard_normal((B, S, NPIX)) * 20
    sys = amp.build_system(jnp.asarray(F_mean), jnp.asarray(bl),
                           jnp.asarray(rms), jnp.asarray(cl),
                           jnp.asarray(data))
    sys = dataclasses.replace(sys, F_pix=jnp.asarray(F_pix))
    return plan, sys


def test_pixmix_operator_self_adjoint():
    plan, sys = make_pixmix_system()
    nl = LMAX + 1
    tri = jnp.asarray(triangle_mask(nl, nl))
    u = random_alm_white(jax.random.PRNGKey(1), (2, 1, nl, nl)) * tri
    v = random_alm_white(jax.random.PRNGKey(2), (2, 1, nl, nl)) * tri
    lhs = alm_dot(u, amp.apply_A(sys, plan, v))
    rhs = alm_dot(amp.apply_A(sys, plan, u), v)
    assert abs(lhs - rhs) < 1e-8 * abs(lhs)
    assert alm_dot(u, amp.apply_A(sys, plan, u)) > 0


def test_pixmix_sampling_converges():
    plan, sys = make_pixmix_system()
    a, res = amp.sample_amplitudes(sys, plan, key=jax.random.PRNGKey(5),
                                   tol=1e-7, maxiter=400)
    assert res.converged
    assert np.isfinite(np.asarray(a.real)).all()


def test_pixmix_reduces_to_constant_when_uniform():
    # with F_pix constant over pixels the two paths agree (up to the
    # quadrature error of the YtW roundtrip at lmax < band limit)
    plan, sys = make_pixmix_system()
    F_const = np.asarray(sys.F)[..., None] * np.ones(NPIX)
    sys_u = dataclasses.replace(sys, F_pix=jnp.asarray(F_const))
    sys_c = dataclasses.replace(sys, F_pix=None)
    nl = LMAX + 1
    tri = jnp.asarray(triangle_mask(nl, nl))
    u = random_alm_white(jax.random.PRNGKey(3), (2, 1, nl, nl)) * tri
    # band-limit the test vector well below the grid limit so YtW~exact
    fl = jnp.asarray((np.arange(nl) <= 8).astype(float))
    u = u * fl[:, None]
    Au = np.asarray(amp.apply_A(sys_u, plan, u))
    Ac = np.asarray(amp.apply_A(sys_c, plan, u))
    scale = np.abs(Ac).max()
    assert np.abs(Au - Ac).max() < 2e-2 * scale
