"""Pseudo-inverse and low-ell dense CG preconditioners.

The reference offers CG_PRECOND_TYPE in {diagonal, pseudoinv}
(updateDiffPrecond, comm_diffuse_comp_mod.f90:1306-1316) plus an optional
dense low-ell block (updateLowlPrecond :5098). These tests check that each
preconditioner (a) is symmetric positive under the eps metric, so CG theory
applies, and (b) yields the same CG solution as the diagonal preconditioner
while converging, on an inhomogeneous-noise multi-component system.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from commander_tpu.sampling import amplitude as amp
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import alm_dot, random_alm_white


def _make_system(key, nside=8, lmax=12, nband=3, ncomp=2, nmaps=1,
                 inhomo=True):
    plan = sht.get_plan(nside, lmax, spin2=(nmaps == 3))
    npix = 12 * nside * nside
    nl = lmax + 1
    rng = np.random.default_rng(7)
    F = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp))
    ell = np.arange(nl)
    bl = np.exp(-0.5 * ell * (ell + 1) * (np.radians(2.0) ** 2))[None, None]
    bl = np.repeat(np.repeat(bl, nband, 0), nmaps, 1)
    rms = np.full((nband, nmaps, npix), 1.0)
    if inhomo:
        rms *= rng.uniform(0.3, 5.0, (nband, 1, npix))
    cl = np.zeros((ncomp, nmaps, nl))
    cl[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
    data = rng.normal(0, 1, (nband, nmaps, npix))
    sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                           jnp.asarray(cl), jnp.asarray(data))
    return sys, plan


def _sym_check(apply_M, shape, key):
    r1 = random_alm_white(jax.random.fold_in(key, 1), shape)
    r2 = random_alm_white(jax.random.fold_in(key, 2), shape)
    a = alm_dot(r1, apply_M(r2))
    b = alm_dot(apply_M(r1), r2)
    assert np.isclose(float(a), float(b), rtol=1e-10)
    assert float(alm_dot(r1, apply_M(r1))) > 0


def test_pseudoinv_symmetric_and_converges():
    key = jax.random.PRNGKey(0)
    sys, plan = _make_system(key)
    M_pi = amp.build_preconditioner_pseudoinv(sys, plan)
    shape = (sys.F.shape[1], sys.bl.shape[1]) + sys.tri.shape
    _sym_check(M_pi, shape, key)

    a_diag, res_diag = amp.sample_amplitudes(sys, plan, key=None, tol=1e-10,
                                             maxiter=400)
    a_pi, res_pi = amp.sample_amplitudes(sys, plan, key=None, tol=1e-10,
                                         maxiter=400, precond="pseudoinv")
    assert bool(res_pi.converged)
    np.testing.assert_allclose(np.asarray(a_pi), np.asarray(a_diag),
                               rtol=0, atol=1e-7)


def test_lowl_dense_symmetric_and_converges():
    key = jax.random.PRNGKey(1)
    sys, plan = _make_system(key)
    M_ll = amp.build_preconditioner_lowl(sys, plan, lmax_lowl=4)
    shape = (sys.F.shape[1], sys.bl.shape[1]) + sys.tri.shape
    # the hybrid apply is block-diagonal across the l<=L / l>L split and
    # symmetric in each block
    _sym_check(M_ll, shape, key)

    a_diag, _ = amp.sample_amplitudes(sys, plan, key=None, tol=1e-10,
                                      maxiter=400)
    a_ll, res_ll = amp.sample_amplitudes(sys, plan, key=None, tol=1e-10,
                                         maxiter=400, lowl_lmax=4)
    assert bool(res_ll.converged)
    np.testing.assert_allclose(np.asarray(a_ll), np.asarray(a_diag),
                               rtol=0, atol=1e-7)


def test_lowl_dense_beats_diagonal_on_lowl_heavy_system():
    """With a prior dominated by low ells and very inhomogeneous noise the
    dense low-ell block should not be SLOWER than pure diagonal."""
    key = jax.random.PRNGKey(2)
    sys, plan = _make_system(key, nside=8, lmax=10, nband=2, ncomp=2)
    rhs = amp.compute_rhs(sys, plan, None)
    from functools import partial
    from commander_tpu.ops.cg import pcg
    M_d = amp.build_preconditioner(sys, plan)
    M_l = amp.build_preconditioner_lowl(sys, plan, lmax_lowl=6)
    r_d = pcg(partial(amp.apply_A, sys, plan), rhs, M_inv=M_d, dot=alm_dot,
              tol=1e-9, maxiter=500)
    r_l = pcg(partial(amp.apply_A, sys, plan), rhs, M_inv=M_l, dot=alm_dot,
              tol=1e-9, maxiter=500)
    assert bool(r_l.converged)
    assert int(r_l.iters) <= int(r_d.iters) + 2
