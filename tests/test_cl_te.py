"""TE-coupled S^1/2 inside the CG amplitude solve.

The reference's sqrtS_mat is the symmetric Hermitian root of the per-ell
Stokes covariance (comm_Cl_mod.f90 updateS via compute_hermitian_root),
applied identically at both ends of the CG operator (matmulSqrtS in
cr_matmulA). These tests check the matrix root, operator symmetry under
the eps metric, and that the TE-coupled CG solution matches a dense solve
of the same operator built column-by-column.
"""
import numpy as np
import jax
import jax.numpy as jnp

from commander_tpu.model.cl import sqrt_psd, full_cl_matrix
from commander_tpu.sampling import amplitude as amp
from commander_tpu.sphere import sht
from commander_tpu.sphere.alm import alm_dot, random_alm_white


def test_sqrt_psd_roundtrip():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(7, 3, 3))
    M = A @ np.swapaxes(A, -1, -2)
    R = np.asarray(sqrt_psd(jnp.asarray(M)))
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), M, atol=1e-10)
    np.testing.assert_allclose(R, np.swapaxes(R, -1, -2), atol=1e-10)


def _te_system(nside=4, lmax=6, nband=2, ncomp=1):
    plan = sht.get_plan(nside, lmax, spin2=True)
    npix = 12 * nside * nside
    nl = lmax + 1
    rng = np.random.default_rng(3)
    F = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp))
    bl = np.ones((nband, 3, nl))
    rms = rng.uniform(0.5, 2.0, (nband, 3, npix))
    # TE-coupled Cl: r = 0.6 correlation, EE = 0.2 TT, BB = 0.05 TT
    ell = np.arange(nl)
    tt = 100.0 / np.maximum(ell * (ell + 1.0), 1.0)
    tt[:2] = 0.0
    cl_mat = np.zeros((ncomp, nl, 3, 3))
    cl_mat[:, :, 0, 0] = tt
    cl_mat[:, :, 1, 1] = 0.2 * tt
    cl_mat[:, :, 0, 1] = cl_mat[:, :, 1, 0] = 0.6 * np.sqrt(0.2) * tt
    cl_mat[:, :, 2, 2] = 0.05 * tt
    data = rng.normal(0, 1, (nband, 3, npix))
    sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                           jnp.zeros((ncomp, 3, nl)), jnp.asarray(data),
                           cl_mat=jnp.asarray(cl_mat))
    return sys, plan


def test_te_operator_symmetric():
    sys, plan = _te_system()
    key = jax.random.PRNGKey(0)
    shape = (1, 3) + sys.tri.shape
    r1 = random_alm_white(jax.random.fold_in(key, 1), shape) * sys.tri
    r2 = random_alm_white(jax.random.fold_in(key, 2), shape) * sys.tri
    a = alm_dot(r1, amp.apply_A(sys, plan, r2))
    b = alm_dot(amp.apply_A(sys, plan, r1), r2)
    assert np.isclose(float(a), float(b), rtol=1e-11)


def test_te_cg_matches_dense():
    sys, plan = _te_system()
    L = sys.tri.shape[0] - 1
    C, S = 1, 3
    n = amp._lowl_basis_size(C, S, L)
    basis = jnp.eye(n)
    nl = L + 1

    def col(v):
        u = amp.unpack_lowl(v.reshape(C, S, -1), C, S, L, nl, nl,
                            jnp.complex128)
        return amp.pack_lowl(amp.apply_A(sys, plan, u), L).reshape(-1)

    M = np.asarray(jax.lax.map(col, basis, batch_size=64)).T
    np.testing.assert_allclose(M, M.T, atol=1e-10)
    rhs = amp.compute_rhs(sys, plan, None)
    v = np.asarray(amp.pack_lowl(rhs, L).reshape(-1))
    x_dense = np.linalg.solve(M, v)
    a_cg, res = amp.sample_amplitudes(sys, plan, key=None, tol=1e-12,
                                      maxiter=600)
    # compare in u space: a = S^1/2 u -> re-pack the dense u
    u_dense = amp.unpack_lowl(jnp.asarray(x_dense).reshape(C, S, -1),
                              C, S, L, nl, nl, jnp.complex128)
    a_dense = amp._sqrtS(sys, u_dense)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(a_cg), np.asarray(a_dense),
                               atol=1e-8)


def test_full_cl_matrix_assembly():
    bin_idx = jnp.asarray(np.array([0, 0, 1, 1, 2]))
    cl_te = jnp.asarray(np.tile(np.eye(2), (3, 1, 1)) * np.arange(1, 4)[:, None, None])
    cl_b = jnp.asarray(np.array([0.1, 0.2, 0.3]))
    M = np.asarray(full_cl_matrix(cl_te, cl_b, bin_idx))
    assert M.shape == (5, 3, 3)
    assert M[4, 0, 0] == 3.0 and np.isclose(M[2, 2, 2], 0.2)
