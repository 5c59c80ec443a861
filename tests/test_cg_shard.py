"""Distributed-SHT amplitude CG (P2 end to end) vs the local solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from commander_tpu.parallel import cg_shard
from commander_tpu.sampling import amplitude as amp
from commander_tpu.sphere import sht

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs multi-device mesh")


def _system(nside=16, lmax=32, nband=3, ncomp=2):
    plan = sht.get_plan(nside, lmax)
    npix, nl = 12 * nside * nside, lmax + 1
    rng = np.random.default_rng(0)
    F = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp))
    ell = np.arange(nl)
    bl = np.exp(-0.5 * ell * (ell + 1) * np.radians(1.0) ** 2)[None, None]
    bl = np.repeat(bl, nband, 0)
    rms = rng.uniform(0.5, 3.0, (nband, 1, npix))
    cl = np.zeros((ncomp, 1, nl))
    cl[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
    data = rng.normal(0, 1, (nband, 1, npix))
    sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                           jnp.asarray(cl), jnp.asarray(data))
    return sys, plan


def test_sharded_cg_matches_local_wiener_mean():
    sys, plan = _system()
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("sphere",))
    a_loc, res_loc = amp.sample_amplitudes(sys, plan, key=None, tol=1e-11,
                                           maxiter=400)
    with mesh:
        a_sh, res_sh = cg_shard.sample_amplitudes_sharded(
            sys, plan, mesh, key=None, tol=1e-11, maxiter=400)
        a_sh = np.asarray(a_sh)
    assert bool(res_sh.converged)
    scale = np.abs(np.asarray(a_loc)).max()
    assert np.abs(a_sh - np.asarray(a_loc)).max() < 1e-8 * scale


def test_sharded_operator_matches_local():
    sys, plan = _system(nside=8, lmax=16)
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("sphere",))
    rng = np.random.default_rng(1)
    nl = plan.lmax + 1
    u = rng.standard_normal((2, 1, nl, nl)) \
        + 1j * rng.standard_normal((2, 1, nl, nl))
    u = jnp.asarray(u) * sys.tri
    ref = np.asarray(amp.apply_A(sys, plan, u))
    with mesh:
        inv2_r, _, _ = cg_shard.ring_layout_invN(sys, plan, mesh)
        got = np.asarray(cg_shard.apply_A_sharded(sys, plan, mesh, inv2_r, u))
    assert np.abs(got - ref).max() < 1e-10 * np.abs(ref).max()


def _mesh2d():
    dev = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(dev, axis_names=("band", "sphere"))


def test_2d_band_sphere_operator_matches_local():
    sys, plan = _system(nside=8, lmax=16, nband=3)  # 3 bands over 2 groups
    mesh = _mesh2d()
    rng = np.random.default_rng(3)
    nl = plan.lmax + 1
    u = rng.standard_normal((2, 1, nl, nl)) \
        + 1j * rng.standard_normal((2, 1, nl, nl))
    u = jnp.asarray(u) * sys.tri
    ref = np.asarray(amp.apply_A(sys, plan, u))
    with mesh:
        inv2_r, _, _ = cg_shard.ring_layout_invN(sys, plan, mesh)
        got = np.asarray(cg_shard.apply_A_sharded(
            sys, plan, mesh, inv2_r, u, band_axis="band"))
    assert np.abs(got - ref).max() < 1e-10 * np.abs(ref).max()


def test_2d_band_sphere_cg_matches_local():
    sys, plan = _system(nside=16, lmax=32, nband=4)
    mesh = _mesh2d()
    a_loc, _ = amp.sample_amplitudes(sys, plan, key=None, tol=1e-11,
                                     maxiter=400)
    with mesh:
        a_sh, res_sh = cg_shard.sample_amplitudes_sharded(
            sys, plan, mesh, key=None, tol=1e-11, maxiter=400,
            band_axis="band")
        a_sh = np.asarray(a_sh)
    assert bool(res_sh.converged)
    scale = np.abs(np.asarray(a_loc)).max()
    assert np.abs(a_sh - np.asarray(a_loc)).max() < 1e-8 * scale


def test_sharded_cg_polarized_matches_local():
    nside, lmax, nband, ncomp = 8, 16, 2, 1
    plan = sht.get_plan(nside, lmax, spin2=True)
    npix, nl = 12 * nside * nside, lmax + 1
    rng = np.random.default_rng(2)
    F = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp))
    bl = np.ones((nband, 3, nl))
    rms = rng.uniform(0.5, 3.0, (nband, 3, npix))
    ell = np.arange(nl)
    cl = np.zeros((ncomp, 3, nl))
    cl[:, 0, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
    cl[:, 1, 2:] = 20.0 / (ell[2:] * (ell[2:] + 1.0))
    cl[:, 2, 2:] = 5.0 / (ell[2:] * (ell[2:] + 1.0))
    data = rng.normal(0, 1, (nband, 3, npix))
    sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl), jnp.asarray(rms),
                           jnp.asarray(cl), jnp.asarray(data))
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("sphere",))
    a_loc, _ = amp.sample_amplitudes(sys, plan, key=None, tol=1e-11,
                                     maxiter=500)
    from commander_tpu.parallel import cg_shard
    with mesh:
        a_sh, res_sh = cg_shard.sample_amplitudes_sharded(
            sys, plan, mesh, key=None, tol=1e-11, maxiter=500)
        a_sh = np.asarray(a_sh)
    assert bool(res_sh.converged)
    scale = np.abs(np.asarray(a_loc)).max()
    assert np.abs(a_sh - np.asarray(a_loc)).max() < 1e-8 * scale


def _system_full(nside=8, lmax=16, nband=3, ncomp=2, pixmix=False,
                 pol=False):
    """System with optional per-pixel mixing, polarization, and joint
    template/ptsrc rows (the full-model operator of the reference's
    distributed cr_matmulA, comm_cr_mod.f90:771-1024)."""
    from commander_tpu.sampling import joint as joint_mod

    plan = sht.get_plan(nside, lmax, spin2=pol)
    S = 3 if pol else 1
    npix, nl = 12 * nside * nside, lmax + 1
    rng = np.random.default_rng(2)
    F = 1.0 + rng.uniform(0.2, 1.0, (nband, ncomp, S))
    ell = np.arange(nl)
    bl = np.exp(-0.5 * ell * (ell + 1) * np.radians(1.0) ** 2)
    bl = np.broadcast_to(bl, (nband, S, nl)).copy()
    rms = rng.uniform(0.5, 3.0, (nband, S, npix))
    cl = np.zeros((ncomp, S, nl))
    cl[:, :, 2:] = 100.0 / (ell[2:] * (ell[2:] + 1.0))
    data = rng.normal(0, 1, (nband, S, npix))
    sys = amp.build_system(jnp.asarray(F), jnp.asarray(bl),
                           jnp.asarray(rms), jnp.asarray(cl),
                           jnp.asarray(data))
    if pixmix:
        fp = F[..., None] * (1.0 + 0.1 * rng.standard_normal(
            (nband, ncomp, S, npix)))
        import dataclasses
        sys = dataclasses.replace(sys, F_pix=jnp.asarray(fp))
    tmaps = rng.standard_normal((2, nband, S, npix))
    ts = joint_mod.TemplateSet(maps=jnp.asarray(tmaps),
                               prior_mean=jnp.asarray([0.0, 1.0]),
                               prior_istd=jnp.asarray([0.5, 2.0]))
    src_pix = rng.choice(npix, size=5, replace=False)
    ps = joint_mod.gaussian_stamp_ptsrc(
        nside, src_pix, 1.0 + rng.uniform(0, 1, (nband, 5)),
        np.full(nband, 120.0), nmaps=S, npatch=16)
    import dataclasses
    ps = dataclasses.replace(ps, prior_mean=jnp.zeros(5),
                             prior_istd=jnp.full(5, 0.1))
    return sys, plan, ts, ps


@pytest.mark.parametrize("pixmix,pol", [(False, False), (True, False),
                                        (True, True)],
                         ids=["const-mix", "pixmix", "pixmix-pol"])
def test_sharded_joint_full_model_matches_local(pixmix, pol):
    """Round-5: the sharded CG carries the PRODUCTION operator — pixel
    mixing (F_pix), joint template + point-source rows, polarization —
    exactly as the local joint solver (Wiener mean, key=None)."""
    from commander_tpu.sampling import joint as joint_mod

    sys, plan, ts, ps = _system_full(pixmix=pixmix, pol=pol)
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("sphere",))
    x_loc, res_loc = joint_mod.sample_joint(sys, plan, ts, ps, key=None,
                                            tol=1e-11, maxiter=600)
    with mesh:
        x_sh, res_sh = cg_shard.sample_joint_sharded(
            sys, plan, mesh, ts, ps, key=None, tol=1e-11, maxiter=600)
        a_sh = np.asarray(x_sh.a)
        t_sh = np.asarray(x_sh.t)
        p_sh = np.asarray(x_sh.p)
    scale = np.abs(np.asarray(x_loc.a)).max()
    assert np.abs(a_sh - np.asarray(x_loc.a)).max() < 1e-7 * scale
    np.testing.assert_allclose(t_sh, np.asarray(x_loc.t), atol=1e-7,
                               rtol=1e-6)
    np.testing.assert_allclose(p_sh, np.asarray(x_loc.p), atol=1e-7,
                               rtol=1e-6)


def test_sharded_joint_band_axis_2d():
    """Same full model on the 2-D band x sphere mesh (P3 x P2)."""
    from commander_tpu.sampling import joint as joint_mod

    sys, plan, ts, ps = _system_full(pixmix=True, nband=4)
    devs = np.asarray(jax.devices())
    if devs.size < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(devs[:4].reshape(2, 2), axis_names=("band", "sphere"))
    x_loc, _ = joint_mod.sample_joint(sys, plan, ts, ps, key=None,
                                      tol=1e-11, maxiter=600)
    with mesh:
        x_sh, res_sh = cg_shard.sample_joint_sharded(
            sys, plan, mesh, ts, ps, key=None, tol=1e-11, maxiter=600,
            band_axis="band")
        a_sh = np.asarray(x_sh.a)
    scale = np.abs(np.asarray(x_loc.a)).max()
    assert np.abs(a_sh - np.asarray(x_loc.a)).max() < 1e-7 * scale
